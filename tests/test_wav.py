"""Stdlib WAV/PCM codec tests: hand-built RIFF goldens (independent of
the encoder), roundtrips across rates/channel counts, word-alignment
and unknown-chunk handling, corruption/subset errors, and the
Spark-side decode_audio path.
"""

from __future__ import annotations

import struct

import pytest

from jobinsight_data_pipeline_v2_spark.operators.wav import (
    decode_wav,
    encode_wav,
)

SF = "/root/testdata/sf0.001"


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt(n_ch: int, rate: int, width: int = 16, tag: int = 1) -> bytes:
    return _chunk(
        b"fmt ",
        struct.pack("<HHIIHH", tag, n_ch, rate,
                    rate * (width // 8) * n_ch, (width // 8) * n_ch, width),
    )


def test_decode_hand_built_stereo_golden():
    """Framing + interleave pinned against bytes assembled by test-
    local code the encoder never touches."""
    # frames: (L,R) = (100,-100), (200,-200), (300,-300)
    data = _chunk(b"data", struct.pack("<6h", 100, -100, 200, -200,
                                       300, -300))
    rate, ch, n, chans = decode_wav(_riff(_fmt(2, 44100), data))
    assert (rate, ch, n) == (44100, 2, 3)
    assert chans == [[100, 200, 300], [-100, -200, -300]]


def test_decode_skips_unknown_chunks_and_odd_padding():
    """Real crawls carry LIST/INFO chunks; odd-length chunks are
    word-aligned — both must be skipped, not choked on."""
    odd = _chunk(b"LIST", b"\x01\x02\x03")  # odd length -> pad byte
    data = _chunk(b"data", struct.pack("<2h", 7, -7))
    rate, ch, n, chans = decode_wav(
        _riff(odd, _fmt(1, 8000), _chunk(b"junk", b"xy"), data)
    )
    assert (rate, ch, n) == (8000, 1, 2)
    assert chans == [[7, -7]]


@pytest.mark.parametrize("n_ch", [1, 2, 4])
@pytest.mark.parametrize("rate", [8000, 44100])
def test_roundtrip(n_ch, rate):
    chans = [[(37 * i * (c + 1)) % 30000 - 15000 for i in range(50)]
             for c in range(n_ch)]
    assert decode_wav(encode_wav(rate, chans)) == (rate, n_ch, 50, chans)


def test_decode_rejects_out_of_subset_and_corruption():
    data = _chunk(b"data", struct.pack("<2h", 1, 2))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError, match="unsupported audio format"):
        decode_wav(_riff(_fmt(1, 8000, tag=85), data))  # MP3 tag
    with pytest.raises(ValueError, match="sample width"):
        decode_wav(_riff(_fmt(1, 8000, width=8), data))
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(_riff(data))
    with pytest.raises(ValueError, match="missing data"):
        decode_wav(_riff(_fmt(1, 8000)))
    with pytest.raises(ValueError, match="whole number of frames"):
        decode_wav(_riff(_fmt(2, 8000), _chunk(b"data", b"\x01\x02")))
    good = encode_wav(8000, [[1, 2, 3]])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-2])


def test_encode_rejects_ragged_channels():
    with pytest.raises(ValueError, match="length mismatch"):
        encode_wav(8000, [[1, 2], [3]])
    with pytest.raises(ValueError, match="no channels"):
        encode_wav(8000, [])


def test_extract_features_with_real_audio_decode(spark):
    """Spark-side: WAV payloads through extract_features(decode_audio)
    — Arrow batches, non-PCM payload quarantined as NULL features."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        decode_audio,
        extract_features,
    )

    rows = []
    for i in range(1, 11):
        n_ch = 1 + i % 2
        chans = [[(j % 8) * (c + 1) for j in range(40)]
                 for c in range(n_ch)]
        rows.append((i, "audio", bytearray(encode_wav(8000 + i, chans)),
                     "audio/wav", "synth", float(n_ch)))
    rows.append((99, "audio", bytearray(b"ID3\x03mp3junk" * 4),
                 "audio/mpeg", "synth", -1.0))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "source string, exp_ch double",
    )
    feats = extract_features(
        media.select("media_id", "kind", "payload", "mime", "source"),
        decode_fn=decode_audio,
    )
    got = {r["media_id"]: r["features"] for r in feats.collect()}
    assert got[99] is None
    for r in rows[:-1]:
        assert got[r[0]][0] == 8000 + r[0] and got[r[0]][1] == r[5]
        assert got[r[0]][2] == 40.0
    assert feats.filter(F.length("content_sha256") == 64).count() == 11
