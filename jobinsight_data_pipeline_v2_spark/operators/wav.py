"""Pure-stdlib WAV/PCM codec: the real AUDIO decode for the multimodal
path (the PNG codec's sibling — operators/png.py closed images in r7;
this closes the audio baseline the same way).

Baseline profile: RIFF/WAVE framing, ``fmt `` chunk with PCM
(format tag 1), 16-bit samples, any rate/channel count, interleaved
``data`` chunk, unknown chunks skipped (LIST/INFO etc. appear in real
crawls). Compressed codecs (MP3/AAC/FLAC) still need a native library
— out of subset, fail loudly.

``decode_wav`` runs at the Arrow edge inside
``operators.multimodal.extract_features`` via :func:`decode_audio`;
``encode_wav`` is the deterministic synthesizer for tests and the
``wav_decode_stats`` gate. Both directions are implemented
independently (the encoder never calls the parser), and the tests pin
hand-built RIFF bytes, so a framing bug cannot hide in roundtrips.
"""

from __future__ import annotations

import struct


def decode_wav(payload: bytes) -> tuple[int, int, int, list[list[int]]]:
    """WAV bytes → (sample_rate, n_channels, n_frames, per-channel
    sample lists). Raises ``ValueError`` on truncation, non-PCM
    encodings, or widths other than 16-bit."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            (audio_fmt, n_ch, rate, _brate, _align, width) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(
                    f"unsupported audio format {audio_fmt} (PCM only — "
                    "compressed codecs need a native library)"
                )
            if width != 16:
                raise ValueError(f"unsupported sample width {width}")
            if n_ch < 1:
                raise ValueError("zero channels")
            fmt = (rate, n_ch)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    rate, n_ch = fmt
    frame_bytes = 2 * n_ch
    if len(data) % frame_bytes:
        raise ValueError("data chunk is not a whole number of frames")
    n_frames = len(data) // frame_bytes
    flat = struct.unpack(f"<{n_frames * n_ch}h", data)
    channels = [list(flat[c::n_ch]) for c in range(n_ch)]
    return rate, n_ch, n_frames, channels


def encode_wav(
    sample_rate: int, channels: list[list[int]]
) -> bytes:
    """Per-channel 16-bit sample lists → WAV bytes (interleaved PCM).
    All channels must be equal length; samples must fit int16."""
    if not channels:
        raise ValueError("no channels")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channel length mismatch")
    n_ch = len(channels)
    flat = [channels[c][i] for i in range(n) for c in range(n_ch)]
    data = struct.pack(f"<{len(flat)}h", *flat)
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate,
        sample_rate * 2 * n_ch, 2 * n_ch, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
