"""Stdlib Y4M demuxer tests: hand-built streams (independent of the
encoder), every supported colorspace's plane geometry, corruption and
out-of-subset errors, and the REAL video path through
multimodal.sample_frames with the container splitter.
"""

from __future__ import annotations

import pytest

from jobinsight_data_pipeline_v2_spark.operators.y4m import (
    demux_y4m,
    encode_y4m,
    luma_sum,
    y4m_frame_splitter,
)

SF = "/root/testdata/sf0.001"


def test_demux_hand_built_stream():
    """Framing pinned against bytes assembled by test-local code the
    encoder never touches — including unknown header params (X…) and
    FRAME parameter strings."""
    w, h = 4, 2
    f0 = bytes(range(8)) + bytes([100, 110])  # C420: Y 8 + U 2... wait
    # C420 at 4x2: Y=8, U=V=(2*1)=2 each -> 12 bytes
    f0 = bytes(range(8)) + bytes([1, 2]) + bytes([3, 4])
    f1 = bytes(range(8, 16)) + bytes([5, 6]) + bytes([7, 8])
    payload = (
        b"YUV4MPEG2 W4 H2 F30000:1001 Ip A128:117 C420jpeg XYSCSS=420\n"
        + b"FRAME\n" + f0
        + b"FRAMEItc\n" + f1  # per-frame params are legal
    )
    width, height, fps, cs, frames = demux_y4m(payload)
    assert (width, height, fps, cs) == (4, 2, (30000, 1001), "420jpeg")
    assert frames == [f0, f1]
    assert luma_sum(f0, 4, 2) == sum(range(8))


@pytest.mark.parametrize(
    "cs,frame_len",
    [("420", 6 * 4 + 2 * 6), ("422", 24 + 2 * 12), ("444", 72),
     ("mono", 24)],
)
def test_roundtrip_each_colorspace(cs, frame_len):
    w, h = 6, 4
    frames = [bytes((i * 7 + k) % 256 for i in range(frame_len))
              for k in range(3)]
    got = demux_y4m(encode_y4m(w, h, frames, fps=(24, 1),
                               colorspace=cs))
    assert got == (w, h, (24, 1), cs, frames)


def test_demux_rejects_corruption_and_subset():
    good = encode_y4m(4, 4, [bytes(16)], colorspace="mono")
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        demux_y4m(b"RIFF" + good)
    with pytest.raises(ValueError, match="truncated frame"):
        demux_y4m(good[:-3])
    with pytest.raises(ValueError, match="FRAME marker"):
        demux_y4m(good + b"GARBAGE\n" + bytes(16))
    with pytest.raises(ValueError, match="missing W/H"):
        demux_y4m(b"YUV4MPEG2 F25:1\nFRAME\n")
    with pytest.raises(ValueError, match="colorspace"):
        demux_y4m(b"YUV4MPEG2 W2 H2 C999\n")
    with pytest.raises(ValueError, match="even dimensions"):
        demux_y4m(b"YUV4MPEG2 W3 H2 C420\n")
    with pytest.raises(ValueError, match="zero fps"):
        demux_y4m(b"YUV4MPEG2 W2 H2 F25:0 Cmono\nFRAME\n" + bytes(4))
    with pytest.raises(ValueError, match="expected"):
        encode_y4m(4, 4, [bytes(3)], colorspace="mono")


def test_sample_frames_with_real_container_demux(spark):
    """The video path end-to-end on Spark: Y4M payloads through
    sample_frames(split_fn=y4m_frame_splitter) — REAL container demux
    replacing the byte-slice stand-in; frame counts, sampling stride,
    and per-frame sizes must match the container's geometry."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        sample_frames,
    )

    rows = []
    geom = {}
    for i in range(1, 13):
        w, h = 4 + (i % 3) * 2, 4 + (i % 2) * 2
        n = 2 + i % 5
        frames = [bytes([(i + k) % 200]) * (w * h) for k in range(n)]
        geom[i] = (w, h, n)
        rows.append((i, "video",
                     bytearray(encode_y4m(w, h, frames,
                                          colorspace="mono")),
                     "video/x-yuv4mpeg", "synth"))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "source string",
    )
    got = sample_frames(
        media, every_n=2, fps=30, split_fn=y4m_frame_splitter
    ).collect()
    per = {}
    for r in got:
        w, h, n = geom[r["media_id"]]
        assert r["frame_idx"] % 2 == 0
        assert r["n_bytes"] == w * h  # mono: container size, not a knob
        assert r["ts_ms"] == r["frame_idx"] * 1000 // 30
        per[r["media_id"]] = per.get(r["media_id"], 0) + 1
    for i, (w, h, n) in geom.items():
        assert per[i] == (n + 1) // 2, i
    # a corrupt container must fail the task loudly (demux raises) —
    # quarantine policy for video is upstream filtering, not NULLs
    bad = spark.createDataFrame(
        [(99, "video", bytearray(b"not y4m"), "video/x-yuv4mpeg", "s")],
        "media_id long, kind string, payload binary, mime string, "
        "source string",
    )
    with pytest.raises(Exception, match="YUV4MPEG2"):
        sample_frames(bad, split_fn=y4m_frame_splitter).collect()
