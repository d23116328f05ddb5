"""Media curation end-to-end (the crawl-to-shards analog for the
media triple): a mixed PNG/WAV/Y4M corpus flows through REAL decode,
content addressing, exact dedup, and video frame sampling — the same
operator chain a production media pipeline runs, with every codec the
stdlib one the gates pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_features,
    media_exact_dedup,
    sample_frames,
)
from jobinsight_data_pipeline_v2_spark.operators.png import encode_png
from jobinsight_data_pipeline_v2_spark.operators.wav import encode_wav
from jobinsight_data_pipeline_v2_spark.operators.y4m import (
    encode_y4m,
    y4m_frame_splitter,
)


def _png(i):
    w, h = 4 + i % 4, 4 + i % 3
    px = bytes((i * 11 + j) % 256 for j in range(w * h * 3))
    return encode_png(w, h, px, color_type=2, filters=lambda y: y % 5)


def _wav(i):
    return encode_wav(8000, [[(i * 13 + j) % 400 - 200
                              for j in range(32)]])


def _y4m(i, shared_frame=None):
    w = h = 8
    frames = [bytes([(i + k) % 200]) * (w * h) for k in range(4)]
    if shared_frame is not None:
        frames[0] = shared_frame  # plant a cross-video duplicate frame
    return encode_y4m(w, h, frames, colorspace="mono")


def test_mixed_media_curation_end_to_end(spark):
    shared = bytes([123]) * 64
    rows = []
    for i in range(1, 9):
        rows.append((i, "image", bytearray(_png(i)), "image/png", "s"))
    rows.append((100, "image", bytearray(_png(3)), "image/png", "s"))
    for i in range(9, 15):
        rows.append((i, "audio", bytearray(_wav(i)), "audio/wav", "s"))
    rows.append((101, "audio", bytearray(_wav(11)), "audio/wav", "s"))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "source string",
    ).localCheckpoint()

    # per-kind REAL decode through one shared Arrow stage each
    imgs = extract_features(
        media.filter("kind = 'image'"), decode_fn=decode_image
    )
    auds = extract_features(
        media.filter("kind = 'audio'"), decode_fn=decode_audio
    )
    feats = imgs.unionByName(auds).localCheckpoint()
    assert feats.filter("features IS NULL").count() == 0
    # image features: [w, h, ch, ...]; audio: [rate, ch, frames, ...]
    by_id = {r["media_id"]: r for r in feats.collect()}
    assert by_id[1]["features"][2] == 3.0  # RGB channels
    assert by_id[9]["features"][0] == 8000.0  # sample rate

    # content-addressed exact dedup finds exactly the two plants
    dups = media_exact_dedup(feats).filter("n_copies > 1").collect()
    assert {(r["keeper_media_id"], r["n_copies"]) for r in dups} == {
        (3, 2), (11, 2)
    }

    # video: two clips share frame 0 -> frame-level dedup across clips
    vids = spark.createDataFrame(
        [
            (200, "video", bytearray(_y4m(50, shared)),
             "video/x-yuv4mpeg", "s"),
            (201, "video", bytearray(_y4m(60, shared)),
             "video/x-yuv4mpeg", "s"),
        ],
        "media_id long, kind string, payload binary, mime string, "
        "source string",
    )
    frames = sample_frames(vids, every_n=1, split_fn=y4m_frame_splitter)
    frame_media = frames.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("frame").alias("payload"),
        F.lit("raw").alias("mime"),
        F.lit("s").alias("source"),
    )
    ffeats = extract_features(frame_media)  # hash-only path (raw planes)
    fdups = media_exact_dedup(ffeats).filter("n_copies > 1").collect()
    assert len(fdups) == 1
    assert fdups[0]["keeper_media_id"] == 200000  # clip 200, frame 0
    assert fdups[0]["n_copies"] == 2
