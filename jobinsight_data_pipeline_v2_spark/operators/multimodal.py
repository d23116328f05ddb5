"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in a DataFrame as a ``binary`` column plus a
metadata struct; all real Spark machinery — schema, partition sizing,
Arrow-batched Pandas iteration, content addressing — is implemented and
tested here. Image decode is REAL: :func:`decode_image` runs the
pure-stdlib PNG codec (operators/png.py — zlib + the five scanline
filters; oracle-gated by ``png_decode_stats``). Audio/video codecs
(librosa/pyav) are environment-blocked, so ``decode_fn=None`` keeps
the deterministic byte-histogram fake for those kinds; swap in a real
decoder by passing ``decode_fn`` — the Spark-side contract is
unchanged either way.

Design for 100 TB of media:
- payloads stay opaque bytes end-to-end: no JVM→Python round trip
  except inside the one mapInPandas stage that needs pixels;
- mapInPandas streams Arrow record batches — bounded memory per task
  regardless of payload sizes (tune
  spark.sql.execution.arrow.maxRecordsPerBatch for large blobs);
- content addressing (sha256) enables exact dedup of media with a
  plain hash-groupBy, same operator as text exact-dedup.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("source", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha256", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: treat document text bytes as stand-in media payloads."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("source"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: 'features' are byte
    histogram moments. Raises on None payload like a real codec would."""
    if payload is None:
        raise ValueError("cannot decode empty payload")
    buckets = [0] * dim
    for i, b in enumerate(payload):
        buckets[b % dim] += 1
    total = max(len(payload), 1)
    return [b / total for b in buckets]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size: int | None = None,
) -> DataFrame:
    """binary payloads → per-item feature vectors via mapInPandas.

    The decode runs Python-side by necessity (codec libraries), but
    over Arrow record batches — columnar transfer, zero pickling, and
    the iterator contract keeps peak memory to one batch per task.
    """
    decode = decode_fn or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            feats, shas, sizes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                try:
                    feats.append(decode(raw))
                except Exception:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "content_sha256": shas,
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_exact_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup by content hash — same hash-groupBy operator
    as text dedup; (sha256 → keeper media_id, n_copies)."""
    return features.groupBy("content_sha256").agg(
        F.min("media_id").alias("keeper_media_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def decode_image(payload: bytes) -> list[float]:
    """REAL image decode (pure-stdlib codecs — PNG via operators/
    png.py, 24-bit BI_RGB BMP via operators/bmp.py, baseline +
    progressive JPEG via operators/jpeg.py, LZW GIF via
    operators/gif.py, dispatched on the magic bytes): payload →
    [width, height, channels, mean_ch0, …] — the feature vector a
    production thumbnail pipeline extracts. JPEG components convert
    through the deterministic rounded BT.601 surface
    (operators/jpeg.ycbcr_to_rgb) so channels mean R/G/B for every
    format.

    Pass as ``decode_fn`` to :func:`extract_features`; unknown-format
    or corrupt payloads raise inside the decoder and surface as
    ``features = NULL`` rows (the quarantine convention)."""
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg, ycbcr_to_rgb

        width, height, nc, planes = decode_jpeg(payload)
        n = max(width * height, 1)
        if nc == 1:
            tot = sum(v for row in planes[0] for v in row)
            return [float(width), float(height), 1.0, tot / n]
        sums = [0, 0, 0]
        for y in range(height):
            ry, rcb, rcr = planes[0][y], planes[1][y], planes[2][y]
            for x in range(width):
                r, g, b = ycbcr_to_rgb(ry[x], rcb[x], rcr[x])
                sums[0] += r
                sums[1] += g
                sums[2] += b
        return [float(width), float(height), 3.0] + [s / n for s in sums]
    if payload[:2] == b"BM":
        from .bmp import decode_bmp as _dec
    elif payload[:4] == b"GIF8":
        from .gif import decode_gif as _dec
    else:
        from .png import decode_png as _dec

    width, height, ch, px = _dec(payload)
    n = max(width * height, 1)
    sums = [0] * ch
    for i, b in enumerate(px):
        sums[i % ch] += b
    return [float(width), float(height), float(ch)] + [
        s / n for s in sums
    ]


def decode_audio(payload: bytes) -> list[float]:
    """REAL audio decode (pure-stdlib WAV/PCM codec, operators/wav.py):
    payload → [sample_rate, channels, n_frames, mean_ch0, mean_ch1, …].
    Compressed codecs (MP3/AAC) raise inside the decoder — quarantined
    as NULL features like any corrupt payload."""
    from .wav import decode_wav

    rate, n_ch, n_frames, channels = decode_wav(payload)
    n = max(n_frames, 1)
    return [float(rate), float(n_ch), float(n_frames)] + [
        sum(c) / n for c in channels
    ]


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame", BinaryType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    every_n: int = 4,
    frame_bytes: int = 256,
    fps: int = 25,
    split_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """video payloads → one row per SAMPLED frame (every ``every_n``-th).

    The frame-sampling shape of a video pipeline: a 1→N row fan-out
    inside mapInPandas, Arrow-batched both ways, with frame timestamps
    derived from the frame index (ts_ms = idx·1000/fps). A REAL
    demuxer exists for uncompressed Y4M containers —
    ``operators.y4m.y4m_frame_splitter`` (oracle-gated by
    ``y4m_frame_stats``); ``split_fn=None`` keeps the deterministic
    fixed-``frame_bytes`` slicing stand-in, and compressed containers
    (MP4/WebM) take a pyav-style ``split_fn`` where available — the
    Spark contract is identical for all three. Downstream, each frame
    row feeds extract_features / media_exact_dedup unchanged.
    """

    def split(payload: bytes, size: int) -> list[bytes]:
        return [payload[i : i + size] for i in range(0, len(payload), size)]

    demux = split_fn or split

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames, sizes = [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                for idx, frame in enumerate(demux(raw, frame_bytes)):
                    if idx % every_n:
                        continue
                    ids.append(int(media_id))
                    idxs.append(idx)
                    tss.append(idx * 1000 // fps)
                    frames.append(frame)
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)
