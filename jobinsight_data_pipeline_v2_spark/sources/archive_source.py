"""ZIP/TAR archive-container source (S22): the code-corpus ingest
shape — The Stack, GitHub dumps, and most "download of many small
files" corpora arrive as ``.zip`` / ``.tar`` / ``.tar.gz`` containers
whose MEMBER PATHS are meaningful (language routing, license files,
repo layout), not as row-oriented files.

Same discipline as sources/warc_source.py: one input archive = one
``binaryFile`` row = one parse task (the cluster parallelism unit — a
100 TB code corpus is a few hundred thousand such containers), split
into member rows by an Arrow-batched ``mapInPandas`` over pure-stdlib
codecs (``zipfile`` / ``tarfile`` / ``gzip``), with quarantine at two
granularities instead of task death:

- ``bad_archive`` — the container is unreadable (garbage bytes, a
  corrupt ZIP central directory, a TAR that errors mid-iteration).
  TAR carries no member index that survives corruption, so a
  truncated tar quarantines WHOLE (the WARC no-silent-prefix
  contract: never yield an unverifiable prefix of an archive's
  members). ZIP's central directory is authoritative, so a corrupt
  ZIP member only costs that member:
- ``bad_member:<Error>`` — one ZIP member whose data fails CRC or
  inflate; sibling members still land.
- ``non_regular`` — tar entries that are not files or directories
  (symlinks, devices, FIFOs): no content to ingest, quarantined
  loudly rather than skipped (a symlink-heavy dump should be visible
  in the quarantine counts, not silently smaller).

Members named ``*.gz`` are decompressed transparently (the Common
Crawl member-gzip convention; name-suffix dispatch only — binary
member content may legitimately begin with the gzip magic); a member
whose ``.gz`` stream is corrupt quarantines as ``bad_member``.
Directories contribute no rows.

``write_archive`` is the export side: one container per task (even
partitions ZIP, odd TAR.GZ when ``tar_every_other``, so a round trip
exercises both codecs), tmp-write + ``os.rename`` per file (rule 17),
report frame drained by the caller.

Downstream: ``archive_text_docs`` adapts member rows to (path, text)
document rows — the hop into ``license_detect`` header classification
and ``curate_corpus``.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ._atomic import commit_file as _commit_file
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ARCHIVE_MEMBER_SCHEMA = StructType(
    [
        StructField("source_file", StringType(), True),
        StructField("member_index", LongType(), True),
        StructField("member_path", StringType(), True),
        StructField("member_size", LongType(), True),  # decompressed bytes
        StructField("content", BinaryType(), True),
        StructField("reason", StringType(), True),  # NULL = good row
    ]
)


def _maybe_gunzip_member(path: str, data: bytes) -> bytes:
    if path.endswith(".gz"):
        return gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    return data


def _row(
    name: str,
    idx: int,
    path: str | None,
    data: bytes | None,
    reason: str | None,
) -> dict:
    return {
        "source_file": name,
        "member_index": idx,
        "member_path": path,
        "member_size": None if data is None else len(data),
        "content": data,
        "reason": reason,
    }


def _parse_zip(name: str, content: bytes) -> list[dict]:
    """Member rows of one ZIP. The central directory is read up front
    (authoritative member list even when one member's data is
    corrupt), so a bad member quarantines alone."""
    zf = zipfile.ZipFile(io.BytesIO(content))  # raises → bad_archive
    rows: list[dict] = []
    idx = 0
    for info in zf.infolist():
        if info.is_dir():
            continue
        try:
            data = _maybe_gunzip_member(info.filename, zf.read(info))
            rows.append(_row(name, idx, info.filename, data, None))
        except Exception as e:  # CRC / inflate / gzip failure
            rows.append(
                _row(
                    name,
                    idx,
                    info.filename,
                    None,
                    f"bad_member:{type(e).__name__}",
                )
            )
        idx += 1
    return rows


def _tar_plain_bytes(content: bytes) -> bytes:
    """Decompress the container by magic byte so the end-of-archive
    check below can see the raw tar stream (``r:*`` would hide the
    decompressed offsets). A corrupt compression stream raises —
    bad_archive upstream."""
    if content[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=io.BytesIO(content)).read()
    if content[:3] == b"BZh":
        import bz2

        return bz2.decompress(content)
    if content[:6] == b"\xfd7zXZ\x00":
        import lzma

        return lzma.decompress(content)
    return content


def _parse_tar(name: str, content: bytes) -> list[dict]:
    """Member rows of one TAR (plain or gz/bz2/xz-compressed).
    The WHOLE member walk runs before anything is yielded: a tar that
    errors mid-iteration (truncation, corrupt header chain) must
    never contribute a silent prefix of its members, so the caller
    converts the raise into ONE bad_archive row.

    Python's ``tarfile`` treats EOF at a HEADER position mid-archive
    as a normal end of archive (review r11 — a tar truncated exactly
    at a 512-block member boundary, or mid-way through the next
    member's header, iterates cleanly and silently drops the tail).
    The walk therefore verifies the spec's end-of-archive marker
    explicitly: after the last member the stream must carry two
    all-zero 512-byte blocks."""
    data = _tar_plain_bytes(content)
    tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
    rows: list[dict] = []
    idx = 0
    for info in tf:  # raises mid-iteration → bad_archive upstream
        if info.isdir():
            continue
        if not info.isreg():
            rows.append(_row(name, idx, info.name, None, "non_regular"))
            idx += 1
            continue
        f = tf.extractfile(info)
        raw = b"" if f is None else f.read()
        if len(raw) != info.size:
            # a tar truncated exactly at a 512-block boundary reads
            # SHORT without tarfile raising — the silent-prefix shape
            # the WARC contract forbids
            raise ValueError(
                f"tar member {info.name} declares {info.size} bytes "
                f"but only {len(raw)} are present (truncated archive)"
            )
        try:
            payload = _maybe_gunzip_member(info.name, raw)
            rows.append(_row(name, idx, info.name, payload, None))
        except Exception as e:  # corrupt .gz member
            rows.append(
                _row(name, idx, info.name, None,
                     f"bad_member:{type(e).__name__}")
            )
        idx += 1
    # end-of-archive marker: two zero blocks after the last member
    tail = data[tf.offset : tf.offset + 1024]
    if len(tail) < 1024 or any(tail):
        raise ValueError(
            "tar missing its end-of-archive marker — truncated at a "
            "block/header boundary (silent member prefix forbidden)"
        )
    return rows


def parse_archive_bytes(name: str, content: bytes) -> list[dict]:
    """Every member of one container as row dicts (pure function —
    shared by the Arrow batches and unit tests). Dispatch: ZIP magic
    first (``PK``), else tar via ``r:*`` sniffing; a container
    readable as neither is one ``bad_archive`` row."""
    if content[:2] == b"PK":
        try:
            return _parse_zip(name, content)
        except Exception as e:
            return [_row(name, 0, None, None,
                         f"bad_archive:{type(e).__name__}")]
    try:
        return _parse_tar(name, content)
    except Exception as e:
        return [_row(name, 0, None, None,
                     f"bad_archive:{type(e).__name__}")]


def _parse_archive_batches(batches):
    import pandas as pd

    for pdf in batches:
        for name, content in zip(pdf["path"], pdf["content"]):
            rows = parse_archive_bytes(name, bytes(content))
            if rows:
                yield pd.DataFrame(rows)


def read_archive_members(spark: SparkSession, path_glob: str) -> DataFrame:
    """(source_file, member_index, member_path, member_size, content,
    reason) for every member under ``path_glob`` — good rows carry
    ``reason`` NULL; quarantined rows carry the failure class (the
    mbox/csv row-level quarantine contract). One container = one
    parse task; a batch never holds more than one decompressed
    container plus its member rows."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return files.mapInPandas(
        _parse_archive_batches, schema=ARCHIVE_MEMBER_SCHEMA
    )


def read_archive_stream(
    spark: SparkSession,
    path_glob: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin: newly landed containers replay through the
    SAME stateless member splitter — batch == stream file for file
    (the read_warc_stream shape)."""
    from pyspark.sql.types import TimestampType

    schema = StructType(
        [
            StructField("path", StringType(), True),
            StructField("modificationTime", TimestampType(), True),
            StructField("length", LongType(), True),
            StructField("content", BinaryType(), True),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path_glob).select("path", "content")
    return files.mapInPandas(
        _parse_archive_batches, schema=ARCHIVE_MEMBER_SCHEMA
    )


def archive_quarantine(members: DataFrame) -> DataFrame:
    return members.filter(F.col("reason").isNotNull()).select(
        "source_file", "member_index", "member_path", "reason"
    )


def archive_text_docs(
    members: DataFrame, *, decode_flag: bool = False
) -> DataFrame:
    """Good member rows as (source_file, member_path, text) document
    rows — UTF-8 decode via cast (narrow projection, the hop into
    license_detect / curate_corpus).

    LOSSY-DECODE CONTRACT: the cast replaces invalid UTF-8 with
    U+FFFD (the warc ``errors='replace'`` convention — values stay
    deterministic), so a binary member (image, compiled artifact)
    becomes replacement-character text rather than a quarantine row.
    Pass ``decode_flag=True`` for an extra ``lossy_decode`` boolean
    (text re-encoded != original bytes) so binary members stay
    visible downstream (ADVICE r11)."""
    docs = members.filter(F.col("reason").isNull()).select(
        "source_file",
        "member_path",
        F.col("content").cast("string").alias("text"),
        F.col("content").alias("__raw"),
    )
    if decode_flag:
        docs = docs.withColumn(
            "lossy_decode",
            F.expr("encode(text, 'UTF-8') != __raw"),
        )
    return docs.drop("__raw")


def write_archive(
    docs: DataFrame,
    out_dir: str,
    *,
    path_col: str = "member_path",
    payload_col: str = "text",
    tar_every_other: bool = True,
    gzip_members_every_other: bool = False,
) -> DataFrame:
    """Export (path, payload) rows as containers — one per partition
    (even pids ZIP/deflate, odd TAR.GZ when ``tar_every_other``, so a
    round trip exercises both codecs; ``gzip_members_every_other``
    additionally gzips the MEMBERS of pids with bit 1 set, covering
    the ``.gz``-member decode path inside both container kinds).
    Tmp-write + ``os.rename`` per file (rule 17); returns a
    (file, n_members) report frame the caller drains to execute the
    write. Same shared-filesystem deployment constraint as
    write_warc_archive."""
    import os as _os
    import uuid as _uuid

    import pandas as pd
    from pyspark.sql.functions import spark_partition_id

    src = docs.select(
        F.col(path_col).cast("string").alias("mpath"),
        F.col(payload_col).cast("string").alias("body"),
        spark_partition_id().alias("__pid"),
    )

    def write_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        members: list[tuple[str, bytes]] = []
        pid = 0
        for pdf in batches:
            for mpath, body, p in zip(pdf["mpath"], pdf["body"],
                                      pdf["__pid"]):
                pid = int(p)
                data = ("" if body is None else str(body)).encode("utf-8")
                name = str(mpath)
                if gzip_members_every_other and pid % 4 >= 2:
                    data = gzip.compress(data)
                    name += ".gz"
                members.append((name, data))
        if not members:
            return
        buf = io.BytesIO()
        if tar_every_other and pid % 2 == 1:
            fname = f"part-{pid:05d}.tar.gz"
            with tarfile.open(fileobj=buf, mode="w:gz") as tf:
                for name, data in members:
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        else:
            fname = f"part-{pid:05d}.zip"
            with zipfile.ZipFile(
                buf, "w", compression=zipfile.ZIP_DEFLATED
            ) as zf:
                for name, data in members:
                    zf.writestr(name, data)
        _commit_file(out_dir, fname, buf.getvalue())
        yield pd.DataFrame({"file": [fname], "n_members": [len(members)]})

    return src.mapInPandas(
        write_partition, schema="file string, n_members long"
    )
