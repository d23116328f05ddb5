"""Avro source (S19): Object Container Files → typed rows with
corrupt-block and row-level quarantine, plus the matching distributed
sink — pure stdlib, the Kafka-ecosystem interchange sibling of the
JSONL/CSV/XML/ORC/WARC quarantine sources.

Spark ships Avro support as an EXTERNAL module (spark-avro is not on
this distribution's classpath), so the container format is implemented
from the Avro 1.x specification directly — the operators/png.py
discipline: stdlib-only codec, encode and decode written independently
from the spec (writer emits spec structures, reader parses the byte
stream), each direction pinned by micro-goldens so a compensating bug
cannot hide in the round trip.

Format (Avro spec, Object Container Files): magic ``Obj\\x01``, a
metadata map (``avro.schema`` JSON + ``avro.codec``), a random 16-byte
sync marker, then data blocks — ``count`` (zigzag-varint long),
``size`` in bytes, the serialized objects (raw-deflate-compressed when
``avro.codec=deflate``), and the sync marker again. Values encode as:
zigzag varints (int/long), length-prefixed UTF-8 (string) / bytes,
little-endian IEEE (float/double), one byte (boolean), nothing (null);
a union writes the zigzag branch index then the branch value; a record
concatenates its fields in schema order.

Quarantine model (what the sync marker is FOR): a block that fails to
decode — bad varint, size past EOF, sync mismatch, deflate error —
quarantines as ONE ``corrupt_block`` row and the reader RESYNCS by
scanning for the next sync marker, so one flipped byte costs one block,
never the tail of a 100 TB file. Unreadable containers (bad magic,
unparseable metadata/schema) quarantine as ``bad_container``. Rows
that decode but miss a required field quarantine as
``missing:<field>`` (the ORC source's row-level contract). Every
input block lands in exactly one of (typed rows, quarantine) — tested.

Scale shape: the FILE is the unit of parallelism (built-in
``binaryFile`` source, one task per .avro, the warc_source contract);
decoding runs in one Arrow-batched ``mapInPandas`` — a sanctioned
Python edge with real schema/batching/partitioning. The distributed
sink writes one container per partition via tmp-name + ``os.rename``
(rule 17: a retried task can only leave a stale tmp, never a torn
file).

Reference analog: none (net-new interchange breadth, VERDICT r8 ask
#3).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
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

_MAGIC = b"Obj\x01"

# the documents-table record (TESTDATA.md shape); every field is a
# ["null", T] union — the nullable convention Avro producers emit
DOC_AVRO_SCHEMA: dict = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": ["null", "long"]},
        {"name": "text", "type": ["null", "string"]},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "source", "type": ["null", "string"]},
        {"name": "n_chars", "type": ["null", "long"]},
    ],
}

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

QUARANTINE_SCHEMA = StructType(
    [
        StructField("source_file", StringType(), True),
        StructField("block_index", LongType(), True),
        StructField("reason", StringType(), True),
    ]
)

_SUPPORTED_PRIMS = {
    "null", "boolean", "int", "long", "float", "double", "string", "bytes",
}


# ---------------------------------------------------------------------------
# value encoding (writer side)
# ---------------------------------------------------------------------------


def _enc_long(n: int) -> bytes:
    """Zigzag + little-endian base-128 varint (Avro int/long)."""
    zz = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


def _enc_value(typ, v) -> bytes:
    if isinstance(typ, list):  # union: branch index + branch value
        if v is None:
            idx = typ.index("null")
            return _enc_long(idx)
        idx = next(i for i, t in enumerate(typ) if t != "null")
        return _enc_long(idx) + _enc_value(typ[idx], v)
    if isinstance(typ, dict):  # logical-type annotation: base prim
        return _enc_value(typ.get("type"), v)
    if typ == "null":
        return b""
    if typ in ("long", "int"):
        return _enc_long(int(v))
    if typ == "string":
        return _enc_str(str(v))
    if typ == "bytes":
        return _enc_bytes(bytes(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    raise ValueError(f"unsupported avro type {typ!r}")


def _enc_record(schema: dict, row: dict) -> bytes:
    return b"".join(
        _enc_value(f["type"], row.get(f["name"])) for f in schema["fields"]
    )


def encode_avro_container(
    rows: list[dict],
    schema: dict = DOC_AVRO_SCHEMA,
    codec: str = "null",
    rows_per_block: int = 200,
    sync: bytes | None = None,
) -> bytes:
    """Rows → one Object Container File (deterministic: the sync
    marker derives from the schema + first row unless given)."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be 'null' or 'deflate'")
    if sync is None:
        import hashlib

        seed = json.dumps(schema, sort_keys=True) + repr(rows[:1])
        sync = hashlib.md5(seed.encode()).digest()
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    out += _enc_long(len(meta))
    for k, v in sorted(meta.items()):
        out += _enc_str(k)
        out += _enc_bytes(v)
    out += _enc_long(0)  # end of metadata map
    out += sync
    for i in range(0, len(rows), rows_per_block):
        chunk = rows[i : i + rows_per_block]
        data = b"".join(_enc_record(schema, r) for r in chunk)
        if codec == "deflate":
            data = zlib.compress(data, 6)[2:-4]  # raw deflate per spec
        out += _enc_long(len(chunk))
        out += _enc_long(len(data))
        out += data
        out += sync
    return bytes(out)


# ---------------------------------------------------------------------------
# value decoding (reader side — written independently from the spec)
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def read_long(self) -> int:
        zz = 0
        shift = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated varint")
            b = self.data[self.pos]
            self.pos += 1
            zz |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("varint too long")
        if zz >> 64:
            # a conforming varint never exceeds 64 zigzag bits; an
            # out-of-range value must quarantine its BLOCK here, not
            # crash the whole task later at the Arrow long conversion
            # (review r9)
            raise ValueError("varint overflows 64 bits")
        return (zz >> 1) ^ -(zz & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0 or self.pos + n > len(self.data):
            raise ValueError("bad bytes length")
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v

    def read_value(self, typ):
        if isinstance(typ, list):
            idx = self.read_long()
            if not 0 <= idx < len(typ):
                raise ValueError("bad union branch")
            return self.read_value(typ[idx])
        if isinstance(typ, dict):
            # logical-type annotation: decode as the base primitive
            return self.read_value(typ.get("type"))
        if typ == "null":
            return None
        if typ in ("long", "int"):
            return self.read_long()
        if typ == "string":
            return self.read_bytes().decode("utf-8")
        if typ == "bytes":
            return bytes(self.read_bytes())
        if typ == "boolean":
            if self.pos >= len(self.data):
                raise ValueError("truncated boolean")
            b = self.data[self.pos]
            self.pos += 1
            if b not in (0, 1):
                raise ValueError("bad boolean byte")
            return bool(b)
        if typ == "double":
            if self.pos + 8 > len(self.data):
                raise ValueError("truncated double")
            (v,) = struct.unpack_from("<d", self.data, self.pos)
            self.pos += 8
            return v
        if typ == "float":
            if self.pos + 4 > len(self.data):
                raise ValueError("truncated float")
            (v,) = struct.unpack_from("<f", self.data, self.pos)
            self.pos += 4
            return v
        raise ValueError(f"unsupported avro type {typ!r}")


def _prim_of(t):
    """Resolve a type node to its primitive name: bare prims pass
    through; dict-annotated prims — the logical-type convention, e.g.
    {"type": "long", "logicalType": "timestamp-micros"} — resolve to
    their base primitive (values decode as the base type; logical
    interpretation is the consumer's). Anything else is None."""
    if isinstance(t, str) and t in _SUPPORTED_PRIMS:
        return t
    if isinstance(t, dict) and t.get("type") in _SUPPORTED_PRIMS:
        return t["type"]
    return None


def _schema_supported(schema) -> bool:
    if not isinstance(schema, dict) or schema.get("type") != "record":
        return False
    for f in schema.get("fields", []):
        t = f.get("type")
        if isinstance(t, list):
            if not all(
                x == "null" or _prim_of(x) is not None for x in t
            ):
                return False
        elif _prim_of(t) is None:
            return False
    return True


def _decode_container(name: str, data: bytes) -> Iterator[tuple]:
    """One OCF → ('row', dict) / ('quarantine', block_idx, reason)
    events. Corrupt blocks resync on the next sync marker; an
    unreadable container yields one bad_container event."""
    try:
        if data[:4] != _MAGIC:
            raise ValueError("bad magic")
        r = _Reader(data, 4)
        meta: dict[str, bytes] = {}
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:  # spec: negative count blocks carry a size
                r.read_long()
                count = -count
            for _ in range(count):
                k = r.read_bytes().decode("utf-8")
                meta[k] = bytes(r.read_bytes())
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported codec {codec!r}")
        if not _schema_supported(schema):
            raise ValueError("unsupported schema shape")
        if r.pos + 16 > len(data):
            raise ValueError("truncated header sync")
        sync = data[r.pos : r.pos + 16]
        pos = r.pos + 16
    except Exception as e:
        yield ("quarantine", -1, f"bad_container:{type(e).__name__}")
        return

    block_idx = -1
    n = len(data)
    while pos < n:
        block_idx += 1
        block_start = pos
        try:
            r = _Reader(data, pos)
            count = r.read_long()
            size = r.read_long()
            if count < 0 or size < 0 or r.pos + size + 16 > n:
                raise ValueError("block frame out of bounds")
            payload = data[r.pos : r.pos + size]
            if data[r.pos + size : r.pos + size + 16] != sync:
                raise ValueError("sync marker mismatch")
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            br = _Reader(payload)
            rows = []
            for _ in range(count):
                rows.append(
                    {
                        f["name"]: br.read_value(f["type"])
                        for f in schema["fields"]
                    }
                )
            if br.pos != len(payload):
                raise ValueError("trailing bytes in block")
            pos = r.pos + size + 16
        except Exception:
            yield ("quarantine", block_idx, "corrupt_block")
            # resync: scan for the next sync marker and resume after
            # it — one flipped byte costs one block, never the tail
            nxt = data.find(sync, block_start + 1)
            if nxt < 0:
                return
            pos = nxt + 16
            continue
        for row in rows:
            yield ("row", block_idx, row)


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


def _partition_containers(
    binary: DataFrame, required_fields: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """The stateless decode shared by batch and streaming readers:
    (path, content) → (typed docs, quarantine)."""
    out_fields = list(DOC_SCHEMA.fields) + [
        StructField("__q_file", StringType(), True),
        StructField("__q_block", LongType(), True),
        StructField("__q_reason", StringType(), True),
    ]
    out_schema = StructType(out_fields)
    doc_cols = [f.name for f in DOC_SCHEMA.fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                for ev in _decode_container(path, data):
                    if ev[0] == "quarantine":
                        rows.append(
                            {c: None for c in doc_cols}
                            | {
                                "__q_file": path,
                                "__q_block": ev[1],
                                "__q_reason": ev[2],
                            }
                        )
                    else:
                        _, bidx, row = ev
                        missing = next(
                            (c for c in required_fields if row.get(c) is None),
                            None,
                        )
                        if missing is not None:
                            rows.append(
                                {c: None for c in doc_cols}
                                | {
                                    "__q_file": path,
                                    "__q_block": bidx,
                                    "__q_reason": f"missing:{missing}",
                                }
                            )
                        else:
                            rows.append(
                                {c: row.get(c) for c in doc_cols}
                                | {
                                    "__q_file": None,
                                    "__q_block": None,
                                    "__q_reason": None,
                                }
                            )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_fields]
            ).astype(object)

    decoded = binary.select("path", "content").mapInPandas(
        decode, out_schema
    )
    docs = decoded.filter(F.col("__q_reason").isNull()).select(*doc_cols)
    quarantine = decoded.filter(F.col("__q_reason").isNotNull()).select(
        F.col("__q_file").alias("source_file"),
        F.col("__q_block").alias("block_index"),
        F.col("__q_reason").alias("reason"),
    )
    return docs, quarantine


def read_avro_docs(
    spark: SparkSession,
    path: str,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """(docs, quarantine) from a directory of ``.avro`` containers.

    ``docs`` carries DOC_SCHEMA for every decoded record with all
    ``required_fields`` non-null; ``quarantine`` is (source_file,
    block_index, reason ∈ {'corrupt_block', 'bad_container:…',
    'missing:<field>'}). Every block of every input file lands in
    exactly one of the two frames (tested); both are projections of
    one binaryFile scan + one Arrow-batched decode."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
    )
    return _partition_containers(binary, required_fields)


def read_avro_stream(
    spark: SparkSession,
    path: str,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_avro_docs``: newly landed containers
    become micro-batches of (typed docs, quarantine) through the SAME
    stateless decode, so batch == stream row for row (the
    read_orc_stream / read_warc_stream convention)."""
    reader = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    binary = reader.load(path)
    return _partition_containers(binary, required_fields)


def write_avro_archive(
    docs: DataFrame,
    out_dir: str,
    deflate_every_other: bool = True,
    rows_per_block: int = 200,
) -> DataFrame:
    """Export (doc_id, text, lang, source, n_chars) rows as Avro
    containers — one file per partition (the warc_source sink
    discipline: tmp-name + ``os.rename`` per task, rule 17; a retried
    task can only leave a stale tmp, never a torn container). Odd
    partitions write ``avro.codec=deflate`` when ``deflate_every_other``
    so a round trip exercises both codecs. Returns a (file, n_records)
    report frame; the caller drains it to execute the write and owns
    the directory lifecycle. Same shared-filesystem deployment
    constraint as ``write_warc_archive``."""
    import os as _os
    import uuid as _uuid

    import pandas as pd

    from pyspark.sql.functions import spark_partition_id

    cols = [f.name for f in DOC_SCHEMA.fields]
    src = docs.select(*cols, spark_partition_id().alias("__pid"))

    def write_partition(batches):
        rows: list[dict] = []
        pid = 0
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                pid = int(rec.pop("__pid"))
                rows.append(
                    {
                        k: (None if v is None or v != v else
                            int(v) if k in ("doc_id", "n_chars") else v)
                        for k, v in rec.items()
                    }
                )
        if not rows:
            return
        codec = "deflate" if deflate_every_other and pid % 2 else "null"
        data = encode_avro_container(
            rows, DOC_AVRO_SCHEMA, codec, rows_per_block
        )
        name = f"part-{pid:05d}.avro"
        _commit_file(out_dir, name, data)
        yield pd.DataFrame({"file": [name], "n_records": [len(rows)]})

    return src.mapInPandas(
        write_partition, "file string, n_records long"
    )
