"""TFRecord source (S23): the de-facto training-data container —
length-prefixed frames with masked CRC32C integrity, ``tf.train.
Example`` protobuf payloads — with record-level quarantine and the
matching distributed sink. Pure stdlib (the operators/png.py
discipline: encode and decode written independently from the published
spec, each direction pinned by micro-goldens so a compensating bug
cannot hide in the round trip).

Frame format (TensorFlow TFRecord spec): each record is

    uint64 length            (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

where ``masked_crc = rotr(crc32c(x), 15) + 0xa282ead8 (mod 2^32)`` and
crc32c is the Castagnoli polynomial (0x82F63B78 reflected) — NOT
zlib's crc32; the table is built at import. Payloads are
``tf.train.Example`` messages on the protobuf wire format:
``Example{features=1}``, ``Features{map<string,Feature> feature=1}``
(map = repeated entry messages with key=1/value=2), ``Feature`` oneof
``bytes_list=1 / float_list=2 / int64_list=3``; list values accept
both packed (proto3 default) and unpacked encodings, and unknown
fields are skipped by wire type (schema-drift tolerance, the Avro
reader convention).

Quarantine model — and the deliberate contrast with Avro: TFRecord has
NO sync markers, so framing integrity lives entirely in the length
CRC. A record whose PAYLOAD fails its CRC (or fails proto parsing, or
misses a required feature) quarantines as ONE row and the reader
continues — the frame boundary is still trustworthy. A record whose
LENGTH fails its CRC quarantines as ``framing_lost`` and the REST OF
THE FILE is unreachable (there is nothing to resync on; this is the
format's real failure mode and the gate pins it: the tail rows must
NOT reappear). EOF mid-record quarantines as ``truncated``. Reasons:
``bad_payload_crc`` / ``bad_proto`` / ``bad_type:<field>`` (a
feature carried in the wrong proto kind) / ``missing:<field>`` /
``framing_lost`` / ``truncated``.

Scale shape: the FILE is the unit of parallelism (built-in
``binaryFile`` source, one task per ``.tfrecord``, the warc/avro
contract); decoding runs in one Arrow-batched ``mapInPandas``. The
sink writes one file per partition through ``commit_file`` (rule 17
tmp+rename: a retried task can only leave invisible residue, never a
torn file). The pure-Python CRC32C is the documented single-node
cost; a cluster deployment swaps in a native crc32c wheel with the
same 4-byte contract.

Reference analog: none (net-new interchange breadth — the training-
data container the engine's curation output feeds).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ._atomic import commit_file as _commit_file

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
        StructField("record_index", LongType(), True),
        StructField("reason", StringType(), True),
    ]
)

# which proto list type carries each documents column
_INT64_FIELDS = ("doc_id", "n_chars")
_BYTES_FIELDS = ("text", "lang", "source")


# ---------------------------------------------------------------------------
# CRC32C (Castagnoli) + TFRecord masking
# ---------------------------------------------------------------------------

_CRC32C_POLY = 0x82F63B78  # reflected Castagnoli


def _build_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tbl = _CRC_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc32c(data: bytes) -> int:
    """TFRecord's masked CRC: rotate right 15, add the mask delta."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire encoding (writer side)
# ---------------------------------------------------------------------------


def _pb_varint(n: int) -> bytes:
    """Base-128 LE varint; negative int64 encodes as 10-byte
    two's-complement per the protobuf spec."""
    if n < 0:
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_tag(field: int, wire: int) -> bytes:
    return _pb_varint((field << 3) | wire)


def _pb_len_delim(field: int, payload: bytes) -> bytes:
    return _pb_tag(field, 2) + _pb_varint(len(payload)) + payload


def _feature_bytes(values: list[bytes]) -> bytes:
    """Feature{bytes_list=1}; BytesList{repeated bytes value=1}."""
    inner = b"".join(_pb_len_delim(1, v) for v in values)
    return _pb_len_delim(1, inner)


def _feature_int64(values: list[int]) -> bytes:
    """Feature{int64_list=3}; Int64List{repeated int64 value=1,
    packed} — the proto3 default encoding."""
    inner = _pb_len_delim(1, b"".join(_pb_varint(v) for v in values))
    return _pb_len_delim(3, inner)


def encode_example(row: dict) -> bytes:
    """One documents row → a tf.train.Example message. None-valued
    columns are OMITTED (the protobuf absent-field convention — the
    reader reports them as missing:<field> when required)."""
    entries = []
    for name in _INT64_FIELDS:
        v = row.get(name)
        if v is not None:
            entries.append((name, _feature_int64([int(v)])))
    for name in _BYTES_FIELDS:
        v = row.get(name)
        if v is not None:
            entries.append(
                (name, _feature_bytes([str(v).encode("utf-8")]))
            )
    # Features{map<string,Feature>}: repeated entry{key=1, value=2};
    # sorted for determinism (map order is unspecified on the wire)
    feats = b"".join(
        _pb_len_delim(
            1, _pb_len_delim(1, k.encode("utf-8")) + _pb_len_delim(2, v)
        )
        for k, v in sorted(entries)
    )
    return _pb_len_delim(1, feats)  # Example{features=1}


def frame_record(payload: bytes) -> bytes:
    """Payload → one TFRecord frame (length + masked CRCs)."""
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", masked_crc32c(header))
        + payload
        + struct.pack("<I", masked_crc32c(payload))
    )


def encode_tfrecord_file(rows: list[dict]) -> bytes:
    return b"".join(frame_record(encode_example(r)) for r in rows)


# ---------------------------------------------------------------------------
# protobuf wire decoding (reader side — written independently)
# ---------------------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    if n >> 64:
        raise ValueError("varint overflows 64 bits")
    if n >= 1 << 63:  # two's-complement int64
        n -= 1 << 64
    return n, pos


def _walk_fields(data: bytes) -> Iterator[tuple[int, int, object]]:
    """Generic message walker: yields (field, wire, value) where value
    is an int for wire 0, bytes for wire 2, raw bytes for wires 1/5.
    Unknown wire types raise (malformed message)."""
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if field <= 0:
            raise ValueError("bad field number")
        if wire == 0:
            v, pos = _read_varint(data, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if ln < 0 or pos + ln > n:
                raise ValueError("bad length-delimited size")
            yield field, wire, data[pos : pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            yield field, wire, data[pos : pos + 4]
            pos += 4
        elif wire == 1:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            yield field, wire, data[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _decode_int64_list(data: bytes) -> list[int]:
    out: list[int] = []
    for field, wire, v in _walk_fields(data):
        if field == 1 and wire == 2:  # packed
            pos = 0
            while pos < len(v):
                x, pos = _read_varint(v, pos)
                out.append(x)
        elif field == 1 and wire == 0:  # unpacked
            out.append(v)
    return out


def _decode_bytes_list(data: bytes) -> list[bytes]:
    return [
        v
        for field, wire, v in _walk_fields(data)
        if field == 1 and wire == 2
    ]


def decode_example(data: bytes) -> dict:
    """tf.train.Example bytes → {feature name: int | str}. Raises
    ValueError on malformed wire data; unknown fields and feature
    kinds are skipped (drift tolerance)."""
    feats = None
    for field, wire, v in _walk_fields(data):
        if field == 1 and wire == 2:
            feats = v
    if feats is None:
        raise ValueError("no features message")
    row: dict = {}
    for field, wire, entry in _walk_fields(feats):
        if field != 1 or wire != 2:
            continue
        key = None
        feature = None
        for f2, w2, v2 in _walk_fields(entry):
            if f2 == 1 and w2 == 2:
                key = v2.decode("utf-8")
            elif f2 == 2 and w2 == 2:
                feature = v2
        if key is None or feature is None:
            continue
        for f3, w3, v3 in _walk_fields(feature):
            if f3 == 3 and w3 == 2:  # int64_list
                vals = _decode_int64_list(v3)
                if vals:
                    row[key] = vals[0]
            elif f3 == 1 and w3 == 2:  # bytes_list
                vals_b = _decode_bytes_list(v3)
                if vals_b:
                    row[key] = vals_b[0].decode("utf-8")
            # float_list (f3 == 2) and unknown kinds: skipped
    return row


def _decode_tfrecord(data: bytes) -> Iterator[tuple]:
    """One file's bytes → ('row', idx, dict) / ('quarantine', idx,
    reason) events. Payload-level damage costs one record; length-CRC
    damage costs the tail (framing_lost) — there is no sync marker to
    resync on, by format design."""
    pos = 0
    n = len(data)
    idx = -1
    while pos < n:
        idx += 1
        if pos + 12 > n:
            yield ("quarantine", idx, "truncated")
            return
        header = data[pos : pos + 8]
        (length_crc,) = struct.unpack_from("<I", data, pos + 8)
        if masked_crc32c(header) != length_crc:
            yield ("quarantine", idx, "framing_lost")
            return
        (length,) = struct.unpack("<Q", header)
        body_start = pos + 12
        if length > n - body_start - 4:
            yield ("quarantine", idx, "truncated")
            return
        payload = data[body_start : body_start + length]
        (payload_crc,) = struct.unpack_from(
            "<I", data, body_start + length
        )
        pos = body_start + length + 4
        if masked_crc32c(payload) != payload_crc:
            yield ("quarantine", idx, "bad_payload_crc")
            continue
        try:
            row = decode_example(payload)
        except Exception:
            yield ("quarantine", idx, "bad_proto")
            continue
        yield ("row", idx, row)


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


def _partition_records(
    binary: DataFrame, required_fields: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """The stateless decode shared by batch and streaming readers:
    (path, content) → (typed docs, quarantine)."""
    out_fields = list(DOC_SCHEMA.fields) + [
        StructField("__q_file", StringType(), True),
        StructField("__q_rec", LongType(), True),
        StructField("__q_reason", StringType(), True),
    ]
    out_schema = StructType(out_fields)
    doc_cols = [f.name for f in DOC_SCHEMA.fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for ev in _decode_tfrecord(bytes(content)):
                    if ev[0] == "quarantine":
                        rows.append(
                            {c: None for c in doc_cols}
                            | {
                                "__q_file": path,
                                "__q_rec": ev[1],
                                "__q_reason": ev[2],
                            }
                        )
                        continue
                    _, ridx, row = ev
                    # a drifted producer can carry a feature in the
                    # WRONG proto kind (doc_id as bytes_list decodes
                    # to str) — without this guard the row passes the
                    # required check and then kills the whole task at
                    # Arrow conversion instead of quarantining
                    # (review r12)
                    bad_kind = next(
                        (
                            c
                            for c in doc_cols
                            if row.get(c) is not None
                            and not isinstance(
                                row[c],
                                int if c in _INT64_FIELDS else str,
                            )
                        ),
                        None,
                    )
                    if bad_kind is not None:
                        rows.append(
                            {c: None for c in doc_cols}
                            | {
                                "__q_file": path,
                                "__q_rec": ridx,
                                "__q_reason": f"bad_type:{bad_kind}",
                            }
                        )
                        continue
                    missing = next(
                        (c for c in required_fields if row.get(c) is None),
                        None,
                    )
                    if missing is not None:
                        rows.append(
                            {c: None for c in doc_cols}
                            | {
                                "__q_file": path,
                                "__q_rec": ridx,
                                "__q_reason": f"missing:{missing}",
                            }
                        )
                    else:
                        rows.append(
                            {c: row.get(c) for c in doc_cols}
                            | {
                                "__q_file": None,
                                "__q_rec": None,
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
        F.col("__q_rec").alias("record_index"),
        F.col("__q_reason").alias("reason"),
    )
    return docs, quarantine


def read_tfrecord_docs(
    spark: SparkSession,
    path: str,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """(docs, quarantine) from a directory of ``.tfrecord`` files.

    ``docs`` carries DOC_SCHEMA for every frame that passes both CRCs,
    parses as an Example, and has all ``required_fields``;
    ``quarantine`` is (source_file, record_index, reason ∈
    {'bad_payload_crc', 'bad_proto', 'bad_type:<f>', 'missing:<f>',
    'framing_lost', 'truncated'}). Both frames are projections of ONE binaryFile scan
    + one Arrow-batched decode. A framing_lost row means the file's
    TAIL is gone too — the caller alerting on quarantine should treat
    it as a file-level incident, not a row-level one."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tfrecord")
        .load(path)
    )
    return _partition_records(binary, required_fields)


def read_tfrecord_stream(
    spark: SparkSession,
    path: str,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_tfrecord_docs``: newly landed files
    become micro-batches of (typed docs, quarantine) through the SAME
    stateless decode, so batch == stream row for row (the
    read_avro_stream convention)."""
    reader = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.tfrecord")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    binary = reader.load(path)
    return _partition_records(binary, required_fields)


def write_tfrecord_archive(docs: DataFrame, out_dir: str) -> DataFrame:
    """Export (doc_id, text, lang, source, n_chars) rows as TFRecord
    files — one file per partition, committed through ``commit_file``
    (rule 17). Returns a (file, n_records) report frame; the caller
    drains it to execute the write and owns the directory lifecycle
    (the write_avro_archive contract)."""
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
                        k: (
                            None
                            if v is None or v != v
                            else int(v)
                            if k in _INT64_FIELDS
                            else v
                        )
                        for k, v in rec.items()
                    }
                )
        if not rows:
            return
        name = f"part-{pid:05d}.tfrecord"
        _commit_file(out_dir, name, encode_tfrecord_file(rows))
        yield pd.DataFrame({"file": [name], "n_records": [len(rows)]})

    return src.mapInPandas(write_partition, "file string, n_records long")
