"""Avro OCF source (sources/avro_source.py): spec micro-goldens per
direction, corrupt-block resync, quarantine partition exactness, and
the distributed write → read round trip."""

from __future__ import annotations

import json
import struct

import pytest

from jobinsight_data_pipeline_v2_spark.sources.avro_source import (
    DOC_AVRO_SCHEMA,
    _MAGIC,
    _Reader,
    _decode_container,
    _enc_long,
    _enc_record,
    encode_avro_container,
    read_avro_docs,
    write_avro_archive,
)

_ROWS = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s",
     "n_chars": 11},
    {"doc_id": 2, "text": None, "lang": None, "source": "t", "n_chars": 0},
    {"doc_id": -5, "text": "xin chào", "lang": "vi", "source": None,
     "n_chars": 8},
]


def test_varint_zigzag_spec_goldens():
    """The Avro spec's own int/long encoding table: 0→00, -1→01, 1→02,
    -2→03, 2→04, -64→7f, 64→80 01."""
    for n, b in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
        (8192, b"\x80\x80\x01"),
    ]:
        assert _enc_long(n) == b, n
        r = _Reader(b)
        assert r.read_long() == n and r.pos == len(b)


def test_container_header_structure_golden():
    """Hand-parse the emitted container: magic, metadata map with
    avro.schema + avro.codec, 16-byte sync, then count/size-framed
    blocks each terminated by the SAME sync — the OCF spec layout,
    parsed independently of the module's reader."""
    sync = b"0123456789abcdef"
    data = encode_avro_container(
        _ROWS, DOC_AVRO_SCHEMA, "null", rows_per_block=2, sync=sync
    )
    assert data[:4] == _MAGIC

    def rd_long(pos):
        zz, sh = 0, 0
        while True:
            b = data[pos]
            pos += 1
            zz |= (b & 0x7F) << sh
            if not b & 0x80:
                break
            sh += 7
        return (zz >> 1) ^ -(zz & 1), pos

    pos = 4
    count, pos = rd_long(pos)
    assert count == 2
    meta = {}
    for _ in range(2):
        klen, pos = rd_long(pos)
        k = data[pos : pos + klen].decode()
        pos += klen
        vlen, pos = rd_long(pos)
        meta[k] = data[pos : pos + vlen]
        pos += vlen
    zero, pos = rd_long(pos)
    assert zero == 0
    assert json.loads(meta["avro.schema"])["name"] == "doc"
    assert meta["avro.codec"] == b"null"
    assert data[pos : pos + 16] == sync
    pos += 16
    # two blocks: 2 rows then 1 row, each sync-terminated
    counts = []
    while pos < len(data):
        c, pos = rd_long(pos)
        size, pos = rd_long(pos)
        counts.append(c)
        pos += size
        assert data[pos : pos + 16] == sync
        pos += 16
    assert counts == [2, 1] and pos == len(data)


def test_record_encoding_golden():
    """One record, hand-computed bytes: every field is a ["null", T]
    union — zigzag branch index then the value."""
    row = {"doc_id": 3, "text": "ab", "lang": None, "source": "s",
           "n_chars": 2}
    enc = _enc_record(DOC_AVRO_SCHEMA, row)
    expect = (
        b"\x02\x06"          # union branch 1, long zigzag(3)=6
        + b"\x02\x04ab"      # branch 1, string len 2
        + b"\x00"            # lang: branch 0 (null)
        + b"\x02\x02s"       # source
        + b"\x02\x04"        # n_chars 2
    )
    assert enc == expect
    r = _Reader(enc)
    got = {
        f["name"]: r.read_value(f["type"])
        for f in DOC_AVRO_SCHEMA["fields"]
    }
    assert got == row and r.pos == len(enc)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    rows = _ROWS * 100
    data = encode_avro_container(rows, DOC_AVRO_SCHEMA, codec,
                                 rows_per_block=37)
    got = [e[2] for e in _decode_container("f", data) if e[0] == "row"]
    assert got == rows


def test_corrupt_block_resyncs_and_costs_one_block():
    """One flipped byte quarantines exactly its 37-row block; the sync
    scan recovers every later block — rows ∪ quarantined-block rows
    partition the input exactly."""
    rows = [
        {"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s",
         "n_chars": 5}
        for i in range(300)
    ]
    data = bytearray(
        encode_avro_container(rows, DOC_AVRO_SCHEMA, "null",
                              rows_per_block=37)
    )
    data[len(data) // 2] ^= 0xFF
    evs = list(_decode_container("f", bytes(data)))
    quar = [e for e in evs if e[0] == "quarantine"]
    got = [e[2]["doc_id"] for e in evs if e[0] == "row"]
    assert len(quar) == 1 and quar[0][2] == "corrupt_block"
    bad_block = quar[0][1]
    lost = set(range(bad_block * 37, min((bad_block + 1) * 37, 300)))
    assert set(got) == set(range(300)) - lost
    # the blocks AFTER the corrupt one were recovered
    assert max(got) == 299


def test_unreadable_containers_quarantine_once():
    assert list(_decode_container("f", b"JUNKJUNKJUNK")) == [
        ("quarantine", -1, "bad_container:ValueError")
    ]
    # valid magic, garbage metadata
    evs = list(_decode_container("f", _MAGIC + b"\xff\xff\xff\xff"))
    assert len(evs) == 1 and evs[0][2].startswith("bad_container")
    # unsupported schema shape (array field) is a container-level reject
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "a",
                          "type": {"type": "array", "items": "long"}}]}
    from jobinsight_data_pipeline_v2_spark.sources import avro_source as av

    raw = bytearray(_MAGIC)
    raw += av._enc_long(1)
    raw += av._enc_str("avro.schema")
    raw += av._enc_bytes(json.dumps(schema).encode())
    raw += av._enc_long(0)
    raw += b"s" * 16
    evs = list(_decode_container("f", bytes(raw)))
    assert len(evs) == 1 and evs[0][2].startswith("bad_container")


def test_spark_write_read_roundtrip_and_quarantine(spark, tmp_path):
    """Distributed export (both codecs across partitions) reads back
    exactly; required-field nulls quarantine row-level; docs ∪
    quarantine account for every record."""
    out = str(tmp_path / "avro")
    src = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 7) for i in range(50)]
        + [(None, "orphan", "en", "s", 6), (77, None, "vi", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    report = write_avro_archive(src.repartition(4), out).collect()
    assert sum(r.n_records for r in report) == 52
    import glob

    files = glob.glob(out + "/*.avro")
    assert len(files) == len(report)
    assert not glob.glob(out + "/.tmp-*")  # rule-17 rename discipline

    docs, quar = read_avro_docs(spark, out)
    got = {(r.doc_id, r.text) for r in docs.collect()}
    assert got == {(i, f"text {i}") for i in range(50)}
    reasons = sorted(r.reason for r in quar.collect())
    assert reasons == ["missing:doc_id", "missing:text"]
    # both codecs actually exercised across the 4 partitions
    metas = set()
    for f in files:
        with open(f, "rb") as fh:
            head = fh.read(4096)
        metas.add(b"deflate" in head)
    assert metas == {True, False}


def test_oversized_varint_quarantines_block_not_task():
    """Review r9: a varint decoding past 64 bits (10 bytes of 0xFF…)
    must quarantine its block — an out-of-range Python int would
    otherwise crash the Arrow long conversion for the whole file."""
    sync = b"0123456789abcdef"
    good = encode_avro_container(
        [_ROWS[0]], DOC_AVRO_SCHEMA, "null", sync=sync
    )
    # block: 1 record, 10 payload bytes forming a >64-bit varint
    bad_payload = b"\xff" * 9 + b"\x7f"
    bad = (
        _enc_long(1) + _enc_long(len(bad_payload)) + bad_payload + sync
    )
    enc = _enc_record(DOC_AVRO_SCHEMA, _ROWS[2])
    tail = _enc_long(1) + _enc_long(len(enc)) + enc + sync
    evs = list(_decode_container("f", good + bad + tail))
    kinds = [(e[0], e[2] if e[0] == "quarantine" else e[2]["doc_id"])
             for e in evs]
    assert kinds == [
        ("row", _ROWS[0]["doc_id"]),
        ("quarantine", "corrupt_block"),
        ("row", _ROWS[2]["doc_id"]),
    ]


def test_reader_tolerates_writer_schema_drift(spark, tmp_path):
    """Avro producers evolve: a container whose writer schema carries
    an EXTRA field (decoded and dropped) or OMITS an optional field
    (reads as NULL) must still land its rows — the resolution a
    Kafka-ecosystem reader needs. Field matching is by NAME from the
    embedded writer schema, never by position."""
    import os

    extra_schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"]},
            {"name": "crawl_ts", "type": ["null", "long"]},  # extra
            {"name": "text", "type": ["null", "string"]},
            {"name": "lang", "type": ["null", "string"]},
            {"name": "source", "type": ["null", "string"]},
            {"name": "n_chars", "type": ["null", "long"]},
        ],
    }
    slim_schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "text", "type": ["null", "string"]},
            {"name": "doc_id", "type": ["null", "long"]},  # reordered
        ],
    }
    out = str(tmp_path / "drift")
    os.makedirs(out)
    with open(os.path.join(out, "a.avro"), "wb") as f:
        f.write(encode_avro_container(
            [{"doc_id": 1, "crawl_ts": 999, "text": "wide row",
              "lang": "en", "source": "s", "n_chars": 8}],
            extra_schema,
        ))
    with open(os.path.join(out, "b.avro"), "wb") as f:
        f.write(encode_avro_container(
            [{"text": "slim row", "doc_id": 2}], slim_schema,
        ))
    docs, quar = read_avro_docs(spark, out)
    got = {r.doc_id: (r.text, r.lang, r.n_chars) for r in docs.collect()}
    assert got == {
        1: ("wide row", "en", 8),
        2: ("slim row", None, None),  # omitted optionals read as NULL
    }
    assert quar.count() == 0


def test_logical_type_annotations_decode_as_base_primitive():
    """Real producers annotate prims with logicalType (timestamp-
    micros, date, …) as {"type": prim, "logicalType": …} dicts; the
    reader must resolve them to the base primitive instead of
    rejecting the container."""
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id",
             "type": ["null",
                      {"type": "long", "logicalType": "timestamp-micros"}]},
            {"name": "text", "type": ["null", "string"]},
            {"name": "lang",
             "type": {"type": "string", "logicalType": "uuid"}},
            {"name": "source", "type": ["null", "string"]},
            {"name": "n_chars", "type": ["null", "long"]},
        ],
    }
    rows = [{"doc_id": 1690000000000000, "text": "ts doc", "lang": "en",
             "source": "s", "n_chars": 6}]
    data = encode_avro_container(rows, schema, "null")
    evs = list(_decode_container("f", data))
    assert evs == [("row", 0, rows[0])]
