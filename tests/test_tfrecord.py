"""TFRecord source (S23): CRC32C/masking goldens, protobuf wire
goldens (spec-transcribed, so a compensating encoder/decoder bug
cannot hide in the round trip), frame-level quarantine semantics, and
the Spark write→read round trip."""

import os
import struct

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.sources.tfrecord_source import (
    _decode_tfrecord,
    crc32c,
    decode_example,
    encode_example,
    encode_tfrecord_file,
    frame_record,
    masked_crc32c,
    read_tfrecord_docs,
    write_tfrecord_archive,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# CRC32C — pinned against the standard check value AND an independent
# bitwise (table-free) implementation
# ---------------------------------------------------------------------------


def _crc32c_bitwise(data: bytes) -> int:
    """Independent reference: bit-at-a-time reflected Castagnoli."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
    return crc ^ 0xFFFFFFFF


def test_crc32c_check_value():
    # the canonical CRC-32C check value (RFC 3720 appendix / every
    # published implementation): crc of the ASCII digits 1..9
    assert crc32c(b"123456789") == 0xE3069283


@pytest.mark.parametrize(
    "data",
    [b"", b"\x00", b"a", b"123456789", b"tfrecord" * 33, bytes(range(256))],
)
def test_crc32c_matches_bitwise_reference(data):
    assert crc32c(data) == _crc32c_bitwise(data)


def test_masked_crc_formula():
    # mask = rotr(crc, 15) + 0xa282ead8 mod 2^32, transcribed
    # independently here from the TFRecord spec
    for data in (b"", b"123456789", b"xyz"):
        c = _crc32c_bitwise(data)
        expect = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked_crc32c(data) == expect


# ---------------------------------------------------------------------------
# protobuf wire goldens (hand-assembled from the proto2/3 wire spec)
# ---------------------------------------------------------------------------


def test_example_encoding_golden():
    # Example{features=1}; Features{entry=1}; entry{key=1,value=2};
    # Feature{bytes_list=1, int64_list=3}; lists field 1, int64 packed
    got = encode_example({"doc_id": 1, "text": "a"})
    entry_doc_id = bytes(
        [0x0A, 0x0F]  # Features.feature entry, 15 bytes
        + [0x0A, 0x06] + list(b"doc_id")  # key
        + [0x12, 0x05, 0x1A, 0x03, 0x0A, 0x01, 0x01]  # Feature/Int64List[1]
    )
    entry_text = bytes(
        [0x0A, 0x0D]  # 13 bytes
        + [0x0A, 0x04] + list(b"text")
        + [0x12, 0x05, 0x0A, 0x03, 0x0A, 0x01, 0x61]  # Feature/BytesList["a"]
    )
    feats = entry_doc_id + entry_text
    assert got == bytes([0x0A, len(feats)]) + feats


def test_frame_golden():
    payload = b"abc"
    frame = frame_record(payload)
    assert struct.unpack("<Q", frame[:8])[0] == 3
    assert struct.unpack("<I", frame[8:12])[0] == masked_crc32c(frame[:8])
    assert frame[12:15] == payload
    assert struct.unpack("<I", frame[15:19])[0] == masked_crc32c(payload)
    assert len(frame) == 19


def test_example_roundtrip_and_none_omission():
    row = {"doc_id": 7, "text": "xin chào", "lang": "vi",
           "source": None, "n_chars": 8}
    back = decode_example(encode_example(row))
    assert back == {"doc_id": 7, "text": "xin chào", "lang": "vi",
                    "n_chars": 8}  # None column absent, not null


def test_decoder_accepts_unpacked_int64_and_skips_unknown_fields():
    # hand-build an Example whose int64_list uses UNPACKED encoding
    # (tag 0x08 per element) and which carries an unknown field 9 plus
    # an unknown Feature kind (float_list) — all must be tolerated
    int64_unpacked = bytes([0x1A, 0x02, 0x08, 0x2A])  # Int64List{value:42}
    entry = (
        bytes([0x0A, 0x02]) + b"id"
        + bytes([0x12, len(int64_unpacked)]) + int64_unpacked
    )
    feats = bytes([0x0A, len(entry)]) + entry
    unknown = bytes([0x48, 0x01])  # field 9, varint — must be skipped
    msg = bytes([0x0A, len(feats)]) + feats + unknown
    assert decode_example(msg) == {"id": 42}


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        decode_example(b"\x00\x01\x02")  # field number 0
    with pytest.raises(ValueError):
        decode_example(b"\x0a\xff")  # length past end


# ---------------------------------------------------------------------------
# file-level quarantine semantics
# ---------------------------------------------------------------------------


def _mk(i, text="doc text", lang="en"):
    return {"doc_id": i, "text": text, "lang": lang, "source": "s",
            "n_chars": len(text)}


def _events(data):
    return list(_decode_tfrecord(bytes(data)))


def test_clean_file_decodes_every_row():
    data = encode_tfrecord_file([_mk(i) for i in range(5)])
    evs = _events(data)
    assert [e[0] for e in evs] == ["row"] * 5
    assert [e[2]["doc_id"] for e in evs] == list(range(5))


def test_payload_damage_costs_one_record():
    rows = [_mk(0), _mk(1), _mk(2)]
    f0 = frame_record(encode_example(rows[0]))
    f1 = bytearray(frame_record(encode_example(rows[1])))
    f1[14] ^= 0x55  # payload byte
    f2 = frame_record(encode_example(rows[2]))
    evs = _events(f0 + bytes(f1) + f2)
    assert [e[0] for e in evs] == ["row", "quarantine", "row"]
    assert evs[1][2] == "bad_payload_crc"
    assert evs[2][2]["doc_id"] == 2  # the frame AFTER still decodes


def test_length_crc_damage_loses_the_tail():
    f0 = frame_record(encode_example(_mk(0)))
    f1 = bytearray(frame_record(encode_example(_mk(1))))
    f1[9] ^= 0x01  # length-CRC byte
    f2 = frame_record(encode_example(_mk(2)))
    evs = _events(f0 + bytes(f1) + f2)
    assert [e[0] for e in evs] == ["row", "quarantine"]
    assert evs[1][2] == "framing_lost"  # doc 2 is unreachable, by design


def test_truncation_quarantines_once():
    data = frame_record(encode_example(_mk(0)))
    evs = _events(data[: len(data) - 2])
    assert evs == [("quarantine", 0, "truncated")]
    evs2 = _events(data + b"\x01\x02")  # trailing junk < header size
    assert evs2[0][0] == "row" and evs2[1][2] == "truncated"


def test_crc_valid_garbage_payload_is_bad_proto():
    evs = _events(frame_record(b"\x00\x01\x02"))
    assert evs == [("quarantine", 0, "bad_proto")]


# ---------------------------------------------------------------------------
# Spark round trip
# ---------------------------------------------------------------------------


def test_spark_roundtrip_and_required_fields(spark, tmp_path):
    out = str(tmp_path / "tfrec")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    write_tfrecord_archive(docs.repartition(3), out).collect()
    back, quar = read_tfrecord_docs(spark, out)
    assert quar.count() == 0
    orig = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in docs.collect()
    }
    got = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in back.collect()
    }
    assert got == orig

    # a record missing a required feature quarantines row-level
    with open(os.path.join(out, "extra.tfrecord"), "wb") as f:
        f.write(frame_record(encode_example(
            {"doc_id": None, "text": "no id", "lang": "en",
             "source": "s", "n_chars": 5})))
    _, quar2 = read_tfrecord_docs(spark, out)
    assert [r.reason for r in quar2.collect()] == ["missing:doc_id"]


def test_wrong_proto_kind_quarantines_not_crashes(spark, tmp_path):
    """A drifted producer carrying doc_id as a bytes_list must land
    one bad_type:doc_id quarantine row — never kill the scan at Arrow
    conversion (review r12)."""
    out = str(tmp_path / "drift")
    os.makedirs(out)
    # doc_id entry with a BytesList feature ("9" as bytes)
    feat = bytes([0x0A, 0x03, 0x0A, 0x01, 0x39])  # BytesList[b"9"]
    entry = (
        bytes([0x0A, 0x06]) + b"doc_id"
        + bytes([0x12, len(feat)]) + feat
    )
    # plus a proper text feature so only doc_id is drifted
    tfeat = bytes([0x0A, 0x03, 0x0A, 0x01, 0x61])
    tentry = (
        bytes([0x0A, 0x04]) + b"text"
        + bytes([0x12, len(tfeat)]) + tfeat
    )
    # each entry wraps in the Features.feature field (tag 0x0A + len)
    feats = (
        bytes([0x0A, len(entry)]) + entry
        + bytes([0x0A, len(tentry)]) + tentry
    )
    msg = bytes([0x0A, len(feats)]) + feats
    with open(os.path.join(out, "drift.tfrecord"), "wb") as f:
        f.write(frame_record(msg)
                + frame_record(encode_example(_mk(7))))
    docs, quar = read_tfrecord_docs(spark, out)
    assert [r.doc_id for r in docs.collect()] == [7]
    assert [r.reason for r in quar.collect()] == ["bad_type:doc_id"]
