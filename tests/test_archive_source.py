"""ZIP/TAR archive-container source (S22, sources/archive_source.py):
codec goldens, member/container quarantine classes, the distributed
write → read round trip over all four codec combos, and the
license_detect + curate_corpus ingest hops."""

from __future__ import annotations

import gzip
import io
import os
import struct
import tarfile
import zipfile

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.sources.archive_source import (
    archive_quarantine,
    archive_text_docs,
    parse_archive_bytes,
    read_archive_members,
    write_archive,
)


def _zip_bytes(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def _tar_bytes(members: list[tuple[str, bytes]], mode: str = "w") -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_parse_zip_and_tar_with_gz_members():
    raw = _zip_bytes(
        [("a/x.txt", b"hello"), ("a/y.txt.gz", gzip.compress(b"world"))]
    )
    rows = parse_archive_bytes("t.zip", raw)
    assert [(r["member_path"], r["content"], r["reason"]) for r in rows] == [
        ("a/x.txt", b"hello", None),
        ("a/y.txt.gz", b"world", None),
    ]
    raw = _tar_bytes(
        [("p/a.txt", b"AA"), ("p/b.txt.gz", gzip.compress(b"BB"))],
        mode="w:gz",
    )
    rows = parse_archive_bytes("t.tar.gz", raw)
    assert [(r["member_path"], r["content"], r["reason"]) for r in rows] == [
        ("p/a.txt", b"AA", None),
        ("p/b.txt.gz", b"BB", None),
    ]
    assert all(r["member_size"] == len(r["content"]) for r in rows)


def test_parse_garbage_is_bad_archive():
    rows = parse_archive_bytes("g.zip", b"this is not an archive")
    assert len(rows) == 1
    assert rows[0]["reason"].startswith("bad_archive")
    # PK-prefixed garbage dispatches to the zip path, still quarantines
    rows = parse_archive_bytes("g2.zip", b"PK garbage that is not a zip")
    assert len(rows) == 1 and rows[0]["reason"].startswith("bad_archive")


def test_truncated_tar_quarantines_whole_never_a_prefix():
    """The WARC no-silent-prefix contract: a tar that errors
    mid-iteration must contribute ZERO member rows — one bad_archive
    row — even though its first member header parsed fine."""
    raw = _tar_bytes([("a.txt", bytes(600)), ("b.txt", bytes(600))])
    rows = parse_archive_bytes("t.tar", raw[: 512 + 300])
    assert len(rows) == 1 and rows[0]["reason"].startswith("bad_archive")
    # truncation at an exact 512-block boundary: tarfile reads SHORT
    # without raising — the explicit size check must catch it
    rows = parse_archive_bytes("t.tar", raw[: 512 + 512])
    assert len(rows) == 1 and rows[0]["reason"].startswith("bad_archive")
    # review r11 (repro-confirmed): tarfile treats EOF at a HEADER
    # position mid-archive as a normal end of archive — truncation at
    # a's padded-data end (b's header boundary) or 100 bytes into b's
    # header silently dropped b. The end-of-archive-marker check must
    # quarantine the whole file in both shapes.
    a_end = 512 + 1024  # header + 600 bytes padded to 2 blocks
    rows = parse_archive_bytes("t.tar", raw[:a_end])
    assert len(rows) == 1 and rows[0]["reason"].startswith("bad_archive")
    rows = parse_archive_bytes("t.tar", raw[: a_end + 100])
    assert len(rows) == 1 and rows[0]["reason"].startswith("bad_archive")
    # same contract through the compressed path
    comp = gzip.compress(raw[:a_end])
    rows = parse_archive_bytes("t.tar.gz", comp)
    assert len(rows) == 1 and rows[0]["reason"].startswith("bad_archive")
    # and an INTACT archive still parses clean through both paths
    assert [r["reason"] for r in parse_archive_bytes("t.tar", raw)] == [
        None, None,
    ]
    assert [
        r["reason"]
        for r in parse_archive_bytes("t.tar.gz", gzip.compress(raw))
    ] == [None, None]


def test_corrupt_zip_member_quarantines_alone():
    """ZIP's central directory is authoritative: one flipped member
    costs that member only; the sibling still lands byte-identical."""
    raw = bytearray(
        _zip_bytes([("good.txt", b"intact"), ("bad.bin", b"A" * 4096)])
    )
    with zipfile.ZipFile(io.BytesIO(bytes(raw))) as zf:
        info = zf.infolist()[1]
    name_n, extra_n = struct.unpack_from("<HH", raw, info.header_offset + 26)
    ds = info.header_offset + 30 + name_n + extra_n
    for i in range(ds, ds + min(8, info.compress_size)):
        raw[i] ^= 0xFF
    rows = parse_archive_bytes("c.zip", bytes(raw))
    assert rows[0]["member_path"] == "good.txt"
    assert rows[0]["content"] == b"intact" and rows[0]["reason"] is None
    assert rows[1]["member_path"] == "bad.bin"
    assert rows[1]["reason"].startswith("bad_member")
    # corrupt .gz MEMBER (inside an intact container) is also
    # member-granular
    rows = parse_archive_bytes(
        "z.zip", _zip_bytes([("m.txt.gz", b"\x1f\x8bnot really gzip")])
    )
    assert rows[0]["reason"].startswith("bad_member")


def test_tar_non_regular_entries_quarantine_dirs_skip():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ln = tarfile.TarInfo("link")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "real.txt"
        tf.addfile(ln)
        info = tarfile.TarInfo("real.txt")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"ok"))
    rows = parse_archive_bytes("s.tar", buf.getvalue())
    assert [(r["member_path"], r["reason"]) for r in rows] == [
        ("link", "non_regular"),
        ("real.txt", None),
    ]


def test_write_read_round_trip_all_codec_combos(spark, tmp_path):
    """4 partitions hit all combos: zip/tar.gz × plain/gz members.
    Unicode bodies must round-trip byte-identically through each."""
    out = str(tmp_path / "arch")
    docs = spark.createDataFrame(
        [(f"src/f{i}.txt", f"nội dung {i}\nline two") for i in range(12)],
        "member_path string, text string",
    ).repartition(4)
    rep = write_archive(docs, out, gzip_members_every_other=True)
    assert rep.agg(F.sum("n_members")).collect()[0][0] == 12
    names = sorted(os.listdir(out))
    assert any(n.endswith(".zip") for n in names)
    assert any(n.endswith(".tar.gz") for n in names)
    back = read_archive_members(spark, f"{out}/*")
    assert archive_quarantine(back).count() == 0
    got = {
        (r.member_path.removesuffix(".gz"), r.text)
        for r in archive_text_docs(back).collect()
    }
    assert got == {
        (f"src/f{i}.txt", f"nội dung {i}\nline two") for i in range(12)
    }


def test_archive_license_detect_hop(spark, tmp_path):
    """The code-corpus shape: files with license headers land in a
    zip; classification of the ingested members equals classifying
    the source frame directly (the ingest format cannot leak into the
    label)."""
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _LIC_SETS,
        license_label_rows,
    )

    texts = []
    for i in range(9):
        name, words = _LIC_SETS[i % 3]
        texts.append((i, " ".join(words) + f" body of file {i}"))
    texts.append((99, "no license header here at all"))
    src = spark.createDataFrame(texts, "doc_id long, text string")
    out = str(tmp_path / "lic")
    write_archive(
        src.select(
            F.concat(F.lit("repo/doc-"), "doc_id", F.lit(".txt")).alias(
                "member_path"
            ),
            "text",
        ).repartition(2),
        out,
    ).count()
    ingested = archive_text_docs(
        read_archive_members(spark, f"{out}/*")
    ).select(
        F.regexp_extract("member_path", r"doc-(\d+)\.txt", 1)
        .cast("long")
        .alias("doc_id"),
        "text",
    )
    got = {
        (r.doc_id, r.license)
        for r in license_label_rows(ingested).collect()
    }
    want = {
        (r.doc_id, r.license) for r in license_label_rows(src).collect()
    }
    assert got == want
    assert ("99", "none") not in got  # ids parsed as longs
    assert (99, "none") in got


def test_curate_corpus_from_archive_ingest_matches_direct(spark, tmp_path):
    """Archive-to-shards: the corpus exported as ZIP/TAR containers,
    re-read through the archive source, and curated must produce the
    IDENTICAL report and shard contents as curating the parquet
    directly (the warc/orc integration contract)."""
    from jobinsight_data_pipeline_v2_spark.corpus_pipeline import (
        curate_corpus,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    arch = str(tmp_path / "containers")
    write_archive(
        docs.select(
            F.concat(F.lit("src/doc-"), "doc_id", F.lit(".txt")).alias(
                "member_path"
            ),
            "text",
        ).repartition(4),
        arch,
        gzip_members_every_other=True,
    ).count()
    ingested = archive_text_docs(
        read_archive_members(spark, f"{arch}/*")
    ).select(
        F.regexp_extract("member_path", r"doc-(\d+)\.txt", 1)
        .cast("long")
        .alias("doc_id"),
        "text",
    )
    r_arch = curate_corpus(
        spark, ingested, str(tmp_path / "shards_arch"), n_shards=2
    )
    r_direct = curate_corpus(
        spark, docs, str(tmp_path / "shards_direct"), n_shards=2
    )
    assert r_arch == {**r_direct, "out_dir": r_arch["out_dir"]}
    a = spark.read.parquet(str(tmp_path / "shards_arch"))
    b = spark.read.parquet(str(tmp_path / "shards_direct"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_archive_text_docs_lossy_decode_flag(spark, tmp_path):
    """A binary (non-UTF-8) member is NOT quarantined (the documented
    lossy-decode contract) but decode_flag=True surfaces it: the
    re-encoded text differs from the original bytes.  Valid-UTF-8
    members flag False, and the flagless schema is unchanged."""
    p = str(tmp_path / "bin.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("img.bin", b"\x89PNG\xff\xfe\x00garbage\xff")
        z.writestr("ok.txt", "xin chào".encode("utf-8"))
    members = read_archive_members(spark, p)
    assert archive_quarantine(members).count() == 0
    flagged = {
        r.member_path: r.lossy_decode
        for r in archive_text_docs(members, decode_flag=True).collect()
    }
    assert flagged == {"img.bin": True, "ok.txt": False}
    assert "lossy_decode" not in archive_text_docs(members).columns
