"""Fixed-width source (sources/fwf_source.py): partition exactness,
writer overflow guard, narrow-plan contract, and the streaming twin's
batch==stream row parity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jobinsight_data_pipeline_v2_spark.sources.fwf_source import (
    DOC_FWF_LAYOUT,
    format_fwf_lines,
    fwf_line_width,
    read_fwf_docs,
    read_fwf_stream,
)

_ROWS = [
    (1, "en", "web", 100),
    (2, "vi", "crawl", 250),
    (900000001, None, "inj", 7),  # NULL string renders blank -> missing:lang
]


def _write_files(spark, tmp_path):
    src = str(tmp_path / "fwf")
    df = spark.createDataFrame(
        _ROWS, "doc_id bigint, lang string, source string, n_chars bigint"
    )
    format_fwf_lines(df).coalesce(1).write.text(src)
    with open(f"{src}/zz_junk.txt", "w") as f:
        f.write("way too short\n")
        f.write("x" * (fwf_line_width() + 3) + "\n")  # too long
        f.write(
            "  not-number" + "en".ljust(8) + "web".ljust(12) + "5".rjust(10)
            + "\n"
        )
    return src


def test_partition_exactness(spark, tmp_path):
    """Every input line lands in exactly one of (rows, quarantine)."""
    src = _write_files(spark, tmp_path)
    rows, quar = read_fwf_docs(spark, src)
    n_lines = spark.read.text(src).count()
    assert rows.count() + quar.count() == n_lines
    got = {tuple(r) for r in rows.collect()}
    assert (1, "en", "web", 100) in got and (2, "vi", "crawl", 250) in got
    reasons = sorted(r["reason"] for r in quar.collect())
    assert reasons == [
        "malformed_fwf",  # not-number id
        "malformed_fwf",  # too long
        "malformed_fwf",  # too short
        "missing:lang",  # blank lang row
    ]


def test_roundtrip_identity(spark, tmp_path):
    """write -> read is the identity on clean in-range rows."""
    src = str(tmp_path / "fwf_rt")
    df = spark.createDataFrame(
        [(7, "en", "web", 42), (123456789012 - 1, "zz", "x", 0)],
        "doc_id bigint, lang string, source string, n_chars bigint",
    )
    format_fwf_lines(df).coalesce(1).write.text(src)
    rows, quar = read_fwf_docs(spark, src)
    assert quar.count() == 0
    assert rows.exceptAll(df).count() + df.exceptAll(rows).count() == 0


def test_writer_overflow_raises(spark):
    """A string wider than its field must raise, never truncate."""
    df = spark.createDataFrame(
        [(1, "way-too-long-language", "web", 5)],
        "doc_id bigint, lang string, source string, n_chars bigint",
    )
    with pytest.raises(Exception, match="overflows width"):
        format_fwf_lines(df).collect()


def test_writer_null_numeric_raises(spark):
    df = spark.createDataFrame(
        [(None, "en", "web", 5)],
        "doc_id bigint, lang string, source string, n_chars bigint",
    )
    with pytest.raises(Exception, match="NULL numeric"):
        format_fwf_lines(df).collect()


def test_reader_is_narrow(spark, tmp_path):
    """The field decode must be a pure projection of the text scan."""
    src = _write_files(spark, tmp_path)
    rows, _ = read_fwf_docs(spark, src)
    plan = rows._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fwf_stream_equals_batch(spark, tmp_path):
    src = _write_files(spark, tmp_path)
    b_rows, b_quar = read_fwf_docs(spark, src)
    s_rows, s_quar = read_fwf_stream(spark, src, max_files_per_trigger=1)
    for name, stream_df, batch_df in (
        ("fwf_rows", s_rows, b_rows),
        ("fwf_quar", s_quar, b_quar),
    ):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(f"SELECT * FROM {name}")
        assert (
            got.exceptAll(batch_df).count()
            + batch_df.exceptAll(got).count()
            == 0
        )


def test_writer_control_chars_raise(spark):
    """An embedded newline would break line framing — raise (review r9)."""
    df = spark.createDataFrame(
        [(1, "en", "a\nb", 5)],
        "doc_id bigint, lang string, source string, n_chars bigint",
    )
    with pytest.raises(Exception, match="would not round-trip"):
        format_fwf_lines(df).collect()


def test_writer_edge_spaces_raise(spark):
    """Leading/trailing spaces are indistinguishable from padding and
    would silently round-trip mutated — raise (review r9)."""
    df = spark.createDataFrame(
        [(1, " en", "web", 5)],
        "doc_id bigint, lang string, source string, n_chars bigint",
    )
    with pytest.raises(Exception, match="would not round-trip"):
        format_fwf_lines(df).collect()
