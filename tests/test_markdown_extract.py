"""Markdown extraction (sources/markdown_extract.py): golden cases
pinning each rule AND the rule ORDER (the spec's load-bearing part),
plus the stateless stream twin's batch==stream contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jobinsight_data_pipeline_v2_spark.sources.markdown_extract import (
    extract_markdown_text,
    markdown_to_text,
)

_GOLDENS = [
    # fenced code dropped whole, including inline markers inside it
    ("before\n```\ncode **not bold** [x](y)\n```\nafter", "before\nafter"),
    # image removed BEFORE the link rule (link-first would keep alt);
    # internal spacing is preserved (only line ENDS are trimmed)
    ("a ![alt text](http://e/i.png) b", "a  b"),
    # link keeps text, drops url
    ("See [the docs](http://e/d) now", "See the docs now"),
    # inline code unwrapped
    ("run `make all` now", "run make all now"),
    # bold BEFORE italic (italic-first would pair the ** delimiters)
    ("x **bold** y *it* z", "x bold y it z"),
    # ATX heading marker stripped, text kept
    ("## Heading Words\nbody", "Heading Words\nbody"),
    # list bullets and blockquotes stripped at line starts only
    ("- item one\n> quoted\nplain - dash > kept", "item one\nquoted\nplain - dash > kept"),
    # a leading '-' data token under a bullet prefix is strip-identity
    ("- - dash first", "- dash first"),
    # blank / whitespace-only lines collapse
    ("a\n\n   \nb", "a\nb"),
]


@pytest.mark.parametrize("src,want", _GOLDENS)
def test_markdown_goldens(spark, src, want):
    df = spark.createDataFrame([(src,)], "markdown string")
    got = df.select(markdown_to_text(F.col("markdown")).alias("t")).first()["t"]
    assert got == want


def test_extract_is_narrow(spark):
    """The extractor must stay a pure projection: no Exchange, no
    Python/Arrow eval node — the whole point vs the HTML path."""
    df = spark.createDataFrame([(1, "# t\nbody")], "doc_id long, markdown string")
    plan = (
        extract_markdown_text(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_markdown_stream_equals_batch(spark, tmp_path):
    """Stateless projection: streamed extraction == batch extraction
    row for row."""
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        markdown_stream,
    )

    rows = [
        (1, "# Title\n\n- alpha beta\n\n```\ndrop me\n```\n> q end"),
        (2, "plain [link](http://x) **b** text"),
    ]
    src = str(tmp_path / "md_src")
    batch = spark.createDataFrame(rows, "doc_id long, markdown string")
    batch.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, markdown string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        markdown_stream(stream)
        .writeStream.format("memory")
        .queryName("mdx_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, text FROM mdx_test")
    expected = extract_markdown_text(batch).select("doc_id", "text")
    assert got.exceptAll(expected).count() + expected.exceptAll(got).count() == 0
    assert got.count() == 2
