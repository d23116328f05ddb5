"""JSONL corpus source: line-delimited JSON documents → typed rows
with corrupt-record quarantine.

WARC is the raw-crawl interchange (warc_source); curated text corpora
ship as JSONL — one document object per line, gzip-splittable at the
file level, schema drifting freely across dumps. The production
concerns are (a) a malformed line must never kill a 100 TB read and
(b) it must never be silently dropped either: every input line lands
in exactly ONE of (typed rows, quarantine).

Spark-first shape: the file is read by the built-in ``text`` source
(splittable, predicate-free scan) and parsed per row with ``from_json``
— a narrow codegen'd projection, not the DataFrameReader JSON path,
whose internal corrupt-record column carries query restrictions (Spark
disallows filtering a raw-JSON read on only that column without
caching; at corpus scale caching the raw text is not an option).
Malformed JSON parses to NULL, missing required fields are checked as
plain predicates, and the quarantine frame keeps the raw line for
replay/debugging. Both frames are lazy projections of ONE text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# the documents-table shape (TESTDATA.md); callers pass their own
# schema for other corpora — required_fields guards whatever subset
# must be present
DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: StructType = DOC_SCHEMA,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """(docs, quarantine): typed document rows and the rejected lines.

    ``docs`` has the schema's columns for every line that parsed AND
    carries all ``required_fields`` non-null. ``quarantine`` is
    (line, reason ∈ {'malformed_json', 'missing:<field>'}) — the raw
    text of every rejected line, so a bad producer batch can be
    diagnosed and replayed without re-reading the corpus. The two
    frames partition the input exactly (tested); both are narrow
    projections of one splittable text scan.
    """
    raw = spark.read.text(path).select(F.col("value").alias("line"))
    return _partition_lines(raw, schema, required_fields)


def _partition_lines(
    raw: DataFrame, schema: StructType, required_fields: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """The stateless parse/partition shared by the batch and streaming
    readers: (line) → (typed docs, quarantine), both narrow
    projections of the one input frame."""
    # from_json under PERMISSIVE yields an all-null struct (not a NULL
    # struct) for malformed input — indistinguishable from a sparse
    # valid object — so malformed detection rides the dedicated
    # corrupt-record column instead
    corrupt = "_corrupt_record"
    schema_c = StructType(
        list(schema.fields) + [StructField(corrupt, StringType(), True)]
    )
    parsed = raw.select(
        "line",
        F.from_json(
            "line", schema_c, {"columnNameOfCorruptRecord": corrupt}
        ).alias("doc"),
    )
    reason = F.when(
        F.col("doc").isNull() | F.col(f"doc.{corrupt}").isNotNull(),
        F.lit("malformed_json"),
    )
    for fname in required_fields:
        reason = reason.when(
            F.col(f"doc.{fname}").isNull(), F.lit(f"missing:{fname}")
        )
    marked = parsed.select("line", "doc", reason.alias("reason"))
    docs = marked.filter(F.col("reason").isNull()).select("doc.*").drop(
        corrupt
    )
    quarantine = marked.filter(F.col("reason").isNotNull()).select(
        "line", "reason"
    )
    return docs, quarantine


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = DOC_SCHEMA,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_jsonl_docs``: newly landed JSONL dumps
    become micro-batches of (typed docs, quarantine) — the corpus-drop
    ingestion shape (a producer finishing a dump file = one trigger of
    downstream curation).

    Same stateless parse as the batch reader, so batch == stream row
    for row; both returned frames are streaming and feed the existing
    stateless twins (classifier_stream, chunk_stream, …) directly.
    The two frames are independent streaming queries when started —
    Spark re-reads the text source for each, which is the lines scan
    only (no state, no shuffle).
    """
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(path).select(F.col("value").alias("line"))
    return _partition_lines(raw, schema, required_fields)
