"""CSV corpus source: delimited rows → typed rows with corrupt-record
quarantine.

The third interchange format next to WARC (raw crawls) and JSONL
(curated corpora): tabular exports — metadata tables, label sets,
scored manifests — ship as CSV. The production concerns are the
JSONL source's, verbatim: a malformed line must never kill a 100 TB
read, and it must never be silently dropped either — every input line
lands in exactly ONE of (typed rows, quarantine).

Spark-first shape (the jsonl_source design, with ``from_csv`` in
place of ``from_json``): the file is read by the built-in ``text``
source (splittable, predicate-free scan) and parsed per row with the
codegen'd ``from_csv`` projection; malformed lines are detected via
the dedicated corrupt-record column (set when a field fails its type,
or the token count disagrees with the schema in either direction —
probed empirically), and missing required fields are plain null
predicates (CSV's empty field reads as NULL without being corrupt).
Quoted delimiters are handled by the parser; embedded NEWLINES are
not — a multiline-quoted CSV needs the DataFrameReader csv path with
``multiLine``, which gives up splittability. Header rows are a writer
concern: corpus exports here are headerless (a header would
quarantine as a type failure, loudly, not silently skew counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the documents-table shape (TESTDATA.md) as a DDL string — from_csv
# takes DDL text, and column ORDER is the CSV column order contract
DOC_CSV_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

_CORRUPT = "_corrupt_record"


def read_csv_docs(
    spark: SparkSession,
    path: str,
    schema: str = DOC_CSV_SCHEMA,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """(docs, quarantine): typed rows and the rejected lines.

    ``docs`` has the schema's columns for every line that parsed AND
    carries all ``required_fields`` non-null. ``quarantine`` is
    (line, reason ∈ {'malformed_csv', 'missing:<field>'}) — the raw
    text of every rejected line, for diagnosis and replay. The two
    frames partition the input exactly (tested); both are narrow
    projections of one splittable text scan.
    """
    raw = spark.read.text(path).select(F.col("value").alias("line"))
    return _partition_csv_lines(raw, schema, required_fields)


def _partition_csv_lines(
    raw: DataFrame, schema: str, required_fields: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """The stateless parse/partition shared by the batch and streaming
    readers: (line) → (typed docs, quarantine), both narrow
    projections of the one input frame."""
    schema_c = f"{schema}, {_CORRUPT} string"
    parsed = raw.select(
        "line",
        F.from_csv(
            "line", F.lit(schema_c), {"columnNameOfCorruptRecord": _CORRUPT}
        ).alias("doc"),
    )
    reason = F.when(
        F.col("doc").isNull() | F.col(f"doc.{_CORRUPT}").isNotNull(),
        F.lit("malformed_csv"),
    )
    for fname in required_fields:
        reason = reason.when(
            F.col(f"doc.{fname}").isNull(), F.lit(f"missing:{fname}")
        )
    marked = parsed.select("line", "doc", reason.alias("reason"))
    docs = marked.filter(F.col("reason").isNull()).select("doc.*").drop(
        _CORRUPT
    )
    quarantine = marked.filter(F.col("reason").isNotNull()).select(
        "line", "reason"
    )
    return docs, quarantine


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: str = DOC_CSV_SCHEMA,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_csv_docs``: newly landed CSV dumps
    become micro-batches of (typed docs, quarantine) — the same
    stateless parse as the batch reader, so batch == stream row for
    row; both returned frames are streaming and feed the stateless
    downstream twins directly (they are independent queries when
    started — each gets its own checkpoint/sink)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path).select(F.col("value").alias("line"))
    return _partition_csv_lines(raw, schema, required_fields)
