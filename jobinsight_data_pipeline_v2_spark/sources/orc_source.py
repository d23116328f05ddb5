"""ORC corpus source/sink: typed columnar interchange with row-level
required-field quarantine.

The fourth interchange format next to WARC (raw crawls), JSONL
(curated corpora) and CSV (tabular exports): ORC is the columnar
format warehouse neighbors (Hive/Trino installations) hand over, and
Spark reads/writes it natively with the same pushdown machinery as
parquet. Unlike the text formats there is no malformed-LINE failure
mode — ORC files carry their schema and a torn file fails the read
loudly — so the quarantine contract moves to the ROW level: a typed
row can still arrive with a required field NULL (schema-evolved
writers, outer-join exports), and every row must land in exactly ONE
of (typed docs, quarantine-with-reason), same as the other sources.

Scale shape: the scan is a splittable columnar read with predicate
pushdown and column pruning (plan-asserted in tests); the sink
partitions by a low-cardinality column so partition pruning cuts
whole directories before any I/O. The quarantine split is one narrow
projection — no second pass, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# canonical documents-table column order (TESTDATA.md): partitioned
# reads append partition columns, so readers re-select this order
DOC_COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")

DOC_ORC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def write_orc_corpus(
    docs: DataFrame, path: str, partition_by: str = "lang", mode: str = "overwrite"
) -> None:
    """Partitioned ORC export of a documents frame: one directory per
    ``partition_by`` value (snappy ORC inside), so downstream scans
    with a partition predicate prune whole directories. ``append``
    mode lands new batches as additional files without touching
    existing ones — the immutable-ingest discipline."""
    docs.select(*DOC_COLUMNS).write.mode(mode).partitionBy(
        partition_by
    ).orc(path)


def _partition_orc_rows(
    typed: DataFrame, required_fields: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """Split typed ORC rows into (docs, quarantine) on the required-
    field contract — shared verbatim by the batch and stream readers."""
    cols = list(DOC_COLUMNS)
    typed = typed.select(*cols)
    ok = F.lit(True)
    for f in required_fields:
        ok = ok & F.col(f).isNotNull()
    reason = F.coalesce(
        *[
            F.when(F.col(f).isNull(), F.lit(f"missing:{f}"))
            for f in required_fields
        ]
    )
    docs = typed.filter(ok)
    quarantine = typed.filter(~ok).select(
        *cols, reason.alias("reason")
    )
    return docs, quarantine


def read_orc_docs(
    spark: SparkSession,
    path: str,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """(docs, quarantine): typed rows and required-field violations.

    ``docs`` carries the canonical column order for every row with all
    ``required_fields`` non-null; ``quarantine`` is the violating rows
    plus a ``reason ∈ {'missing:<field>'}`` column (first violated
    field wins), kept fully typed for diagnosis and replay. The two
    frames partition the scan exactly; both are narrow projections of
    one columnar read — filters on data columns push into the ORC
    scan, filters on the partition column prune directories."""
    typed = spark.read.orc(path)
    return _partition_orc_rows(typed, required_fields)


def read_orc_stream(
    spark: SparkSession,
    path: str,
    schema: str = DOC_ORC_SCHEMA,
    required_fields: tuple[str, ...] = ("doc_id", "text"),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of ``read_orc_docs`` (twin 30): newly landed ORC
    files become micro-batches of (typed docs, quarantine) — the same
    stateless row split as the batch reader, so batch == stream row
    for row. A streaming file source needs the schema up front; the
    partition column is inferred from the directory layout as in
    batch."""
    reader = spark.readStream.format("orc").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    typed = reader.load(path)
    return _partition_orc_rows(typed, required_fields)
