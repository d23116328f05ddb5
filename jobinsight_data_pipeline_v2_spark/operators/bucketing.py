"""Bucketed-table co-located joins (SURVEY X-series: pre-partitioning).

A join between two big fact tables shuffles both sides on every query.
Writing both tables bucketed by the join key (same bucket count) pays
that shuffle ONCE at write time; every subsequent join/aggregation on
the key reads co-located buckets and skips the exchange entirely — the
standard big-big join strategy when neither side broadcasts.

Bucket pruning also applies: an equality filter on the bucket key scans
1/n_buckets of the data.

Uses the session catalog (`saveAsTable`): bucket metadata must live in
a catalog — plain `.parquet(path)` writes cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets additionally enables sort-merge joins with
    neither a shuffle nor a sort. ``path`` makes it an external table
    (the warehouse dir is a static conf and can't change per session).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst sees
    the compatible output partitioning and plans the join with zero
    Exchange operators (verified in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
