"""Z-order (Morton-curve) data layout: multi-dimensional clustering
for file-level data skipping.

Sorting a table by ONE key makes parquet min/max stats prune scans on
that key and nothing else; interleaving the bits of TWO keys into a
Morton z-value and range-partitioning + sorting on it gives every
file a tight bounding box in BOTH dimensions, so a predicate on
either (or both) columns skips most files at the metadata level —
the layout half of data skipping that compaction
(maintenance.compact_partitions) leaves untouched.

Everything is integer-exact and cross-engine shared:

- ``zorder_interleave_sql`` emits one SQL text using only ``>>``,
  ``&``, ``<<`` and ``+`` — valid verbatim in Spark SQL and DuckDB,
  so the zorder_cells gate pins the arithmetic against the oracle.
- bucketing min-max-scales each dimension to ``2**bits`` integer
  buckets with pure BIGINT arithmetic; only the floor-division
  operator differs per engine (Spark ``div``, DuckDB ``//``), taken
  as a parameter.

Scale shape: one tiny global min/max aggregate (broadcast back as a
one-row cross join), a narrow per-row z-value projection, then ONE
range exchange on the z-value — the same single shuffle a plain
sort-write costs, buying two-dimensional pruning instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPARK_DIV = "div"
DUCKDB_DIV = "//"


def zorder_interleave_sql(a: str, b: str, bits: int = 16) -> str:
    """Morton interleave of the low ``bits`` bits of two non-negative
    BIGINT expressions — ``a`` on even bit positions, ``b`` on odd.
    The emitted text parses identically in Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def minmax_bucket_sql(
    col: str,
    min_col: str,
    max_col: str,
    bits: int = 16,
    div_op: str = SPARK_DIV,
) -> str:
    """Scale ``col`` into ``[0, 2**bits)`` integer buckets given its
    global min/max columns — monotone, integer-exact BIGINT
    arithmetic ((col − min) · 2^bits must stay under 2^63: ranges up
    to ~2^47 at bits=16, far beyond any key domain here)."""
    n = 1 << bits
    return (
        f"((({col}) - ({min_col})) * {n}) {div_op} "
        f"(({max_col}) - ({min_col}) + 1)"
    )


def zorder_keys(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """df + (__ux, __uy, __zkey): min-max bucket both cluster columns
    and interleave them. The min/max aggregate is one row, broadcast
    back via cross join (never a window)."""
    mm = df.agg(
        F.min(col_a).cast("long").alias("__minx"),
        F.max(col_a).cast("long").alias("__maxx"),
        F.min(col_b).cast("long").alias("__miny"),
        F.max(col_b).cast("long").alias("__maxy"),
    )
    ux = minmax_bucket_sql(
        f"cast({col_a} as bigint)", "__minx", "__maxx", bits, SPARK_DIV
    )
    uy = minmax_bucket_sql(
        f"cast({col_b} as bigint)", "__miny", "__maxy", bits, SPARK_DIV
    )
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__ux", F.expr(ux))
        .withColumn("__uy", F.expr(uy))
        .withColumn(
            "__zkey", F.expr(zorder_interleave_sql("__ux", "__uy", bits))
        )
        .drop("__minx", "__maxx", "__miny", "__maxy")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of
    (``col_a``, ``col_b``): range-partition on the z-value into
    ``n_files`` files and sort within each, so every file's parquet
    min/max footer covers a tight rectangle in both dimensions and
    range scans on either column prune files before reading a row
    group (asserted from the file footers in tests)."""
    keyed = zorder_keys(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__ux", "__uy", "__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
