"""Loaders for the driver's synthetic testdata tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.

The ``events`` table needs special care: it is written with parquet
TIMESTAMP(NANOS) which Spark 4 cannot map to a Catalyst type. With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as a
long of nanoseconds since the epoch; we reconstruct a ``timestamp_ntz``
wall-clock identical to what DuckDB sees (nanos truncated to micros),
independent of the session time zone:

    convert_timezone(current_timezone(), 'UTC',
                     cast(timestamp_micros(ts div 1000) as timestamp_ntz))

``cast(instant as timestamp_ntz)`` renders the instant in the session
zone; converting that wall-clock from the session zone back to UTC
yields the UTC wall-clock — i.e. exactly the naive timestamp stored in
the file — for any session zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables: always safe (and right) to broadcast in joins.
SMALL_DIMS = {"region", "nation", "supplier", "part", "customer"}

_EVENTS_TS_EXPR = (
    "convert_timezone(current_timezone(), 'UTC', "
    "cast(timestamp_micros(ts div 1000) as timestamp_ntz))"
)


def _source_bytes(path: str) -> int | None:
    """Total bytes under a local parquet path (file or directory);
    None when the path isn't locally stat-able (object stores)."""
    import os

    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            total = 0
            for root, _, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            return total
    except OSError:
        return None
    return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with clean types."""
    path = f"{sf_dir}/{name}.parquet"
    df = load_events(spark, sf_dir) if name == "events" else spark.read.parquet(path)
    # Cheap split-count hint for spread() — avoids a driver-side
    # plan→RDD conversion (~0.15s per query) just to learn the scan
    # produced one split.
    df._spread_src_bytes = _source_bytes(path)  # type: ignore[attr-defined]
    return df


# FileSourceScanExec's default split target; splits ≈ ceil(size / this).
# Fallback only — spread() reads the session's live conf so a tuned
# spark.sql.files.maxPartitionBytes changes the estimate with it.
_MAX_PARTITION_BYTES = 128 << 20


def _max_partition_bytes(spark: SparkSession) -> int:
    """The session's actual scan-split target (ADVICE r3: hardcoding
    128 MB silently mis-estimates splits when the conf is tuned).
    Accepts byte-suffix forms ("134217728", "128m", "1g")."""
    try:
        raw = spark.conf.get(
            "spark.sql.files.maxPartitionBytes", str(_MAX_PARTITION_BYTES)
        )
    except Exception:
        return _MAX_PARTITION_BYTES
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    s = str(raw).strip().lower().removesuffix("b")
    try:
        if s and s[-1] in units:
            return int(float(s[:-1]) * units[s[-1]])
        return int(s)
    except ValueError:
        return _MAX_PARTITION_BYTES


def spread(df: DataFrame) -> DataFrame:
    """Round-robin a skinny input across all cores — ONLY when the scan
    produces fewer splits than the session's parallelism.

    The local testdata tables are single-row-group parquet files, so
    Spark hands the scan ONE input partition and every narrow stage
    downstream — including CPU-heavy hashing over documents — runs on
    a single core of 32 (measured ~8× on the MinHash signature build).
    On a real cluster the input arrives in many splits and this is a
    no-op, so the exchange exists only where it buys core-count
    parallelism. Use it on inputs whose downstream per-row work is
    heavy (hashing, regex, vector folds); plain scan→aggregate plans
    don't earn back the shuffle.

    The split count is estimated from the source size when load_table
    attached one (stat is free; converting the plan to an RDD to count
    partitions costs ~0.15s of driver latency per query), falling back
    to the exact RDD partition count otherwise.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    src = getattr(df, "_spread_src_bytes", None)
    if src is not None:
        est_splits = max(1, -(-src // _max_partition_bytes(df.sparkSession)))
        out = df.repartition(n) if est_splits < n else df
        # repartition() returns a NEW DataFrame without the Python
        # attribute — downstream size gates (tfidf's df broadcast,
        # leakage_safe_split's label broadcast) read it off spread()'s
        # OUTPUT, and losing it here silently disabled their
        # known-small branch (review r8)
        out._spread_src_bytes = src  # type: ignore[attr-defined]
        return out
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as timestamp_ntz (micros), matching DuckDB."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes)["ts"] in ("bigint", "long"):
        raw = raw.withColumn("ts", F.expr(_EVENTS_TS_EXPR))
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
