"""SparkSession construction with scale-oriented defaults.

The engine targets large multi-executor clusters; locally we run
``local[N]``. All tuning is expressed as plain Spark confs so the same
code runs unchanged on a 1000-executor cluster — only ``master`` and
memory sizing change.

Key choices (see SURVEY.md §4):
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast decisions replace hand tuning.
- Arrow on: any pandas interop (the few Pandas-UDF operators) moves
  columnar batches, never pickled rows.
- ``spark.sql.legacy.parquet.nanosAsLong``: the driver's ``events``
  table carries parquet TIMESTAMP(NANOS) which Spark 4 otherwise
  refuses to read; we read nanos as long and reconstruct a
  timestamp_ntz (see tables.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "jobinsight-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # The generated-class cache defaults to 100 entries; a session
        # running a wide query mix (65+ bench queries x several
        # codegen stages each) evicts and Janino-RECOMPILES plans on
        # every revisit — measured +1.5s on the bloom gate's first
        # re-execution after a full pass, gone at steady state. Sized
        # for a fleet analytics session, not a notebook (r6).
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warn_if_codegen_cache_conf_inert(spark)
    return spark


def _warn_if_codegen_cache_conf_inert(spark: SparkSession) -> None:
    """spark.sql.codegen.cache.maxEntries only exists in recent Spark;
    on older versions the builder conf is silently inert and the
    measured ~15-25% bench win (rule 18) evaporates with no signal.
    Warn once at session build if the JVM doesn't register the conf
    (ADVICE r6)."""
    try:
        registered = spark._jvm.org.apache.spark.sql.internal.SQLConf.isStaticConfigKey(
            "spark.sql.codegen.cache.maxEntries"
        )
    except Exception:
        registered = False
    if not registered:
        import warnings

        warnings.warn(
            "spark.sql.codegen.cache.maxEntries is not a registered "
            "static SQL conf in this Spark build — the generated-class "
            "cache keeps its 100-entry default and wide query mixes "
            "will Janino-recompile plans on revisit (rule 18).",
            RuntimeWarning,
            stacklevel=2,
        )


def ensure_engine_confs(spark: SparkSession) -> None:
    """Apply runtime-settable engine confs to a session we didn't build.

    The correctness driver constructs its own SparkSession and hands it
    to ``__spark_entry__`` — make sure the confs our loaders rely on are
    present there too.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        # generated-class cache sizing (see get_spark); only takes
        # effect if the JVM-global cache is not yet instantiated —
        # harmless otherwise
        spark.conf.set("spark.sql.codegen.cache.maxEntries", "5000")
    except Exception:
        pass
    # Pin the session zone: ntz→timestamp casts (sliding windows,
    # streaming twins) must not depend on the host JVM's default zone —
    # a :45-offset zone would misalign the 30-minute wall-clock grid.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
