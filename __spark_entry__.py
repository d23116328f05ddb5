"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``jobinsight_data_pipeline_v2_spark.plans`` — one
registry entry per implemented operator family from SURVEY.md §2 plus
the net-new training-data operators; this module just adapts the
registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from jobinsight_data_pipeline_v2_spark.plans import load_all
from jobinsight_data_pipeline_v2_spark.session import ensure_engine_confs

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    top_customers: fact ⋈ 3 broadcast dims → groupBy → ordered top-20
    (SURVEY A2/J1/O2/O4) — the reference's vw_top_companies shape.
    """
    ensure_engine_confs(spark)
    fn, _ = _REGISTRY["top_customers"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: oracle for name, (_, oracle) in _REGISTRY.items() if oracle is not None
    }
