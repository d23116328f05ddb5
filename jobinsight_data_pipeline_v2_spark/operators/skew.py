"""Skew-handling operators: salting for hot keys, approx drop-ins.

AQE's skew-join splitting (enabled in session.py) already handles most
runtime skew in joins; these operators cover the cases AQE cannot:

- a groupBy whose hot key overwhelms one reducer (AQE cannot split an
  aggregation key) → two-phase salted aggregation;
- a broadcast-impossible join against a skewed build side → salted
  replicated join;
- count-distinct at 100 TB where exactness is not required →
  HLL/t-digest approximations (constant memory per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys + random salt) — the hot key's rows spread
    over n_salts reducers; phase 2 re-aggregates the partials on the
    true keys (tiny input: n_salts rows per key).

    ``aggs`` maps output column name → phase-1 aggregate expression.
    Phase 2 combines partials: counts/sums re-SUM. (Only decomposable
    aggregates belong here — avg must be expressed as sum+count by the
    caller, the standard algebraic-aggregate discipline.)
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the other.

    skewed gets a random salt in [0, n_salts); small is exploded
    n_salts× so every (key, salt) pair finds its partner. Use when the
    small side is too big to broadcast but the skewed side has hot keys
    that would stall a plain shuffle join. Replication factor n_salts
    is the cost dial.
    """
    salted = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")


def approx_monthly_stats(orders: DataFrame, rsd: float = 0.02) -> DataFrame:
    """A1's scale variant: approx_count_distinct (HLL++) replaces exact
    distinct counts — constant memory per group, one pass, no distinct
    expansion; rsd is the accuracy dial (2% default)."""
    return orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.approx_count_distinct("o_custkey", rsd).alias("n_customers_approx"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(20,2)")).cast("double").alias(
            "total_revenue"
        ),
    )


def approx_percentiles(df: DataFrame, col: str, keys: list[str]) -> DataFrame:
    """Exact `percentile`'s scale variant: approx_percentile keeps a
    bounded sketch per group instead of materializing sorted values."""
    return df.groupBy(*keys).agg(
        F.expr(f"approx_percentile({col}, array(0.5, 0.9, 0.99), 10000)").alias(
            "pcts"
        ),
        F.count(F.lit(1)).alias("n"),
    ).select(
        *keys,
        F.col("pcts")[0].alias("p50"),
        F.col("pcts")[1].alias("p90"),
        F.col("pcts")[2].alias("p99"),
        "n",
    )
