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


from typing import Callable

# Phase-2 combiners a caller may name per output column. Every entry
# must satisfy merge(merge(a, b), c) == agg(a ∪ b ∪ c) over partials —
# the standard algebraic-aggregate decomposition.
MERGE_FNS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "bit_or": lambda c: F.expr(f"bit_or({c})"),
    "bit_and": lambda c: F.expr(f"bit_and({c})"),
}

_SALTABLE_JOINS = ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti")


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts).

    xxhash64 over every column — unlike ``F.rand``, the salt survives
    task retries and AQE repartitioning unchanged (rand re-draws when a
    partition is recomputed, which silently reshuffles rows across
    salts mid-job). Exact full-row duplicates share a salt; that only
    matters if one identical row repeats ~billions of times.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    merge: dict[str, str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys + deterministic row salt) — the hot key's
    rows spread over n_salts reducers; phase 2 re-aggregates the
    partials on the true keys (tiny input: n_salts rows per key).

    ``aggs`` maps output column name → phase-1 aggregate expression.
    ``merge`` names the phase-2 combiner per column (one of
    ``MERGE_FNS``; default ``"sum"``, correct for sum/count partials).
    Non-decomposable aggregates (avg, countDistinct, percentile) do NOT
    belong here — express avg as sum+count, distinct via a pre-distinct
    or HLL. Unknown merge names raise rather than silently mis-combine.
    """
    merge = merge or {}
    unknown = {m for m in merge.values() if m not in MERGE_FNS}
    if unknown:
        raise ValueError(
            f"salted_agg: unknown merge fns {sorted(unknown)}; "
            f"allowed: {sorted(MERGE_FNS)}"
        )
    stray = set(merge) - set(aggs)
    if stray:
        raise ValueError(f"salted_agg: merge names not in aggs: {sorted(stray)}")
    salted = df.withColumn("__salt", _row_salt(df, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            MERGE_FNS[merge.get(name, "sum")](name).alias(name)
            for name in aggs
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the other.

    skewed gets a deterministic row salt in [0, n_salts); small is
    exploded n_salts× so every (key, salt) pair finds its partner. Use
    when the small side is too big to broadcast but the skewed side has
    hot keys that would stall a plain shuffle join. Replication factor
    n_salts is the cost dial.

    Only joins that preserve the *skewed* side's multiplicity are
    legal: right/full would emit each unmatched replicated small-side
    row n_salts times, so ``how`` is validated.
    """
    if how not in _SALTABLE_JOINS:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            f"small-side rows n_salts times; allowed: inner/left/semi/anti"
        )
    salted = skewed.withColumn("__salt", _row_salt(skewed, n_salts))
    replicated = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")


def _replicate_hot(
    small: DataFrame, hot: DataFrame, key: str, n_salts: int
) -> DataFrame:
    """Small side of a selective salted join: rows on a detected-hot
    key replicate over every salt; every other row passes once with
    salt 0. ``hot`` must be the broadcastable (key, __hot) marker."""
    return (
        small.join(hot, key, "left")
        .withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.col("__hot").isNotNull(),
                    F.expr(f"sequence(0, {n_salts - 1})"),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("__hot")
    )


def selective_salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salts: int = 16,
    how: str = "inner",
    hot_key_col: str = "key",
) -> DataFrame:
    """Skew-safe equi-join that spends the replication budget ONLY on
    detected hot keys (``detect_hot_keys`` output — whose key column
    is named ``key`` — or any frame, with ``hot_key_col`` naming its
    key column; ADVICE r8): skewed rows on a hot key spread over ``n_salts`` join
    partitions, small-side rows on a hot key replicate ``n_salts``×,
    and the cold long tail joins exactly as an unsalted shuffle join
    — its shuffle volume is unchanged (salt 0 both sides), no
    second-phase traffic, no union (one join, one plan). This is what
    replaces blanket ``salted_join`` replication at 100 TB: blanket
    salting multiplies the ENTIRE small side when only a handful of
    keys are hot.

    Exactness: every row routes through exactly one (key, salt) pair
    on each side, so inner/left multiplicities (and left-join NULL
    rows for unmatched keys) are identical to the plain join — pinned
    by the ``salted_hot_join`` oracle gate. Join types that preserve
    the skewed side's multiplicity only (``_SALTABLE_JOINS``), same
    contract as ``salted_join``.
    """
    if how not in _SALTABLE_JOINS:
        raise ValueError(
            f"selective_salted_join: how={how!r} would duplicate "
            f"unmatched small-side rows; allowed: {_SALTABLE_JOINS}"
        )
    if hot_key_col not in hot_keys.columns:
        raise ValueError(
            f"selective_salted_join: hot_keys frame has no column "
            f"{hot_key_col!r} (columns: {hot_keys.columns}); pass "
            "hot_key_col= for a differently-named key column"
        )
    hot = F.broadcast(
        hot_keys.select(F.col(hot_key_col).alias(key)).withColumn(
            "__hot", F.lit(1)
        )
    )
    marked = (
        skewed.join(hot, key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(), _row_salt(skewed, n_salts)
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    return marked.join(
        _replicate_hot(small, hot, key, n_salts), [key, "__salt"], how
    ).drop("__salt")


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


def detect_hot_keys(
    df: DataFrame,
    key_col: str,
    min_share_permille: int = 100,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, cms_est): keys whose estimated share of the rows reaches
    ``min_share_permille`` — the detection pass that tells the salting
    operators WHERE to spend their replication budget, without ever
    shuffling on the (possibly hot) key with wide aggregation state.

    Two skew-SAFE passes over the input: (1) a count-min sketch built
    from per-row weight 1 (operators/sketch.py — the slot aggregation
    map-side combines to ≤ D·W rows per task, so a hot key never
    concentrates on one reducer); (2) the distinct key list (hash
    aggregation with map-side combine: a hot key collapses to one row
    per map partition before the exchange — distinct is not the skew
    hazard; wide per-key state is). Each distinct key probes the
    broadcast sketch; a CMS never underestimates, so a truly hot key
    is never missed — the failure mode is a borderline cold key
    flagged hot, which costs only unnecessary salting, never a wrong
    result."""
    from .sketch import cms_build, cms_estimate

    counts = df.select(F.col(key_col).alias("key"), F.lit(1).alias("cnt"))
    cms = cms_build(counts, depth=depth, width=width)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    probed = cms_estimate(
        df.select(F.col(key_col).alias("key")).distinct(),
        "key",
        cms,
        depth=depth,
        width=width,
    )
    return (
        probed.crossJoin(F.broadcast(total))
        .filter(
            F.col("cms_est") * 1000 >= F.lit(min_share_permille) * F.col("__n")
        )
        .select("key", "cms_est")
    )


def selective_salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    hot_keys: DataFrame,
    n_salts: int = 16,
    merge: dict[str, str] | None = None,
) -> DataFrame:
    """Two-phase aggregation that salts ONLY the detected hot keys:
    rows whose key is in the broadcast ``hot_keys`` set spread over
    ``n_salts`` phase-1 reducers, every other key aggregates in one
    hop (salt 0) — so the cold long tail pays no second-phase
    traffic beyond its single partial row. The result carries a
    ``was_salted`` flag per key. Same decomposability contract as
    ``salted_agg`` (sum/count partials; ``merge`` for max/min etc.).
    """
    merge = merge or {}
    unknown = {m for m in merge.values() if m not in MERGE_FNS}
    if unknown:
        raise ValueError(
            f"selective_salted_agg: unknown merge fns {sorted(unknown)}; "
            f"allowed: {sorted(MERGE_FNS)}"
        )
    hot = F.broadcast(
        hot_keys.select(F.col("key").alias(key)).withColumn(
            "__hot", F.lit(1)
        )
    )
    marked = df.join(hot, key, "left")
    salted = marked.withColumn(
        "__salt",
        F.when(
            F.col("__hot").isNotNull(), _row_salt(df, n_salts)
        ).otherwise(F.lit(0)),
    )
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()],
        F.max(F.coalesce("__hot", F.lit(0))).alias("__hot_p"),
    )
    return partial.groupBy(key).agg(
        *[
            MERGE_FNS[merge.get(name, "sum")](name).alias(name)
            for name in aggs
        ],
        F.max("__hot_p").cast("int").alias("was_salted"),
    )
