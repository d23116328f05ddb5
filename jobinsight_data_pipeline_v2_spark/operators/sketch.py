"""Count-min sketch: fixed-memory frequency estimation over keyed
counts (Cormode & Muthukrishnan 2005).

Net-new capability beyond the reference (no sketch surface exists in
the reference engine): the frequency-sketch sibling of the engine's
other bounded-memory summaries — HLL distinct counts
(plans/core.approx_monthly_stats), GK percentiles (approx_percentiles)
and the in-plan Bloom membership filter (plans/curation.bloom_build).
A CMS answers "how often did key x occur?" with D·W counters total,
independent of the number of distinct keys: counters[j][h_j(x)] sums
the occurrences of every colliding key, the estimate is the min over
the D rows — always an OVERestimate, with excess ≤ e·N/W at
probability 1 − e^−D per probe (N = total weight).

Build discipline mirrors ``bloom_build``: positions computed in-plan
with xxhash64 (JVM codegen; hash values never reach an oracle hash —
gates emit EXACT counts plus a within-bound flag, the
approx_monthly_stats device), counters partial-aggregate map-side,
and the D·W-row table collapses into a ONE-ROW ``__cms`` map keyed by
j·W + pos that broadcasts to any consumer. Sketches built on disjoint
splits merge by adding counters — the property that makes a CMS the
100 TB answer when the distinct-key table itself is too wide to keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4  # D hash rows
CMS_WIDTH = 1024  # W counters per row


def cms_build(
    counts: DataFrame,
    key_col: str = "key",
    weight_col: str = "cnt",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """One-row broadcastable count-min sketch over a (key, weight)
    frame: each key adds its weight at position pmod(xxhash64(key, j),
    W) in each of the D rows — identical counters to per-occurrence
    increments, but fed from the pre-aggregated counts so the explode
    is D× the DISTINCT keys, not D× the corpus. The D·W counter table
    collapses into a single ``__cms`` map row (the bloom_build / PQ
    codebook one-row-index discipline)."""
    return (
        counts.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {depth - 1}), "
                    f"j -> named_struct("
                    f"'slot', j * {width} + pmod(xxhash64({key_col}, j), {width}), "
                    f"'wt', cast({weight_col} as bigint)))"
                )
            ).alias("e")
        )
        .groupBy(F.col("e.slot").alias("slot"))
        .agg(F.sum("e.wt").alias("c"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("slot", "c"))
            ).alias("__cms")
        )
    )


def cms_estimate(
    df: DataFrame,
    key_col: str,
    cms: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    out_col: str = "cms_est",
) -> DataFrame:
    """Attach the CMS frequency estimate for ``key_col`` to every row:
    min over the D per-row counters, each an ``element_at`` lookup in
    the broadcast one-row map. The D lookups are UNROLLED into one
    ``least(...)`` chain — a lambda fold would run interpreted per row
    (rule 13, the bloom-probe lesson); D is a compile-time constant so
    codegen sees a flat expression. An empty slot means no key ever
    hashed there → the true count of any key probing it is 0."""
    probes = ", ".join(
        f"coalesce(element_at(__cms, "
        f"{j} * {width} + pmod(xxhash64({key_col}, {j}), {width})), 0L)"
        for j in range(depth)
    )
    return (
        df.crossJoin(F.broadcast(cms))
        .withColumn(out_col, F.expr(f"least({probes})"))
        .drop("__cms")
    )
