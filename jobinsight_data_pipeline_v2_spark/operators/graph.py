"""Iterative graph ranking: integer-exact PageRank.

Net-new capability (no reference counterpart): link-graph quality
signals are a standard ingredient of web-corpus curation (host-level
PageRank has shipped with Common Crawl-derived corpora since the
earliest curated releases), and the computation is the canonical
ITERATIVE bulk-synchronous job — K rounds of (join ranks to edges,
shuffle contributions to their target, re-aggregate). The engine's
other fixpoints (pointer-doubling components) iterate on LABELS; this
one iterates on WEIGHTS.

Cross-engine exactness: floating-point PageRank drifts between
engines by summation order, so the operator pins an INTEGER
recurrence (the DSIR/temperature discipline — scaled integer units,
floor division at every step, no float anywhere):

    r_0(u)    = unit                      (1e6 — "permillion" mass)
    inc_i(u)  = Σ_{v→u} r_i(v) // outdeg(v)
    r_{i+1}(u) = base + (damping_pct · inc_i(u)) // 100

with base = (100 − damping_pct)% of unit. Every engine that
implements the same recurrence agrees bit for bit; headroom is
BIGINT-safe up to ~10^11-node graphs (85·Σmass < 2^63).

Scale shape: per round, ONE shuffle keyed by edge target (map-side
combined partial sums) plus a broadcast-or-shuffle join of the
rank table to the edge list; ranks checkpoint per round so the plan
stays linear in K (the run_daily_build lesson, rule 5). Convergence
monitoring at scale = Σ|r_{i+1} − r_i| as a one-row aggregate per
round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_UNIT = 1_000_000
PR_DAMPING_PCT = 85


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    unit: int = PR_UNIT,
    damping_pct: int = PR_DAMPING_PCT,
) -> DataFrame:
    """(node, rank) after ``n_iter`` rounds of the integer recurrence.

    ``nodes``: one ``node`` column (every vertex, including sinks
    that receive mass but have no out-edges — they keep their base
    share). ``edges``: (src, dst) multiset; parallel edges count in
    both outdeg and contribution, matching the multiset semantics of
    the oracle construction. A node absent from ``edges.src`` simply
    contributes nothing (its mass is not redistributed — the bounded
    no-dangling-redistribution variant, stated so both engines
    implement the same spec).
    """
    base = ((100 - damping_pct) * unit) // 100
    out = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    ed = (
        edges.join(out, "src")
        .select("src", "dst", "outdeg")
        # reused verbatim every round — one materialization
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select(
        "node", F.lit(int(unit)).cast("long").alias("r")
    ).localCheckpoint(eager=False)
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("div(r, outdeg)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"div({damping_pct} * coalesce(inc, 0L), 100)"
                    )
                )
                .cast("long")
                .alias("r"),
            )
            # keep the plan linear in n_iter (rule 5 shape)
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("r").alias("rank"))


def triangle_counts_per_node(und: DataFrame) -> DataFrame:
    """(node, n_triangles) over an UNDIRECTED edge set ``und(a, b)``
    (canonical a < b, deduped) — each triangle credits all three of
    its vertices once.

    The degree-oriented algorithm (the MapReduce classic): orient
    every edge from its lower (degree, id) endpoint to the higher,
    enumerate wedges by self-joining oriented edges on their source,
    and close each wedge against the oriented edge set. Orientation
    bounds per-node wedge fan-out by the graph's arboricity — total
    wedge work is O(E^1.5) worst case instead of Σdeg² — which is
    what makes the count feasible on power-law web graphs where a
    celebrity node's deg² would explode. The ordering key packs
    (degree, id) into one BIGINT (deg·2³² + id) so orientation and
    wedge ordering are single integer compares.

    Shuffles: degree group-by, two orientation joins on the endpoint
    key, the wedge self-join on the source key, the closing join on
    the (v, w) pair, and the final credit group-by — every one keyed
    and skew-bounded by the orientation. The edge and oriented tables
    checkpoint once each (rule 12: both feed multiple consumers).
    """
    und = und.localCheckpoint(eager=False)
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(
            "node",
            (F.col("deg") * F.lit(1 << 32) + F.col("node")).alias("okey"),
        )
    )
    oriented = (
        und.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("okey", "okey_a")
        .join(
            deg.withColumnRenamed("node", "b").withColumnRenamed(
                "okey", "okey_b"
            ),
            "b",
        )
        .select(
            F.when(F.col("okey_a") < F.col("okey_b"), F.col("a"))
            .otherwise(F.col("b"))
            .alias("src"),
            F.when(F.col("okey_a") < F.col("okey_b"), F.col("b"))
            .otherwise(F.col("a"))
            .alias("dst"),
            F.greatest("okey_a", "okey_b").alias("okey_dst"),
        )
        .localCheckpoint(eager=False)
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (F.col("e1.okey_dst") < F.col("e2.okey_dst")),
    ).select(
        F.col("e1.src").alias("u"),
        F.col("e1.dst").alias("v"),
        F.col("e2.dst").alias("w"),
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"], "inner")
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def hits_integer(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    unit: int = PR_UNIT,
) -> DataFrame:
    """(node, authority, hub) after ``n_iter`` HITS rounds
    (Kleinberg 1999) in deterministic integer arithmetic: each round
    pulls authorities from hub mass over in-edges, re-scales to
    ``unit`` by floor-dividing by the round's MAX (the normalization
    step — exact same integers in any engine, no float norm), then
    pulls hubs from the FRESH authorities over out-edges and
    re-scales likewise. Nodes outside the update keep 0.

    Scale shape (the pagerank_integer discipline): the edge table
    materializes once; each half-step is one key-shuffled aggregate
    with map-side partials; score tables checkpoint per round so the
    plan stays linear in rounds; the max is a one-row broadcast.
    """
    if n_iter < 1:
        raise ValueError("hits_integer: n_iter must be >= 1")
    ed = edges.select("src", "dst").localCheckpoint(eager=False)
    hub = nodes.select(
        "node", F.lit(int(unit)).cast("long").alias("s")
    ).localCheckpoint(eager=False)
    auth = None
    for _ in range(n_iter):
        a_raw = (
            ed.join(hub, ed["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("s").cast("long").alias("raw"))
        )
        auth = _rescale(nodes, a_raw, "dst", unit)
        h_raw = (
            ed.join(auth, ed["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("s").cast("long").alias("raw"))
        )
        hub = _rescale(nodes, h_raw, "src", unit)
    return auth.select("node", F.col("s").alias("authority")).join(
        hub.select("node", F.col("s").alias("hub")), "node"
    )


def _rescale(
    nodes: DataFrame, raw: DataFrame, key: str, unit: int
) -> DataFrame:
    """(node, s): raw scores floor-rescaled so the max equals
    ``unit``; absent nodes score 0. The RAW aggregate is checkpointed
    first — the max fold and the join are two consumers, and without
    the boundary each half-step's edges-join + sum would execute
    twice (rule 12; review r11). The rescaled output is checkpointed
    too — it feeds the next half-step AND the final join, and the
    per-round boundary keeps the iterative plan linear."""
    raw = raw.localCheckpoint(eager=False)
    # Loud-subset convention (ADVICE r11): an edge-less / all-zero
    # graph makes mx NULL (empty aggregate) or 0 and every score would
    # silently become NULL via the floor division — raise instead.
    # The guard must ride INSIDE the consumed column or Catalyst
    # prunes it away; if(p, x, x) constant-folds to x; and `mx0 + g`
    # null-short-circuits PAST g exactly when mx0 is NULL (the failure
    # case).  coalesce evaluates its first argument first: assert_true
    # yields NULL on success, so the value falls through to mx0.
    mx = raw.agg(F.max("raw").alias("mx0")).select(
        F.expr(
            "coalesce(cast(assert_true(coalesce(mx0, 0) > 0,"
            " 'hits_integer: graph has no edges (empty raw aggregate)')"
            " as long), mx0)"
        ).alias("mx")
    )
    return (
        nodes.join(raw, nodes["node"] == raw[key], "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "node",
            F.expr(f"({unit} * coalesce(raw, 0)) div mx")
            .cast("long")
            .alias("s"),
        )
        .localCheckpoint(eager=False)
    )
