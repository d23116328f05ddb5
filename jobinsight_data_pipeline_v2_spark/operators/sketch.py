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


def cms_inner_product(
    cms_a: DataFrame,
    cms_b: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """One-row (cms_est long): the Cormode–Muthukrishnan inner-product
    estimator min_j Σ_pos a[j][pos]·b[j][pos] — the equi-join output
    cardinality |A ⋈_k B| = Σ_k a_k·b_k estimated from two one-row
    sketches without either key table. Always an OVERestimate
    (colliding keys add nonnegative cross terms), expected excess
    N_a·N_b/W per hash row with min-of-D concentration. Work is a
    ≤ D·W map-explode — constant size."""
    b = cms_b.select(F.col("__cms").alias("__cms_b"))
    return (
        cms_a.crossJoin(b)
        .select(F.explode(F.map_entries("__cms")).alias("e"), "__cms_b")
        .select(
            (F.col("e.key") / width).cast("long").alias("j"),
            (
                F.col("e.value")
                * F.coalesce(
                    F.element_at("__cms_b", F.col("e.key")), F.lit(0)
                )
            ).alias("p"),
        )
        .groupBy("j")
        .agg(F.sum("p").alias("dot"))
        # an EMPTY sketch map explodes to zero rows and min over zero
        # groups is NULL — return 0 like the driver-side estimator
        # (review r10: a NULL estimate makes within-bound flags and
        # planner decisions three-valued)
        .agg(
            F.coalesce(F.min("dot"), F.lit(0))
            .cast("long")
            .alias("cms_est")
        )
    )


def save_cms(cms: DataFrame, path: str) -> None:
    """Persist a one-row sketch as a parquet artifact — the
    per-ingest-batch planner-statistics shape: sketches written at
    ingest time answer join-size questions months later without
    re-reading data (merge = slot-wise ADD of the maps)."""
    cms.write.mode("overwrite").parquet(path)


def load_cms(spark, path: str) -> DataFrame:
    """Read a persisted sketch back as the one-row ``__cms`` frame."""
    return spark.read.parquet(path)


def _collect_cms(cms: DataFrame) -> dict[int, int]:
    row = cms.select("__cms").collect()[0][0]
    return dict(row) if row is not None else {}


def cms_join_estimate(
    cms_fact: DataFrame,
    cms_dim: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> dict[str, int]:
    """Driver-side planning numbers from two sketches:
    {n_fact, n_dim, est_join_rows}. Side totals are EXACT (every key
    adds its full weight once per hash row, so row 0 sums to N);
    est_join_rows is the inner-product overestimate. The sketches are
    one-row constant-size maps, so collecting them is a planner-cost
    operation, not a data scan."""
    a = _collect_cms(cms_fact)
    b = _collect_cms(cms_dim)
    n_fact = sum(v for k, v in a.items() if k < width)
    n_dim = sum(v for k, v in b.items() if k < width)
    est = min(
        (
            sum(
                v * b.get(k, 0)
                for k, v in a.items()
                if j * width <= k < (j + 1) * width
            )
            for j in range(depth)
        ),
        default=0,
    )
    return {"n_fact": n_fact, "n_dim": n_dim, "est_join_rows": est}


def cms_planned_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    *,
    cms_fact: DataFrame | None = None,
    cms_dim: DataFrame | None = None,
    broadcast_limit_rows: int = 2_000_000,
    fanout_limit: int = 4,
    broadcast_limit_bytes: int = 64 << 20,
) -> tuple[DataFrame, dict]:
    """The sketch trio's PLANNING decision (VERDICT r9 ask #4): choose
    the physical strategy for ``fact ⋈ dim`` from persisted CMS
    sketches over the two key distributions, falling back to source
    file size when no sketches exist. Returns (joined, decision).

    Broadcast-hash iff the dim side is small (n_dim ≤
    broadcast_limit_rows, exact from the sketch totals) AND the
    estimated join output does not explode (est_join_rows ≤
    fanout_limit · n_fact — a hot many-to-many key makes the
    broadcast build's row replication the bottleneck and the salted /
    shuffle machinery the right tool); otherwise an explicit
    sort-merge (``hint("merge")`` so the choice is the HELPER's, not
    AQE's auto-broadcast). Without sketches the dim side's
    ``_spread_src_bytes`` (the tfidf broadcast-gate device) decides
    against ``broadcast_limit_bytes``; absent that too, the
    conservative shuffle path wins. The decision dict records which
    inputs drove the choice — the plan-shape tests pin that the SAME
    side sizes flip strategy on the inner-product estimate alone."""
    decision: dict = {"strategy": "merge", "inputs": "none"}
    if cms_fact is not None and cms_dim is not None:
        est = cms_join_estimate(cms_fact, cms_dim)
        decision.update(est)
        decision["inputs"] = "cms"
        if est["n_dim"] <= broadcast_limit_rows and est[
            "est_join_rows"
        ] <= fanout_limit * max(est["n_fact"], 1):
            decision["strategy"] = "broadcast"
    else:
        src = getattr(dim, "_spread_src_bytes", None)
        if src is not None:
            decision["inputs"] = "file_size"
            decision["dim_bytes"] = src
            if src <= broadcast_limit_bytes:
                decision["strategy"] = "broadcast"
    if decision["strategy"] == "broadcast":
        return fact.join(F.broadcast(dim), on), decision
    return fact.join(dim.hint("merge"), on), decision


# ---------------------------------------------------------------------------
# HyperLogLog: fixed-memory distinct counting (Flajolet et al. 2007)
# ---------------------------------------------------------------------------
#
# The cardinality sibling of the CMS above, same discipline: registers
# build in-plan from xxhash64 (map-side-combined max per slot — a hot
# group never concentrates raw rows on a reducer, only <= m register
# rows), sketches over disjoint splits merge by slot-wise MAX, and
# gates emit EXACT counts plus a within-bound flag (hash values and
# the float estimate never reach an oracle hash). Rank extraction is
# an integer CASE ladder (bit_length via comparisons), so registers
# are bit-stable; floats appear only in the final estimate, which
# feeds flags. Spark's own approx_count_distinct is HLL++ behind a
# black box — this surface exists for when the REGISTERS are the
# artifact: persisted per ingest batch and merged across days without
# re-reading data, the shape a 100 TB dedup-accounting pipeline needs.

HLL_P = 8  # 2^p registers
_HLL_W_BITS = 64  # hash width; rank runs over the bits above the slot


def _bit_length_case(expr: str, max_bits: int) -> str:
    """Integer bit_length(expr) as a CASE ladder (no clz builtin)."""
    parts = [
        f"WHEN {expr} >= {1 << (b - 1)} THEN {b}"
        for b in range(max_bits, 0, -1)
    ]
    return "CASE " + " ".join(parts) + " ELSE 0 END"


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
) -> DataFrame:
    """(group_cols…, slot, rank): per-group HLL register table.
    slot = low ``p`` bits of xxhash64(key); rank = 1 + leading zeros
    of the remaining ``64-p`` bits (the all-zero suffix maps to the
    maximum rank). At most 2^p rows per group regardless of input
    size; absent slots mean register value 0."""
    m = 1 << p
    wbits = _HLL_W_BITS - p
    w = f"shiftrightunsigned(xxhash64({key_col}), {p})"
    rank = f"({wbits + 1} - ({_bit_length_case(w, wbits)}))"
    return (
        df.select(
            *group_cols,
            F.expr(f"pmod(xxhash64({key_col}), {m})").alias("slot"),
            F.expr(rank).cast("int").alias("r"),
        )
        .groupBy(*group_cols, "slot")
        .agg(F.max("r").alias("rank"))
    )


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Slot-wise max — registers from disjoint (or overlapping) splits
    merge losslessly into the union's registers."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "slot")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Register table → (group_cols…, hll_est double): the standard
    HLL estimator with the small-range linear-counting correction
    (raw ≤ 2.5m with empty registers → m·ln(m/V)). Floats are
    confined here — estimates feed within-bound flags, never an
    oracle hash."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr("pow(0.5, rank)")).alias("__z_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    z = F.col("__z_present") + (F.lit(m) - F.col("__n_present"))
    raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - F.col("__n_present")  # empty registers
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_est"))


# ---------------------------------------------------------------------------
# log2-bucket quantile histogram: the rank sibling of CMS/HLL above
# ---------------------------------------------------------------------------
#
# Fixed-memory quantile summaries with EXACT counts and power-of-two
# value resolution: bucket(v) = floor(log2(v)) for v >= 1 (integer
# CASE ladder, never float log), <= ~64 buckets per group regardless
# of input size. Unlike GK/t-digest the structure is deterministic
# and merge is plain bucket-wise ADDITION — per-ingest-batch
# histograms persist and answer union quantiles (to within their
# bucket bounds) without re-reading data, and every number in the
# artifact is integer-exact, so gates hash-pin the WHOLE histogram
# rather than flag an approximation.

QHIST_MAX_BITS = 48


def qhist_bucket_sql(expr: str, max_bits: int = QHIST_MAX_BITS) -> str:
    """floor(log2(expr)) for expr >= 1 as an integer CASE ladder —
    IDENTICAL text runs on Spark SQL and DuckDB (the DSIR device), so
    the gate's oracle computes the same buckets bit for bit."""
    return f"({_bit_length_case(expr, max_bits)} - 1)"


def qhist_build(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols…, bucket, cnt): per-group log2 histogram over a
    positive integer column (values < 1 raise in-plan — a quantile
    artifact silently mis-bucketing zeros would corrupt every merge
    downstream)."""
    # both range ends guarded loudly: values past the ladder's top
    # rung would SILENTLY land in the top bucket (confirmed: 2^48 →
    # bucket 47) and corrupt every merged artifact downstream —
    # exactly the failure the v < 1 guard exists to prevent (review
    # r8, second pass)
    guarded = F.coalesce(
        F.assert_true(
            (F.col(value_col) >= 1)
            & (F.col(value_col) < F.lit(1 << QHIST_MAX_BITS)),
            F.lit(
                f"qhist_build: {value_col} outside [1, 2^"
                f"{QHIST_MAX_BITS}) — log2 buckets are defined for "
                "positive integers under the ladder's top rung; "
                "shift/filter first or widen QHIST_MAX_BITS"
            ),
        ).cast("bigint"),
        F.lit(0),
    )
    bucket = F.expr(qhist_bucket_sql(value_col)) + guarded
    return (
        df.select(*group_cols, bucket.cast("int").alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def qhist_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Bucket-wise sum — histograms over disjoint splits merge into
    exactly the union's histogram."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch: the SET-OPERATION member of the sketch family
# ---------------------------------------------------------------------------
#
# CMS answers frequency, HLL answers union-distinct, qhist answers
# rank. The k-minimum-values (theta) sketch answers what none of them
# can: INTERSECTION and DIFFERENCE cardinalities between independently
# built sketches (the DataSketches theta algebra). A sketch is the k
# smallest distinct 63-bit key hashes, sorted ascending — a one-row
# array artifact like the CMS map. With theta = the k-th smallest
# value (or 2^63 when fewer than k distinct keys exist — the sketch is
# then EXACT), every hash below theta is a uniform sample of the key
# space at rate theta/2^63, so |{sampled hashes with property P}| *
# 2^63 / theta estimates |{keys with P}| for any P expressible on the
# retained hashes: union, intersection, difference. Integers
# everywhere except the final estimate division (the HLL discipline —
# estimates feed within-bound flags, never an oracle hash).
#
# Merge is slice(sort(array_union(a, b)), 1, k) — associative,
# commutative, lossless w.r.t. the union's own sketch, so per-batch
# sketches persist and answer cross-batch set questions without
# re-reading data.

KMV_K = 256
_KMV_RANGE = 1 << 63  # xxhash64 >> 1: uniform on [0, 2^63)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    k: int = KMV_K,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols…, kmv array<bigint> ascending): the k smallest
    distinct non-negative hashes per group. One distinct shuffle on
    the hash + a TakeOrdered (ungrouped) or per-group window top-k —
    the output is k values per group regardless of input size."""
    h = F.expr(f"shiftrightunsigned(xxhash64({key_col}), 1)")
    hashed = df.select(*group_cols, h.alias("__h")).distinct()
    if group_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy("__h")
        topk = (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    else:
        topk = hashed.orderBy("__h").limit(k)
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv")
    )


def kmv_merge_arrays(a, b, k: int = KMV_K):
    """In-row merge of two sketch arrays: the union's own sketch."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_theta(col, k: int = KMV_K):
    """theta column: k-th smallest retained hash, or 2^63 - 1 when
    the sketch holds every distinct key (exact mode — 2^63 itself
    overflows LongType; float(2^63 - 1) rounds to exactly 2^63, so
    the exact-mode scale factor 2^63/theta is exactly 1.0)."""
    return F.when(
        F.size(col) >= k, F.element_at(col, k)
    ).otherwise(F.lit(_KMV_RANGE - 1))


def kmv_distinct_estimate(col, k: int = KMV_K):
    """Unbiased KMV estimator: (k-1) * 2^63 / theta; exact when the
    sketch is exact. Float appears only here."""
    return F.when(
        F.size(col) >= k,
        F.lit(float((k - 1) * _KMV_RANGE)) / kmv_theta(col, k),
    ).otherwise(F.size(col).cast("double"))


def kmv_set_op_counts(df: DataFrame, a: str, b: str,
                      k: int = KMV_K) -> DataFrame:
    """Given one-row sketch columns ``a`` and ``b``, append the theta
    algebra: ``__theta_u`` (min of the two thetas) plus integer sample
    counts below it — ``n_a_s``/``n_b_s``/``n_inter_s``/``n_union_s``
    — and float estimates ``est_union``/``est_inter``/``est_diff``
    (a-only). Every count is in-row array arithmetic on two ≤k-element
    arrays; the scale-up factor 2^63/theta_u applies once per
    estimate."""
    tu = "__theta_u"
    out = df.withColumn(
        tu, F.least(kmv_theta(F.col(a), k), kmv_theta(F.col(b), k))
    )
    below = lambda c: F.filter(F.col(c), lambda x: x < F.col(tu))
    out = (
        out.withColumn("__a_s", below(a))
        .withColumn("__b_s", below(b))
        .withColumn("n_a_s", F.size("__a_s"))
        .withColumn("n_b_s", F.size("__b_s"))
        .withColumn(
            "n_inter_s", F.size(F.array_intersect("__a_s", "__b_s"))
        )
        .withColumn(
            "n_union_s", F.size(F.array_union("__a_s", "__b_s"))
        )
    )
    scale = F.lit(float(_KMV_RANGE)) / F.col(tu)
    return (
        out.withColumn("est_union", F.col("n_union_s") * scale)
        .withColumn("est_inter", F.col("n_inter_s") * scale)
        .withColumn(
            "est_diff", (F.col("n_a_s") - F.col("n_inter_s")) * scale
        )
        .drop("__a_s", "__b_s")
    )
