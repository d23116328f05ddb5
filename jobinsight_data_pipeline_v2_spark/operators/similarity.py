"""Similarity search over embedding columns (ANN).

Brute-force cosine top-k is the exactness baseline (plans/vectors.py,
oracle-checked). This module adds the scale paths:

- random-hyperplane LSH bucketing: candidate generation linear in
  corpus size; recall tunable via (n_planes, n_tables);
- IVF-style coarse quantization against provided/learned centroids:
  probe only the closest nprobe cells.

Everything is expressed with higher-order array functions (zip_with /
aggregate folds) — JVM codegen, no Python per row. The "random"
hyperplanes are deterministic: plane components are derived from
xxhash64(table, plane, dim) mapped to [-1, 1), so the index is
reproducible across runs/clusters with no driver-side RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("__norm", F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k per query vector (brute force, batched).

    query: (query_id, embedding). One broadcast of the query batch, one
    corpus scan, per-query TakeOrdered via window — the canonical
    many-queries-at-once shape.
    """
    q = query.select(
        F.col("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        with_norm(corpus, vec_col)
        .crossJoin(F.broadcast(with_norm(q, "__qv").withColumnRenamed("__norm", "__qnorm")))
        .withColumn(
            "cosine_sim",
            _dot(vec_col, "__qv") / (F.col("__norm") * F.col("__qnorm")),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select("query_id", id_col, "cosine_sim", F.col("__rank").alias("rank"))
    )


def cosine_topk_filtered(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    match_cols: tuple[str, ...] = ("label",),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid (filtered) vector search: exact top-k per query among
    ONLY the corpus rows matching the query's metadata columns — the
    "search within my tenant / language / shard" serving shape.

    Same contract as ``cosine_topk`` (broadcast query batch, one
    corpus scan, per-query window with the cosine-desc/id-asc tie
    rule), but the cross join becomes an EQUI-join on ``match_cols``:
    a corpus row is scored against exactly the queries sharing its
    metadata, so the scored row count drops from \\|corpus\\|·\\|batch\\| to
    Σ per-key matches — at scale the predicate prunes before any
    arithmetic, not after. A query whose key matches nothing returns
    no rows (the serving caller's miss path)."""
    keys = list(match_cols)
    q = query.select(
        F.col("query_id"), F.col(vec_col).alias("__qv"), *keys
    )
    scored = (
        with_norm(corpus, vec_col)
        .join(
            F.broadcast(
                with_norm(q, "__qv").withColumnRenamed("__norm", "__qnorm")
            ),
            keys,
        )
        .withColumn(
            "cosine_sim",
            _dot(vec_col, "__qv") / (F.col("__norm") * F.col("__qnorm")),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select(
            "query_id",
            *keys,
            id_col,
            "cosine_sim",
            F.col("__rank").alias("rank"),
        )
    )


def _plane_component(table: str, plane: str, dim: str) -> str:
    """Deterministic pseudo-random plane component in [-1, 1)."""
    return (
        f"cast(pmod(xxhash64({table}, {plane}, {dim}), 2000000) as double) "
        f"/ 1000000.0 - 1.0"
    )


def lsh_bucket(
    df: DataFrame,
    n_planes: int = 16,
    n_tables: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append (table, bucket) rows: sign-pattern of `n_planes` random
    hyperplane projections per table.

    Output has n_tables rows per input row. Bucket = bit-packed signs.
    Cost: O(rows × tables × planes × dim) multiply-adds in codegen.
    """
    return (
        df.withColumn("table", F.explode(F.expr(f"sequence(0, {n_tables - 1})")))
        .withColumn(
            "bucket",
            F.expr(
                f"""
                aggregate(
                  sequence(0, {n_planes - 1}),
                  0L,
                  (acc, p) -> acc + if(
                    aggregate(
                      zip_with(
                        {vec_col},
                        transform(sequence(0, size({vec_col}) - 1),
                                  d -> {_plane_component('table', 'p', 'd')}),
                        (x, w) -> cast(x as double) * w),
                      0D, (a, v) -> a + v) > 0D,
                    shiftleft(1L, p), 0L)
                )
                """
            ),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: only corpus rows sharing an LSH bucket with
    the query (in any table) are scored.

    Tuning: a neighbor at angle θ agrees with one random hyperplane
    with probability p = 1 − θ/π, with a whole table with p^n_planes,
    and is a candidate with recall ≈ 1 − (1 − p^n_planes)^n_tables.
    Raise n_planes to shrink buckets (fewer candidates per query),
    raise n_tables to buy recall back. The defaults (4, 16) give ~0.9
    recall at cosine ≈ 0.3 (θ≈72°); corpora whose true neighbors are
    closer can afford far more planes.
    """
    cb = lsh_bucket(corpus, n_planes, n_tables, vec_col)
    qb = lsh_bucket(
        query.select("query_id", F.col(vec_col).alias("__qv")), n_planes, n_tables, "__qv"
    )
    cands = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .select(id_col, vec_col, "query_id", "__qv")
        .distinct()
    )
    scored = cands.withColumn(
        "cosine_sim",
        _dot(vec_col, "__qv")
        / (F.sqrt(_dot(vec_col, vec_col)) * F.sqrt(_dot("__qv", "__qv"))),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select("query_id", id_col, "cosine_sim", F.col("__rank").alias("rank"))
    )


def collect_array_by_pos(pos: F.Column, val: F.Column) -> F.Column:
    """Aggregate expression re-assembling per-position rows into an
    array ordered by position: ``transform(array_sort(collect_list(
    struct(pos, val))), x -> x.val)``. The collect groups ≤ dim rows
    per key — the bounded tail of the posexplode + groupBy(key, pos)
    pattern that replaced member-sized fold buffers (ADVICE r3); used
    by kmeans_centroids and plans/vectors' centroid builds so the
    idiom cannot drift between them."""
    return F.transform(
        F.array_sort(
            F.collect_list(F.struct(pos.alias("p"), val.alias("v")))
        ),
        lambda x: x["v"],
    )


def _cells_index(centroids: DataFrame) -> DataFrame:
    """Collapse the centroid table into a ONE-ROW broadcast index:
    ``__cells`` = array<struct<cell_id, centroid, cnorm>>.

    An IVF coarse quantizer is small by construction (hundreds to
    thousands of cells); shipping it as one array-valued row lets
    assignment and probing run as NARROW per-row projections — the
    corpus is never shuffled and never row-expanded ×n_cells, which is
    exactly how a quantizer index behaves on a real cluster (resident
    on every executor, scanned per vector). collect_list order is
    nondeterministic, but every consumer reduces over the array with
    an order-independent argmin/sort, so results are stable.
    """
    return F.broadcast(
        centroids.select(
            F.struct(
                F.col("cell_id"),
                F.col("centroid"),
                F.sqrt(_dot("centroid", "centroid")).alias("cnorm"),
            ).alias("c")
        ).agg(F.collect_list("c").alias("__cells"))
    )


def _best_cell(vec_col: str, norm_col: str) -> F.Column:
    """struct(negsim, cell_id) of the nearest cell — array_min over the
    broadcast index (min negsim = max sim, ties → smallest cell_id,
    the same row the old window/min-struct formulations kept)."""
    dot = _DOT.format(a=vec_col, b="c.centroid")
    return F.expr(
        f"""
        array_min(transform(__cells, c -> struct(
            -({dot}) / ({norm_col} * c.cnorm) AS negsim,
            c.cell_id AS cell_id)))
        """
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell).

    centroids: (cell_id, centroid array). The centroid set rides in as
    a one-row broadcast array (_cells_index); assignment is then a
    narrow argmin projection per corpus row — no shuffle, no ×n_cells
    row expansion (the previous cross-join + min(struct) aggregate
    paid both). The output carries the row norm as ``__norm`` so
    downstream scoring (ivf_topk) can reuse it.
    """
    best = (
        with_norm(df, vec_col)
        .crossJoin(_cells_index(centroids))
        .withColumn("__best", _best_cell(vec_col, "__norm"))
    )
    other = [col for col in df.columns if col != id_col] + ["__norm"]
    return best.select(
        id_col,
        *other,
        F.col("__best.cell_id").alias("cell_id"),
        (-F.col("__best.negsim")).alias("cell_sim"),
    )


def ivf_probe_cells(
    query: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str = "__qv",
) -> DataFrame:
    """(query_id, cell_id, query vector, query norm): the ``nprobe``
    closest cells per query vector — the probe-list half of IVF search.

    One narrow projection per query row: sort the broadcast cell array
    by (sim desc, cell_id), slice ``nprobe``, explode. array_sort on
    struct(negsim, cell_id) reproduces the previous window ordering
    exactly; slice past the array end returns the whole array, so
    nprobe ≥ n_cells degrades to probing everything (the exactness
    gate configuration).
    """
    dot = _DOT.format(a=vec_col, b="c.centroid")
    q = query.withColumn("__qnorm", F.sqrt(_dot(vec_col, vec_col)))
    return (
        q.crossJoin(_cells_index(centroids))
        .select(
            "query_id",
            vec_col,
            "__qnorm",
            F.explode(
                F.expr(
                    f"""
                    transform(
                      slice(array_sort(transform(__cells, c -> struct(
                                -({dot}) / (__qnorm * c.cnorm) AS negsim,
                                c.cell_id AS cell_id))),
                            1, {int(nprobe)}),
                      s -> s.cell_id)
                    """
                )
            ).alias("cell_id"),
        )
        .select("query_id", "cell_id", vec_col, "__qnorm")
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """End-to-end IVF search: coarse-quantize the corpus, probe the
    ``nprobe`` closest cells per query, exact-score only those cells'
    members, top-k per query.

    Cost per query ≈ corpus_size × nprobe / n_cells exact scorings
    instead of corpus_size — the standard IVF recall/cost dial
    (nprobe = n_cells degrades gracefully to exact brute force, which
    is how the oracle gate pins this operator's semantics). The cell
    join is an equi-join on cell_id: at scale, pre-partitioning the
    assigned corpus by cell_id makes each probe touch only its cells'
    partitions.
    """
    assigned = ivf_assign(corpus, centroids, vec_col, id_col)
    probes = ivf_probe_cells(
        query.select("query_id", F.col(vec_col).alias("__qv")),
        centroids,
        nprobe,
    )
    cands = assigned.join(F.broadcast(probes), "cell_id")
    # __norm carried from ivf_assign, __qnorm from ivf_probe_cells —
    # only the cross dot product is evaluated per candidate pair.
    scored = cands.withColumn(
        "cosine_sim",
        _dot(vec_col, "__qv") / (F.col("__norm") * F.col("__qnorm")),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select("query_id", id_col, "cosine_sim", F.col("__rank").alias("rank"))
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    max_iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(cell_id, centroid, n_members): Lloyd's k-means over integer-
    quantized vectors — the LEARNED coarse quantizer for an IVF index
    (ivf_assign's label-derived centroids are the shortcut; this is
    how the cells are built when no labels exist).

    Spark-first shape per iteration: assignment is the broadcast-index
    narrow argmin (ivf_assign — no corpus shuffle); the update step is
    posexplode + groupBy(cell_id, pos) with map-side partial
    aggregation — every buffer is O(1) and the exchange carries ~k x
    dim rows per map partition. (A collect_list fold here would hold
    every member vector of a cell in one buffer: with k=8 a cell is
    ~1/8 of the corpus — an executor-OOM shape at scale; ADVICE r3.)
    The member count rides the same aggregation, and the dim-bounded
    collect_list that re-assembles the centroid array groups ≤ dim
    rows. The driver loop runs O(iterations) times (the sanctioned
    iterative-algorithm case, like dedup.component_min_labels); data
    never collects and each round's centroid table is
    localCheckpointed to keep lineage flat. Seeds are the k vectors
    with the smallest xxhash64(id) — deterministic across runs, no RNG
    state. Empty cells drop out (standard Lloyd's degeneracy); ids are
    re-densified at the end so cell_id ∈ [0, cells).
    """
    from pyspark.sql.window import Window

    vecs = df.select(id_col, vec_col).localCheckpoint(eager=False)
    # k-row seed table: the window spans k rows only, not the corpus
    cents = (
        vecs.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .select(F.col(id_col).alias("__sid"), F.col(vec_col).alias("centroid"))
        .select(
            F.row_number().over(Window.orderBy("__sid")).alias("cell_id"),
            "centroid",
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        assigned = ivf_assign(vecs, cents, vec_col, id_col)
        new_cents = (
            assigned.select(
                "cell_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("cell_id", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cell_id")
            .agg(
                F.max("n").alias("n_members"),
                collect_array_by_pos(F.col("pos"), F.col("s")).alias("sums"),
            )
            .select(
                "cell_id",
                F.expr(
                    "transform(sums, s -> cast(round(cast(s as double) / n_members) as bigint))"
                ).alias("centroid"),
                "n_members",
            )
            # lazy: materializes inside the next round's first job
            # instead of as its own blocking action (3 fewer driver
            # round trips per training run)
            .localCheckpoint(eager=False)
        )
        cents = new_cents.select("cell_id", "centroid")
    return new_cents.select(
        (
            F.row_number().over(Window.orderBy("cell_id")) - 1
        ).alias("cell_id"),
        "centroid",
        "n_members",
    )


# ---------------------------------------------------------------------------
# product quantization (PQ): codebook training, encoding, ADC search
# ---------------------------------------------------------------------------
#
# The memory-scale path of ANN (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): split each D-dim vector into
# n_sub subvectors, k-means each subspace into `codes` centroids, store
# every corpus vector as n_sub small codes. Search = asymmetric
# distance computation (ADC): per query, precompute the n_sub × codes
# table of query-subvector · centroid dot products ONCE, then score any
# corpus vector with n_sub table lookups — never touching the original
# vectors — and exact-re-rank only the `refine` best candidates.
#
# Spark-first shape: codebooks are corpus-independent-sized (n_sub ×
# codes rows), so they ride as one-row broadcast structures exactly
# like the IVF cells index; encoding is a narrow per-row argmin; the
# ADC scan shuffles only (query_id, vec_id, approx_sim) triples —
# vectors stay in the parquet scan until the refine join re-reads the
# few candidate rows. Training mirrors kmeans_centroids' discipline:
# ADVICE-safe posexplode+groupBy(m, code, pos) update buffers,
# deterministic hash seeds, lazy per-round checkpoints.

_PQ_KEY_PAD = 1_000_000  # map key = m * PAD + code (codes < PAD always)


def _unrolled_lut_sum(map_col: str, n_sub: int, field: str = "") -> str:
    """Σ_mi map[mi·PAD + codes[mi+1]]{field} as an UNROLLED sum —
    n_sub is a plan-time constant, and an aggregate-fold lambda would
    evaluate its body interpreted (working-notes rule 10); these
    lookups run once per (corpus row × query) in the hottest ADC
    scans, so they must stay inside whole-stage codegen. Left-to-right
    addition matches the fold's accumulation order bit for bit."""
    terms = [
        f"element_at({map_col}, {mi}L * {_PQ_KEY_PAD}"
        f" + element_at(codes, {mi + 1})){field}"
        for mi in range(n_sub)
    ]
    return "(" + " + ".join(terms) + ")"


def _pq_cb_index(cb: DataFrame) -> DataFrame:
    """One-row broadcast codebook: ``__cb`` array + ``__cbm`` map
    (m * PAD + code → struct(centroid, cn2))."""
    entry = F.struct(
        F.col("m"),
        F.col("code"),
        F.col("centroid"),
        _dot("centroid", "centroid").alias("cn2"),
    ).alias("c")
    return F.broadcast(
        cb.select(entry).agg(
            F.collect_list("c").alias("__cb"),
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("c.m") * _PQ_KEY_PAD + F.col("c.code")).alias(
                            "k"
                        ),
                        F.struct(
                            F.col("c.centroid").alias("centroid"),
                            F.col("c.cn2").alias("cn2"),
                        ).alias("v"),
                    )
                )
            ).alias("__cbm"),
        )
    )


def _pq_best_code(sv_expr: str) -> str:
    """L2 argmin over the current subspace's codebook entries:
    ``struct(cn2 - 2·(sv · centroid), code)`` min — integer-exact for
    quantized vectors, ties to the smallest code. Expects lambda var
    ``mi`` (subspace) and the one-row ``__cb`` array in scope."""
    dot = _DOT.format(a=sv_expr, b="c.centroid")
    return (
        f"array_min(transform(filter(__cb, c -> c.m = mi), c -> "
        f"struct(c.cn2 - 2D * ({dot}) AS negd, c.code AS code))).code"
    )


def pq_train(
    df: DataFrame,
    n_sub: int = 4,
    codes: int = 16,
    max_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(m, code, centroid): per-subspace Lloyd's k-means codebooks.

    Like kmeans_centroids but clustering every subspace at once: the
    (id, m, subvector) rows carry their subspace id, assignment
    argmins over the matching codebook slice of the one-row broadcast
    index, and the update step is posexplode + groupBy(m, code, pos) —
    O(1) aggregation buffers, exchange rows ≈ n_sub × codes × dim per
    map partition (the ADVICE-r3-safe shape). Seeds are the `codes`
    ids with the smallest xxhash64 — picked ONCE with a TakeOrdered
    (kmeans_centroids' device; no per-subspace window funnelling the
    training set through n_sub tasks) and sliced into every subspace.
    Empty codes drop out (Lloyd degeneracy); code ids keep their seed
    numbering — consumers look codes up by (m, code), nothing requires
    density.
    """
    from pyspark.sql.window import Window

    dim = len(df.select(vec_col).first()[0])
    if dim % n_sub:
        raise ValueError(
            f"embedding dim {dim} not divisible by n_sub={n_sub}: the "
            f"trailing {dim % n_sub} components would be silently "
            "dropped from training/ADC while exact re-rank scores them"
        )
    if codes >= _PQ_KEY_PAD:
        raise ValueError(
            f"codes={codes} >= {_PQ_KEY_PAD}: code ids would collide "
            "across subspaces in the m*PAD+code map keys every ADC "
            "consumer relies on"
        )
    sub = dim // n_sub
    subs = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.expr(
                            f"slice({vec_col}, {m * sub + 1}, {sub})"
                        ).alias("sv"),
                    )
                    for m in range(n_sub)
                ]
            )
        ).alias("s"),
    ).select("id", "s.m", "s.sv").localCheckpoint(eager=False)
    # seed rows: TakeOrdered over FULL vectors (codes rows — bounded),
    # then the k-row window only numbers those; subspace slices of the
    # same seed ids keep per-subspace seeds deterministic without a
    # corpus-wide partitionBy(m) window (review r4: that shape sorts
    # the whole training set in n_sub tasks)
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(codes)
        .select(
            F.col(id_col).alias("__sid"), F.col(vec_col).alias("__sv")
        )
        .select(
            (F.row_number().over(Window.orderBy("__sid")) - 1).alias("code"),
            "__sv",
        )
    )
    cb = (
        seed_rows.select(
            "code",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.expr(
                                f"slice(__sv, {m * sub + 1}, {sub})"
                            ).alias("centroid"),
                        )
                        for m in range(n_sub)
                    ]
                )
            ).alias("s"),
        )
        .select("s.m", "code", "s.centroid")
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        assigned = subs.crossJoin(_pq_cb_index(cb)).select(
            "m",
            "sv",
            F.expr(
                # mi binds the row's own subspace for _pq_best_code
                f"transform(array(m), mi -> {_pq_best_code('sv')})[0]"
            ).alias("code"),
        )
        cb = (
            assigned.select(
                "m", "code", F.posexplode(F.col("sv")).alias("pos", "val")
            )
            .groupBy("m", "code", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("m", "code")
            .agg(
                F.max("n").alias("n_members"),
                collect_array_by_pos(F.col("pos"), F.col("s")).alias("sums"),
            )
            .select(
                "m",
                "code",
                F.expr(
                    "transform(sums, s -> cast(round(cast(s as double) / n_members) as bigint))"
                ).alias("centroid"),
            )
            .localCheckpoint(eager=False)
        )
    return cb


def _pq_dims(cb: DataFrame) -> tuple[int, int]:
    """(n_sub, sub) from a codebook — ONE small aggregation job.
    Callers that invoke several PQ stages fetch this once and pass it
    down; stages only recompute when called standalone."""
    return cb.agg(F.max("m") + 1, F.max(F.size("centroid"))).first()


def pq_encode(
    df: DataFrame,
    cb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, int] | None = None,
) -> DataFrame:
    """(id, codes array<int>, approx_n2): corpus rows compressed to
    their per-subspace code ids plus the reconstructed squared norm
    (Σ‖c_m‖² — query-independent, so computed once here, not per
    query). Narrow: one broadcast of the codebook index, no shuffle.
    """
    n_sub, sub = dims or _pq_dims(cb)
    # codes and approx_n2 in two chained projections: approx_n2 reads
    # the codes column, and building it in the same select would
    # re-run the argmin per lookup under projection collapse. The
    # checkpoint holds ONLY (id, codes) — materializing __cbm here
    # would copy the whole codebook map per corpus row (storage
    # O(corpus × codebook), ADVICE r4); the approx_n2 projection
    # crossJoins the one-row broadcast index again instead.
    coded = df.crossJoin(_pq_cb_index(cb)).select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform(sequence(0, {n_sub - 1}), mi -> "
            + _pq_best_code(f"slice({vec_col}, mi * {sub} + 1, {sub})")
            + ")"
        ).alias("codes"),
    ).localCheckpoint(eager=False)
    return coded.crossJoin(_pq_cb_index(cb)).select(
        "id",
        "codes",
        F.expr(_unrolled_lut_sum("__cbm", n_sub, ".cn2")).alias("approx_n2"),
    )


def pq_query_luts(
    query: DataFrame,
    cb: DataFrame,
    vec_col: str = "embedding",
    dims: tuple[int, int] | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(query_id, [carry…], __qv, __qnorm, __lut): per-query ADC lookup
    table — map (m·PAD + code) → q_sub · centroid — built narrowly
    from the one-row broadcast codebook. Works identically on a batch
    query table and a streaming query frame (stream-static join
    against the broadcast index). ``carry`` columns (e.g. an
    event-time column for watermarked serving) ride through
    untouched."""
    _, sub = dims or _pq_dims(cb)
    return (
        query.select("query_id", *carry, F.col(vec_col).alias("__qv"))
        .crossJoin(_pq_cb_index(cb))
        .select(
            "query_id",
            *carry,
            "__qv",
            F.sqrt(_dot("__qv", "__qv")).alias("__qnorm"),
            F.expr(
                f"""
                map_from_entries(transform(__cb, c -> struct(
                  cast(c.m AS BIGINT) * {_PQ_KEY_PAD} + c.code,
                  {_DOT.format(a=f"slice(__qv, c.m * {sub} + 1, {sub})", b="c.centroid")})))
                """
            ).alias("__lut"),
        )
    )


def pq_adc_scores(
    coded: DataFrame,
    q: DataFrame,
    dims: tuple[int, int],
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(query_id, id, approx_sim): the ADC scan — n_sub map lookups
    per (corpus row, query) over the broadcast query LUTs; corpus
    vectors never touched. Shared by pq_topk's stage 1 and the
    streaming serving twin (streaming/serving.ann_stream) — when the
    query side streams, it must be the join's left input
    (stream-static), with the coded corpus as the static side."""
    n_sub, _ = dims
    qs = q.select("query_id", *carry, "__qnorm", "__lut")
    joined = (
        qs.crossJoin(coded)
        if qs.isStreaming
        else coded.crossJoin(F.broadcast(qs))
    )
    return (
        joined
        .select(
            "query_id",
            *carry,
            "id",
            F.expr(_unrolled_lut_sum("__lut", n_sub)).alias("__adot"),
            "approx_n2",
            "__qnorm",
        )
        .select(
            "query_id",
            *carry,
            "id",
            # Degenerate-codebook guard (ADVICE r4): a row whose
            # reconstruction is the zero vector has approx_n2 = 0 and
            # would otherwise score NULL (Spark ÷0 → NULL), silently
            # sinking below all candidates. Quantized-integer vectors
            # make any nonzero reconstruction have approx_n2 ≥ 1, so
            # greatest(·, 1) changes ONLY exact-zero rows — whose
            # numerator is exactly 0 too — pinning their score to 0.0
            # (a deliberate "no information" rank, not NULL ordering).
            (
                F.col("__adot")
                / (
                    F.col("__qnorm")
                    * F.sqrt(F.greatest(F.col("approx_n2"), F.lit(1.0)))
                )
            ).alias("approx_sim"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    cb: DataFrame,
    query: DataFrame,
    k: int = 10,
    refine: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage PQ search: ADC scan over codes, exact re-rank of the
    top-``refine`` candidates per query.

    Stage 1 never touches a corpus vector: each query precomputes its
    n_sub × codes lookup table (one small map per query row, built
    from the broadcast codebook), and scoring a corpus row is n_sub
    map lookups over its codes. Only (query_id, vec_id, approx_sim)
    triples reach the per-query top-`refine` window. Stage 2 joins the
    ≤ queries × refine candidate ids back to the corpus (broadcast
    semi-shape) and ranks by exact cosine — the standard
    accuracy-recovery step. Approximate scores never leave stage 1.
    """
    from pyspark.sql.window import Window

    dims = _pq_dims(cb)
    coded = pq_encode(corpus, cb, vec_col, id_col, dims=dims)
    q = pq_query_luts(query, cb, vec_col, dims=dims)
    scored = pq_adc_scores(coded, q, dims)
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.col("id")
    )
    cands = (
        scored.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= refine)
        .select("query_id", F.col("id").alias(id_col))
    )
    return _exact_rerank(corpus, cands, q, k, vec_col, id_col)


def _exact_rerank(
    corpus: DataFrame,
    cands: DataFrame,
    q: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Stage-2 accuracy recovery shared by pq_topk / ivfpq_topk: join
    the ≤ queries × refine candidate ids back to the corpus (broadcast
    semi-shape — the corpus is filtered, never shuffled), score the
    exact cosine, rank top-k per query. ``q`` carries (query_id, __qv,
    __qnorm)."""
    from pyspark.sql.window import Window

    rer = (
        corpus.join(F.broadcast(cands), id_col)
        .join(
            F.broadcast(q.select("query_id", "__qv", "__qnorm")), "query_id"
        )
        .withColumn("__norm", F.sqrt(_dot(vec_col, vec_col)))
        .withColumn(
            "cosine_sim",
            _dot(vec_col, "__qv") / (F.col("__norm") * F.col("__qnorm")),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine_sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: residual product quantization inside IVF cells
# ---------------------------------------------------------------------------
#
# The composition behind billion-vector indexes (FAISS IndexIVFPQ):
# coarse-quantize to a cell, PQ-encode the RESIDUAL vector − centroid
# (residuals are smaller and more isotropic than raw vectors, so the
# same codebook budget quantizes them better), search by probing a few
# cells and ADC-scoring their members as
#     q·x ≈ q·c_cell + Σ_m lut_r[m][code_m]      (lut over residual cb)
#     ‖x‖² ≈ Σ_m ‖c_m + r̂_m‖²                   (query-independent)
# then exact-re-rank the refine best. Both index structures (cells,
# residual codebooks) are corpus-independent-sized one-row broadcasts;
# corpus vectors are touched only at encode time and in the refine
# join.


def residuals(
    df: DataFrame,
    cents: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell_id, vec_col = vector − assigned-cell centroid)."""
    assigned = ivf_assign(df, cents, vec_col, id_col)
    c = F.broadcast(
        cents.select(F.col("cell_id"), F.col("centroid").alias("__cc"))
    )
    return assigned.join(c, "cell_id").select(
        id_col,
        "cell_id",
        F.expr(f"zip_with({vec_col}, __cc, (x, y) -> x - y)").alias(vec_col),
        F.col("__cc"),
    )


def ivfpq_train(
    df: DataFrame,
    n_cells: int = 8,
    n_sub: int = 4,
    codes: int = 8,
    kmeans_iters: int = 2,
    pq_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """(cells, residual codebooks): learn the coarse quantizer, then
    PQ codebooks over the training set's residuals."""
    cents = kmeans_centroids(
        df, k=n_cells, max_iters=kmeans_iters, vec_col=vec_col, id_col=id_col
    ).select("cell_id", "centroid").localCheckpoint(eager=False)
    res = residuals(df, cents, vec_col, id_col).select(id_col, vec_col)
    cb = pq_train(
        res, n_sub=n_sub, codes=codes, max_iters=pq_iters,
        vec_col=vec_col, id_col=id_col,
    )
    return cents, cb


def ivfpq_encode(
    corpus: DataFrame,
    cents: DataFrame,
    cb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, int] | None = None,
) -> DataFrame:
    """(id, cell_id, codes, approx_n2): cell assignment + residual PQ
    codes + reconstructed squared norm Σ_m ‖c_m + r̂_m‖². Narrow per
    row (two one-row broadcasts), no shuffle."""
    n_sub, sub = dims or _pq_dims(cb)
    res = residuals(corpus, cents, vec_col, id_col)
    # Checkpoint holds ONLY (id, cell_id, codes) — carrying __cc/__cbm
    # through would materialize a cell centroid + full codebook map per
    # corpus row (O(corpus × codebook) storage, ADVICE r4). The
    # reconstruction projection re-acquires both from their broadcast
    # sources: the cells table by cell_id equi-join, the codebook by
    # re-crossJoining the one-row index. The checkpoint still guards
    # the per-subspace codes references below (rule 10).
    coded = (
        res.crossJoin(_pq_cb_index(cb))
        .select(
            F.col(id_col).alias("id"),
            "cell_id",
            F.expr(
                f"transform(sequence(0, {n_sub - 1}), mi -> "
                + _pq_best_code(f"slice({vec_col}, mi * {sub} + 1, {sub})")
                + ")"
            ).alias("codes"),
        )
        .localCheckpoint(eager=False)
    )
    # Σ_m ‖c_m + r̂_m‖² with the outer per-subspace loop UNROLLED
    # (plan-time constant — _unrolled_lut_sum rationale); the inner
    # zip_with/fold dot stays a lambda but runs once per subspace at
    # ENCODE time only, never in the per-query ADC scan.
    def _recon_sub(mi: int) -> str:
        return (
            f"zip_with(slice(__cc, {mi * sub + 1}, {sub}), "
            f"element_at(__cbm, {mi}L * {_PQ_KEY_PAD} "
            f"+ element_at(codes, {mi + 1})).centroid, (a, b) -> a + b)"
        )

    approx_n2 = " + ".join(
        _DOT.format(a=_recon_sub(mi), b=_recon_sub(mi))
        for mi in range(n_sub)
    )
    return coded.join(
        F.broadcast(
            cents.select("cell_id", F.col("centroid").alias("__cc"))
        ),
        "cell_id",
    ).crossJoin(_pq_cb_index(cb)).select(
        "id",
        "cell_id",
        "codes",
        F.expr(f"({approx_n2})").alias("approx_n2"),
    )


def ivfpq_topk(
    corpus: DataFrame,
    cents: DataFrame,
    cb: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    refine: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search: probe the ``nprobe`` closest cells per query,
    ADC-score only their members' residual codes, exact-re-rank the
    ``refine`` best. nprobe ≥ cells AND refine ≥ corpus degrades to
    exact brute force (the oracle-gate configuration).

    Per query the probe row carries the RAW q·c_cell dot (the constant
    term of the ADC sum) and the residual-codebook LUT; scoring a
    member is n_sub map lookups + one add. The candidate join is an
    equi-join on cell_id — at scale the encoded corpus is
    pre-partitioned by cell, so a probe touches only its cells'
    partitions."""
    from pyspark.sql.window import Window

    dims = _pq_dims(cb)
    coded = ivfpq_encode(corpus, cents, cb, vec_col, id_col, dims=dims)
    probes = ivfpq_probes(query, cents, cb, nprobe, dims, vec_col=vec_col)
    scored = ivfpq_adc_scores(coded, probes, dims)
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.col("id")
    )
    cands = (
        scored.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= refine)
        .select("query_id", F.col("id").alias(id_col))
    )
    q = probes.select("query_id", "__qv", "__qnorm").distinct()
    return _exact_rerank(corpus, cands, q, k, vec_col, id_col)


def ivfpq_probes(
    query: DataFrame,
    cents: DataFrame,
    cb: DataFrame,
    nprobe: int,
    dims: tuple[int, int] | None = None,
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(query_id, [carry…], __qv, __qnorm, cell_id, qdotc, __lut): the
    per-query probe list — the ``nprobe`` closest cells, each carrying
    the RAW q·c_cell dot (the ADC constant term) — plus the residual-
    codebook LUT. One narrow projection per query row against the two
    one-row broadcast indexes; works identically on batch and
    streaming query frames."""
    _, sub = dims or _pq_dims(cb)
    cdot = _DOT.format(a="__qv", b="c.centroid")
    return (
        query.select("query_id", *carry, F.col(vec_col).alias("__qv"))
        .crossJoin(_cells_index(cents))
        .crossJoin(_pq_cb_index(cb))
        .select(
            "query_id",
            *carry,
            "__qv",
            F.sqrt(_dot("__qv", "__qv")).alias("__qnorm"),
            F.explode(
                F.expr(
                    f"""
                    slice(array_sort(transform(__cells, c -> struct(
                        -({cdot}) / (sqrt({_DOT.format(a="__qv", b="__qv")}) * c.cnorm) AS negsim,
                        c.cell_id AS cell_id,
                        {cdot} AS qdotc))),
                      1, {int(nprobe)})
                    """
                )
            ).alias("p"),
            F.expr(
                f"""
                map_from_entries(transform(__cb, c -> struct(
                  cast(c.m AS BIGINT) * {_PQ_KEY_PAD} + c.code,
                  {_DOT.format(a=f"slice(__qv, c.m * {sub} + 1, {sub})", b="c.centroid")})))
                """
            ).alias("__lut"),
        )
        .select(
            "query_id",
            *carry,
            "__qv",
            "__qnorm",
            F.col("p.cell_id").alias("cell_id"),
            F.col("p.qdotc").alias("qdotc"),
            "__lut",
        )
    )


def ivfpq_adc_scores(
    coded: DataFrame,
    probes: DataFrame,
    dims: tuple[int, int],
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(query_id, [carry…], id, approx_sim): score probed cells'
    members as q·c_cell + residual-LUT lookups. An EQUI-join on
    cell_id — with the encoded corpus partitioned by cell, a probe
    touches only its cells' partitions. Shared by ivfpq_topk and the
    streaming serving twin; when probes stream, they take the join's
    left side (stream-static)."""
    n_sub, _ = dims
    ps = probes.select(
        "query_id", *carry, "cell_id", "qdotc", "__qnorm", "__lut"
    )
    joined = (
        ps.join(coded, "cell_id")
        if ps.isStreaming
        else coded.join(F.broadcast(ps), "cell_id")
    )
    return joined.select(
        "query_id",
        *carry,
        "id",
        (
            (
                F.col("qdotc")
                + F.expr(_unrolled_lut_sum("__lut", n_sub))
            )
            # same degenerate-reconstruction guard as pq_adc_scores:
            # approx_n2 = 0 ⇒ numerator is exactly 0 ⇒ score 0.0
            / (
                F.col("__qnorm")
                * F.sqrt(F.greatest(F.col("approx_n2"), F.lit(1.0)))
            )
        ).alias("approx_sim"),
    )


# ---------------------------------------------------------------------------
# incremental IVF index maintenance (daily upsert + drift monitoring)
# ---------------------------------------------------------------------------
#
# A 100 TB vector index is not rebuilt per batch: the quantizer is
# frozen, each day's new vectors are assigned against it in O(batch),
# and the inverted index grows by union — re-encoding the standing
# corpus would be O(corpus) per day for no accuracy gain (assignment is
# per-row deterministic given the centroids). What CAN silently rot is
# the quantizer itself: new data drifting away from the training
# distribution lands far from every centroid (falling cell_sim) or
# piles into few cells (hot cells — probe cost skew). The drift report
# is the retrain trigger a maintenance DAG would alert on.


def ivf_upsert(
    index: DataFrame,
    batch: DataFrame,
    cents: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Extend a standing IVF inverted index with a new batch: assign
    ONLY the batch against the frozen quantizer (narrow broadcast
    argmin — no shuffle of the standing index) and union. A true
    UPSERT (ADVICE r5): batch ids already present in the standing
    index are dropped first via a left-anti join on ``id_col`` — a
    replayed ingest (at-least-once delivery is the 100 TB norm) must
    not duplicate candidates and skew top-k. Duplicate ids WITHIN the
    batch collapse to one row too (review r6): at-least-once delivery
    duplicates inside a batch as readily as across batches. The anti join probes the
    standing index on its id key only (two-column scan); the batch is
    day-sized, so with the standing side large this is the standard
    big-probe/small-build shape AQE handles. Because assignment is
    per-row deterministic given ``cents``,
    ``ivf_upsert(assign(A), B) == assign(A ∪ B)`` exactly for any
    batch whose novel ids are B ∖ A — the incremental index can never
    diverge from a full rebuild (property-tested, including replays).
    """
    fresh = batch.dropDuplicates([id_col]).join(
        index.select(F.col(id_col)), on=id_col, how="left_anti"
    )
    return index.unionByName(ivf_assign(fresh, cents, vec_col, id_col))


def ivf_drift_report(
    batch_index: DataFrame, min_mean_sim: float = 0.0
) -> DataFrame:
    """(cell_id, n_new, mean_cell_sim, low_affinity): per-cell intake
    stats over a newly-assigned batch — the quantizer-retrain signal.
    ``mean_cell_sim`` is exact (cell_sim values are deterministic
    doubles; the mean is SUM/COUNT with the sum over values identical
    in any order at these magnitudes only after a stable reduce, so it
    is computed via DECIMAL(38,18) — the engine's cross-run float
    discipline); ``low_affinity`` flags cells whose new members sit
    below ``min_mean_sim``. One aggregation on the cell key; cells ≪
    batch, so the report is quantizer-sized."""
    return (
        batch_index.groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            (
                F.sum(F.col("cell_sim").cast("decimal(38,18)"))
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("mean_cell_sim"),
        )
        .withColumn(
            "low_affinity", F.col("mean_cell_sim") < F.lit(min_mean_sim)
        )
        .orderBy("cell_id")
    )


# ---------------------------------------------------------------------------
# k-center greedy coreset (Gonzalez 1985 / Sener & Savarese 2018)
# ---------------------------------------------------------------------------


def kcenter_greedy(
    vecs: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Greedy k-center coreset selection over integer-quantized
    vectors: seed = the minimum id, then k-1 rounds each picking the
    point with the MAXIMUM minimum squared-L2 distance to the chosen
    set (ties → minimum id) — the classical 2-approximation to the
    k-center cover, the coreset rule active-learning data selection
    uses (Sener & Savarese, ICLR 2018).

    Returns (round 1..k, id, min_dist_sq) where min_dist_sq is the
    selection-time coverage radius (0 for the seed) — every value a
    BIGINT, so gates hash-pin the whole trajectory.

    Scale shape: the corpus is checkpointed ONCE and scanned once per
    round with the (≤k-row) selected set riding a broadcast; the
    per-round argmax is a TakeOrdered(1). Driver state is k rows.
    Already-selected points self-exclude (their min distance is 0),
    so no anti-join is needed — the oracle mirrors the same rule.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = vecs.sparkSession
    corpus = vecs.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).localCheckpoint(eager=False)
    seed = corpus.orderBy("__id").limit(1).collect()[0]
    picks = [(1, seed["__id"], 0, seed["__v"])]
    dist = (
        "aggregate(zip_with(__v, __cv, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, t) -> acc + t)"
    )
    for rnd in range(2, k + 1):
        sel = spark.createDataFrame(
            [(p[3],) for p in picks],
            schema=corpus.select(F.col("__v").alias("__cv")).schema,
        )
        best = (
            corpus.crossJoin(F.broadcast(sel))
            .select("__id", "__v", F.expr(dist).alias("__d"))
            .groupBy("__id")
            .agg(
                F.min("__d").alias("__mind"),
                F.first("__v").alias("__v"),
            )
            .orderBy(F.desc("__mind"), "__id")
            .limit(1)
            .collect()[0]
        )
        picks.append((rnd, best["__id"], best["__mind"], best["__v"]))
    return spark.createDataFrame(
        [(r, i, d) for r, i, d, _ in picks],
        "round int, " + f"{id_col} long, min_dist_sq long",
    )
