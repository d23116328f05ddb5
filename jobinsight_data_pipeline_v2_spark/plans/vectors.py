"""Embedding similarity operators over ``embeddings`` (+ multimodal plumbing).

Net-new capability (SURVEY §7.2 phase 6): approximate-nearest-neighbor
search and embedding-cosine near-dup over an ``array<float>`` column,
plus the binary-column plumbing for multimodal data.

Float determinism: both engines must produce bit-identical similarity
values for the driver's value-hash. Summing floats is order-dependent,
so we quantize: each component is rounded to an integer at 1e6 scale;
dot products and norms are then sums of integers whose magnitudes stay
far below 2^53 (64 dims × (1e6)² ≈ 6.4e13), i.e. exact in either
integer or double accumulation, in any order. The final cosine is a
single double division of identical operands → identical bits.

Scale design: top-k against a query vector is a narrow map + global
TakeOrdered (no shuffle of the corpus). All-pairs cosine is quadratic
by definition — it is the documented small-corpus baseline; the scale
path (LSH bucketing, operators/similarity.py) makes candidate
generation linear and is property-tested against this baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import collect_array_by_pos
from ..tables import load_table, spread
from . import presentation_sort, register

_Q = 1_000_000  # quantization scale

# Spark-side quantized int vector
_QVEC = f"transform(embedding, x -> cast(round(cast(x as double) * {_Q}.0) as bigint))"
# DuckDB-side
_SQL_QVEC = f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_Q}.0) AS BIGINT))"


def _dot(a: str, b: str) -> F.Column:
    """Exact integer dot product via zip_with + aggregate (JVM-side).

    MEASURED KEEP (r12 opt round, guide §1): unrolling this into a
    flat 64-term ``element_at`` codegen sum (the PQ-ADC device) LOST
    a matched-session A/B on the semantic_dedup edge join — 3.7 s
    fold vs 5.4 s unrolled at sf0.1 — the 64-term chain inside a join
    condition lands past the JIT's huge-method limits, so the
    "codegen" runs as interpreted bytecode (the SRP 2048-term lesson
    already applies at 64 terms in this position). The fold's
    per-element interpreted lambda is the cheaper evaluation here."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    )


def _sql_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


_QUERY_VEC_ID = 0
_TOP_K = 10

_E_QVEC = _SQL_QVEC.replace("embedding", "e.embedding")


@register(
    "cosine_topk",
    f"""
    WITH q AS (
        SELECT {_SQL_QVEC} AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
    ),
    scored AS (
        SELECT e.vec_id, e.label,
               CAST({_sql_dot(_E_QVEC, 'q.qv')} AS DOUBLE)
                   / (sqrt(CAST({_sql_dot(_E_QVEC, _E_QVEC)} AS DOUBLE))
                      * sqrt(CAST({_sql_dot('q.qv', 'q.qv')} AS DOUBLE))) AS cosine_sim
        FROM embeddings e, q
        WHERE e.vec_id != {_QUERY_VEC_ID}
    )
    SELECT vec_id, label, cosine_sim
    FROM scored
    ORDER BY cosine_sim DESC, vec_id
    LIMIT {_TOP_K}
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{_TOP_K} against one query vector.

    The query vector rides along as a broadcast cross join (never
    collected to a Python literal); scoring is a narrow zip_with fold
    inside codegen; ORDER BY + LIMIT becomes TakeOrderedAndProject —
    the corpus is scanned once and never shuffled, which is exactly the
    shape you want per-query at 100 TB (then batched for many queries
    via the same join).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qv = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.expr(_QVEC).alias("qv"))
    )
    corpus = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).withColumn(
        "ev", F.expr(_QVEC)
    )
    scored = corpus.crossJoin(F.broadcast(qv)).select(
        "vec_id",
        "label",
        (
            _dot("ev", "qv").cast("double")
            / (
                F.sqrt(_dot("ev", "ev").cast("double"))
                * F.sqrt(_dot("qv", "qv").cast("double"))
            )
        ).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), "vec_id").limit(_TOP_K)


_NEAR_DUP_MIN = 0.95


@register(
    "embedding_near_dups",
    f"""
    WITH qe AS (
        SELECT vec_id, label, {_SQL_QVEC} AS qv,
               sqrt(CAST({_sql_dot(_SQL_QVEC, _SQL_QVEC)} AS DOUBLE)) AS norm
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.label  AS label_a, b.label AS label_b,
           CAST({_sql_dot('a.qv', 'b.qv')} AS DOUBLE) / (a.norm * b.norm) AS cosine_sim
    FROM qe a JOIN qe b ON a.vec_id < b.vec_id
    WHERE CAST({_sql_dot('a.qv', 'b.qv')} AS DOUBLE) / (a.norm * b.norm)
              >= {_NEAR_DUP_MIN}
    ORDER BY vec_a, vec_b
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ {_NEAR_DUP_MIN}).

    The exact quadratic baseline for embedding dedup: norms are
    precomputed once per vector (narrow), then an inequality self-join
    scores each ordered pair. operators/similarity.py provides the
    LSH-bucketed variant whose candidate set is validated against this
    output in tests.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select(
        "vec_id",
        "label",
        F.expr(_QVEC).alias("qv"),
        F.sqrt(_dot(_QVEC, _QVEC).cast("double")).alias("norm"),
    )
    a = qe.alias("a")
    b = qe.alias("b")
    sim = _dot("a.qv", "b.qv").cast("double") / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= _NEAR_DUP_MIN)
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# centroid per label — the IVF coarse-quantizer build step
# ---------------------------------------------------------------------------


def _component_sums(vecs: DataFrame, vec_col: str) -> DataFrame:
    """(label, pos, s, n): per-(label, dimension) bigint component sum
    + member count, in ONE aggregation.

    posexplode + groupBy(label, pos), NOT collect_list + zip_with
    fold: the fold materializes every member vector of a group in one
    aggregation buffer — O(members x dim) memory, an executor-OOM
    shape once a hot label holds an unbounded slice of the corpus
    (ADVICE r3). Exploding first looks like a rows x dims shuffle but
    is not: partial (map-side) aggregation collapses each task's
    contribution to its distinct (label, pos) keys before the
    exchange, so the shuffle carries ~labels x dims rows per map
    partition and every buffer is O(1). The member count rides the
    same aggregation (count per (label, pos) == member count), so
    there is no second pass over the vectors.
    """
    return (
        vecs.select("label", F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "label_centroids",
    f"""
    WITH vecs AS (
        SELECT label, {_SQL_QVEC} AS qv FROM embeddings
    ),
    comps AS (
        SELECT label, CAST(i AS INTEGER) AS dim_idx, qv[i] AS component
        FROM vecs, UNNEST(generate_series(1, len(qv))) AS t(i)
    )
    SELECT label, dim_idx,
           CAST(CAST(SUM(component) AS BIGINT) AS DOUBLE) / COUNT(*) AS centroid_component,
           COUNT(*) AS n_vectors
    FROM comps
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in unpivoted (label, dim) form — the k-means
    "update centroids" step of an IVF index build, done as ONE
    posexplode + groupBy(label, pos) aggregation (map-side partials
    keep buffers O(1); see _component_sums). Components are quantized
    ints so sums are exact; the mean is one double division."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    sums = _component_sums(emb.select("label", F.expr(_QVEC).alias("qv")), "qv")
    return sums.select(
        "label",
        (F.col("pos") + 1).alias("dim_idx"),
        (F.col("s").cast("double") / F.col("n")).alias("centroid_component"),
        F.col("n").alias("n_vectors"),
    ).orderBy("label", "dim_idx")


# ---------------------------------------------------------------------------
# IVF end-to-end search, gated at nprobe = all cells (degrades to the
# exact brute force, so the oracle is the plain top-k SQL — the
# approximate nprobe<cells path is recall-tested in tests against this)
# ---------------------------------------------------------------------------

_IVF_QUERY_VEC = 1
_IVF_K = 10


# exact top-k for query vector _IVF_QUERY_VEC — the shared oracle for
# every IVF configuration gated at nprobe ≥ n_cells (where IVF search
# degrades to exact brute force regardless of how cells were built)
_IVF_EXACT_SQL = f"""
    WITH q AS (
        SELECT {_SQL_QVEC} AS qv FROM embeddings WHERE vec_id = {_IVF_QUERY_VEC}
    ),
    scored AS (
        SELECT e.vec_id, e.label,
               CAST({_sql_dot(_E_QVEC, 'q.qv')} AS DOUBLE)
                   / (sqrt(CAST({_sql_dot(_E_QVEC, _E_QVEC)} AS DOUBLE))
                      * sqrt(CAST({_sql_dot('q.qv', 'q.qv')} AS DOUBLE))) AS cosine_sim
        FROM embeddings e, q
        WHERE e.vec_id != {_IVF_QUERY_VEC}
    )
    SELECT vec_id, label, cosine_sim,
           CAST(row_number() OVER (ORDER BY cosine_sim DESC, vec_id)
                AS INTEGER) AS rank
    FROM scored
    ORDER BY cosine_sim DESC, vec_id
    LIMIT {_IVF_K}
    """


@register("ivf_topk", _IVF_EXACT_SQL)
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search end-to-end (operators/similarity.ivf_topk): per-label
    centroids as the coarse quantizer, probe list per query, exact
    scoring of probed cells only, top-{_IVF_K}.

    Gated with nprobe ≥ n_cells, where IVF degrades to exact brute
    force — the oracle is therefore the plain exact top-k SQL and pins
    the whole assign→probe→score→rank pipeline bit-exactly. The
    approximate configuration (nprobe < cells) is recall-tested
    against cosine_topk in tests/test_operators.py.
    """
    from ..operators.similarity import ivf_topk as ivf_search

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", "label", F.expr(_QVEC).alias("embedding"))
    cents = (
        _component_sums(qe.select("label", "embedding"), "embedding")
        # re-assemble the per-dim means into a centroid array (shared
        # dim-bounded idiom — operators/similarity.collect_array_by_pos)
        .groupBy("label")
        .agg(
            collect_array_by_pos(
                F.col("pos"), F.col("s").cast("double") / F.col("n")
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell_id"), "centroid")
        # consumed by both ivf_assign and ivf_probe_cells — materialize
        # the single-shuffle build once (cells × dims is tiny)
        .localCheckpoint(eager=False)
    )
    corpus = qe.filter(F.col("vec_id") != _IVF_QUERY_VEC)
    query = qe.filter(F.col("vec_id") == _IVF_QUERY_VEC).select(
        F.lit(_IVF_QUERY_VEC).alias("query_id"), "embedding"
    )
    out = ivf_search(
        corpus, cents, query, k=_IVF_K, nprobe=1_000_000  # ≥ n_cells → exact
    )
    labels = emb.select("vec_id", "label")
    return (
        labels.join(F.broadcast(out), "vec_id")
        .select("vec_id", "label", "cosine_sim", "rank")
        .orderBy("rank")
    )


@register("ivf_topk_learned", _IVF_EXACT_SQL)
def ivf_topk_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with a LEARNED coarse quantizer: cells come from
    operators/similarity.kmeans_centroids (Lloyd's iterations with
    deterministic hash seeds — no labels needed), then the same
    assign→probe→score→rank pipeline as ivf_topk.

    Gated at nprobe ≥ n_cells, where search degrades to exact brute
    force whatever the centroids are — so the oracle is the shared
    exact top-k SQL and pins the learned-quantizer pipeline end to
    end (the centroids only decide which cells exist, and probing all
    of them scores every corpus vector exactly). The recall/cost dial
    at nprobe < n_cells is property-tested against the exact top-k in
    tests/test_operators.py.
    """
    from ..operators.similarity import ivf_topk as ivf_search
    from ..operators.similarity import kmeans_centroids

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", "label", F.expr(_QVEC).alias("embedding"))
    corpus = qe.filter(F.col("vec_id") != _IVF_QUERY_VEC).select(
        "vec_id", "embedding"
    )
    # train the quantizer on a deterministic 1/4 hash-sample — the
    # standard IVF practice (cells need only be representative, and
    # exactness at nprobe=all never depends on them); Lloyd's cost
    # drops 4x and stays a fixed fraction at any corpus size
    train = corpus.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    # two Lloyd rounds: nprobe=all exactness is centroid-independent,
    # so the gate pays the minimum training that still iterates the
    # seed assignment (convergence behavior is property-tested at
    # higher iteration counts in tests/test_operators.py)
    # materialize the trained centroids once: ivf_assign and
    # ivf_probe_cells each build their own broadcast index, and
    # without the boundary the second broadcast re-derives the
    # k-means tail (measured 4.1s → 3.0s for the gate at sf0.1)
    cents = (
        kmeans_centroids(train, k=8, max_iters=2)
        .select("cell_id", "centroid")
        .localCheckpoint(eager=False)
    )
    query = qe.filter(F.col("vec_id") == _IVF_QUERY_VEC).select(
        F.lit(_IVF_QUERY_VEC).alias("query_id"), "embedding"
    )
    out = ivf_search(
        corpus, cents, query, k=_IVF_K, nprobe=1_000_000  # ≥ n_cells → exact
    )
    labels = emb.select("vec_id", "label")
    return (
        labels.join(F.broadcast(out), "vec_id")
        .select("vec_id", "label", "cosine_sim", "rank")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# multimodal binary-column plumbing (schema + hashing over bytes)
# ---------------------------------------------------------------------------


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text)               AS content_sha256,
           source                     AS media_source
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: payload as ``binary`` + typed
    metadata, content-addressed by sha256 (SURVEY north-star:
    multimodal columns). Here the documents' UTF-8 bytes stand in for
    image/audio payloads; decode/feature-extraction runs as Arrow-
    batched mapInPandas in operators/multimodal.py (stubbed decode,
    real plumbing)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha256"),
        F.col("source").alias("media_source"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# real PNG decode at the Arrow edge (operators/png.py stdlib codec)
# ---------------------------------------------------------------------------
#
# The decode gate's device is the jsonl_roundtrip ordering-independent
# oracle: images are synthesized from doc_id by a closed-form gradient
# (pixel(x, y, c) = base_c + x + 2y with base_c < 200, x < 16, 2y < 27
# — never wraps mod 256), the encoder cycles the filter type per row
# (y % 5 → every scanline filter appears in every image taller than 4
# rows), and the DuckDB oracle recomputes the channel sums from the
# generation constants alone — it never sees a PNG byte. Any defect in
# chunk framing, zlib streaming, or any of the five filter reversals
# changes a decoded sum and fails the hash. Scale shape: one narrow
# mapInPandas over doc_id (Arrow both ways, no shuffle); parallelism =
# input partitions, exactly how a 100 TB thumbnail decode would run.

_PNG_W_MOD, _PNG_H_MOD, _PNG_BASE_MOD = 13, 11, 200


def _png_stats_batches(it):
    """doc_id batches → synthesize gradient PNG → REAL decode → stats."""
    import pandas as pd

    from ..operators.png import decode_png, encode_png

    for pdf in it:
        out = {k: [] for k in
               ("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 4 + d % _PNG_W_MOD, 4 + d % _PNG_H_MOD
            base = [(d * (c + 1)) % _PNG_BASE_MOD for c in range(3)]
            px = bytes(
                base[c] + x + 2 * y
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            payload = encode_png(w, h, px, color_type=2,
                                 filters=lambda y: y % 5)
            dw, dh, ch, decoded = decode_png(payload)
            sums = [0, 0, 0]
            for i, b in enumerate(decoded):
                sums[i % 3] += b
            out["doc_id"].append(d)
            out["width"].append(dw)
            out["height"].append(dh)
            out["r_sum"].append(sums[0])
            out["g_sum"].append(sums[1])
            out["b_sum"].append(sums[2])
        yield pd.DataFrame(out)


def _png_sum_sql(c: int) -> str:
    """Closed-form channel sum of the gradient image, pure integers:
    Σ_{{x,y}} (base_c + x + 2y) = W·H·base + H·W(W−1)/2 + W·H(H−1)."""
    base = f"((doc_id * {c + 1}) % {_PNG_BASE_MOD})"
    return (
        f"CAST(w * h * {base} + h * (w * (w - 1) // 2) + w * h * (h - 1) "
        f"AS BIGINT)"
    )


@register(
    "png_decode_stats",
    f"""
    WITH dims AS (
        SELECT doc_id,
               4 + doc_id % {_PNG_W_MOD} AS w,
               4 + doc_id % {_PNG_H_MOD} AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           {_png_sum_sql(0)} AS r_sum,
           {_png_sum_sql(1)} AS g_sum,
           {_png_sum_sql(2)} AS b_sum
    FROM dims
    ORDER BY doc_id
    """,
)
def png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: per document a deterministic
    gradient PNG (filter type cycling 0-4 across scanlines) is
    synthesized and decoded by the stdlib codec (operators/png.py)
    inside one Arrow-batched mapInPandas; the output pins decoded
    dimensions + per-channel pixel sums against the oracle's
    closed-form recomputation (which never decodes — any codec defect
    breaks the hash)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(n, LongType(), False)
         for n in ("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")]
    )
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    # boundary below the presentation sort: the range sampling pass
    # otherwise decodes the whole corpus TWICE (r12 opt — see
    # plans.presentation_sort)
    return presentation_sort(docs.mapInPandas(_png_stats_batches, schema), "doc_id")


# ---------------------------------------------------------------------------
# real WAV/PCM decode at the Arrow edge (operators/wav.py — the PNG
# gate's audio sibling; same ordering-independent closed-form oracle)
# ---------------------------------------------------------------------------

_WAV_CYCLE = 16  # sample(ch, i) = base_ch + (i % 16): sums close-form


def _wav_stats_batches(it):
    """doc_id batches → synthesize PCM WAV → REAL decode → stats."""
    import pandas as pd

    from ..operators.wav import decode_wav, encode_wav

    for pdf in it:
        out = {k: [] for k in
               ("doc_id", "rate", "channels", "n_frames", "c0_sum",
                "c1_sum")}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            rate = 8000 + (d % 5) * 1000
            n_ch = 1 + d % 2
            n = 64 + d % 129
            chans = []
            for c in range(n_ch):
                base = (d * (c + 3)) % 100 - 50
                chans.append([base + (i % _WAV_CYCLE) for i in range(n)])
            got_rate, got_ch, got_n, got_chans = decode_wav(
                encode_wav(rate, chans)
            )
            sums = [sum(c) for c in got_chans]
            out["doc_id"].append(d)
            out["rate"].append(got_rate)
            out["channels"].append(got_ch)
            out["n_frames"].append(got_n)
            out["c0_sum"].append(sums[0])
            out["c1_sum"].append(sums[1] if got_ch == 2 else None)
        yield pd.DataFrame(out)


def _wav_sum_sql(c: int) -> str:
    """Closed-form channel sum: n·base + (n // 16)·120 + r(r−1)/2 with
    r = n % 16 — pure integer arithmetic the oracle evaluates without
    ever seeing a WAV byte."""
    base = f"((doc_id * {c + 3}) % 100 - 50)"
    k = _WAV_CYCLE
    full = k * (k - 1) // 2  # sum of one 0..15 cycle
    return (
        f"n * {base} + (n // {k}) * {full} "
        f"+ (n % {k}) * ((n % {k}) - 1) // 2"
    )


@register(
    "wav_decode_stats",
    f"""
    WITH dims AS (
        SELECT doc_id,
               8000 + (doc_id % 5) * 1000 AS rate,
               1 + doc_id % 2 AS channels,
               64 + doc_id % 129 AS n
        FROM documents
    )
    SELECT doc_id,
           CAST(rate AS BIGINT) AS rate,
           CAST(channels AS BIGINT) AS channels,
           CAST(n AS BIGINT) AS n_frames,
           CAST({_wav_sum_sql(0)} AS BIGINT) AS c0_sum,
           CAST(CASE WHEN channels = 2 THEN {_wav_sum_sql(1)} END
                AS BIGINT) AS c1_sum
    FROM dims
    ORDER BY doc_id
    """,
)
def wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: per document a deterministic PCM
    WAV (mono/stereo alternating, varying rate and frame count) is
    synthesized and decoded by the stdlib RIFF codec (operators/
    wav.py) inside one Arrow-batched mapInPandas; the output pins
    decoded rate/channels/frame-count + per-channel sample sums
    against the oracle's closed-form recomputation (which never sees
    a WAV byte — any framing, alignment, or interleave defect breaks
    the hash)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(n, LongType(), False)
         for n in ("doc_id", "rate", "channels", "n_frames", "c0_sum")]
        + [StructField("c1_sum", LongType(), True)]  # NULL when mono
    )
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    # boundary below the presentation sort: the range sampling pass
    # otherwise decodes the whole corpus TWICE (r12 opt — see
    # plans.presentation_sort)
    return presentation_sort(docs.mapInPandas(_wav_stats_batches, schema), "doc_id")


# ---------------------------------------------------------------------------
# real Y4M video demux at the Arrow edge (operators/y4m.py — completes
# the media triple; same closed-form oracle device as PNG/WAV)
# ---------------------------------------------------------------------------

_Y4M_EVERY_N = 2  # sample every 2nd frame (the sample_frames dial)


def _y4m_stats_batches(it):
    """doc_id batches → synthesize mono Y4M → REAL demux → sample
    every {_Y4M_EVERY_N}th frame → luma stats."""
    import pandas as pd

    from ..operators.y4m import demux_y4m, encode_y4m, luma_sum

    for pdf in it:
        out = {k: [] for k in
               ("doc_id", "width", "height", "n_frames", "n_sampled",
                "luma_total")}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = 8 + (d % 5) * 2, 8 + (d % 3) * 2
            n = 3 + d % 6
            base = d % 150  # + 7k <= 198: constant-luma frames, no wrap
            frames = [bytes([base + 7 * k]) * (w * h) for k in range(n)]
            gw, gh, _fps, _cs, got = demux_y4m(
                encode_y4m(w, h, frames, colorspace="mono")
            )
            sampled = got[::_Y4M_EVERY_N]
            out["doc_id"].append(d)
            out["width"].append(gw)
            out["height"].append(gh)
            out["n_frames"].append(len(got))
            out["n_sampled"].append(len(sampled))
            out["luma_total"].append(
                sum(luma_sum(f, gw, gh) for f in sampled)
            )
        yield pd.DataFrame(out)


@register(
    "y4m_frame_stats",
    f"""
    WITH dims AS (
        SELECT doc_id,
               8 + (doc_id % 5) * 2 AS w,
               8 + (doc_id % 3) * 2 AS h,
               3 + doc_id % 6 AS n,
               doc_id % 150 AS base
        FROM documents
    ),
    s AS (SELECT *, (n + 1) // 2 AS m FROM dims)
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(n AS BIGINT) AS n_frames,
           CAST(m AS BIGINT) AS n_sampled,
           CAST(w * h * (m * base + 7 * m * (m - 1)) AS BIGINT)
               AS luma_total
    FROM s
    ORDER BY doc_id
    """,
)
def y4m_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video demux end-to-end: per document a deterministic mono
    YUV4MPEG2 stream (3-8 constant-luma frames) is synthesized and
    demuxed by the stdlib container parser (operators/y4m.py) inside
    one Arrow-batched mapInPandas, every {_Y4M_EVERY_N}nd frame
    sampled (the sample_frames dial), luma-plane sums pinned against
    the oracle's closed-form recomputation — which never sees a Y4M
    byte, so any header-parse, frame-boundary, or plane-size defect
    breaks the hash. Sampled frames: luma of frame k is base + 7k, so
    Σ over k = 0,2,…,2(m−1) is m·base + 14·m(m−1)/2 per pixel."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(n, LongType(), False)
         for n in ("doc_id", "width", "height", "n_frames", "n_sampled",
                   "luma_total")]
    )
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    # boundary below the presentation sort: the range sampling pass
    # otherwise decodes the whole corpus TWICE (r12 opt — see
    # plans.presentation_sort)
    return presentation_sort(docs.mapInPandas(_y4m_stats_batches, schema), "doc_id")


# ---------------------------------------------------------------------------
# batched exact top-k: many query vectors in one corpus scan (the
# serving shape of operators/similarity.cosine_topk)
# ---------------------------------------------------------------------------

_BATCH_QUERY_MOD = 401  # query batch: vec_id % 401 = 0 (~5 queries at sf0.1)
_BATCH_K = 5


@register(
    "cosine_topk_batch",
    f"""
    WITH qe AS (
        SELECT vec_id, {_SQL_QVEC} AS qv,
               sqrt(CAST({_sql_dot(_SQL_QVEC, _SQL_QVEC)} AS DOUBLE)) AS norm
        FROM embeddings
    ),
    queries AS (
        SELECT vec_id AS query_id, qv AS q, norm AS qnorm FROM qe
        WHERE vec_id % {_BATCH_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, c.vec_id,
               CAST({_sql_dot('c.qv', 'q.q')} AS DOUBLE) / (c.norm * q.qnorm)
                   AS cosine_sim
        FROM qe c, queries q
        WHERE c.vec_id != q.query_id
    )
    SELECT query_id, vec_id, cosine_sim,
           CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {_BATCH_K}
    ORDER BY query_id, rank
    """,
)
def cosine_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{_BATCH_K} for a BATCH of query vectors in one corpus
    scan — the shape ANN serving actually runs (queries arrive in
    batches, the corpus is read once per batch, never per query).

    The query batch broadcasts (queries ≪ corpus); scoring is a
    narrow fold per (corpus row, query); per-query top-k is a window
    over query_id partitions — parallelism = batch size at scale.
    Pins operators/similarity.cosine_topk (the property-tested
    operator) against an exact oracle, including its tie rule
    (cosine desc, vec_id asc).
    """
    from pyspark.sql.window import Window

    from ..operators.similarity import cosine_topk as batch_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", F.expr(_QVEC).alias("embedding"))
    queries = qe.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = batch_topk(
        qe.alias("corpus"), queries, k=_BATCH_K + 1  # self rides along; drop below
    )
    # the query vector itself scores cosine 1.0 in its own result list;
    # exclude it and re-rank (the oracle excludes it in the WHERE)
    return (
        out.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine_sim"), "vec_id"
                )
            )
            .cast("long"),
        )
        .filter(F.col("rank") <= _BATCH_K)
        .select("query_id", "vec_id", "cosine_sim", "rank")
        .orderBy("query_id", "rank")
    )


@register(
    "cosine_topk_filtered",
    f"""
    WITH qe AS (
        SELECT vec_id, label, {_SQL_QVEC} AS qv,
               sqrt(CAST({_sql_dot(_SQL_QVEC, _SQL_QVEC)} AS DOUBLE)) AS norm
        FROM embeddings
    ),
    queries AS (
        SELECT vec_id AS query_id, label, qv AS q, norm AS qnorm FROM qe
        WHERE vec_id % {_BATCH_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, q.label, c.vec_id,
               CAST({_sql_dot('c.qv', 'q.q')} AS DOUBLE) / (c.norm * q.qnorm)
                   AS cosine_sim
        FROM qe c JOIN queries q ON c.label = q.label
        WHERE c.vec_id != q.query_id
    )
    SELECT query_id, label, vec_id, cosine_sim,
           CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {_BATCH_K}
    ORDER BY query_id, rank
    """,
)
def cosine_topk_filtered_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: each query retrieves its exact top-{_BATCH_K}
    among ONLY the corpus vectors sharing its ``label`` — the filtered
    ANN serving shape ("within my tenant/language/shard"). The cross
    join of the unfiltered batch gate becomes an EQUI-join on the
    metadata key, so at scale the predicate prunes candidates BEFORE
    any distance arithmetic — the plan difference that separates
    post-filtering (score everything, discard most) from true
    filtered search.

    Pins operators/similarity.cosine_topk_filtered including its tie
    rule and the self-exclusion path, against the brute-force oracle
    restricted by the same predicate.
    """
    from pyspark.sql.window import Window

    from ..operators.similarity import cosine_topk_filtered

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", "label", F.expr(_QVEC).alias("embedding"))
    queries = qe.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    out = cosine_topk_filtered(
        qe, queries, k=_BATCH_K + 1, match_cols=("label",)
    )
    # self-match rides at cosine 1.0; drop and re-rank (oracle's WHERE)
    return (
        out.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine_sim"), "vec_id"
                )
            )
            .cast("long"),
        )
        .filter(F.col("rank") <= _BATCH_K)
        .select("query_id", "label", "vec_id", "cosine_sim", "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# product quantization: two-stage ADC search gated at the exactness
# configuration (refine ≥ corpus), recall dial property-tested
# ---------------------------------------------------------------------------

_PQ_K = 5


@register(
    "pq_topk_rerank",
    f"""
    WITH qe AS (
        SELECT vec_id, {_SQL_QVEC} AS qv,
               sqrt(CAST({_sql_dot(_SQL_QVEC, _SQL_QVEC)} AS DOUBLE)) AS norm
        FROM embeddings
    ),
    queries AS (
        SELECT vec_id AS query_id, qv AS q, norm AS qnorm FROM qe
        WHERE vec_id % {_BATCH_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, c.vec_id,
               CAST({_sql_dot('c.qv', 'q.q')} AS DOUBLE) / (c.norm * q.qnorm)
                   AS cosine_sim
        FROM qe c, queries q
    )
    SELECT query_id, vec_id, cosine_sim,
           CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {_PQ_K}
    ORDER BY query_id, rank
    """,
)
def pq_topk_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization search end-to-end (operators/similarity:
    pq_train → pq_encode → ADC scan → exact re-rank), gated with
    refine ≥ corpus size — where the re-rank stage exact-scores every
    row and the result is brute-force top-{_PQ_K} whatever the learned
    codebooks contain. Same device as the ivf gates' nprobe=all: the
    oracle (plain exact batch SQL, self included) pins the whole
    train/encode/LUT/scan/re-rank pipeline bit-exactly, and the real
    memory/recall dial (refine ≪ corpus, vectors untouched until the
    refine join) is property-tested in tests/test_operators.py.

    Codebooks train on a deterministic 1/4 hash-sample (the
    ivf_topk_learned discipline) with a small config — exactness at
    refine=all never depends on codebook quality.
    """
    from ..operators.similarity import pq_topk as pq_search
    from ..operators.similarity import pq_train

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", F.expr(_QVEC).alias("embedding"))
    train = qe.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    # one Lloyd round: refine=all exactness is codebook-independent,
    # so the gate pays the minimum training that still exercises the
    # full seed→assign→update loop (multi-round configs are covered by
    # the recall property tests)
    cb = pq_train(train, n_sub=4, codes=8, max_iters=1)
    queries = qe.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_search(
        qe, cb, queries, k=_PQ_K, refine=1_000_000_000  # ≥ corpus → exact
    )
    return (
        out.withColumn("rank", F.col("rank").cast("long"))
        .select("query_id", "vec_id", "cosine_sim", "rank")
        .orderBy("query_id", "rank")
    )


# the APPROXIMATE serving configuration, oracle-gated (VERDICT r4 #1):
# probe 2 of 8 cells, ADC-refine 20·k candidates. On this corpus —
# near-random 64-dim vectors (same-label mean cosine ≈ 0.03) — overall
# recall is information-theoretically capped at ~nprobe/n_cells: which
# cell a true neighbor landed in is noise, so no PQ setting can beat
# cell recall, and that dial is property-tested, not hash-gated. What
# the gate CAN pin exactly is the half PQ owns: of the members the
# probe DID reach, does the ADC scan's top-`refine` retain the exact
# top-k? measured agreement at (n_sub=8, codes=16, refine=20k) is
# ≥ 4/5 per query at sf0.001/0.01/0.1 — the in-plan flag pins that.
_PROBED_NSUB = 8
_PROBED_CODES = 16
_PROBED_NPROBE = 2
_PROBED_REFINE = 20 * _PQ_K
_PROBED_MIN_HITS = 4  # ADC agreement ≥ 4/5 vs probed-exact top-k


def _probed_refine(n_corpus: int) -> int:
    """Serving refine budget: a FIXED refine is a scale bug — the
    probe reaches ~nprobe/n_cells of the corpus, so at 10x the data a
    constant top-100 ADC cut retains proportionally less of the
    probed-exact top-k and the agreement flag degrades (found by the
    r12 sf1 sweep: ≥4/5 held at corpus ≤ 2k, failed at 20k). Scale
    refine at 5% of the corpus with the calibrated floor — identical
    to the old constant at sf ≤ 0.1, corpus-proportional beyond."""
    return max(_PROBED_REFINE, n_corpus // 20)


@register(
    "ivfpq_topk_probed",
    f"""
    WITH qe AS (
        SELECT vec_id, {_SQL_QVEC} AS qv,
               sqrt(CAST({_sql_dot(_SQL_QVEC, _SQL_QVEC)} AS DOUBLE)) AS norm
        FROM embeddings
    ),
    queries AS (
        SELECT vec_id AS query_id, qv AS q, norm AS qnorm FROM qe
        WHERE vec_id % {_BATCH_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, c.vec_id,
               CAST({_sql_dot('c.qv', 'q.q')} AS DOUBLE) / (c.norm * q.qnorm)
                   AS cosine_sim
        FROM qe c, queries q
    )
    SELECT query_id, vec_id, cosine_sim,
           CAST(rn AS BIGINT) AS rank,
           1 AS adc_within_bound
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {_PQ_K}
    ORDER BY query_id, rank
    """,
)
def ivfpq_topk_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ at the APPROXIMATE serving configuration — nprobe =
    {_PROBED_NPROBE} of 8 cells, refine = {_PROBED_REFINE} ≪ corpus —
    oracle-gated with the approx-percentile device: the emitted VALUES
    are the exact brute-force top-{_PQ_K} (oracle-computable), and the
    hash additionally pins ``adc_within_bound`` — an in-plan quality
    flag that compares the approximate result against the exact top-k
    *restricted to the probed cells* and requires agreement on at
    least {_PROBED_MIN_HITS}/{_PQ_K} ids per query.

    Why agreement-over-probed, not raw recall: cell membership of a
    true neighbor is noise on this corpus (near-random vectors), so
    raw recall is capped near nprobe/n_cells for ANY index — that dial
    belongs to nprobe and is recall-property-tested. The ADC scan's
    job is to not lose what the probe reached; that is deterministic,
    engine-checkable, and exactly what this flag hashes. A codebook
    regression (bad training, broken LUT, wrong residual arithmetic)
    drops agreement below the bound and fails the gate even though the
    emitted exact values are still right.
    """
    from pyspark.sql.window import Window

    from ..operators.similarity import (
        _dot as _fdot,
        _pq_dims,
        cosine_topk,
        ivf_assign,
        ivfpq_probes,
        ivfpq_topk as ivfpq_search,
        ivfpq_train,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", F.expr(_QVEC).alias("embedding"))
    train = qe.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    cents, cb = ivfpq_train(
        train,
        n_cells=8,
        n_sub=_PROBED_NSUB,
        codes=_PROBED_CODES,
        kmeans_iters=2,
        pq_iters=1,
    )
    # consumed by the approx search AND the probed-exact baseline —
    # materialize the trained quantizer once (r4 learned-gate lesson)
    cents = cents.localCheckpoint(eager=False)
    dims = _pq_dims(cb)
    queries = qe.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx_ids = ivfpq_search(
        qe, cents, cb, queries,
        k=_PQ_K, nprobe=_PROBED_NPROBE, refine=_probed_refine(qe.count()),
    ).select("query_id", "vec_id")
    # exact top-k over the probed cells' members only: what a perfect
    # ADC stage would return under the same probe budget
    probes = ivfpq_probes(queries, cents, cb, _PROBED_NPROBE, dims).select(
        "query_id", "cell_id", "__qv", "__qnorm"
    )
    members = ivf_assign(qe, cents).join(F.broadcast(probes), "cell_id")
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.col("vec_id")
    )
    probed_exact = (
        members.withColumn(
            "sim",
            _fdot("embedding", "__qv") / (F.col("__norm") * F.col("__qnorm")),
        )
        .withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= _PQ_K)
        .select("query_id", "vec_id")
    )
    hits = (
        probed_exact.join(approx_ids, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__n_hits"))
    )
    exact = cosine_topk(qe, queries, k=_PQ_K)
    return (
        exact.join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            "vec_id",
            "cosine_sim",
            F.col("rank").cast("long").alias("rank"),
            (
                F.coalesce(F.col("__n_hits"), F.lit(0)) >= _PROBED_MIN_HITS
            )
            .cast("int")
            .alias("adc_within_bound"),
        )
        .orderBy("query_id", "rank")
    )


@register(
    "ivfpq_topk_exact",
    f"""
    WITH qe AS (
        SELECT vec_id, {_SQL_QVEC} AS qv,
               sqrt(CAST({_sql_dot(_SQL_QVEC, _SQL_QVEC)} AS DOUBLE)) AS norm
        FROM embeddings
    ),
    queries AS (
        SELECT vec_id AS query_id, qv AS q, norm AS qnorm FROM qe
        WHERE vec_id % {_BATCH_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, c.vec_id,
               CAST({_sql_dot('c.qv', 'q.q')} AS DOUBLE) / (c.norm * q.qnorm)
                   AS cosine_sim
        FROM qe c, queries q
    )
    SELECT query_id, vec_id, cosine_sim,
           CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {_PQ_K}
    ORDER BY query_id, rank
    """,
)
def ivfpq_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end (operators/similarity: kmeans cells →
    residual PQ codebooks → cell probe + residual-ADC scan → exact
    re-rank), gated at nprobe ≥ cells AND refine ≥ corpus — where
    every cell is probed and every member exact-re-ranked, so the
    result is brute-force top-{_PQ_K} whatever the learned index
    contains. The same exact batch oracle as pq_topk_rerank pins the
    whole composition (assignment, residual arithmetic, the ADC
    constant term q·c_cell, LUT lookups, rerank) bit-exactly; the
    recall/cost dials (nprobe < cells, refine ≪ corpus) are
    property-tested in tests/test_operators.py.
    """
    from ..operators.similarity import ivfpq_topk as ivfpq_search
    from ..operators.similarity import ivfpq_train

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", F.expr(_QVEC).alias("embedding"))
    train = qe.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    cents, cb = ivfpq_train(
        train, n_cells=8, n_sub=4, codes=8, kmeans_iters=1, pq_iters=1
    )
    queries = qe.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_search(
        qe, cents, cb, queries,
        k=_PQ_K, nprobe=1_000_000, refine=1_000_000_000,
    )
    return (
        out.withColumn("rank", F.col("rank").cast("long"))
        .select("query_id", "vec_id", "cosine_sim", "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# OPQ rotation readiness (VERDICT r8 ask #4): structured embeddings +
# the measured rotation dispatch (operators/rotation.py)
# ---------------------------------------------------------------------------
#
# The testdata embeddings are iid across dims, where an orthogonal
# rotation provably cannot help PQ (error ratio ≈ 1 — the r6 open-ideas
# note). This gate synthesizes a STRUCTURED table in-plan — a decaying
# variance ramp, component scale 2^(block index), the eigenvalue-
# spectrum shape OPQ exists for — and pins both halves of the dispatch:
#
#   (a) rotation_helps: opq_train_dispatch trains plain AND rotated
#       codebooks and compares exact integer quantization errors
#       (rotated lives at scale² = 8, so the test is
#       err_rot < 8·err_plain); on the ramp the measured ratio is
#       ~0.25 at every SF, so the flag is robustly TRUE and the oracle
#       pins it as a constant. (The property tests pin the other two
#       shapes: iid ≈ no-op, one-outlier-per-block → rotation LOSES
#       and the dispatch must keep plain.)
#   (b) the refine=all ceiling stays bit-exact THROUGH the rotation:
#       the emitted top-5 per query flows corpus→rotate→pq_encode→ADC
#       shortlist (uncut)→integer-dot re-rank in ROTATED space, and
#       dot(R x, R y) = 8·dot(x, y) exactly, so `score = dot_rot div 8`
#       must equal the oracle's PLAIN-space integer MIPS dot, ties and
#       all. Any non-orthogonality, scale slip, or row loss in the
#       rotated pipeline breaks the hash.
#
# Integer headroom: ramp components ≤ round(.35·1e3)·2^7 ≈ 4.5e4,
# rotated ≤ 8× — dots ≤ 64·(3.6e5)² ≈ 8.3e15 < 2^63 (rerank accumulates
# in LONG); per-row quantization error ≤ 3.3e13 (exact in the double
# dot), corpus sums in BIGINT (≤ ~1.7e18 at sf0.1).

_OPQ_QMOD = 1000          # queries: vec_id % _OPQ_QMOD == _OPQ_QSEL
_OPQ_QSEL = 7
_OPQ_TOPK = 5


def _ramp_vec_spark() -> str:
    b = "cast(round(cast(x as double) * 1000.0) as bigint)"
    parts = [
        f"transform(slice(embedding, {blk * 8 + 1}, 8), x -> ({b}) * {1 << blk}L)"
        for blk in range(8)
    ]
    return "concat(" + ", ".join(parts) + ")"


def _ramp_vec_sql() -> str:
    b = "CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)"
    parts = [
        f"list_transform(embedding[{blk * 8 + 1}:{blk * 8 + 8}],"
        f" x -> ({b}) * {1 << blk})"
        for blk in range(8)
    ]
    return " || ".join(parts)


@register(
    "opq_rotation_mips",
    f"""
    WITH s AS (
        SELECT vec_id, {_ramp_vec_sql()} AS sv FROM embeddings
    ),
    q AS (
        SELECT vec_id AS query_id, sv AS qv FROM s
        WHERE vec_id % {_OPQ_QMOD} = {_OPQ_QSEL}
    ),
    scored AS (
        SELECT q.query_id, s.vec_id,
               CAST({_sql_dot('s.sv', 'q.qv')} AS BIGINT) AS score
        FROM s, q
    ),
    ranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id
               ) AS rank
        FROM scored
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, score,
           TRUE AS rotation_helps
    FROM ranked
    WHERE rank <= {_OPQ_TOPK}
    ORDER BY query_id, rank
    """,
)
def opq_rotation_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ rotation dispatch over ramp-structured embeddings: exact
    integer MIPS top-{_OPQ_TOPK} per query served THROUGH the rotated
    PQ pipeline at the refine=all ceiling (scores re-based to plain
    space by the exact ÷8), plus the measured rotation_helps flag
    (rotated quantization error < 8 × plain — the OPQ objective,
    all-integer). See the block comment above for the full device."""
    from ..operators.rotation import (
        hadamard_rotate,
        opq_train_dispatch,
    )
    from ..operators.similarity import (
        _pq_dims,
        pq_adc_scores,
        pq_encode,
        pq_query_luts,
    )
    from pyspark.sql.window import Window

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    base = emb.select(
        "vec_id", F.expr(_ramp_vec_spark()).alias("sv")
    ).localCheckpoint(eager=False)

    disp = opq_train_dispatch(
        base, n_sub=8, codes=16, vec_col="sv", id_col="vec_id"
    )
    cb = disp["cb"].localCheckpoint(eager=False)
    dims = _pq_dims(cb)

    # the serving path runs in the winning space — on this corpus the
    # dispatch picks ROTATED (the flag the oracle pins), so corpus and
    # queries rotate with the dispatch's (block, seed)
    space = (
        hadamard_rotate(base, "sv", None, 64, disp["block"], disp["seed"])
        if disp["rotated"]
        else base
    ).localCheckpoint(eager=False)
    queries = space.filter(
        F.col("vec_id") % _OPQ_QMOD == _OPQ_QSEL
    ).select(F.col("vec_id").alias("query_id"), F.col("sv").alias("qv"))

    coded = pq_encode(space, cb, "sv", "vec_id", dims=dims).localCheckpoint(
        eager=False
    )
    luts = pq_query_luts(queries, cb, "qv", dims=dims)
    # refine = ALL: the ADC shortlist is kept uncut, then re-ranked by
    # the exact integer dot in rotated space — the exactness ceiling
    shortlist = pq_adc_scores(coded, luts, dims).select("query_id", "id")
    rer = (
        shortlist.join(
            space.select(F.col("vec_id").alias("id"), F.col("sv").alias("cv")),
            "id",
        )
        .join(
            F.broadcast(queries.select("query_id", "qv")),
            "query_id",
        )
        .select(
            "query_id",
            F.col("id").alias("vec_id"),
            F.expr(
                "aggregate(zip_with(cv, qv, (x, y) -> x * y), 0L,"
                " (acc, v) -> acc + v)"
            ).alias("__dot_rot"),
        )
    )
    scale = disp["block"] if disp["rotated"] else 1
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__dot_rot"), F.col("vec_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _OPQ_TOPK)
        .select(
            "query_id",
            "rank",
            "vec_id",
            F.expr(f"__dot_rot div {scale}").alias("score"),
            F.lit(bool(disp["rotated"])).alias("rotation_helps"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# train/serve split for the bench (VERDICT r4 #3): the pq/ivf GATES
# deliberately include quantizer training so the oracle pins the whole
# pipeline, but a user's steady-state cost is the serving scan against
# an already-built index. These builders pay training + index
# materialization ONCE (eager localCheckpoint — the moral equivalent of
# the index table a 100 TB deployment keeps on disk) and return a thunk
# that builds only the per-batch serving plan; bench.py times the thunk.
# ---------------------------------------------------------------------------


def build_pq_serving(spark: SparkSession, sf_dir: str):
    """PQ serving thunk: per-query LUT build + ADC scan over the
    pre-encoded corpus + top-``refine`` window + exact re-rank. The
    codebook (pq_train) and encoded corpus (pq_encode) are trained and
    materialized at build time, outside the timed path."""
    from pyspark.sql.window import Window

    from ..operators.similarity import (
        _exact_rerank,
        _pq_dims,
        pq_adc_scores,
        pq_encode,
        pq_query_luts,
        pq_train,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", F.expr(_QVEC).alias("embedding"))
    train = qe.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    cb = pq_train(
        train, n_sub=_PROBED_NSUB, codes=_PROBED_CODES, max_iters=1
    ).localCheckpoint(eager=True)
    dims = _pq_dims(cb)
    coded = pq_encode(qe, cb, dims=dims).localCheckpoint(eager=True)
    queries = qe.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def serve() -> DataFrame:
        q = pq_query_luts(queries, cb, dims=dims)
        scored = pq_adc_scores(coded, q, dims)
        wr = Window.partitionBy("query_id").orderBy(
            F.desc("approx_sim"), F.col("id")
        )
        cands = (
            scored.withColumn("__rn", F.row_number().over(wr))
            .filter(F.col("__rn") <= _PROBED_REFINE)
            .select("query_id", F.col("id").alias("vec_id"))
        )
        return _exact_rerank(qe, cands, q, _PQ_K, "embedding", "vec_id")

    return serve


def build_ivf_learned_serving(spark: SparkSession, sf_dir: str):
    """IVF serving thunk: probe-list build + exact scoring of the
    probed cells' members (nprobe={_PROBED_NPROBE} of 8). The learned
    quantizer (kmeans_centroids) and the assigned corpus — the
    inverted index — are materialized at build time."""
    from pyspark.sql.window import Window

    from ..operators.similarity import (
        _dot as _fdot,
        ivf_assign,
        ivf_probe_cells,
        kmeans_centroids,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", F.expr(_QVEC).alias("embedding"))
    train = qe.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    cents = (
        kmeans_centroids(train, k=8, max_iters=2)
        .select("cell_id", "centroid")
        .localCheckpoint(eager=True)
    )
    assigned = ivf_assign(qe, cents).localCheckpoint(eager=True)
    queries = qe.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )

    def serve() -> DataFrame:
        probes = ivf_probe_cells(queries, cents, nprobe=_PROBED_NPROBE)
        cands = assigned.join(F.broadcast(probes), "cell_id")
        scored = cands.withColumn(
            "cosine_sim",
            _fdot("embedding", "__qv") / (F.col("__norm") * F.col("__qnorm")),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine_sim"), F.col("vec_id")
        )
        return (
            scored.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= _PQ_K)
            .select(
                "query_id",
                "vec_id",
                "cosine_sim",
                F.col("__rank").alias("rank"),
            )
        )

    return serve


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via embedding clusters (Abbas et al. 2023)
# ---------------------------------------------------------------------------
#
# Embedding-space dedup at corpus scale is cluster-restricted by
# construction: k-means the corpus, then find near-duplicate GROUPS
# only within each cluster (pairwise cosine above a tight threshold),
# keep one representative per group. Cost is sum(|cell|^2) instead of
# n^2 — the SemDeDup cost model; cross-cell near-dups are the accepted
# approximation (a pair that similar lands in the same cell for any
# sane quantizer).
#
# Gate data note (the cohort_retention device): the driver's
# embeddings are iid — max natural pairwise cosine is ~0.6 at every
# SF, so raw thresholding is vacuous. The gate therefore synthesizes
# near-duplicates IN-PLAN, deterministically, on BOTH sides: every
# vec_id % 7 == 0 vector gets a +5000-per-component copy (cosine
# ~0.99999 to its source at the 1e6 quantization scale), every
# vec_id % 14 == 0 a second, farther copy — so groups of size 2 and 3
# exist at every SF, chains must collapse transitively, and the
# natural corpus (pairwise <= 0.6) never crosses the 0.99 threshold.
# Cells come from the `label` column (the label-derived-quantizer
# convention of ivf_topk/label_centroids); a production run feeds
# kmeans_centroids + ivf_assign cell ids instead.

_SEM_TAU = 0.99
_SEM_PERT_1 = 5_000
_SEM_PERT_2 = 10_000
_SEM_OFF_1 = 10_000_000
_SEM_OFF_2 = 20_000_000

# Corpus-scaled quantizer (r12 — found by the sf1 bench): cells from
# the fixed-cardinality label column alone make the within-cell pair
# work n²/10 — measured 41× wall at 10× rows. SemDeDup's own cost
# model says the CLUSTER COUNT scales with the corpus, so the cell
# key gains SRP sign bits: nb = min(8, floor_log2(max(n/640, 1)))
# subdivision bits (n = corpus size computed IN-PLAN by both engines —
# the k-anonymity adaptive-k device), cell = label·256 + (sig mod
# 2^nb). Average cell size stays in [64, 128] at any corpus, so
# Σ|cell|² is LINEAR in n. Plane weights are the first 8 rows of the
# shared srp-{h}-{d} md5 matrix (srp_weights' convention), compiled
# into both plans as literals. At sf ≤ 0.001 nb = 0 — the historical
# single-level behavior. A planted pair can straddle a plane only if
# the ±5000 perturbation flips a sign whose projection magnitude is
# below ~8·5000 — rare, deterministic, and identical in both engines
# (the cell rule is shared text), so the gate stays exact.

_SEM_PLANES = 8
_SEM_DIV = 640


def _sem_weights() -> list[list[int]]:
    # first _SEM_PLANES rows of srp_weights() — inlined because that
    # helper is defined later in this module (registration order)
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"srp-{h}-{d}".encode()).hexdigest()[0] < "8"
            else -1
            for d in range(64)
        ]
        for h in range(_SEM_PLANES)
    ]


_SEM_W = _sem_weights()


def _sem_sig_expr(qv: str, duck: bool) -> str:
    """8-bit SRP signature of a quantized vector — one CASE per plane
    over a literal-weight dot; IDENTICAL algebra both engines."""
    terms = []
    for p, w in enumerate(_SEM_W):
        if duck:
            arr = "[" + ", ".join(str(v) for v in w) + "]"
            dot = (
                f"list_sum(list_transform(list_zip({qv}, {arr}), "
                "z -> z[1] * z[2]))"
            )
        else:
            arr = "array(" + ", ".join(f"{v}L" for v in w) + ")"
            dot = (
                f"aggregate(zip_with({qv}, {arr}, (x, y) -> x * y), "
                "0L, (a, v) -> a + v)"
            )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _semdedup_edges_arrow(n: DataFrame, tau: float) -> DataFrame:
    """Within-cell cosine >= ``tau`` edges via ONE numpy Gram matrix
    per cell at a sanctioned Arrow edge (guide §4.2) — the r13
    decision on the r12 open question (SCALE.md): the per-pair
    interpreted zip_with fold was the slowest non-by-design benched
    cost at sf0.1 and, because the cell key caps at _SEM_PLANES (8)
    subdivision bits (the OUTPUT contract — it cannot deepen without
    changing the gate), per-cell pair work grows quadratically again
    past n ≈ 2^8 · _SEM_DIV · |labels| rows; a vectorized Gram turns
    those pairs into BLAS flops instead of interpreted fold steps.

    EXACTNESS (why this is safe under the integer-quantization
    contract): components are integer-valued and bounded by 2^26
    (asserted per batch), so every pairwise product < 2^52 and every
    partial Gram sum < 2^53 stays an EXACTLY-representable float64
    integer under ANY accumulation order — the BLAS matmul equals the
    JVM long fold cast to double, bit for bit. norm = sqrt(diag)
    (correctly-rounded IEEE, identical to the JVM
    sqrt(cast(dot as double))), and the cosine decision divides and
    compares with the same two IEEE-rounded steps as the JVM filter.
    The unchanged DuckDB oracle pins the equivalence at every SF.
    (One out-of-contract divergence: a ZERO vector's 0/0 cosine is a
    quiet NaN here — no edge — where the ANSI JVM fold path raises
    DIVIDE_BY_ZERO; quantized real embeddings never have norm 0.)
    """
    import pandas as pd

    def pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
            }
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        q = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
        if np.abs(q).max() >= float(1 << 26):
            raise ValueError(
                "semdedup arrow scorer: a vector component >= 2^26 "
                "breaks the exact-float64-Gram bound — requantize, or "
                "score with semdedup_groups(scorer='fold')"
            )
        g = q @ q.T
        norm = np.sqrt(np.diag(g))
        with np.errstate(divide="ignore", invalid="ignore"):
            mask = (g / np.outer(norm, norm)) >= tau
        iu, ju = np.nonzero(np.triu(mask, k=1))
        if not len(iu):
            return empty
        a, b = ids[iu], ids[ju]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    return n.groupBy("cell").applyInPandas(pairs, "id_a long, id_b long")


def semdedup_groups(
    vectors: DataFrame,
    tau: float = _SEM_TAU,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    vec_col: str = "qv",
    scorer: str = "arrow",
) -> DataFrame:
    """(id, cell, grp, is_keeper, n_group) — SemDeDup group labels over
    (id, cell, quantized-int vector): within-cell pairs with cosine >=
    ``tau`` form edges, connected components collapse chains, the
    minimum id is the kept representative, singletons keep themselves.

    Scale shape: one checkpoint of the celled corpus (rule 12 — the
    edge build and the final label join both consume it), within-cell
    edge scoring (work = sum of cell sizes squared, the quantizer's k
    controls it), then pointer-doubled min-label propagation over the
    EDGE set only (operators/dedup.component_min_labels). The corpus
    is never all-pairs joined; partitioning rides the cell key end to
    end.

    ``scorer`` picks the edge build: ``"arrow"`` (default, r13) runs
    one numpy Gram matrix per cell at a sanctioned Arrow edge —
    bit-identical decisions, see _semdedup_edges_arrow; ``"fold"``
    keeps the all-JVM cell-keyed self-join with the interpreted
    per-pair zip_with dot (the pre-r13 shape; cheaper only when a
    Python worker pool is unavailable).
    """
    from ..operators.dedup import component_min_labels

    if scorer == "arrow":
        n = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(cell_col).alias("cell"),
            F.col(vec_col).alias("qv"),
        ).localCheckpoint(eager=False)
        edges = _semdedup_edges_arrow(n, tau)
    else:
        n = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(cell_col).alias("cell"),
            F.col(vec_col).alias("qv"),
            F.sqrt(_dot(vec_col, vec_col).cast("double")).alias("norm"),
        ).localCheckpoint(eager=False)
        a, b = n.alias("a"), n.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .filter(
                _dot("a.qv", "b.qv").cast("double")
                / (F.col("a.norm") * F.col("b.norm"))
                >= tau
            )
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
            )
        )
    labels = component_min_labels(edges)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        n.select("vec_id", "cell")
        .join(labels.withColumnRenamed("id", "vec_id"), "vec_id", "left")
        .withColumn("grp", F.coalesce("label", F.col("vec_id")))
        .join(
            F.broadcast(sizes).withColumnRenamed("label", "grp"),
            "grp",
            "left",
        )
        .select(
            "vec_id",
            "cell",
            "grp",
            (F.col("vec_id") == F.col("grp")).alias("is_keeper"),
            F.coalesce("n_members", F.lit(1)).cast("long").alias("n_group"),
        )
    )


def _sem_nb_sql(duck: bool) -> str:
    from ..operators.sketch import qhist_bucket_sql

    div = "//" if duck else "div"
    return (
        f"least({qhist_bucket_sql(f'greatest(n {div} {_SEM_DIV}, 1)')}, "
        f"{_SEM_PLANES})"
    )


@register(
    "semantic_dedup",
    f"""
    WITH RECURSIVE base AS (
        SELECT vec_id, label AS cell0, {_SQL_QVEC} AS qv FROM embeddings
    ),
    corpus AS MATERIALIZED (
        SELECT * FROM base
        UNION ALL
        SELECT vec_id + {_SEM_OFF_1}, cell0,
               list_transform(qv, x -> x + {_SEM_PERT_1})
        FROM base WHERE vec_id % 7 = 0
        UNION ALL
        SELECT vec_id + {_SEM_OFF_2}, cell0,
               list_transform(qv, x -> x + {_SEM_PERT_2})
        FROM base WHERE vec_id % 14 = 0
    ),
    nb AS MATERIALIZED (
        SELECT {_sem_nb_sql(duck=True)} AS b
        FROM (SELECT COUNT(*) AS n FROM corpus)
    ),
    n AS MATERIALIZED (
        SELECT vec_id,
               cell0 * 256
                   + ({_sem_sig_expr('qv', duck=True)}
                      % (1 << (SELECT b FROM nb))) AS cell,
               qv,
               sqrt(CAST({_sql_dot('qv', 'qv')} AS DOUBLE)) AS norm
        FROM corpus
    ),
    sim AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE CAST({_sql_dot('a.qv', 'b.qv')} AS DOUBLE)
                  / (a.norm * b.norm) >= {_SEM_TAU}
    ),
    edges AS (
        SELECT ia AS src, ib AS dst FROM sim
        UNION ALL
        SELECT ib AS src, ia AS dst FROM sim
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    labels AS (SELECT id, MIN(r) AS grp FROM reach GROUP BY 1),
    sizes AS (SELECT grp, COUNT(*) AS n_group FROM labels GROUP BY 1)
    SELECT c.vec_id, c.cell,
           COALESCE(l.grp, c.vec_id) AS grp,
           (COALESCE(l.grp, c.vec_id) = c.vec_id) AS is_keeper,
           CAST(COALESCE(s.n_group, 1) AS BIGINT) AS n_group
    FROM n c
    LEFT JOIN labels l ON c.vec_id = l.id
    LEFT JOIN sizes s ON COALESCE(l.grp, c.vec_id) = s.grp
    ORDER BY c.vec_id
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings corpus (+ in-plan synthesized
    near-duplicates, see module note): per vector its cell, its
    semantic-duplicate group (minimum member id), the keeper flag, and
    the group size — groups formed only WITHIN cells by pairwise
    cosine >= {_SEM_TAU}, chains collapsed by connected components.
    Cells are the label quantizer SUBDIVIDED by corpus-scaled SRP sign
    bits (see the r12 block note — the sf1 fix that keeps within-cell
    pair work linear in n; nb derives in-plan from COUNT(*), the
    adaptive-k device, so both engines compute the identical key).

    The oracle resolves the identical edge set with a recursive-CTE
    transitive closure (the near_dup_components device); cosine values
    are exact in both engines via the integer-quantized dot products.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    base = emb.select(
        "vec_id", F.col("label").alias("cell0"), F.expr(_QVEC).alias("qv")
    )
    d1 = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + _SEM_OFF_1).alias("vec_id"),
        "cell0",
        F.expr(f"transform(qv, x -> x + {_SEM_PERT_1})").alias("qv"),
    )
    d2 = base.filter(F.col("vec_id") % 14 == 0).select(
        (F.col("vec_id") + _SEM_OFF_2).alias("vec_id"),
        "cell0",
        F.expr(f"transform(qv, x -> x + {_SEM_PERT_2})").alias("qv"),
    )
    # r13: the corpus COUNT (nb's only input) is derivable from ONE
    # narrow aggregate over the base table — |corpus| = |base| +
    # |%7 slice| + |%14 slice| — so the union no longer needs a
    # rule-12 checkpoint for a second consumer: the cell projection
    # is its single consumer and the 64-dim arrays materialize once,
    # inside semdedup_groups' own boundary (one fewer sequential
    # checkpoint job per action; the oracle still counts the corpus
    # CTE directly — identical value by construction).
    corpus = base.unionByName(d1).unionByName(d2)
    nb = emb.agg(
        (
            F.count(F.lit(1))
            + F.sum(F.when(F.col("vec_id") % 7 == 0, 1).otherwise(0))
            + F.sum(F.when(F.col("vec_id") % 14 == 0, 1).otherwise(0))
        )
        .cast("long")
        .alias("n")
    ).select(F.expr(_sem_nb_sql(duck=False)).alias("__nb"))
    celled = corpus.crossJoin(F.broadcast(nb)).select(
        "vec_id",
        (
            F.col("cell0") * 256
            + F.expr(
                f"pmod({_sem_sig_expr('qv', duck=False)}, "
                "shiftleft(1, __nb))"
            )
        ).alias("cell"),
        "qv",
    )
    return semdedup_groups(celled).orderBy("vec_id")


# ---------------------------------------------------------------------------
# semantic decontamination (embedding-similarity eval-set scrub): the
# modern counterpart of the n-gram/Bloom/span decon family — drop any
# training doc whose EMBEDDING is near an eval-set vector (paraphrased
# contamination that token overlap misses; the phi/SemDeDup-style
# pipeline step). Benchmark = the vec_id % 997 == 7 slice (eval sets
# are small — it BROADCASTS); corpus scans ONCE against it, per-pair
# cosine >= τ tested as an EXACT integer predicate:
#     dot > 0  AND  100·dot² >= 81·‖a‖²·‖b‖²      (τ = 0.9)
# with the squares in DECIMAL(38,0) / HUGEINT (dot ≤ ~8e12 on the
# quantized vectors, so dot² ≈ 6e25 needs the wide type; no float
# compare anywhere). This corpus is iid (max natural cosine ~0.6), so
# contamination is synthesized IN-PLAN on the corpus side: an exact
# clone (+_DECON_OFF_1) and a +300-per-dim near-clone (+_DECON_OFF_2)
# of every benchmark vector — both must flag, everything else must
# not, and the oracle recomputes every pair. Scale shape: broadcast
# join + map-side-combined per-doc count; the production variant
# replaces brute force with the IVF/PQ probe for the shortlist and
# this exact predicate as the verifier.
# ---------------------------------------------------------------------------

_DECON_MOD, _DECON_SEL = 997, 7
_DECON_OFF_1, _DECON_OFF_2 = 2_000_000, 3_000_000
_DECON_PERT = 300


@register(
    "semantic_decontaminate",
    f"""
    WITH base AS (
        SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings
    ),
    bench AS (
        SELECT vec_id AS bid, qv AS bqv,
               {_sql_dot('qv', 'qv')} AS n2b
        FROM base WHERE vec_id % {_DECON_MOD} = {_DECON_SEL}
    ),
    corpus AS (
        SELECT vec_id, qv FROM base
        WHERE vec_id % {_DECON_MOD} != {_DECON_SEL}
        UNION ALL
        SELECT vec_id + {_DECON_OFF_1}, qv FROM base
        WHERE vec_id % {_DECON_MOD} = {_DECON_SEL}
        UNION ALL
        SELECT vec_id + {_DECON_OFF_2},
               list_transform(qv, x -> x + {_DECON_PERT})
        FROM base WHERE vec_id % {_DECON_MOD} = {_DECON_SEL}
    ),
    scored AS (
        SELECT c.vec_id,
               SUM(CASE WHEN {_sql_dot('c.qv', 'b.bqv')} > 0
                         AND 100 * CAST({_sql_dot('c.qv', 'b.bqv')}
                                        AS HUGEINT)
                               * CAST({_sql_dot('c.qv', 'b.bqv')}
                                      AS HUGEINT)
                             >= 81 * CAST({_sql_dot('c.qv', 'c.qv')}
                                          AS HUGEINT) * b.n2b
                    THEN 1 ELSE 0 END) AS n_hits
        FROM corpus c CROSS JOIN bench b
        GROUP BY c.vec_id
    )
    SELECT vec_id, (n_hits > 0) AS contaminated,
           CAST(n_hits AS BIGINT) AS n_hits
    FROM scored
    ORDER BY vec_id
    """,
)
def semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training doc: does its embedding sit within cosine 0.9 of
    ANY eval-set vector (see block comment)? Output = every corpus row
    with its contamination flag + hit count — the kept set is pinned
    as hard as the dropped set."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    base = emb.select("vec_id", F.expr(_QVEC).alias("qv"))
    is_bench = F.col("vec_id") % _DECON_MOD == _DECON_SEL
    bench = base.filter(is_bench).select(
        F.col("vec_id").alias("bid"),
        F.col("qv").alias("bqv"),
        _dot("qv", "qv").alias("n2b"),
    )
    corpus = (
        base.filter(~is_bench)
        .unionByName(
            base.filter(is_bench).select(
                (F.col("vec_id") + _DECON_OFF_1).alias("vec_id"), "qv"
            )
        )
        .unionByName(
            base.filter(is_bench).select(
                (F.col("vec_id") + _DECON_OFF_2).alias("vec_id"),
                F.expr(f"transform(qv, x -> x + {_DECON_PERT})").alias(
                    "qv"
                ),
            )
        )
    )
    pair_dot = _dot("qv", "bqv")
    hit = (
        (pair_dot > 0)
        & (
            F.lit(100).cast("decimal(38,0)")
            * pair_dot.cast("decimal(38,0)")
            * pair_dot.cast("decimal(38,0)")
            >= F.lit(81).cast("decimal(38,0)")
            * F.col("__n2c").cast("decimal(38,0)")
            * F.col("n2b").cast("decimal(38,0)")
        )
    ).cast("int")
    # hoist the corpus row's self-norm BEFORE the crossJoin (the
    # bloom_probe hoist discipline): inside the hit predicate it would
    # re-run the 64-element interpreted fold once per benchmark vector
    # per row (review r9)
    corpus = corpus.withColumn("__n2c", _dot("qv", "qv"))
    return (
        corpus.crossJoin(F.broadcast(bench))
        .groupBy("vec_id")
        .agg(F.sum(hit).alias("__h"))
        .select(
            "vec_id",
            (F.col("__h") > 0).alias("contaminated"),
            F.col("__h").cast("long").alias("n_hits"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# SRP (signed-random-projection / hyperplane) LSH near-dup pairs
# ---------------------------------------------------------------------------
# The oracle-gated face of the hyperplane-LSH family
# (operators/similarity.py lsh_bucket/lsh_topk is the xxhash64
# production twin, property-tested — xxhash64 has no DuckDB
# equivalent, so the gate derives its ±1 plane weights from md5, the
# simhash convention). 64 hyperplanes over the 64-dim quantized
# vectors; signature carried as two non-negative 32-bit halves
# (sig_lo, sig_hi); pigeonhole banding (4 × 16 bits: any pair within
# hamming 6 could still miss — LSH recall is probabilistic BY DESIGN
# and both engines compute the identical deterministic outcome).
#
# Projection shape (measured, rule-10 nuance): the 64 dots are ONE
# interpreted transform-fold over the literal weight matrix (4096
# mult-adds/row), checkpointed, then the two signature halves are 64
# cheap element_at CASE terms over the materialized dots array. The
# "clever" alternative — unrolling every sign bit into a flat
# 2048-element_at codegen sum (the simhash 2·c>n analog) — measured
# 4.9 s vs 0.93 s warm in one session: each run's fresh checkpoint
# RDD makes the 2.6 MB generated class a codegen-cache MISS, so
# Janino recompiles the monster every invocation, dwarfing any
# per-row win. Interpretation beats giant codegen here. Zero shuffle
# before the band self-join either way.
#
# Gate data note (the semantic_dedup device): the driver embeddings
# are iid (max natural cosine ~0.6 → SRP hamming ~Binomial(64, .35)
# at best, never ≤ 6), so near-duplicates are synthesized IN-PLAN on
# both sides: every vec_id % 7 == 0 vector gets a +5000-per-component
# copy whose per-plane shift is 5000·Σw_h ≪ the dot's natural spread —
# expected hamming ≈ 1, well under the 6 cutoff, while random pairs
# that share a band still sit near hamming 32 and are filtered.

_SRP_PLANES = 64
_SRP_MAX_HAMMING = 6
_SRP_PERT = 5_000
_SRP_OFF = 10_000_000


def srp_weights(n_planes: int = _SRP_PLANES, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 hyperplane weights: sign = first hex digit of
    md5("srp-{plane}-{dim}") < '8'. CPython md5 == Spark md5 == DuckDB
    md5 (the functions/hashing.py agreement), so the matrix can be
    compiled into BOTH plans as literals and never hashed at runtime."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"srp-{h}-{d}".encode()).hexdigest()[0] < "8"
            else -1
            for d in range(dim)
        ]
        for h in range(n_planes)
    ]


def srp_sign_exprs(dots_col: str = "ds") -> tuple[str, str]:
    """(sig_lo, sig_hi) Spark SQL expression texts over a MATERIALIZED
    per-plane dot-product array — 32 element_at CASE terms per half
    (see the projection-shape module note)."""

    def half(off: int) -> str:
        return " + ".join(
            f"(CASE WHEN element_at({dots_col}, {p + off + 1}) > 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE 0L END)"
            for p in range(32)
        )

    return half(0), half(32)


_SRP_W = srp_weights()
_SRP_W_SPARK = (
    "array("
    + ", ".join(
        "array(" + ", ".join(f"{v}L" for v in row) + ")" for row in _SRP_W
    )
    + ")"
)
_SRP_W_SQL = (
    "["
    + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in _SRP_W)
    + "]"
)


@register(
    "srp_lsh_pairs",
    f"""
    WITH base AS (
        SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings
    ),
    corpus AS (
        SELECT vec_id, qv FROM base
        UNION ALL
        SELECT vec_id + {_SRP_OFF}, list_transform(qv, x -> x + {_SRP_PERT})
        FROM base WHERE vec_id % 7 = 0
    ),
    dots AS (
        SELECT vec_id,
               list_transform({_SRP_W_SQL}, w ->
                   list_sum(list_transform(list_zip(qv, w),
                                           p -> p[1] * p[2]))) AS ds
        FROM corpus
    ),
    bits AS (
        SELECT vec_id, p, CASE WHEN ds[p + 1] > 0 THEN 1 ELSE 0 END AS b
        FROM dots, UNNEST(generate_series(0, 63)) AS t(p)
    ),
    sigs AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN b = 1 AND p < 32
                             THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
                   AS sig_lo,
               CAST(SUM(CASE WHEN b = 1 AND p >= 32
                             THEN (1::BIGINT << (p - 32)) ELSE 0 END)
                    AS BIGINT) AS sig_hi
        FROM bits GROUP BY 1
    ),
    banded AS (
        SELECT vec_id, sig_lo, sig_hi, band,
               CASE WHEN band = 0 THEN sig_lo & 65535
                    WHEN band = 1 THEN (sig_lo >> 16) & 65535
                    WHEN band = 2 THEN sig_hi & 65535
                    ELSE (sig_hi >> 16) & 65535 END AS band_val
        FROM sigs, UNNEST(generate_series(0, 3)) AS t(band)
    ),
    pairs AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
               a.sig_lo AS la, a.sig_hi AS ha,
               b.sig_lo AS lb, b.sig_hi AS hb
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
                     AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT)
               AS hamming
    FROM pairs
    WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb))
              <= {_SRP_MAX_HAMMING}
    ORDER BY 1, 2
    """,
)
def srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-duplicate pairs over embeddings
    (+ in-plan synthesized near-dups, see module note): 64-bit SRP
    signature → 4×16-bit band self-join → hamming ≤ {_SRP_MAX_HAMMING}
    verify. Candidate generation is linear in corpus size (never
    all-pairs); the corpus shuffles only for the band join.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    base = emb.select("vec_id", F.expr(_QVEC).alias("qv"))
    dup = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + _SRP_OFF).alias("vec_id"),
        F.expr(f"transform(qv, x -> x + {_SRP_PERT})").alias("qv"),
    )
    # the 64 dots materialize once — the sign bits reference them
    # per-position (rule 10/14: plan tests assert on this subtree
    # BEFORE the boundary)
    dots = (
        base.unionByName(dup)
        .select(
            "vec_id",
            F.expr(
                f"transform({_SRP_W_SPARK}, w -> "
                "aggregate(zip_with(qv, w, (x, y) -> x * y), 0L, "
                "(acc, v) -> acc + v))"
            ).alias("ds"),
        )
        .localCheckpoint(eager=False)
    )
    lo, hi = srp_sign_exprs()
    sigs = dots.select(
        "vec_id", F.expr(lo).alias("sig_lo"), F.expr(hi).alias("sig_hi")
    )
    banded = sigs.select(
        "vec_id",
        "sig_lo",
        "sig_hi",
        F.explode(F.expr("sequence(0, 3)")).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(
            "CASE WHEN band = 0 THEN sig_lo & 65535 "
            "WHEN band = 1 THEN (sig_lo >> 16) & 65535 "
            "WHEN band = 2 THEN sig_hi & 65535 "
            "ELSE (sig_hi >> 16) & 65535 END"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.sig_lo").alias("la"),
            F.col("a.sig_hi").alias("ha"),
            F.col("b.sig_lo").alias("lb"),
            F.col("b.sig_hi").alias("hb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.expr("bit_count(la ^ lb) + bit_count(ha ^ hb)").cast("long"),
        )
        .filter(F.col("hamming") <= _SRP_MAX_HAMMING)
        .select("id_a", "id_b", "hamming")
        # r13 psort A/B: 1.10 -> 1.06 s at sf0.1 (small but all three
        # paired readings lower; the band-join subtree re-ran in the
        # range sampling; rule 30)
        .transform(presentation_sort, "id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Rank-fusion hybrid retrieval (Borda): fuse two retrievers' ranked
# lists by integer rank points — the standard multi-query / hybrid
# (dense + dense-variant) fusion shape, RRF's integer-exact sibling
# (RRF's 1/(k+rank) fractions are a cross-engine float hazard; Borda
# points N−rank carry identical information for fusion and stay in
# BIGINT).
# ---------------------------------------------------------------------------

_FUSE_Q_A = 0  # first query vector (the cosine_topk convention)
_FUSE_Q_B = 1  # second query vector (a reformulation / variant)
_FUSE_N = 50  # per-retriever candidate depth
_FUSE_K = 10  # fused top-k


@register(
    "borda_fusion",
    f"""
    WITH qa AS (
        SELECT {_SQL_QVEC} AS qv FROM embeddings WHERE vec_id = {_FUSE_Q_A}
    ),
    qb AS (
        SELECT {_SQL_QVEC} AS qv FROM embeddings WHERE vec_id = {_FUSE_Q_B}
    ),
    scored AS (
        SELECT e.vec_id,
               CAST({_sql_dot(_E_QVEC, 'qa.qv')} AS DOUBLE)
                   / (sqrt(CAST({_sql_dot(_E_QVEC, _E_QVEC)} AS DOUBLE))
                      * sqrt(CAST({_sql_dot('qa.qv', 'qa.qv')} AS DOUBLE)))
                   AS cos_a,
               CAST({_sql_dot(_E_QVEC, 'qb.qv')} AS DOUBLE)
                   / (sqrt(CAST({_sql_dot(_E_QVEC, _E_QVEC)} AS DOUBLE))
                      * sqrt(CAST({_sql_dot('qb.qv', 'qb.qv')} AS DOUBLE)))
                   AS cos_b
        FROM embeddings e, qa, qb
        WHERE e.vec_id NOT IN ({_FUSE_Q_A}, {_FUSE_Q_B})
    ),
    top_a AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_a DESC, vec_id)
                   AS rank_a
        FROM (SELECT vec_id, cos_a FROM scored
              ORDER BY cos_a DESC, vec_id LIMIT {_FUSE_N})
    ),
    top_b AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_b DESC, vec_id)
                   AS rank_b
        FROM (SELECT vec_id, cos_b FROM scored
              ORDER BY cos_b DESC, vec_id LIMIT {_FUSE_N})
    ),
    fused AS (
        SELECT COALESCE(a.vec_id, b.vec_id) AS vec_id,
               a.rank_a AS rank_a, b.rank_b AS rank_b,
               COALESCE({_FUSE_N} - a.rank_a, 0)
                   + COALESCE({_FUSE_N} - b.rank_b, 0) AS borda
        FROM top_a a FULL OUTER JOIN top_b b ON a.vec_id = b.vec_id
    )
    SELECT vec_id, rank_a, rank_b, CAST(borda AS BIGINT) AS borda
    FROM fused
    ORDER BY borda DESC, vec_id
    LIMIT {_FUSE_K}
    """,
)
def borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused top-{_FUSE_K} over two retrievers (cosine against query
    vectors {_FUSE_Q_A} and {_FUSE_Q_B}): per retriever the top-{_FUSE_N}
    candidates ranked (cosine desc, vec_id), Borda points
    {_FUSE_N}−rank summed across lists (absent → 0), ties broken by
    vec_id.

    Scale shape: ONE narrow corpus pass scores both queries (the
    query pair rides a broadcast cross join), each list is a global
    TakeOrdered({_FUSE_N}) — no corpus shuffle — and ranking/fusion
    runs on two {_FUSE_N}-row frames (the bounded-window device:
    windows only ever see candidate-depth rows, never the corpus).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qa = (
        emb.filter(F.col("vec_id") == _FUSE_Q_A)
        .select(F.expr(_QVEC).alias("qa"))
    )
    qb = (
        emb.filter(F.col("vec_id") == _FUSE_Q_B)
        .select(F.expr(_QVEC).alias("qb"))
    )
    scored = (
        emb.filter(~F.col("vec_id").isin(_FUSE_Q_A, _FUSE_Q_B))
        .select("vec_id", F.expr(_QVEC).alias("qv"))
        .crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(qb))
        .select(
            "vec_id",
            (
                _dot("qv", "qa").cast("double")
                / (
                    F.sqrt(_dot("qv", "qv").cast("double"))
                    * F.sqrt(_dot("qa", "qa").cast("double"))
                )
            ).alias("cos_a"),
            (
                _dot("qv", "qb").cast("double")
                / (
                    F.sqrt(_dot("qv", "qv").cast("double"))
                    * F.sqrt(_dot("qb", "qb").cast("double"))
                )
            ).alias("cos_b"),
        )
        # both ranked() TakeOrdered branches consume this subtree —
        # materialize the scoring pass once (rule 12), or the
        # interpreted dot folds run twice per execution
        .localCheckpoint(eager=False)
    )
    from pyspark.sql.window import Window

    def ranked(col: str, out: str) -> DataFrame:
        top = scored.orderBy(F.col(col).desc(), "vec_id").limit(_FUSE_N)
        w = Window.orderBy(F.col(col).desc(), "vec_id")
        return top.select(
            "vec_id", F.row_number().over(w).cast("long").alias(out)
        )

    a, b = ranked("cos_a", "rank_a"), ranked("cos_b", "rank_b")
    fused = (
        a.join(b, "vec_id", "full_outer")
        .select(
            "vec_id",
            "rank_a",
            "rank_b",
            (
                F.coalesce(F.lit(_FUSE_N) - F.col("rank_a"), F.lit(0))
                + F.coalesce(F.lit(_FUSE_N) - F.col("rank_b"), F.lit(0))
            )
            .cast("long")
            .alias("borda"),
        )
    )
    return fused.orderBy(F.col("borda").desc(), "vec_id").limit(_FUSE_K)


# ---------------------------------------------------------------------------
# MMR diversified top-k (Carbonell & Goldstein 1998) — retrieval
# diversity over the exact candidate set
# ---------------------------------------------------------------------------

_MMR_QUERY_MOD = 401  # the cosine_topk_batch query-batch device
_MMR_CAND = 12
_MMR_K = 5


def _mmr_oracle_sql() -> str:
    """K chained CTE rounds (the pagerank device): greedy MMR with
    λ = 1/2 on exact integer inner products — round r picks, per
    query, the unselected candidate maximizing s_q − max_{j∈S} s_ij
    (ties → vec_id asc)."""
    head = f"""
    WITH qe AS (
        SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings
    ),
    queries AS (
        SELECT vec_id AS query_id, qv AS q FROM qe
        WHERE vec_id % {_MMR_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, c.vec_id,
               CAST({_sql_dot('c.qv', 'q.q')} AS BIGINT) AS s_q, c.qv
        FROM qe c, queries q WHERE c.vec_id != q.query_id
    ),
    cand AS (
        SELECT query_id, vec_id, s_q, qv FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY s_q DESC, vec_id) AS rn
            FROM scored)
        WHERE rn <= {_MMR_CAND}
    ),
    pairs AS (
        SELECT a.query_id, a.vec_id AS av, b.vec_id AS bv,
               CAST({_sql_dot('a.qv', 'b.qv')} AS BIGINT) AS s_ab
        FROM cand a JOIN cand b
          ON a.query_id = b.query_id AND a.vec_id != b.vec_id
    ),
    pick1 AS (
        SELECT query_id, vec_id, s_q, CAST(0 AS BIGINT) AS penalty,
               CAST(1 AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY s_q DESC, vec_id) AS rn
              FROM cand)
        WHERE rn = 1
    ),
    sel1 AS (SELECT query_id, vec_id FROM pick1)"""
    rounds = []
    for r in range(2, _MMR_K + 1):
        rounds.append(f""",
    pen{r} AS (
        SELECT c.query_id, c.vec_id, c.s_q,
               CAST(MAX(p.s_ab) AS BIGINT) AS penalty
        FROM cand c
        JOIN pairs p ON p.query_id = c.query_id AND p.av = c.vec_id
        JOIN sel{r - 1} s ON s.query_id = p.query_id AND s.vec_id = p.bv
        LEFT JOIN sel{r - 1} x
          ON x.query_id = c.query_id AND x.vec_id = c.vec_id
        WHERE x.vec_id IS NULL
        GROUP BY 1, 2, 3
    ),
    pick{r} AS (
        SELECT query_id, vec_id, s_q, penalty, CAST({r} AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY s_q - penalty DESC, vec_id) AS rn
              FROM pen{r})
        WHERE rn = 1
    ),
    sel{r} AS (
        SELECT query_id, vec_id FROM sel{r - 1}
        UNION ALL SELECT query_id, vec_id FROM pick{r}
    )""")
    union = " UNION ALL ".join(
        f"SELECT * FROM pick{r}" for r in range(1, _MMR_K + 1)
    )
    return (
        head
        + "".join(rounds)
        + f"\n    SELECT * FROM ({union}) ORDER BY query_id, rank"
    )


@register("mmr_topk", _mmr_oracle_sql())
def mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR re-ranking of the exact top-12 candidates:
    5 picks per query maximizing relevance − max-similarity-to-
    already-picked (λ = 1/2, so the tradeoff is one integer subtract).

    Similarities are exact quantized inner products (this module's
    integer discipline) — no float in any comparison, so the greedy
    argmax is bit-stable across engines and partitionings. Scale
    shape: ONE corpus scan builds the candidate set (query batch
    broadcasts, per-query window top-N); everything after — pair
    sims, 5 greedy rounds — runs on candidate-sized frames
    (batch × 12 rows), i.e. driver-trivial at any corpus
    size. The candidate and pair frames are lazily checkpointed (rule
    12: each feeds every round).
    """
    from pyspark.sql.window import Window

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    qe = emb.select("vec_id", F.expr(_QVEC).alias("qv"))
    queries = qe.filter(F.col("vec_id") % _MMR_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q")
    )
    scored = (
        qe.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _dot("qv", "q").cast("long").alias("s_q"),
            "qv",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s_q"), "vec_id")
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_CAND)
        .drop("rn")
        .localCheckpoint(eager=False)  # pairs + every greedy round
    )
    pairs = (
        cand.alias("a")
        .join(
            cand.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.vec_id").alias("av"),
            F.col("b.vec_id").alias("bv"),
            _dot("a.qv", "b.qv").cast("long").alias("s_ab"),
        )
        .localCheckpoint(eager=False)  # one consumer per round
    )
    cand_slim = cand.select("query_id", "vec_id", "s_q")
    return mmr_greedy(cand_slim, pairs, _MMR_K).orderBy("query_id", "rank")


def mmr_greedy(cand_slim: DataFrame, pairs: DataFrame, k: int) -> DataFrame:
    """The greedy MMR selection over a prepared candidate set:
    ``cand_slim`` is (query_id, vec_id, s_q), ``pairs`` is
    (query_id, av, bv, s_ab) with a row for EVERY ordered candidate
    pair of a query. Returns (query_id, vec_id, s_q, penalty, rank)
    for k rounds of argmax(s_q − max_{j∈picked} s_aj), ties broken on
    vec_id. Extracted so unit tests can feed synthetic candidates."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("s_q"), "vec_id")
    pick = (
        cand_slim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "vec_id",
            "s_q",
            F.lit(0).cast("long").alias("penalty"),
            F.lit(1).cast("long").alias("rank"),
        )
    )
    picks = [pick]
    sel = pick.select("query_id", "vec_id")
    for r in range(2, k + 1):
        pen_tbl = (
            pairs.join(
                sel.withColumnRenamed("vec_id", "bv"), ["query_id", "bv"]
            )
            .groupBy("query_id", F.col("av").alias("vec_id"))
            .agg(F.max("s_ab").cast("long").alias("penalty"))
        )
        pen = cand_slim.join(sel, ["query_id", "vec_id"], "left_anti").join(
            pen_tbl, ["query_id", "vec_id"]
        )
        w_r = Window.partitionBy("query_id").orderBy(
            F.desc(F.col("s_q") - F.col("penalty")), "vec_id"
        )
        pick_r = (
            pen.withColumn("rn", F.row_number().over(w_r))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "vec_id",
                "s_q",
                "penalty",
                F.lit(r).cast("long").alias("rank"),
            )
            # rule 12: pick_r feeds BOTH the output union and (via sel)
            # two consumers in every later round — without a boundary
            # the round plans re-expand 2^K-fold
            .localCheckpoint(eager=False)
        )
        picks.append(pick_r)
        sel = sel.unionByName(pick_r.select("query_id", "vec_id"))
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# contrastive negative sampling: deterministic hash-ranked negatives
# per anchor, label-excluded
# ---------------------------------------------------------------------------

_NEG_ANCHOR_MOD = 401  # the query-batch device
_NEG_K = 4


@register(
    "contrastive_negatives",
    f"""
    WITH anchors AS (
        SELECT vec_id AS anchor_id, label AS anchor_label
        FROM embeddings WHERE vec_id % {_NEG_ANCHOR_MOD} = 0
    ),
    ranked AS (
        SELECT a.anchor_id, e.vec_id AS neg_id, e.label AS neg_label,
               row_number() OVER (
                   PARTITION BY a.anchor_id
                   ORDER BY md5(CAST(a.anchor_id AS VARCHAR) || ':'
                               || CAST(e.vec_id AS VARCHAR)),
                            e.vec_id) AS rank
        FROM anchors a JOIN embeddings e
          ON e.label != a.anchor_label
    )
    SELECT anchor_id, CAST(rank AS BIGINT) AS rank, neg_id, neg_label
    FROM ranked WHERE rank <= {_NEG_K}
    ORDER BY anchor_id, rank
    """,
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair negative sampling: for each anchor, the
    top-{_NEG_K} candidates ranked by md5(anchor:candidate) among rows
    with a DIFFERENT label — the in-batch-negatives builder a
    contrastive training pipeline runs, made deterministic (md5 rank =
    uniform without-replacement draw that replays identically on
    retries/backfills; the hash_split discipline) and leakage-safe
    (label exclusion keeps positives out of the negative set).

    Shape: the anchors-sized table broadcasts onto ONE corpus scan
    (the label != condition rides the broadcast nested loop the same
    way cosine_topk_filtered's equi-prune does, but inverted);
    per-anchor top-k is a window over anchor partitions — parallelism
    = batch size. Ties on the 128-bit hash are broken by vec_id, so
    the order is total.
    """
    from pyspark.sql.window import Window

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") % _NEG_ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
    )
    cands = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
    )
    joined = cands.crossJoin(F.broadcast(anchors)).filter(
        F.col("neg_label") != F.col("anchor_label")
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit(":"),
                F.col("neg_id").cast("string"),
            ).cast("binary")
        ),
        "neg_id",
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _NEG_K)
        .select("anchor_id", "rank", "neg_id", "neg_label")
        .orderBy("anchor_id", "rank")
    )


# ---------------------------------------------------------------------------
# real baseline-JPEG decode at the Arrow edge (operators/jpeg.py — the
# dominant crawl image format; the PNG gate's compressed-codec sibling)
# ---------------------------------------------------------------------------
#
# Per document a baseline JPEG is synthesized whose MCUs are each FLAT
# (one value per component per MCU): under all-ones quantization a
# flat block carries only its integral DC coefficient 8·(v−128), so
# the full pipeline — canonical Huffman tables read from DHT, DC
# differential decode, dequant, IDCT, 4:2:0 chroma upsampling — is
# bit-exact and the oracle pins decoded component sums CLOSED-FORM
# from the generation constants alone (it never sees a JPEG byte).
# Even docs encode 4:4:4, odd docs 4:2:0 — both sampling layouts and
# both MCU geometries run in one gate. doc_id % 3 == 0 docs encode
# PROGRESSIVE (SOF2: the full scan script — DC point transform +
# refinement, per-component spectral bands at two successive-
# approximation levels), the rest baseline SOF0, so the progressive
# entropy layer runs under the same closed-form oracle (progressive
# transmission of a coefficient is lossless, flat-MCU exactness
# carries over unchanged). MCU value v_c(mx,my) =
# base_c + mx + 2·my with base_c = (doc_id·(c+1)) % 64 + 16: DC
# differences exercise every sign, values stay far from the 0/255
# clamp. The AC/run-length half of the entropy layer has no flat-block
# coverage by construction — tests/test_jpeg.py pins it against an
# independent numpy IDCT reference on random blocks (baseline ==
# progressive pixel equality) plus hand-assembled bitstream goldens.
# Scale shape: one narrow mapInPandas over doc_id, no shuffle.

_JPEG_NX_MOD, _JPEG_NY_MOD = 3, 2  # nx = 2 + d%3 MCUs, ny = 2 + d%2


def _jpeg_stats_batches(it):
    """doc_id batches → synthesize flat-MCU JPEG → REAL decode → sums."""
    import pandas as pd

    from ..operators.jpeg import decode_jpeg, encode_jpeg

    for pdf in it:
        out = {k: [] for k in
               ("doc_id", "width", "height", "subsampling", "mode",
                "dri", "y_sum", "cb_sum", "cr_sum")}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            nx, ny = 2 + d % _JPEG_NX_MOD, 2 + d % _JPEG_NY_MOD
            two = d % 2 == 1
            prog = d % 3 == 0
            dri = 2 if d % 5 == 0 else 0
            mcu = 16 if two else 8
            w, h = nx * mcu, ny * mcu
            base = [(d * (c + 1)) % 64 + 16 for c in range(3)]

            def plane(c, size):
                return [
                    [base[c] + (x // size) + 2 * (y // size)
                     for x in range(nx * size)]
                    for y in range(ny * size)
                ]

            planes = (
                [plane(0, 16), plane(1, 8), plane(2, 8)]
                if two
                else [plane(0, 8), plane(1, 8), plane(2, 8)]
            )
            payload = encode_jpeg(
                planes, "420" if two else "444", progressive=prog,
                restart_interval=dri,
            )
            dw, dh, nc, dec = decode_jpeg(payload)
            sums = [sum(v for row in p for v in row) for p in dec]
            out["doc_id"].append(d)
            out["width"].append(dw)
            out["height"].append(dh)
            out["subsampling"].append("420" if two else "444")
            out["mode"].append("progressive" if prog else "baseline")
            out["dri"].append(dri)
            out["y_sum"].append(sums[0])
            out["cb_sum"].append(sums[1])
            out["cr_sum"].append(sums[2])
        yield pd.DataFrame(out)


def _jpeg_sum_sql(c: int) -> str:
    """Closed-form decoded component sum: every MCU contributes
    mcu² · (base_c + mx + 2·my) once chroma is upsampled to full
    resolution, so Σ = mcu²·(nx·ny·base + ny·nx(nx−1)/2 + nx·ny(ny−1))."""
    base = f"((doc_id * {c + 1}) % 64 + 16)"
    return (
        f"CAST(mcu * mcu * (nx * ny * {base}"
        f" + ny * (nx * (nx - 1) // 2)"
        f" + nx * ny * (ny - 1)) AS BIGINT)"
    )


@register(
    "jpeg_decode_stats",
    f"""
    WITH dims AS (
        SELECT doc_id,
               2 + doc_id % {_JPEG_NX_MOD} AS nx,
               2 + doc_id % {_JPEG_NY_MOD} AS ny,
               CASE WHEN doc_id % 2 = 1 THEN 16 ELSE 8 END AS mcu
        FROM documents
    )
    SELECT doc_id,
           CAST(nx * mcu AS BIGINT) AS width,
           CAST(ny * mcu AS BIGINT) AS height,
           CASE WHEN doc_id % 2 = 1 THEN '420' ELSE '444' END
               AS subsampling,
           CASE WHEN doc_id % 3 = 0 THEN 'progressive' ELSE 'baseline'
               END AS mode,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 0 END AS BIGINT)
               AS dri,
           {_jpeg_sum_sql(0)} AS y_sum,
           {_jpeg_sum_sql(1)} AS cb_sum,
           {_jpeg_sum_sql(2)} AS cr_sum
    FROM dims
    ORDER BY doc_id
    """,
)
def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode end-to-end: per document a flat-MCU JPEG
    (4:4:4 even docs / 4:2:0 odd docs; PROGRESSIVE SOF2 for doc_id %
    3 == 0, baseline SOF0 otherwise) is synthesized and decoded
    by the stdlib codec (operators/jpeg.py) inside one Arrow-batched
    mapInPandas; the output pins decoded dimensions + per-component
    pixel sums against the oracle's closed-form recomputation (which
    never decodes — any defect in Huffman table construction, DC
    differential decode, the progressive scan accumulation (point
    transforms, EOBn runs, refinement bits), dequant, the IDCT, or
    chroma upsampling breaks the hash)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
            StructField("subsampling", StringType(), False),
            StructField("mode", StringType(), False),
            StructField("dri", LongType(), False),
            StructField("y_sum", LongType(), False),
            StructField("cb_sum", LongType(), False),
            StructField("cr_sum", LongType(), False),
        ]
    )
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    # boundary below the presentation sort: the range sampling pass
    # otherwise decodes the whole corpus TWICE (r12 opt — see
    # plans.presentation_sort)
    return presentation_sort(docs.mapInPandas(_jpeg_stats_batches, schema), "doc_id")


# ---------------------------------------------------------------------------
# real GIF (LZW) decode at the Arrow edge (operators/gif.py — the
# png_decode_stats device applied to the LZW compression family;
# closed-form oracle never sees a GIF byte)
# ---------------------------------------------------------------------------
#
# Per document a palette gradient GIF: index v(x, y) = b0 + x + y with
# b0 = doc_id % 200 and even width, so v < 256 (no wrap) and the
# channel sums close form through the palette i → (i, 255 − i, i//2):
#   r_sum = Σv = N·b0 + H·W(W−1)/2 + W·H(H−1)/2
#   g_sum = 255·N − r_sum
#   b_sum = (r_sum − N/2) / 2   (⌊v/2⌋ summed: the even width makes
#           the odd-v count exactly N/2 in every row, so the division
#           is exact integer arithmetic)
# Any defect in LZW coding (width schedule, KwKwK, clear handling,
# LSB bit packing, sub-block framing) or palette application changes
# a sum and fails the hash.
#
# doc_id % 3 == 0 docs encode INTERLACED (Haeberli 4-pass row order,
# r9 judge ask). Channel sums are row-order-INVARIANT, so a broken
# de-permute could hide behind them — rw_sum = Σ display_row · v
# weights each red value by its decoded row position and changes
# under any row mis-ordering (v depends on y, so swapped rows carry
# different value profiles). Closed form:
#   rw_sum = (w·b0 + w(w−1)/2)·h(h−1)/2 + w·(h−1)h(2h−1)/6

_GIF_W_MOD, _GIF_H_MOD, _GIF_BASE_MOD = 7, 9, 200


def _gif_stats_batches(it):
    """doc_id batches → synthesize palette GIF → REAL decode → stats."""
    import pandas as pd

    from ..operators.gif import decode_gif, encode_gif

    palette = [(i, 255 - i, i // 2) for i in range(256)]
    for pdf in it:
        out = {k: [] for k in
               ("doc_id", "width", "height", "interlaced",
                "r_sum", "g_sum", "b_sum", "rw_sum")}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w = 8 + 2 * (d % _GIF_W_MOD)  # even: the b_sum closed form
            h = 5 + d % _GIF_H_MOD
            b0 = d % _GIF_BASE_MOD
            inter = d % 3 == 0
            idx = bytes(b0 + x + y for y in range(h) for x in range(w))
            dw, dh, ch, rgb = decode_gif(
                encode_gif(w, h, idx, palette, interlace=inter)
            )
            sums = [0, 0, 0]
            rw = 0
            for i, b in enumerate(rgb):
                sums[i % 3] += b
                if i % 3 == 0:
                    rw += ((i // 3) // dw) * b
            out["doc_id"].append(d)
            out["width"].append(dw)
            out["height"].append(dh)
            out["interlaced"].append(int(inter))
            out["r_sum"].append(sums[0])
            out["g_sum"].append(sums[1])
            out["b_sum"].append(sums[2])
            out["rw_sum"].append(rw)
        yield pd.DataFrame(out)


@register(
    "gif_decode_stats",
    f"""
    WITH dims AS (
        SELECT doc_id,
               8 + 2 * (doc_id % {_GIF_W_MOD}) AS w,
               5 + doc_id % {_GIF_H_MOD} AS h,
               doc_id % {_GIF_BASE_MOD} AS b0
        FROM documents
    ),
    sums AS (
        SELECT doc_id, w, h,
               CAST(w * h * b0 + h * (w * (w - 1) // 2)
                    + w * (h * (h - 1) // 2) AS BIGINT) AS r_sum,
               CAST(w * h AS BIGINT) AS n
        FROM dims
    )
    SELECT s.doc_id,
           CAST(s.w AS BIGINT) AS width,
           CAST(s.h AS BIGINT) AS height,
           CAST(CASE WHEN s.doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS interlaced,
           s.r_sum,
           CAST(255 * s.n - s.r_sum AS BIGINT) AS g_sum,
           CAST((s.r_sum - s.n // 2) // 2 AS BIGINT) AS b_sum,
           CAST((s.w * d.b0 + s.w * (s.w - 1) // 2)
                    * (s.h * (s.h - 1) // 2)
                + s.w * ((s.h - 1) * s.h * (2 * s.h - 1) // 6)
                AS BIGINT) AS rw_sum
    FROM sums s JOIN dims d ON s.doc_id = d.doc_id
    ORDER BY s.doc_id
    """,
)
def gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end-to-end: per document a palette gradient GIF
    (INTERLACED Haeberli 4-pass for doc_id % 3 == 0, sequential
    otherwise) is synthesized and decoded by the stdlib LZW codec
    (operators/gif.py) inside one Arrow-batched mapInPandas; decoded
    dimensions + per-channel sums + the row-order-SENSITIVE rw_sum are
    pinned against the oracle's closed-form recomputation (see block
    comment — the oracle never sees a GIF byte; a broken interlace
    permutation on either codec side breaks rw_sum)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(n, LongType(), False)
         for n in ("doc_id", "width", "height", "interlaced",
                   "r_sum", "g_sum", "b_sum", "rw_sum")]
    )
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    # boundary below the presentation sort: the range sampling pass
    # otherwise decodes the whole corpus TWICE (r12 opt — see
    # plans.presentation_sort)
    return presentation_sort(docs.mapInPandas(_gif_stats_batches, schema), "doc_id")


# ---------------------------------------------------------------------------
# animated GIF decode (r11 judge ask): graphic-control blocks,
# sub-rect frames, transparency, disposal none/background — per-frame
# COMPOSITED sums pinned against a closed-form grid oracle that never
# sees a GIF byte.
# ---------------------------------------------------------------------------
#
# Per doc: canvas w×h gradient (the static gate's shape), nf = 2 +
# doc_id % 3 frames. Frame 0 paints the full canvas (interlaced for
# doc_id % 3 == 0); frame f ≥ 1 paints ONLY row f−1 with value 255−f
# at even x and a TRANSPARENT index at odd x (prior content shows
# through). Even docs give frame 1 disposal 2 ("restore to
# background", bg index 255) — from frame 2 on, row 0 reads 255.
# Composited value at (f, x, y):
#   a==1 ∧ f≥2 ∧ y==0        → 255          (the disposal-2 pin)
#   y ≤ f−1 ∧ x even          → 255 − (y+1)  (painted by frame y+1)
#   else                      → b0 + x + y   (gradient / transparency)
# rw_sum = Σ y·v is the row-placement pin (a mis-offset paste or a
# broken de-permute moves it even when channel sums survive).

_GIF_ANIM_TRANSP = 250  # transparent index; painted values are 251..254


def _gif_anim_batches(it):
    import pandas as pd

    from ..operators.gif import decode_gif_frames, encode_animated_gif

    palette = [(i, 255 - i, i // 2) for i in range(256)]
    cols = ("doc_id", "frame", "delay_cs", "width", "height",
            "r_sum", "g_sum", "b_sum", "rw_sum")
    for pdf in it:
        out = {k: [] for k in cols}
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w = 8 + 2 * (d % _GIF_W_MOD)
            h = 5 + d % _GIF_H_MOD
            b0 = d % _GIF_BASE_MOD
            nf = 2 + d % 3
            frames = [
                (0, 0, w, h,
                 bytes(b0 + x + y for y in range(h) for x in range(w)),
                 10, 0, None, d % 3 == 0)
            ]
            for f in range(1, nf):
                row = bytes(
                    (255 - f) if x % 2 == 0 else _GIF_ANIM_TRANSP
                    for x in range(w)
                )
                disposal = 2 if (f == 1 and d % 2 == 0) else 0
                frames.append(
                    (0, f - 1, w, 1, row, 10 * (f + 1), disposal,
                     _GIF_ANIM_TRANSP, False)
                )
            raw = encode_animated_gif(w, h, frames, palette, bg_index=255)
            cw, ch, decoded = decode_gif_frames(raw)
            for f, (delay, rgb) in enumerate(decoded):
                sums = [0, 0, 0]
                rw = 0
                for i, b in enumerate(rgb):
                    sums[i % 3] += b
                    if i % 3 == 0:
                        rw += ((i // 3) // cw) * b
                out["doc_id"].append(d)
                out["frame"].append(f)
                out["delay_cs"].append(delay)
                out["width"].append(cw)
                out["height"].append(ch)
                out["r_sum"].append(sums[0])
                out["g_sum"].append(sums[1])
                out["b_sum"].append(sums[2])
                out["rw_sum"].append(rw)
        yield pd.DataFrame(out)


@register(
    "gif_animation_stats",
    f"""
    WITH dims AS (
        SELECT doc_id,
               8 + 2 * (doc_id % {_GIF_W_MOD}) AS w,
               5 + doc_id % {_GIF_H_MOD} AS h,
               doc_id % {_GIF_BASE_MOD} AS b0,
               2 + doc_id % 3 AS nf,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS a
        FROM documents
    ),
    vals AS (
        SELECT d.doc_id, d.w, d.h, fr.f, yy.y,
               CASE WHEN d.a = 1 AND fr.f >= 2 AND yy.y = 0 THEN 255
                    WHEN yy.y <= fr.f - 1 AND xx.x % 2 = 0
                        THEN 255 - (yy.y + 1)
                    ELSE d.b0 + xx.x + yy.y END AS v
        FROM dims d,
             UNNEST(generate_series(0, d.nf - 1)) AS fr(f),
             UNNEST(generate_series(0, d.h - 1)) AS yy(y),
             UNNEST(generate_series(0, d.w - 1)) AS xx(x)
    )
    SELECT doc_id,
           CAST(f AS BIGINT) AS frame,
           CAST(10 * (f + 1) AS BIGINT) AS delay_cs,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(SUM(v) AS BIGINT) AS r_sum,
           CAST(SUM(255 - v) AS BIGINT) AS g_sum,
           CAST(SUM(v // 2) AS BIGINT) AS b_sum,
           CAST(SUM(y * v) AS BIGINT) AS rw_sum
    FROM vals
    GROUP BY doc_id, f
    ORDER BY doc_id, f
    """,
)
def gif_animation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF decode end-to-end: per document a 2-4 frame
    GIF89a (graphic-control delays, sub-rectangle frames, transparent
    pixels, disposal restore-to-background for even docs, interlaced
    first frame for doc_id % 3 == 0) is synthesized, encoded and
    COMPOSITED back by the stdlib codec (operators/gif.py
    encode_animated_gif / decode_gif_frames) inside one Arrow-batched
    mapInPandas — one output row per (doc, frame) with the composited
    canvas's channel sums, the row-weighted rw_sum and the GCE delay,
    all pinned against the oracle's brute-force grid recomputation of
    the compositing semantics (see block comment — the oracle never
    sees a GIF byte; a transparency leak, a mis-offset paste, a
    skipped disposal restore, or a swallowed frame each move a sum or
    a row count)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(n, LongType(), False)
         for n in ("doc_id", "frame", "delay_cs", "width", "height",
                   "r_sum", "g_sum", "b_sum", "rw_sum")]
    )
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort)
    return presentation_sort(
        docs.mapInPandas(_gif_anim_batches, schema), "doc_id", "frame"
    )


# ---------------------------------------------------------------------------
# k-center greedy coreset (Gonzalez 2-approx / Sener-Savarese rule)
# ---------------------------------------------------------------------------
#
# Data-pruning family member that none of the dedup/sampling gates
# cover: pick the k points that MINIMIZE the maximum distance from any
# corpus point to its nearest pick — the coreset rule used for
# active-learning selection. Exact-integer squared-L2 over the shared
# 1e6 quantization (64 dims x (2e6)^2 = 2.56e14, inside BIGINT); the
# oracle unrolls the greedy loop as chained MATERIALIZED CTE rounds
# (the pagerank device, rule 28) with the identical argmax rule
# (max min-dist, ties -> min vec_id; selected points self-exclude at
# distance 0). Below fold: the iterative-selection family's driver
# slot is mmr_topk's ground; this pins the coverage trajectory.

_KCENTER_K = 6


def _kcenter_oracle_sql(k: int) -> str:
    dist = (
        "CAST(list_sum(list_transform(list_zip(p.v, s.v), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    parts = [
        f"WITH pts AS MATERIALIZED (SELECT vec_id, {_SQL_QVEC} AS v "
        "FROM embeddings)",
        "c1 AS MATERIALIZED (SELECT 1 AS round, vec_id, "
        "CAST(0 AS BIGINT) AS mind, v FROM pts "
        "WHERE vec_id = (SELECT MIN(vec_id) FROM pts))",
        "s1 AS MATERIALIZED (SELECT * FROM c1)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT p.vec_id, first(p.v) AS v, "
            f"MIN({dist}) AS mind "
            f"FROM pts p, s{r - 1} s GROUP BY p.vec_id)"
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT {r} AS round, vec_id, mind, v "
            f"FROM p{r} ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED "
            f"(SELECT * FROM s{r - 1} UNION ALL SELECT * FROM c{r})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT round, vec_id, mind AS min_dist_sq FROM s{k} "
        "ORDER BY round"
    )


@register("kcenter_coreset", _kcenter_oracle_sql(_KCENTER_K))
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (operators/similarity.kcenter_greedy)
    over the embeddings corpus: the full selection trajectory —
    (round, picked vec_id, selection-time coverage radius) — pinned
    integer-exact against the unrolled-CTE oracle. Scale shape: one
    corpus checkpoint scanned once per round with the <=k selected
    vectors on a broadcast; per-round argmax is TakeOrdered(1)."""
    from ..operators.similarity import kcenter_greedy

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr(_QVEC).alias("v")
    )
    return kcenter_greedy(emb, _KCENTER_K).orderBy("round")
