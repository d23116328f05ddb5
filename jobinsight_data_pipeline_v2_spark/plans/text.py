"""Text-analysis and deduplication operators over ``documents``.

Net-new capability beyond the reference (SURVEY §7.2 phase 6): the
operators a large-scale training-data pipeline needs — exact dedup,
n-gram Jaccard near-dup, MinHash+LSH candidate generation, language-ID,
quality scoring, token statistics, fingerprinting.

Oracle-compatibility choices:
- All hashing is md5 (identical lowercase hex in Spark and DuckDB);
  engine-native hash functions (murmur3 vs DuckDB's hash) would never
  match. The production-scale variants in operators/dedup.py use
  xxhash64 — cheaper — and are property-tested instead.
- All ratios are exact integer counts divided in double space →
  bit-identical across engines.
- Tokenization is a plain split on single spaces: the documents corpus
  is single-space word soup, and both engines agree on the semantics.

Scale design (100 TB): every query below is a pipeline of narrow ops +
one or two shuffles on high-cardinality keys (shingle, band key, token)
— no driver-side loops, no collect. The Jaccard candidate join caps
shingle document-frequency (stop-shingle removal) so a hot shingle
cannot produce a quadratic pair explosion; MinHash banding bounds
candidate generation the standard way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, spread
from . import presentation_sort, register

# shared tokenization: single-space split, drop empties
_TOKENS = "filter(split(text, ' '), t -> t != '')"
_SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t != '')"

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"




_COOCCUR_SALTS = 64


def _cooccur_pairs(
    df: DataFrame, key: str, id_col: str = "doc_id", *, max_df: int
) -> DataFrame:
    """(doc_a, doc_b): one row per shared key per ordered id pair.

    Replaces the rare-filter + self-join tail (4 exchanges: df agg,
    rare join, self-join shuffle of the b side, pair agg) with a
    salted two-phase collect: phase 1 groups by (key, salt) and keeps
    at most max_df+1 sorted ids per bucket (a corpus-scale stop key
    with df in the millions holds df/SALTS ids in any one buffer,
    then the slice caps what the bucket emits); phase 2 merges the ≤
    SALTS x (max_df+1) partials per key, sums the exact df, and drops
    keys outside [2, max_df]. No aggregation buffer ever materializes
    a hot key's full id list (the single-phase collect-then-filter
    form did — ADVICE r3), phase 2's exchange carries only capped
    partials, and the big (key, id) stream still shuffles exactly
    once. For surviving keys the slice is lossless (df ≤ max_df <
    cap+1), so semantics are identical to the uncapped collect +
    size filter. The in-row i<j expansion is bounded by max_df (≤ 40
    ids → ≤ 780 pairs per key); ids arrive sorted, so doc_a < doc_b
    for free. Callers still aggregate the emitted pairs.
    """
    # ONE exchange for both phases: hash-partitioning on `key` alone
    # already co-locates every (key, salt) group AND every key group,
    # so after the explicit repartition both aggregations run
    # in-partition with no further shuffle (pinned partition count —
    # a plain repartition(col) is AQE-coalescible, and collapsing to
    # one partition would serialize the aggs). Most keys are unique
    # (df=1), so a second exchange would re-move nearly the whole
    # stream for nothing.
    try:
        n_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:  # e.g. "auto" on AQE-managed platforms
        n_parts = 200
    part = (
        df.repartition(n_parts, key)
        .groupBy(
            key,
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(_COOCCUR_SALTS)).alias(
                "__salt"
            ),
        )
        .agg(
            # NO sort here: truncation only ever affects keys whose df
            # exceeds max_df, and those are dropped below — surviving
            # keys pass through complete, so one sort in phase 2 is
            # enough and every bucket skips an O(b log b) pass
            F.slice(F.collect_list(id_col), 1, max_df + 1).alias("part"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    g = (
        part.groupBy(key)
        .agg(
            F.sum("cnt").alias("__df"),
            F.slice(
                F.sort_array(F.flatten(F.collect_list("part"))), 1, max_df + 1
            ).alias("ids"),
        )
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
    )
    return g.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(ids) - 2), i -> "
                "transform(sequence(i + 1, size(ids) - 1), j -> "
                "struct(ids[i] AS doc_a, ids[j] AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")


def _materialize(df: DataFrame) -> DataFrame:
    """Materialize a multi-consumer subtree once (localCheckpoint).

    The shingle explode+distinct below feeds 3-4 consumers (sizes,
    document-frequency filter, both self-join sides); Spark's exchange
    reuse does not fire across these differently-shaped consumers, so
    without this the subtree recomputes per consumer (measured 3-5x
    cost). localCheckpoint trades lineage-based recovery (fine on a
    single node; on a cluster prefer a reliable checkpoint dir) for
    computing the subtree exactly once.
    """
    return df.localCheckpoint(eager=False)

# ---------------------------------------------------------------------------
# token statistics + quality scoring
# ---------------------------------------------------------------------------


@register(
    "doc_quality",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, n_chars, {_SQL_TOKENS} AS tokens FROM documents
    ),
    stats AS (
        SELECT doc_id, lang, n_chars,
               len(tokens) AS n_tokens,
               len(list_distinct(tokens)) AS n_distinct,
               len(list_filter(tokens, t -> t IN {_STOP_SQL})) AS n_stop
        FROM toks
    )
    SELECT doc_id, lang, n_chars, n_tokens, n_distinct,
           CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens     AS stopword_ratio,
           CAST(n_chars AS DOUBLE) / n_tokens    AS avg_token_len,
           (CAST(n_distinct AS DOUBLE) / n_tokens) *
               (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) AS quality_score
    FROM stats
    WHERE n_tokens > 0
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, type-token ratio,
    stopword ratio, avg token length, composite score.

    Pure higher-order array functions (filter/array_distinct/size) —
    JVM-side, whole-stage-codegen'd, zero Python. Narrow plan: no
    shuffle at all; scales linearly with document count.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.withColumn("tokens", F.expr(_TOKENS))
    stop_arr = ", ".join(f"'{w}'" for w in _STOPWORDS)
    stats = toks.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        F.size(F.expr(f"filter(tokens, t -> t IN ({stop_arr}))")).alias("n_stop"),
    )
    return stats.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "lang",
        "n_chars",
        "n_tokens",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "type_token_ratio"
        ),
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        (
            (F.col("n_distinct").cast("double") / F.col("n_tokens"))
            * (F.lit(1.0) - F.col("n_stop").cast("double") / F.col("n_tokens"))
        ).alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# language-ID heuristic + accuracy against the labeled lang column
# ---------------------------------------------------------------------------


@register(
    "langid_eval",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter({_SQL_TOKENS}, t -> t IN {_STOP_SQL})) AS n_stop,
               len({_SQL_TOKENS}) AS n_tokens
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN n_tokens > 0
                         AND CAST(n_stop AS DOUBLE) / n_tokens >= 0.05
                    THEN 'en' ELSE 'other' END AS predicted
        FROM scored
    )
    SELECT lang, predicted, COUNT(*) AS n_docs
    FROM pred
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic, evaluated as a confusion
    matrix against the labeled ``lang`` column. The heuristic (English
    function-word density ≥ 5%) is the classic cheap LID first pass of
    a training-data pipeline; confusion counts are exact integers."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    stop_arr = ", ".join(f"'{w}'" for w in _STOPWORDS)
    scored = docs.select(
        "lang",
        F.size(F.expr(f"filter({_TOKENS}, t -> t IN ({stop_arr}))")).alias("n_stop"),
        F.size(F.expr(_TOKENS)).alias("n_tokens"),
    )
    pred = scored.select(
        "lang",
        F.when(
            (F.col("n_tokens") > 0)
            & (F.col("n_stop").cast("double") / F.col("n_tokens") >= 0.05),
            "en",
        )
        .otherwise("other")
        .alias("predicted"),
    )
    return (
        pred.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted")
    )


# ---------------------------------------------------------------------------
# Gopher rule-based quality flags (Rae et al. 2021, appendix A)
# ---------------------------------------------------------------------------
#
# The published heuristic filter battery every large curation stack
# runs before any model-based scoring: word-count bounds, mean-word-
# length bounds, symbol-to-word ratio, alphabetic-word fraction, the
# stop-word requirement, and the bullet-/ellipsis-line ratios. Every
# ratio threshold is evaluated by integer cross-multiplication
# (3·n_words ≤ n_wchars ⇔ mean ≥ 3 — the ccnet_buckets rational-
# threshold device), so the verdicts are bit-exact in both engines
# with no float division anywhere. On this corpus (single-line ASCII
# word soup) the symbol/bullet/ellipsis rules are vacuously true —
# the counters that feed them still vary per doc and sit in the hash;
# on real crawl text the same expressions light up.

# Gopher's published eight function words, plus the engine's LID stop
# list (text.py:_STOPWORDS). The synthetic corpus vocabulary contains
# only 'the'/'a' from Gopher's own list, which would pin the ≥2-
# distinct rule at constant false; the union is a superset of the
# published list and keeps the rule discriminative here.
_GOPHER_STOPS = (
    "the", "be", "to", "of", "and", "that", "have", "with", "a", "in", "is",
)
_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)


@register(
    "gopher_quality_flags",
    f"""
    WITH s AS (
        SELECT doc_id,
               {_SQL_TOKENS} AS t,
               string_split(text, chr(10)) AS lines,
               CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_wchars,
               CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
                   AS n_hash,
               CAST((len(text) - len(replace(text, '...', ''))) // 3
                    AS BIGINT) AS n_ellipsis
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_wchars, n_hash, n_ellipsis,
               CAST(len(t) AS BIGINT) AS n_words,
               CAST(len(list_filter(t,
                        w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
                   AS n_alpha,
               CAST(len(list_intersect(t, [{_GOPHER_STOP_SQL}])) AS BIGINT)
                   AS n_stop_distinct,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(list_filter(lines,
                        l -> regexp_matches(ltrim(l), '^[-*]'))) AS BIGINT)
                   AS n_bullet,
               CAST(len(list_filter(lines,
                        l -> ends_with(rtrim(l), '...'))) AS BIGINT)
                   AS n_ell_end
        FROM s
    )
    SELECT doc_id, n_words, n_wchars, n_alpha, n_stop_distinct,
           n_hash, n_ellipsis, n_lines, n_bullet, n_ell_end,
           n_words BETWEEN 50 AND 100000                    AS f_word_count,
           3 * n_words <= n_wchars AND n_wchars <= 10 * n_words
                                                            AS f_word_len,
           10 * (n_hash + n_ellipsis) <= n_words            AS f_symbol,
           5 * n_alpha >= 4 * n_words                       AS f_alpha,
           n_stop_distinct >= 2                             AS f_stop,
           10 * n_bullet <= 9 * n_lines                     AS f_bullet,
           10 * n_ell_end <= 3 * n_lines                    AS f_ellipsis,
           (n_words BETWEEN 50 AND 100000)
               AND 3 * n_words <= n_wchars AND n_wchars <= 10 * n_words
               AND 10 * (n_hash + n_ellipsis) <= n_words
               AND 5 * n_alpha >= 4 * n_words
               AND n_stop_distinct >= 2
               AND 10 * n_bullet <= 9 * n_lines
               AND 10 * n_ell_end <= 3 * n_lines            AS pass_gopher
    FROM c
    ORDER BY doc_id
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021): per document
    the raw counters (words, word chars, alphabetic words, distinct
    Gopher stop words, #/ellipsis symbols, lines, bullet lines,
    ellipsis-ended lines), each published rule's verdict, and the
    overall pass flag. All thresholds are integer cross-multiplied —
    no float ratio anywhere (the ccnet_buckets discipline).

    Scale shape: a single fully narrow projection over the corpus scan
    — string/array built-ins only, whole-stage codegen end to end,
    zero shuffle beyond the presentation sort. Survives any scale-up
    by construction.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort; the narrow rule battery otherwise runs
    # twice under the range sampling pass). Rule 14: the narrow-plan
    # test asserts on gopher_flag_columns directly.
    return presentation_sort(gopher_flag_columns(docs), "doc_id")


def gopher_flag_columns(docs: DataFrame) -> DataFrame:
    """(doc_id, counters…, f_*…, pass_gopher) — the Gopher rule battery
    as a reusable narrow transform over any (doc_id, text) frame:
    shared by the oracle gate and the curate_corpus rule-gate stage
    (and streaming-safe: single linear projection, no checkpoint
    needed)."""
    stops = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)
    c = docs.select(
        "doc_id",
        F.expr(f"cast(size({_TOKENS}) as bigint)").alias("n_words"),
        F.expr("cast(length(replace(text, ' ', '')) as bigint)").alias(
            "n_wchars"
        ),
        F.expr(
            f"cast(size(filter({_TOKENS}, w -> w rlike '[a-zA-Z]')) as bigint)"
        ).alias("n_alpha"),
        F.expr(
            f"cast(size(array_intersect({_TOKENS}, array({stops}))) as bigint)"
        ).alias("n_stop_distinct"),
        F.expr(
            "cast(length(text) - length(replace(text, '#', '')) as bigint)"
        ).alias("n_hash"),
        F.expr(
            "cast(div(length(text) - length(replace(text, '...', '')), 3)"
            " as bigint)"
        ).alias("n_ellipsis"),
        F.expr("cast(size(split(text, char(10))) as bigint)").alias("n_lines"),
        F.expr(
            "cast(size(filter(split(text, char(10)),"
            " l -> ltrim(l) rlike '^[-*]')) as bigint)"
        ).alias("n_bullet"),
        F.expr(
            "cast(size(filter(split(text, char(10)),"
            " l -> endswith(rtrim(l), '...'))) as bigint)"
        ).alias("n_ell_end"),
    )
    f_word_count = F.col("n_words").between(50, 100000)
    f_word_len = (3 * F.col("n_words") <= F.col("n_wchars")) & (
        F.col("n_wchars") <= 10 * F.col("n_words")
    )
    f_symbol = 10 * (F.col("n_hash") + F.col("n_ellipsis")) <= F.col("n_words")
    f_alpha = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    f_stop = F.col("n_stop_distinct") >= 2
    f_bullet = 10 * F.col("n_bullet") <= 9 * F.col("n_lines")
    f_ellipsis = 10 * F.col("n_ell_end") <= 3 * F.col("n_lines")
    return c.select(
        "doc_id",
        "n_words",
        "n_wchars",
        "n_alpha",
        "n_stop_distinct",
        "n_hash",
        "n_ellipsis",
        "n_lines",
        "n_bullet",
        "n_ell_end",
        f_word_count.alias("f_word_count"),
        f_word_len.alias("f_word_len"),
        f_symbol.alias("f_symbol"),
        f_alpha.alias("f_alpha"),
        f_stop.alias("f_stop"),
        f_bullet.alias("f_bullet"),
        f_ellipsis.alias("f_ellipsis"),
        (
            f_word_count
            & f_word_len
            & f_symbol
            & f_alpha
            & f_stop
            & f_bullet
            & f_ellipsis
        ).alias("pass_gopher"),
    )


# ---------------------------------------------------------------------------
# exact dedup via normalized fingerprint (hash-groupBy)
# ---------------------------------------------------------------------------


@register(
    "exact_dedup",
    """
    WITH fp AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           MIN(doc_id)  AS keeper_doc_id,
           COUNT(*)     AS n_copies
    FROM fp
    GROUP BY 1
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize (lowercase, collapse whitespace) → md5
    fingerprint → group, keep min doc_id (SURVEY north-star: exact
    dedup as hash-groupBy). One shuffle on the 128-bit fingerprint —
    uniformly distributed, so no skew at any scale."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    fp = docs.select(
        "doc_id",
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).cast("binary")
        ).alias("fingerprint"),
    )
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (shingle join with stop-shingle cap)
# ---------------------------------------------------------------------------

_SHINGLE_N = 4  # word 4-grams
_MAX_SHINGLE_DF = 40  # drop shingles present in more docs (stop-shingles)
_JACCARD_MIN = 0.5

# Overlapping word-4-grams in ONE regex pass: the scanner consumes the
# separator before each token start (^ or a space) and captures the
# next 4 tokens in a zero-width lookahead, so matches can overlap.
# ~2× faster than explode(positions) → slice → array_join (measured at
# sf0.1: 0.41s vs 0.79s for the hash subtree) because no per-position
# token array is materialized. Equivalence with the token-slice form
# holds for single-space-separated text — exactly this corpus's
# declared tokenization (split on ' ', see _TOKENS); the
# production-scale operator (operators/dedup.shingle) keeps the
# general token-array form.
_SHINGLE_RE = r"(?:^| )(?=((?:\S+ ){" + str(_SHINGLE_N - 1) + r"}\S+))"


def _shingle_strings(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) with duplicates, one row per 4-gram position.

    The pattern rides in as a lit() Column — inside a SQL string
    literal Spark would eat the backslashes (CLAUDE.md rule 4).
    """
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
        ).alias("shingle"),
    )


# 64-bit grouping key: join/distinct on an 8-byte long instead of a
# ~30-byte string (cheaper shuffle + comparisons). xxhash64 — codegen,
# no hex/conv detour — is safe here because every consumer uses the
# key for GROUPING ONLY (never for value-dependent selection like
# minhash/winnow minima, which must stay md5 to match their oracles).
# Collision odds at 64 bits are ~n²/2^65 — negligible, and the DuckDB
# oracle (which keeps string keys) would surface one instantly as a
# hash mismatch.
def _shingle_key(col: str) -> F.Column:
    return F.xxhash64(F.col(col))


def _size_gated_broadcast(df: DataFrame, src: DataFrame) -> DataFrame:
    """Broadcast ``df`` only while its lineage SOURCE is known small
    (the tfidf ``_join_df_side`` rule, VERDICT r7/r11): per-doc frames
    (shingle-set sizes, component labels) are doc-count-sized — fine
    at sf0.1, an executor OOM when the corpus is 100 TB. Gate on the
    measured source bytes carried by ``spread()``; past the threshold
    return the frame un-hinted and let Catalyst/AQE pick the join from
    its own runtime stats."""
    from .sampling import _DF_BCAST_MAX_SRC_BYTES

    src_bytes = getattr(src, "_spread_src_bytes", None)
    if src_bytes is not None and src_bytes <= _DF_BCAST_MAX_SRC_BYTES:
        return F.broadcast(df)
    return df


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + {_SHINGLE_N} - 1], 'string_agg', ' ')
                   AS shingle
        FROM toks, UNNEST(generate_series(1, len(tokens) - {_SHINGLE_N} + 1)) AS t(i)
    ),
    doc_sizes AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY 1
    ),
    rare AS (
        SELECT shingle FROM shingles GROUP BY 1
        HAVING COUNT(*) <= {_MAX_SHINGLE_DF}
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shingles a
        JOIN rare r ON a.shingle = r.shingle
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, p.n_common,
           CAST(p.n_common AS DOUBLE)
               / (sa.n_shingles + sb.n_shingles - p.n_common) AS jaccard
    FROM pairs p
    JOIN doc_sizes sa ON p.doc_a = sa.doc_id
    JOIN doc_sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.n_common AS DOUBLE)
              / (sa.n_shingles + sb.n_shingles - p.n_common) >= {_JACCARD_MIN}
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-4-gram Jaccard ≥ 0.5.

    Pipeline: shingle (narrow explode) → distinct per doc → drop
    stop-shingles with document frequency > {_MAX_SHINGLE_DF} (caps the
    worst-case pair fan-out of a hot shingle — without this, one
    shingle shared by k docs emits k² pairs and a head shingle at corpus
    scale is a guaranteed straggler) → self-join on shingle → count
    common → Jaccard from per-doc shingle-set sizes. Intersection
    counting over rare shingles only is the exact filtered semantics in
    both engines.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # Per-doc DISTINCT shingle arrays stay narrow (array_distinct — no
    # global DISTINCT shuffle); shingle extraction is the one-pass
    # regex scan (_SHINGLE_RE). All downstream grouping/joining runs
    # on the 64-bit xxhash64 key (_shingle_key): the self-join
    # shuffles 8-byte longs, not shingle strings. Distinct-on-strings
    # equals distinct-on-keys absent 64-bit collisions (see
    # _shingle_key note).
    sh_arr = _materialize(
        docs.select(
            "doc_id",
            F.array_distinct(
                F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
            ).alias("shingles"),
        )
    )
    doc_sizes = sh_arr.select(
        "doc_id", F.size("shingles").alias("n_shingles")
    )
    shingles = sh_arr.select(
        "doc_id", F.explode("shingles").alias("shingle")
    ).select("doc_id", _shingle_key("shingle").alias("sk"))
    # stop-shingle cap + pair generation fused into one grouped pass
    # (_cooccur_pairs): a shingle's doc list IS its document frequency,
    # so the ≤ {_MAX_SHINGLE_DF} filter and the a⋈b self-join collapse
    # into collect + in-row combinations.
    pairs = (
        _cooccur_pairs(shingles, "sk", max_df=_MAX_SHINGLE_DF)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = doc_sizes.alias("sa")
    sb = doc_sizes.alias("sb")
    jac = (
        pairs.join(
            _size_gated_broadcast(sa, docs), F.col("doc_a") == F.col("sa.doc_id")
        )
        .join(
            _size_gated_broadcast(sb, docs), F.col("doc_b") == F.col("sb.doc_id")
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= _JACCARD_MIN)


# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs (md5-based, oracle-checkable)
# ---------------------------------------------------------------------------
#
# ONE md5 per shingle; the 12 signature functions are affine remixes
# (a_i·h + b_i) mod p of that single hash — ~12× fewer md5 evaluations
# than hashing (seed, shingle) per seed, identical arithmetic in
# DuckDB. h is the md5's first 8 hex chars (32-bit), a_i,b_i < 2^31,
# p prime > 2^32, so a_i·h + b_i peaks at ~9.21e18 < 2^63-1: every
# intermediate stays in signed-BIGINT range in both engines.

_N_HASHES = 12
_BAND_SIZE = 3  # → 4 bands
_MINHASH_P = 4294967311  # smallest prime > 2^32
# fixed (a, b) pairs (seeded draw, committed as literals — no runtime RNG)
_MINHASH_COEFFS = [
    (2128164061, 797605564), (596987483, 1944694864),
    (116450323, 582439801), (430979122, 468068949),
    (1406942088, 1848070633), (1172698796, 805278811),
    (2143289124, 1337851497), (252657890, 856063681),
    (1696544698, 461793307), (794664036, 1716958479),
    (527406851, 213165048), (1903391910, 175932789),
]

_SQL_SIG_COLS = ",\n               ".join(
    f"MIN(({a} * h + {b}) % {_MINHASH_P}) AS m{i}"
    for i, (a, b) in enumerate(_MINHASH_COEFFS)
)
_SQL_BAND_KEYS = "\n                    ".join(
    f"WHEN {band} THEN md5(m{band * _BAND_SIZE}::VARCHAR || '|' || "
    f"m{band * _BAND_SIZE + 1}::VARCHAR || '|' || "
    f"m{band * _BAND_SIZE + 2}::VARCHAR)"
    for band in range(_N_HASHES // _BAND_SIZE)
)


@register(
    "minhash_lsh_candidates",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + {_SHINGLE_N} - 1], 'string_agg', ' ')
                   AS shingle
        FROM toks, UNNEST(generate_series(1, len(tokens) - {_SHINGLE_N} + 1)) AS t(i)
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h
        FROM shingles
    ),
    sigs AS (
        SELECT doc_id,
               {_SQL_SIG_COLS}
        FROM hashed
        GROUP BY 1
    ),
    bands AS (
        SELECT doc_id, band,
               CASE band
                    {_SQL_BAND_KEYS}
               END AS band_key
        FROM sigs, UNNEST(generate_series(0, {_N_HASHES // _BAND_SIZE - 1})) AS t(band)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(DISTINCT a.band) AS n_shared_bands
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures ({_N_HASHES} affine hashes over one md5 per
    shingle) + LSH banding (bands of {_BAND_SIZE}) → candidate
    near-dup pairs.

    shingle → h = md5(shingle)[0:8] as 32-bit int → 12 signature mins
    in ONE groupBy(doc_id) with 12 min-aggregate columns (map-side
    combined; no seed explode, no per-seed shuffle) → band key = md5
    of the band's signature triple → docs sharing a band key are
    candidates. Linear-time scale path for near-dup at 100 TB: cost is
    O(docs × shingles) hashing + a banded join on uniformly-hashed
    keys, never O(docs²). md5 keeps the oracle bit-identical; the
    production operator (operators/dedup.py) uses xxhash64.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # ZERO-SHUFFLE signature build: shingles come from the one-pass
    # regex scan (_SHINGLE_RE) and stay an in-row array; each
    # signature is array_min over the affine remix of the per-shingle
    # hash — no explode, no doc-keyed aggregation, nothing exchanges
    # until the band self-join. The in-lambda md5 runs interpreted,
    # but one hash per shingle in-row beats the explode + groupBy(doc)
    # round trip it replaces (see winnow_fingerprint_pairs note).
    # Duplicate shingles cannot change a MIN, so no distinct pass
    # (the oracle's DISTINCT CTE is equivalent for the same reason);
    # shingle-less docs are dropped to match the oracle's empty CTE.
    hs = docs.select(
        "doc_id",
        F.transform(
            F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1)),
            lambda sh: F.conv(
                F.substring(F.md5(sh.cast("binary")), 1, 8), 16, 10
            ).cast("long"),
        ).alias("hs"),
    ).filter(F.size("hs") > 0)
    sigs = hs.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {_MINHASH_P}L))"
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(_MINHASH_COEFFS)
        ],
    )
    band_key_exprs = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"m{band * _BAND_SIZE + j}").cast("string")
                    for j in range(_BAND_SIZE)
                ],
            ).cast("binary")
        ).alias(f"bk{band}")
        for band in range(_N_HASHES // _BAND_SIZE)
    ]
    bands = sigs.select("doc_id", *band_key_exprs).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.col(f"bk{band}").alias("band_key"),
                    )
                    for band in range(_N_HASHES // _BAND_SIZE)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key"))
    # both self-join sides consume `bands` — materialize the narrow
    # hash chain once (4 small rows per doc) instead of twice
    bands = _materialize(bands)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.countDistinct("a.band").alias("n_shared_bands"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# token histogram (corpus-level token counting)
# ---------------------------------------------------------------------------


@register(
    "token_histogram",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    )
    SELECT token,
           COUNT(*)                 AS n_occurrences,
           COUNT(DISTINCT doc_id)   AS doc_frequency
    FROM toks
    GROUP BY 1
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
)
def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token counting: explode → count + document frequency →
    top-100. The vocabulary-statistics primitive behind BPE corpus
    prep; one shuffle on the token key."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_frequency"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# count-min-sketch heavy hitters (frequency sketch, within-bound gated)
# ---------------------------------------------------------------------------

_CMS_SLACK = 8  # accepted excess = max(_CMS_SLACK * N / W, 2)


@register(
    "cms_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM toks GROUP BY 1
    )
    SELECT token, n_occurrences, 1 AS within_cms_bound
    FROM counts
    ORDER BY n_occurrences DESC, token
    LIMIT 25
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a count-min sketch, gated by the
    approx_monthly_stats device: the emitted values are the EXACT
    top-25 token counts (total order: count desc, token), and the
    sketch only decides ``within_cms_bound`` — the D·W-counter CMS
    estimate must sit in [exact, exact + max(8·N/W, 2)] for every
    heavy hitter. A CMS never underestimates, and the excess of a
    min-of-D probe exceeds t·N/W with probability ≤ t^−D, so the
    8×-expectation envelope holds with margin at every gate scale
    while W = 1024 stays small enough that collisions genuinely
    occur (the flag tests the sketch, not a vacuous bound).

    Scale shape: one shuffle on the token key for the exact counts
    (map-side combined); the sketch builds from the DISTINCT-key
    counts table (D× |vocab| rows, not D× corpus), collapses to a
    one-row broadcast map, and probes are D unrolled element_at
    lookups on the 25-row result. At 100 TB the CMS itself is the
    artifact — D·W counters regardless of vocabulary width, mergeable
    across splits by adding counters — and the exact side restricts
    to candidate keys instead of the full vocabulary.
    """
    from ..operators.sketch import CMS_WIDTH, cms_build, cms_estimate

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(F.expr(_TOKENS)).alias("token"))
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        # three consumers: top-k, sketch build, total-weight scalar
        .localCheckpoint(eager=False)
    )
    cms = cms_build(counts, "token", "n_occurrences")
    n_total = counts.agg(F.sum("n_occurrences").alias("__n"))
    topk = (
        counts.orderBy(F.desc("n_occurrences"), "token")
        .limit(25)
        .crossJoin(F.broadcast(n_total))
    )
    probed = cms_estimate(topk, "token", cms)
    bound = F.expr(
        f"greatest(div({_CMS_SLACK} * __n, {CMS_WIDTH}), 2L)"
    )
    return probed.select(
        "token",
        "n_occurrences",
        (
            (F.col("cms_est") >= F.col("n_occurrences"))
            & (F.col("cms_est") - F.col("n_occurrences") <= bound)
        )
        .cast("int")
        .alias("within_cms_bound"),
    ).orderBy(F.desc("n_occurrences"), "token")


# ---------------------------------------------------------------------------
# CMS-driven hot-key detection + selective salting (adaptive skew path)
# ---------------------------------------------------------------------------
#
# The testdata keys are deliberately uniform, so the gate synthesizes
# a skewed key in-plan (the cohort/temperature synthesis precedent):
# half the corpus lands on 'hot', the rest spreads over 97 cold keys
# (~0.5% each). Detection threshold 10% sits an order of magnitude
# from both sides — the CMS overestimate envelope (~N/W ≈ 0.1% per
# probe) cannot push a cold key across, and a CMS never
# underestimates, so 'hot' cannot be missed.

_HOT_KEY_SPARK = (
    "CASE WHEN doc_id % 10 < 5 THEN 'hot' "
    "ELSE concat('k', CAST(doc_id % 97 AS STRING)) END"
)
_HOT_KEY_SQL = (
    "CASE WHEN doc_id % 10 < 5 THEN 'hot' "
    "ELSE 'k' || CAST(doc_id % 97 AS VARCHAR) END"
)
_HOT_SHARE_PERMILLE = 100


@register(
    "cms_hot_key_agg",
    f"""
    WITH keyed AS (
        SELECT {_HOT_KEY_SQL} AS key, doc_id FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keyed),
    agg AS (
        SELECT key,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM keyed GROUP BY 1
    )
    SELECT key, n_rows, id_sum,
           CASE WHEN 1000 * n_rows >= {_HOT_SHARE_PERMILLE} * (SELECT n FROM tot)
                THEN 1 ELSE 0 END AS was_salted
    FROM agg
    ORDER BY key
    """,
)
def cms_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adaptive skew path end to end: a count-min sketch detects
    which keys are hot (``detect_hot_keys``), and the aggregation
    salts ONLY those (``selective_salted_agg``) — the cold long tail
    aggregates in one hop while the hot key spreads over 16 phase-1
    reducers. The emitted aggregates are exact regardless of salting
    (two-phase sum/count), so the oracle pins the DETECTION decision:
    ``was_salted`` must equal the exact share ≥ 10% predicate —
    a sketch false positive or miss flips the flag and fails the hash.

    Scale shape: the sketch pass map-side combines to ≤ D·W rows per
    task (no per-key reducer concentration), the distinct-key probe is
    a map-side-combining hash distinct, and the hot set broadcasts
    into the salting decision. This is what replaces a blind
    n_salts-everywhere plan at 100 TB: the tail's shuffle volume is
    unchanged while the hot keys get the full replication budget.
    """
    from ..operators.skew import detect_hot_keys, selective_salted_agg

    docs = spread(load_table(spark, sf_dir, "documents"))
    keyed = docs.select(
        F.expr(_HOT_KEY_SPARK).alias("key"), "doc_id"
    # two sketch-pass consumers + the aggregation itself (rule 12)
    ).localCheckpoint(eager=False)
    hot = detect_hot_keys(
        keyed, "key", min_share_permille=_HOT_SHARE_PERMILLE
    )
    out = selective_salted_agg(
        keyed,
        "key",
        {
            "n_rows": F.count(F.lit(1)),
            "id_sum": F.sum("doc_id"),
        },
        hot_keys=hot,
    )
    return out.select(
        "key",
        F.col("n_rows").cast("long"),
        F.col("id_sum").cast("long"),
        "was_salted",
    ).orderBy("key")


# ---------------------------------------------------------------------------
# selective salted JOIN (the aggregation gate's join sibling — VERDICT
# r7 ask #5: big×big equi-join where ONLY detected-hot keys fan out)
# ---------------------------------------------------------------------------
#
# Same in-plan 50%-hot key device as cms_hot_key_agg; the dim side is
# synthesized from the distinct keys with a deterministic attribute
# and deliberately MISSING every key whose numeric suffix % 7 == 3, so
# the gate pins left-join multiplicity AND the NULL path through the
# salted plan. The suffix parse is guarded by a CASE (the 'hot' key
# has no numeric suffix; SQL gives no short-circuit guarantee across
# OR, so the cast must be unreachable on that row in BOTH engines).

_DIM_SUFFIX = (
    "CASE WHEN key = 'hot' THEN NULL "
    "ELSE CAST(substr(key, 2, 10) AS BIGINT) END"
)
_DIM_ATTR = f"length(key) * 100 + coalesce(({_DIM_SUFFIX}) % 50, 7)"
_DIM_KEEP = f"key = 'hot' OR ({_DIM_SUFFIX}) % 7 != 3"


@register(
    "salted_hot_join",
    f"""
    WITH keyed AS (
        SELECT {_HOT_KEY_SQL} AS key, doc_id FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keyed),
    dim AS (
        SELECT key, CAST({_DIM_ATTR} AS BIGINT) AS attr
        FROM (SELECT DISTINCT key FROM keyed)
        WHERE {_DIM_KEEP}
    ),
    agg AS (
        SELECT k.key,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(k.doc_id) AS BIGINT) AS id_sum,
               MIN(d.attr) AS attr
        FROM keyed k LEFT JOIN dim d USING (key)
        GROUP BY 1
    )
    SELECT key, n_rows, id_sum, attr,
           CASE WHEN 1000 * n_rows
                     >= {_HOT_SHARE_PERMILLE} * (SELECT n FROM tot)
                THEN 1 ELSE 0 END AS was_salted
    FROM agg
    ORDER BY key
    """,
)
def salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adaptive skew JOIN path end to end: a count-min sketch
    detects the hot keys (``detect_hot_keys``) and the fact⋈dim join
    salts ONLY those (``operators/skew.selective_salted_join``) — hot
    facts spread over 16 join partitions with the dim row replicated
    to meet them, while the cold tail joins unsalted (salt 0 both
    sides, shuffle volume unchanged). The joined values are exact
    regardless of salting, so the oracle pins the plain-join relation
    (left multiplicity + NULL attrs for the missing-dim keys) AND the
    detection decision via ``was_salted`` == the exact ≥ 10% share
    predicate (the cms_hot_key_agg contract)."""
    from ..operators.skew import detect_hot_keys, selective_salted_join

    docs = spread(load_table(spark, sf_dir, "documents"))
    keyed = docs.select(
        F.expr(_HOT_KEY_SPARK).alias("key"), "doc_id"
    # sketch passes + the join itself consume this subtree (rule 12)
    ).localCheckpoint(eager=False)
    dim = (
        keyed.select("key")
        .distinct()
        .filter(F.expr(_DIM_KEEP))
        .select("key", F.expr(_DIM_ATTR).cast("long").alias("attr"))
    )
    hot = detect_hot_keys(
        keyed, "key", min_share_permille=_HOT_SHARE_PERMILLE
    ).localCheckpoint(eager=False)  # salting decision + the flag join
    joined = selective_salted_join(
        keyed, dim, "key", hot, n_salts=16, how="left"
    )
    agg = joined.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.min("attr").cast("long").alias("attr"),
    )
    flag = F.broadcast(
        hot.select("key").withColumn("__hot", F.lit(1))
    )
    return (
        agg.join(flag, "key", "left")
        .select(
            "key",
            "n_rows",
            "id_sum",
            "attr",
            F.when(F.col("__hot").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("was_salted"),
        )
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (md5-based, oracle-checked)
# ---------------------------------------------------------------------------
#
# Same pigeonhole-banding semantics as the production operator
# (operators/dedup.py simhash64 + simhash_near_pairs: 64-bit
# fingerprint, hamming ≤ 3 → 4 bands of 16 bits), with the token hash
# swapped from xxhash64 (JVM intrinsic, no DuckDB equivalent) to md5 —
# the first 16 hex chars parsed as two 32-bit halves, so every bit
# operation stays in non-negative BIGINT range in both engines. The
# fingerprint is likewise carried as (fp_hi, fp_lo) 32-bit halves:
# hamming = bit_count(xor(lo)) + bit_count(xor(hi)).

_SIMHASH_MAX_HAMMING = 3  # → 4 bands of 16 bits


@register(
    "simhash_near_dups",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    tok_counts AS (
        SELECT doc_id, token, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
    ),
    hashed AS (
        SELECT doc_id, cnt,
               ('0x' || substring(md5(token), 1, 8))::BIGINT AS hi,
               ('0x' || substring(md5(token), 9, 8))::BIGINT AS lo
        FROM tok_counts
    ),
    bits AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN (CASE WHEN pos < 32 THEN (lo >> pos) & 1
                              ELSE (hi >> (pos - 32)) & 1 END) = 1
                        THEN cnt ELSE -cnt END) AS s
        FROM hashed, UNNEST(generate_series(0, 63)) AS t(pos)
        GROUP BY 1, 2
    ),
    fps AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 AND pos < 32
                             THEN (1::BIGINT << pos) ELSE 0 END) AS BIGINT) AS fp_lo,
               CAST(SUM(CASE WHEN s > 0 AND pos >= 32
                             THEN (1::BIGINT << (pos - 32)) ELSE 0 END) AS BIGINT) AS fp_hi
        FROM bits GROUP BY 1
    ),
    banded AS (
        SELECT doc_id, fp_lo, fp_hi, band,
               CASE WHEN band = 0 THEN fp_lo & 65535
                    WHEN band = 1 THEN (fp_lo >> 16) & 65535
                    WHEN band = 2 THEN fp_hi & 65535
                    ELSE (fp_hi >> 16) & 65535 END AS band_val
        FROM fps, UNNEST(generate_series(0, 3)) AS t(band)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.fp_lo AS la, a.fp_hi AS ha, b.fp_lo AS lb, b.fp_hi AS hb
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
                     AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT)
               AS hamming
    FROM pairs
    WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb))
              <= {_SIMHASH_MAX_HAMMING}
    ORDER BY 1, 2
    """,
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs (hamming ≤ 3) over documents.

    explode(tokens) → per-(doc, token) counts → 64 bit-position votes
    (+cnt when the token hash's bit is set, −cnt otherwise) → sign
    vector = fingerprint → pigeonhole banding (4 bands of 16 bits: any
    pair within hamming 3 must agree on ≥1 band) → verify with
    bit_count(xor). All JVM-side integer arithmetic; candidate
    generation is linear in corpus size. The production twin
    (operators/dedup.py, xxhash64 single-call hashing) is ~4× cheaper
    and property-tested against planted near-dups.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # Vote per token OCCURRENCE (±1), not per distinct (doc, token)
    # with ±cnt: the sums are identical and no pre-count is needed.
    #
    # The full 64-bit token hash rides in ONE signed long (conv base
    # -10 keeps the ≥2^63 md5 prefixes in range; the bit pattern is
    # what matters). bit p of h = lo bit p (p<32) / hi bit p−32 (p≥32),
    # matching the oracle's two-half layout.
    #
    # ZERO-SHUFFLE votes (r4): hash the token array in-row (one
    # interpreted md5 per occurrence — rule-10 nuance: cheaper than
    # the explode → codegen-hash → groupBy(doc) round trip it
    # replaces; A/B at sf0.1: 0.33s vs 0.85s for the vote subtree),
    # then fold the 16 SWAR lane sums per doc with aggregate().
    # Nothing exchanges until the band self-join. The 16 folds are
    # single-reference consumers of the materialized hs array (the
    # checkpoint guards against projection collapse re-hashing).
    #
    # SWAR-packed vote counting: 16 lane-sum columns instead of 64
    # per-bit CASE sums. Lane word w_j accumulates four 16-bit
    # counters — the popcounts of hash bits j, j+16, j+32, j+48 —
    # because (h >>> j) & 0x0001000100010001 drops exactly those bits
    # into independent lanes. Sound while every doc has < 65536 tokens
    # (this corpus: ~54 avg; the xxhash64 production twin in
    # operators/dedup.py has no such cap). The ±1 vote sum is then
    # s_p = 2·c_p − n, so "s_p > 0" ⟺ "2·c_p > n" — measured 2×
    # cheaper than the branchy form, bit-identical fingerprints.
    _LANES = 0x0001000100010001
    hs = docs.select(
        "doc_id",
        F.transform(
            F.expr(_TOKENS),
            lambda t: F.conv(
                F.substring(F.md5(t.cast("binary")), 1, 16), 16, -10
            ).cast("long"),
        ).alias("hs"),
    ).localCheckpoint(eager=False)
    sums = hs.select(
        "doc_id",
        # the SWAR lane bound is ENFORCED in-plan (the segment-dedup
        # ord-guard pattern): a ≥ 65536-token doc would silently
        # overflow its 16-bit vote counters into the neighboring lane;
        # assert_true fails the job loudly instead. No-op on legal
        # rows (returns NULL → coalesce 0).
        (
            F.size("hs")
            + F.coalesce(
                F.assert_true(
                    F.size("hs") < 65536,
                    F.lit(
                        "simhash gate: document over 65535 tokens "
                        "overflows the 16-bit SWAR vote lanes; use the "
                        "uncapped production twin (operators/dedup.py)"
                    ),
                ).cast("int"),
                F.lit(0),
            )
        ).alias("n"),
        *[
            F.expr(
                f"aggregate(hs, 0L, (acc, h) -> "
                f"acc + (shiftrightunsigned(h, {j}) & {_LANES}L))"
            ).alias(f"w{j}")
            for j in range(16)
        ],
    ).filter(F.col("n") > 0)

    def _fp_bit(p: int, shift: int) -> str:
        cnt = f"(w{p % 16} >> {16 * (p // 16)}) & 65535"
        return (
            f"(CASE WHEN 2 * ({cnt}) > n THEN CAST({1 << shift} AS BIGINT) "
            f"ELSE 0L END)"
        )

    fps = sums.select(
        "doc_id",
        F.expr(" + ".join(_fp_bit(p, p) for p in range(32))).alias("fp_lo"),
        F.expr(
            " + ".join(_fp_bit(p, p - 32) for p in range(32, 64))
        ).alias("fp_hi"),
    )
    banded = _materialize(
        fps.select(
            "doc_id",
            "fp_lo",
            "fp_hi",
            F.explode(F.expr("sequence(0, 3)")).alias("band"),
        ).withColumn(
            "band_val",
            F.expr(
                "CASE WHEN band = 0 THEN fp_lo & 65535 "
                "WHEN band = 1 THEN (fp_lo >> 16) & 65535 "
                "WHEN band = 2 THEN fp_hi & 65535 "
                "ELSE (fp_hi >> 16) & 65535 END"
            ),
        )
        # both self-join sides consume this subtree — materialize the
        # whole vote/fingerprint pipeline once (rule: exchange reuse
        # does not fire across differently-shaped consumers)
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.fp_lo").alias("la"),
            F.col("a.fp_hi").alias("ha"),
            F.col("b.fp_lo").alias("lb"),
            F.col("b.fp_hi").alias("hb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.expr("bit_count(la ^ lb) + bit_count(ha ^ hb)").cast("long"),
        )
        .filter(F.col("hamming") <= _SIMHASH_MAX_HAMMING)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# winnowing document fingerprints (rolling-hash k-gram minima)
# ---------------------------------------------------------------------------
#
# The classic document-fingerprinting scheme (Schleimer/Wilkerson/
# Aiken winnowing, SIGMOD'03): hash every token k-gram, slide a window
# of w consecutive hashes, keep each window's minimum — a deterministic
# ~2/(w+1) sample of the k-gram hashes that guarantees any shared run
# of length >= k + w - 1 tokens contributes a shared fingerprint.
# Entirely narrow per document (arrays + folds); the only shuffle is
# the fingerprint join. Guard note: Spark's sequence(1, 0) counts DOWN
# ([1,0]) while DuckDB's generate_series(1, 0) is empty — short docs
# must be guarded with if() on the Spark side.

_WIN_K = 3  # token k-grams
_WIN_W = 4  # winnowing window (selects ~2/(w+1) of hashes)
_WIN_MIN_SHARED = 2  # candidate pairs share at least this many prints
_WIN_MAX_FP_DF = 40  # drop fingerprints present in more docs
# one-pass overlapping k-gram extraction (same device as _SHINGLE_RE)
_WIN_KGRAM_RE = r"(?:^| )(?=((?:\S+ ){" + str(_WIN_K - 1) + r"}\S+))"


@register(
    "winnow_fingerprint_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
    ),
    karr AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, len(tokens) - {_WIN_K} + 1),
                   i -> ('0x' || substring(md5(
                           list_aggregate(tokens[i : i + {_WIN_K} - 1],
                                          'string_agg', ' ')), 1, 8))::BIGINT
               ) AS hs
        FROM toks
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(hs) - {_WIN_W} + 1),
                   j -> list_min(hs[j : j + {_WIN_W} - 1])
               )) AS prints
        FROM karr
    ),
    exploded AS (
        SELECT doc_id, unnest(prints) AS fp FROM fps
    ),
    rare AS (
        SELECT fp FROM exploded GROUP BY 1
        HAVING COUNT(*) <= {_WIN_MAX_FP_DF}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_shared
    FROM exploded a
    JOIN rare r ON a.fp = r.fp
    JOIN exploded b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_WIN_MIN_SHARED}
    ORDER BY 1, 2
    """,
)
def winnow_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints → candidate pairs sharing ≥{_WIN_MIN_SHARED}.

    Two scale devices beyond the textbook scheme:

    - k-gram hashing runs in WHOLE-STAGE CODEGEN: k-grams come from the
      one-pass regex scan (posexplode keeps the position), md5 is a
      top-level projection, and the ordered hash array is rebuilt with
      one uniform groupBy(doc_id). The previous form hashed inside a
      transform() lambda — interpreted, ~minutes at sf0.1 on the
      single-split documents file (CLAUDE.md rule 10).
    - stop-fingerprint cap (document frequency ≤ {_WIN_MAX_FP_DF}):
      winnowing's min-selection is biased toward globally SMALL hash
      values, so the smallest k-gram hashes become fingerprints of
      nearly every doc containing them — a hot fingerprint shared by
      d docs emits d² candidate pairs (measured: join never finished
      at sf0.1). Ubiquitous fingerprints carry no discriminative
      signal; dropping them is the same device as the Jaccard query's
      stop-shingle cap, mirrored exactly in the oracle.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    k, w = _WIN_K, _WIN_W
    # The ordered hash array is built IN-ROW: regexp_extract_all
    # already yields k-grams in document order, and md5 inside the
    # transform lambda — though interpreted, not codegen'd — measures
    # 0.27s at sf0.1 vs 0.73s for the explode → codegen-hash →
    # collect_list+sort_array round trip it replaces (the shuffle and
    # array rebuild cost more than interpretation; rule 10's "minutes"
    # figure was the old O(n²) token-slice assembly, not hashing).
    # MUST materialize before the sliding-min consumer: the fps
    # expression references hs once per window position (slice), and
    # projection collapse would inline the md5-transform into every
    # reference — measured 30s (O(positions × k-grams) re-hashing)
    # without the boundary, 1.2s with it.
    karr = docs.select(
        "doc_id",
        F.transform(
            F.regexp_extract_all("text", F.lit(_WIN_KGRAM_RE), F.lit(1)),
            lambda kg: F.conv(
                F.substring(F.md5(kg.cast("binary")), 1, 8), 16, 10
            ).cast("long"),
        ).alias("hs"),
    ).localCheckpoint(eager=False)
    # Sliding-window min by LOG-DOUBLING instead of a per-position
    # slice+array_min: each zip_with of the running array with a
    # shifted copy doubles the covered window (m_p[j] = min of
    # hs[j..j+p-1]), and a final shift of w-p closes a non-power-of-2
    # w. O(n log w) cheap `least` comparisons and log w array
    # allocations per doc, vs O(n·w) with an O(w) slice COPY per
    # position (measured 2.0s → 1.5s at sf0.1 for the gate). zip_with
    # pads the shorter side with nulls and `least` skips them, so tail
    # positions hold truncated-window minima — the prints slice stops
    # at n-w+1 and never reads them. hs references below stay safe
    # from projection-collapse re-hashing because karr is
    # materialized (the measured 30s trap — CLAUDE.md rule 10).
    win_min = "hs"
    p = 1
    while p * 2 <= w:
        win_min = (
            f"zip_with({win_min}, slice({win_min}, {p + 1}, size(hs)),"
            " (a, b) -> least(a, b))"
        )
        p *= 2
    if p < w:
        win_min = (
            f"zip_with({win_min}, slice({win_min}, {w - p + 1}, size(hs)),"
            " (a, b) -> least(a, b))"
        )
    fps = karr.select(
        "doc_id",
        F.expr(
            f"""
            if(size(hs) >= {w},
               array_distinct(slice({win_min}, 1, size(hs) - {w} + 1)),
               cast(array() as array<bigint>))
            """
        ).alias("prints"),
    )
    exploded = fps.select("doc_id", F.explode("prints").alias("fp"))
    # stop-fingerprint cap + self-join fused into one grouped pass
    # (see _cooccur_pairs) — with a single consumer left, the explode
    # subtree no longer needs a checkpoint.
    return (
        _cooccur_pairs(exploded, "fp", max_df=_WIN_MAX_FP_DF)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
        # r13 psort A/B: 1.13 -> 1.02 s at sf0.1 (rule 30)
        .transform(presentation_sort, "doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# BPE-style regex pre-tokenizer statistics
# ---------------------------------------------------------------------------
#
# token_histogram counts whitespace tokens; BPE corpus prep
# pre-tokenizes with a regex that splits letter runs, digit runs, and
# punctuation runs (the GPT-2 pre-tokenizer shape, simplified to the
# subset whose semantics are identical in Java regex and RE2: literal
# char-class ranges, no unicode property classes). À-ỹ covers the
# precomposed Vietnamese range.

_PRETOK_RE = r"[A-Za-zÀ-ỹ]+|[0-9]+|[^A-Za-z0-9À-ỹ\s]+"


@register(
    "regex_token_stats",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '{_PRETOK_RE}')) AS tok
        FROM documents
    ),
    classed AS (
        SELECT doc_id, tok,
               CASE WHEN regexp_full_match(tok, '[0-9]+') THEN 'digits'
                    WHEN regexp_full_match(tok, '[A-Za-zÀ-ỹ]+') THEN 'letters'
                    ELSE 'punct' END AS token_class
        FROM toks
    )
    SELECT token_class,
           COUNT(*)                            AS n_tokens,
           COUNT(DISTINCT tok)                 AS n_distinct,
           COUNT(DISTINCT doc_id)              AS n_docs,
           CAST(SUM(len(tok)) AS BIGINT)       AS total_chars,
           CAST(SUM(len(tok)) AS BIGINT) / COUNT(*) AS avg_token_len
    FROM classed
    GROUP BY 1
    ORDER BY 1
    """,
)
def regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics under a BPE-style regex pre-tokenizer:
    letter/digit/punctuation run classes with counts, vocabulary size,
    document frequency, and mean token length.

    regexp_extract_all is a narrow codegen'd op; one shuffle on the
    (class, token) space for the distincts. The char-class-only regex
    subset keeps Java regex (Spark) and RE2 (DuckDB) bit-identical.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # NB: the pattern goes in as a lit() Column — inside a SQL string
    # literal Spark would eat the backslash of \s
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(_PRETOK_RE), F.lit(0))
        ).alias("tok"),
    )
    classed = toks.withColumn(
        "token_class",
        F.when(F.col("tok").rlike("^[0-9]+$"), "digits")
        .when(F.col("tok").rlike("^[A-Za-zÀ-ỹ]+$"), "letters")
        .otherwise("punct"),
    )
    return (
        classed.groupBy("token_class")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.length("tok")).alias("total_chars"),
            (
                F.sum(F.length("tok")).cast("double") / F.count(F.lit(1))
            ).alias("avg_token_len"),
        )
        .orderBy("token_class")
    )


# ---------------------------------------------------------------------------
# near-dup connected components (cluster resolution over the Jaccard graph)
# ---------------------------------------------------------------------------
#
# Candidate pairs are only half of near-dedup: a chain A~B, B~C must
# collapse to ONE keeper (A), not two overlapping pairs. This gate
# resolves the ngram_jaccard_pairs edge set into connected components
# by min-label propagation (operators/dedup.component_min_labels) and
# checks it against a DuckDB recursive-CTE transitive closure.


# Shared DuckDB transitive-closure CTE over the Jaccard near-dup
# graph — ONE builder feeds both the components gate and the
# leakage-safe split gate so their closure semantics cannot
# desynchronize (the _span_oracle_sql precedent).
_COMPONENTS_CTE = f"""toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + {_SHINGLE_N} - 1], 'string_agg', ' ')
                   AS shingle
        FROM toks, UNNEST(generate_series(1, len(tokens) - {_SHINGLE_N} + 1)) AS t(i)
    ),
    doc_sizes AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY 1
    ),
    rare AS (
        SELECT shingle FROM shingles GROUP BY 1
        HAVING COUNT(*) <= {_MAX_SHINGLE_DF}
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shingles a
        JOIN rare r ON a.shingle = r.shingle
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT p.doc_a, p.doc_b
        FROM pairs p
        JOIN doc_sizes sa ON p.doc_a = sa.doc_id
        JOIN doc_sizes sb ON p.doc_b = sb.doc_id
        WHERE CAST(p.n_common AS DOUBLE)
                  / (sa.n_shingles + sb.n_shingles - p.n_common) >= {_JACCARD_MIN}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jac
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM jac
    ),
    nodes AS (
        SELECT DISTINCT src AS id FROM edges
    ),
    reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    labels AS (
        SELECT id, MIN(r) AS component FROM reach GROUP BY 1
    )"""


@register(
    "near_dup_components",
    f"""
    WITH RECURSIVE {_COMPONENTS_CTE}
    SELECT l.id AS doc_id, l.component, (l.id = l.component) AS is_keeper,
           c.n_members
    FROM labels l
    JOIN (SELECT component, COUNT(*) AS n_members FROM labels GROUP BY 1) c
      USING (component)
    ORDER BY 1
    """,
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the Jaccard near-dup graph: every doc in
    any qualifying pair gets its component's min doc_id as label, a
    keeper flag, and the component size.

    Spark side: iterative min-label propagation to a fixpoint
    (operators/dedup.component_min_labels) — per round one join +
    aggregation over the EDGE SET only (LSH/DF-capped, tiny vs the
    corpus), rounds = cluster diameter (near-dup clusters are shallow).
    This is the documented sanctioned driver-loop case (iterative
    algorithm; the loop runs O(diameter) times, data never collects).
    The oracle is a DuckDB recursive-CTE transitive closure — exact
    same fixpoint, declaratively.
    """
    edges = (
        ngram_jaccard_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    )
    from ..operators.dedup import component_min_labels

    labels = component_min_labels(edges)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        labels.join(F.broadcast(sizes), "label")
        .select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("component"),
            (F.col("id") == F.col("label")).alias("is_keeper"),
            "n_members",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# quality-keeper dedup: resolve each near-dup component to its BEST
# copy instead of its first. Every dedup gate so far keeps min-id
# (first arrival) — correct for incremental streams, but a batch
# release pipeline keeps the HIGHEST-QUALITY copy (here: longest text,
# the common heuristic — a truncated mirror loses to the full page),
# ties to min doc_id. Third consumer of the shared _COMPONENTS_CTE
# closure, so the component semantics cannot desynchronize. Scale
# shape: the labels table is edge-bounded; quality joins in from the
# corpus once; one component-keyed aggregate with min_by (no window
# over the corpus).
# ---------------------------------------------------------------------------


@register(
    "quality_keeper_dedup",
    f"""
    WITH RECURSIVE {_COMPONENTS_CTE},
    m AS (
        SELECT l.component, l.id, len(d.text) AS q
        FROM labels l JOIN documents d ON l.id = d.doc_id
    ),
    ranked AS (
        SELECT component, id, q,
               row_number() OVER (
                   PARTITION BY component ORDER BY q DESC, id
               ) AS rn
        FROM m
    )
    SELECT r.component,
           CAST(c.n_members AS BIGINT) AS n_members,
           r.id AS keeper_id,
           CAST(r.q AS BIGINT) AS keeper_len
    FROM ranked r
    JOIN (SELECT component, COUNT(*) AS n_members FROM m GROUP BY 1) c
      USING (component)
    WHERE r.rn = 1
    ORDER BY r.component
    """,
)
def quality_keeper_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup component: the quality keeper — longest text, ties
    to min doc_id — plus the member count (see block comment). The
    keeper pick is an integer-exact min_by over a struct key; the
    oracle re-derives it with a windowed rank over the same closure."""
    from ..operators.dedup import component_min_labels

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.length("text").cast("long").alias("q")
    )
    edges = ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    labels = component_min_labels(edges).withColumnRenamed("id", "doc_id")
    m = labels.join(docs, "doc_id")
    return (
        m.groupBy(F.col("label").alias("component"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.expr("min_by(doc_id, struct(-q, doc_id))").alias("keeper_id"),
            F.max("q").alias("keeper_len"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split (component-keyed assignment)
# ---------------------------------------------------------------------------
#
# A hash split keyed on doc_id (hash_split) leaks: two near-duplicate
# documents hash independently, so eval examples have near-copies in
# train — the contamination every dedup paper warns about and the
# reason production splits assign at the DUPLICATE-GROUP level. This
# gate composes the engine's own primitives into that contract: the
# split key is the near-dup component label (min doc_id of the
# connected component; singleton docs key on themselves), and the
# 80/10/10 assignment is the md5-membership rule on the GROUP key —
# so every member of a component lands in the same split, by
# construction, deterministically, replay-stable.
#
# Scale shape (100 TB): the component labels come from the edge-sized
# pointer-doubling fixpoint (component_min_labels — LSH/DF-capped
# edges, never corpus-sized); docs join the label table which is
# bounded by 2·|edges| rows (only docs IN some pair carry a label —
# broadcast at any realistic dup rate, size-gated otherwise); the
# split decision is a narrow md5 projection. One corpus scan, one
# label join, zero corpus shuffles beyond the presentation sort.

_SPLIT_MB = "('0x' || substring(md5(CAST(group_key AS VARCHAR)), 1, 8))::BIGINT % 10"


@register(
    "leakage_safe_split",
    f"""
    WITH RECURSIVE {_COMPONENTS_CTE},
    assigned AS (
        SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS group_key
        FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
    )
    SELECT doc_id, CAST(group_key AS BIGINT) AS group_key,
           CASE WHEN {_SPLIT_MB} < 8 THEN 'train'
                WHEN {_SPLIT_MB} = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    ORDER BY doc_id
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split: every document's split is decided
    by the md5-membership rule on its near-dup COMPONENT label (min
    doc_id; singletons key on themselves), so near-duplicates can
    never straddle train/val/test — the group-level split assignment
    a training pipeline needs before building eval sets.
    """
    from ..operators.dedup import component_min_labels
    from .sampling import _bucket

    docs_src = spread(load_table(spark, sf_dir, "documents"))
    docs = docs_src.select("doc_id")
    edges = ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    labels = component_min_labels(edges).withColumnRenamed("id", "doc_id")
    # Label table is bounded by 2·|edges| rows, but on a HEAVILY
    # duplicated corpus that is corpus-fraction-sized — a forced
    # broadcast there OOMs executors. Size-gate on the source bytes
    # via the shared helper (review r12: this was the third inline
    # copy of the tfidf _join_df_side rule).
    labels = _size_gated_broadcast(labels, docs_src)
    assigned = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("label", "doc_id").cast("long").alias("group_key"),
    )
    mb = _bucket("group_key", 10)
    return assigned.select(
        "doc_id",
        "group_key",
        F.when(mb < 8, "train").when(mb == 8, "val").otherwise("test").alias(
            "split"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# BPE merge-training statistics: adjacent-pair histogram
# ---------------------------------------------------------------------------

_BPE_TOP = 20


@register(
    "bpe_pair_counts",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    pairs AS (
        SELECT t[i] || ' ' || t[i + 1] AS pair
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs
    GROUP BY 1
    ORDER BY n DESC, pair
    LIMIT {_BPE_TOP}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-symbol pair histogram — the counting step of BPE merge
    training (each round of ``operators/tokenizer.bpe_train`` merges
    the argmax of exactly this statistic). In-row pair construction
    (guarded against Spark's descending ``sequence(1, 0)``), explode,
    one map-side-combined count on the pair key, TakeOrdered top
    {_BPE_TOP} with a total order (count desc, pair asc). Pair keys
    are uniform text — no skew beyond natural head pairs, which the
    partial aggregation collapses before the exchange.
    """
    from ..operators.tokenizer import adjacent_pair_counts

    docs = spread(load_table(spark, sf_dir, "documents"))
    # SAME pair-building/counting code bpe_train iterates — the gate
    # statistic cannot drift from what training actually merges. The
    # (a, b) group key equals the concatenated key here because
    # first-round symbols contain no spaces.
    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    )
    return (
        adjacent_pair_counts(symbols)
        .select(F.concat_ws(" ", "a", "b").alias("pair"), "n")
        .orderBy(F.desc("n"), "pair")
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# BPE encode round trip: the tokenizer INFERENCE path, loss-free
# ---------------------------------------------------------------------------
#
# bpe_pair_counts pins the SQL-expressible half of BPE (the training
# statistic); encoding with a frozen merge table is inherently
# iterative and has no SQL twin, so this gate pins the half an oracle
# CAN check end to end: encoding is exactly invertible. The gate
# trains a merge table on a quarter slice of the corpus (the
# train/serve split — serving docs the trainer never saw), encodes
# EVERY document through the real in-plan encode path, then emits the
# token count and an md5 of the space-rejoined symbol stream. Merged
# symbols are space-joined super-tokens, so a correct encode
# reconstructs the original token stream byte-for-byte and the oracle
# recomputes both columns from the pristine parquet text — any
# dropped / duplicated / reordered / corrupted token anywhere in the
# train→batch→fold pipeline breaks the hash. (What the recon hash
# deliberately does NOT pin is merge COVERAGE — an identity encoder
# would reconstruct too; tests/test_operators.py pins symbol counts
# against the pure-Python min-rank reference encoder for that half.)

_ENC_MERGES = 12


@register(
    "bpe_encode_roundtrip",
    f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok,
           md5(list_aggregate({_SQL_TOKENS}, 'string_agg', ' '))
               AS recon_md5
    FROM documents
    WHERE len({_SQL_TOKENS}) > 0
    ORDER BY doc_id
    """,
)
def bpe_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train {_ENC_MERGES} BPE merges on the doc_id%4==0 quarter of the
    corpus, encode the WHOLE corpus with the frozen table
    (``operators/tokenizer.bpe_encode`` — rank-ordered output-disjoint
    fold batches, zero shuffles), and prove the encode loss-free per
    document: token count and md5 of the reconstructed token stream,
    hash-matched against the pristine text.
    """
    from ..operators.tokenizer import bpe_encode, bpe_train

    docs = spread(load_table(spark, sf_dir, "documents"))
    train_slice = docs.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", "text"
    )
    merges = bpe_train(train_slice, n_merges=_ENC_MERGES, batch_max=4)
    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    ).filter(F.size("s") > 0)
    return _bpe_roundtrip_projection(bpe_encode(symbols, merges))


def _bpe_roundtrip_projection(enc: DataFrame) -> DataFrame:
    """(doc_id, n_tok, recon_md5) from an encoded symbol stream — the
    loss-free-reconstruction projection shared by the gate and the
    serving bench row."""
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort; the in-row merge-fold encode otherwise
    # runs twice under the range sampling pass — shared by the gate
    # AND the serving bench row)
    return presentation_sort(
        enc.select(
            F.col("id").alias("doc_id"),
            F.size(F.expr("split(concat_ws(' ', s), ' ')"))
            .cast("long")
            .alias("n_tok"),
            F.md5(F.concat_ws(" ", "s").cast("binary")).alias("recon_md5"),
        ),
        "doc_id",
    )


def build_bpe_encode_serving(spark: SparkSession, sf_dir: str):
    """bench.py SERVING_BENCH builder (judge ask, r6): the
    bpe_encode_roundtrip gate row times training + encoding together
    because its oracle pins the whole pipeline, but ~3 of its ~4
    seconds are the {_ENC_MERGES}-merge TRAINING loop — a build-time
    cost, not the per-corpus encode a user pays at serving. This
    builder trains the merge table outside the timer (bpe_train is a
    driver loop of eagerly-executed Spark jobs, so the table is fully
    materialized when it returns) and hands back a thunk building the
    encode-everything plan with the FROZEN table — the exact plan the
    gate drains, minus training."""
    from ..operators.tokenizer import bpe_encode, bpe_train

    docs = spread(load_table(spark, sf_dir, "documents"))
    train_slice = docs.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", "text"
    )
    merges = bpe_train(train_slice, n_merges=_ENC_MERGES, batch_max=4)
    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    ).filter(F.size("s") > 0)

    def thunk() -> DataFrame:
        return _bpe_roundtrip_projection(bpe_encode(symbols, merges))

    return thunk


# ---------------------------------------------------------------------------
# unigram-LM (SentencePiece-style) tokenizer round trip — the second
# tokenizer family (operators/unigram.py), same oracle device as BPE
# ---------------------------------------------------------------------------

_UNI_VOCAB = 48
_UNI_ROUNDS = 2
_UNI_MAX_PIECE = 4


@register(
    "unigram_encode_roundtrip",
    f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok,
           md5(list_aggregate({_SQL_TOKENS}, 'string_agg', ' '))
               AS recon_md5
    FROM documents
    WHERE len({_SQL_TOKENS}) > 0
    ORDER BY doc_id
    """,
)
def unigram_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a {_UNI_VOCAB}-piece unigram-LM vocabulary on the
    doc_id%4==0 quarter ({_UNI_ROUNDS} hard-EM rounds, pieces ≤
    {_UNI_MAX_PIECE} chars — operators/unigram.py), Viterbi-encode the
    WHOLE corpus fully in-row (scores ride as a constant-folded map
    literal; zero shuffle), and prove the encode loss-free per
    document: ▁-marked pieces reconstruct the exact token stream,
    hash-matched against the pristine text (the bpe_encode_roundtrip
    device — what the recon hash deliberately does NOT pin is
    segmentation optimality; tests/test_operators.py pins the Viterbi
    DP against an independent pure-Python reference for that half).
    """
    from ..operators.unigram import unigram_encode, unigram_train

    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = unigram_train(
        docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text"),
        vocab_size=_UNI_VOCAB,
        n_rounds=_UNI_ROUNDS,
        max_piece_len=_UNI_MAX_PIECE,
    )
    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    ).filter(F.size("s") > 0)
    enc = unigram_encode(symbols, vocab, _UNI_MAX_PIECE)
    recon = F.expr("trim(replace(concat_ws('', pieces), '▁', ' '))")
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort; the in-row encode otherwise runs twice
    # under the range sampling pass)
    return presentation_sort(
        enc.select("id", recon.alias("recon")).select(
            F.col("id").alias("doc_id"),
            F.size(F.split("recon", " ")).cast("long").alias("n_tok"),
            F.md5(F.col("recon").cast("binary")).alias("recon_md5"),
        ),
        "doc_id",
    )


def build_unigram_encode_serving(spark: SparkSession, sf_dir: str):
    """bench.py SERVING_BENCH builder (the bpe_encode_serve pattern):
    the unigram_encode_roundtrip row times hard-EM training plus the
    corpus encode together because its oracle pins the whole pipeline;
    this builder trains the piece vocabulary outside the timer
    (unigram_train is a driver loop of eagerly-collected Spark jobs)
    and hands back a thunk building the encode-everything projection
    with the FROZEN vocabulary — the per-corpus cost a user pays at
    serving."""
    from ..operators.unigram import unigram_encode, unigram_train

    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = unigram_train(
        docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text"),
        vocab_size=_UNI_VOCAB,
        n_rounds=_UNI_ROUNDS,
        max_piece_len=_UNI_MAX_PIECE,
    )
    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    ).filter(F.size("s") > 0)

    def thunk() -> DataFrame:
        enc = unigram_encode(symbols, vocab, _UNI_MAX_PIECE)
        recon = F.expr("trim(replace(concat_ws('', pieces), '▁', ' '))")
        # same boundary as the gate row (r12 opt)
        return presentation_sort(
            enc.select(
                F.col("id").alias("doc_id"),
                F.size(F.split(recon, " ")).cast("long").alias("n_tok"),
                F.md5(recon.cast("binary")).alias("recon_md5"),
            ),
            "doc_id",
        )

    return thunk


# ---------------------------------------------------------------------------
# skip-gram training pairs (word2vec / fastText data prep): for every
# center token, its contexts within ±window — the (center, context)
# multiset an embedding trainer consumes. Fully in-row pair
# construction (positions × clamped window, center excluded) → explode
# → ONE map-side-combined count; no window function, no self-join, no
# shuffle before the count. Top-k under a total order (n desc, center,
# context). Scale shape: output rows ≤ 2·window·corpus_tokens,
# counting collapses to vocab² keys map-side — the classic word2vec
# data-prep pass.
# ---------------------------------------------------------------------------

_SG_WINDOW = 3
_SG_TOPK = 60


@register(
    "skipgram_pairs",
    f"""
    WITH t AS (
        SELECT {_SQL_TOKENS} AS toks FROM documents
    ),
    pos AS (
        SELECT toks, unnest(generate_series(1, len(toks))) AS i FROM t
    ),
    pairs AS (
        SELECT toks[i] AS center, toks[j.j] AS context
        FROM pos,
             unnest(generate_series(greatest(1, i - {_SG_WINDOW}),
                                    least(len(toks), i + {_SG_WINDOW})))
                 AS j(j)
        WHERE j.j != i
    )
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY center, context
    ORDER BY n DESC, center, context
    LIMIT {_SG_TOPK}
    """,
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair counts within ±{_SG_WINDOW}
    tokens — word2vec's training-data pass. Pairs build IN-ROW (one
    nested transform over positions with a clamped window slice, the
    center excluded), explode once, and collapse in ONE
    map-side-combined count; top-{_SG_TOPK} under a total order."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs_expr = (
        f"flatten(transform(sequence(1, size(toks)), i -> "
        f"transform(filter(sequence(greatest(1, i - {_SG_WINDOW}), "
        f"least(size(toks), i + {_SG_WINDOW})), j -> j != i), "
        f"j -> struct(element_at(toks, i) AS center, "
        f"element_at(toks, j) AS context))))"
    )
    return (
        docs.select(F.expr(_TOKENS).alias("toks"))
        .filter(F.size("toks") > 0)
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .groupBy("p.center", "p.context")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "center", "context")
        .limit(_SG_TOPK)
    )


# ---------------------------------------------------------------------------
# S-stemmer (Harman 1991, "How effective is suffixing?"): the minimal
# published English stemmer search indexes actually use when Porter is
# too aggressive — exactly three ordered rules:
#   1. -ies → -y   unless the word ends -eies / -aies
#   2. -es  → -e   unless the word ends -aes / -ees / -oes
#   3. -s   → ''   unless the word ends -us / -ss
# The whole algorithm is ONE CASE ladder whose text both engines share
# verbatim (endswith() exists in Spark ≥3.5 and DuckDB). The corpus
# vocabulary is mostly unsuffixed, so the gate synthesizes the
# suffixed forms IN-PLAN (token+'s'/+es'/+ies' per doc_id residue,
# plus the exception classes) — every rule and every exception fires
# at every SF.
# ---------------------------------------------------------------------------


def _sstem_case(col: str, fn: str = "endswith") -> str:
    """The three-rule ladder; one SQL text shared by both engines up
    to the suffix-test spelling (Spark ``endswith``, DuckDB
    ``ends_with``)."""
    e = fn
    return f"""CASE
        WHEN {e}({col}, 'ies') AND NOT {e}({col}, 'eies')
             AND NOT {e}({col}, 'aies')
            THEN substring({col}, 1, length({col}) - 3) || 'y'
        WHEN {e}({col}, 'es') AND NOT {e}({col}, 'aes')
             AND NOT {e}({col}, 'ees') AND NOT {e}({col}, 'oes')
            THEN substring({col}, 1, length({col}) - 1)
        WHEN {e}({col}, 's') AND NOT {e}({col}, 'us')
             AND NOT {e}({col}, 'ss')
            THEN substring({col}, 1, length({col}) - 1)
        ELSE {col} END"""


_SSTEM_TOP = 50
# doc_id residue → suffix class appended to each of the doc's tokens:
# the three rules plus one exception from each rule's guard list
_SSTEM_FORMS = (
    (0, "''"), (1, "'s'"), (2, "'es'"), (3, "'ies'"),
    (4, "'ss'"), (5, "'us'"), (6, "'oes'"),
)


def _sstem_variant_sql(tok_expr: str, concat: str) -> str:
    whens = " ".join(
        f"WHEN {r} THEN {tok_expr} {concat} {sfx}"
        for r, sfx in _SSTEM_FORMS
    )
    return f"CASE doc_id % {len(_SSTEM_FORMS)} {whens} END"


@register(
    "sstemmer_token_counts",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    formed AS (
        SELECT {_sstem_variant_sql('tok', '||')} AS w FROM toks
    ),
    stemmed AS (
        SELECT w, {_sstem_case('w', 'ends_with')} AS stem FROM formed
    )
    SELECT stem,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_surface_forms
    FROM stemmed
    GROUP BY stem
    ORDER BY n DESC, stem
    LIMIT {_SSTEM_TOP}
    """,
)
def sstemmer_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harman s-stemmer over the corpus tokens + in-plan synthesized
    suffix classes (see block comment): per stem its occurrence count
    and how many distinct surface forms collapsed into it — the
    conflation statistic a search index tunes stemmers by. Narrow
    CASE-ladder projection + one count; top-{_SSTEM_TOP} total order."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS)).alias("tok")
    )
    formed = toks.select(
        F.expr(_sstem_variant_sql("tok", "||")).alias("w")
    )
    stemmed = formed.select("w", F.expr(_sstem_case("w")).alias("stem"))
    return (
        stemmed.groupBy("stem")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("w").cast("long").alias("n_surface_forms"),
        )
        .orderBy(F.desc("n"), "stem")
        .limit(_SSTEM_TOP)
    )


# ---------------------------------------------------------------------------
# word2vec negative-sampling table: the companion artifact to
# skipgram_pairs — noise-distribution weights ∝ count^(3/4) (Mikolov
# et al.'s smoothing, which damps stopword dominance without flattening
# the distribution). The 3/4 power is realized as COMPOSED EXACT
# integer square roots, w = isqrt(f · isqrt(f)) (f^(1/2)·f^(1/4) at
# integer floors — deterministic in both engines; the temperature
# gate's isqrt correction device applied twice, so a perfect-square
# boundary can never round differently), then ppm shares of the total
# weight by integer floor division. Vocabulary-sized end to end after
# ONE map-side-combined token count.
# ---------------------------------------------------------------------------

_NEG_TOPK = 40


# ONE isqrt-correction builder serves every consumer (review r9) —
# it lives next to its first consumer, the temperature gate
from .sampling import isqrt_steps as _isqrt_steps  # noqa: E402


@register(
    "negative_sampling_table",
    f"""
    WITH f AS (
        SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents)
        GROUP BY 1
    ),
    s1a AS (SELECT token, f, {_isqrt_steps('f', 's1')[0]} FROM f),
    s1b AS (SELECT token, f, {_isqrt_steps('f', 's1')[1]} FROM s1a),
    s1 AS (SELECT token, f, {_isqrt_steps('f', 's1')[2]} FROM s1b),
    wa AS (SELECT token, f, s1, {_isqrt_steps('f * s1', 'w')[0]} FROM s1),
    wb AS (SELECT token, f, s1, {_isqrt_steps('f * s1', 'w')[1]} FROM wa),
    w AS (SELECT token, f, {_isqrt_steps('f * s1', 'w')[2]} FROM wb),
    tot AS (SELECT SUM(w) AS tw FROM w)
    SELECT token, f, w,
           CAST((w * 1000000) // tw AS BIGINT) AS prob_ppm
    FROM w CROSS JOIN tot
    ORDER BY f DESC, token
    LIMIT {_NEG_TOPK}
    """,
)
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per token: corpus frequency f, the integer-exact ^(3/4)
    smoothing weight w = isqrt(f·isqrt(f)), and its ppm share of the
    noise distribution — word2vec's negative-sampling artifact (see
    block comment). Top-{_NEG_TOPK} under a total order."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    f_tab = (
        docs.select(F.explode(F.expr(_TOKENS)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    for n_expr, out in (("f", "s1"), ("f * s1", "w")):
        for step in _isqrt_steps(n_expr, out):
            expr, alias = step.rsplit(" AS ", 1)
            f_tab = f_tab.withColumn(alias, F.expr(expr))
    w_tab = f_tab.select("token", "f", "w").localCheckpoint(eager=False)
    tot = w_tab.agg(F.sum("w").alias("tw"))
    return (
        w_tab.crossJoin(F.broadcast(tot))
        .select(
            "token",
            "f",
            "w",
            F.expr("CAST((w * 1000000) div tw AS BIGINT)").alias(
                "prob_ppm"
            ),
        )
        .orderBy(F.desc("f"), "token")
        .limit(_NEG_TOPK)
    )


_WP_MERGES = 24


@register(
    "wordpiece_encode_roundtrip",
    f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok,
           md5(list_aggregate({_SQL_TOKENS}, 'string_agg', ' '))
               AS recon_md5
    FROM documents
    WHERE len({_SQL_TOKENS}) > 0
    ORDER BY doc_id
    """,
)
def wordpiece_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a WordPiece vocabulary on the doc_id%4==0 quarter
    ({_WP_MERGES} likelihood-ranked merges, exact integer
    cross-multiplied ratios — operators/wordpiece.py, the THIRD
    tokenizer family), greedy-longest-match encode the WHOLE corpus
    fully in-row (vocab compiled as a map literal; zero shuffle), and
    prove the encode loss-free per document: word boundaries recover
    from the ##-continuation convention (a bare piece starts a word),
    so stripping ## and re-spacing reconstructs the exact token
    stream, hash-matched against the pristine text (the bpe/unigram
    roundtrip device). An [UNK] anywhere would break the hash — the
    gate corpus alphabet is covered by construction; the UNK path is
    unit-tested. What the hash does NOT pin is greedy-match choice;
    tests pin that against a pure-Python reference."""
    from ..operators.wordpiece import wordpiece_encode, wordpiece_train

    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = wordpiece_train(
        docs.filter(F.col("doc_id") % 4 == 0).select("text"),
        n_merges=_WP_MERGES,
    )
    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    ).filter(F.size("s") > 0)
    enc = wordpiece_encode(symbols, vocab)
    recon = F.expr(
        "trim(concat_ws('', transform(pieces, p -> "
        "if(startswith(p, '##'), substr(p, 3), concat(' ', p)))))"
    )
    # boundary below the presentation sort (r12 opt — see
    # plans.presentation_sort; the in-row encode otherwise runs twice
    # under the range sampling pass)
    return presentation_sort(
        enc.select("id", recon.alias("recon")).select(
            F.col("id").alias("doc_id"),
            F.size(F.split("recon", " ")).cast("long").alias("n_tok"),
            F.md5(F.col("recon").cast("binary")).alias("recon_md5"),
        ),
        "doc_id",
    )


def build_wordpiece_encode_serving(spark: SparkSession, sf_dir: str):
    """bench.py SERVING_BENCH builder (the bpe/unigram pattern): train
    the WordPiece vocabulary outside the timer, return a thunk
    building the encode-everything projection with the FROZEN
    vocabulary."""
    from ..operators.wordpiece import wordpiece_encode, wordpiece_train

    docs = spread(load_table(spark, sf_dir, "documents"))
    vocab = wordpiece_train(
        docs.filter(F.col("doc_id") % 4 == 0).select("text"),
        n_merges=_WP_MERGES,
    )
    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    ).filter(F.size("s") > 0)

    def thunk() -> DataFrame:
        enc = wordpiece_encode(symbols, vocab)
        recon = F.expr(
            "trim(concat_ws('', transform(pieces, p -> "
            "if(startswith(p, '##'), substr(p, 3), concat(' ', p)))))"
        )
        # same boundary as the gate row (r12 opt)
        return presentation_sort(
            enc.select(
                F.col("id").alias("doc_id"),
                F.size(F.split(recon, " ")).cast("long").alias("n_tok"),
                F.md5(recon.cast("binary")).alias("recon_md5"),
            ),
            "doc_id",
        )

    return thunk


# ---------------------------------------------------------------------------
# integer-exact PageRank over a synthesized citation graph
# ---------------------------------------------------------------------------
#
# The corpus has no link column, so the graph is synthesized in-plan
# from doc_id (the cohort/temperature device): node u emits
# 1 + u % 3 edges to (u*7 + j*31 + 11) mod N — varying out-degrees
# give varying in-degrees, so ranks genuinely skew instead of
# collapsing to the uniform fixpoint. The recurrence is the integer
# spec from operators/graph.py: floor division at every step, no
# floats, so both engines agree bit for bit after any number of
# rounds.

_PR_ITER = 5
_PR_TOP = 20


def _doc_graph_dir_ctes(materialized: bool = False) -> list[str]:
    """The synthesized DIRECTED citation graph's nodes/tot/edges CTEs
    — ONE text shared by the pagerank and HITS oracles (review r11:
    four inline copies of the `(node*7 + j*31 + 11) % n` construction
    could silently diverge; the undirected variants keep their own
    _GRAPH_UND_CTES, and kcore deliberately differs via _KCORE_CMOD)."""
    m = "MATERIALIZED " if materialized else ""
    return [
        f"nodes AS {m}(SELECT doc_id AS node FROM documents)",
        f"tot AS {m}(SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        (
            f"edges AS {m}(SELECT node AS src, "
            "(node * 7 + j * 31 + 11) % (SELECT n FROM tot) AS dst "
            "FROM nodes, UNNEST(generate_series(1, 1 + node % 3)) AS t(j))"
        ),
    ]


def _doc_graph_dir(spark: SparkSession, sf_dir: str):
    """(nodes, edges) — the Spark build of the same directed graph,
    shared by pagerank_doc_graph and hits_scores."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("node")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    edges = (
        docs.crossJoin(F.broadcast(tot))
        .select(
            F.col("node").alias("src"),
            F.explode(F.expr("sequence(1, 1 + node % 3)")).alias("j"),
            "__n",
        )
        .select("src", F.expr("(src * 7 + j * 31 + 11) % __n").alias("dst"))
    )
    return docs, edges


def _pagerank_oracle_sql(n_iter: int) -> str:
    inner = (
        "SELECT e.dst AS node, CAST(SUM(r.r // d.outdeg) AS BIGINT) AS inc "
        "FROM edges e JOIN {prev} r ON e.src = r.node "
        "JOIN outdeg d ON e.src = d.src GROUP BY 1"
    )
    ctes = _doc_graph_dir_ctes() + [
        (
            "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg "
            "FROM edges GROUP BY 1)"
        ),
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        body = inner.format(prev=f"r{i - 1}")
        ctes.append(
            f"r{i} AS (SELECT n.node, "
            f"CAST(150000 + (85 * COALESCE(c.inc, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN ({body}) c ON n.node = c.node)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, r AS rank FROM r{n_iter} "
        f"ORDER BY rank DESC, node LIMIT {_PR_TOP}"
    )


@register("pagerank_doc_graph", _pagerank_oracle_sql(_PR_ITER))
def pagerank_doc_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PR_TOP} nodes by integer-exact PageRank after
    {_PR_ITER} rounds on the synthesized citation graph — the
    canonical iterative-weights job (join ranks to edges, shuffle
    contributions to their targets, re-aggregate), pinned bit-exact
    against a DuckDB oracle whose rounds are CHAINED CTEs built from
    the same recurrence text.

    Scale shape (operators/graph.py): one target-keyed shuffle per
    round with map-side partial sums; the rank table checkpoints per
    round so the plan stays linear in rounds; the edge+outdeg table
    materializes once and is reused every round. The total order under
    the LIMIT is (rank DESC, node) — node is unique.
    """
    from ..operators.graph import pagerank_integer

    docs, edges = _doc_graph_dir(spark, sf_dir)
    ranks = pagerank_integer(docs, edges, n_iter=_PR_ITER)
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(_PR_TOP)
        .select("node", "rank")
    )


# ---------------------------------------------------------------------------
# degree-oriented triangle counting over the synthesized doc graph
# (operators/graph.triangle_counts_per_node; the pagerank chords plus
# a 2-chord ring so triangles exist at every SF — the chords alone
# close almost none on this modular graph)
# ---------------------------------------------------------------------------

_TRI_TOP = 25

# the synthesized-graph CTE block shared VERBATIM by the triangle and
# link-prediction oracles (the _COMPONENTS_CTE / _span_oracle_sql
# device: one builder, the two oracles cannot desynchronize)
_GRAPH_UND_CTES = """nodes AS (SELECT doc_id AS node FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    chords AS (
        SELECT node AS src,
               (node * 7 + j * 31 + 11) % (SELECT n FROM tot) AS dst
        FROM nodes, UNNEST(generate_series(1, 1 + node % 3)) AS t(j)
    ),
    ring AS (
        SELECT node AS src, (node + j) % (SELECT n FROM tot) AS dst
        FROM nodes, UNNEST(generate_series(1, 2)) AS t(j)
    ),
    edges AS (SELECT * FROM chords UNION ALL SELECT * FROM ring),
    und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src != dst
    )"""


def _doc_graph_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized undirected doc graph (pagerank chords + a
    2-chord ring), as distinct id-ordered pairs (a < b) — the shared
    builder for triangle_counts and link_prediction_scores."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("node")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    base = docs.crossJoin(F.broadcast(tot))
    chords = base.select(
        F.col("node").alias("src"),
        F.explode(F.expr("sequence(1, 1 + node % 3)")).alias("j"),
        "__n",
    ).select("src", F.expr("(src * 7 + j * 31 + 11) % __n").alias("dst"))
    ring = base.select(
        F.col("node").alias("src"),
        F.explode(F.expr("sequence(1, 2)")).alias("j"),
        "__n",
    ).select("src", F.expr("(src + j) % __n").alias("dst"))
    return (
        chords.unionByName(ring)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


@register(
    "triangle_counts",
    f"""
    WITH {_GRAPH_UND_CTES},
    tri AS (
        SELECT e1.a AS u, e1.b AS v, e2.b AS w
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pern AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT u AS node FROM tri
              UNION ALL SELECT v FROM tri
              UNION ALL SELECT w FROM tri)
        GROUP BY 1
    )
    SELECT node, n_triangles FROM pern
    ORDER BY n_triangles DESC, node
    LIMIT {_TRI_TOP}
    """,
)
def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TRI_TOP} nodes by triangle participation on the
    synthesized doc graph (pagerank chords + a 2-chord ring).

    The Spark side runs the DEGREE-ORIENTED algorithm
    (operators/graph.triangle_counts_per_node — wedge fan-out bounded
    by arboricity, the shape that survives power-law degree skew);
    the oracle enumerates the same triangles id-ordered with three
    plain joins — each triangle is counted exactly once either way,
    so the per-node credits match bit for bit. Total order under the
    LIMIT: (n_triangles DESC, node), node unique.
    """
    from ..operators.graph import triangle_counts_per_node

    und = _doc_graph_und(spark, sf_dir)
    return (
        triangle_counts_per_node(und)
        .orderBy(F.desc("n_triangles"), "node")
        .limit(_TRI_TOP)
    )


# ---------------------------------------------------------------------------
# link prediction: common neighbors + resource-allocation index over
# the synthesized doc graph (Zhou, Lü & Zhang 2009) — integer ppm
# ---------------------------------------------------------------------------

_LP_TOP = 25


@register(
    "link_prediction_scores",
    f"""
    WITH {_GRAPH_UND_CTES},
    adj AS (
        SELECT a AS w, b AS u FROM und
        UNION ALL
        SELECT b AS w, a AS u FROM und
    ),
    deg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
    wedge AS (
        SELECT a1.u AS u, a2.u AS v, a1.w AS w
        FROM adj a1 JOIN adj a2 ON a1.w = a2.w AND a1.u < a2.u
    ),
    scored AS (
        SELECT wg.u, wg.v,
               CAST(COUNT(*) AS BIGINT) AS cn,
               CAST(SUM(1000000 // d.d) AS BIGINT) AS ra_ppm
        FROM wedge wg JOIN deg d ON wg.w = d.w
        GROUP BY 1, 2
    )
    SELECT s.u, s.v, s.cn, s.ra_ppm
    FROM scored s LEFT JOIN und e ON s.u = e.a AND s.v = e.b
    WHERE e.a IS NULL
    ORDER BY s.ra_ppm DESC, s.cn DESC, s.u, s.v
    LIMIT {_LP_TOP}
    """,
)
def link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_LP_TOP} predicted (missing) links on the synthesized doc
    graph: per non-adjacent pair sharing ≥1 neighbor, the
    common-neighbor count and the resource-allocation index
    Σ_w 1/deg(w) — each neighbor's contribution as the exact integer
    floor(1e6 / deg(w)), so the RA score is bit-stable with no float
    division (the published RA/Adamic-Adar family with the engine's
    integer-ppm discipline).

    Shape: adjacency both directions (2|E| rows), a degrees agg, the
    standard wedge self-join keyed on the shared neighbor (the
    triangle gate's fan-out — bounded by Σ deg(w)², the same hub-cap
    story), one (u, v) agg, and an existing-edge anti join (LEFT +
    IS NULL on both engines). Total order under the LIMIT:
    (ra_ppm DESC, cn DESC, u, v) — (u, v) unique.
    """
    und = _doc_graph_und(spark, sf_dir)
    und = und.localCheckpoint(eager=False)  # adjacency + anti-join consumer
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("u")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("u"))
    )
    adj = adj.localCheckpoint(eager=False)  # degree + two wedge consumers
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a1 = adj.select("w", F.col("u").alias("u"))
    a2 = adj.select("w", F.col("u").alias("v"))
    wedge = a1.join(a2, "w").filter(F.col("u") < F.col("v"))
    scored = (
        wedge.join(deg, "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum(F.expr("1000000 div d")).cast("long").alias("ra_ppm"),
        )
    )
    return (
        scored.join(
            und,
            (scored["u"] == und["a"]) & (scored["v"] == und["b"]),
            "left_anti",
        )
        .orderBy(F.desc("ra_ppm"), F.desc("cn"), "u", "v")
        .limit(_LP_TOP)
    )


# ---------------------------------------------------------------------------
# inverted-index build: capped posting lists per term (search-index
# artifact family)
# ---------------------------------------------------------------------------

_POSTING_CAP = 8
_POSTING_TERMS = 100


@register(
    "inverted_index_postings",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    td AS (
        SELECT term, doc_id, COUNT(*) AS tf_d FROM toks GROUP BY 1, 2
    ),
    capped AS (
        SELECT term, doc_id FROM (
            SELECT term, doc_id, row_number() OVER (
                PARTITION BY term ORDER BY doc_id) AS rn
            FROM td)
        WHERE rn <= {_POSTING_CAP}
    ),
    postings AS (
        SELECT term,
               md5(array_to_string(list_sort(list(doc_id)), ',')) AS head_hash,
               COUNT(*) AS head_len
        FROM capped GROUP BY 1
    ),
    stats AS (
        SELECT term, COUNT(*) AS df, CAST(SUM(tf_d) AS BIGINT) AS tf
        FROM td GROUP BY 1
    )
    SELECT s.term, s.df, s.tf,
           CAST(p.head_len AS BIGINT) AS head_len,
           p.head_hash
    FROM stats s JOIN postings p ON s.term = p.term
    ORDER BY s.df DESC, s.term
    LIMIT {_POSTING_TERMS}
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: per term, document frequency, total
    term frequency, and the CAPPED head of its sorted posting list
    (first 8 doc_ids, content-hashed).

    The retrieval-infra sibling of token_histogram: what a search/
    BM25 layer materializes from a corpus. The cap is the scale story
    — a stopword's posting list is corpus-sized, so rows are cut to
    the per-term head with a window BEFORE any collect_list: at most
    8 rows per term ever reach the list aggregation,
    making the build skew-proof (the same hot-key discipline as the
    winnowing fingerprint cap). Shuffles: (term, doc) pre-agg with
    map-side combine, then term-keyed stats/head aggs off that one
    deduped frame. Top-100 by (df desc, term) is a total
    order.
    """
    from pyspark.sql.window import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
    td = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf_d"))
    td = td.localCheckpoint(eager=False)  # stats + capped-head consumers
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = (
        td.select("term", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _POSTING_CAP)
    )
    postings = capped.groupBy("term").agg(
        F.md5(
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").cast(
                "binary"
            )
        ).alias("head_hash"),
        F.count(F.lit(1)).cast("long").alias("head_len"),
    )
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf_d").cast("long").alias("tf"),
    )
    return (
        stats.join(postings, "term")
        .select("term", "df", "tf", "head_len", "head_hash")
        .orderBy(F.desc("df"), "term")
        .limit(_POSTING_TERMS)
    )


# ---------------------------------------------------------------------------
# ranked keyword search: integer-idf retrieval over the corpus (the
# inverted index's serve path)
# ---------------------------------------------------------------------------

def _dsir_class_case(num: str, den: str, clamp: int = 8) -> str:
    """CASE ladder computing floor(log2(num/den)) clamped to
    [-clamp, clamp], using only integer multiply/compare — identical
    text runs on Spark SQL and DuckDB. Shared by the DSIR importance
    ladder, the perplexity buckets (clamp 16), and the keyword-search
    idf weights (df <= n, so only the non-negative branches fire)."""
    parts = []
    for c in range(clamp, -1, -1):
        parts.append(f"WHEN {num} >= {den} * {1 << c} THEN {c}")
    for c in range(1, clamp):
        parts.append(f"WHEN {num} * {1 << c} >= {den} THEN {-c}")
    return "CASE " + " ".join(parts) + f" ELSE {-clamp} END"


_SEARCH_TERMS = ("spark", "join", "window", "merge", "the")
_SEARCH_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _SEARCH_TERMS) + ")"
_SEARCH_K = 20
_IDF_CLAMP = 16


@register(
    "keyword_search_ranked",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    hits AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term IN {_SEARCH_TERMS_SQL}
        GROUP BY 1, 2
    ),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    weights AS (
        SELECT term, COUNT(*) AS df,
               {_dsir_class_case('(SELECT n FROM n_docs)', 'COUNT(*)', _IDF_CLAMP)} AS w
        FROM hits GROUP BY term
    ),
    scored AS (
        SELECT h.doc_id,
               CAST(SUM(h.tf * w.w) AS BIGINT) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM hits h JOIN weights w ON h.term = w.term
        GROUP BY 1
    )
    SELECT doc_id, score, n_terms
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_SEARCH_K}
    """,
)
def keyword_search_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked keyword retrieval: score = Σ tf(doc, t) · floor-log2
    idf(t) over the query terms, top-{_SEARCH_K} under a (score desc,
    doc_id) total order.

    The serve path the inverted_index_postings artifact exists for —
    with the idf weight as an integer CASE ladder (the DSIR device),
    so ranking is bit-stable with no float log anywhere. Shape: the
    term filter lands right after the token explode (the scan carries
    only query-term rows into the (doc, term) pre-agg), df/weights are
    a terms-sized table that broadcasts, and the final score agg keys
    on doc_id. One corpus scan, hash-uniform shuffles only.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
    hits = (
        toks.filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hits = hits.localCheckpoint(eager=False)  # weights + scoring consumer
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    weights = (
        hits.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n))
        .select("term", F.expr(_dsir_class_case("n", "df", _IDF_CLAMP)).alias("w"))
    )
    return (
        hits.join(F.broadcast(weights), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).cast("long").alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(_SEARCH_K)
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval: exact-rational Okapi scoring in integer ppm
# ---------------------------------------------------------------------------
#
# Okapi BM25 with the standard constants as exact rationals
# (k1 = 6/5, b = 3/4). Per-term contribution:
#
#   idf(t) * tf * (k1 + 1) / (tf + k1 * ((1 - b) + b * dl / avgdl))
#
# with avgdl = T/N (T total corpus tokens, N docs). Multiplying the
# tf ratio through by 10*T clears every denominator:
#
#   num = 22 * tf * T
#   den = 10 * T * tf + 3 * T + 9 * dl * N
#
# so the contribution in parts-per-million is ONE positive floor
# division of BIGINTs — the division text is shared verbatim between
# engines (Spark `div` == DuckDB `//` for positive operands), idf is
# the shared floor-log2 CASE ladder, and the score is bit-stable with
# no float anywhere. BIGINT headroom: w*22*tf*T*1e6 needs
# tf*T < 2.6e13 (sf0.1: T ~ 5e6, tf < 1e3 — five orders of margin); a
# 100 TB corpus shifts T right by a common k first, same ranking.


def _bm25_contrib(divop: str) -> str:
    return (
        f"(w * 22 * tf * __tt * 1000000) {divop} "
        "(10 * __tt * tf + 3 * __tt + 9 * dl * __nn)"
    )


@register(
    "bm25_search_ranked",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
    tot AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS __tt,
               CAST(COUNT(*) AS BIGINT) AS __nn
        FROM lens
    ),
    hits AS (
        SELECT x.doc_id, l.dl, x.term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM toks) x
        JOIN lens l ON x.doc_id = l.doc_id
        WHERE x.term IN {_SEARCH_TERMS_SQL}
        GROUP BY 1, 2, 3
    ),
    weights AS (
        SELECT term,
               {_dsir_class_case('(SELECT __nn FROM tot)', 'COUNT(*)',
                                 _IDF_CLAMP)} AS w
        FROM hits GROUP BY term
    ),
    scored AS (
        SELECT h.doc_id,
               CAST(SUM({_bm25_contrib('//')}) AS BIGINT) AS score_ppm,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM hits h JOIN weights wt ON h.term = wt.term CROSS JOIN tot
        GROUP BY 1
    )
    SELECT doc_id, score_ppm, n_terms
    FROM scored
    ORDER BY score_ppm DESC, doc_id
    LIMIT {_SEARCH_K}
    """,
)
def bm25_search_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_SEARCH_K} documents under exact-integer Okapi BM25
    (k1 = 6/5, b = 3/4 as rationals, scores in ppm) — the
    length-normalized, tf-saturated upgrade of keyword_search_ranked
    and the real serve path of the inverted-index artifact.

    Shape: one corpus scan carries (doc_id, dl, term) through the
    term filter placed directly on the token explode; (doc, term)
    pre-agg with map-side combine; idf weights are a terms-sized
    broadcast; corpus totals (T, N) are a one-row broadcast; the final
    agg keys on doc_id. The contribution is one positive BIGINT floor
    division whose text both engines share — see the header comment
    for the derivation and headroom. Total order under the LIMIT:
    (score_ppm DESC, doc_id), doc_id unique.
    """
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(_TOKENS).alias("t")
    )
    lens = docs.select(
        "doc_id", F.size("t").cast("long").alias("dl"), "t"
    ).localCheckpoint(eager=False)  # tot (x2 broadcasts) + hits consumers
    tot = lens.agg(
        F.sum("dl").cast("long").alias("__tt"),
        F.count(F.lit(1)).cast("long").alias("__nn"),
    )
    hits = (
        lens.select("doc_id", "dl", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    hits = hits.localCheckpoint(eager=False)  # weights + scoring consumer
    weights = (
        hits.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(tot.select("__nn")))
        .select(
            "term",
            F.expr(_dsir_class_case("__nn", "df", _IDF_CLAMP)).alias("w"),
        )
    )
    return (
        hits.join(F.broadcast(weights), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(_bm25_contrib("div")))
            .cast("long")
            .alias("score_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .orderBy(F.desc("score_ppm"), "doc_id")
        .limit(_SEARCH_K)
    )


# ---------------------------------------------------------------------------
# phrase matching: exact 2-token phrase occurrences, fully in-row
# ---------------------------------------------------------------------------

_PHRASES = ("spark join", "merge sort", "the fast")


@register(
    "phrase_match_stats",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    pairs AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 2 THEN
                   list_transform(
                       list_zip(list_slice(t, 1, len(t) - 1),
                                list_slice(t, 2, len(t))),
                       p -> p[1] || ' ' || p[2])
               ELSE [] END AS bigrams
        FROM toks
    ),
    per_doc AS (
        SELECT doc_id, ph.phrase,
               len(list_filter(bigrams, b -> b = ph.phrase)) AS cnt
        FROM pairs, (SELECT unnest({list(_PHRASES)!r}) AS phrase) ph
    )
    SELECT phrase,
           CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs,
           CAST(SUM(cnt) AS BIGINT) AS n_occurrences
    FROM per_doc
    GROUP BY 1
    ORDER BY 1
    """,
)
def phrase_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase (adjacent-token) matching: per query phrase, how
    many documents contain it and how many times — the positional
    retrieval primitive a bare term index can't answer.

    Fully in-row: adjacent bigrams come from zip_with over two
    whole-array slices (never per-position element_at on a built
    array — rule 10's O(n²) trap), the per-phrase count is one
    filter+size per phrase, and the only shuffle is the 3-row final
    agg. Docs under 2 tokens contribute empty bigram lists (guarded —
    slice with a negative length throws).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    return phrase_report(docs).orderBy("phrase")


def phrase_count_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, phrase, cnt): per-document occurrence counts for every
    query phrase — the stateless narrow transform shared by the batch
    gate and streaming.curation.phrase_stream. ``docs`` needs
    (doc_id, text)."""
    toks = docs.select("doc_id", F.expr(_TOKENS).alias("t"))
    bigrams = toks.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(t) >= 2 THEN"
            " zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
            " (x, y) -> concat(x, ' ', y))"
            " ELSE array() END"
        ).alias("bigrams"),
    )

    def _match(phrase: str):
        # a 2-arg lambda would make PySpark pass the array INDEX as
        # the second argument, shadowing a default-arg phrase binding
        return lambda b: b == F.lit(phrase)

    return bigrams.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("phrase"),
                        F.size(
                            F.filter(F.col("bigrams"), _match(p))
                        ).alias("cnt"),
                    )
                    for p in _PHRASES
                ]
            )
        ).alias("m"),
    ).select("doc_id", "m.phrase", "m.cnt")


def phrase_report(docs: DataFrame) -> DataFrame:
    """The phrase-stats aggregation over phrase_count_rows — complete-
    mode state on a stream equals the batch gate (minus its
    presentation sort)."""
    return (
        phrase_count_rows(docs).groupBy("phrase")
        .agg(
            F.sum(F.when(F.col("cnt") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_docs"),
            F.sum("cnt").cast("long").alias("n_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# LSH quality audit: MinHash-LSH candidates vs exact-Jaccard ground
# truth — the approximation-quality meta-gate
# ---------------------------------------------------------------------------

_AUDIT_MOD = 7  # audit sample: doc_id % 7 = 0 (how these audits run
# at fleet scale too — ground truth is quadratic, so it is computed on
# a deterministic sample, never the corpus)

# graded in-plan near-dups: a 3/4-length clone per doc_id % 21 = 0 and
# a 1/2-length clone per doc_id % 35 = 0 — overlap levels straddling
# the tau = 1/2 threshold, so the confusion matrix has real FN/FP mass
# (measured sf0.1: 294 true / 286 candidates / 236 TP)


@register(
    "lsh_quality_audit",
    f"""
    WITH raw AS (
        SELECT doc_id, text FROM documents WHERE doc_id % {_AUDIT_MOD} = 0
    ),
    tok0 AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM raw
    ),
    sub AS (
        SELECT doc_id, array_to_string(t, ' ') AS text FROM tok0
        UNION ALL
        SELECT doc_id + 1000000,
               array_to_string(list_slice(t, 1, (3 * len(t)) // 4), ' ')
        FROM tok0 WHERE doc_id % 21 = 0
        UNION ALL
        SELECT doc_id + 2000000,
               array_to_string(list_slice(t, 1, len(t) // 2), ' ')
        FROM tok0 WHERE doc_id % 35 = 0
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS tokens
        FROM sub
    ),
    shingles AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + {_SHINGLE_N} - 1],
                              'string_agg', ' ') AS shingle
        FROM toks,
             UNNEST(generate_series(1, len(tokens) - {_SHINGLE_N} + 1))
                 AS t(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM shingles GROUP BY 1),
    common AS (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT da, db FROM common
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE 3 * c >= sa.ns + sb.ns
    ),
    hashed AS (
        SELECT doc_id,
               ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h
        FROM shingles
    ),
    sigs AS (SELECT doc_id, {_SQL_SIG_COLS} FROM hashed GROUP BY 1),
    bands AS (
        SELECT doc_id, band, CASE band {_SQL_BAND_KEYS} END AS band_key
        FROM sigs,
             UNNEST(generate_series(0, {_N_HASHES // _BAND_SIZE - 1}))
                 AS t(band)
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    cls AS (
        SELECT CASE WHEN t.da IS NOT NULL THEN 1 ELSE 0 END AS is_true,
               CASE WHEN c.da IS NOT NULL THEN 1 ELSE 0 END AS is_cand
        FROM truth t FULL JOIN cands c ON t.da = c.da AND t.db = c.db
    )
    SELECT CAST(SUM(is_true) AS BIGINT)            AS n_true_pairs,
           CAST(SUM(is_cand) AS BIGINT)            AS n_candidates,
           CAST(SUM(is_true * is_cand) AS BIGINT)  AS tp,
           CAST(SUM(is_cand * (1 - is_true)) AS BIGINT) AS fp,
           CAST(SUM(is_true * (1 - is_cand)) AS BIGINT) AS fn,
           CAST(CASE WHEN SUM(is_cand) > 0
                THEN (1000000 * SUM(is_true * is_cand)) // SUM(is_cand)
                ELSE 0 END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN SUM(is_true) > 0
                THEN (1000000 * SUM(is_true * is_cand)) // SUM(is_true)
                ELSE 0 END AS BIGINT) AS recall_ppm
    FROM cls
    """,
)
def lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximation-quality audit: run MinHash-LSH candidate
    generation AND exact shingle-Jaccard ground truth (threshold 1/2
    as the integer cross-multiplication 3·common ≥ |A|+|B|) on the
    same deterministic sample, and emit the confusion matrix — TP, FP,
    FN, precision/recall in ppm. The question every dedup deployment
    has to answer ("is the approximation actually finding the dups?"),
    answered in-plan with zero floats: graded in-plan clone synthesis
    (3/4- and 1/2-length truncations) puts real mass on both error
    sides of the 4-band S-curve.

    Scale shape: ground truth is quadratic BY DEFINITION, so it runs
    on the doc_id-hash sample (max shingle df measured 3 on this
    corpus slice — the exact self-join is pair-sparse); the LSH side
    is the linear production path restricted to the same sample. One
    materialized shingle-array frame feeds all four consumers.

    Precision note (ADVICE r7): the "exact" truth side joins shingles
    on 64-bit xxhash64 keys (the _shingle_key convention) while the
    DuckDB oracle joins the raw shingle STRINGS — truth is
    exact-up-to-64-bit-collision. A collision would inflate `common`
    for one pair; at the sample's shingle cardinality (~10^4) the
    collision odds are ~1e-11 and the oracle would catch any
    divergence as a hash mismatch, which is the gate working as
    intended rather than silently passing.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    raw = docs.filter(F.col("doc_id") % _AUDIT_MOD == 0).select(
        "doc_id", F.expr(_TOKENS).alias("t")
    )
    raw = _materialize(raw)
    full = raw.select("doc_id", F.array_join("t", " ").alias("text"))
    c34 = raw.filter(F.col("doc_id") % 21 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.expr("slice(t, 1, (3 * size(t)) div 4)"), " "
        ).alias("text"),
    )
    c12 = raw.filter(F.col("doc_id") % 35 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.expr("slice(t, 1, size(t) div 2)"), " ").alias(
            "text"
        ),
    )
    sub = full.unionByName(c34).unionByName(c12)
    sh_arr = _materialize(
        sub.select(
            "doc_id",
            F.array_distinct(
                F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
            ).alias("shingles"),
        ).filter(F.size("shingles") > 0)
    )
    sizes = sh_arr.select("doc_id", F.size("shingles").alias("ns"))
    sh = _materialize(
        sh_arr.select(
            "doc_id", F.explode("shingles").alias("shingle")
        ).select("doc_id", _shingle_key("shingle").alias("sk"))
    )
    common = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sk") == F.col("b.sk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("ns").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("ns").alias("nb"))
    truth = (
        common.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .filter(3 * F.col("c") >= F.col("na") + F.col("nb"))
        .select("da", "db")
    )
    # LSH side: the minhash_lsh_candidates device on the same arrays
    hs = sh_arr.select(
        "doc_id",
        F.transform(
            F.col("shingles"),
            lambda s: F.conv(
                F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10
            ).cast("long"),
        ).alias("hs"),
    )
    sigs = hs.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {_MINHASH_P}L))"
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(_MINHASH_COEFFS)
        ],
    )
    band_key_exprs = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"m{band * _BAND_SIZE + j}").cast("string")
                    for j in range(_BAND_SIZE)
                ],
            ).cast("binary")
        ).alias(f"bk{band}")
        for band in range(_N_HASHES // _BAND_SIZE)
    ]
    bands = _materialize(
        sigs.select("doc_id", *band_key_exprs)
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.col(f"bk{band}").alias("band_key"),
                        )
                        for band in range(_N_HASHES // _BAND_SIZE)
                    ]
                )
            ).alias("bb"),
        )
        .select("doc_id", "bb.band", "bb.band_key")
    )
    cands = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
    )
    cls = truth.withColumn("is_true", F.lit(1)).join(
        cands.withColumn("is_cand", F.lit(1)), ["da", "db"], "full_outer"
    ).select(
        F.coalesce("is_true", F.lit(0)).alias("is_true"),
        F.coalesce("is_cand", F.lit(0)).alias("is_cand"),
    )
    tp = F.sum(F.col("is_true") * F.col("is_cand"))
    n_true = F.sum("is_true")
    n_cand = F.sum("is_cand")
    return cls.agg(
        n_true.cast("long").alias("n_true_pairs"),
        n_cand.cast("long").alias("n_candidates"),
        tp.cast("long").alias("tp"),
        F.sum(F.col("is_cand") * (1 - F.col("is_true")))
        .cast("long")
        .alias("fp"),
        F.sum(F.col("is_true") * (1 - F.col("is_cand")))
        .cast("long")
        .alias("fn"),
    ).select(
        "n_true_pairs",
        "n_candidates",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CAST(CASE WHEN n_candidates > 0"
            " THEN (1000000 * tp) div n_candidates ELSE 0 END AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CASE WHEN n_true_pairs > 0"
            " THEN (1000000 * tp) div n_true_pairs ELSE 0 END AS BIGINT)"
        ).alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# collocation extraction: integer PMI classes over adjacent bigrams
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 50
_PMI_CLAMP = 16


@register(
    "collocation_pmi",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
    ),
    uni AS (
        SELECT u.token AS w, COUNT(*) AS c_w
        FROM toks, UNNEST(t) AS u(token)
        GROUP BY 1
    ),
    n_tok AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM uni),
    bi AS (
        SELECT p.bg[1] AS a, p.bg[2] AS b, COUNT(*) AS c_ab
        FROM (
            SELECT unnest(list_zip(list_slice(t, 1, len(t) - 1),
                                   list_slice(t, 2, len(t)))) AS bg
            FROM toks WHERE len(t) >= 2
        ) p
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT bi.a, bi.b, bi.c_ab,
               {_dsir_class_case('(bi.c_ab * n_tok.n)', '(ua.c_w * ub.c_w)', _PMI_CLAMP)}
                   AS pmi_class
        FROM bi
        JOIN uni ua ON ua.w = bi.a
        JOIN uni ub ON ub.w = bi.b
        CROSS JOIN n_tok
        WHERE bi.c_ab >= {_PMI_MIN_COUNT}
    )
    SELECT a || ' ' || b AS bigram,
           CAST(c_ab AS BIGINT) AS c_ab,
           CAST(pmi_class AS BIGINT) AS pmi_class
    FROM scored
    ORDER BY pmi_class DESC, c_ab DESC, bigram
    LIMIT {_PMI_TOP}
    """,
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: adjacent bigrams ranked by pointwise
    mutual information, with PMI as the INTEGER class
    floor(log2(c_ab·N / (c_a·c_b))) via the shared cross-multiplied
    CASE ladder (the DSIR device, third consumer) — no float log, so
    the ranking is bit-stable. Bigrams under {_PMI_MIN_COUNT}
    occurrences are cut (the standard noise floor); top-{_PMI_TOP}
    under a (class desc, count desc, bigram) total order.

    Shape: bigram construction is the in-row zip device (whole-array
    slices), counts are map-side-combined aggs on hash-uniform keys,
    and the unigram table is vocabulary-sized — it joins twice onto
    the bigram counts (broadcastable at any corpus size). BIGINT
    headroom: c_ab·N needs c_ab·N < 2^63/2^{_PMI_CLAMP} ≈ 1.4e14 —
    right-shift both sides beyond (the DSIR note).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.expr(_TOKENS).alias("t"))
    toks = toks.localCheckpoint(eager=False)  # unigram + bigram consumers
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    uni = uni.localCheckpoint(eager=False)  # total + two joins
    n_tok = uni.agg(F.sum("c_w").cast("long").alias("n"))
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1),"
                    " slice(t, 2, size(t) - 1), (x, y) -> struct(x AS a, y AS b))"
                )
            ).alias("bg")
        )
        .groupBy(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    ua = uni.select(F.col("w").alias("a"), F.col("c_w").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c_w").alias("c_b"))
    # BIGINT headroom ENFORCED in-plan (ADVICE r7): the ladder's worst
    # products are num·2^clamp = c_ab·N·2^16 and den·2^clamp =
    # c_a·c_b·2^16, so both factors must stay under 2^47. Spark long
    # arithmetic would WRAP silently past the bound (DuckDB errors
    # loudly) — assert_true fails the job instead; expressed as
    # divisions so the guard itself cannot overflow. assert_true
    # returns NULL when the predicate holds, so the coalesce add is a
    # no-op on every legal row (the segment_rows pattern).
    _HEADROOM = (1 << 47) - 1
    guard = F.coalesce(
        F.assert_true(
            (F.col("c_ab") <= F.expr(f"{_HEADROOM}L div n"))
            & (F.col("c_a") <= F.expr(f"{_HEADROOM}L div c_b")),
            F.lit(
                "collocation_pmi: c_ab*N or c_a*c_b exceeds 2^47 — the "
                "2^16-clamped PMI ladder would wrap BIGINT; right-shift "
                "both counts by a common k (the DSIR note) and rerun"
            ),
        ).cast("bigint"),
        F.lit(0),
    )
    scored = (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n_tok))
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            (F.col("c_ab").cast("long") + guard).alias("c_ab"),
            F.expr(
                _dsir_class_case("(c_ab * n)", "(c_a * c_b)", _PMI_CLAMP)
            )
            .cast("long")
            .alias("pmi_class"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_class"), F.desc("c_ab"), "bigram"
    ).limit(_PMI_TOP)


# ---------------------------------------------------------------------------
# CMS heavy-CHANGE detection (r9): which keys' frequencies moved most
# between two epochs — Cormode's change-detection use of the sketch
# family (the reason CMS counters are SIGNED-mergeable: subtracting
# two epochs' sketches estimates the delta without either epoch's
# key table).
# ---------------------------------------------------------------------------
#
# Epochs = doc_id parity; a burst is synthesized in-plan (docs with
# doc_id % 50 == 1 emit 20 'burstkey' tokens into epoch B only — the
# token is outside the 31-word corpus vocabulary, checked) so a real
# changer exists at every SF. The gate follows the cms_heavy_hitters
# device: emitted values are the EXACT top-25 deltas (total order
# |delta| desc, token), and the sketches only decide the flag — the
# estimated delta estB(x) − estA(x) must sit within the two-sided
# envelope |estΔ − Δ| ≤ bound(N_A) + bound(N_B) (each side's probe
# excess is ≤ its own max(8·N/W, 2); the two overestimates subtract).

_CHG_BURST_MOD = 50
_CHG_BURST_N = 20
_CHG_TOKEN = "burstkey"


@register(
    "cms_heavy_change",
    f"""
    WITH toks AS (
        SELECT doc_id % 2 AS epoch, unnest({_SQL_TOKENS}) AS token
        FROM documents
        UNION ALL
        SELECT 1 AS epoch, '{_CHG_TOKEN}' AS token
        FROM documents, UNNEST(generate_series(1, {_CHG_BURST_N})) AS u(j)
        WHERE doc_id % {_CHG_BURST_MOD} = 1
    ),
    counts AS (
        SELECT token,
               CAST(SUM(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(SUM(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM toks GROUP BY 1
    )
    SELECT token, n_a, n_b, n_b - n_a AS delta, 1 AS within_cms_bound
    FROM counts
    ORDER BY abs(n_b - n_a) DESC, token
    LIMIT 25
    """,
)
def cms_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 heavy changers between two epochs: exact per-epoch
    counts and delta (total order |delta| desc, token), with the
    sketch-differencing estimate flag (see block comment).

    Scale shape: ONE (epoch, token) conditional-sum aggregation
    pivots both epochs in a single shuffle; each epoch's CMS builds
    from its slice of the distinct-key counts table and collapses to
    a one-row broadcast; probes are 2·D unrolled element_at lookups
    on 25 rows. At 100 TB the two sketches are per-day artifacts —
    the delta estimate needs NEITHER day's key table, which is the
    entire point of signed counter mergeability."""
    from ..operators.sketch import CMS_WIDTH, cms_build, cms_estimate

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        (F.col("doc_id") % 2).alias("epoch"),
        F.explode(F.expr(_TOKENS)).alias("token"),
    ).unionByName(
        docs.filter(F.col("doc_id") % _CHG_BURST_MOD == 1).select(
            F.lit(1).cast("long").alias("epoch"),
            F.explode(
                F.expr(f"transform(sequence(1, {_CHG_BURST_N}), "
                       f"j -> '{_CHG_TOKEN}')")
            ).alias("token"),
        )
    )
    counts = (
        toks.groupBy("token")
        .agg(
            F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
        # consumers: two sketch builds, two totals, the top-k
        .localCheckpoint(eager=False)
    )
    cms_a = cms_build(counts.filter(F.col("n_a") > 0), "token", "n_a")
    cms_b = cms_build(counts.filter(F.col("n_b") > 0), "token", "n_b")
    totals = counts.agg(
        F.sum("n_a").alias("__na"), F.sum("n_b").alias("__nb")
    )
    topk = (
        counts.orderBy(F.desc(F.abs(F.col("n_b") - F.col("n_a"))), "token")
        .limit(25)
        .crossJoin(F.broadcast(totals))
    )
    probed = cms_estimate(topk, "token", cms_a, out_col="est_a")
    probed = cms_estimate(probed, "token", cms_b, out_col="est_b")
    bound = F.expr(
        f"greatest(div(8 * __na, {CMS_WIDTH}), 2L)"
        f" + greatest(div(8 * __nb, {CMS_WIDTH}), 2L)"
    )
    est_delta = F.col("est_b") - F.col("est_a")
    exact_delta = F.col("n_b") - F.col("n_a")
    return probed.select(
        "token",
        "n_a",
        "n_b",
        exact_delta.alias("delta"),
        (F.abs(est_delta - exact_delta) <= bound)
        .cast("int")
        .alias("within_cms_bound"),
    ).orderBy(F.desc(F.abs(F.col("delta"))), "token")


# ---------------------------------------------------------------------------
# phonetic matching (r9): Spark's NATIVE soundex pinned against a
# hand-transcribed SQL oracle — the phonetic sibling of the FastSS
# fuzzy matcher (entity resolution: 'Robert' ≡ 'Rupert').
# ---------------------------------------------------------------------------
#
# DuckDB has no soundex, so the oracle TRANSCRIBES the algorithm
# Spark implements (probed on a 17-name edge battery, unit-pinned):
# lastCode starts at the FIRST letter's code; H/W continue WITHOUT
# updating lastCode; vowels update it to 0 without appending; a code
# appends iff ∉ {0, lastCode}. As string algebra with no
# backreferences (RE2 has none):
#
#   mapped  = translate(upper(s), A..Z, '01230127022455012623017202')
#   no_hw   = replace(mapped, '7', '')      # H/W transparency
#   dedup   = collapse runs of each digit   # log2 replace passes
#   body    = iff first code ≠ 7: drop dedup's head (the first
#             letter's own run) else keep   # Wright vs Pfister
#   digits  = replace(body, '0', '')        # vowels only BREAK runs
#   out     = first letter || rpad3(digits)
#
# Probed pins: Wright→W623 (W's 7 must NOT strip r's 6),
# Pfister→P236 (f dedups against P), Ashcraft→A261 (s~c across h),
# Whyte→W300, Hw→H000, Tymczak→T522, McDonald→M235.

_SOUNDEX_MAP = "01230127022455012623017202"


def _soundex_sql(col: str, max_len_log2: int = 6) -> str:
    """The transcription above as one SQL expression — identical text
    on Spark and DuckDB (translate/replace/upper/substring only).

    DOMAIN: purely ALPHABETIC non-empty strings. Spark's native
    soundex treats non-letters specially (a digit resets lastCode
    like a vowel; a non-letter FIRST char returns the input
    unchanged), while translate() passes them through where they are
    indistinguishable from soundex code digits — verified divergent
    ('w42x1' → W200 native vs W421 here). The gate enforces the
    domain with an in-plan assert (review r9)."""
    m = f"translate(upper({col}), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_MAP}')"
    s = f"replace({m}, '7', '')"
    for d in "0123456":
        for _ in range(max_len_log2):
            s = f"replace({s}, '{d}{d}', '{d}')"
    body = (
        f"CASE WHEN substring({m}, 1, 1) = '7' THEN {s} "
        f"ELSE substring({s}, 2) END"
    )
    return (
        f"(upper(substring({col}, 1, 1)) || "
        f"substring(replace({body}, '0', '') || '000', 1, 3))"
    )


_SOUNDEX_BATTERY = (
    "Wright", "Hubert", "Whyte", "Aeiouy", "Lee", "Bob", "McDonald",
    "OBrien", "Szczecin", "Jackson", "Tymczak", "Pfister", "Ashcraft",
    "Honeyman", "Wu", "Hw", "Robert",
)
_SOUNDEX_NAME_CASE = (
    "CASE WHEN doc_id % 3 = 0 THEN CASE CAST(doc_id % 17 AS INT) "
    + " ".join(
        f"WHEN {i} THEN '{n}'" for i, n in enumerate(_SOUNDEX_BATTERY)
    )
    + " END ELSE first_tok END"
)


@register(
    "soundex_name_groups",
    f"""
    WITH named AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t != '')[1]
                   AS first_tok
        FROM documents
    ),
    coded AS (
        SELECT doc_id, {_SOUNDEX_NAME_CASE} AS name FROM named
    )
    SELECT {_soundex_sql('name')} AS code,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM coded
    GROUP BY 1
    ORDER BY 1
    """,
)
def soundex_name_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking groups: every third doc carries a classic
    edge-battery surname (17 names covering the H/W transparency,
    first-letter-dedup, vowel-break and padding rules), the rest use
    their first corpus token — grouped by Spark's NATIVE ``soundex``
    and pinned against the transcribed SQL oracle (see block comment;
    DuckDB has no soundex, so this is the edit_distance_histogram
    native-vs-reimplementation device pointed the other way).

    Shape: one narrow projection (native codegen soundex) + a
    codes-sized aggregation."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    named = docs.select(
        "doc_id",
        F.expr(f"{_TOKENS}[0]").alias("first_tok"),
    )
    coded = named.select(
        "doc_id", F.expr(_SOUNDEX_NAME_CASE).alias("name")
    )
    # the transcription's domain is letters-only (see _soundex_sql):
    # a digit/apostrophe in a future corpus token would make native
    # and transcription diverge on DATA, not code — fail loudly
    # instead (the html/markdown guard device; unprunable concat)
    guard = F.coalesce(
        F.assert_true(
            F.col("name").isNotNull()
            & F.col("name").rlike("^[A-Za-z]+$"),
            F.lit(
                "soundex_name_groups: name outside the letters-only "
                "domain — Spark's native soundex and the transcribed "
                "oracle diverge on non-letter characters"
            ),
        ).cast("string"),
        F.lit(""),
    )
    return (
        coded.select(
            "doc_id",
            F.soundex(F.concat(guard, F.col("name"))).alias("code"),
        )
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("code")
    )


def bm25_train(spark: SparkSession, sf_dir: str):
    """(weights, tt, nn): the corpus-level BM25 model — per-term
    floor-log2 idf weights plus the (total tokens, doc count) totals —
    collected for compiling into a serving stream's plan (the
    ppl_train_model discipline: the collected table is TERMS-sized,
    never corpus-sized)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(_TOKENS).alias("t")
    )
    lens = docs.select(F.size("t").cast("long").alias("dl"), "t")
    tot = lens.agg(
        F.sum("dl").cast("long").alias("tt"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    ).collect()[0]
    df_rows = (
        lens.select(F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_SEARCH_TERMS))
        .select("term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    # document frequency, not occurrence count: recompute per doc
    dfs = (
        docs.select(
            "doc_id", F.explode(F.array_distinct("t")).alias("term")
        )
        .filter(F.col("term").isin(*_SEARCH_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    del df_rows
    nn = int(tot["nn"])

    def w_of(df: int) -> int:
        c = 0
        while df << (c + 1) <= nn:
            c += 1
        return min(_IDF_CLAMP, c)

    weights = {r["term"]: w_of(int(r["df"])) for r in dfs}
    return weights, int(tot["tt"]), nn


# ---------------------------------------------------------------------------
# Fellegi–Sunter record linkage (r9): the published probabilistic-ER
# decision model over three field comparators — exact match, phonetic
# (soundex) match, and levenshtein ≤ 1 — with integer log-odds
# weights. The capstone that composes the entity-resolution
# primitives (fuzzy_name_match's edit distance, soundex_name_groups'
# phonetic code) into the classic link / possible / non-link rule.
# ---------------------------------------------------------------------------
#
# Weights are the floor-log2 of m/u odds for plausible published-ish
# comparator reliabilities (m=.94/u=.06 → +4/−2 exact, m=.9/u=.11 →
# +3/−2 phonetic, m=.85/u=.2 → +2/−1 edit, m=.9/u=.11 → +3/−2
# Jaro-Winkler ≥ 0.9 — the r12 fourth comparator, scored by the
# operators/jarowinkler.py exact-integer chain on the Spark side and
# the shared jw_oracle_ctes transcription on the oracle side, both
# pinned against DuckDB's NATIVE scorer by the jaro_winkler_pairs
# gate), fixed integer constants —
# the DECISION arithmetic is what the gate pins, per synthesized pair
# class: exact copy / one-char substitution (lev 1, phonetic broken —
# the first letter changes) / 2-char truncation / unrelated. The
# comparator γ vector is COMPUTED per pair by both engines (Spark
# native soundex vs the transcribed oracle; levenshtein native on
# both), never assumed per class.

_FS_W = {"exact": (4, -2), "phon": (3, -2), "lev": (2, -1),
         "jw": (3, -2)}
_FS_LINK, _FS_NONLINK = 5, -3

# Jaro-Winkler ppm threshold for the γ_jw comparator (0.9 — the
# published near-match band; the jaro_winkler_pairs gate pins the
# scorer itself against DuckDB's native implementation).
_FS_JW_PPM = 900_000


# ---------------------------------------------------------------------------
# Shared DuckDB transcription of the exact-integer Jaro-Winkler spec
# (operators/jarowinkler.py is the Spark side; semantics pinned
# against duckdb.jaro_winkler_similarity on 60k generated pairs).
# ONE builder feeds the jaro_winkler_pairs gate (plans/curation.py)
# AND the record_linkage γ_jw comparator so the two oracles cannot
# desynchronize (the _span_oracle_sql discipline).
# ---------------------------------------------------------------------------


def jw_oracle_ctes(src: str, a: str, b: str, carry: str = "") -> str:
    """CTE text ``__jw_base → __jw_matched → __jw_counted`` computing
    (la, lb, m, t2, prefix_l) for string columns ``a``/``b`` of CTE
    ``src``, carrying ``carry`` columns through. DuckDB's list_reduce
    has no initial-accumulator argument, so the fold runs over
    single-index lists prepended with a [-1] sentinel."""
    c = (carry + ", ") if carry else ""
    return f"""
    __jw_base AS (
        SELECT {c}{a}, {b}, length({a}) AS la, length({b}) AS lb,
               greatest((greatest(length({a}), length({b})) // 2) - 1, 0)
                   AS __w
        FROM {src}
    ),
    __jw_matched AS (
        SELECT {c}{a}, {b}, la, lb,
               list_filter(
                 list_reduce(
                   list_prepend([-1], list_transform(
                       CASE WHEN la < 1 THEN []
                            ELSE generate_series(0, la - 1) END,
                       i -> [i])),
                   (acc, x) -> list_concat(acc,
                     list_filter(
                       [list_min(list_filter(
                           generate_series(greatest(0, x[1] - __w),
                                           least(lb - 1, x[1] + __w)),
                           j -> substring({b}, j + 1, 1)
                                    = substring({a}, x[1] + 1, 1)
                                AND NOT list_contains(acc, j)))],
                       v -> v IS NOT NULL))),
                 v -> v >= 0) AS mj
        FROM __jw_base
    ),
    __jw_counted AS (
        SELECT {c}{a}, {b}, la, lb, CAST(len(mj) AS BIGINT) AS m,
               CAST(len(list_filter(
                   CASE WHEN len(mj) < 1 THEN []
                        ELSE generate_series(1, len(mj)) END,
                   k -> substring({b}, mj[k] + 1, 1)
                        != substring({b}, list_sort(mj)[k] + 1, 1)))
                 AS BIGINT) AS t2,
               CAST(len(list_filter([1, 2, 3, 4],
                   k -> k <= least(la, lb)
                        AND substring({a}, 1, k) = substring({b}, 1, k)))
                 AS BIGINT) AS prefix_l
        FROM __jw_matched
    )"""


# exact-integer jw_ppm over __jw_counted's columns; `//` floors ==
# Spark `div` truncation (all operands non-negative, rule 27). The
# boost DECISION is the shared-float expression — a rational exactly
# 7/10 must boost like the native float path does (see
# operators/jarowinkler.py module docstring).
JW_PPM_SQL = """
    CASE WHEN m = 0 THEN CAST(0 AS BIGINT) ELSE
      CAST((1000000 * (
        CASE WHEN ((m / CAST(la AS DOUBLE)) + (m / CAST(lb AS DOUBLE))
                   + ((m - t2//2) / CAST(m AS DOUBLE)))
                  / CAST(3 AS DOUBLE) > CAST(0.7 AS DOUBLE)
             THEN prefix_l * (3*la*lb*m)
                  + (10 - prefix_l)
                    * (m*m*(la+lb) + (m - t2//2)*la*lb)
             ELSE 10 * (m*m*(la+lb) + (m - t2//2)*la*lb)
        END)) // (10 * (3*la*lb*m)) AS BIGINT) END
"""


@register(
    "record_linkage_decisions",
    f"""
    WITH base AS (
        SELECT doc_id,
               COALESCE(list_filter({_SQL_TOKENS},
                                    x -> length(x) >= 4)[1],
                        'placeholder') AS a
        FROM documents
    ),
    pairs AS (
        SELECT doc_id, doc_id % 4 AS cls, a,
               CASE doc_id % 4
                    WHEN 0 THEN a
                    WHEN 1 THEN 'z' || substring(a, 2)
                    WHEN 2 THEN substring(a, 1, length(a) - 2)
                    ELSE 'zq' || a END AS b
        FROM base
    ),
    {jw_oracle_ctes('pairs', 'a', 'b', carry='cls')},
    gammas AS (
        SELECT cls,
               CASE WHEN a = b THEN {_FS_W['exact'][0]}
                    ELSE {_FS_W['exact'][1]} END
               + CASE WHEN {_soundex_sql('a')} = {_soundex_sql('b')}
                      THEN {_FS_W['phon'][0]}
                      ELSE {_FS_W['phon'][1]} END
               + CASE WHEN levenshtein(a, b) <= 1 THEN {_FS_W['lev'][0]}
                      ELSE {_FS_W['lev'][1]} END
               + CASE WHEN ({JW_PPM_SQL}) >= {_FS_JW_PPM}
                      THEN {_FS_W['jw'][0]}
                      ELSE {_FS_W['jw'][1]} END AS score
        FROM __jw_counted
    )
    SELECT CAST(cls AS BIGINT) AS cls,
           CASE WHEN score >= {_FS_LINK} THEN 'link'
                WHEN score <= {_FS_NONLINK} THEN 'non_link'
                ELSE 'possible' END AS decision,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(score) AS BIGINT) AS score_sum
    FROM gammas
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def record_linkage_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter decisions per synthesized pair class: the
    integer log-odds score over (exact, soundex, levenshtein ≤ 1,
    jaro_winkler ≥ 0.9) comparators and the link/possible/non-link
    rule (see block comment). The Spark side scores with NATIVE
    soundex/levenshtein plus the hand-built exact-integer JW chain;
    the oracle re-derives every γ with the transcribed soundex, its
    own levenshtein, and the shared JW transcription — a comparator
    or threshold defect splits the hash.

    Shape: fully in-row scoring (both record fields ride the same
    row — blocking/candidate generation is fuzzy_name_match's job),
    then a (4 × 3)-bounded agg."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.coalesce(
            F.expr(f"filter({_TOKENS}, x -> length(x) >= 4)[0]"),
            F.lit("placeholder"),
        ).alias("a"),
    )
    # the transcribed-soundex oracle's domain is letters-only (same
    # verified divergence as soundex_name_groups: digits reset
    # lastCode natively but pass through translate()) — fail loudly
    # on out-of-domain tokens instead of silently hash-mismatching
    # (the html/markdown unprunable concat-guard device)
    guard = F.coalesce(
        F.assert_true(
            F.col("a").rlike("^[A-Za-z]+$"),
            F.lit(
                "record_linkage_decisions: token outside the "
                "letters-only soundex domain — Spark's native soundex "
                "and the transcribed oracle diverge on non-letter "
                "characters"
            ),
        ).cast("string"),
        F.lit(""),
    )
    base = base.select(
        "doc_id", F.concat(guard, F.col("a")).alias("a")
    )
    pairs = base.select(
        (F.col("doc_id") % 4).alias("cls"),
        "a",
        F.expr(
            "CASE CAST(doc_id % 4 AS INT) "
            "WHEN 0 THEN a "
            "WHEN 1 THEN concat('z', substring(a, 2)) "
            "WHEN 2 THEN substring(a, 1, length(a) - 2) "
            "ELSE concat('zq', a) END"
        ).alias("b"),
    )
    from ..operators.jarowinkler import jaro_winkler_scored

    pairs = jaro_winkler_scored(pairs, "a", "b")
    we, wp, wl = _FS_W["exact"], _FS_W["phon"], _FS_W["lev"]
    wj = _FS_W["jw"]
    score = (
        F.when(F.col("a") == F.col("b"), we[0]).otherwise(we[1])
        + F.when(F.soundex("a") == F.soundex("b"), wp[0]).otherwise(wp[1])
        + F.when(F.levenshtein("a", "b") <= 1, wl[0]).otherwise(wl[1])
        + F.when(F.col("jw_ppm") >= _FS_JW_PPM, wj[0]).otherwise(wj[1])
    )
    return (
        pairs.select("cls", score.alias("score"))
        .select(
            F.col("cls").cast("long").alias("cls"),
            "score",
            F.when(F.col("score") >= _FS_LINK, "link")
            .when(F.col("score") <= _FS_NONLINK, "non_link")
            .otherwise("possible")
            .alias("decision"),
        )
        .groupBy("cls", "decision")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("score").cast("long").alias("score_sum"),
        )
        .orderBy("cls", "decision")
    )


# ---------------------------------------------------------------------------
# retrieval-evaluation metrics (new family, r10): the offline eval
# pass every search/RAG pipeline runs over its top-k lists —
# precision@k, recall@k, MRR, nDCG@k — ALL integer-exact. Graded
# relevance and a noisy system ranking are synthesized in-plan
# (rel ∈ {0,1,3} from doc_id residues — the 3-class capped to a
# FIXED handful (doc_id < 970 residue class) so top-k must mix grades
# at EVERY corpus size; score = 200·rel + md5-head %
# 2500 — hash-VALUE semantics, so md5 via the priority_sample device,
# never engine-specific hash() — class bands OVERLAP and real
# inversions exist, so nDCG sits
# strictly inside (0,1)). The irrational 1/log2(rank+1) discount
# enters BOTH plans as precomputed integer ppm literals (the Benford
# device; pinned against math.log2 in tests), gains are 2^rel − 1, and
# every emitted metric is a positive BIGINT floor division (ppm), so
# Spark `div` == DuckDB `//`.
#
# Scale shape note: ranks come from one row_number window partitioned
# by query — exact and fine for an EVAL set (queries × corpus is
# top-k-list-sized in practice because the candidate lists are the
# retriever's OUTPUT); a full-corpus rerank at 100 TB would rank
# through the cosine_topk_batch grouped-TakeOrdered device instead.
# ---------------------------------------------------------------------------

import math as _math

_EVAL_K = 10
_EVAL_QUERIES = 4
# floor(1e6 / log2(rank + 1)) for rank = 1..K
_NDCG_W_PPM = tuple(
    int(1_000_000 // _math.log2(r + 1)) for r in range(1, _EVAL_K + 1)
)


def _eval_rel_sql(q: str, d: str) -> str:
    """Graded relevance: 3 for the sparse residue class, 1 for the
    denser one, else 0 — identical text both engines."""
    return (
        f"CASE WHEN {d} < 970 AND {d} % (97 + {q}) = 0 THEN 3 "
        f"WHEN {d} % (7 + {q}) = 0 THEN 1 ELSE 0 END"
    )


def _ndcg_w_case(rank: str) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W_PPM)
    )
    return f"CASE {rank} {whens} ELSE 0 END"


@register(
    "retrieval_eval_metrics",
    f"""
    WITH qs AS (
        SELECT * FROM (VALUES {", ".join(f"({q})" for q in range(_EVAL_QUERIES))}) AS t(q)
    ),
    scored AS (
        SELECT qs.q, d.doc_id,
               {_eval_rel_sql("qs.q", "d.doc_id")} AS rel,
               200 * ({_eval_rel_sql("qs.q", "d.doc_id")})
                 + ('0x' || substring(md5(CAST(d.doc_id * 41 + qs.q
                       AS VARCHAR)), 1, 8))::BIGINT % 2500 AS score
        FROM documents d, qs
    ),
    ranked AS (
        SELECT q, doc_id, rel,
               row_number() OVER (
                   PARTITION BY q ORDER BY score DESC, doc_id
               ) AS rnk,
               row_number() OVER (
                   PARTITION BY q ORDER BY rel DESC, doc_id
               ) AS irnk
        FROM scored
    ),
    totals AS (
        SELECT q, CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_rel
        FROM scored GROUP BY 1
    ),
    topk AS (
        SELECT q,
               CAST(SUM(CASE WHEN rnk <= {_EVAL_K} AND rel > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS hits,
               CAST(MIN(CASE WHEN rel > 0 THEN rnk END) AS BIGINT)
                   AS first_rel,
               CAST(SUM(CASE WHEN rnk <= {_EVAL_K}
                        THEN ((1 << rel) - 1) * ({_ndcg_w_case("rnk")})
                        ELSE 0 END) AS BIGINT) AS dcg,
               CAST(SUM(CASE WHEN irnk <= {_EVAL_K}
                        THEN ((1 << rel) - 1) * ({_ndcg_w_case("irnk")})
                        ELSE 0 END) AS BIGINT) AS idcg
        FROM ranked GROUP BY 1
    )
    SELECT t.q AS query_id,
           t.n_rel,
           k.hits,
           CAST((1000000 * k.hits) // {_EVAL_K} AS BIGINT) AS prec_ppm,
           CAST((1000000 * k.hits) // t.n_rel AS BIGINT) AS recall_ppm,
           CAST(1000000 // k.first_rel AS BIGINT) AS mrr_ppm,
           CAST((1000000 * k.dcg) // k.idcg AS BIGINT) AS ndcg_ppm
    FROM totals t JOIN topk k ON t.q = k.q
    ORDER BY query_id
    """,
)
def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """precision@{_EVAL_K} / recall@{_EVAL_K} / MRR / nDCG@{_EVAL_K}
    per synthesized query, every metric an exact integer ppm (see
    block comment — the log2 discounts are shared ppm literals and the
    final ratios positive floor divisions). The system and ideal
    rankings ride TWO row_number windows over ONE query-partitioned
    exchange (same partitioning, different order — one shuffle)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    qs = spark.range(_EVAL_QUERIES).select(F.col("id").alias("q"))
    rel = F.expr(_eval_rel_sql("q", "doc_id"))
    scored = (
        docs.crossJoin(F.broadcast(qs))
        .select(
            "q",
            "doc_id",
            rel.alias("rel"),
            (
                F.lit(200) * rel
                + F.expr(
                    "cast(conv(substring(md5(cast(cast(doc_id * 41 + q"
                    " as string) as binary)), 1, 8), 16, 10) as bigint)"
                    " % 2500"
                )
            ).alias("score"),
        )
        .localCheckpoint(eager=False)  # two windows + the totals agg
    )
    w_sys = Window.partitionBy("q").orderBy(F.desc("score"), "doc_id")
    w_ideal = Window.partitionBy("q").orderBy(F.desc("rel"), "doc_id")
    ranked = scored.select(
        "q",
        "rel",
        F.row_number().over(w_sys).alias("rnk"),
        F.row_number().over(w_ideal).alias("irnk"),
    )
    totals = scored.groupBy("q").agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rel")
    )
    gain = F.expr("(shiftleft(1, rel) - 1)")
    topk = ranked.groupBy("q").agg(
        F.sum(
            F.when((F.col("rnk") <= _EVAL_K) & (F.col("rel") > 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("hits"),
        F.min(F.when(F.col("rel") > 0, F.col("rnk")))
        .cast("long")
        .alias("first_rel"),
        F.sum(
            F.when(
                F.col("rnk") <= _EVAL_K,
                gain * F.expr(_ndcg_w_case("rnk")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("dcg"),
        F.sum(
            F.when(
                F.col("irnk") <= _EVAL_K,
                gain * F.expr(_ndcg_w_case("irnk")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("idcg"),
    )
    return (
        totals.join(topk, "q")
        .select(
            F.col("q").cast("long").alias("query_id"),
            "n_rel",
            "hits",
            F.expr(f"(1000000 * hits) div {_EVAL_K}")
            .cast("long")
            .alias("prec_ppm"),
            F.expr("(1000000 * hits) div n_rel")
            .cast("long")
            .alias("recall_ppm"),
            F.expr("1000000 div first_rel").cast("long").alias("mrr_ppm"),
            F.expr("(1000000 * dcg) div idcg")
            .cast("long")
            .alias("ndcg_ppm"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# k-core decomposition (graph family, r10): iterative degree peeling —
# the density filter a graph-curation pipeline runs before community /
# embedding passes (nodes outside the k-core are peripheral noise).
# A FIXED number of peel rounds (the pagerank chained-CTE device) with
# an in-plan convergence assert: each round drops every node whose
# degree in the CURRENT subgraph is < k; the fixpoint is the k-core.
# The gate's graph is a HIGHER-VARIANCE variant of the shared
# _GRAPH_UND_CTES (chords 1 + node % 6 instead of % 3 — the shared
# graph's degrees are too uniform for a proper-subset core: k=6 peels
# 3 nodes, k=7 cascades to empty), measured to converge in 4/3/16
# rounds at sf0.001/0.01/1 with core sizes 436/500, 4879/5000,
# 45823/50000; the Spark loop stops at the measured fixpoint, the
# oracle unrolls the full R (converged rounds are no-ops), and the
# assert fails LOUDLY if a future corpus needs more than R.
# ---------------------------------------------------------------------------

_KCORE_K = 8
# Peel-cascade depth is DATA-dependent, not log-bounded: measured 4
# rounds at 500 docs, 3 at 5k, 16 at 50k (sf1 — found by the r12
# 100× certification sweep; the convergence assert fired exactly as
# designed). The oracle unrolls this many MATERIALIZED rounds (extra
# rounds are no-ops once converged); the Spark side stops early at
# the measured fixpoint (edge count unchanged) so small SFs never pay
# the full unroll.
_KCORE_ROUNDS = 24
_KCORE_CMOD = 6


def _kcore_graph_ctes() -> str:
    return f"""nodes AS (SELECT doc_id AS node FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    chords AS (
        SELECT node AS src,
               (node * 7 + j * 31 + 11) % (SELECT n FROM tot) AS dst
        FROM nodes, UNNEST(generate_series(1, 1 + node % {_KCORE_CMOD}))
             AS t(j)
    ),
    ring AS (
        SELECT node AS src, (node + j) % (SELECT n FROM tot) AS dst
        FROM nodes, UNNEST(generate_series(1, 2)) AS t(j)
    ),
    edges AS (SELECT * FROM chords UNION ALL SELECT * FROM ring),
    e0 AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src != dst
    )"""


def _kcore_oracle_sql() -> str:
    rounds = []
    for r in range(1, _KCORE_ROUNDS + 1):
        # every round CTE MATERIALIZED: e_r references e_{r-1} three
        # times and DuckDB inlines plain CTEs — 3^R copies of the edge
        # build exhausted the fd limit before materialization
        rounds.append(
            f"""k{r} AS MATERIALIZED (
        SELECT x FROM (SELECT a AS x FROM e{r - 1}
                       UNION ALL SELECT b FROM e{r - 1})
        GROUP BY x HAVING COUNT(*) >= {_KCORE_K}
    ),
    e{r} AS MATERIALIZED (
        SELECT a, b FROM e{r - 1}
        WHERE a IN (SELECT x FROM k{r}) AND b IN (SELECT x FROM k{r})
    )"""
        )
    last = f"e{_KCORE_ROUNDS}"
    return f"""
    WITH {_kcore_graph_ctes()},
    {", ".join(rounds)}
    SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM (SELECT a AS x FROM {last} UNION ALL SELECT b FROM {last})
    GROUP BY x
    ORDER BY node
    """


@register("kcore_membership", _kcore_oracle_sql())
def kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, core_deg) for every node surviving {_KCORE_ROUNDS}
    rounds of degree-{_KCORE_K} peeling over the synthesized
    high-variance doc graph — the {_KCORE_K}-core, with an in-plan
    assert that the peeling CONVERGED (every emitted degree ≥ k; a
    graph needing more rounds fails loudly instead of shipping a
    non-core).

    Shape: edges build once (distinct id-ordered pairs) and each round
    is one degree aggregation + two semi-join filters on the shrinking
    edge set, checkpointed per round (two consumers + bounded lineage,
    the pagerank/mmr discipline). At 100 TB the rounds stay
    edge-bounded — peeling never shuffles more than the live edge
    set, and real corpora converge in O(log-ish) rounds for fixed k;
    a full coreness decomposition would run the same loop with k
    escalation."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("node")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    base = docs.crossJoin(F.broadcast(tot))
    chords = base.select(
        F.col("node").alias("src"),
        F.explode(F.expr(f"sequence(1, 1 + node % {_KCORE_CMOD})")).alias(
            "j"
        ),
        "__n",
    ).select("src", F.expr("(src * 7 + j * 31 + 11) % __n").alias("dst"))
    ring = base.select(
        F.col("node").alias("src"),
        F.explode(F.expr("sequence(1, 2)")).alias("j"),
        "__n",
    ).select("src", F.expr("(src + j) % __n").alias("dst"))
    edges = (
        chords.unionByName(ring)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = edges.count()
    for _ in range(_KCORE_ROUNDS):
        ends = edges.select(F.col("a").alias("x")).unionByName(
            edges.select(F.col("b").alias("x"))
        )
        keep = (
            ends.groupBy("x")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") >= _KCORE_K)
            .select("x")
        )
        edges = (
            edges.join(keep.withColumnRenamed("x", "a"), "a")
            .join(keep.withColumnRenamed("x", "b"), "b")
            .select("a", "b")
            .localCheckpoint(eager=False)  # degree agg + next filter
        )
        # fixpoint check: peeling only ever REMOVES edges, so an
        # unchanged count IS convergence (one driver-sized action per
        # round — the component_min_labels fixpoint precedent); the
        # post-loop degree assert still guards the R-exhausted path
        n_next = edges.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    ends = edges.select(F.col("a").alias("x")).unionByName(
        edges.select(F.col("b").alias("x"))
    )
    deg = ends.groupBy(F.col("x").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    )
    # convergence guard: a surviving node under k means R rounds were
    # not enough — fail loudly (zero-summand fold, unprunable)
    guard = F.coalesce(
        F.assert_true(
            F.col("core_deg") >= _KCORE_K,
            F.lit(
                f"kcore_membership: node below degree {_KCORE_K} after "
                f"{_KCORE_ROUNDS} peel rounds — raise _KCORE_ROUNDS"
            ),
        ).cast("long"),
        F.lit(0),
    )
    return deg.select(
        "node", (F.col("core_deg") + guard).alias("core_deg")
    ).orderBy("node")


# ---------------------------------------------------------------------------
# containment pairs (r11): Broder CONTAINMENT c(A,B) = |A∩B| / |min set|
# — the asymmetric companion of resemblance/Jaccard. Quotation and
# excerpt duplication (a doc embedded inside a longer one) sits at low
# Jaccard but containment ≈ 1, so resemblance-threshold dedup never
# sees it; this is the "quote detection" pass of a curation pipeline.
# ---------------------------------------------------------------------------
#
# In-plan synthesis makes EVERY relation class real at every SF
# (review r11 — natural pairs alone left 'overlap'/'weak' empty below
# sf0.1): the %10==0 half of the sampled slice gets a quarter-PREFIX
# "quote" doc (+5e6 — every quote shingle is a source shingle →
# containment 1e6 exactly, modulo the shared stop-shingle cap); the
# %10==5 half gets two MIXTURE clones, prefix-of-A ++ unique junk
# tokens: half-A + quarter-junk (+1e7, containment ≈ 2/3 → 'overlap')
# and quarter-A + half-junk (+1.5e7, ≈ 1/3 → 'weak'). Pairs come from
# the same fused co-occurrence device as ngram_jaccard_pairs;
# containment is ONE positive ppm floor division (Spark div ==
# DuckDB // for non-negatives, rule 27 not needed).

_CONT_SLICE_MOD = 5  # corpus sample: doc_id % 5 == 0
_CONT_QUOTE_MOD = 10  # quotes synthesized for doc_id % 10 == 0
_CONT_QUOTE_BASE = 5_000_000
_CONT_OVERLAP_BASE = 10_000_000  # half-A + quarter-junk mixtures
_CONT_WEAK_BASE = 15_000_000  # quarter-A + half-junk mixtures
_CONT_MIN_PPM = 250_000  # emit floor BELOW the overlap cut: 'weak' has mass


@register(
    "containment_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
        WHERE doc_id % {_CONT_SLICE_MOD} = 0
    ),
    quotes AS (
        SELECT doc_id + {_CONT_QUOTE_BASE} AS doc_id,
               tokens[1 : greatest(len(tokens) // 4, 4)] AS tokens
        FROM toks
        WHERE doc_id % {_CONT_QUOTE_MOD} = 0 AND len(tokens) >= 16
    ),
    mix_overlap AS (
        SELECT doc_id + {_CONT_OVERLAP_BASE} AS doc_id,
               list_concat(
                   tokens[1 : len(tokens) // 2],
                   list_transform(
                       generate_series(1, len(tokens) // 4),
                       i -> 'junk' || doc_id || '_' || i)) AS tokens
        FROM toks
        WHERE doc_id % {_CONT_QUOTE_MOD} = 5 AND len(tokens) >= 16
    ),
    mix_weak AS (
        SELECT doc_id + {_CONT_WEAK_BASE} AS doc_id,
               list_concat(
                   tokens[1 : len(tokens) // 4],
                   list_transform(
                       generate_series(1, len(tokens) // 2),
                       i -> 'junk' || doc_id || '_' || i)) AS tokens
        FROM toks
        WHERE doc_id % {_CONT_QUOTE_MOD} = 5 AND len(tokens) >= 16
    ),
    all_docs AS (
        SELECT * FROM toks UNION ALL SELECT * FROM quotes
        UNION ALL SELECT * FROM mix_overlap
        UNION ALL SELECT * FROM mix_weak
    ),
    shingles AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + {_SHINGLE_N} - 1],
                              'string_agg', ' ') AS shingle
        FROM all_docs,
             UNNEST(generate_series(1, len(tokens) - {_SHINGLE_N} + 1))
                 AS t(i)
    ),
    sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY 1
    ),
    rare AS (
        SELECT shingle FROM shingles GROUP BY 1
        HAVING COUNT(*) <= {_MAX_SHINGLE_DF}
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_common
        FROM shingles a
        JOIN rare r ON a.shingle = r.shingle
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT p.doc_a, p.doc_b,
               CAST(p.n_common AS BIGINT) AS n_common,
               CAST(sa.n AS BIGINT) AS n_a,
               CAST(sb.n AS BIGINT) AS n_b,
               CAST(1000000 * p.n_common // least(sa.n, sb.n) AS BIGINT)
                   AS containment_ppm
        FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b, n_common, n_a, n_b, containment_ppm,
           CASE WHEN containment_ppm >= 900000 THEN 'contained'
                WHEN containment_ppm >= 500000 THEN 'overlap'
                ELSE 'weak' END AS relation
    FROM scored
    WHERE containment_ppm >= {_CONT_MIN_PPM}
    ORDER BY doc_a, doc_b
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs over the sampled slice + planted
    quarter-prefix quotes (see block comment): per candidate pair the
    shared-rare-shingle count, both set sizes, containment of the
    SMALLER set in ppm (one positive floor division), and the
    contained/overlap class. Shape: the fused co-occurrence pass
    (stop-shingle cap bounds pair fan-out); the doc-count-sized sizes
    frame broadcasts only under the size gate (un-hinted shuffle join
    past it — VERDICT r11) — never corpus×corpus."""
    docs_src = spread(load_table(spark, sf_dir, "documents"))
    docs = docs_src.filter(F.col("doc_id") % _CONT_SLICE_MOD == 0)
    # the four union branches all land in sh_arr's single checkpoint,
    # so the scan+split runs once per branch exactly once — an extra
    # toks boundary was A/B'd at zero gain (3.03 vs 3.01 s) and
    # dropped
    toks = docs.select("doc_id", F.expr(_TOKENS).alias("t"))
    quotes = toks.filter(
        (F.col("doc_id") % _CONT_QUOTE_MOD == 0) & (F.size("t") >= 16)
    ).select(
        (F.col("doc_id") + _CONT_QUOTE_BASE).alias("doc_id"),
        F.expr("slice(t, 1, greatest(size(t) div 4, 4))").alias("t"),
    )

    def mixture(base: int, keep_den: int, junk_den: int) -> DataFrame:
        return toks.filter(
            (F.col("doc_id") % _CONT_QUOTE_MOD == 5) & (F.size("t") >= 16)
        ).select(
            (F.col("doc_id") + base).alias("doc_id"),
            F.expr(
                f"concat(slice(t, 1, size(t) div {keep_den}), "
                f"transform(sequence(1, size(t) div {junk_den}), "
                f"i -> concat('junk', doc_id, '_', i)))"
            ).alias("t"),
        )

    # shingle SETS from rebuilt canonical text (single-space by
    # construction — the ngram_jaccard_pairs regex equivalence);
    # two consumers (sizes + pair stream) → checkpoint (rule 12)
    sh_arr = (
        toks.unionByName(quotes)
        .unionByName(mixture(_CONT_OVERLAP_BASE, 2, 4))
        .unionByName(mixture(_CONT_WEAK_BASE, 4, 2))
        .select(
            "doc_id",
            F.array_distinct(
                F.regexp_extract_all(
                    F.concat_ws(" ", "t"),
                    F.lit(_SHINGLE_RE),
                    F.lit(1),
                )
            ).alias("shingles"),
        )
        .localCheckpoint(eager=False)
    )
    sizes = sh_arr.select("doc_id", F.size("shingles").alias("n"))
    grams = sh_arr.select(
        "doc_id", F.explode("shingles").alias("shingle")
    ).select("doc_id", _shingle_key("shingle").alias("sk"))
    pairs = (
        _cooccur_pairs(grams, "sk", max_df=_MAX_SHINGLE_DF)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    scored = (
        pairs.join(
            _size_gated_broadcast(sa, docs_src),
            F.col("doc_a") == F.col("sa.doc_id"),
        )
        .join(
            _size_gated_broadcast(sb, docs_src),
            F.col("doc_b") == F.col("sb.doc_id"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.col("sa.n").cast("long").alias("n_a"),
            F.col("sb.n").cast("long").alias("n_b"),
            F.expr("(1000000 * n_common) div least(sa.n, sb.n)")
            .cast("long")
            .alias("containment_ppm"),
        )
    )
    return (
        scored.filter(F.col("containment_ppm") >= _CONT_MIN_PPM)
        .withColumn(
            "relation",
            F.when(F.col("containment_ppm") >= 900_000, F.lit("contained"))
            .when(F.col("containment_ppm") >= 500_000, F.lit("overlap"))
            .otherwise(F.lit("weak")),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# ROUGE-N evaluation (r11): clipped n-gram precision/recall/F1 — the
# summarization/generation eval metric (Lin 2004) in exact integer
# ppm. MULTISET semantics distinguish it from the set-based
# containment/jaccard gates: each candidate gram occurrence scores at
# most min(count_cand, count_ref) — repetition cannot inflate the
# match, which is the property the clipping exists for.
# ---------------------------------------------------------------------------
#
# Candidate/reference pairs synthesized in-plan over a doc_id % 7
# slice: even docs pair the reference with its PREFIX HALF (high
# precision, ~half recall — the extractive-summary shape); odd docs
# with the REVERSED token stream (ROUGE-1 stays 1e6 exactly — same
# multiset — while ROUGE-2 collapses, pinning order sensitivity AND
# the clipping arithmetic in one class). F1 is the exact rational
# (2·p·r) div (p + r) — positive floor division, both engines.

_ROUGE_SLICE_MOD = 7


@register(
    "rouge_ngram_eval",
    f"""
    WITH toks AS (
        SELECT doc_id, doc_id % 2 AS cls, {_SQL_TOKENS} AS t
        FROM documents
        WHERE doc_id % {_ROUGE_SLICE_MOD} = 0
          AND len({_SQL_TOKENS}) >= 4
    ),
    cand AS (
        SELECT doc_id,
               CASE WHEN cls = 0 THEN t[1 : (len(t) + 1) // 2]
                    ELSE list_reverse(t) END AS t
        FROM toks
    ),
    ref_uni AS (
        SELECT doc_id, u.g, COUNT(*) AS c
        FROM toks, UNNEST(t) AS u(g) GROUP BY 1, 2
    ),
    cand_uni AS (
        SELECT doc_id, u.g, COUNT(*) AS c
        FROM cand, UNNEST(t) AS u(g) GROUP BY 1, 2
    ),
    ref_bi AS (
        SELECT doc_id, g, COUNT(*) AS c FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1])) AS g
            FROM toks
        ) GROUP BY 1, 2
    ),
    cand_bi AS (
        SELECT doc_id, g, COUNT(*) AS c FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1])) AS g
            FROM cand
        ) GROUP BY 1, 2
    ),
    clip1 AS (
        SELECT c.doc_id, SUM(least(c.c, COALESCE(r.c, 0))) AS clip
        FROM cand_uni c LEFT JOIN ref_uni r USING (doc_id, g)
        GROUP BY 1
    ),
    clip2 AS (
        SELECT c.doc_id, SUM(least(c.c, COALESCE(r.c, 0))) AS clip
        FROM cand_bi c LEFT JOIN ref_bi r USING (doc_id, g)
        GROUP BY 1
    ),
    scored AS (
        SELECT t.doc_id, t.cls,
               CAST(k1.clip AS BIGINT) AS clip1,
               CAST(1000000 * k1.clip // len(c.t) AS BIGINT) AS p1_ppm,
               CAST(1000000 * k1.clip // len(t.t) AS BIGINT) AS r1_ppm,
               CAST(k2.clip AS BIGINT) AS clip2,
               CAST(1000000 * k2.clip // (len(c.t) - 1) AS BIGINT)
                   AS p2_ppm,
               CAST(1000000 * k2.clip // (len(t.t) - 1) AS BIGINT)
                   AS r2_ppm
        FROM toks t
        JOIN cand c USING (doc_id)
        JOIN clip1 k1 ON k1.doc_id = t.doc_id
        JOIN clip2 k2 ON k2.doc_id = t.doc_id
    )
    SELECT doc_id, CAST(cls AS BIGINT) AS cls,
           clip1, p1_ppm, r1_ppm,
           CAST(CASE WHEN p1_ppm + r1_ppm = 0 THEN 0
                ELSE (2 * p1_ppm * r1_ppm) // (p1_ppm + r1_ppm) END
                AS BIGINT) AS f1_uni_ppm,
           clip2, p2_ppm, r2_ppm,
           CAST(CASE WHEN p2_ppm + r2_ppm = 0 THEN 0
                ELSE (2 * p2_ppm * r2_ppm) // (p2_ppm + r2_ppm) END
                AS BIGINT) AS f1_bi_ppm
    FROM scored
    ORDER BY doc_id
    """,
)
def rouge_ngram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/ROUGE-2 in exact integer ppm per synthesized
    (candidate, reference) pair (see block comment): clipped unigram
    and bigram match counts, precision/recall as positive ppm floor
    divisions over the gram totals, F1 as the exact rational.

    Shape (r12 opt, guide §2.4): one documents scan → token arrays
    checkpointed (four gram consumers, rule 12); per gram order the
    candidate and reference gram streams UNION with a side flag and
    count in ONE (doc, gram-hash) conditional aggregation — the
    cms_heavy_change pivot device — so the old two-groupBy + equi-join
    shape (3 exchanges + a join per order) collapses to 2 exchanges
    and no join; the clip is Σ least(c_cand, c_ref), identical to the
    left-join form because ref-only grams contribute least(0, rc) = 0.
    GROUP-SET NOTE (ADVICE r12): the fused shape would also emit a
    clip=0 row for a doc with reference grams but NO candidate grams
    (the old left join dropped such docs); that difference is
    unobservable here because the upstream size(t) >= 4 filter
    guarantees a non-empty candidate stream per kept doc AND the
    downstream INNER join on the sizes frame absorbs any extra group
    — if that join ever becomes an outer join, re-pin this edge with
    a fixture. Measured 2.5 → 1.6 s at sf0.1 (matched session, rows
    equal).
    Totals ride the array sizes (no extra pass). Everything
    downstream of the scan is doc-local — corpus-linear at any
    scale."""
    bigrams = (
        "transform(sequence(1, size(t) - 1), "
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    docs = spread(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % _ROUGE_SLICE_MOD == 0
    )
    toks = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % 2).cast("long").alias("cls"),
            F.expr(_TOKENS).alias("t"),
        )
        .filter(F.size("t") >= 4)
        .localCheckpoint(eager=False)
    )
    cand = toks.select(
        "doc_id",
        F.when(
            F.col("cls") == 0,
            F.expr("slice(t, 1, (size(t) + 1) div 2)"),
        )
        .otherwise(F.reverse("t"))
        .alias("t"),
    ).localCheckpoint(eager=False)

    def gram_rows(df: DataFrame, expr: str, side: int) -> DataFrame:
        return (
            df.select("doc_id", F.explode(F.expr(expr)).alias("g"))
            .select(
                "doc_id",
                _shingle_key("g").alias("gk"),
                F.lit(side).alias("s"),
            )
        )

    def clipped(order_expr: str) -> DataFrame:
        # cand (side 0) ∪ ref (side 1) → ONE conditional-sum pivot per
        # (doc, gram) — see docstring; least(0, rc) = 0 keeps ref-only
        # grams out of the clip exactly like the old left join.
        u = gram_rows(cand, order_expr, 0).unionByName(
            gram_rows(toks, order_expr, 1)
        )
        per_key = u.groupBy("doc_id", "gk").agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("c"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("rc"),
        )
        return per_key.groupBy("doc_id").agg(
            F.sum(F.least("c", "rc")).alias("clip")
        )

    k1 = clipped("t")
    k2 = clipped(bigrams)
    sizes = toks.join(
        cand.select("doc_id", F.size("t").alias("n_cand")), "doc_id"
    ).select("doc_id", "cls", F.size("t").alias("n_ref"), "n_cand")
    scored = (
        sizes.join(k1.withColumnRenamed("clip", "clip1"), "doc_id")
        .join(k2.withColumnRenamed("clip", "clip2"), "doc_id")
        .selectExpr(
            "doc_id",
            "CAST(cls AS BIGINT) AS cls",
            "CAST(clip1 AS BIGINT) AS clip1",
            "CAST((1000000 * clip1) div n_cand AS BIGINT) AS p1_ppm",
            "CAST((1000000 * clip1) div n_ref AS BIGINT) AS r1_ppm",
            "CAST(clip2 AS BIGINT) AS clip2",
            "CAST((1000000 * clip2) div (n_cand - 1) AS BIGINT) AS p2_ppm",
            "CAST((1000000 * clip2) div (n_ref - 1) AS BIGINT) AS r2_ppm",
        )
    )
    f1 = (
        "CAST(IF(p{n}_ppm + r{n}_ppm = 0, 0, "
        "(2 * p{n}_ppm * r{n}_ppm) div (p{n}_ppm + r{n}_ppm)) AS BIGINT)"
    )
    return scored.selectExpr(
        "doc_id",
        "cls",
        "clip1",
        "p1_ppm",
        "r1_ppm",
        f1.format(n=1) + " AS f1_uni_ppm",
        "clip2",
        "p2_ppm",
        "r2_ppm",
        f1.format(n=2) + " AS f1_bi_ppm",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# HITS hubs & authorities (r11): the link-analysis family's second
# eigenvector method next to PageRank — hubs point at good
# authorities, authorities are pointed at by good hubs (Kleinberg
# 1999). Float HITS normalizes by an L2 norm; the integer spec here
# rescales each half-step to 1e6 by floor-dividing by the round MAX —
# deterministic, engine-exact, oracle = chained MATERIALIZED CTE
# rounds over the same recurrence text (the pagerank device; rule 28
# — each round CTE is referenced by the max subquery AND the join).
# Same synthesized citation graph as pagerank_doc_graph.
# ---------------------------------------------------------------------------

_HITS_ITER = 3
_HITS_TOP = 20


def _hits_oracle_sql(n_iter: int) -> str:
    ctes = _doc_graph_dir_ctes(materialized=True) + [
        "h0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS s "
        "FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"a{i}r AS MATERIALIZED (SELECT e.dst AS node, "
            f"CAST(SUM(h.s) AS BIGINT) AS s FROM edges e "
            f"JOIN h{i - 1} h ON e.src = h.node GROUP BY 1)"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT n.node, "
            f"CAST((1000000 * COALESCE(r.s, 0)) "
            f"// (SELECT MAX(s) FROM a{i}r) AS BIGINT) AS s "
            f"FROM nodes n LEFT JOIN a{i}r r ON n.node = r.node)"
        )
        ctes.append(
            f"h{i}r AS MATERIALIZED (SELECT e.src AS node, "
            f"CAST(SUM(a.s) AS BIGINT) AS s FROM edges e "
            f"JOIN a{i} a ON e.dst = a.node GROUP BY 1)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT n.node, "
            f"CAST((1000000 * COALESCE(r.s, 0)) "
            f"// (SELECT MAX(s) FROM h{i}r) AS BIGINT) AS s "
            f"FROM nodes n LEFT JOIN h{i}r r ON n.node = r.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.node, a.s AS authority, h.s AS hub "
        f"FROM a{n_iter} a JOIN h{n_iter} h ON a.node = h.node "
        f"ORDER BY authority DESC, a.node LIMIT {_HITS_TOP}"
    )


@register("hits_scores", _hits_oracle_sql(_HITS_ITER))
def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-_HITS_TOP (20) authorities with their hub scores after
    _HITS_ITER (3) integer HITS rounds on the synthesized citation
    graph (operators/graph.hits_integer — see block comment; an
    f-string here would not bind to __doc__). Total order under the
    LIMIT: (authority DESC, node), node unique."""
    from ..operators.graph import hits_integer

    docs, edges = _doc_graph_dir(spark, sf_dir)
    scores = hits_integer(docs, edges, n_iter=_HITS_ITER)
    return (
        scores.orderBy(F.desc("authority"), "node")
        .limit(_HITS_TOP)
        .select("node", "authority", "hub")
    )


# ---------------------------------------------------------------------------
# Good-Turing frequency statistics (r11): the OTHER classical
# smoothing estimator next to Kneser-Ney's continuation counts
# (kn_lm_stats) — count-of-counts N_r and the GT adjusted count
# r* = (r+1)·N_{r+1}/N_r, kept as an exact integer rational pair
# (numerator/denominator; the float division is the caller's last
# step). The N_1/N total mass is the Good-Turing estimate of unseen
# probability — the number a vocabulary-coverage monitor actually
# watches.
# ---------------------------------------------------------------------------

_GT_MAX_R = 20


@register(
    "good_turing_counts",
    f"""
    WITH tok AS (
        SELECT unnest({_SQL_TOKENS}) AS t FROM documents
    ),
    tc AS (
        SELECT t, COUNT(*) AS r FROM tok GROUP BY 1
    ),
    nr AS (
        SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r
        FROM tc WHERE r <= {_GT_MAX_R} GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(r) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM tc
    )
    SELECT nr.r,
           nr.n_r,
           CAST((nr.r + 1) * COALESCE(nx.n_r, 0) AS BIGINT)
               AS r_star_num,
           nr.n_r AS r_star_den,
           CAST(1000000 * nr.r * nr.n_r // t.n_tokens AS BIGINT)
               AS mass_ppm,
           t.n_tokens, t.vocab
    FROM nr
    LEFT JOIN nr nx ON nx.r = nr.r + 1
    CROSS JOIN tot t
    ORDER BY nr.r
    """,
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-of-counts table for Good-Turing smoothing (see block
    comment): per occurrence count r ≤ 20 the type count N_r, the
    adjusted-count rational (r+1)·N_{r+1} / N_r as an exact integer
    pair, and the probability mass of the r-class in ppm (r=1's row
    IS the unseen-mass estimate). Shape: one token explode →
    vocabulary-sized type counts → a ≤20-row count-of-counts agg; the
    self-join for N_{r+1} and the totals ride tiny broadcasts."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tc = (
        docs.select(F.explode(F.expr(_TOKENS)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("r"))
        .localCheckpoint(eager=False)  # nr + totals consumers
    )
    nr = (
        tc.filter(F.col("r") <= _GT_MAX_R)
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    ).localCheckpoint(eager=False)  # output + the N_{r+1} self-join
    tot = tc.agg(
        F.sum("r").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    nx = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("__nx")
    )
    return (
        nr.join(F.broadcast(nx), "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            ((F.col("r") + 1) * F.coalesce("__nx", F.lit(0)))
            .cast("long")
            .alias("r_star_num"),
            F.col("n_r").alias("r_star_den"),
            F.expr("(1000000 * r * n_r) div n_tokens")
            .cast("long")
            .alias("mass_ppm"),
            "n_tokens",
            "vocab",
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# Team-draft interleaving (r12, judge ask #6): the ONLINE search-eval
# family — Radlinski/Kurup/Joachims 2008. Two rankers' lists for a
# query are interleaved by coin-flipped drafting rounds (each round
# the coin winner picks its top not-yet-picked doc first, then the
# other team picks), clicks are attributed to the team that
# contributed the clicked doc, and the per-query winner is the team
# with more clicked contributions. Everything is deterministic and
# engine-shared: coins/clicks are md5-head residues (hash-VALUE
# semantics — the retrieval_eval device), rankings are md5-ranked
# candidate slices, and the sequential draft is an IN-ROW FOLD (the
# open-ideas design: picked-list state; pointers derive from the
# picked set) — Spark aggregate() vs DuckDB list_reduce with the
# [-1]-sentinel accumulator (the jw_oracle_ctes device). Picks are
# integer-encoded doc*2+team so the accumulator stays a BIGINT list;
# a null pick (exhausted list — unreachable at pool 8 > 2*rounds)
# drops via the single-eval array_compact/list_filter append.
# ---------------------------------------------------------------------------

_TDI_QUERIES = 8
_TDI_POOL = 8   # ranked docs per side
_TDI_ROUNDS = 3  # draft iterations (2 picks each)


def _tdi_md5_head(expr: str, engine: str, mod: int) -> str:
    if engine == "spark":
        return (
            f"cast(conv(substring(md5(cast(cast({expr} as string) as "
            f"binary)), 1, 4), 16, 10) as bigint) % {mod}"
        )
    return (
        f"('0x' || substring(md5(CAST(({expr}) AS VARCHAR)), 1, 4))"
        f"::BIGINT % {mod}"
    )


def _tdi_fold(engine: str) -> str:
    """The draft fold body, shared shape across engines: per round r,
    coin -> first/second team, each pick = first element of that
    team's list not already among the picked docs."""
    if engine == "spark":
        def unpicked(lst: str, acc: str) -> str:
            return (
                f"try_element_at(filter({lst}, d -> NOT array_contains("
                f"transform({acc}, e -> e div 2), d)), 1)"
            )

        def app(acc: str, enc: str) -> str:
            return f"concat({acc}, array_compact(array(cast({enc} as bigint))))"

        coin = _tdi_md5_head("q * 7 + r", "spark", 2)
        p1 = (
            f"if({coin} = 0, ({unpicked('la', 'acc')}) * 2, "
            f"({unpicked('lb', 'acc')}) * 2 + 1)"
        )
        acc1 = app("acc", p1)
        p2 = (
            f"if({coin} = 0, ({unpicked('lb', acc1)}) * 2 + 1, "
            f"({unpicked('la', acc1)}) * 2)"
        )
        return (
            f"aggregate(sequence(1, {_TDI_ROUNDS}), "
            f"cast(array() as array<bigint>), "
            f"(acc, r) -> {app(acc1, p2)})"
        )

    def unpicked(lst: str, acc: str) -> str:
        return (
            f"list_filter({lst}, d -> NOT list_contains("
            f"list_transform({acc}, e -> e // 2), d))[1]"
        )

    def app(acc: str, enc: str) -> str:
        return (
            f"list_concat({acc}, list_filter([CAST({enc} AS BIGINT)], "
            f"v -> v IS NOT NULL))"
        )

    coin = _tdi_md5_head("q * 7 + x[1]", "duckdb", 2)
    p1 = (
        f"CASE WHEN {coin} = 0 THEN ({unpicked('la', 'acc')}) * 2 "
        f"ELSE ({unpicked('lb', 'acc')}) * 2 + 1 END"
    )
    acc1 = app("acc", p1)
    p2 = (
        f"CASE WHEN {coin} = 0 THEN ({unpicked('lb', acc1)}) * 2 + 1 "
        f"ELSE ({unpicked('la', acc1)}) * 2 END"
    )
    return (
        f"list_filter(list_reduce(list_prepend([CAST(-1 AS BIGINT)], "
        f"list_transform(generate_series(1, {_TDI_ROUNDS}), "
        f"r -> [CAST(r AS BIGINT)])), "
        f"(acc, x) -> {app(acc1, p2)}), v -> v >= 0)"
    )


@register(
    "team_draft_interleave",
    f"""
    WITH qs AS (
        SELECT * FROM (VALUES
            {", ".join(f"({q})" for q in range(_TDI_QUERIES))}) AS t(q)
    ),
    ranked AS (
        SELECT qs.q, d.doc_id,
               row_number() OVER (PARTITION BY qs.q ORDER BY
                   md5(CAST(d.doc_id * 17 + qs.q AS VARCHAR)), d.doc_id)
                   AS rka,
               row_number() OVER (PARTITION BY qs.q ORDER BY
                   md5(CAST(d.doc_id * 29 + qs.q AS VARCHAR)), d.doc_id)
                   AS rkb
        FROM documents d JOIN qs ON d.doc_id % {_TDI_QUERIES} = qs.q
    ),
    lists AS (
        SELECT q,
               list_transform(list_sort(list_filter(
                   list(CASE WHEN rka <= {_TDI_POOL}
                             THEN [rka, doc_id] END),
                   v -> v IS NOT NULL)), s -> s[2]) AS la,
               list_transform(list_sort(list_filter(
                   list(CASE WHEN rkb <= {_TDI_POOL}
                             THEN [rkb, doc_id] END),
                   v -> v IS NOT NULL)), s -> s[2]) AS lb
        FROM ranked GROUP BY q
    ),
    drafted AS (
        SELECT q, {_tdi_fold("duckdb")} AS picks FROM lists
    ),
    scored AS (
        SELECT q,
               list_aggregate(list_transform(picks, e ->
                   CASE WHEN e % 2 = 0 AND
                        {_tdi_md5_head("(e // 2) * 13 + q", "duckdb", 3)} = 0
                        THEN 1 ELSE 0 END), 'sum') AS clicks_a,
               list_aggregate(list_transform(picks, e ->
                   CASE WHEN e % 2 = 1 AND
                        {_tdi_md5_head("(e // 2) * 13 + q", "duckdb", 3)} = 0
                        THEN 1 ELSE 0 END), 'sum') AS clicks_b,
               list_aggregate(list_transform(picks, e ->
                   CAST(e AS VARCHAR)), 'string_agg', '|') AS interleave
        FROM drafted
    )
    SELECT CAST(q AS BIGINT) AS query_id, interleave,
           CAST(clicks_a AS BIGINT) AS clicks_a,
           CAST(clicks_b AS BIGINT) AS clicks_b,
           CASE WHEN clicks_a > clicks_b THEN 'a'
                WHEN clicks_b > clicks_a THEN 'b'
                ELSE 'tie' END AS winner
    FROM scored
    ORDER BY query_id
    """,
)
def team_draft_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Team-draft interleaving per query (see block comment): the
    md5-coin draft over two md5-ranked top-{_TDI_POOL} lists, the
    encoded interleave, per-team attributed clicks and the winner.

    Shape: one documents scan; two row_number windows share ONE
    q-partition exchange (stacked sorts); one groupBy builds both
    lists; the draft is a fully in-row fold on the {_TDI_QUERIES}-row
    query frame, checkpointed before its three per-position consumers
    (rule 10)."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", (F.col("doc_id") % _TDI_QUERIES).alias("q")
    )
    wa = Window.partitionBy("q").orderBy(
        F.expr("md5(cast(cast(doc_id * 17 + q as string) as binary))"),
        "doc_id",
    )
    wb = Window.partitionBy("q").orderBy(
        F.expr("md5(cast(cast(doc_id * 29 + q as string) as binary))"),
        "doc_id",
    )
    ranked = docs.select(
        "q",
        "doc_id",
        F.row_number().over(wa).alias("rka"),
        F.row_number().over(wb).alias("rkb"),
    )
    lists = ranked.groupBy("q").agg(
        F.expr(
            f"transform(sort_array(collect_list(if(rka <= {_TDI_POOL}, "
            "struct(rka, doc_id), null))), s -> s.doc_id)"
        ).alias("la"),
        F.expr(
            f"transform(sort_array(collect_list(if(rkb <= {_TDI_POOL}, "
            "struct(rkb, doc_id), null))), s -> s.doc_id)"
        ).alias("lb"),
    )
    drafted = lists.select(
        "q", F.expr(_tdi_fold("spark")).alias("picks")
    ).localCheckpoint(eager=False)  # fold array: 3 consumers (rule 10)
    click = _tdi_md5_head("(e div 2) * 13 + q", "spark", 3)
    return drafted.select(
        F.col("q").cast("long").alias("query_id"),
        F.expr(
            "concat_ws('|', transform(picks, e -> cast(e as string)))"
        ).alias("interleave"),
        F.expr(
            f"cast(size(filter(picks, e -> e % 2 = 0 and {click} = 0)) "
            "as long)"
        ).alias("clicks_a"),
        F.expr(
            f"cast(size(filter(picks, e -> e % 2 = 1 and {click} = 0)) "
            "as long)"
        ).alias("clicks_b"),
    ).select(
        "query_id",
        "interleave",
        "clicks_a",
        "clicks_b",
        F.when(F.col("clicks_a") > F.col("clicks_b"), "a")
        .when(F.col("clicks_b") > F.col("clicks_a"), "b")
        .otherwise("tie")
        .alias("winner"),
    ).orderBy("query_id")
