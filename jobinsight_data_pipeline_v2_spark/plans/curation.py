"""Corpus-curation operators: PII scrubbing, repetition quality,
benchmark decontamination.

Net-new capability beyond the reference (training-data pipeline
surface): before a corpus reaches a trainer, a curation pass must
(a) detect and redact PII spans, (b) score documents for degenerate
repetition (the Gopher-style "fraction of duplicate n-grams" family),
and (c) drop documents that leak evaluation benchmarks (n-gram
overlap decontamination). Each is a declarative DataFrame plan with a
DuckDB oracle.

Inputs are the driver's own tables only: PII runs over deterministic
profile strings derived from ``customer`` (whose ``c_phone`` is a real
phone-shaped column); repetition and decontamination run over
``documents``. The pseudo-benchmark is the deterministic slice
``doc_id % 97 = 0`` — at sf0.01 it overlaps the corpus via the planted
near-duplicates, so the operator's hit path is exercised, not just its
zero path.

Oracle-compatibility choices (CLAUDE.md rules):
- regex patterns restrict to character classes + bounded repetition —
  the subset where Java regex (Spark) and RE2 (DuckDB) agree; Spark
  patterns ride in as ``F.lit`` columns (rule 4: SQL string literals
  eat backslashes).
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all default.
- all outputs are exact integers (counts, char deltas, int-division
  buckets) — no float hash hazards; SUMs cast to BIGINT (HUGEINT trap).

Scale design (100 TB):
- ``pii_scrub``: pure narrow map (regex count + replace) + one
  aggregation on a 5-value key — zero pre-agg shuffle, linear scan,
  whole-stage codegen end to end.
- ``repetition_stats``: shuffles are (doc, gram) → doc → bucket, each
  strictly smaller than the last; gram keys are per-doc so no global
  hot key exists. Map-side combine collapses the explode before any
  exchange.
- ``decontaminate``: the benchmark n-gram set is benchmark-sized
  (thousands of docs), so it broadcasts; the corpus side is touched
  once, linearly, with no corpus×corpus join anywhere. This is the
  shape that survives a 100-TB corpus: cost is corpus-linear + one
  tiny broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, spread
from . import register
from .text import _SHINGLE_RE, _SQL_TOKENS
from .text import JW_PPM_SQL as _JW_PPM_SQL
from .text import jw_oracle_ctes as _jw_oracle_ctes

# ---------------------------------------------------------------------------
# PII detection + redaction over customer-derived profile text
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9.#]+@[a-z0-9.]+\.[a-z]{2,}"
_PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

# TPC-H-style phone synthesized deterministically from the keys (the
# testdata customer table carries no c_phone): country code 10+nation,
# then three custkey-derived groups. Engine-shared SQL — lpad / % /
# || / CAST(... AS STRING) behave identically in Spark and DuckDB.
_PHONE_SQL = (
    "CAST(10 + c_nationkey AS STRING)"
    " || '-' || lpad(CAST((c_custkey * 7) % 1000 AS STRING), 3, '0')"
    " || '-' || lpad(CAST((c_custkey * 13) % 1000 AS STRING), 3, '0')"
    " || '-' || lpad(CAST((c_custkey * 31) % 10000 AS STRING), 4, '0')"
)

# Deterministic profile text: every row carries a phone; an email
# appears for custkey % 3 != 0 and a second phone mention for
# custkey % 5 = 0 — so per-segment detection counts vary, not just
# row counts.
_PROFILE_SQL = (
    "c_name"
    " || CASE WHEN c_custkey % 3 != 0 THEN ' <' || lower(c_name) || '@'"
    " || lower(c_mktsegment) || '.example.com>' ELSE '' END"
    f" || ' tel ' || {_PHONE_SQL}"
    f" || CASE WHEN c_custkey % 5 = 0 THEN ' alt ' || {_PHONE_SQL}"
    " ELSE '' END || ' acct ' || c_mktsegment"
)


@register(
    "pii_scrub",
    f"""
    WITH profiles AS (
        SELECT c_mktsegment AS segment, {_PROFILE_SQL} AS profile
        FROM customer
    ),
    scrubbed AS (
        SELECT segment,
               profile,
               len(regexp_extract_all(profile, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(profile, '{_PHONE_RE}')) AS n_phones,
               regexp_replace(
                   regexp_replace(profile, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                   '{_PHONE_RE}', '[PHONE]', 'g') AS redacted
        FROM profiles
    )
    SELECT segment,
           COUNT(*) AS n_profiles,
           CAST(SUM(n_emails) AS BIGINT) AS emails_found,
           CAST(SUM(n_phones) AS BIGINT) AS phones_found,
           CAST(SUM(length(profile) - length(redacted)) AS BIGINT)
               AS removed_chars,
           CAST(SUM(length(redacted)) AS BIGINT) AS redacted_chars
    FROM scrubbed
    GROUP BY 1
    ORDER BY 1
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact: emails and phone numbers per segment.

    The curation primitive every released corpus needs: find PII spans
    (here the two patterns with an exact cross-engine subset — email,
    dashed phone), count them, and measure the redaction delta. The
    whole pass is a narrow projection (regex count + nested
    regexp_replace) feeding one tiny aggregation — no shuffle before
    the 5-group agg, whole-stage codegen throughout, linear at any
    corpus size.
    """
    cust = spread(load_table(spark, sf_dir, "customer"))
    prof = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(_PROFILE_SQL).alias("profile"),
    )
    scrubbed = prof.select(
        "segment",
        "profile",
        F.size(
            F.regexp_extract_all("profile", F.lit(_EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all("profile", F.lit(_PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("profile", F.lit(_EMAIL_RE), F.lit("[EMAIL]")),
            F.lit(_PHONE_RE),
            F.lit("[PHONE]"),
        ).alias("redacted"),
    )
    return (
        scrubbed.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_profiles"),
            F.sum("n_emails").cast("long").alias("emails_found"),
            F.sum("n_phones").cast("long").alias("phones_found"),
            F.sum(F.length("profile") - F.length("redacted"))
            .cast("long")
            .alias("removed_chars"),
            F.sum(F.length("redacted")).cast("long").alias("redacted_chars"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition quality: duplicate-2-gram fraction histogram
# ---------------------------------------------------------------------------

_REP_GRAM_RE = r"(?:^| )(?=(\S+ \S+))"  # overlapping word 2-grams


@register(
    "repetition_stats",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_aggregate(tokens[i : i + 1], 'string_agg', ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(tokens) - 1)) AS t(i)
    ),
    cnts AS (
        SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(MAX(cnt) AS BIGINT) AS top_cnt,
               CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                   AS dup_cnt
        FROM cnts GROUP BY 1
    )
    SELECT CAST(LEAST(9, (10 * dup_cnt) // total) AS BIGINT) AS dup_decile,
           COUNT(*) AS n_docs,
           CAST(SUM(top_cnt) AS BIGINT) AS sum_top,
           CAST(SUM(dup_cnt) AS BIGINT) AS sum_dup,
           CAST(SUM(total) AS BIGINT) AS sum_total
    FROM per_doc
    GROUP BY 1
    ORDER BY 1
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-2-gram repetition histogram (Gopher quality family).

    Per doc: total 2-grams, the hottest 2-gram's count, and the count
    of occurrences belonging to repeated 2-grams; docs bucket into
    deciles of duplicate fraction via INTEGER division (``div`` /
    ``//`` — exact in both engines, no float boundary hazard). The
    corpus-scale repetition filter ("drop docs whose text loops")
    reads its threshold straight off this histogram.

    Gram counts never leave their document, so the whole per-doc stage
    is NARROW: sort the gram array in-row and fold run lengths (equal
    grams are adjacent after the sort) — no (doc, gram) shuffle, no
    doc-keyed shuffle, just the final decile aggregation over one row
    per doc. The fold is cheap string-equality + integer arithmetic
    (sanctioned HOF use, CLAUDE.md rule 10); measured 1.6s → ~0.6s at
    sf0.1 vs the two-level groupBy form.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sorted_grams = F.sort_array(
        F.regexp_extract_all("text", F.lit(_REP_GRAM_RE), F.lit(1))
    )
    # acc = (prev gram, current run length, max run, dup occurrences);
    # finish closes the last run. A run of length r > 1 contributes r
    # duplicate occurrences — identical to SUM(cnt) WHERE cnt > 1.
    run_fold = F.aggregate(
        sorted_grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("top"),
            F.lit(0).cast("long").alias("dup"),
        ),
        lambda a, g: F.struct(
            g.alias("prev"),
            F.when(g.eqNullSafe(a.prev), a.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(g.eqNullSafe(a.prev), a.top).otherwise(F.greatest(a.top, a.run)).alias("top"),
            F.when(g.eqNullSafe(a.prev), a.dup).otherwise(
                a.dup + F.when(a.run > 1, a.run).otherwise(F.lit(0))
            ).alias("dup"),
        ),
        lambda a: F.struct(
            F.greatest(a.top, a.run).alias("top"),
            (a.dup + F.when(a.run > 1, a.run).otherwise(F.lit(0))).alias("dup"),
        ),
    )
    per_doc = docs.select(
        "doc_id",
        F.size(sorted_grams).cast("long").alias("total"),
        run_fold.alias("rl"),
    ).select(
        "doc_id",
        "total",
        F.col("rl.top").alias("top_cnt"),
        F.col("rl.dup").alias("dup_cnt"),
    ).filter(F.col("total") > 0)
    return (
        per_doc.select(
            F.least(F.lit(9).cast("long"), F.expr("(10 * dup_cnt) div total"))
            .cast("long")
            .alias("dup_decile"),
            "top_cnt",
            "dup_cnt",
            "total",
        )
        .groupBy("dup_decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("top_cnt").cast("long").alias("sum_top"),
            F.sum("dup_cnt").cast("long").alias("sum_dup"),
            F.sum("total").cast("long").alias("sum_total"),
        )
        .orderBy("dup_decile")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination: 4-gram overlap vs a held-out benchmark set
# ---------------------------------------------------------------------------

_BENCH_MOD = 97  # pseudo-benchmark: doc_id % 97 = 0


def _grams(side: DataFrame) -> DataFrame:
    """(doc_id, g): the distinct word-{_SHINGLE_N}-grams of each doc —
    per-doc dedup is ``array_distinct`` inside the row (narrow), not a
    global DISTINCT. Shared by the direct and Bloom-prefiltered
    decontamination gates so the gram definition cannot drift."""
    return side.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
            )
        ).alias("g"),
    )


@register(
    "decontaminate",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS tokens FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + 3], 'string_agg', ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(tokens) - 3)) AS t(i)
    ),
    bench AS (SELECT doc_id, g FROM grams WHERE doc_id % {_BENCH_MOD} = 0),
    corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % {_BENCH_MOD} != 0),
    hits AS (
        SELECT b.doc_id,
               COUNT(DISTINCT c.doc_id) AS n_contaminated,
               COUNT(*) AS n_gram_hits
        FROM bench b JOIN corpus c ON b.g = c.g
        GROUP BY 1
    )
    SELECT d.doc_id AS bench_doc_id,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           COALESCE(h.n_gram_hits, 0) AS n_gram_hits
    FROM (SELECT DISTINCT doc_id FROM documents
          WHERE doc_id % {_BENCH_MOD} = 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    ORDER BY 1
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing word-4-grams with
    a held-out benchmark slice (``doc_id % {_BENCH_MOD} = 0``).

    Per benchmark doc: how many corpus docs share at least one 4-gram
    (the standard n-gram-overlap contamination test) and how many
    (bench-gram, corpus-doc) hits there are; zero rows are kept via
    the left join so every benchmark doc reports. The planted
    near-duplicates in ``documents`` make the hit path real at sf0.01.

    Scale shape: the benchmark side is benchmark-sized, so its
    distinct 4-gram set BROADCASTS; the corpus is scanned once,
    linearly — there is no corpus-sized shuffle and no corpus×corpus
    join, which is what keeps decontamination viable against a 100-TB
    corpus (contrast with joining corpus grams against themselves).
    Per-doc gram dedup is ``array_distinct`` inside the row (narrow),
    not a global DISTINCT.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    is_bench = (F.col("doc_id") % _BENCH_MOD) == 0

    # Membership filters run BEFORE shingling: the id predicate pushes
    # to the scan, so the benchmark side regexes only its own slice
    # instead of filtering a full-corpus gram stream per consumer.
    bench = _grams(docs.filter(is_bench))
    corpus = _grams(docs.filter(~is_bench))
    hits = (
        corpus.join(
            F.broadcast(bench.withColumnRenamed("doc_id", "bench_id")), "g"
        )
        .groupBy("bench_id")
        .agg(
            F.count_distinct("doc_id").alias("n_contaminated"),
            F.count(F.lit(1)).alias("n_gram_hits"),
        )
    )
    bench_ids = (
        docs.filter(is_bench).select("doc_id").distinct()
    )
    return (
        bench_ids.join(hits, bench_ids.doc_id == hits.bench_id, "left")
        .select(
            F.col("doc_id").alias("bench_doc_id"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.coalesce("n_gram_hits", F.lit(0)).alias("n_gram_hits"),
        )
        .orderBy("bench_doc_id")
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination: the 100-TB shape of the same test
# ---------------------------------------------------------------------------
#
# `decontaminate` broadcasts the benchmark gram set — right when it
# fits. At fleet scale the benchmark suite's gram set can outgrow a
# broadcast, and the corpus gram stream would have to SHUFFLE into the
# verify join. The production fix is a Bloom filter: the bench grams
# fold into one fixed-size bit array (still broadcastable when the raw
# set is not — ~1.2 bytes/item at 3% FP), the corpus stream drops every
# gram the filter rejects BEFORE the join, and only the surviving
# sliver (true hits + bounded false positives) pays the shuffle. Bloom
# filters have NO false negatives, so the verified output is exact.
#
# Gate device (the approx-percentile pattern): the emitted values are
# the EXACT per-source contamination counts — computed THROUGH the
# bloom path, so a hash match against the direct-join oracle proves the
# no-false-negative property end-to-end — plus an in-plan FP-rate flag:
# (bloom hits − true hits) / clean grams must stay within the filter's
# design bound.

_BLOOM_CAPACITY = 262_144  # design capacity in items
_BLOOM_BITS = 8 * _BLOOM_CAPACITY  # 8 bits/item → ~2.2% FP at capacity
_BLOOM_K = 6  # hash functions: ln2 · bits/items ≈ 5.5, rounded up
_BLOOM_FP_BOUND = 0.05  # design rate + cushion; content ≪ capacity here

# Spark exposes no bloom_filter_agg SQL function, so the filter is
# built from first principles: position j = pmod(xxhash64(g, j), bits),
# packed into 64-bit words.


def bloom_probe_expr(bits: int = _BLOOM_BITS, k: int = _BLOOM_K) -> str:
    """Membership probe over the one-row ``__bfm`` word map: all K bit
    positions of the 64-bit key column ``hk`` set. A missing word →
    NULL element_at → coalesce 0 → bit clear → not contained. Keys are
    hashed ONCE upstream (hk = xxhash64(item)) so the item string is
    droppable before any materialization; positions re-hash the long
    (xxhash64(hk, j)) — cheap fixed-width hashing, j = the classic
    K-independent-functions seed."""
    # UNROLLED (k is a compile-time constant), not a forall lambda:
    # higher-order-function bodies evaluate interpreted (rule 10), and
    # 2k interpreted xxhash64 per gram over a corpus gram stream is
    # the dominant cost — a plain AND chain stays inside whole-stage
    # codegen.
    conds = []
    for j in range(k):
        pos = f"pmod(xxhash64(hk, {j}), {bits})"
        conds.append(
            f"(coalesce(element_at(__bfm, {pos} div 64), 0L)"
            f" & shiftleft(1L, cast({pos} % 64 AS INT))) != 0L"
        )
    return "(" + " AND ".join(conds) + ")"


def bloom_probe(
    df: DataFrame, bits: int = _BLOOM_BITS, k: int = _BLOOM_K
) -> DataFrame:
    """Append the membership verdict ``bh`` to a frame carrying ``hk``
    and the one-row ``__bfm`` word map, then drop the map.

    The K bit positions are HOISTED into their own projection first
    (r6): ``bloom_probe_expr`` references each position twice
    (element_at word lookup + shiftleft mask), and whole-stage codegen
    does not reliably common-subexpression-eliminate across the AND
    chain — hoisting halves the xxhash64 evaluations per gram
    (measured 0.54 → 0.43 s on the pure probe scan at sf0.1). Still
    one codegen'd stage: projection + filterless AND chain.

    Caveat: ``.filter("bh")`` directly on the result lets predicate
    pushdown substitute the __bp definitions back into the join
    condition (re-inlined, two evaluations again). Keep ``bh`` as a
    column until after a materialization boundary — the gate filters
    only past its localCheckpoint; the streaming twin has no boundary
    and accepts the re-inline (cost equal to the pre-r6 expression).
    """
    pos = [
        F.expr(f"pmod(xxhash64(hk, {j}), {bits})").alias(f"__bp{j}")
        for j in range(k)
    ]
    keep = [c for c in df.columns if c != "__bfm"]
    conds = " AND ".join(
        f"(coalesce(element_at(__bfm, __bp{j} div 64), 0L)"
        f" & shiftleft(1L, cast(__bp{j} % 64 AS INT))) != 0L"
        for j in range(k)
    )
    return (
        df.select(*keep, "__bfm", *pos)
        .withColumn("bh", F.expr(conds))
        .select(*keep, "bh")
    )


def bloom_build(
    keys: DataFrame, bits: int = _BLOOM_BITS, k: int = _BLOOM_K
) -> DataFrame:
    """One-row broadcastable Bloom filter over a 64-bit ``hk`` key
    column: each key emits its K bit positions, positions pack into
    64-bit words (bit_or partial-aggregates map-side), and the ≤
    bits/64 words collapse into a single ``__bfm`` map row — the same
    one-row-index discipline as the PQ codebook maps."""
    return (
        keys.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {k - 1}), "
                    f"j -> pmod(xxhash64(hk, j), {bits}))"
                )
            ).alias("pos")
        )
        .select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("w", "bits"))
            ).alias("__bfm")
        )
    )


@register(
    "bloom_decontaminate",
    f"""
    WITH toks AS (
        SELECT doc_id, {{sql_tokens}} AS tokens FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               list_aggregate(tokens[i : i + 3], 'string_agg', ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(tokens) - 3)) AS t(i)
    ),
    bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
    ),
    contaminated AS (
        SELECT DISTINCT c.doc_id
        FROM grams c JOIN bench b USING (g)
        WHERE c.doc_id % {_BENCH_MOD} != 0
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           1 AS bloom_fp_within_bound
    FROM documents d LEFT JOIN contaminated k USING (doc_id)
    WHERE d.doc_id % {_BENCH_MOD} != 0
    GROUP BY 1
    ORDER BY 1
    """.replace("{sql_tokens}", _SQL_TOKENS),
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination counts via the Bloom-prefiltered path:
    bench grams → one broadcast bit-array row (K=6 xxhash64 positions
    packed into 64-bit words via map-side bit_or); corpus grams →
    bit-probe prefilter → exact verify join → per-source distinct
    contaminated docs. Values are exact (no false negatives
    by construction — the oracle computes the same counts with a
    direct join); ``bloom_fp_within_bound`` pins the filter's false-
    positive rate in-plan, so an undersized or mis-hashed filter fails
    the gate even though the exact values would still match.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    is_bench = (F.col("doc_id") % _BENCH_MOD) == 0

    # grams hash to 64-bit keys IMMEDIATELY (hk = xxhash64(g), the
    # _shingle_key convention: equality-on-hash ≡ equality-on-gram
    # absent 64-bit collisions, and every consumer here is an
    # equality join/probe). The gram STRING never survives the
    # projection — the shared checkpoint carries three longs per gram
    # instead of the gram text (measured 5.1 s → ~1 s at sf0.1).
    # two differently-shaped consumers (the bloom fold and the verify
    # join's build side) — checkpoint or the bench slice's regex scan
    # and distinct exchange compute twice (rule 12)
    bench_keys = (
        _grams(docs.filter(is_bench))
        .select(F.xxhash64("g").alias("hk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bloom = bloom_build(bench_keys)
    # one gram stream, two consumers (exact values + the FP monitor):
    # checkpoint the marked stream so the regex shingling and bloom
    # probes run once (rule 12)
    marked = bloom_probe(
        _grams(docs.filter(~is_bench))
        .select("doc_id", F.xxhash64("g").alias("hk"))
        .crossJoin(F.broadcast(bloom))
    ).localCheckpoint(eager=False)
    # the at-scale join shape: only bloom-surviving grams reach the
    # verify join (no broadcast hint — when the bench set outgrows a
    # broadcast this is the shuffle whose input the bloom just cut).
    # hits is consumed twice (values + monitor) but deliberately NOT
    # checkpointed (r6): both inputs are already checkpointed longs,
    # so the recompute is a filter + semi-join — cheaper than a third
    # synchronous materialization barrier (A/B 2.13 → 1.90 s at sf0.1
    # in one session; rule 12 applies to expensive subtrees, not to
    # projections of existing checkpoints)
    hits = marked.filter("bh").join(bench_keys, "hk", "left_semi")
    contaminated = hits.select("doc_id").distinct().withColumn(
        "__c", F.lit(1)
    )
    totals = marked.agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("bh").cast("long")).alias("n_bloom"),
    )
    true_tot = hits.agg(F.count(F.lit(1)).alias("n_true"))
    flag = (
        totals.crossJoin(true_tot)
        .select(
            (
                (F.col("n_bloom") - F.col("n_true")).cast("double")
                / F.greatest(
                    (F.col("n_grams") - F.col("n_true")).cast("double"),
                    F.lit(1.0),
                )
                <= F.lit(_BLOOM_FP_BOUND)
            )
            .cast("int")
            .alias("bloom_fp_within_bound")
        )
    )
    corpus_docs = docs.filter(~is_bench).select("doc_id", "source")
    return (
        corpus_docs.join(F.broadcast(contaminated), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__c", F.lit(0))).cast("long").alias(
                "n_contaminated"
            ),
        )
        .crossJoin(F.broadcast(flag))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# curation funnel: the composed keep/drop decision with per-stage counts
# ---------------------------------------------------------------------------

_FUNNEL_MIN_TOKENS = 20
_FUNNEL_MAX_TOKENS = 1000
_FUNNEL_MIN_STOP = 0.05  # stopword-density language gate
_FUNNEL_MAX_DUP = 0.5  # duplicate-2-gram fraction gate

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"
_SQL_TOKS = "list_filter(string_split(text, ' '), t -> t != '')"


@register(
    "curation_funnel",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, n_chars, {_SQL_TOKS} AS tokens FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_aggregate(tokens[i : i + 1], 'string_agg', ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(tokens) - 1)) AS t(i)
    ),
    dup AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
                   / SUM(cnt) AS dup_frac
        FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2)
        GROUP BY 1
    ),
    staged AS (
        SELECT t.lang, t.n_chars,
               len(t.tokens) BETWEEN {_FUNNEL_MIN_TOKENS} AND {_FUNNEL_MAX_TOKENS}
                   AS ok_len,
               len(t.tokens) > 0 AND
               CAST(len(list_filter(t.tokens, x -> x IN {_STOP_SQL})) AS DOUBLE)
                   / len(t.tokens) >= {_FUNNEL_MIN_STOP} AS ok_lang,
               COALESCE(d.dup_frac, 0) < {_FUNNEL_MAX_DUP} AS ok_rep
        FROM toks t LEFT JOIN dup d USING (doc_id)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN ok_len THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
           CAST(SUM(CASE WHEN ok_len AND ok_lang THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_lang,
           CAST(SUM(CASE WHEN ok_len AND ok_lang AND ok_rep THEN 1 ELSE 0 END)
                AS BIGINT) AS kept,
           CAST(SUM(CASE WHEN ok_len AND ok_lang AND ok_rep THEN n_chars
                    ELSE 0 END) AS BIGINT) AS kept_chars
    FROM staged
    GROUP BY 1
    ORDER BY 1
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation decision: length gate → language gate
    (stopword density) → repetition gate (duplicate-2-gram fraction),
    with per-stage survivor counts and kept volume per language — the
    funnel report every corpus-curation run publishes.

    All three gates evaluate in ONE narrow pass over each document
    (token stats are higher-order array functions; the duplicate
    fraction is the in-row sorted run-length fold from
    repetition_stats), then a 5-group aggregation. No joins, no
    per-stage re-scans — the scan cost is paid once no matter how many
    gates compose, which is what keeps a 10-gate funnel viable at
    100 TB.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    return funnel_report(docs).orderBy("lang")


def funnel_report(docs: DataFrame) -> DataFrame:
    """The funnel itself (narrow gate pass + one 5-group aggregation),
    shared verbatim by the batch gate and
    streaming.curation.funnel_stream — the aggregation is a standard
    streaming groupBy in complete mode. ``docs`` needs (doc_id, lang,
    n_chars, text)."""
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    stop_arr = ", ".join(f"'{w}'" for w in _STOPWORDS)
    sorted_grams = F.sort_array(
        F.regexp_extract_all("text", F.lit(_REP_GRAM_RE), F.lit(1))
    )
    dup_fold = F.aggregate(
        sorted_grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("dup"),
        ),
        lambda a, g: F.struct(
            g.alias("prev"),
            F.when(g.eqNullSafe(a.prev), a.run + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(g.eqNullSafe(a.prev), a.dup)
            .otherwise(a.dup + F.when(a.run > 1, a.run).otherwise(F.lit(0)))
            .alias("dup"),
        ),
        lambda a: a.dup + F.when(a.run > 1, a.run).otherwise(F.lit(0)),
    )
    staged = docs.select(
        "lang",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.expr(f"filter(filter(split(text, ' '), t -> t != ''), x -> x IN ({stop_arr}))")).alias("n_stop"),
        F.size(sorted_grams).alias("n_grams"),
        dup_fold.alias("n_dup"),
    ).select(
        "lang",
        "n_chars",
        F.col("n_tokens").between(_FUNNEL_MIN_TOKENS, _FUNNEL_MAX_TOKENS).alias(
            "ok_len"
        ),
        (
            (F.col("n_tokens") > 0)
            & (
                F.col("n_stop").cast("double") / F.col("n_tokens")
                >= _FUNNEL_MIN_STOP
            )
        ).alias("ok_lang"),
        F.when(
            F.col("n_grams") > 0,
            F.col("n_dup").cast("double") / F.col("n_grams") < _FUNNEL_MAX_DUP,
        )
        .otherwise(F.lit(True))
        .alias("ok_rep"),
    )
    kept = F.col("ok_len") & F.col("ok_lang") & F.col("ok_rep")
    return (
        staged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("ok_len").cast("int")).cast("long").alias("pass_len"),
            F.sum((F.col("ok_len") & F.col("ok_lang")).cast("int"))
            .cast("long")
            .alias("pass_lang"),
            F.sum(kept.cast("int")).cast("long").alias("kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0)))
            .cast("long")
            .alias("kept_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization (sanctioned Arrow edge; DuckDB nfc_normalize
# oracle)
# ---------------------------------------------------------------------------
#
# The corpus is ASCII word soup, so decomposed sequences are
# synthesized IN-PLAN (the cohort/temperature synthesis precedent):
# two of three docs get a suffix carrying combining marks (e+U+0301,
# A+U+0300) that NFC must compose, the third gets a clean suffix that
# must pass through unchanged. The combining characters ride in both
# engines' SQL as literal UTF-8 — Spark's char() is ASCII-modulo and
# DuckDB's chr() is codepoint, so chr() is never used.

_NFC_SUFFIX_CASE = (
    "CASE WHEN doc_id % 3 = 0 THEN ' café' "
    "WHEN doc_id % 3 = 1 THEN ' Àpril' ELSE ' x' END"
)


@register(
    "unicode_nfc_stats",
    f"""
    WITH aug AS (
        SELECT lang, text || {_NFC_SUFFIX_CASE} AS t FROM documents
    ),
    norm AS (
        SELECT lang, t, nfc_normalize(t) AS n FROM aug
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n <> t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           CAST(SUM(length(t)) AS BIGINT) AS chars_before,
           CAST(SUM(length(n)) AS BIGINT) AS chars_after
    FROM norm
    GROUP BY 1
    ORDER BY 1
    """,
)
def unicode_nfc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization, differentially pinned against
    DuckDB's ``nfc_normalize`` (utf8proc) — CPython's ``unicodedata``
    and utf8proc must agree character for character or the per-lang
    changed-doc counts and post-normalization char sums split the
    hash. Two of three docs carry synthesized combining sequences
    (composed under NFC, shrinking the char count by exactly one
    each); the third pins the must-not-change path.

    This is the step that makes every exact-match operator downstream
    (exact dedup, shingle hashing, decontamination) see é and e+U+0301
    as the same document. Scale shape: one Arrow-batched narrow
    projection (operators/unicode_norm.py — Spark has no
    normalization built-in, the documented 4th sanctioned Python
    edge), then one small-key aggregation; stateless, so the same
    column works on streams unchanged.
    """
    from ..operators.unicode_norm import normalize_column

    docs = spread(load_table(spark, sf_dir, "documents"))
    aug = docs.select(
        "lang",
        F.concat("text", F.expr(_NFC_SUFFIX_CASE)).alias("t"),
    )
    norm = aug.withColumn("n", normalize_column("t", "NFC"))
    return (
        norm.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n") != F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
            F.sum(F.length("t")).cast("long").alias("chars_before"),
            F.sum(F.length("n")).cast("long").alias("chars_after"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Luhn-verified card-number scrub (PII hardening)
# ---------------------------------------------------------------------------

# A bare [0-9]{16} regex redacts order ids and timestamps along with
# card numbers; production PII scrubbers verify the Luhn checksum
# before redacting. The checksum is integer-exact and, at a FIXED
# 16-digit width, unrolls to 16 explicit terms (rule 10: constant-trip
# folds in the hot path are unrolled, never lambda-interpreted) —
# SQL text shared verbatim by both engines.


def _luhn_terms_sql(col: str, n_digits: int) -> str:
    """Sum of Luhn-folded digits of the leftmost n_digits of ``col``.

    Standard Luhn over a 16-wide number doubles every second digit
    moving left FROM the check digit — i.e. the ODD 1-based positions
    from the left. The same parity holds for the 15-digit base (the
    check digit at position 16 is even), so one generator serves both
    the synthesis (n=15) and the verify (n=16)."""
    terms = []
    for i in range(1, n_digits + 1):
        d = f"CAST(substring({col}, {i}, 1) AS INT)"
        if i % 2 == 1:
            terms.append(f"(CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 ELSE 2*{d} END)")
        else:
            terms.append(d)
    return " + ".join(terms)


# 15-digit base synthesized from the key (two lpad'd key mixes)
_CARD_BASE_SQL = (
    "lpad(CAST((c_custkey * 2654435761) % 1000000000 AS STRING), 9, '0')"
    " || lpad(CAST((c_custkey * 40503) % 1000000 AS STRING), 6, '0')"
)

# the Luhn-correct check digit for that base; customers where
# custkey % 3 = 0 carry a VALID card, everyone else the same base with
# a deliberately broken check digit (+5 mod 10 can never be correct),
# and custkey % 5 = 0 profiles carry no number at all. The base is a
# NAMED COLUMN (__base) computed once in a prior projection — inlining
# _CARD_BASE_SQL into each of the 15 Luhn terms would restate the
# lpad||lpad expression ~90 times (review r7 s5).
_CARD_SQL = f"""
    CASE WHEN c_custkey % 5 = 0 THEN ''
         ELSE __base
              || CAST(CASE WHEN c_custkey % 3 = 0
                           THEN (10 - (({_luhn_terms_sql('__base', 15)}) % 10)) % 10
                           ELSE ((10 - (({_luhn_terms_sql('__base', 15)}) % 10)) % 10 + 5) % 10
                      END AS STRING)
    END
"""

_CARD_PROFILE_SQL = "c_name || ' card ' || __card || ' seg ' || segment"


@register(
    "luhn_card_scrub",
    f"""
    WITH based AS (
        SELECT c_mktsegment AS segment, c_name, c_custkey,
               {_CARD_BASE_SQL} AS __base
        FROM customer
    ),
    carded AS (
        SELECT segment, c_name, {_CARD_SQL} AS __card FROM based
    ),
    profiles AS (
        SELECT segment, {_CARD_PROFILE_SQL} AS profile FROM carded
    ),
    found AS (
        SELECT segment, profile,
               regexp_extract(profile, '[0-9]{{16}}', 0) AS cand
        FROM profiles
    ),
    verified AS (
        SELECT segment, profile, cand,
               CASE WHEN cand <> ''
                    THEN ({_luhn_terms_sql('cand', 16)}) % 10 = 0
                    ELSE false END AS luhn_ok
        FROM found
    ),
    scrubbed AS (
        SELECT segment, cand, luhn_ok,
               CASE WHEN luhn_ok THEN replace(profile, cand, '[CARD]')
                    ELSE profile END AS redacted,
               profile
        FROM verified
    )
    SELECT segment,
           COUNT(*) AS n_profiles,
           CAST(SUM(CASE WHEN cand <> '' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_candidates,
           CAST(SUM(CASE WHEN luhn_ok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_luhn_valid,
           CAST(SUM(length(profile) - length(redacted)) AS BIGINT)
               AS removed_chars,
           CAST(SUM(length(redacted)) AS BIGINT) AS redacted_chars
    FROM scrubbed
    GROUP BY 1
    ORDER BY 1
    """,
)
def luhn_card_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Card-number scrub with Luhn verification before redaction.

    Candidates come from the 16-digit regex; only checksum-valid ones
    are redacted (the broken-check decoys pin that the verify really
    gates the replace — a regex-only scrubber would redact them too
    and fail removed_chars). Narrow projection + one 5-group agg —
    pii_scrub's shape with an integer checksum bolted on; the 16-term
    Luhn fold is unrolled into codegen. Reference analogue:
    src/processing/data_processing.py's cleaning pass (file:line cited
    at functions/cleaning.py) has no checksum step — net-new hardening.
    """
    cust = spread(load_table(spark, sf_dir, "customer"))
    based = cust.select(
        F.col("c_mktsegment").alias("segment"),
        "c_name",
        "c_custkey",
        F.expr(_CARD_BASE_SQL).alias("__base"),
    )
    carded = based.select(
        "segment", "c_name", F.expr(_CARD_SQL).alias("__card")
    )
    profiles = carded.select(
        "segment", F.expr(_CARD_PROFILE_SQL).alias("profile")
    )
    found = profiles.select(
        "segment",
        "profile",
        F.regexp_extract("profile", "[0-9]{16}", 0).alias("cand"),
    )
    verified = found.select(
        "segment",
        "profile",
        "cand",
        F.expr(
            f"CASE WHEN cand <> '' THEN ({_luhn_terms_sql('cand', 16)}) % 10 = 0"
            " ELSE false END"
        ).alias("luhn_ok"),
    )
    scrubbed = verified.select(
        "segment",
        "cand",
        "luhn_ok",
        "profile",
        F.when(
            F.col("luhn_ok"),
            F.expr("replace(profile, cand, '[CARD]')"),
        )
        .otherwise(F.col("profile"))
        .alias("redacted"),
    )
    return (
        scrubbed.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_profiles"),
            F.sum(F.when(F.col("cand") != "", 1).otherwise(0))
            .cast("long")
            .alias("n_candidates"),
            F.sum(F.when(F.col("luhn_ok"), 1).otherwise(0))
            .cast("long")
            .alias("n_luhn_valid"),
            F.sum(F.length("profile") - F.length("redacted"))
            .cast("long")
            .alias("removed_chars"),
            F.sum(F.length("redacted")).cast("long").alias("redacted_chars"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# edit-distance differential: native levenshtein vs native levenshtein
# ---------------------------------------------------------------------------

# engine-shared perturbation of c_name (||/substring/replace/CASE only)
_LEV_PERTURB_SQL = """
    CASE c_custkey % 4
      WHEN 0 THEN substring(c_name, 1, length(c_name) - 2)
      WHEN 1 THEN c_name || '#x'
      WHEN 2 THEN replace(c_name, '0', 'O')
      ELSE        c_name
    END
"""


@register(
    "edit_distance_histogram",
    f"""
    WITH pairs AS (
        SELECT c_name AS a, {_LEV_PERTURB_SQL} AS b FROM customer
    )
    SELECT CAST(levenshtein(a, b) AS BIGINT) AS distance,
           COUNT(*) AS n_pairs,
           CAST(SUM(length(b)) AS BIGINT) AS sum_len_b
    FROM pairs
    GROUP BY 1
    ORDER BY 1
    """,
)
def edit_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native-vs-native edit distance: Spark's levenshtein() and
    DuckDB's levenshtein() must agree on every perturbation class
    (2-char truncation, 2-char append, multi-site substitution,
    identity) — the scalar the fuzzy-match verifier leans on, pinned
    directly as a cross-engine differential. Narrow scan + a
    distances-sized histogram agg.
    """
    cust = spread(load_table(spark, sf_dir, "customer"))
    pairs = cust.select(
        F.col("c_name").alias("a"), F.expr(_LEV_PERTURB_SQL).alias("b")
    )
    return (
        pairs.groupBy(
            F.levenshtein("a", "b").cast("long").alias("distance")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.length("b")).cast("long").alias("sum_len_b"),
        )
        .orderBy("distance")
    )


# ---------------------------------------------------------------------------
# accent folding (r9): the SEARCH-normalization sibling of the NFC
# gate — DuckDB's native strip_accents (utf8proc) as the oracle
# ---------------------------------------------------------------------------
#
# Matching 'Hà Nội' to a user typing 'ha noi' is the normalization
# every search/dedup layer over Vietnamese (or any Latin-script
# accented) data needs. Accented suffixes are synthesized IN-PLAN by
# doc_id residue (the NFC gate's device — literal UTF-8, never
# chr()); the output pins the EXACT folded bytes per residue class
# (the folded suffix is a constant per class and is emitted as a
# column), not just changed-counts — a wrong-but-different fold
# cannot pass. The Đ case pins the must-NOT-fold path: D WITH STROKE
# has no mark decomposition and survives in both engines.

_ACC_SUFFIX_CASE = (
    "CASE WHEN doc_id % 4 = 0 THEN ' Hà Nội' "
    "WHEN doc_id % 4 = 1 THEN ' Đà Nẵng' "
    "WHEN doc_id % 4 = 2 THEN ' crème brûlée' ELSE ' plain' END"
)


@register(
    "accent_fold_stats",
    f"""
    WITH aug AS (
        SELECT doc_id % 4 AS cls, length(text) AS tl,
               text || {_ACC_SUFFIX_CASE} AS t
        FROM documents
    ),
    norm AS (
        SELECT cls, t, tl, strip_accents(t) AS n FROM aug
    )
    SELECT cls,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n <> t THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
           MIN(substring(n, tl + 1)) AS folded_suffix
    FROM norm
    GROUP BY 1
    ORDER BY 1
    """,
)
def accent_fold_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent folding (NFD → strip combining marks → NFC) at the
    sanctioned Arrow edge, differentially pinned against DuckDB's
    utf8proc ``strip_accents`` — per residue class, the changed-doc
    count AND the exact folded suffix bytes (see block comment; the
    ASCII corpus text is fold-invariant, so the folded suffix is
    recoverable by position). One narrow Arrow projection, then a
    4-row aggregation."""
    from ..operators.unicode_norm import fold_accents_column

    docs = spread(load_table(spark, sf_dir, "documents"))
    aug = docs.select(
        (F.col("doc_id") % 4).alias("cls"),
        F.length("text").alias("tl"),
        F.concat("text", F.expr(_ACC_SUFFIX_CASE)).alias("t"),
    )
    norm = aug.withColumn("n", fold_accents_column("t"))
    return (
        norm.groupBy("cls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n") != F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
            F.min(F.expr("substring(n, tl + 1)")).alias("folded_suffix"),
        )
        .orderBy("cls")
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler (r12): hand-built in-row Spark scorer vs DuckDB NATIVE
# ---------------------------------------------------------------------------
#
# The soundex_name_groups differential device, mirrored: Spark has no
# jaro_winkler builtin, DuckDB does. The Spark side is the
# operators/jarowinkler.py expression chain (exact-integer to the ppm
# floor); the oracle RECOMPUTES the same integer spec via DuckDB list
# lambdas (list_reduce with a [-1]-sentinel accumulator — DuckDB's
# fold has no initial-value arg) AND pins the result against the
# native float implementation per row: `native_agrees` is a literal
# TRUE on the Spark side and |ppm − floor(1e6·native)| ≤ 1 on the
# oracle side, so a semantic divergence from DuckDB's native scorer
# breaks the hash even though the hashed ppm values stay exact
# integers (the approx_percentiles in-plan-flag device; ±1 covers the
# float→floor representability boundary). Semantics were pinned
# against the native function on 60k generated pairs before either
# side was written (floored transposition halves; boost only past
# jaro 0.7; '' scores 0). Perturbation classes ride one shared CASE
# (the edit_distance_histogram device) keyed on c_custkey div 5 so
# the %5 slice keeps every class populated at every SF: identity,
# last-two-char transposition, multi-site substitution, truncation,
# full reversal (prefix 0 → no-boost path), empty (m = 0 path).
#
# Scale shape: one narrow customer scan; the matcher is an
# interpreted per-row fold sized for NAME-scale strings; one
# rule-10 checkpoint between the fold and its per-position consumers;
# presentation sort only. No join, no agg.

_JW_PERTURB_SQL = """
    CASE ({key}) % 6
      WHEN 0 THEN c_name
      WHEN 1 THEN substring(c_name, 1, length(c_name) - 2)
                  || substring(c_name, length(c_name), 1)
                  || substring(c_name, length(c_name) - 1, 1)
      WHEN 2 THEN replace(c_name, '0', 'O')
      WHEN 3 THEN substring(c_name, 1, length(c_name) - 3)
      WHEN 4 THEN reverse(c_name)
      ELSE ''
    END
"""


@register(
    "jaro_winkler_pairs",
    f"""
    WITH pairs AS (
        SELECT c_name AS name_a,
               {_JW_PERTURB_SQL.format(key="c_custkey // 5")} AS name_b
        FROM customer WHERE c_custkey % 5 = 0
    ),
    {_jw_oracle_ctes('pairs', 'name_a', 'name_b')},
    scored AS (
        SELECT name_a, name_b, m, t2, prefix_l,
               ({_JW_PPM_SQL}) AS jw_ppm,
               CASE WHEN m = 0
                    THEN (jaro_winkler_similarity(name_a, name_b) = 0.0)
                    ELSE abs(({_JW_PPM_SQL})
                 - CAST(floor(1000000
                              * jaro_winkler_similarity(name_a, name_b))
                        AS BIGINT)) <= 1 END AS native_agrees
        FROM __jw_counted
    )
    SELECT * FROM scored ORDER BY name_a
    """,
)
def jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler name similarity (see block comment): per perturbed
    customer-name pair the match count, raw transposition count,
    common-prefix length and the EXACT-integer jw_ppm; the oracle
    additionally pins every row against DuckDB's native
    jaro_winkler_similarity within ±1 ppm (`native_agrees` — a
    literal here, a comparison there)."""
    from ..operators.jarowinkler import jaro_winkler_scored

    cust = spread(load_table(spark, sf_dir, "customer")).filter(
        F.col("c_custkey") % 5 == 0
    )
    pairs = cust.select(
        F.col("c_name").alias("name_a"),
        F.expr(_JW_PERTURB_SQL.format(key="c_custkey div 5")).alias(
            "name_b"
        ),
    )
    # NO pre-sort boundary (r12 opt A/B): the JW pair frame is small
    # enough that re-running the scorer under the range sampling pass
    # is cheaper than materializing it (0.90 vs 0.98 s measured)
    return (
        jaro_winkler_scored(pairs, "name_a", "name_b")
        .select(
            "name_a", "name_b", "m", "t2", "prefix_l", "jw_ppm",
            F.lit(True).alias("native_agrees"),
        )
        .orderBy("name_a")
    )
