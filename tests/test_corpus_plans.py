"""Corpus-maintenance gates (plans/corpus.py): physical-plan shape +
semantic invariants that the DuckDB oracle alone doesn't pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.plans import load_all
from jobinsight_data_pipeline_v2_spark.plans.corpus import _NEW_SOURCES, _SEG_N
from jobinsight_data_pipeline_v2_spark.plans.text import _TOKENS
from jobinsight_data_pipeline_v2_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = load_all()[name][0](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_cross_dedup_broadcasts_batch_side(spark):
    """The incoming batch must broadcast; the reference corpus must
    never shuffle for the candidate join (the 100 TB contract)."""
    p = _plan(spark, "cross_dedup")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_quality_classifier_is_narrow(spark):
    """Inference is a single narrow scan: no hash exchange, no Python
    eval node. Asserted on the scoring transform BEFORE the gate's
    presentation-sort boundary (rule 14 — the r12 pre-sort
    localCheckpoint hides the subtree in the gate's own explain)."""
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        classifier_score,
    )
    from jobinsight_data_pipeline_v2_spark.tables import load_table

    from _plan_utils import df_plan

    docs = load_table(spark, SF, "documents")
    p = df_plan(spark, classifier_score(docs))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_segment_dedup_keeps_each_distinct_segment_once(spark):
    """Global invariant: total kept segments == corpus-wide distinct
    segment count (first-occurrence-wins keeps exactly one copy), and
    the lowest-doc_id document loses nothing to other docs (only to
    its own internal repeats)."""
    out = load_all()["segment_dedup"][0](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents")
    segs = docs.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, int(ceil(size({_TOKENS}) / {_SEG_N}.0))),"
                f" i -> concat_ws(' ', slice({_TOKENS}, (i - 1) * {_SEG_N} + 1,"
                f" {_SEG_N})))"
            )
        ).alias("seg")
    )
    n_distinct = segs.distinct().count()
    assert int(out["n_kept"].sum()) == n_distinct
    assert (out["n_kept"] <= out["n_segs"]).all()
    first = out.loc[out["doc_id"].idxmin()]
    own_distinct = (
        docs.filter(F.col("doc_id") == int(first["doc_id"]))
        .select(
            F.size(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, int(ceil(size({_TOKENS}) /"
                        f" {_SEG_N}.0))), i -> concat_ws(' ',"
                        f" slice({_TOKENS}, (i - 1) * {_SEG_N} + 1, {_SEG_N})))"
                    )
                )
            )
        )
        .first()[0]
    )
    assert int(first["n_kept"]) == own_distinct


def test_quality_classifier_gate_semantics(spark):
    out = load_all()["quality_classifier"][0](spark, SF).toPandas()
    assert ((out["logit"] > 0) == out["keep"]).all()
    keep_rate = out["keep"].mean()
    assert 0.1 < keep_rate < 0.9, "gate must split the corpus, not rubber-stamp"


def test_cross_dedup_emits_only_batch_docs(spark):
    out = load_all()["cross_dedup"][0](spark, SF)
    docs = load_table(spark, SF, "documents")
    joined = out.join(docs, out["new_doc"] == docs["doc_id"]).select("source")
    srcs = {r[0] for r in joined.collect()}
    assert srcs <= set(_NEW_SOURCES)
    ref_ids = {
        r[0]
        for r in docs.filter(~F.col("source").isin(*_NEW_SOURCES))
        .select("doc_id")
        .collect()
    }
    hits = {r[0] for r in out.select("first_ref_match").collect()}
    assert hits <= ref_ids


# ---------------------------------------------------------------------------
# substring_dedup (suffix-array-style exact span dedup)
# ---------------------------------------------------------------------------


def _ref_substring_dedup(texts: dict[int, list[str]], l: int):
    """Pure-Python reference: global first-occurrence-wins duplicated
    L-gram marking, window merge, token cut — the Lee et al. semantics
    cut_duplicate_spans must reproduce."""
    seen: set[str] = set()
    dup_occ: dict[int, list[int]] = {}
    for d in sorted(texts):
        t = texts[d]
        dps = []
        for p in range(1, len(t) - l + 2):
            g = " ".join(t[p - 1 : p - 1 + l])
            if g in seen:
                dps.append(p)
            else:
                seen.add(g)
        dup_occ[d] = dps
    out = {}
    for d in sorted(texts):
        t, dps = texts[d], dup_occ[d]
        if not t:
            continue
        covered: set[int] = set()
        for p in dps:
            covered.update(range(p, p + l))
        clean = [tok for i, tok in enumerate(t, start=1) if i not in covered]
        n_spans, prev_end = 0, None
        for p in dps:
            if prev_end is None or p > prev_end + 1:
                n_spans += 1
            prev_end = p + l - 1
        out[d] = (
            len(t),
            len(dps),
            n_spans,
            len(t) - len(clean),
            " ".join(clean) or None,
        )
    return out


def _run_substring(spark, texts: dict[int, list[str]], l: int):
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        cut_duplicate_spans,
        redundant_gram_positions,
    )

    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts.items()], "doc_id long, text string"
    )
    toks = docs.select(
        "doc_id", F.expr("filter(split(text, ' '), t -> t != '')").alias("t")
    )
    rows = cut_duplicate_spans(
        toks, redundant_gram_positions(toks, l=l), l=l
    ).collect()
    return {
        r["doc_id"]: (
            r["n_tok"],
            r["n_dup_occ"],
            r["n_spans"],
            r["n_removed"],
            r["clean_text"],
        )
        for r in rows
    }


def test_substring_dedup_crafted_topologies(spark):
    """Hand-built corpus exercising every edge: cross-doc duplicate
    span longer than L (must be cut in FULL from the later doc only),
    overlapping + adjacent windows merging into one span, a doc
    shorter than L (untouchable), a full-duplicate doc (emptied to
    NULL), and within-doc internal repetition."""
    l = 4
    run = [f"r{i}" for i in range(7)]  # 7-token shared run (> L)
    texts = {
        1: ["a1", "a2", *run, "a3", "a4"],
        2: ["b1", "b2", "b3", *run, "b4"],  # later copy: run cut in full
        3: ["c1", "c2", "c3"],  # shorter than L: no grams, untouched
        4: ["a1", "a2", *run, "a3", "a4"],  # full dup of doc 1: emptied
        5: ["d1", "e1", "e2", "e3", "e4", "d2", "d3", "d4",
            "e1", "e2", "e3", "e4", "d5"],  # within-doc repetition
    }
    got = _run_substring(spark, texts, l)
    ref = _ref_substring_dedup(texts, l)
    assert got == ref
    # the exactness contract, spelled out:
    assert got[1][3] == 0, "first occurrence never loses a token"
    assert got[2][3] == len(run), "later copy loses exactly the shared run"
    assert got[2][2] == 1, "overlapping windows merge into ONE span"
    assert got[3] == (3, 0, 0, 0, "c1 c2 c3")
    assert got[4][4] is None, "full duplicate empties to NULL"
    assert got[5][3] == 4, "second internal copy of the 4-run is cut"


def test_substring_dedup_fuzz_vs_reference(spark):
    """Randomized small-vocab corpus (dense collisions) == the pure
    Python reference, several seeds in one Spark round trip."""
    import random

    l = 3
    for seed in (7, 21, 99):
        rng = random.Random(seed)
        texts = {
            d: [f"w{rng.randrange(6)}" for _ in range(rng.randrange(0, 30))]
            for d in range(1, 13)
        }
        assert _run_substring(spark, texts, l) == _ref_substring_dedup(
            texts, l
        ), f"seed {seed}"


def test_substring_dedup_plan_shape(spark):
    """100 TB shape: gram strings are hashed inside the scan projection
    (xxhash64 visible, no gram-string exchange), the dup window is
    partitioned by the gram hash (never SinglePartition), the span
    merge/reassembly is in-row (no per-token exchange), and nothing
    falls back to Python."""
    p = _plan(spark, "substring_dedup")
    assert "xxhash64" in p
    assert "Exchange SinglePartition" not in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the shared token-array build is a checkpoint boundary (rule 14
    # hides its subtree in the gate plan), so column pruning is
    # asserted on the PRE-boundary subtree (test_bloom_prefilter_plan
    # pattern)
    from jobinsight_data_pipeline_v2_spark.plans.text import _TOKENS
    from jobinsight_data_pipeline_v2_spark.tables import load_table

    toks_plan = (
        load_table(spark, SF, "documents")
        .select("doc_id", F.expr(_TOKENS).alias("t"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    schema_line = [ln for ln in toks_plan.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in schema_line, "unused document columns not pruned"


def test_substring_dedup_position_exact_on_messy_whitespace(spark):
    """Review r6 regression: gram POSITIONS must index into the token
    array (filter(split(text,' '))), not into a whitespace-scanned
    view of the raw text — a doc with double spaces must cut exactly
    the duplicated run, not shifted neighbors."""
    l = 4
    run = ["r0", "r1", "r2", "r3", "r4"]
    texts_raw = {
        1: "x1 x2 " + " ".join(run) + " x3",
        # double spaces BEFORE the duplicated run: a \S+ scanner would
        # shift every position after them
        2: "y1  y2   y3 " + " ".join(run) + "  y4",
    }
    docs = spark.createDataFrame(
        list(texts_raw.items()), "doc_id long, text string"
    )
    got = _run_substring_raw(spark, docs, l)
    texts_tok = {d: [w for w in t.split(" ") if w] for d, t in texts_raw.items()}
    assert got == _ref_substring_dedup(texts_tok, l)
    assert got[2][4] == "y1 y2 y3 y4", "wrong tokens cut after double spaces"


def _run_substring_raw(spark, docs, l):
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        cut_duplicate_spans,
        redundant_gram_positions,
    )

    toks = docs.select(
        "doc_id", F.expr("filter(split(text, ' '), t -> t != '')").alias("t")
    )
    rows = cut_duplicate_spans(
        toks, redundant_gram_positions(toks, l=l), l=l
    ).collect()
    return {
        r["doc_id"]: (
            r["n_tok"], r["n_dup_occ"], r["n_spans"], r["n_removed"],
            r["clean_text"],
        )
        for r in rows
    }


def test_ccnet_buckets_stratify_and_sample(spark):
    """CCNet gate semantics beyond the oracle hash: all three buckets
    are populated (thresholds actually stratify this corpus), bucket
    assignment matches the integer cross-multiplication rule, and the
    realized keep rate per bucket tracks its nominal rate."""
    out = load_all()["ccnet_buckets"][0](spark, SF).toPandas()
    counts = out.bucket.value_counts()
    assert set(counts.index) == {"head", "middle", "tail"}
    assert (counts > 10).all(), counts
    assert (
        (out.bucket == "head") == (3 * out.n_cov >= 2 * out.n_bi)
    ).all()
    rates = {"head": 1000, "middle": 500, "tail": 100}
    for b, r in rates.items():
        sel = out[out.bucket == b]
        assert (sel.rate_permille == r).all()
        realized = sel.kept.mean()
        assert abs(realized - r / 1000) < 0.2, (b, realized)


def test_lm_perplexity_buckets_stratify_and_score(spark):
    """Perplexity gate semantics beyond the oracle hash: all three
    buckets populated (the bits-per-bigram thresholds stratify this
    corpus), bucket assignment matches the cross-multiplied rule,
    OOV never exceeds the bigram count, and every in-vocab doc's
    score sits inside the class-range envelope."""
    out = load_all()["lm_perplexity_buckets"][0](spark, SF).toPandas()
    counts = out.bucket.value_counts()
    assert set(counts.index) == {"head", "middle", "tail"}
    assert (counts > 10).all(), counts
    assert ((out.bucket == "head") == (out.score + 9 * out.n_bi >= 0)).all()
    assert (out.n_oov <= out.n_bi).all()
    # every class is in [-16, 0] → score in [-16*n_bi, 0]
    assert (out.score <= 0).all()
    assert (out.score >= -16 * out.n_bi).all()


def test_lm_perplexity_scoring_join_broadcasts(spark):
    """The class table (V rows) must broadcast into the scoring join —
    the corpus-sized bigram stream never shuffles for it; the only
    corpus-sized exchange is the per-doc aggregation. The checkpointed
    subtrees hide upstream, so assert on the visible scoring tail."""
    p = _plan(spark, "lm_perplexity_buckets")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_span_gram_scan_variant_matches_slice_and_guards(spark):
    """The streaming scan variant (canonical text + lookahead regex)
    must emit the identical (doc_id, pos, sk, ord) rows as the batch
    slice variant on single-space text — including text with double
    spaces, which canonicalization absorbs — and must FAIL LOUDLY on
    a token containing non-space whitespace rather than emit shifted
    positions."""
    import pytest
    from pyspark.sql.utils import PythonException

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        span_gram_rows,
        span_gram_rows_scan,
    )

    l = 4
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x1  x2   x3 a b c d")],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id", F.expr("filter(split(text, ' '), t -> t != '')").alias("t")
    )
    a = {tuple(r) for r in span_gram_rows(toks, l=l).collect()}
    b = {tuple(r) for r in span_gram_rows_scan(docs, l=l).collect()}
    assert a == b and a
    bad = spark.createDataFrame(
        [(3, "a b\tc d e f g h")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="non-space whitespace"):
        span_gram_rows_scan(bad, l=l).collect()


def test_substring_decontaminate_idempotent_and_excludes_bench(spark):
    """Decontamination semantics the oracle hash doesn't spell out:
    benchmark docs are never emitted, some contamination is actually
    found (non-vacuous), and the operator is IDEMPOTENT on this corpus
    — re-probing the cleaned text against the same benchmark finds
    zero remaining contaminated grams (no benchmark span survives a
    single pass)."""
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _DECON_MOD,
        benchmark_gram_positions,
        doc_token_arrays,
    )

    out = load_all()["substring_decontaminate"][0](spark, SF)
    pdf = out.toPandas()
    assert (pdf.doc_id % _DECON_MOD != 0).all(), "benchmark docs leaked"
    assert pdf.n_removed.sum() > 0, "no contamination found — vacuous gate"
    docs = load_table(spark, SF, "documents")
    bench_toks = doc_token_arrays(
        docs.filter(F.col("doc_id") % _DECON_MOD == 0)
    )
    cleaned = out.filter(F.col("clean_text").isNotNull()).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    remaining = benchmark_gram_positions(
        doc_token_arrays(cleaned), bench_toks
    ).count()
    assert remaining == 0, "a benchmark span survived the cut"


def test_substring_decontaminate_benchmark_side_broadcasts(spark):
    """The benchmark gram set must broadcast; the corpus probe must be
    a broadcast semi-join (the corpus never shuffles for it)."""
    p = _plan(spark, "substring_decontaminate")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_homoglyph_confusables_byte_pinned():
    """The confusable literals must be the intended single NFC-stable
    codepoints — a heredoc/editor normalization of the Cyrillic/Greek
    chars would silently change BOTH engines' fold (the unicode_nfc
    lesson: verify literal forms byte-wise)."""
    from jobinsight_data_pipeline_v2_spark.plans.corpus import _CONFUSABLES

    want = {
        "a": b"\xd0\xb0",  # CYRILLIC SMALL A
        "e": b"\xd0\xb5",
        "p": b"\xd1\x80",
        "c": b"\xd1\x81",
        "y": b"\xd1\x83",
        "x": b"\xd1\x85",
        "i": b"\xd1\x96",
        "s": b"\xd1\x95",
    }
    got = {l: c.encode("utf-8") for l, c in _CONFUSABLES if l not in ("o",)}
    assert got == want
    o_forms = sorted(
        c.encode("utf-8") for l, c in _CONFUSABLES if l == "o"
    )
    assert o_forms == [b"\xce\xbf", b"\xd0\xbe"]  # Greek + Cyrillic o
    for _, c in _CONFUSABLES:
        assert len(c) == 1  # single codepoint, no combining sequence


def test_homoglyph_skeleton_golden(spark):
    """A fully spoofed word folds onto its Latin original; a genuinely
    different word does not."""
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _SKEL_DST,
        _SKEL_SRC,
    )

    df = spark.createDataFrame(
        [("раураl",), ("paypal",), ("paypa1",)], "w string"
    )
    got = [
        r["s"]
        for r in df.select(
            F.lower(F.translate("w", _SKEL_SRC, _SKEL_DST)).alias("s")
        ).collect()
    ]
    assert got[0] == got[1] == "paypal"
    assert got[2] == "paypa1"
