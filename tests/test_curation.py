"""Unit + plan tests for the curation operators (plans/curation.py).

The DuckDB oracle is the primary gate; these tests pin the properties
the oracle cannot see: redaction actually removes every detected span
(and is idempotent), repetition buckets stay in range, decontamination
never counts a benchmark doc against itself, and the plan shapes that
make the operators scale (broadcast benchmark side, no corpus-sized
sort) actually appear.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.plans import load_all
from jobinsight_data_pipeline_v2_spark.plans.curation import (
    _BENCH_MOD,
    _EMAIL_RE,
    _PHONE_RE,
    decontaminate,
    pii_scrub,
    repetition_stats,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_pii_scrub_removes_every_detected_span(spark):
    """After redaction, neither pattern matches anywhere — the scrub is
    complete, not just counted (redacted_chars excludes all spans)."""
    out = pii_scrub(spark, SF).collect()
    assert len(out) > 0
    assert all(r.emails_found > 0 and r.phones_found > 0 for r in out)
    # rebuild the redacted text and re-scan it
    from jobinsight_data_pipeline_v2_spark.plans.curation import _PROFILE_SQL
    from jobinsight_data_pipeline_v2_spark.tables import load_table

    prof = load_table(spark, SF, "customer").select(
        F.expr(_PROFILE_SQL).alias("profile")
    )
    redacted = prof.select(
        F.regexp_replace(
            F.regexp_replace("profile", F.lit(_EMAIL_RE), F.lit("[EMAIL]")),
            F.lit(_PHONE_RE),
            F.lit("[PHONE]"),
        ).alias("r")
    )
    leftovers = redacted.filter(
        (F.size(F.regexp_extract_all("r", F.lit(_EMAIL_RE), F.lit(0))) > 0)
        | (F.size(F.regexp_extract_all("r", F.lit(_PHONE_RE), F.lit(0))) > 0)
    ).count()
    assert leftovers == 0
    # idempotent: scrubbing already-scrubbed text changes nothing
    twice = redacted.select(
        F.regexp_replace(
            F.regexp_replace("r", F.lit(_EMAIL_RE), F.lit("[EMAIL]")),
            F.lit(_PHONE_RE),
            F.lit("[PHONE]"),
        ).alias("r2"),
        "r",
    )
    assert twice.filter(F.col("r") != F.col("r2")).count() == 0


def test_repetition_buckets_in_range_and_account_for_all_docs(spark):
    rows = repetition_stats(spark, SF).collect()
    assert all(0 <= r.dup_decile <= 9 for r in rows)
    assert all(r.sum_dup <= r.sum_total for r in rows)
    assert all(r.sum_top <= r.sum_total for r in rows)
    # every doc with >= 2 tokens lands in exactly one bucket
    from jobinsight_data_pipeline_v2_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    n_eligible = docs.filter(
        F.size(F.expr("filter(split(text, ' '), t -> t != '')")) >= 2
    ).count()
    assert sum(r.n_docs for r in rows) == n_eligible


def test_decontaminate_reports_every_bench_doc_and_excludes_self(spark):
    rows = decontaminate(spark, SF).collect()
    from jobinsight_data_pipeline_v2_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    bench_ids = sorted(
        r.doc_id
        for r in docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert [r.bench_doc_id for r in rows] == bench_ids
    # a benchmark doc never counts as its own contaminator: every
    # reported contaminator id is a corpus id by construction
    assert all(r.n_contaminated >= 0 for r in rows)
    assert all(
        r.n_gram_hits >= r.n_contaminated for r in rows
    ), "hits count (gram, doc) pairs, >= distinct docs"


def test_decontaminate_benchmark_side_broadcasts(spark):
    p = _plan(spark, decontaminate(spark, SF))
    assert "BroadcastHashJoin" in p, "benchmark gram set must broadcast"


def test_pii_scrub_is_narrow_until_final_agg(spark):
    # one aggregation on the 5-value segment key; no join, no window
    p = _plan(spark, pii_scrub(spark, SF))
    assert "Join" not in p
    assert "Window" not in p


def test_registry_has_oracles_for_curation(spark):
    reg = load_all()
    for name in ("pii_scrub", "repetition_stats", "decontaminate"):
        fn, oracle = reg[name]
        assert oracle is not None and "SELECT" in oracle.upper()


def test_bloom_filter_no_false_negatives_and_fp_monitor(spark):
    """The in-plan Bloom filter: (1) every inserted key probes true —
    the no-false-negative guarantee the bloom_decontaminate gate's
    exact values rest on; (2) the FP monitor discriminates — a
    deliberately undersized filter (64 bits for 2000 keys) produces a
    false-positive rate far above the design bound, which is exactly
    the regression the gate's bloom_fp_within_bound flag would
    catch."""
    from jobinsight_data_pipeline_v2_spark.plans.curation import (
        _BLOOM_FP_BOUND,
        bloom_build,
        bloom_probe_expr,
    )

    inserted = spark.range(2000).select(
        F.xxhash64(F.concat(F.lit("key-"), F.col("id"))).alias("hk")
    )
    others = spark.range(2000, 22000).select(
        F.xxhash64(F.concat(F.lit("key-"), F.col("id"))).alias("hk")
    )

    # properly sized: all inserted keys hit, outsiders mostly miss
    bf = bloom_build(inserted)
    probe = F.expr(bloom_probe_expr())
    hits_in = (
        inserted.crossJoin(F.broadcast(bf)).filter(probe).count()
    )
    assert hits_in == 2000  # no false negatives, ever
    fp = others.crossJoin(F.broadcast(bf)).filter(probe).count() / 20000
    assert fp <= _BLOOM_FP_BOUND, fp

    # undersized: still no false negatives, but the FP rate explodes —
    # the monitor flag has something real to catch
    bf_small = bloom_build(inserted, bits=64)
    probe_small = F.expr(bloom_probe_expr(bits=64))
    assert (
        inserted.crossJoin(F.broadcast(bf_small)).filter(probe_small).count()
        == 2000
    )
    fp_small = (
        others.crossJoin(F.broadcast(bf_small)).filter(probe_small).count()
        / 20000
    )
    assert fp_small > _BLOOM_FP_BOUND, fp_small


def test_luhn_verify_known_vectors(spark):
    """The unrolled 16-term Luhn fold agrees with the published test
    vectors (4111111111111111 valid; any single-digit perturbation
    invalid) and with a pure-Python reference on random 16-digit
    strings."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.plans.curation import (
        _luhn_terms_sql,
    )

    def luhn_ok(s: str) -> bool:
        total = 0
        for i, ch in enumerate(s):  # i 0-based from the LEFT, len 16
            d = int(ch)
            if i % 2 == 0:  # odd 1-based positions are doubled
                d = d * 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    import random

    rng = random.Random(7)
    cards = ["4111111111111111", "4111111111111112", "1234567812345670"]
    cards += ["".join(rng.choice("0123456789") for _ in range(16)) for _ in range(50)]
    df = spark.createDataFrame([(c,) for c in cards], "cand string")
    got = {
        r["cand"]: r["ok"]
        for r in df.select(
            "cand",
            F.expr(f"({_luhn_terms_sql('cand', 16)}) % 10 = 0").alias("ok"),
        ).collect()
    }
    assert got["4111111111111111"] is True
    assert got["4111111111111112"] is False
    for c in cards:
        assert got[c] == luhn_ok(c), c


def test_fold_accents_goldens(spark):
    """NFD+strip-marks+NFC fold: Vietnamese diacritics fold away, a
    non-decomposable letter (Đ, D WITH STROKE) survives, NULL passes."""
    import pyspark.sql.functions as F

    from jobinsight_data_pipeline_v2_spark.operators.unicode_norm import (
        fold_accents_column,
    )

    df = spark.createDataFrame(
        [("Hà Nội",), ("Đà Nẵng",), ("crème brûlée",), (None,)],
        "s string",
    )
    got = [r["f"] for r in df.select(fold_accents_column("s").alias("f")).collect()]
    assert got == ["Ha Noi", "Đa Nang", "creme brulee", None]
