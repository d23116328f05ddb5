"""End-to-end corpus curation lifecycle (corpus_pipeline.curate_corpus):
stage composition, report arithmetic, budget cut, sharded output, and
metrics-store integration — the corpus twin of the warehouse/index
multi-day lifecycle tests."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.corpus_pipeline import curate_corpus

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_curate_corpus_full_lifecycle(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    r = curate_corpus(spark, docs, out, n_shards=4)
    # monotone funnel
    assert (
        r["n_input"]
        >= r["n_exact_kept"]
        >= r["n_span_kept"]
        >= r["n_quality_kept"]
        == r["n_selected"]  # no budget: everything quality-passing ships
    )
    assert r["n_input"] == docs.count()
    assert r["n_exact_kept"] == docs.select("text").distinct().count()
    assert r["span_tokens_removed"] > 0, "testdata carries duplicated runs"
    # the sink holds exactly the selected docs, shard-partitioned,
    # token counts consistent with the shipped text
    back = spark.read.parquet(out)
    assert back.count() == r["n_selected"]
    assert back.select("shard").distinct().count() == 4
    bad = back.filter(
        F.size(F.expr("filter(split(text, ' '), t -> t != '')"))
        != F.col("n_tokens")
    ).count()
    assert bad == 0
    assert int(back.agg(F.sum("n_tokens")).collect()[0][0]) == (
        r["selected_tokens"]
    )
    # quality gate really ran: every shipped doc passes the classifier
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        classifier_score,
    )

    kept = classifier_score(back.select("doc_id", "text"))
    assert kept.filter("NOT keep").count() == 0


def test_curate_corpus_token_budget_and_metrics(spark, tmp_path):
    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        MetricsStore,
    )

    docs = _docs(spark)
    ms = MetricsStore(spark, str(tmp_path / "metrics"))
    out = str(tmp_path / "shards_budget")
    full = curate_corpus(spark, docs, str(tmp_path / "shards_all"))
    budget = full["selected_tokens"] // 3
    r = curate_corpus(
        spark, docs, out, token_budget=budget, n_shards=2,
        metrics=ms, run_ts=datetime.datetime(2026, 6, 1, 6, 0, 0),
    )
    assert 0 < r["n_selected"] < full["n_selected"]
    assert 0 < r["selected_tokens"] <= budget
    back = spark.read.parquet(out)
    assert back.count() == r["n_selected"]
    # one metrics row per stage, rows_in/out chaining like the report
    rows = {m.task_id: m for m in ms.etl_metrics().collect()}
    assert set(rows) == {
        "exact_dedup", "substring_dedup", "pii_scrub", "quality_gate",
        "token_budget", "write_shards",
    }
    assert all(m.dag_id == "corpus_curation" for m in rows.values())
    assert rows["exact_dedup"].rows_in == r["n_input"]
    assert rows["token_budget"].rows_out == r["n_selected"]
    # deterministic: re-running the budgeted cut selects the same docs
    r2 = curate_corpus(
        spark, docs, str(tmp_path / "shards_budget2"), token_budget=budget,
        n_shards=2,
    )
    ids = lambda p: sorted(
        x.doc_id for x in spark.read.parquet(p).select("doc_id").collect()
    )
    assert ids(out) == ids(str(tmp_path / "shards_budget2"))


def test_curate_corpus_records_failure_row(spark, tmp_path):
    """A crashed stage must be VISIBLE in the shared health store: the
    failure row names the stage and carries the error (review r6)."""
    import pytest

    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        MetricsStore,
    )

    ms = MetricsStore(spark, str(tmp_path / "metrics"))
    bad = spark.createDataFrame([(1, "x")], "doc_id long, wrong_col string")
    with pytest.raises(Exception):
        curate_corpus(spark, bad, str(tmp_path / "out"), metrics=ms)
    rows = ms.etl_metrics().collect()
    failed = [r for r in rows if r.status == "failed"]
    assert len(failed) == 1
    assert failed[0].dag_id == "corpus_curation"
    assert failed[0].task_id == "exact_dedup"
    assert failed[0].error_message


def test_curate_corpus_from_warc_ingest_matches_direct(spark, tmp_path):
    """Crawl-to-shards: the corpus exported as WARC archives, re-read
    through the archive source, and curated must produce the IDENTICAL
    report and shard contents as curating the parquet directly — the
    ingest format cannot leak into any curation decision."""
    from jobinsight_data_pipeline_v2_spark.sources.warc_source import (
        read_warc_records,
        write_warc_archive,
    )

    docs = _docs(spark)
    recs = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("target_uri"),
        F.col("text").alias("payload"),
    ).repartition(4)
    arch = str(tmp_path / "archives")
    write_warc_archive(recs, arch).count()  # drain executes the export
    ingested = read_warc_records(spark, f"{arch}/*").select(
        F.expr("cast(substring(target_uri, 9) as bigint)").alias("doc_id"),
        F.col("payload").cast("string").alias("text"),
    )
    r_warc = curate_corpus(
        spark, ingested, str(tmp_path / "shards_warc"), n_shards=2
    )
    r_direct = curate_corpus(
        spark, docs, str(tmp_path / "shards_direct"), n_shards=2
    )
    assert r_warc == {**r_direct, "out_dir": r_warc["out_dir"]}
    a = spark.read.parquet(str(tmp_path / "shards_warc"))
    b = spark.read.parquet(str(tmp_path / "shards_direct"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_curate_corpus_gopher_rule_gate(spark, tmp_path):
    """gopher=True inserts stage 3b: the funnel stays monotone with
    n_gopher_kept between span dedup and the classifier, every shipped
    doc passes the rule battery, and the default run is unchanged (no
    report key, superset of the gated run's selection)."""
    from jobinsight_data_pipeline_v2_spark.plans.text import (
        gopher_flag_columns,
    )

    docs = _docs(spark)
    out_g = str(tmp_path / "shards_gopher")
    r = curate_corpus(spark, docs, out_g, n_shards=2, gopher=True)
    assert (
        r["n_span_kept"]
        >= r["n_gopher_kept"]
        >= r["n_quality_kept"]
        == r["n_selected"]
    )
    assert r["n_gopher_kept"] > 0
    back = spark.read.parquet(out_g)
    flags = gopher_flag_columns(back.select("doc_id", "text"))
    assert flags.filter("NOT pass_gopher").count() == 0

    out_d = str(tmp_path / "shards_default")
    r2 = curate_corpus(spark, docs, out_d, n_shards=2)
    assert "n_gopher_kept" not in r2
    assert r2["n_selected"] >= r["n_selected"]
    # the gated selection is a subset of the ungated one
    got = {x.doc_id for x in back.collect()}
    allset = {x.doc_id for x in spark.read.parquet(out_d).collect()}
    assert got <= allset


def test_curate_corpus_normalize_collapses_form_variants(spark, tmp_path):
    """normalize=True (stage 0): two docs that differ only in Unicode
    form (composed vs decomposed) must collapse in exact dedup, the
    changed count must land in the report, and the shipped text must
    be the NFC form. Without the flag the same corpus ships both."""
    rows = [
        (1, "café story " * 20),          # composed e-acute
        (2, "café story " * 20),         # decomposed, same text
        (3, "plain ascii document " * 20),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out_raw = str(tmp_path / "raw")
    r_raw = curate_corpus(spark, docs, out_raw, n_shards=1)
    assert r_raw["n_exact_kept"] == 3
    assert "n_nfc_changed" not in r_raw

    out = str(tmp_path / "norm")
    r = curate_corpus(spark, docs, out, n_shards=1, normalize=True)
    assert r["n_nfc_changed"] == 1          # only the decomposed doc
    assert r["n_exact_kept"] == 2           # variants collapsed
    back = spark.read.parquet(out)
    texts = [row["text"] for row in back.collect()]
    assert all("café" in t or "plain" in t for t in texts)
    assert not any("é" in t for t in texts)


def test_curate_corpus_from_orc_ingest_matches_direct(spark, tmp_path):
    """Columnar interchange to shards: the corpus exported as
    partitioned ORC, re-read through the ORC source, and curated must
    produce the IDENTICAL report and shard contents as curating the
    parquet directly — the S17 twin of the WARC crawl-to-shards
    identity."""
    from jobinsight_data_pipeline_v2_spark.sources.orc_source import (
        read_orc_docs,
        write_orc_corpus,
    )

    full = spark.read.parquet(f"{SF}/documents.parquet")
    land = str(tmp_path / "orc_land")
    write_orc_corpus(full, land)
    typed, quar = read_orc_docs(spark, land)
    assert quar.count() == 0
    r_orc = curate_corpus(
        spark,
        typed.select("doc_id", "text"),
        str(tmp_path / "shards_orc"),
        n_shards=2,
    )
    r_direct = curate_corpus(
        spark, _docs(spark), str(tmp_path / "shards_direct"), n_shards=2
    )
    assert r_orc == {**r_direct, "out_dir": r_orc["out_dir"]}
    a = spark.read.parquet(str(tmp_path / "shards_orc"))
    b = spark.read.parquet(str(tmp_path / "shards_direct"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_curate_corpus_ledger_partitions_the_input(spark, tmp_path):
    """ledger=True: every input doc is EITHER shipped or appears in
    the ledger exactly once with the stage that dropped it; stage
    names match the funnel arithmetic."""
    docs = _docs(spark)
    out = str(tmp_path / "shards")
    r = curate_corpus(spark, docs, out, n_shards=2, ledger=True)
    led = r["ledger"]
    shipped = spark.read.parquet(out).select("doc_id")
    n_in = docs.count()
    assert led.count() + shipped.count() == n_in
    assert led.join(shipped, "doc_id").count() == 0
    assert led.select("doc_id").distinct().count() == led.count()
    by_stage = {
        row["stage"]: row["n"]
        for row in led.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    assert by_stage.get("exact_dedup", 0) == n_in - r["n_exact_kept"]
    assert by_stage.get("substring_dedup", 0) == (
        r["n_exact_kept"] - r["n_span_kept"]
    )
    assert by_stage.get("quality_gate", 0) == (
        r["n_span_kept"] - r["n_quality_kept"]
    )
    assert "token_budget" not in by_stage  # no budget: nothing cut there


def test_curate_corpus_ledger_budget_stage(spark, tmp_path):
    """With a tight token budget the ledger attributes the cut docs to
    the token_budget stage."""
    docs = _docs(spark)
    out = str(tmp_path / "shards_b")
    r = curate_corpus(
        spark, docs, out, n_shards=2, token_budget=500, ledger=True
    )
    cut = (
        r["ledger"].filter(F.col("stage") == "token_budget").count()
    )
    assert cut == r["n_quality_kept"] - r["n_selected"] > 0


def test_write_training_shards_orc_format(spark, tmp_path):
    """fmt='orc': same shard assignment and in-file order as the
    parquet sink, readable back via the ORC reader."""
    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        write_training_shards,
    )

    docs = _docs(spark).limit(60).withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    p_out = str(tmp_path / "shards_pq")
    o_out = str(tmp_path / "shards_orc")
    write_training_shards(docs, p_out, n_shards=3)
    write_training_shards(docs, o_out, n_shards=3, fmt="orc")
    a = spark.read.parquet(p_out)
    b = spark.read.orc(o_out)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_curate_corpus_fim_rewrite(spark, tmp_path):
    """fim=True reframes every shipped long doc as '<PRE> … <SUF> …
    <MID> …' after selection: same doc set and token accounting as the
    plain run, text replaced by the oracle-gated fim_transform's
    framing, short docs untouched."""
    from jobinsight_data_pipeline_v2_spark.plans.sampling import fim_texts

    docs = _docs(spark)
    plain_out = str(tmp_path / "plain")
    fim_out = str(tmp_path / "fim")
    r_plain = curate_corpus(spark, docs, plain_out, n_shards=2)
    r_fim = curate_corpus(spark, docs, fim_out, n_shards=2, fim=True)

    # the rewrite drops nothing and keeps selection identical
    for k in ("n_input", "n_exact_kept", "n_quality_kept", "n_selected",
              "selected_tokens"):
        assert r_fim[k] == r_plain[k], k
    plain = spark.read.parquet(plain_out).select("doc_id", "text", "n_tokens")
    fimmed = spark.read.parquet(fim_out).select("doc_id", "text")
    assert fimmed.count() == plain.count()

    # shipped text == fim_texts of the plain shipped text, doc for doc
    expected = fim_texts(plain.select("doc_id", "text"))
    joined = fimmed.alias("g").join(expected.alias("e"), "doc_id")
    assert joined.filter("g.text != e.text").count() == 0
    assert r_fim["n_fim_rewritten"] == (
        fimmed.filter(F.col("text").startswith("<PRE> ")).count()
    )
    # long docs are framed, short ones pass through
    n_long = plain.filter(F.col("n_tokens") >= 4).count()
    assert r_fim["n_fim_rewritten"] == n_long


def test_curate_corpus_fold_accents_collapses_accent_variants(
    spark, tmp_path
):
    """fold_accents=True upgrades stage 0 to the full accent fold:
    accented and plain variants of the same text collapse in exact
    dedup, the shipped text is the folded form, and the report
    carries n_fold_changed."""
    rows = [
        (1, "ha noi weather report " * 15),
        (2, "hà nội weather report " * 15),  # accent variant, same text
        (3, "plain ascii document " * 15),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out_raw = str(tmp_path / "raw_fold")
    r_raw = curate_corpus(spark, docs, out_raw, n_shards=1)
    assert r_raw["n_exact_kept"] == 3

    out = str(tmp_path / "folded")
    r = curate_corpus(spark, docs, out, n_shards=1, fold_accents=True)
    assert r["n_fold_changed"] == 1
    assert r["n_exact_kept"] == 2
    texts = [row["text"] for row in spark.read.parquet(out).collect()]
    assert not any("à" in t or "ộ" in t for t in texts)


def test_curate_corpus_semantic_stage(spark, tmp_path):
    """semantic=True drops permutation near-copies that exact,
    near-band and substring stages all miss (same token multiset, no
    shared 16-gram run), keeps originals, reports n_semantic_kept, and
    the ledger names the stage."""
    def text(i, n=40):
        return " ".join(f"s{i}x{j}" for j in range(n))

    rows = [(i, text(i)) for i in range(6)] + [
        (20, " ".join(reversed(text(2).split()))),   # permutation of 2
        # even/odd interleave of 4: same multiset, NO consecutive run
        # (a plain rotation keeps a 33-token run and the substring
        # stage rightly cuts it first)
        (21, " ".join(text(4).split()[::2] + text(4).split()[1::2])),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    r = curate_corpus(
        spark, docs, out, n_shards=2, semantic=True, ledger=True
    )
    assert r["n_span_kept"] == 8  # permutations share no 16-gram
    assert r["n_semantic_kept"] == 6
    led = {(x.doc_id, x.stage) for x in r["ledger"].collect()}
    assert (20, "semantic_dedup") in led and (21, "semantic_dedup") in led
    shipped = {
        x.doc_id for x in spark.read.parquet(out).collect()
    }
    assert {2, 4} <= shipped and not {20, 21} & shipped
    # ledger ∪ shipped still partitions the input
    assert shipped | {i for i, _ in led} == {i for i, _ in rows}
