"""Incremental curation lifecycle (run_curation_day): multi-day
equivalence with one-shot curation of the union, cross-day exact and
near dedup against persisted state, immutability, ledger partition,
and the lifecycle failure-metrics contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jobinsight_data_pipeline_v2_spark.corpus_pipeline import (
    load_standing_corpus,
    run_curation_day,
    ship_standing_shards,
)


def _mk_docs(spark):
    """Three doc_id-ordered day batches with planted cross-day exact
    dups, cross-day near-dups, within-day dups, and classifier-drop
    docs. Base texts are per-doc-unique tokens (high distinctness →
    classifier keeps them)."""

    def text(i, n=40):
        return " ".join(f"w{i}x{j}" for j in range(n))

    day1 = [(i, text(i)) for i in range(0, 10)]
    day2 = (
        [(i, text(i)) for i in range(20, 28)]
        + [(30, text(3))]                       # exact dup of day-1 doc 3
        + [(31, text(4, 39) + " tail")]         # near dup of day-1 doc 4
        + [(32, text(20))]                      # exact dup WITHIN day 2
        + [(33, " ".join(["zz"] * 20))]         # classifier drop
    )
    day3 = (
        [(i, text(i)) for i in range(40, 46)]
        + [(50, text(22))]                      # exact dup of day-2 doc
        + [(51, text(41, 39) + " tail")]        # near dup of day-3 doc 41
    )
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(day1), mk(day2), mk(day3)


def test_multi_day_equals_one_shot_union(spark, tmp_path):
    """N incremental days == one run over the union: same standing
    corpus, and byte-identical training shards."""
    import pyarrow.parquet as pq

    d1, d2, d3 = _mk_docs(spark)
    inc_root = str(tmp_path / "inc")
    for day, b in (("2026-01-01", d1), ("2026-01-02", d2),
                   ("2026-01-03", d3)):
        run_curation_day(spark, inc_root, b, day)

    union = d1.unionByName(d2).unionByName(d3)
    one_root = str(tmp_path / "one")
    r = run_curation_day(spark, one_root, union, "2026-01-01")
    assert r["n_input"] == union.count()

    inc_docs = {
        (x.doc_id, x.text)
        for x in load_standing_corpus(spark, inc_root).collect()
    }
    one_docs = {
        (x.doc_id, x.text)
        for x in load_standing_corpus(spark, one_root).collect()
    }
    assert inc_docs == one_docs
    # planted dups are gone, originals survive
    ids = {i for i, _ in inc_docs}
    assert {3, 4, 20, 22, 41} <= ids
    assert not {30, 31, 32, 50, 51} & ids
    assert 33 not in ids  # classifier drop

    # byte-identical shards from either history
    a_dir, b_dir = str(tmp_path / "sh_inc"), str(tmp_path / "sh_one")
    ship_standing_shards(spark, inc_root, a_dir, n_shards=2)
    ship_standing_shards(spark, one_root, b_dir, n_shards=2)
    import glob
    import os

    for shard in ("shard=0", "shard=1"):
        fa = sorted(glob.glob(os.path.join(a_dir, shard, "*.parquet")))
        fb = sorted(glob.glob(os.path.join(b_dir, shard, "*.parquet")))
        ta = [pq.read_table(f).to_pydict() for f in fa]
        tb = [pq.read_table(f).to_pydict() for f in fb]
        assert ta == tb, shard


def test_day_reports_and_ledger_partition_input(spark, tmp_path):
    d1, d2, _ = _mk_docs(spark)
    root = str(tmp_path / "root")
    r1 = run_curation_day(spark, root, d1, "2026-01-01")
    assert r1["n_input"] == 10
    assert r1["n_exact_kept"] == 10 and r1["n_shipped"] == 10
    r2 = run_curation_day(spark, root, d2, "2026-01-02")
    assert r2["n_input"] == 12
    # exact: -1 cross-day (30), -1 within-day (32)
    assert r2["n_exact_kept"] == 10
    # near: -1 cross-day band collision (31)
    assert r2["n_near_kept"] == 9
    # classify: -1 (33)
    assert r2["n_shipped"] == 8
    led = {(x.doc_id, x.stage) for x in r2["ledger"].collect()}
    assert led == {
        (30, "exact_dedup"), (32, "exact_dedup"),
        (31, "near_dedup"), (33, "classify"),
    }
    shipped = {
        x.doc_id
        for x in load_standing_corpus(spark, root).collect()
    }
    # ledger ∪ shipped partitions each day's input exactly
    assert shipped | {i for i, _ in led} == {
        x.doc_id for x in d1.unionByName(d2).collect()
    }


def test_replayed_day_raises_never_double_ingests(spark, tmp_path):
    d1, _, _ = _mk_docs(spark)
    root = str(tmp_path / "root")
    run_curation_day(spark, root, d1, "2026-01-01")
    with pytest.raises(IOError, match="already ingested"):
        run_curation_day(spark, root, d1, "2026-01-01")
    assert load_standing_corpus(spark, root).count() == 10


def test_failure_records_stage_metrics_row(spark, tmp_path):
    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        MetricsStore,
    )

    ms = MetricsStore(spark, str(tmp_path / "metrics"))
    bad = spark.createDataFrame([(1, "x")], "doc_id long, wrong string")
    with pytest.raises(Exception):
        run_curation_day(
            spark, str(tmp_path / "root"), bad, "2026-01-01", metrics=ms
        )
    failed = [r for r in ms.etl_metrics().collect() if r.status == "failed"]
    assert len(failed) == 1
    assert failed[0].dag_id == "corpus_curation_incremental"
    assert failed[0].task_id == "exact_dedup"


def test_success_records_per_stage_metrics(spark, tmp_path):
    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        MetricsStore,
    )

    d1, _, _ = _mk_docs(spark)
    ms = MetricsStore(spark, str(tmp_path / "metrics"))
    run_curation_day(
        spark, str(tmp_path / "root"), d1, "2026-01-01", metrics=ms
    )
    rows = ms.etl_metrics().collect()
    tasks = {r.task_id for r in rows if r.status == "success"}
    assert tasks == {"exact_dedup", "near_dedup", "classify",
                     "append_state"}
    assert all(r.dag_id == "corpus_curation_incremental" for r in rows)
