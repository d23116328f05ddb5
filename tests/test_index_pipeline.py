"""Multi-day IVF index lifecycle (index_pipeline.py): day-one
bootstrap, incremental upsert == full rebuild, replay-safe ingest,
threshold-triggered retrain, atomic generation promotion, pruning,
and the serving path over the persisted index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.index_pipeline import (
    current_generation,
    load_index,
    prune_index_generations,
    run_index_day,
    serve_topk,
)
from jobinsight_data_pipeline_v2_spark.operators.similarity import ivf_assign

DIM = 8
SCALE = 1_000_000


def _clustered(spark, ids):
    """One-hot cluster vectors on dims 0–3 (cluster = id % 4) with a
    tiny deterministic perturbation — high affinity to any sane
    quantizer over them."""
    rows = []
    for i in ids:
        v = [0] * DIM
        v[i % 4] = SCALE
        v[4 + (i % 3)] = 100 + (i % 7)
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<long>")


def _orthogonal(spark, ids):
    """Vectors living entirely on dims 4–7 — cosine ≈ 0 against every
    dim-0–3 centroid, the drift scenario."""
    rows = []
    for i in ids:
        v = [0] * DIM
        v[4 + (i % 4)] = SCALE
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<long>")


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ivf_index")


def test_index_lifecycle_multiday(spark, root):
    day1 = _clustered(spark, range(0, 60))
    day2 = _clustered(spark, range(60, 120))
    day3 = _orthogonal(spark, range(120, 180))
    kw = dict(k=4, kmeans_iters=3, train_sample_mod=2, drift_min_sim=0.5)

    # day one bootstraps generation 0
    r1 = run_index_day(spark, root, day1, "2026-01-01", **kw)
    assert r1["gen"] == 0 and r1["retrained"] and r1["n_fresh"] == 60
    assert current_generation(spark, root) == 0

    # day two: incremental assign, no retrain (affinity stays high)
    r2 = run_index_day(spark, root, day2, "2026-01-02", **kw)
    assert r2["gen"] == 0 and not r2["retrained"]
    assert r2["n_fresh"] == 60 and r2["batch_id"] == "2026-01-02"
    assert r2["batch_mean_sim"] > 0.5

    # incremental index == full rebuild against the same frozen
    # quantizer (the ivf_upsert equivalence, through the PERSISTED path)
    cents, idx = load_index(spark, root)
    rebuilt = ivf_assign(
        day1.unionByName(day2), cents.localCheckpoint()
    ).select("vec_id", "cell_id")
    inc = idx.select("vec_id", "cell_id")
    assert inc.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(inc).count() == 0

    # replay day two plus a top-up, with an intra-batch duplicate id
    # (review r6): only the genuinely new ids land, exactly once
    replay = day2.unionByName(
        _clustered(spark, [1000, 1001, 1001])  # 1001 duplicated in-batch
    )
    r2b = run_index_day(spark, root, replay, "2026-01-02", **kw)
    assert r2b["n_fresh"] == 2 and not r2b["retrained"]
    assert r2b["batch_id"] == "2026-01-02.1"  # immutable batch dirs
    _, idx2 = load_index(spark, root)
    assert idx2.count() == 122
    assert idx2.select("vec_id").distinct().count() == 122

    # day three drifts (orthogonal to every centroid) -> retrain fires,
    # generation promotes atomically, corpus fully re-assigned
    r3 = run_index_day(spark, root, day3, "2026-01-03", **kw)
    assert r3["retrained"] and r3["gen"] == 1
    assert r3["batch_mean_sim"] < 0.5
    assert r3["n_low_affinity_cells"] > 0
    assert current_generation(spark, root) == 1
    _, idx3 = load_index(spark, root)
    assert idx3.count() == 182  # nothing lost across the retrain
    assert idx3.select("vec_id").distinct().count() == 182

    # a fourth clustered-like day against the NEW quantizer: no retrain
    # (the retrained centroids describe both populations now)
    day4 = _clustered(spark, range(200, 220))
    r4 = run_index_day(spark, root, day4, "2026-01-04", **kw)
    assert r4["gen"] == 1 and not r4["retrained"]

    # serving path: a query equal to a standing vector finds itself
    q = spark.createDataFrame(
        [(0, [SCALE, 0, 0, 0, 100, 0, 0, 0])],
        "query_id: long, embedding: array<long>",
    )
    hits = serve_topk(spark, root, q, topk=3, nprobe=4).collect()
    assert hits[0]["rank"] == 1
    assert hits[0]["cosine_sim"] > 0.99

    # pruning keeps the newest generations only
    assert prune_index_generations(spark, root, keep=1) == [0]
    assert current_generation(spark, root) == 1


def test_index_day_skips_empty_replay(spark, root):
    import pytest as _pytest

    day1 = _clustered(spark, range(0, 40))
    kw = dict(k=4, kmeans_iters=2, train_sample_mod=2, drift_min_sim=0.5)
    # bootstrapping from an empty batch must refuse (an empty
    # quantizer would poison every later assignment)
    with _pytest.raises(ValueError, match="empty batch"):
        run_index_day(spark, root, day1.filter("vec_id < 0"),
                      "2026-02-01", **kw)
    run_index_day(spark, root, day1, "2026-02-01", **kw)
    # an exact replay writes NOTHING (no empty batch dirs) and reports
    # n_fresh=0; the drift mean is still computed over the whole batch
    # (replay-stable retrain decision), and stays quiet here
    r = run_index_day(spark, root, day1, "2026-02-01", **kw)
    assert r["n_fresh"] == 0 and r["batch_id"] is None
    assert not r["retrained"] and r["batch_mean_sim"] > 0.5
    _, idx = load_index(spark, root)
    assert idx.count() == 40
    # an empty LATER batch is a no-op report, not an error
    r0 = run_index_day(spark, root, day1.filter("vec_id < 0"),
                       "2026-02-02", **kw)
    assert r0["n_batch"] == 0 and r0["batch_id"] is None
    assert not r0["retrained"]


def test_index_day_retrain_survives_crash_replay(spark, root):
    """The drift decision is computed over the WHOLE batch, not just
    its novel ids (review r6): if a run persists the drifted batch and
    dies before retraining, the replay sees n_fresh=0 but recomputes
    the same drifted mean and still promotes the new generation."""
    day1 = _clustered(spark, range(0, 40))
    run_index_day(spark, root, day1, "2026-03-01",
                  k=4, kmeans_iters=2, train_sample_mod=2,
                  drift_min_sim=0.5)
    drifted = _orthogonal(spark, range(100, 140))
    # "crash before the retrain block": persist the batch with the
    # trigger disabled, then replay the same day with it enabled
    r_crash = run_index_day(spark, root, drifted, "2026-03-02",
                            k=4, kmeans_iters=2, train_sample_mod=2,
                            drift_min_sim=None)
    assert r_crash["n_fresh"] == 40 and not r_crash["retrained"]
    assert current_generation(spark, root) == 0
    r_replay = run_index_day(spark, root, drifted, "2026-03-02",
                             k=4, kmeans_iters=2, train_sample_mod=2,
                             drift_min_sim=0.5)
    assert r_replay["n_fresh"] == 0
    assert r_replay["retrained"] and r_replay["batch_mean_sim"] < 0.5
    assert current_generation(spark, root) == 1
    _, idx = load_index(spark, root)
    assert idx.count() == 80  # nothing duplicated, nothing lost


def test_stale_tmp_sweep_and_atomicity(spark, root, tmp_path):
    """A crashed promotion (leftover .tmp- dir) is invisible to
    readers, swept once stale, and left alone while fresh."""
    import os

    from jobinsight_data_pipeline_v2_spark.index_pipeline import (
        _sweep_stale_tmp,
    )

    day1 = _clustered(spark, range(0, 40))
    run_index_day(
        spark, root, day1, "2026-03-01", k=4, kmeans_iters=2,
        train_sample_mod=2,
    )
    crash = os.path.join(root, ".tmp-gen-9-deadbeef")
    os.makedirs(crash)
    # crashed INGEST write, two levels down (review r6)
    crash_ingest = os.path.join(root, "gen=0", "index", ".tmp-cafef00d")
    os.makedirs(crash_ingest)
    # fresh tmp: left alone
    _sweep_stale_tmp(spark, root)
    assert os.path.exists(crash)
    assert os.path.exists(crash_ingest)
    assert current_generation(spark, root) == 0  # never observed as a gen
    # aged tmp: swept at both levels
    for p in (crash, crash_ingest):
        old = (os.path.getmtime(p)) - 2 * 3600
        os.utime(p, (old, old))
    _sweep_stale_tmp(spark, root)
    assert not os.path.exists(crash)
    assert not os.path.exists(crash_ingest)


def test_prune_by_age_never_touches_current(spark, root):
    """Age-based GC: a superseded generation inside the count window is
    pruned once its promotion mtime exceeds the TTL; the current
    generation survives ANY policy combination (even keep=0 +
    max_age=0)."""
    kw = dict(k=4, kmeans_iters=2, train_sample_mod=1)
    run_index_day(spark, root, _clustered(spark, range(40)),
                  "2026-05-01", **kw)
    # force gen 1 via drift
    run_index_day(spark, root, _orthogonal(spark, range(100, 140)),
                  "2026-05-02", drift_min_sim=0.5, **kw)
    assert current_generation(spark, root) == 1
    now = __import__("time").time() * 1000
    # age is SUPERSESSION age, not promotion age (review r6): a
    # generation that served for a year but was superseded just now is
    # the rollback target — backdate gen 0's own promotion mtime far
    # past the TTL and it must still survive while its successor is
    # fresh
    import os

    year = 365 * 86400
    os.utime(
        f"{root}/gen=0",
        (
            __import__("time").time() - year,
            __import__("time").time() - year,
        ),
    )
    assert prune_index_generations(
        spark, root, keep=2, max_age_ms=10_000, now_ms=now
    ) == []
    # past the TTL: gen 0 goes even though keep=2 would retain it
    assert prune_index_generations(
        spark, root, keep=2, max_age_ms=10_000, now_ms=now + 60_000
    ) == [0]
    # the current generation is untouchable regardless of policy
    assert prune_index_generations(
        spark, root, keep=0, max_age_ms=0, now_ms=now + 10**9
    ) == []
    assert current_generation(spark, root) == 1
    load_index(spark, root)  # still loadable


def test_run_index_day_records_metrics(spark, root, tmp_path):
    """With a MetricsStore, each maintenance day appends one
    etl_metrics row (same store the warehouse pipeline reports to):
    rows_in/out mirror the report, the drift inputs ride in metadata,
    and the monitoring rollups see the task."""
    import datetime
    import json

    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        MetricsStore,
        vw_etl_health,
    )

    ms = MetricsStore(spark, str(tmp_path / "metrics"))
    kw = dict(k=4, kmeans_iters=2, train_sample_mod=1, metrics=ms)
    t1 = datetime.datetime(2026, 5, 1, 6, 0, 0)
    run_index_day(spark, root, _clustered(spark, range(30)),
                  "2026-05-01", run_ts=t1, **kw)
    r2 = run_index_day(
        spark, root, _clustered(spark, range(20, 50)), "2026-05-02",
        run_ts=t1 + datetime.timedelta(days=1), **kw,
    )
    rows = ms.etl_metrics().orderBy("dag_run_id").collect()
    assert [r.dag_id for r in rows] == ["index_maintenance"] * 2
    assert rows[0].status == "success" and rows[0].rows_in == 30
    assert rows[1].rows_in == 30 and rows[1].rows_out == r2["n_fresh"] == 20
    meta = json.loads(rows[1].metadata)
    assert meta["gen"] == 0 and meta["retrained"] is False
    assert meta["batch_mean_sim"] == r2["batch_mean_sim"]
    health = vw_etl_health(
        ms.etl_metrics(), datetime.date(2026, 5, 2)
    ).collect()
    assert any(h.dag_id == "index_maintenance" for h in health)


def test_run_index_day_records_failure_row(spark, root, tmp_path):
    """The empty-batch bootstrap error must land a failed etl_metrics
    row before propagating (review r6)."""
    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        MetricsStore,
    )

    ms = MetricsStore(spark, str(tmp_path / "metrics"))
    empty = _clustered(spark, range(10)).filter("vec_id < 0")
    with pytest.raises(ValueError):
        run_index_day(spark, root, empty, "2026-07-01",
                      k=4, kmeans_iters=2, train_sample_mod=1, metrics=ms)
    rows = ms.etl_metrics().collect()
    assert [r.status for r in rows] == ["failed"]
    assert rows[0].dag_id == "index_maintenance"
    assert "bootstrap" in rows[0].error_message
