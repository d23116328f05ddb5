"""Monitoring store + health views vs the REFERENCE's own view SQL.

Drives run_day over several days with a MetricsStore attached, then
runs the reference's vw_etl_health / vw_quality_health SQL
(sql/schemas/monitoring_schema.sql:58-80, CURRENT_DATE parameterized)
and the Grafana panel rollups in DuckDB against the persisted metric
tables; results must match this engine's view DataFrames.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

import duckdb
import pytest

from jobinsight_data_pipeline_v2_spark.pipelines import run_day
from jobinsight_data_pipeline_v2_spark.quality import (
    QualityGateConfig,
    ValidationHardFailError,
)
from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
    MetricsStore,
    etl_summary_stats,
    gate_status_distribution,
    jobs_processed_timeseries,
    pipeline_success_rate,
    quality_summary_stats,
    recent_quality_checks,
    recent_runs,
    task_duration_timeseries,
    task_success_failure,
    valid_rate_trend,
    vw_etl_health,
    vw_quality_health,
)
from jobinsight_data_pipeline_v2_spark.schemas import RAW_JOBS
from jobinsight_data_pipeline_v2_spark.storage import WarehouseStorage

D1 = date(2026, 3, 2)


def _raw(spark, day, n=60):
    rows = [
        (
            str(3000 + i), f"Data Engineer Level {i}", f"u/{i}",
            f"công ty tnhh số {i % 5}", f"cu/{i % 5}",
            "20 - 35 triệu" if i % 3 else "Thỏa thuận",
            ["Python", "Spark"], "Hà Nội" if i % 2 else "Đà Nẵng", "10",
            bool(i % 3 == 0), None, None, None,
            datetime(day.year, day.month, day.day, 6),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, RAW_JOBS)


@pytest.fixture(scope="module")
def metrics_run(spark, tmp_path_factory):
    """3 good days + 1 hard-failed day, metrics persisted throughout."""
    root = str(tmp_path_factory.mktemp("mon"))
    storage = WarehouseStorage(spark, root)
    store = MetricsStore(spark, root)
    for i in range(3):
        day = D1 + timedelta(days=i)
        run_day(
            spark, storage, _raw(spark, day), day,
            datetime(day.year, day.month, day.day, 7), metrics=store,
        )
    bad_day = D1 + timedelta(days=3)
    with pytest.raises(ValidationHardFailError):
        run_day(
            spark, storage, _raw(spark, bad_day, n=5), bad_day,
            datetime(bad_day.year, bad_day.month, bad_day.day, 7),
            gate_config=QualityGateConfig(min_job_count=50),
            metrics=store,
        )
    return store, bad_day


def _duck(store):
    con = duckdb.connect()
    con.register("etl_metrics", store.etl_metrics().toPandas())
    con.register("quality_metrics", store.quality_metrics().toPandas())
    return con


def _rows(df_pandas, cols):
    out = []
    for _, r in df_pandas.iterrows():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def test_store_contents(metrics_run):
    store, _ = metrics_run
    etl = store.etl_metrics()
    # 3 successful days × (ingest + build) + 1 failed ingest
    assert etl.filter("status = 'success'").count() == 6
    assert etl.filter("status = 'failed'").count() == 1
    q = store.quality_metrics()
    # 3 days × (crawl + staging + business_rules) + 1 failed crawl
    assert q.count() == 10
    assert set(
        r["validation_type"] for r in q.select("validation_type").distinct().collect()
    ) == {"crawl", "staging", "business_rules"}


def test_vw_etl_health_matches_reference_sql(metrics_run):
    store, as_of = metrics_run
    con = _duck(store)
    oracle = con.sql(
        f"""
        SELECT dag_id, task_id,
               COUNT(*) AS total_runs,
               CAST(SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END)
                    AS BIGINT) AS success_runs,
               ROUND(AVG(duration_seconds), 2) AS avg_duration_sec,
               ROUND(AVG(rows_out), 0) AS avg_rows_out,
               MAX(started_at) AS last_run
        FROM etl_metrics
        WHERE started_at >= DATE '{as_of}' - INTERVAL 7 DAY
        GROUP BY dag_id, task_id
        """
    ).fetchdf()
    mine = vw_etl_health(store.etl_metrics(), as_of).toPandas()
    cols = sorted(oracle.columns)
    assert sorted(mine.columns) == cols
    assert _rows(mine, cols) == _rows(oracle, cols)


def test_vw_quality_health_matches_reference_sql(metrics_run):
    store, as_of = metrics_run
    con = _duck(store)
    oracle = con.sql(
        f"""
        SELECT validation_type,
               COUNT(*) AS total_checks,
               CAST(SUM(CASE WHEN gate_status IN ('success', 'healthy')
                             THEN 1 ELSE 0 END) AS BIGINT) AS passed,
               ROUND(AVG(valid_rate), 4) AS avg_valid_rate,
               MAX(run_timestamp) AS last_check
        FROM quality_metrics
        WHERE run_timestamp >= DATE '{as_of}' - INTERVAL 7 DAY
        GROUP BY validation_type
        """
    ).fetchdf()
    mine = vw_quality_health(store.quality_metrics(), as_of).toPandas()
    cols = sorted(oracle.columns)
    assert sorted(mine.columns) == cols
    assert _rows(mine, cols) == _rows(oracle, cols)


def test_grafana_rollups_match_duckdb(metrics_run):
    store, as_of = metrics_run
    con = _duck(store)
    # pipeline success rate stat
    rate = pipeline_success_rate(store.etl_metrics(), as_of).collect()[0][
        "success_rate"
    ]
    want = con.sql(
        f"""
        SELECT ROUND(SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END)
                     / COUNT(*) * 100, 1) AS r
        FROM etl_metrics WHERE started_at >= DATE '{as_of}' - INTERVAL 7 DAY
        """
    ).fetchone()[0]
    assert rate == pytest.approx(want)
    # task success/failure bars
    bars = {
        r["task_id"]: (r["success"], r["failed"])
        for r in task_success_failure(store.etl_metrics(), as_of).collect()
    }
    assert bars["ingest"] == (3, 1)
    assert bars["build_warehouse"] == (3, 0)
    # gate status pie
    pie = {
        r["gate_status"]: r["count"]
        for r in gate_status_distribution(store.quality_metrics(), as_of).collect()
    }
    assert pie.get("failed") == 1
    assert sum(pie.values()) == 10
    # recent-runs table is newest-first and bounded
    runs = recent_runs(store.etl_metrics(), limit=5).collect()
    assert len(runs) == 5
    assert runs[0]["started_at"] >= runs[-1]["started_at"]


def test_monitoring_views_registered(spark, metrics_run):
    store, as_of = metrics_run
    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        register_monitoring_views,
    )

    register_monitoring_views(spark, store, as_of)
    n = spark.sql("SELECT SUM(total_runs) AS n FROM vw_etl_health").collect()[0]["n"]
    assert n == 7


def test_grafana_stat_tiles_match_duckdb(metrics_run):
    """The six stat tiles (three per dashboard), differential against
    the panels' own rawSql (NOW() parameterized as as_of)."""
    store, as_of = metrics_run
    con = _duck(store)
    etl = etl_summary_stats(store.etl_metrics(), as_of).collect()[0]
    want = con.sql(
        f"""
        SELECT COUNT(*) AS total_runs,
               ROUND(AVG(duration_seconds), 1) AS avg_duration,
               COALESCE(SUM(rows_out), 0) AS total_rows
        FROM etl_metrics
        WHERE started_at >= DATE '{as_of}' - INTERVAL 7 DAY
        """
    ).fetchone()
    assert (etl["total_runs"], etl["avg_duration"], etl["total_rows"]) == (
        want[0],
        pytest.approx(want[1]),
        want[2],
    )
    q = quality_summary_stats(store.quality_metrics(), as_of).collect()[0]
    want = con.sql(
        f"""
        SELECT ROUND(AVG(valid_rate) * 100, 1) AS avg_valid_rate,
               COUNT(*) AS total_checks,
               ROUND(AVG(duplicate_rate) * 100, 2) AS avg_dup_rate
        FROM quality_metrics
        WHERE run_timestamp >= DATE '{as_of}' - INTERVAL 7 DAY
        """
    ).fetchone()
    assert (q["avg_valid_rate"], q["total_checks"], q["avg_dup_rate"]) == (
        pytest.approx(want[0]),
        want[1],
        pytest.approx(want[2]),
    )


@pytest.mark.parametrize(
    "fn_name,table,sql",
    [
        (
            "task_duration_timeseries",
            "etl_metrics",
            """SELECT started_at AS time, duration_seconds AS value,
                      task_id AS metric
               FROM etl_metrics
               WHERE started_at >= DATE '{as_of}' - INTERVAL 7 DAY
               ORDER BY time, metric""",
        ),
        (
            "valid_rate_trend",
            "quality_metrics",
            """SELECT run_timestamp AS time, valid_rate * 100 AS value,
                      validation_type AS metric
               FROM quality_metrics
               WHERE run_timestamp >= DATE '{as_of}' - INTERVAL 7 DAY
               ORDER BY time, metric""",
        ),
        (
            "jobs_processed_timeseries",
            "quality_metrics",
            """SELECT run_timestamp AS time, total_jobs AS value,
                      validation_type AS metric
               FROM quality_metrics
               WHERE run_timestamp >= DATE '{as_of}' - INTERVAL 7 DAY
               ORDER BY time, metric""",
        ),
    ],
)
def test_grafana_timeseries_match_duckdb(metrics_run, fn_name, table, sql):
    """The three timeseries panels, differential against their rawSql."""
    import jobinsight_data_pipeline_v2_spark.quality.monitoring as mon

    store, as_of = metrics_run
    con = _duck(store)
    src = store.etl_metrics() if table == "etl_metrics" else store.quality_metrics()
    mine = getattr(mon, fn_name)(src, as_of).toPandas()
    oracle = con.sql(sql.format(as_of=as_of)).fetchdf()
    cols = sorted(oracle.columns)
    assert sorted(mine.columns) == cols
    assert _rows(mine, cols) == _rows(oracle, cols)
    assert len(mine) > 0


def test_grafana_recent_quality_checks_match_duckdb(metrics_run):
    """'Recent Quality Checks' table panel: same columns as the
    dashboard rawSql, newest-first, bounded."""
    store, as_of = metrics_run
    con = _duck(store)
    mine = recent_quality_checks(store.quality_metrics(), limit=5).toPandas()
    oracle = con.sql(
        """
        SELECT run_timestamp, validation_type, total_jobs, valid_jobs,
               invalid_jobs, ROUND(valid_rate * 100, 1) AS valid_pct,
               duplicate_count, gate_status, gate_message
        FROM quality_metrics
        ORDER BY run_timestamp DESC, validation_type, dag_run_id LIMIT 5
        """
    ).fetchdf()
    cols = sorted(oracle.columns)
    assert sorted(mine.columns) == cols
    assert _rows(mine, cols) == _rows(oracle, cols)
    assert len(mine) == 5


def test_three_lifecycles_share_one_health_surface(spark, tmp_path):
    """Warehouse day + IVF index day + corpus curation all report into
    ONE MetricsStore, and the health rollup sees all three dag_ids —
    the single-pane-of-glass contract the reference's Grafana stack
    assumes (every lifecycle's work lands in etl_metrics)."""
    import datetime as dt

    from jobinsight_data_pipeline_v2_spark.corpus_pipeline import (
        curate_corpus,
    )
    from jobinsight_data_pipeline_v2_spark.index_pipeline import (
        run_index_day,
    )
    from jobinsight_data_pipeline_v2_spark.pipelines import run_day
    from jobinsight_data_pipeline_v2_spark.quality.monitoring import (
        MetricsStore,
        vw_etl_health,
    )
    from jobinsight_data_pipeline_v2_spark.storage import WarehouseStorage
    from tests.test_pipelines import _raw

    ms = MetricsStore(spark, str(tmp_path / "metrics"))
    as_of = dt.datetime(2026, 3, 3, 8)

    # 1. warehouse day
    storage = WarehouseStorage(spark, str(tmp_path / "wh"))
    run_day(
        spark, storage, _raw(spark, dt.date(2026, 3, 3)),
        dt.date(2026, 3, 3), as_of, metrics=ms,
    )

    # 2. index day (bootstrap generation 0)
    vecs = spark.createDataFrame(
        [
            (i, [int(((i % 4) == j)) * 1_000_000 for j in range(8)])
            for i in range(40)
        ],
        "vec_id: long, embedding: array<long>",
    )
    run_index_day(
        spark, str(tmp_path / "ivf"), vecs, "2026-03-03",
        metrics=ms, run_ts=as_of, k=2, kmeans_iters=2, train_sample_mod=1,
    )

    # 3. corpus curation
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    curate_corpus(
        spark, docs.select("doc_id", "text"),
        str(tmp_path / "shards"), metrics=ms, run_ts=as_of,
    )

    etl = ms.etl_metrics()
    dags = {r["dag_id"] for r in etl.select("dag_id").distinct().collect()}
    assert {"pipeline", "index_maintenance", "corpus_curation"} <= dags, dags
    # the rollup view covers every lifecycle, all success
    health = vw_etl_health(etl, as_of + dt.timedelta(hours=1)).collect()
    seen = {r["dag_id"] for r in health}
    assert dags == seen
    assert all(r["success_runs"] == r["total_runs"] for r in health), health
