"""Storage-backed multi-day pipeline: O(1) lineage per day, partition
layout, empty-day carry-forward, month-partition isolation."""

from __future__ import annotations

import os
from datetime import date, datetime, timedelta

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.schemas import RAW_JOBS
from jobinsight_data_pipeline_v2_spark.storage import WarehouseStorage, run_daily_build


def _raw(spark, day, rows):
    data = [
        (
            jid, title, f"u/{jid}", comp, f"cu/{comp}", sal, skills, loc, dl,
            False, None, None, None, datetime(day.year, day.month, day.day, 6),
        )
        for (jid, title, comp, sal, skills, loc, dl) in rows
    ]
    return spark.createDataFrame(data, RAW_JOBS)


def test_storage_backed_daily_builds(spark, tmp_path):
    storage = WarehouseStorage(spark, str(tmp_path))
    d1 = date(2026, 1, 30)  # spans a month boundary on day 3

    # day 1: two jobs
    w1 = run_daily_build(
        spark,
        storage,
        _raw(spark, d1, [
            ("j1", "Dev A", "alpha", "10 triệu", ["Python"], "Hà Nội", "10"),
            ("j2", "Dev B", "beta", "Thỏa thuận", ["SQL"], "Huế", "4"),
        ]),
        d1,
        datetime(2026, 1, 30, 7),
    )
    assert w1.fact.count() == 2
    # day 2: EMPTY staging (pure carry-forward) — the case that OOMs if
    # lineage isn't cut between days
    d2 = d1 + timedelta(days=1)
    w2 = run_daily_build(
        spark, storage, spark.createDataFrame([], RAW_JOBS), d2, datetime(2026, 1, 31, 7)
    )
    day2 = w2.fact.filter(F.col("date_id") == d2)
    assert day2.count() == 2  # both carried
    # day 3 (Feb 1): month boundary; January partition must not be rewritten
    jan_dir = os.path.join(
        str(tmp_path), "warehouse", "fact_job_posting_daily", "load_month=2026-01"
    )
    jan_mtime = max(
        os.path.getmtime(os.path.join(jan_dir, f)) for f in os.listdir(jan_dir)
    )
    d3 = d2 + timedelta(days=1)
    w3 = run_daily_build(
        spark,
        storage,
        _raw(spark, d3, [("j3", "Dev C", "gamma", "Từ 20 triệu", ["Go"], "Đà Nẵng", "9")]),
        d3,
        datetime(2026, 2, 1, 7),
    )
    assert sorted(
        r["load_month"] for r in w3.fact.select("load_month").distinct().collect()
    ) == ["2026-01", "2026-02"]
    jan_mtime_after = max(
        os.path.getmtime(os.path.join(jan_dir, f)) for f in os.listdir(jan_dir)
    )
    assert jan_mtime_after == jan_mtime, "January partition was rewritten"
    # day-3 snapshot: j1, j2 carried into Feb + j3 fresh
    assert w3.fact.filter(F.col("date_id") == d3).count() == 3
    # dims survived round-trips
    assert w3.dim_job.filter("is_current").count() == 3
    assert {r["city"] for r in w3.dim_location.collect()} >= {
        "Hà Nội", "Huế", "Đà Nẵng (mới)", "Unknown"
    }


def test_bucketed_storage_colocated_fact_bridge_join(spark, tmp_path):
    """bucketed=True: fact and bridge load as same-bucketed catalog
    twins, so their fact_id join plans with zero Exchange."""
    storage = WarehouseStorage(spark, str(tmp_path), bucketed=True, n_buckets=4)
    d1 = date(2026, 6, 1)
    run_daily_build(
        spark, storage,
        _raw(spark, d1, [
            ("j1", "Dev A", "alpha", "10 triệu", ["Python"], "Hà Nội", "10"),
            ("j2", "Dev B", "beta", "Thỏa thuận", ["SQL"], "Huế & Hà Nội", "4"),
        ]),
        d1, datetime(2026, 6, 1, 7),
    )
    d2 = d1 + timedelta(days=1)
    w = run_daily_build(
        spark, storage,
        _raw(spark, d2, [("j3", "Dev C", "gamma", "Từ 20 triệu", ["Go"], "Đà Nẵng", "9")]),
        d2, datetime(2026, 6, 2, 7),
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = w.fact.join(w.bridge, "fact_id")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "Exchange" not in plan, f"fact⋈bridge still shuffles:\n{plan}"
        # identical results vs the plain parquet snapshot
        plain_storage = WarehouseStorage(spark, str(tmp_path), bucketed=False)
        pw = plain_storage.load()
        plain = pw.fact.join(pw.bridge, "fact_id")
        assert joined.count() == plain.count() > 0
        sym = joined.exceptAll(plain).count() + plain.exceptAll(joined).count()
        assert sym == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS {storage._fact_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {storage._bridge_tbl}")


def test_run_daily_build_opt_in_compaction(spark, tmp_path):
    """compact=True runs staging-layer compaction after the commit with
    a fragmentation threshold: a fragmented prior day is rewritten, a
    healthy day is untouched, and the build output is unaffected."""
    from jobinsight_data_pipeline_v2_spark.maintenance import (
        _partition_bytes_and_files,
    )

    storage = WarehouseStorage(spark, str(tmp_path))
    d1 = date(2026, 3, 1)
    staging_rows = [
        ("j1", "Dev A", "alpha", "10 triệu", ["Python"], "Hà Nội", "10"),
        ("j2", "Dev B", "beta", "Thỏa thuận", ["SQL"], "Huế", "4"),
    ]
    # day 1: normal build + staging write, then fragment day 1's
    # staging partition into 6 tiny files (a streaming-ingest shape)
    from jobinsight_data_pipeline_v2_spark.warehouse import staging_transform

    staging = staging_transform(
        _raw(spark, d1, staging_rows), datetime(2026, 3, 1, 7)
    )
    storage.write_staging(staging, d1)
    run_daily_build(
        spark, storage, _raw(spark, d1, staging_rows), d1,
        datetime(2026, 3, 1, 7),
    )
    p1 = f"{tmp_path}/staging/ingest_date={d1.isoformat()}"
    # fragment into 6 REAL files via single-file appends (repartition
    # of a 2-row frame writes nothing for its empty partitions, which
    # would leave the day below the fragmentation threshold)
    frag = spark.read.parquet(p1).coalesce(1).localCheckpoint()
    for _ in range(5):
        frag.write.mode("append").parquet(p1)
    frag_rows = sorted(r.job_id for r in spark.read.parquet(p1).collect())
    from jobinsight_data_pipeline_v2_spark.maintenance import (
        _partition_bytes_and_files as _pbf,
    )

    _, d1_files_before = _pbf(spark, p1)
    assert d1_files_before >= 4  # genuinely above the threshold

    # day 2: healthy single-file staging + build WITH compaction
    d2 = d1 + timedelta(days=1)
    staging2 = staging_transform(
        _raw(spark, d2, staging_rows[:1]), datetime(2026, 3, 2, 7)
    )
    storage.write_staging(staging2.coalesce(1), d2)
    p2 = f"{tmp_path}/staging/ingest_date={d2.isoformat()}"
    _, d2_files_before = _partition_bytes_and_files(spark, p2)
    w = run_daily_build(
        spark, storage, _raw(spark, d2, staging_rows[:1]), d2,
        datetime(2026, 3, 2, 7),
        compact=True,
        compact_target_file_bytes=64 * 1024,
        compact_min_files=4,
    )
    # fragmented day rewritten (fewer files, same rows)…
    _, d1_files_after = _partition_bytes_and_files(spark, p1)
    assert d1_files_after < d1_files_before
    # …and the sweep's report is observable on the storage handle
    assert set(storage.last_compaction_report) == {d1.isoformat()}
    assert sorted(r.job_id for r in spark.read.parquet(p1).collect()) == frag_rows
    # …healthy day untouched…
    _, d2_files_after = _partition_bytes_and_files(spark, p2)
    assert d2_files_after == d2_files_before
    # …and the warehouse build is unaffected
    assert w.fact.filter(F.col("date_id") == d2).count() >= 1
