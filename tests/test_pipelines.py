"""End-to-end daily cycle: ingest gates → staging → warehouse → SQL views."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.pipelines import run_day
from jobinsight_data_pipeline_v2_spark.quality import (
    QualityGateConfig,
    ValidationHardFailError,
)
from jobinsight_data_pipeline_v2_spark.schemas import RAW_JOBS
from jobinsight_data_pipeline_v2_spark.storage import WarehouseStorage


def _raw(spark, day, n=60):
    rows = [
        (
            str(2000 + i), f"Backend Engineer Level {i}", f"u/{i}",
            f"công ty tnhh số {i % 7}", f"cu/{i % 7}",
            "25 - 40 triệu" if i % 3 else "Thỏa thuận",
            ["Python", "SQL"], "Hà Nội" if i % 2 else "Hồ Chí Minh", "14",
            bool(i % 4 == 0), None, None, None,
            datetime(day.year, day.month, day.day, 6),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, RAW_JOBS)


def test_run_day_full_cycle(spark, tmp_path):
    storage = WarehouseStorage(spark, str(tmp_path))
    day = date(2026, 2, 2)
    w, report = run_day(
        spark, storage, _raw(spark, day), day, datetime(2026, 2, 2, 7)
    )
    assert report.crawl_gate.status == "success"
    assert report.staging_gate.status == "success"
    assert report.fact_rows_today == 60
    assert report.business_rules["status"] == "healthy"
    # the SQL surface is live
    top = spark.sql(
        "SELECT company_name, active_jobs FROM vw_company_stats ORDER BY active_jobs DESC, company_name"
    ).collect()
    assert sum(r["active_jobs"] for r in top) == 60
    hn = spark.sql("SELECT count(*) AS n FROM vw_jobs_hanoi").collect()[0]["n"]
    assert hn == 30


def test_run_day_hard_fail_aborts(spark, tmp_path):
    storage = WarehouseStorage(spark, str(tmp_path))
    day = date(2026, 2, 2)
    with pytest.raises(ValidationHardFailError):
        run_day(
            spark, storage, _raw(spark, day, n=5), day, datetime(2026, 2, 2, 7),
            gate_config=QualityGateConfig(min_job_count=50),
        )
    # nothing persisted — the gate aborted before any write
    assert storage.load() is None
