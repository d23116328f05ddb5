"""Monitoring metrics store + health views (SURVEY S13 completion).

The reference persists per-run pipeline metrics to two Postgres tables
and serves dashboards from views over them:

- ``monitoring.etl_metrics`` / ``monitoring.quality_metrics``
  (sql/schemas/monitoring_schema.sql:8-53),
- ``vw_etl_health`` / ``vw_quality_health``
  (monitoring_schema.sql:58-80),
- 14 Grafana panels (docker/grafana/provisioning/dashboards/json/
  pipeline-health.json, data-quality.json).

Here the same tables are append-only parquet under
``{root}/monitoring/`` and every view/panel is a DataFrame function —
usable both against the live store and in spark.sql after
``register_monitoring_views``. JSONB columns (field_missing_rates,
metadata) become JSON strings.

Scale note: metric tables grow by a handful of rows per pipeline run —
they are driver-log-sized, not data-sized. The rollups below shuffle
on (dag_id, task_id) / validation_type with map-side combine; nothing
here can become a bottleneck at any corpus size.
"""

from __future__ import annotations

import json
from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# monitoring_schema.sql:8-27 (serial id dropped: parquet append-only
# rows are identified by (dag_run_id, task_id, started_at))
ETL_METRICS = StructType(
    [
        StructField("dag_id", StringType(), False),
        StructField("task_id", StringType(), False),
        StructField("dag_run_id", StringType(), True),
        StructField("status", StringType(), False),  # success | failed
        StructField("duration_seconds", DoubleType(), True),
        StructField("rows_in", LongType(), True),
        StructField("rows_out", LongType(), True),
        StructField("rows_inserted", LongType(), True),
        StructField("rows_updated", LongType(), True),
        StructField("rows_failed", LongType(), True),
        StructField("throughput", DoubleType(), True),  # rows/sec
        StructField("error_message", StringType(), True),
        StructField("metadata", StringType(), True),  # JSON string
        StructField("started_at", TimestampNTZType(), True),
        StructField("completed_at", TimestampNTZType(), True),
    ]
)

# monitoring_schema.sql:34-53
QUALITY_METRICS = StructType(
    [
        StructField("validation_type", StringType(), False),
        StructField("dag_run_id", StringType(), True),
        StructField("total_jobs", LongType(), False),
        StructField("unique_jobs", LongType(), False),
        StructField("duplicate_count", LongType(), False),
        StructField("duplicate_rate", DoubleType(), False),
        StructField("valid_jobs", LongType(), False),
        StructField("invalid_jobs", LongType(), False),
        StructField("valid_rate", DoubleType(), False),
        StructField("field_missing_rates", StringType(), True),  # JSON
        StructField("raw_count", LongType(), True),
        StructField("data_loss_rate", DoubleType(), True),
        StructField("gate_status", StringType(), False),
        StructField("gate_message", StringType(), True),
        StructField("run_timestamp", TimestampNTZType(), False),
    ]
)


class MetricsStore:
    """Append-only parquet store for pipeline/quality metrics.

    The reference's INSERTs into monitoring.* become parquet appends;
    rows are tiny and per-run, so the write path is a single-row
    append — no partitioning needed at any scale.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _p(self, table: str) -> str:
        return f"{self.root}/monitoring/{table}"

    def _exists(self, table: str) -> bool:
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(self._p(table))
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs.exists(p)

    # --- write -----------------------------------------------------------
    def record_etl(
        self,
        dag_id: str,
        task_id: str,
        status: str,
        *,
        dag_run_id: str | None = None,
        duration_seconds: float | None = None,
        rows_in: int | None = None,
        rows_out: int | None = None,
        rows_inserted: int | None = None,
        rows_updated: int | None = None,
        rows_failed: int | None = None,
        error_message: str | None = None,
        metadata: dict | None = None,
        started_at: datetime | None = None,
        completed_at: datetime | None = None,
    ) -> None:
        throughput = None
        if duration_seconds and rows_out is not None and duration_seconds > 0:
            throughput = rows_out / duration_seconds
        row = (
            dag_id, task_id, dag_run_id, status, duration_seconds,
            rows_in, rows_out, rows_inserted, rows_updated, rows_failed,
            throughput, error_message,
            json.dumps(metadata) if metadata is not None else None,
            started_at, completed_at,
        )
        self.spark.createDataFrame([row], ETL_METRICS).write.mode(
            "append"
        ).parquet(self._p("etl_metrics"))

    def record_quality(
        self,
        result: dict,
        gate_status: str,
        gate_message: str | None,
        run_timestamp: datetime,
        dag_run_id: str | None = None,
    ) -> None:
        """Persist one validator dict (quality/validators.py shape)."""
        total = int(result.get("total_jobs", 0))
        unique = int(result.get("unique_jobs", 0))
        valid = int(result.get("valid_jobs", 0))
        missing = result.get("field_missing_rates") or result.get("violations")
        raw_count = result.get("raw_count")
        loss = result.get("data_loss_rate")
        row = (
            result["validation_type"], dag_run_id, total, unique,
            total - unique, float(result.get("duplicate_rate", 0.0)),
            valid, total - valid, float(result.get("valid_rate", 0.0)),
            json.dumps(missing) if missing is not None else None,
            int(raw_count) if raw_count is not None else None,
            float(loss) if loss is not None else None,
            gate_status, gate_message, run_timestamp,
        )
        self.spark.createDataFrame([row], QUALITY_METRICS).write.mode(
            "append"
        ).parquet(self._p("quality_metrics"))

    # --- read ------------------------------------------------------------
    def etl_metrics(self) -> DataFrame:
        if not self._exists("etl_metrics"):
            return self.spark.createDataFrame([], ETL_METRICS)
        return self.spark.read.schema(ETL_METRICS).parquet(self._p("etl_metrics"))

    def quality_metrics(self) -> DataFrame:
        if not self._exists("quality_metrics"):
            return self.spark.createDataFrame([], QUALITY_METRICS)
        return self.spark.read.schema(QUALITY_METRICS).parquet(
            self._p("quality_metrics")
        )


# ---------------------------------------------------------------------------
# health views (monitoring_schema.sql:58-80)
# ---------------------------------------------------------------------------


def _recent(df: DataFrame, ts_col: str, as_of: date) -> DataFrame:
    """``ts_col >= as_of - 7 days`` — CURRENT_DATE parameterized as
    ``as_of`` (the engine never reads the wall clock)."""
    cutoff = as_of - timedelta(days=7)
    return df.filter(F.col(ts_col) >= F.lit(cutoff).cast("timestamp_ntz"))


def vw_etl_health(etl: DataFrame, as_of: date) -> DataFrame:
    """monitoring.vw_etl_health (monitoring_schema.sql:58-69)."""
    return (
        _recent(etl, "started_at", as_of)
        .groupBy("dag_id", "task_id")
        .agg(
            F.count(F.lit(1)).alias("total_runs"),
            F.sum((F.col("status") == "success").cast("long")).alias(
                "success_runs"
            ),
            F.round(F.avg("duration_seconds"), 2).alias("avg_duration_sec"),
            F.round(F.avg("rows_out"), 0).alias("avg_rows_out"),
            F.max("started_at").alias("last_run"),
        )
    )


def vw_quality_health(quality: DataFrame, as_of: date) -> DataFrame:
    """monitoring.vw_quality_health (monitoring_schema.sql:71-80)."""
    return (
        _recent(quality, "run_timestamp", as_of)
        .groupBy("validation_type")
        .agg(
            F.count(F.lit(1)).alias("total_checks"),
            F.sum(
                F.col("gate_status").isin("success", "healthy").cast("long")
            ).alias("passed"),
            F.round(F.avg("valid_rate"), 4).alias("avg_valid_rate"),
            F.max("run_timestamp").alias("last_check"),
        )
    )


# ---------------------------------------------------------------------------
# Grafana panel rollups (pipeline-health.json / data-quality.json)
# ---------------------------------------------------------------------------


def pipeline_success_rate(etl: DataFrame, as_of: date) -> DataFrame:
    """'Pipeline Success Rate (7d)' stat panel."""
    return _recent(etl, "started_at", as_of).agg(
        F.round(
            F.sum((F.col("status") == "success").cast("long"))
            / F.count(F.lit(1))
            * 100,
            1,
        ).alias("success_rate")
    )


def task_success_failure(etl: DataFrame, as_of: date) -> DataFrame:
    """'Task Success/Failure Count' bar panel."""
    return (
        _recent(etl, "started_at", as_of)
        .groupBy("task_id")
        .agg(
            F.sum((F.col("status") == "success").cast("long")).alias("success"),
            F.sum((F.col("status") == "failed").cast("long")).alias("failed"),
        )
        .orderBy("task_id")
    )


def gate_status_distribution(quality: DataFrame, as_of: date) -> DataFrame:
    """'Quality Gate Status Distribution' pie panel."""
    return (
        _recent(quality, "run_timestamp", as_of)
        .groupBy("gate_status")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def etl_summary_stats(etl: DataFrame, as_of: date) -> DataFrame:
    """The three pipeline-health stat tiles — 'Total Pipeline Runs
    (7d)', 'Avg Duration (7d)', 'Total Rows Processed (7d)' — in ONE
    scan (the dashboard issues three queries over the same filter; the
    engine computes them as one aggregate)."""
    return _recent(etl, "started_at", as_of).agg(
        F.count(F.lit(1)).alias("total_runs"),
        F.round(F.avg("duration_seconds"), 1).alias("avg_duration"),
        F.coalesce(F.sum("rows_out"), F.lit(0)).alias("total_rows"),
    )


def task_duration_timeseries(etl: DataFrame, as_of: date) -> DataFrame:
    """'Task Duration Over Time' timeseries panel: (time, value,
    metric) = (started_at, duration_seconds, task_id)."""
    return (
        _recent(etl, "started_at", as_of)
        .select(
            F.col("started_at").alias("time"),
            F.col("duration_seconds").alias("value"),
            F.col("task_id").alias("metric"),
        )
        .orderBy("time", "metric")
    )


def quality_summary_stats(quality: DataFrame, as_of: date) -> DataFrame:
    """The three data-quality stat tiles — 'Avg Valid Rate (7d)',
    'Total Quality Checks (7d)', 'Avg Duplicate Rate (7d)' — in ONE
    scan."""
    return _recent(quality, "run_timestamp", as_of).agg(
        F.round(F.avg("valid_rate") * 100, 1).alias("avg_valid_rate"),
        F.count(F.lit(1)).alias("total_checks"),
        F.round(F.avg("duplicate_rate") * 100, 2).alias("avg_dup_rate"),
    )


def valid_rate_trend(quality: DataFrame, as_of: date) -> DataFrame:
    """'Valid Rate Trend by Type' timeseries panel: (time, value,
    metric) = (run_timestamp, valid_rate*100, validation_type)."""
    return (
        _recent(quality, "run_timestamp", as_of)
        .select(
            F.col("run_timestamp").alias("time"),
            (F.col("valid_rate") * 100).alias("value"),
            F.col("validation_type").alias("metric"),
        )
        .orderBy("time", "metric")
    )


def jobs_processed_timeseries(quality: DataFrame, as_of: date) -> DataFrame:
    """'Jobs Processed Over Time' timeseries panel: (time, value,
    metric) = (run_timestamp, total_jobs, validation_type)."""
    return (
        _recent(quality, "run_timestamp", as_of)
        .select(
            F.col("run_timestamp").alias("time"),
            F.col("total_jobs").alias("value"),
            F.col("validation_type").alias("metric"),
        )
        .orderBy("time", "metric")
    )


def recent_quality_checks(quality: DataFrame, limit: int = 20) -> DataFrame:
    """'Recent Quality Checks' table panel (newest first; total order
    via the (type, dag_run_id) tiebreak — CLAUDE.md rule 3: two dag
    runs can record the same type at the same timestamp, and a LIMIT
    under a partial order returns a nondeterministic row set)."""
    return (
        quality.orderBy(
            F.desc("run_timestamp"), "validation_type", "dag_run_id"
        )
        .limit(limit)
        .select(
            "run_timestamp",
            "validation_type",
            "total_jobs",
            "valid_jobs",
            "invalid_jobs",
            F.round(F.col("valid_rate") * 100, 1).alias("valid_pct"),
            "duplicate_count",
            "gate_status",
            "gate_message",
        )
    )


def recent_runs(etl: DataFrame, limit: int = 20) -> DataFrame:
    """'Recent Pipeline Runs' table panel (total order: started_at then
    dag/task id, newest first)."""
    return (
        etl.select(
            "started_at", "dag_id", "task_id", "status",
            F.round("duration_seconds", 1).alias("duration_sec"),
            "rows_in", "rows_out", "error_message",
        )
        .orderBy(F.desc("started_at"), "dag_id", "task_id")
        .limit(limit)
    )


def register_monitoring_views(
    spark: SparkSession, store: MetricsStore, as_of: date
) -> None:
    """Expose the store and both health views to spark.sql."""
    etl = store.etl_metrics()
    quality = store.quality_metrics()
    etl.createOrReplaceTempView("etl_metrics")
    quality.createOrReplaceTempView("quality_metrics")
    vw_etl_health(etl, as_of).createOrReplaceTempView("vw_etl_health")
    vw_quality_health(quality, as_of).createOrReplaceTempView(
        "vw_quality_health"
    )
