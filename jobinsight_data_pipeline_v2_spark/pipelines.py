"""End-to-end pipeline entry points (SURVEY §3.1/§3.2 lifecycle).

The reference splits the daily flow across Airflow DAGs, XCom hops,
Postgres round-trips, and a DuckDB file shuttle. Here each entry point
is one function over one lineage; stage boundaries are DataFrames, the
only process boundary is driver↔executors.

    ingest_day:   raw rows → validate (gate) → staging → persisted
    build_day:    staging → dims/fact/bridge snapshots → persisted
    run_day:      both, plus view registration — the full daily cycle
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame, SparkSession

from .quality import (
    QualityGateConfig,
    business_rule_violations,
    crawl_validation,
    evaluate_gate,
    staging_validation,
)
from .quality.gates import STAGING_GATE, GateResult, ValidationHardFailError
from .quality.monitoring import MetricsStore, register_monitoring_views
from .storage import WarehouseStorage
from .views import register_views
from .warehouse import WarehouseDay, build_warehouse_day, staging_transform


@dataclass
class DayReport:
    """What the reference's monitoring tables record per run (S13)."""

    as_of: date
    crawl_gate: GateResult
    staging_gate: GateResult
    business_rules: dict
    staging_rows: int
    fact_rows_today: int


def _business_rules_metric(rules: dict) -> dict:
    """Adapt a business_rule_violations dict to the quality_metrics row
    shape (the reference stores violations in the JSONB column the
    other validators use for field_missing_rates)."""
    total = rules["total_jobs"]
    hard = round(rules["violation_rate"] * total)
    return {
        "validation_type": "business_rules",
        "total_jobs": total,
        "unique_jobs": total,
        "duplicate_rate": 0.0,
        "valid_jobs": total - hard,
        "valid_rate": 1.0 - rules["violation_rate"],
        "field_missing_rates": rules["violations"],
    }


def ingest_day(
    spark: SparkSession,
    storage: WarehouseStorage,
    raw: DataFrame,
    as_of: date,
    crawled_at,
    gate_config: QualityGateConfig | None = None,
    metrics: MetricsStore | None = None,
) -> tuple[DataFrame, GateResult, GateResult, dict]:
    """Entry point 1 (pipeline_dag.py:240-294 replacement).

    crawl-validate → gate (raises ValidationHardFailError on hard fail,
    aborting the day exactly like the reference DAG) → staging
    transform → staging-validate → gate → persist staging partition.
    With a ``metrics`` store, every validator result and the task run
    itself are persisted exactly like the reference's monitoring
    INSERTs (pipeline_dag → monitoring.* tables).
    """
    run_id = f"run_{as_of.isoformat()}"
    t0 = time.time()

    def _gated(result: dict, config) -> GateResult:
        try:
            gate = evaluate_gate(result, config)
        except ValidationHardFailError as e:
            if metrics is not None:
                metrics.record_quality(
                    result, "failed", str(e), crawled_at, dag_run_id=run_id
                )
                metrics.record_etl(
                    "pipeline", "ingest", "failed",
                    dag_run_id=run_id,
                    duration_seconds=time.time() - t0,
                    error_message=str(e),
                    started_at=crawled_at,
                )
            raise
        if metrics is not None:
            metrics.record_quality(
                result, gate.status, gate.message, crawled_at, dag_run_id=run_id
            )
        return gate

    crawl_gate = _gated(crawl_validation(raw), gate_config)
    staging = staging_transform(raw, crawled_at)
    raw_count = raw.count()
    staging_gate = _gated(
        staging_validation(staging, raw_count=raw_count),
        gate_config or STAGING_GATE,
    )
    rules = business_rule_violations(staging, as_of)
    storage.write_staging(staging, as_of)
    out = storage.read_staging(as_of)
    if metrics is not None:
        metrics.record_quality(
            _business_rules_metric(rules),
            rules["status"],
            f"violation rate {rules['violation_rate']:.1%}",
            crawled_at,
            dag_run_id=run_id,
        )
        dt = time.time() - t0
        metrics.record_etl(
            "pipeline", "ingest", "success",
            dag_run_id=run_id,
            duration_seconds=dt,
            rows_in=raw_count,
            rows_out=out.count(),
            started_at=crawled_at,
        )
    return out, crawl_gate, staging_gate, rules


def build_day(
    spark: SparkSession,
    storage: WarehouseStorage,
    staging: DataFrame,
    as_of: date,
    crawled_at,
    metrics: MetricsStore | None = None,
) -> WarehouseDay:
    """Entry point 2 (dwh_dag.py run_etl replacement): one persisted
    warehouse build; lineage is O(1) thanks to the storage round-trip."""
    t0 = time.time()
    prev = storage.load()
    w = build_warehouse_day(spark, staging, prev, as_of, crawled_at)
    storage.write_day(w, as_of)
    loaded = storage.load()
    assert loaded is not None
    if metrics is not None:
        from pyspark.sql import functions as F

        metrics.record_etl(
            "pipeline", "build_warehouse", "success",
            dag_run_id=f"run_{as_of.isoformat()}",
            duration_seconds=time.time() - t0,
            rows_in=staging.count(),
            rows_out=loaded.fact.filter(F.col("date_id") == as_of).count(),
            started_at=crawled_at,
        )
    return loaded


def run_day(
    spark: SparkSession,
    storage: WarehouseStorage,
    raw: DataFrame,
    as_of: date,
    crawled_at,
    gate_config: QualityGateConfig | None = None,
    metrics: MetricsStore | None = None,
    compact: bool = False,
    compact_target_file_bytes: int = 128 * 1024 * 1024,
    compact_min_files: int = 8,
) -> tuple[WarehouseDay, DayReport]:
    """Full daily cycle: ingest → build → register the 16 views
    (entry point 3's SQL surface becomes live on the session). With a
    ``metrics`` store, run/quality metrics persist and the monitoring
    views join the SQL surface. ``compact=True`` runs the opt-in
    staging-layer small-file compaction after the build (the
    maintenance-DAG cadence; fragmented days only — thresholds and
    report surface as in storage.run_daily_build; ingest_day persists
    staging here, so the layer always exists)."""
    staging, crawl_gate, staging_gate, rules = ingest_day(
        spark, storage, raw, as_of, crawled_at, gate_config, metrics
    )
    w = build_day(spark, storage, staging, as_of, crawled_at, metrics)
    if compact:
        from .maintenance import compact_partitions

        storage.last_compaction_report = compact_partitions(
            spark,
            storage.root,
            "staging",
            target_file_bytes=compact_target_file_bytes,
            min_files_to_compact=compact_min_files,
        )
    register_views(spark, w, as_of)
    if metrics is not None:
        register_monitoring_views(spark, metrics, as_of)
    from pyspark.sql import functions as F

    report = DayReport(
        as_of=as_of,
        crawl_gate=crawl_gate,
        staging_gate=staging_gate,
        business_rules=rules,
        staging_rows=staging.count(),
        fact_rows_today=w.fact.filter(F.col("date_id") == as_of).count(),
    )
    return w, report
