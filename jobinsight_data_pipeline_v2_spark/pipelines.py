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
from .quality.gates import STAGING_GATE, GateResult
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


def ingest_day(
    spark: SparkSession,
    storage: WarehouseStorage,
    raw: DataFrame,
    as_of: date,
    crawled_at,
    gate_config: QualityGateConfig | None = None,
) -> tuple[DataFrame, GateResult, GateResult, dict]:
    """Entry point 1 (pipeline_dag.py:240-294 replacement).

    crawl-validate → gate (raises ValidationHardFailError on hard fail,
    aborting the day exactly like the reference DAG) → staging
    transform → staging-validate → gate → persist staging partition.
    """
    crawl_gate = evaluate_gate(crawl_validation(raw), gate_config)
    staging = staging_transform(raw, crawled_at)
    raw_count = raw.count()
    staging_gate = evaluate_gate(
        staging_validation(staging, raw_count=raw_count),
        gate_config or STAGING_GATE,
    )
    rules = business_rule_violations(staging, as_of)
    storage.write_staging(staging, as_of)
    return storage.read_staging(as_of), crawl_gate, staging_gate, rules


def build_day(
    spark: SparkSession,
    storage: WarehouseStorage,
    staging: DataFrame,
    as_of: date,
    crawled_at,
) -> WarehouseDay:
    """Entry point 2 (dwh_dag.py run_etl replacement): one persisted
    warehouse build; lineage is O(1) thanks to the storage round-trip."""
    prev = storage.load()
    w = build_warehouse_day(spark, staging, prev, as_of, crawled_at)
    storage.write_day(w, as_of)
    loaded = storage.load()
    assert loaded is not None
    return loaded


def run_day(
    spark: SparkSession,
    storage: WarehouseStorage,
    raw: DataFrame,
    as_of: date,
    crawled_at,
    gate_config: QualityGateConfig | None = None,
) -> tuple[WarehouseDay, DayReport]:
    """Full daily cycle: ingest → build → register the 16 views
    (entry point 3's SQL surface becomes live on the session)."""
    staging, crawl_gate, staging_gate, rules = ingest_day(
        spark, storage, raw, as_of, crawled_at, gate_config
    )
    w = build_day(spark, storage, staging, as_of, crawled_at)
    register_views(spark, w, as_of)
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
