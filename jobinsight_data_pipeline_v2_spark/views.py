"""The 16 analytic views (SURVEY §3.3) as DataFrame functions + temp views.

1:1 re-expressions of sql/views/base_views.sql (6 views) and
business_views.sql (10 views), with two deliberate deviations:

- CURRENT_DATE → explicit ``as_of`` parameter (SURVEY §7.1): results
  are reproducible and backfillable for any day.
- STRING_AGG(DISTINCT city, ', ') → array_join(sort_array(collect_set))
  — DuckDB's aggregation order is unspecified; ours is canonical
  (sorted), deterministic on any cluster (SURVEY A4).

Dims carry broadcast hints: every view resolves fact keys via
broadcast hash joins, so at 100 TB the fact never shuffles for a dim
join; only final groupBys exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .warehouse import WarehouseDay


def _cur(dim: DataFrame) -> DataFrame:
    return F.broadcast(dim.filter(F.col("is_current")))


def _locations_agg() -> F.Column:
    """Canonicalized STRING_AGG(DISTINCT l.city, ', ')."""
    return F.array_join(F.sort_array(F.collect_set("city")), ", ").alias("locations")


def _round_avg(col: str, n: int):
    return F.round(F.avg(col), n)


# --- base views (base_views.sql) ------------------------------------------


def vw_current_jobs(w: WarehouseDay) -> DataFrame:
    """base_views.sql:11-33 — current jobs ⋈ fact ⋈ current companies."""
    j = _cur(w.dim_job)
    c = _cur(w.dim_company)
    return (
        w.fact.join(j, "job_sk")
        .join(c, "company_sk")
        .select(
            "job_sk", "job_id", "title", "job_url", "skills",
            "company_sk", "company_name", "company_url", "verified_employer",
            "date_id", "salary_min", "salary_max", "salary_type",
            "due_date", "time_remaining", "posted_time", "crawled_at",
        )
    )


def vw_job_locations(w: WarehouseDay) -> DataFrame:
    """base_views.sql:40-55 — jobs denormalized over the location bridge."""
    j = _cur(w.dim_job)
    return (
        w.fact.join(j, "job_sk")
        .join(w.bridge, "fact_id")
        .join(F.broadcast(w.dim_location), "location_sk")
        .select(
            "fact_id", "job_sk", "job_id", "title", "date_id",
            "location_sk", "city", "country",
        )
    )


def vw_monthly_stats(w: WarehouseDay) -> DataFrame:
    """base_views.sql:62-74."""
    c = _cur(w.dim_company)
    return (
        w.fact.join(c, "company_sk")
        .groupBy("load_month")
        .agg(
            F.countDistinct("job_sk").alias("job_count"),
            F.countDistinct("company_sk").alias("company_count"),
            _round_avg("salary_min", 2).alias("avg_salary_min"),
            _round_avg("salary_max", 2).alias("avg_salary_max"),
            F.countDistinct(
                F.when(F.col("verified_employer"), F.col("job_sk"))
            ).alias("verified_jobs"),
        )
        .orderBy(F.desc("load_month"))
    )


def vw_top_companies(w: WarehouseDay) -> DataFrame:
    """base_views.sql:81-96."""
    c = _cur(w.dim_company)
    return (
        w.fact.join(c, "company_sk")
        .groupBy("company_sk", "company_name", "company_url", "verified_employer")
        .agg(
            F.countDistinct("job_sk").alias("job_count"),
            _round_avg("salary_min", 2).alias("avg_salary_min"),
            _round_avg("salary_max", 2).alias("avg_salary_max"),
            F.max("date_id").alias("last_posting_date"),
        )
        .orderBy(F.desc("job_count"), "company_sk")
    )


def vw_top_locations(w: WarehouseDay) -> DataFrame:
    """base_views.sql:103-116."""
    return (
        w.fact.join(w.bridge, "fact_id")
        .join(F.broadcast(w.dim_location), "location_sk")
        .groupBy("location_sk", "city", "country")
        .agg(
            F.countDistinct("job_sk").alias("job_count"),
            _round_avg("salary_min", 2).alias("avg_salary_min"),
            _round_avg("salary_max", 2).alias("avg_salary_max"),
        )
        .orderBy(F.desc("job_count"), "location_sk")
    )


def vw_job_full_details(w: WarehouseDay) -> DataFrame:
    """base_views.sql:123-151 — wide group-by with location aggregation."""
    j = _cur(w.dim_job)
    c = _cur(w.dim_company)
    return (
        w.fact.join(j, "job_sk")
        .join(c, "company_sk")
        .join(w.bridge, "fact_id", "left")
        .join(F.broadcast(w.dim_location), "location_sk", "left")
        .groupBy(
            "job_id", "title", "company_name", "verified_employer",
            "date_id", "salary_min", "salary_max", "salary_type", "due_date",
            "time_remaining", "posted_time", "skills", "job_url", "company_url",
            "load_month",
        )
        .agg(_locations_agg())
    )


# --- business views (business_views.sql) ----------------------------------


def vw_jobs_today(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:10-34 — today's snapshot, locations aggregated."""
    j = _cur(w.dim_job)
    c = _cur(w.dim_company)
    return (
        w.fact.filter(F.col("date_id") == F.lit(as_of).cast("date"))
        .join(j, "job_sk")
        .join(c, "company_sk")
        .join(w.bridge, "fact_id", "left")
        .join(F.broadcast(w.dim_location), "location_sk", "left")
        .groupBy(
            "job_id", "title", "company_name", "verified_employer",
            "salary_min", "salary_max", "salary_type", "due_date",
            "time_remaining", "skills", "job_url", "posted_time",
        )
        .agg(_locations_agg())
        .orderBy("due_date")
    )


def _jobs_in_city(w: WarehouseDay, as_of, city_pattern: str) -> DataFrame:
    j = _cur(w.dim_job)
    c = _cur(w.dim_company)
    return (
        w.fact.filter(F.col("date_id") == F.lit(as_of).cast("date"))
        .join(j, "job_sk")
        .join(c, "company_sk")
        .join(w.bridge, "fact_id")
        .join(F.broadcast(w.dim_location), "location_sk")
        .filter(F.lower(F.col("city")).rlike(city_pattern))
        .select(
            "job_id", "title", "company_name", "verified_employer",
            "salary_min", "salary_max", "due_date", "time_remaining",
            "skills", "job_url",
        )
        .orderBy("due_date")
    )


def vw_jobs_hanoi(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:41-62 — ILIKE '%Hà Nội%' OR '%Hanoi%' (P5)."""
    return _jobs_in_city(w, as_of, "hà nội|hanoi")


def vw_jobs_hcm(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:69-90 — HCM name variants (P5)."""
    return _jobs_in_city(w, as_of, "hồ chí minh|hcm|sài gòn")


def vw_jobs_expiring_soon(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:97-119 — due within 7 days (P4, F10)."""
    j = _cur(w.dim_job)
    c = _cur(w.dim_company)
    as_of_d = F.lit(as_of).cast("date")
    return (
        w.fact.filter(
            (F.col("date_id") == as_of_d)
            & (F.col("due_date") >= as_of_d.cast("timestamp"))
            & (F.col("due_date") <= F.timestamp_add("DAY", F.lit(7), as_of_d.cast("timestamp")))
        )
        .join(j, "job_sk")
        .join(c, "company_sk")
        .join(w.bridge, "fact_id", "left")
        .join(F.broadcast(w.dim_location), "location_sk", "left")
        .withColumn("days_left", F.datediff(F.col("due_date").cast("date"), as_of_d))
        .groupBy(
            "job_id", "title", "company_name", "verified_employer",
            "salary_min", "salary_max", "due_date", "time_remaining",
            "days_left", "job_url",
        )
        .agg(_locations_agg())
        .orderBy("due_date")
    )


_SALARY_BUCKETS = [
    ("Thỏa thuận", 0),
    ("Dưới 10M", 1),
    ("10M - 15M", 2),
    ("15M - 20M", 3),
    ("20M - 30M", 4),
    ("30M - 50M", 5),
    ("Trên 50M", 6),
]


def vw_salary_distribution(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:126-154 — CASE buckets + custom bucket order.

    Note the reference buckets `salary_max` against 10/15/20/30/50 —
    values in *triệu*, while the fact stores VND; parity keeps the
    comparison literally (a fact of the reference's semantics).
    """
    sal = F.col("salary_max")
    bucket = (
        F.when(sal.isNull(), "Thỏa thuận")
        .when(sal <= 10, "Dưới 10M")
        .when(sal <= 15, "10M - 15M")
        .when(sal <= 20, "15M - 20M")
        .when(sal <= 30, "20M - 30M")
        .when(sal <= 50, "30M - 50M")
        .otherwise("Trên 50M")
    )
    order = F.create_map(
        *[x for lbl, idx in _SALARY_BUCKETS for x in (F.lit(lbl), F.lit(idx))]
    )
    return (
        w.fact.filter(F.col("date_id") == F.lit(as_of).cast("date"))
        .withColumn("salary_range", bucket)
        .groupBy("salary_range")
        .agg(
            F.countDistinct("job_sk").alias("job_count"),
            F.countDistinct("company_sk").alias("company_count"),
            _round_avg("salary_min", 1).alias("avg_min"),
            _round_avg("salary_max", 1).alias("avg_max"),
        )
        .orderBy(order[F.col("salary_range")])
    )


def vw_verified_employers(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:161-183."""
    j = _cur(w.dim_job)
    c = _cur(w.dim_company)
    return (
        w.fact.filter(F.col("date_id") == F.lit(as_of).cast("date"))
        .join(j, "job_sk")
        .join(c.filter(F.col("verified_employer")), "company_sk")
        .join(w.bridge, "fact_id", "left")
        .join(F.broadcast(w.dim_location), "location_sk", "left")
        .groupBy(
            "job_id", "title", "company_name", "salary_min", "salary_max",
            "due_date", "job_url",
        )
        .agg(_locations_agg())
        .orderBy("due_date")
    )


def vw_location_stats(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:190-209 — per-city stats, Unknown excluded."""
    c = _cur(w.dim_company)
    return (
        w.fact.filter(F.col("date_id") == F.lit(as_of).cast("date"))
        .join(w.bridge, "fact_id")
        .join(F.broadcast(w.dim_location.filter(F.col("city") != "Unknown")), "location_sk")
        .join(c, "company_sk")
        .groupBy("city")
        .agg(
            F.countDistinct("job_sk").alias("job_count"),
            F.countDistinct("company_sk").alias("company_count"),
            _round_avg("salary_min", 1).alias("avg_salary_min"),
            _round_avg("salary_max", 1).alias("avg_salary_max"),
            F.countDistinct(
                F.when(F.col("verified_employer"), F.col("job_sk"))
            ).alias("verified_jobs"),
        )
        .orderBy(F.desc("job_count"), "city")
    )


def vw_company_stats(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:216-233."""
    c = _cur(w.dim_company)
    return (
        w.fact.filter(F.col("date_id") == F.lit(as_of).cast("date"))
        .join(c, "company_sk")
        .groupBy("company_name", "verified_employer")
        .agg(
            F.countDistinct("job_sk").alias("active_jobs"),
            _round_avg("salary_min", 1).alias("avg_salary_min"),
            _round_avg("salary_max", 1).alias("avg_salary_max"),
            F.min("due_date").alias("earliest_deadline"),
        )
        .orderBy(F.desc("active_jobs"), "company_name")
    )


def vw_daily_summary(w: WarehouseDay) -> DataFrame:
    """business_views.sql:240-253."""
    c = _cur(w.dim_company)
    return (
        w.fact.join(c, "company_sk")
        .groupBy("date_id")
        .agg(
            F.countDistinct("job_sk").alias("total_jobs"),
            F.countDistinct("company_sk").alias("total_companies"),
            F.countDistinct(
                F.when(F.col("verified_employer"), F.col("company_sk"))
            ).alias("verified_companies"),
            _round_avg("salary_min", 1).alias("avg_salary_min"),
            _round_avg("salary_max", 1).alias("avg_salary_max"),
            F.countDistinct(
                F.when(F.col("salary_min").isNotNull(), F.col("job_sk"))
            ).alias("jobs_with_salary"),
        )
        .orderBy(F.desc("date_id"))
    )


def vw_skills_demand(w: WarehouseDay, as_of) -> DataFrame:
    """business_views.sql:260-273 — UNNEST(skills) + top-50 (A7/J13)."""
    j = _cur(w.dim_job)
    return (
        w.fact.filter(F.col("date_id") == F.lit(as_of).cast("date"))
        .join(j, "job_sk")
        .withColumn("skill", F.explode("skills"))
        .filter(F.col("skill").isNotNull() & (F.col("skill") != ""))
        .groupBy("skill")
        .agg(
            F.count(F.lit(1)).alias("job_count"),
            _round_avg("salary_min", 1).alias("avg_salary_min"),
            _round_avg("salary_max", 1).alias("avg_salary_max"),
        )
        .orderBy(F.desc("job_count"), "skill")
        .limit(50)
    )


ALL_VIEWS = {
    "vw_current_jobs": (vw_current_jobs, False),
    "vw_job_locations": (vw_job_locations, False),
    "vw_monthly_stats": (vw_monthly_stats, False),
    "vw_top_companies": (vw_top_companies, False),
    "vw_top_locations": (vw_top_locations, False),
    "vw_job_full_details": (vw_job_full_details, False),
    "vw_jobs_today": (vw_jobs_today, True),
    "vw_jobs_hanoi": (vw_jobs_hanoi, True),
    "vw_jobs_hcm": (vw_jobs_hcm, True),
    "vw_jobs_expiring_soon": (vw_jobs_expiring_soon, True),
    "vw_salary_distribution": (vw_salary_distribution, True),
    "vw_verified_employers": (vw_verified_employers, True),
    "vw_location_stats": (vw_location_stats, True),
    "vw_company_stats": (vw_company_stats, True),
    "vw_daily_summary": (vw_daily_summary, False),
    "vw_skills_demand": (vw_skills_demand, True),
}


def register_views(spark: SparkSession, w: WarehouseDay, as_of) -> None:
    """Register all 16 views as temp views → full spark.sql surface."""
    for name, (fn, takes_as_of) in ALL_VIEWS.items():
        df = fn(w, as_of) if takes_as_of else fn(w)
        df.createOrReplaceTempView(name)
