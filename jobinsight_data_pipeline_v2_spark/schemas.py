"""Explicit StructType schemas — the single source of truth (SURVEY §1.3).

The reference declares every schema twice (SQL DDL + ODCS YAML
contracts); here each table is one StructType constant and every read
passes ``schema=`` — never inferSchema. Length limits in the DDL become
quality checks (quality/validators.py), not types.

Type mapping (SURVEY §1.2): VARCHAR/TEXT→String, NUMERIC→Decimal(18,2),
surrogate keys→Long, DATE→Date, TIMESTAMPTZ→Timestamp (session TZ),
JSONB skills→Array<String> (parsed once at the edge, never re-parsed).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# raw_jobs — reference sql/schemas/raw_schema.sql:7-24
RAW_JOBS = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("job_url", StringType(), True),
        StructField("company_name", StringType(), True),
        StructField("company_url", StringType(), True),
        StructField("salary", StringType(), True),
        StructField("skills", ArrayType(StringType()), True),
        StructField("location", StringType(), True),
        StructField("deadline", StringType(), True),
        StructField("verified_employer", BooleanType(), True),
        StructField("last_update", StringType(), True),
        StructField("logo_url", StringType(), True),
        StructField("posted_time", TimestampType(), True),
        StructField("crawled_at", TimestampType(), True),
    ]
)

# staging_jobs — reference sql/schemas/staging_schema.sql:10-36
# (raw columns + derived cleaning/salary/deadline columns, originals kept)
STAGING_JOBS = StructType(
    RAW_JOBS.fields
    + [
        StructField("title_clean", StringType(), True),
        StructField("company_name_standardized", StringType(), True),
        StructField("salary_min", DecimalType(18, 2), True),
        StructField("salary_max", DecimalType(18, 2), True),
        StructField("salary_type", StringType(), True),
        StructField("due_date", TimestampType(), True),
        StructField("time_remaining", StringType(), True),
    ]
)

# DimJob — SCD2 — reference sql/schemas/dwh_schema.sql:47-64
DIM_JOB = StructType(
    [
        StructField("job_sk", LongType(), False),
        StructField("job_id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("job_url", StringType(), True),
        StructField("skills", ArrayType(StringType()), True),
        StructField("effective_date", DateType(), False),
        StructField("expiry_date", DateType(), True),
        StructField("is_current", BooleanType(), False),
    ]
)

# DimCompany — SCD2 — reference dwh_schema.sql:68-86
DIM_COMPANY = StructType(
    [
        StructField("company_sk", LongType(), False),
        StructField("company_bk_hash", StringType(), False),
        StructField("company_name", StringType(), True),
        StructField("company_url", StringType(), True),
        StructField("logo_url", StringType(), True),
        StructField("verified_employer", BooleanType(), True),
        StructField("effective_date", DateType(), False),
        StructField("expiry_date", DateType(), True),
        StructField("is_current", BooleanType(), False),
    ]
)

# DimLocation — SCD1 + sentinel (-1,'Unknown','Unknown') — dwh_schema.sql:90-98
DIM_LOCATION = StructType(
    [
        StructField("location_sk", LongType(), False),
        StructField("city", StringType(), False),
        StructField("country", StringType(), False),
    ]
)

# DimDate — dwh_schema.sql:102-114
DIM_DATE = StructType(
    [
        StructField("date_id", DateType(), False),
        StructField("day", IntegerType(), False),
        StructField("month", IntegerType(), False),
        StructField("quarter", IntegerType(), False),
        StructField("year", IntegerType(), False),
        StructField("week_of_year", IntegerType(), False),
        StructField("day_of_week", IntegerType(), False),
        StructField("weekday_name", StringType(), False),
        StructField("is_weekend", BooleanType(), False),
        StructField("year_month", StringType(), False),
        StructField("quarter_name", StringType(), False),
    ]
)

# FactJobPostingDaily — Pure Periodic Snapshot — dwh_schema.sql:122-147
FACT_JOB_POSTING_DAILY = StructType(
    [
        StructField("fact_id", LongType(), False),
        StructField("job_sk", LongType(), False),
        StructField("company_sk", LongType(), False),
        StructField("date_id", DateType(), False),
        StructField("posted_date_id", DateType(), True),
        StructField("due_date_id", DateType(), True),
        StructField("salary_min", DecimalType(18, 2), True),
        StructField("salary_max", DecimalType(18, 2), True),
        StructField("salary_type", StringType(), True),
        StructField("time_remaining", StringType(), True),
        StructField("posted_time", TimestampType(), True),
        StructField("due_date", TimestampType(), True),
        StructField("crawled_at", TimestampType(), True),
        StructField("load_month", StringType(), False),  # partition key
    ]
)

# FactJobLocationBridge — dwh_schema.sql:157-163
FACT_JOB_LOCATION_BRIDGE = StructType(
    [
        StructField("bridge_id", LongType(), False),
        StructField("fact_id", LongType(), False),
        StructField("location_sk", LongType(), False),
    ]
)

UNKNOWN_LOCATION_SK = -1
