"""Quality validators as single-pass Spark aggregations (SURVEY A9/A10).

The reference validates with Python row loops over the parsed batch
(src/quality/validators.py:48-87 CrawlValidator, 102-165
StagingValidator, 191-298 BusinessRuleValidator). Each validator here
is ONE ``agg()`` over the DataFrame — every rule becomes a
``sum(when(rule, 1))`` / conditional count, computed in a single scan
with partial aggregation, so validating 10^10 rows costs one pass and
returns one row to the driver.

All return plain dicts (collected single rows): validation results are
driver-side decisions, not datasets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Business-rule thresholds (validators.py:183-190)
SALARY_HARD_CAP = 200_000_000
SALARY_WARNING_CAP = 500_000_000
DEADLINE_HARD_DAYS = 180
DEADLINE_WARNING_DAYS = 90
MIN_TITLE_LENGTH = 5
MIN_COMPANY_LENGTH = 3
INVALID_LOCATIONS = ("", "n/a", "na", "none")


def crawl_validation(raw: DataFrame) -> dict:
    """CrawlValidator.validate (validators.py:48-87), one aggregation.

    valid row = digit job_id AND non-blank title AND company present.
    """
    job_id_ok = F.col("job_id").isNotNull() & F.col("job_id").rlike(r"^\d+$")
    title_ok = F.col("title").isNotNull() & (F.trim(F.col("title")) != "")
    company_ok = F.col("company_name").isNotNull() & (F.col("company_name") != "")
    row = raw.agg(
        F.count(F.lit(1)).alias("total_jobs"),
        F.countDistinct(F.col("job_id")).alias("unique_jobs"),
        F.sum((job_id_ok & title_ok & company_ok).cast("int")).alias("valid_jobs"),
        F.sum((~job_id_ok).cast("int")).alias("missing_job_id"),
        F.sum((~title_ok).cast("int")).alias("missing_title"),
        F.sum((~company_ok).cast("int")).alias("missing_company_name"),
    ).collect()[0]
    total = row["total_jobs"] or 0
    if total == 0:
        return {
            "validation_type": "crawl", "total_jobs": 0, "unique_jobs": 0,
            "duplicate_rate": 0.0, "valid_jobs": 0, "valid_rate": 0.0,
            "field_missing_rates": {},
        }
    return {
        "validation_type": "crawl",
        "total_jobs": total,
        "unique_jobs": row["unique_jobs"],
        "duplicate_rate": (total - row["unique_jobs"]) / total,
        "valid_jobs": row["valid_jobs"],
        "valid_rate": row["valid_jobs"] / total,
        "field_missing_rates": {
            "job_id": row["missing_job_id"] / total,
            "title": row["missing_title"] / total,
            "company_name": row["missing_company_name"] / total,
        },
    }


def staging_validation(staging: DataFrame, raw_count: int | None = None) -> dict:
    """StagingValidator.validate (validators.py:102-165), one aggregation."""
    row = staging.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("job_id").alias("unique_jobs"),
        F.sum(
            (
                F.col("title_clean").isNotNull() & (F.col("title_clean") != "")
            ).cast("int")
        ).alias("valid_title"),
        F.sum(F.col("company_name_standardized").isNotNull().cast("int")).alias(
            "valid_company"
        ),
        F.sum(F.col("salary_min").isNotNull().cast("int")).alias("with_salary"),
        F.sum(F.col("due_date").isNotNull().cast("int")).alias("with_deadline"),
    ).collect()[0]
    total = row["total"] or 0
    valid = min(row["valid_title"] or 0, row["valid_company"] or 0)
    out = {
        "validation_type": "staging",
        "total_jobs": total,
        "unique_jobs": row["unique_jobs"],
        "duplicate_rate": 0.0 if total == 0 else (total - row["unique_jobs"]) / total,
        "valid_jobs": valid,
        "valid_rate": 0.0 if total == 0 else valid / total,
        "with_salary": row["with_salary"],
        "with_deadline": row["with_deadline"],
        "raw_count": raw_count,
        "data_loss_rate": None,
    }
    if raw_count:
        out["data_loss_rate"] = max(0.0, (raw_count - total) / raw_count)
    return out


def business_rule_violations(staging: DataFrame, as_of) -> dict:
    """BusinessRuleValidator.validate (validators.py:191-298), vectorized.

    9 violation counters as sum(when(...)) in one scan; hard violations
    (the reference's hard set) drive the health status thresholds
    <5% healthy / <10% warning / else unhealthy.
    """
    as_of_d = F.lit(as_of).cast("date")
    smin, smax = F.col("salary_min"), F.col("salary_max")
    both = smin.isNotNull() & smax.isNotNull()
    salary_invalid = both & ((smin < 0) | (smax < smin))
    salary_suspicious = both & ~salary_invalid & (smax > SALARY_WARNING_CAP)
    salary_too_high = (
        both & ~salary_invalid & (smax > SALARY_HARD_CAP) & (smax <= SALARY_WARNING_CAP)
    )
    days_until = F.datediff(F.col("due_date").cast("date"), as_of_d)
    has_deadline = F.col("due_date").isNotNull()
    deadline_past = has_deadline & (days_until < 0)
    deadline_too_far = has_deadline & (days_until > DEADLINE_HARD_DAYS)
    deadline_suspicious = (
        has_deadline
        & (days_until > DEADLINE_WARNING_DAYS)
        & (days_until <= DEADLINE_HARD_DAYS)
    )
    title_short = F.length(F.trim(F.coalesce(F.col("title"), F.lit("")))) < MIN_TITLE_LENGTH
    company_short = (
        F.length(F.trim(F.coalesce(F.col("company_name"), F.lit("")))) < MIN_COMPANY_LENGTH
    )
    loc_invalid = F.lower(F.trim(F.coalesce(F.col("location"), F.lit("")))).isin(
        *INVALID_LOCATIONS
    )

    rules = {
        "salary_invalid": salary_invalid,
        "salary_too_high": salary_too_high,
        "salary_suspicious": salary_suspicious,
        "deadline_past": deadline_past,
        "deadline_too_far": deadline_too_far,
        "deadline_suspicious": deadline_suspicious,
        "title_too_short": title_short,
        "company_too_short": company_short,
        "location_invalid": loc_invalid,
    }
    aggs = [F.sum(cond.cast("int")).alias(name) for name, cond in rules.items()]
    aggs.append(F.count(F.lit(1)).alias("total_jobs"))
    row = staging.agg(*aggs).collect()[0]
    total = row["total_jobs"] or 0
    violations = {name: int(row[name] or 0) for name in rules}
    hard = (
        violations["salary_invalid"]
        + violations["salary_too_high"]
        + violations["deadline_past"]
        + violations["deadline_too_far"]
        + violations["title_too_short"]
        + violations["company_too_short"]
        + violations["location_invalid"]
    )
    rate = 0.0 if total == 0 else hard / total
    status = "healthy" if rate < 0.05 else ("warning" if rate < 0.10 else "unhealthy")
    return {
        "total_jobs": total,
        "violations": violations,
        "violation_rate": rate,
        "status": status,
    }
