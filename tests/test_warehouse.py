"""Multi-day warehouse simulation (SURVEY §5.2 item 3) + DuckDB view parity.

Drives build_warehouse_day over a 5-day synthetic raw-job sequence
exercising: SCD2 attribute changes, carry-forward, expiry, multi- and
foreign locations, duplicate crawls, salary variants, re-run
idempotency — asserting the reference's contract rules after each day
(fact uniqueness, exactly-one-current, FK integrity).

Then the strongest parity proof available: the final warehouse tables
are loaded into DuckDB and the REFERENCE's own view SQL (CURRENT_DATE
parameterized) runs against them; results must match this engine's
view DataFrames.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

import duckdb
import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.schemas import RAW_JOBS
from jobinsight_data_pipeline_v2_spark.views import (
    vw_daily_summary,
    vw_monthly_stats,
    vw_salary_distribution,
    vw_skills_demand,
    vw_top_companies,
    vw_top_locations,
)
from jobinsight_data_pipeline_v2_spark.warehouse import (
    build_warehouse_day,
    staging_transform,
)

D1 = date(2026, 1, 10)


def _raw_row(job_id, title, company, salary, location, deadline, crawl_day,
             skills=None, verified=False, url_suffix=""):
    crawled = datetime(crawl_day.year, crawl_day.month, crawl_day.day, 6, 0, 0)
    return (
        job_id, title, f"https://topcv.vn/viec-lam/{job_id}{url_suffix}",
        company, f"https://topcv.vn/cong-ty/{company.lower().replace(' ', '-')}",
        salary, skills or ["Python", "SQL"], location, deadline, verified,
        "Cập nhật 1 ngày trước", None, None, crawled,
    )


def _day_batches():
    """5 days of raw crawls with the interesting transitions."""
    d = [D1 + timedelta(days=i) for i in range(5)]
    return {
        d[0]: [
            _raw_row("j1", "Python Dev - Thu Nhập Upto 40 Triệu", "công ty tnhh alpha",
                     "25 - 40 triệu", "Hà Nội", "10", d[0]),
            _raw_row("j2", "Data Engineer", "BETA JSC tuyển dụng", "Thỏa thuận",
                     "Hà Nội & Hồ Chí Minh", "2", d[0], skills=["Spark", "SQL"]),
            _raw_row("j3", "BrSE", "gamma co", "1,000 - 2,000 USD", "Nhật Bản",
                     "20", d[0], verified=True),
            # duplicate crawl of j1 same day (dedup keeps one)
            _raw_row("j1", "Python Dev - Thu Nhập Upto 40 Triệu", "công ty tnhh alpha",
                     "25 - 40 triệu", "Hà Nội", "10", d[0]),
        ],
        d[1]: [
            # j2 absent (still valid → carried). j4 new, multi+unknown loc
            _raw_row("j4", "Tester", "Delta LLC", "Tới 15 triệu",
                     "Đà Nẵng & 2 nơi khác", "5", d[1]),
        ],
        d[2]: [
            # j1 title change → SCD2 new version; j2's due (d0+2) expires today
            _raw_row("j1", "Senior Python Dev", "công ty tnhh alpha",
                     "30 - 45 triệu", "Hà Nội", "8", d[2]),
        ],
        d[3]: [
            # j3 company attr change (verified flips), location now Vietnam city
            _raw_row("j3", "BrSE", "gamma co", "1,500 USD", "Hồ Chí Minh",
                     "17", d[3], verified=False),
        ],
        d[4]: [
            _raw_row("j5", "AI Engineer", "công ty tnhh alpha", "Cạnh tranh",
                     "", "3", d[4], skills=["AI", "ML"]),
        ],
    }


@pytest.fixture(scope="module")
def warehouse_days(spark):
    """Build the warehouse day by day; return the per-day snapshots."""
    snapshots = {}
    prev = None
    for day, rows in _day_batches().items():
        raw = spark.createDataFrame(rows, RAW_JOBS)
        as_of_ts = datetime(day.year, day.month, day.day, 7, 0, 0)
        staging = staging_transform(raw, as_of_ts)
        w = build_warehouse_day(spark, staging, prev, day, as_of_ts)
        # materialize to cut lineage across simulated days
        w.dim_job = spark.createDataFrame(w.dim_job.collect(), w.dim_job.schema)
        w.dim_company = spark.createDataFrame(w.dim_company.collect(), w.dim_company.schema)
        w.dim_location = spark.createDataFrame(w.dim_location.collect(), w.dim_location.schema)
        w.fact = spark.createDataFrame(w.fact.collect(), w.fact.schema)
        w.bridge = spark.createDataFrame(w.bridge.collect(), w.bridge.schema)
        snapshots[day] = w
        prev = w
    return snapshots


def _final(warehouse_days):
    return warehouse_days[max(warehouse_days)]


def test_invariants_every_day(warehouse_days):
    for day, w in warehouse_days.items():
        # exactly one current row per business key (SCD2 invariant, X5)
        for dim, bk in ((w.dim_job, "job_id"), (w.dim_company, "company_bk_hash")):
            bad = (
                dim.filter("is_current").groupBy(bk).count().filter("count > 1").count()
            )
            assert bad == 0, f"{day}: multiple current rows for a {bk}"
        # unique (job_sk, date_id) in the fact (contract rule)
        dups = (
            w.fact.groupBy("job_sk", "date_id").count().filter("count > 1").count()
        )
        assert dups == 0, f"{day}: duplicate (job_sk, date_id)"
        # bridges: unique (fact_id, location_sk), no orphans (J4)
        bdups = (
            w.bridge.groupBy("fact_id", "location_sk").count().filter("count > 1").count()
        )
        assert bdups == 0
        orphans = w.bridge.join(w.fact, "fact_id", "left_anti").count()
        assert orphans == 0, f"{day}: orphan bridges"
        # every fact has ≥1 bridge row (Unknown sentinel guarantees this)
        bridgeless = w.fact.join(w.bridge, "fact_id", "left_anti").count()
        assert bridgeless == 0, f"{day}: facts without bridges"


def test_carry_forward_and_expiry(warehouse_days):
    days = sorted(warehouse_days)
    w2 = warehouse_days[days[1]]
    # j2 absent from day-2 staging but valid until d0+2 → carried forward
    j2_sk = w2.dim_job.filter("job_id = 'j2' and is_current").collect()[0]["job_sk"]
    d2_facts = w2.fact.filter(F.col("date_id") == days[1])
    assert d2_facts.filter(F.col("job_sk") == j2_sk).count() == 1
    # carried fact keeps yesterday's bridges (Hà Nội + HCM (mới))
    f2 = d2_facts.filter(F.col("job_sk") == j2_sk).collect()[0]["fact_id"]
    cities = sorted(
        r["city"]
        for r in w2.bridge.filter(F.col("fact_id") == f2)
        .join(w2.dim_location, "location_sk")
        .collect()
    )
    assert cities == ["Hà Nội", "Hồ Chí Minh (mới)"]
    # day 3: j2's due_date_id == day3 → still valid (>= today), carried again
    w3 = warehouse_days[days[2]]
    assert w3.fact.filter(
        (F.col("date_id") == days[2]) & (F.col("job_sk") == j2_sk)
    ).count() == 1
    # day 4: due_date_id < today → expired, not carried (daily.py:138-146)
    w4 = warehouse_days[days[3]]
    assert w4.fact.filter(
        (F.col("date_id") == days[3]) & (F.col("job_sk") == j2_sk)
    ).count() == 0


def test_scd2_versioning(warehouse_days):
    days = sorted(warehouse_days)
    w3 = warehouse_days[days[2]]
    j1 = w3.dim_job.filter("job_id = 'j1'").orderBy("job_sk").collect()
    assert len(j1) == 2
    old, new = j1
    assert old["title"] == "Python Dev" and not old["is_current"]
    assert old["expiry_date"] == days[2]
    assert new["title"] == "Senior Python Dev" and new["is_current"]
    assert new["effective_date"] == days[2]
    # company SCD2: gamma verified flips on day 4
    w4 = warehouse_days[days[3]]
    gamma = w4.dim_company.filter("company_name like 'Gamma%'").orderBy("company_sk").collect()
    assert len(gamma) == 2
    assert gamma[0]["verified_employer"] is True and not gamma[0]["is_current"]
    assert gamma[1]["verified_employer"] is False and gamma[1]["is_current"]
    # fact for day 4 uses the NEW company_sk
    j3_fact = (
        w4.fact.filter(F.col("date_id") == days[3])
        .join(w4.dim_job.filter("job_id = 'j3' and is_current"), "job_sk")
        .collect()
    )
    assert j3_fact and j3_fact[0]["company_sk"] == gamma[1]["company_sk"]


def test_location_parsing_into_dim(warehouse_days):
    w = _final(warehouse_days)
    locs = {
        (r["city"], r["country"]) for r in w.dim_location.collect()
    }
    assert ("Unknown", "Unknown") in locs          # sentinel
    assert ("Hà Nội", "Vietnam") in locs           # not-merged province
    assert ("Hồ Chí Minh (mới)", "Vietnam") in locs  # merged province
    assert ("Unknown", "Nhật Bản") in locs         # foreign country
    assert ("Đà Nẵng (mới)", "Vietnam") in locs    # merged + 'nơi khác' dropped


def test_rerun_idempotency(spark, warehouse_days):
    """Rebuilding the last day from the prior state must be identical."""
    days = sorted(warehouse_days)
    prev, last = warehouse_days[days[-2]], warehouse_days[days[-1]]
    rows = _day_batches()[days[-1]]
    raw = spark.createDataFrame(rows, RAW_JOBS)
    as_of_ts = datetime(days[-1].year, days[-1].month, days[-1].day, 7, 0, 0)
    rebuilt = build_warehouse_day(
        spark, staging_transform(raw, as_of_ts), prev, days[-1], as_of_ts
    )
    for a, b in ((rebuilt.fact, last.fact), (rebuilt.bridge, last.bridge)):
        sym = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert sym == 0


# --- DuckDB differential on the REFERENCE's own view SQL -------------------

# Reference SQL (base_views.sql / business_views.sql) with CURRENT_DATE
# parameterized as {AS_OF}; STRING_AGG given an explicit ORDER BY to pin
# DuckDB's otherwise-unspecified order to our canonical sorted form.
_REF_VIEW_SQL = {
    "vw_monthly_stats": """
        SELECT f.load_month,
               COUNT(DISTINCT f.job_sk) AS job_count,
               COUNT(DISTINCT f.company_sk) AS company_count,
               ROUND(AVG(f.salary_min), 2) AS avg_salary_min,
               ROUND(AVG(f.salary_max), 2) AS avg_salary_max,
               COUNT(DISTINCT CASE WHEN c.verified_employer THEN f.job_sk END) AS verified_jobs
        FROM fact f JOIN dim_company c
          ON f.company_sk = c.company_sk AND c.is_current = TRUE
        GROUP BY f.load_month
    """,
    "vw_top_companies": """
        SELECT c.company_sk, c.company_name, c.company_url, c.verified_employer,
               COUNT(DISTINCT f.job_sk) AS job_count,
               ROUND(AVG(f.salary_min), 2) AS avg_salary_min,
               ROUND(AVG(f.salary_max), 2) AS avg_salary_max,
               MAX(f.date_id) AS last_posting_date
        FROM dim_company c JOIN fact f ON c.company_sk = f.company_sk
        WHERE c.is_current = TRUE
        GROUP BY c.company_sk, c.company_name, c.company_url, c.verified_employer
    """,
    "vw_top_locations": """
        SELECT l.location_sk, l.city, l.country,
               COUNT(DISTINCT f.job_sk) AS job_count,
               ROUND(AVG(f.salary_min), 2) AS avg_salary_min,
               ROUND(AVG(f.salary_max), 2) AS avg_salary_max
        FROM dim_location l
        JOIN bridge b ON l.location_sk = b.location_sk
        JOIN fact f ON b.fact_id = f.fact_id
        GROUP BY l.location_sk, l.city, l.country
    """,
    "vw_salary_distribution": """
        SELECT CASE
                 WHEN f.salary_max IS NULL THEN 'Thỏa thuận'
                 WHEN f.salary_max <= 10 THEN 'Dưới 10M'
                 WHEN f.salary_max <= 15 THEN '10M - 15M'
                 WHEN f.salary_max <= 20 THEN '15M - 20M'
                 WHEN f.salary_max <= 30 THEN '20M - 30M'
                 WHEN f.salary_max <= 50 THEN '30M - 50M'
                 ELSE 'Trên 50M'
               END AS salary_range,
               COUNT(DISTINCT f.job_sk) AS job_count,
               COUNT(DISTINCT f.company_sk) AS company_count,
               ROUND(AVG(f.salary_min), 1) AS avg_min,
               ROUND(AVG(f.salary_max), 1) AS avg_max
        FROM fact f
        WHERE f.date_id = {AS_OF}
        GROUP BY 1
    """,
    "vw_daily_summary": """
        SELECT f.date_id,
               COUNT(DISTINCT f.job_sk) AS total_jobs,
               COUNT(DISTINCT f.company_sk) AS total_companies,
               COUNT(DISTINCT CASE WHEN c.verified_employer THEN f.company_sk END) AS verified_companies,
               ROUND(AVG(f.salary_min), 1) AS avg_salary_min,
               ROUND(AVG(f.salary_max), 1) AS avg_salary_max,
               COUNT(DISTINCT CASE WHEN f.salary_min IS NOT NULL THEN f.job_sk END) AS jobs_with_salary
        FROM fact f JOIN dim_company c
          ON f.company_sk = c.company_sk AND c.is_current = TRUE
        GROUP BY f.date_id
    """,
    "vw_skills_demand": """
        SELECT skill, COUNT(*) AS job_count,
               ROUND(AVG(f.salary_min), 1) AS avg_salary_min,
               ROUND(AVG(f.salary_max), 1) AS avg_salary_max
        FROM fact f
        JOIN dim_job j ON f.job_sk = j.job_sk AND j.is_current = TRUE,
        UNNEST(j.skills) AS t(skill)
        WHERE f.date_id = {AS_OF}
          AND skill IS NOT NULL AND skill != ''
        GROUP BY skill
    """,
}

_VIEW_FNS = {
    "vw_monthly_stats": (vw_monthly_stats, False),
    "vw_top_companies": (vw_top_companies, False),
    "vw_top_locations": (vw_top_locations, False),
    "vw_salary_distribution": (vw_salary_distribution, True),
    "vw_daily_summary": (vw_daily_summary, False),
    "vw_skills_demand": (vw_skills_demand, True),
}


def _canon(df):
    import datetime as _dt
    import decimal as _dec

    import pandas as _pd

    cols = sorted(df.columns)
    out = []
    for _, row in df.iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if v is None or (isinstance(v, float) and v != v) or v is _pd.NaT:
                vals.append("∅")
            elif isinstance(v, _dec.Decimal):
                vals.append(f"{float(v):.6f}")
            elif isinstance(v, float):
                vals.append(f"{v:.6f}")
            elif isinstance(v, (_pd.Timestamp, _dt.datetime)):
                # DuckDB fetchdf renders DATE as midnight datetimes
                if v.time() == _dt.time(0, 0):
                    vals.append(v.date().isoformat())
                else:
                    vals.append(v.isoformat())
            elif isinstance(v, _dt.date):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("view", sorted(_REF_VIEW_SQL))
def test_views_match_reference_sql_on_duckdb(warehouse_days, view):
    w = _final(warehouse_days)
    as_of = max(warehouse_days)
    con = duckdb.connect()
    for name, df in (
        ("dim_job", w.dim_job), ("dim_company", w.dim_company),
        ("dim_location", w.dim_location), ("fact", w.fact), ("bridge", w.bridge),
    ):
        pdf = df.toPandas()
        con.register(name, pdf)
    sql = _REF_VIEW_SQL[view].replace("{AS_OF}", f"DATE '{as_of}'")
    oracle = con.sql(sql).fetchdf()
    fn, takes_as_of = _VIEW_FNS[view]
    mine = (fn(w, as_of) if takes_as_of else fn(w)).toPandas()
    # drop presentation-order columns mismatch by sorting canonically
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert _canon(mine) == _canon(oracle), view


def test_assign_batch_sks_properties(spark):
    """Bucket-strided surrogate ids: unique, deterministic across
    runs, strictly above the existing max, and assigned through a
    bucket-partitioned window (the no-SinglePartition W4 rule) even
    for a backfill-sized insert batch."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.scd2 import (
        ID_BUCKETS,
        assign_batch_sks,
    )

    n = 50_000
    batch = spark.range(n).select(
        F.concat(F.lit("bk_"), F.col("id").cast("string")).alias("bk")
    )
    max_sk = spark.createDataFrame([(1000,)], "m long")
    out = assign_batch_sks(batch, ["bk"], max_sk, "sk")
    sks = [r["sk"] for r in out.select("sk").collect()]
    assert len(sks) == n
    assert len(set(sks)) == n, "ids must be unique"
    assert min(sks) > 1000, "ids must sit above the existing max"
    # strided, not dense: gaps bounded by buckets x imbalance
    assert max(sks) <= 1000 + n + ID_BUCKETS * ID_BUCKETS
    again = {r["bk"]: r["sk"] for r in assign_batch_sks(batch, ["bk"], max_sk, "sk").collect()}
    first = {r["bk"]: r["sk"] for r in out.collect()}
    assert first == again, "assignment must be deterministic"
