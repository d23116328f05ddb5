"""HTML→RAW_JOBS parse edge (S2): selector fallbacks + end-to-end ingest.

Fixture pages mirror the two markup generations the reference's
selector lists are built for (parser_config.py:6-100): the primary
topcv layout and a degraded/fallback layout that exercises the 2nd-4th
selector of every field.
"""

from __future__ import annotations

from datetime import date, datetime

import pytest

from jobinsight_data_pipeline_v2_spark.pipelines import ingest_day
from jobinsight_data_pipeline_v2_spark.quality.gates import QualityGateConfig
from jobinsight_data_pipeline_v2_spark.sources import (
    html_pages_to_raw_jobs,
    parse_html,
)
from jobinsight_data_pipeline_v2_spark.storage import WarehouseStorage

# Primary markup: div.job-item-2, data-job-id, tooltip title span,
# label.address / label.title-salary / div.skills label.item with the
# "+N" overflow tooltip, label.time strong deadline, vip badge.
PAGE_PRIMARY = """
<html><body>
<div class="job-item-2" data-job-id="7001">
  <a href="/cong-ty/alpha"><img src="https://cdn.topcv.vn/alpha.png"/></a>
  <h3 class="title"><a href="/viec-lam/python-dev-7001.html">
    <span data-original-title="Python Developer (Upto 40M)">Python Dev…</span>
  </a></h3>
  <a class="company" href="/cong-ty/alpha">Công ty TNHH Alpha</a>
  <label class="address">Hà Nội</label>
  <label class="title-salary">25 - 40 triệu</label>
  <div class="skills">
    <label class="item">Python</label>
    <label class="item" data-original-title="Django, FastAPI">2+</label>
  </div>
  <label class="time"><strong>15</strong></label>
  <span class="vip-badge"></span>
  <span class="time">Cập nhật 2 giờ trước</span>
</div>
<div class="job-item-2" data-job-id="7002">
  <h3 class="title"><a href="/viec-lam/data-engineer-7002.html">Data Engineer</a></h3>
  <a class="company" href="/cong-ty/beta">Beta JSC</a>
  <label class="address">Hồ Chí Minh</label>
  <label class="title-salary">Thỏa thuận</label>
  <label class="time"><strong>7</strong></label>
  <span class="time">Cập nhật 1 ngày trước</span>
</div>
<div class="job-item-2" data-job-id="7001">
  <h3 class="title"><a href="/viec-lam/dup-7001.html">Duplicate of 7001</a></h3>
</div>
<div class="job-item-2">
  <h3 class="title"><a href="/somewhere/no-id">Missing id → dropped</a></h3>
</div>
</body></html>
"""

# Fallback markup: article.job-listing container, no data-job-id (id
# from the URL), .job-title a, .company-name a, .location, .salary,
# .skill-tag, .deadline strong, .verified-badge, span.time.
PAGE_FALLBACK = """
<html><body>
<article class="job-listing">
  <h2 class="job-title"><a href="https://www.topcv.vn/viec-lam/brse-7003.html">BrSE</a></h2>
  <div class="company-name"><a href="https://www.topcv.vn/cong-ty/gamma">Gamma Co</a></div>
  <div class="location">Đà Nẵng</div>
  <div class="salary">1,000 - 2,000 USD</div>
  <span class="skill-tag">Japanese</span>
  <span class="skill-tag">Bridge</span>
  <div class="deadline"><strong>30</strong></div>
  <span class="verified-badge"></span>
  <span class="time">Cập nhật 3 ngày trước</span>
</article>
</body></html>
"""


def test_parse_primary_markup():
    jobs = {j["job_id"]: j for j in parse_html(PAGE_PRIMARY)}
    # dedup kept the first 7001; the id-less item was dropped
    assert sorted(jobs) == ["7001", "7002"]
    j = jobs["7001"]
    assert j["title"] == "Python Developer (Upto 40M)"  # tooltip attr wins
    assert j["job_url"] == "https://www.topcv.vn/viec-lam/python-dev-7001.html"
    assert j["company_name"] == "Công ty TNHH Alpha"
    assert j["company_url"] == "https://www.topcv.vn/cong-ty/alpha"
    assert j["location"] == "Hà Nội"
    assert j["salary"] == "25 - 40 triệu"
    assert j["skills"] == ["Python", "Django", "FastAPI"]  # "+N" expanded
    assert j["deadline"] == "15"
    assert j["verified_employer"] is True
    assert j["last_update"] == "Cập nhật 2 giờ trước"
    assert j["logo_url"] == "https://cdn.topcv.vn/alpha.png"
    j2 = jobs["7002"]
    assert j2["title"] == "Data Engineer"  # link-text fallback
    assert j2["verified_employer"] is False


def test_parse_fallback_markup():
    jobs = parse_html(PAGE_FALLBACK)
    assert len(jobs) == 1
    j = jobs[0]
    assert j["job_id"] == "7003"  # extracted from the URL
    assert j["title"] == "BrSE"
    assert j["company_name"] == "Gamma Co"
    assert j["location"] == "Đà Nẵng"
    assert j["salary"] == "1,000 - 2,000 USD"
    assert j["skills"] == ["Japanese", "Bridge"]
    assert j["deadline"] == "30"
    assert j["verified_employer"] is True
    assert j["last_update"] == "Cập nhật 3 ngày trước"


def test_html_pages_feed_ingest_day(spark, tmp_path):
    day = date(2026, 5, 4)
    crawled = datetime(2026, 5, 4, 6, 0, 0)
    pages = spark.createDataFrame(
        [(PAGE_PRIMARY,), (PAGE_FALLBACK,)], "html string"
    )
    raw = html_pages_to_raw_jobs(pages, crawled)
    rows = {r["job_id"]: r for r in raw.collect()}
    assert sorted(rows) == ["7001", "7002", "7003"]
    assert rows["7001"]["crawled_at"] == crawled
    assert rows["7001"]["posted_time"] is None

    storage = WarehouseStorage(spark, str(tmp_path))
    staging, crawl_gate, staging_gate, _ = ingest_day(
        spark, storage, raw, day, crawled,
        gate_config=QualityGateConfig(min_job_count=1),
    )
    assert crawl_gate.status == "success"
    got = {r["job_id"]: r for r in staging.collect()}
    assert sorted(got) == ["7001", "7002", "7003"]
    # staging derived posted_time from (crawled_at, last_update)
    assert got["7001"]["posted_time"] == datetime(2026, 5, 4, 4, 0, 0)
    # salary normalization ran on the parsed strings (VND units)
    assert float(got["7001"]["salary_min"]) == 25_000_000.0
    assert float(got["7001"]["salary_max"]) == 40_000_000.0
    assert got["7002"]["salary_type"] == "negotiable"


def test_html_blob_layer_roundtrip_and_retention(spark, tmp_path):
    from datetime import timedelta

    from jobinsight_data_pipeline_v2_spark.maintenance import (
        RetentionPolicy,
        retention_sweep,
    )
    from jobinsight_data_pipeline_v2_spark.sources.html_source import (
        blobs_to_raw_jobs,
        read_html_blobs,
        write_html_blobs,
    )

    root = str(tmp_path)
    day = date(2026, 5, 4)
    crawled = datetime(2026, 5, 4, 6, 0, 0)
    pages = spark.createDataFrame(
        [("https://x/1", PAGE_PRIMARY), ("https://x/2", PAGE_FALLBACK)],
        "page_url string, html string",
    )
    write_html_blobs(pages, root, day)
    # a stale capture partition beyond the 15-day policy
    write_html_blobs(pages.limit(1), root, day - timedelta(days=20))

    blobs = read_html_blobs(spark, root, day)
    assert blobs.count() == 2
    row = blobs.collect()[0]
    assert len(row["content_sha256"]) == 64
    assert row["n_bytes"] == len(row["payload"])
    # blobs parse identically to the in-memory strings
    from_blobs = {r["job_id"] for r in blobs_to_raw_jobs(blobs, crawled).collect()}
    assert from_blobs == {"7001", "7002", "7003"}
    # the default html retention policy sweeps the stale partition
    report = retention_sweep(
        spark, root, day, (RetentionPolicy("html", 15, "delete"),)
    )
    assert report["html"] == {
        "action": "delete",
        "cutoff": (day - timedelta(days=15)).isoformat(),
        "kept_partitions": 1,
        "swept_partitions": 1,
    }
    assert read_html_blobs(spark, root, day).count() == 2
