"""Unit tests for the scalar function library (SURVEY §5.2 item 1).

Golden cases ported 1:1 from the reference's fixtures and unit suite
(tests/fixtures/sample_data.json, tests/unit/test_cleaners.py,
test_dimensions.py) — same inputs must yield the same strings/structs.
"""

from __future__ import annotations

import hashlib
from datetime import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.functions import (
    clean_company_name,
    clean_title,
    company_bk_hash,
    normalize_salary,
    parse_location,
)
from jobinsight_data_pipeline_v2_spark.functions.timeparse import (
    due_date_from_deadline,
    last_update_seconds,
    time_remaining,
)


def _apply_str(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(fn(F.col("v")).alias("out")).collect()]


# --- F1 clean_title (fixtures titles_to_clean + test_cleaners.py) ---------

TITLE_CASES = [
    ("Senior Python Developer - Thu Nhập Upto 40 Triệu", "Senior Python Developer"),
    ("Backend Developer(Java, Spring Boot)", "Backend Developer (Java, Spring Boot)"),
    ("C++ Developer - Tại Hà Nội", "C++ Developer"),
    (".NET Developer | Lương 30 Triệu", ".NET Developer"),
    ("C# Developer - Upto $2000", "C# Developer"),
    ("Data Engineer - Lương Từ 25 Triệu", "Data Engineer"),
    ("DevOps Engineer [Hà Nội]", "DevOps Engineer"),
    ("Tester:Manual,Automation", "Tester: Manual, Automation"),
    ("Frontend Dev !!! ReactJS ***", "Frontend Dev ReactJS"),
    (None, ""),
    ("", ""),
]


@pytest.mark.parametrize("inp,expected", TITLE_CASES)
def test_clean_title(spark, inp, expected):
    assert _apply_str(spark, clean_title, [inp]) == [expected]


# --- F2 clean_company_name (fixtures companies_to_clean) ------------------

COMPANY_CASES = [
    ("công ty tnhh fpt software", "Công Ty TNHH FPT Software"),
    ("CÔNG TY CP CÔNG NGHỆ AI", "Công Ty CP Công Nghệ AI"),
    ("vng corporation tuyển dụng", "Vng Corporation"),
    ("ngân hàng TMCP quân đội", "Ngân Hàng Tmcp Quân Đội"),
    ("CÔNG TY TNHH ABC!!! (HOT)", "Công Ty TNHH Abc ()"),
    (None, ""),
]


@pytest.mark.parametrize("inp,expected", COMPANY_CASES)
def test_clean_company_name(spark, inp, expected):
    assert _apply_str(spark, clean_company_name, [inp]) == [expected]


# --- F3 normalize_salary (staging_procedures.sql branches 1-11) -----------

SALARY_CASES = [
    ("Thỏa thuận", (None, None, "negotiable")),
    ("Thoả thuận", (None, None, "negotiable")),
    ("thương lượng nhé", (None, None, "negotiable")),
    (None, (None, None, "negotiable")),
    ("", (None, None, "negotiable")),
    ("Cạnh tranh", (None, None, "competitive")),
    ("0.0 - 0.0 triệu", (None, None, "negotiable")),
    ("1,000 - 2,000 USD", (Decimal("25000000"), Decimal("50000000"), "range")),
    ("25 - 40 triệu", (Decimal("25000000"), Decimal("40000000"), "range")),
    ("2,5 - 3,5 triệu", (Decimal("2500000"), Decimal("3500000"), "range")),
    ("Tới 1,500 USD", (None, Decimal("37500000"), "upto")),
    ("tới 30 triệu", (None, Decimal("30000000"), "upto")),
    ("Từ 15 triệu", (Decimal("15000000"), None, "from")),
    ("800 USD", (Decimal("20000000"), Decimal("20000000"), "range")),
    ("12 triệu", (Decimal("12000000"), Decimal("12000000"), "range")),
    ("lương hấp dẫn", (None, None, "unknown")),
]


@pytest.mark.parametrize("inp,expected", SALARY_CASES)
def test_normalize_salary(spark, inp, expected):
    df = spark.createDataFrame([(inp,)], "v string")
    row = df.select(normalize_salary(F.col("v")).alias("s")).select("s.*").collect()[0]
    got = (
        None if row.salary_min is None else Decimal(row.salary_min),
        None if row.salary_max is None else Decimal(row.salary_max),
        row.salary_type,
    )
    exp = (
        None if expected[0] is None else expected[0].quantize(Decimal("0.01")),
        None if expected[1] is None else expected[1].quantize(Decimal("0.01")),
        expected[2],
    )
    assert got == exp


# --- F7 company_bk_hash (test_dimensions.py:11-47) ------------------------


def test_company_hash_properties(spark):
    vals = ["FPT Software", "  fpt software  ", "fpt software", None, "", "Công Ty VNG"]
    out = _apply_str(spark, company_bk_hash, vals)
    # determinism + case/whitespace insensitivity
    assert out[0] == out[1] == out[2]
    # null/empty fall back to md5('unknown')
    assert out[3] == out[4] == hashlib.md5(b"unknown").hexdigest()
    # utf-8 agreement with CPython's md5
    assert out[5] == hashlib.md5("công ty vng".encode()).hexdigest()


# --- F8 parse_location ----------------------------------------------------

LOCATION_CASES = [
    ("Hà Nội", [("Hà Nội", "Vietnam")]),
    ("Hồ Chí Minh", [("Hồ Chí Minh (mới)", "Vietnam")]),
    ("Hà Nội & Hồ Chí Minh", [("Hà Nội", "Vietnam"), ("Hồ Chí Minh (mới)", "Vietnam")]),
    ("Hà Nội & 2 nơi khác", [("Hà Nội", "Vietnam")]),
    ("Nhật Bản", [("Unknown", "Nhật Bản")]),
    ("Hà Nội & Japan", [("Hà Nội", "Vietnam"), ("Unknown", "Japan")]),
    ("Đà Nẵng (mới)", [("Đà Nẵng (mới)", "Vietnam")]),
    ("Hà Nội (mới)", [("Hà Nội", "Vietnam")]),
    ("Bình Dương", [("Bình Dương", "Vietnam")]),  # not in either province set
    (None, []),
    ("", []),
]


@pytest.mark.parametrize("inp,expected", LOCATION_CASES)
def test_parse_location(spark, inp, expected):
    df = spark.createDataFrame([(inp,)], "v string")
    arr = df.select(parse_location(F.col("v")).alias("a")).collect()[0]["a"]
    got = [(x["city"], x["country"]) for x in arr]
    assert got == expected


# --- F4/F5/F6 time functions ----------------------------------------------


def test_due_date_and_time_remaining(spark):
    df = spark.createDataFrame(
        [
            ("1", datetime(2026, 1, 15, 6, 0, 0), "10"),
            ("2", datetime(2026, 1, 15, 6, 0, 0), "31/01/2026"),  # not all-digits
            ("3", datetime(2026, 1, 15, 6, 0, 0), None),
        ],
        "id string, crawled_at timestamp, deadline string",
    )
    out = {
        r["id"]: r["due"]
        for r in df.select(
            "id", due_date_from_deadline(F.col("crawled_at"), F.col("deadline")).alias("due")
        ).collect()
    }
    assert out["1"] == datetime(2026, 1, 25, 6, 0, 0)
    assert out["2"] is None and out["3"] is None

    as_of = datetime(2026, 1, 15, 12, 0, 0)
    tr = spark.createDataFrame(
        [
            ("d", datetime(2026, 1, 20, 13, 0, 0)),   # 5d1h → days
            ("h", datetime(2026, 1, 15, 17, 30, 0)),  # 5.5h → hours
            ("m", datetime(2026, 1, 15, 12, 45, 30)), # 45.5m → minutes
            ("s", datetime(2026, 1, 15, 12, 0, 30)),  # 30s → seconds
            ("x", datetime(2026, 1, 10, 0, 0, 0)),    # expired
            ("n", None),
        ],
        "id string, due timestamp",
    )
    got = {
        r["id"]: r["tr"]
        for r in tr.select(
            "id", time_remaining(F.col("due"), F.lit(as_of).cast("timestamp")).alias("tr")
        ).collect()
    }
    assert got["d"] == "Còn 5 ngày để ứng tuyển"
    assert got["h"] == "Còn 5 giờ để ứng tuyển"
    assert got["m"] == "Còn 45 phút để ứng tuyển"
    assert got["s"] == "Còn 30 giây để ứng tuyển"
    assert got["x"] == "Đã hết thời gian ứng tuyển"
    assert got["n"] is None


def test_last_update_seconds(spark):
    cases = {
        "Cập nhật 2 tháng trước": 2 * 30 * 86400,
        "Cập nhật 1 tuần trước": 7 * 86400,
        "Cập nhật 3 ngày trước": 3 * 86400,
        "Cập nhật 5 giờ trước": 5 * 3600,
        "Cập nhật 12 phút trước": 12 * 60,
        "42": 42,
        "không rõ": 0,
        None: 0,
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    out = _apply_str(spark, last_update_seconds, list(cases.keys()))
    assert out == list(cases.values())
