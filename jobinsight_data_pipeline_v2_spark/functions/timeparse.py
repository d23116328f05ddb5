"""F4/F5/F6 — deadline, time-remaining, and relative-time parsing.

All wall-clock arithmetic is parameterized by an explicit ``as_of``
timestamp (SURVEY §7.1 determinism rule) — the reference's
CURRENT_TIMESTAMP / datetime.now() calls are the #1 source of
non-reproducible output and are banned engine-wide.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def due_date_from_deadline(crawled_at: Column, deadline: Column) -> Column:
    """F5 — due_date = crawled_at + deadline days (when all-digits).

    Reference: staging_procedures.sql:141-145 (`deadline ~ '^\\d+$'`
    guard before the interval cast).
    """
    return F.when(
        deadline.rlike(r"^\d+$"),
        F.timestamp_add("DAY", deadline.cast("int"), crawled_at),
    ).otherwise(F.lit(None).cast("timestamp"))


def time_remaining(due_date: Column, as_of: Column) -> Column:
    """F4 — bucket (due_date − as_of) into Vietnamese countdown strings.

    Reference: update_deadline() (staging_procedures.sql:89-123):
    EXTRACT(day/hour/minute/second FROM interval) — i.e. the leading
    component of the remaining interval, which for positive intervals
    equals floor(diff / unit) within each branch's range.
    NULL due_date → NULL (reference leaves those rows untouched).
    """
    diff = F.timestamp_diff("SECOND", as_of, due_date)
    expired = due_date <= as_of

    def msg(n: Column, unit: str) -> Column:
        return F.concat(F.lit("Còn "), n.cast("string"), F.lit(f" {unit} để ứng tuyển"))

    return (
        F.when(due_date.isNull(), F.lit(None).cast("string"))
        .when(expired, F.lit("Đã hết thời gian ứng tuyển"))
        .when(diff >= 86400, msg(F.floor(diff / 86400), "ngày"))
        .when(diff >= 3600, msg(F.floor(diff / 3600), "giờ"))
        .when(diff >= 60, msg(F.floor(diff / 60), "phút"))
        .otherwise(msg(diff, "giây"))
    )


def last_update_seconds(last_update: Column) -> Column:
    """F6 — Vietnamese relative time → seconds.

    Reference: parser._parse_last_update (topcv/parser.py:83-106):
    strip 'Cập nhật', take the first integer, scale by the unit found
    by substring containment in order tháng→tuần→ngày→giờ→phút; a bare
    number means seconds; no number (or null) → 0.
    """
    t = F.regexp_replace(last_update.cast("string"), "Cập nhật", "")
    num_s = F.regexp_extract(t, r"(\d+)", 1)
    num = F.when(num_s == "", F.lit(0)).otherwise(num_s.cast("long"))
    return (
        F.when(last_update.isNull(), F.lit(0).cast("long"))
        .when(t.contains("tháng"), num * 30 * 24 * 3600)
        .when(t.contains("tuần"), num * 7 * 24 * 3600)
        .when(t.contains("ngày"), num * 24 * 3600)
        .when(t.contains("giờ"), num * 3600)
        .when(t.contains("phút"), num * 60)
        .otherwise(num)
    )


def posted_time_from_last_update(crawled_at: Column, last_update: Column) -> Column:
    """posted_time = crawled_at − parsed seconds (parser.py:206-210)."""
    return F.timestamp_add(
        "SECOND", (-last_update_seconds(last_update)).cast("int"), crawled_at
    )
