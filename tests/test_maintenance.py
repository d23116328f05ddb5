"""Retention sweep over a multi-day layered store with mixed policies."""

from __future__ import annotations

from datetime import date, timedelta

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.maintenance import (
    RetentionPolicy,
    load_archive,
    restore_from_archive,
    retention_sweep,
)

AS_OF = date(2026, 4, 20)
POLICIES = (
    RetentionPolicy("html", 15, "delete"),
    RetentionPolicy("raw", 30, "archive"),
)


def _write_layer(spark, root, layer, days_ago_list, rows_per_day=10):
    for days_ago in days_ago_list:
        d = AS_OF - timedelta(days=days_ago)
        df = spark.range(rows_per_day).select(
            F.col("id"),
            F.lit(f"{layer}-{d.isoformat()}").alias("payload"),
        )
        df.write.mode("overwrite").parquet(
            f"{root}/{layer}/ingest_date={d.isoformat()}"
        )


@pytest.fixture()
def layered_root(spark, tmp_path):
    root = str(tmp_path)
    # html: 3 fresh (≤15d), 2 expired
    _write_layer(spark, root, "html", [1, 10, 14, 16, 40])
    # raw: 2 fresh (≤30d), 3 expired spanning two months
    _write_layer(spark, root, "raw", [5, 29, 31, 45, 75])
    return root


def test_sweep_mixed_policies(spark, layered_root):
    report = retention_sweep(spark, layered_root, AS_OF, POLICIES)
    assert report["html"] == {
        "action": "delete", "cutoff": (AS_OF - timedelta(days=15)).isoformat(),
        "kept_partitions": 3, "swept_partitions": 2,
    }
    assert report["raw"]["kept_partitions"] == 2
    assert report["raw"]["swept_partitions"] == 3
    # live layers hold only retained rows
    html = spark.read.parquet(f"{layered_root}/html")
    assert html.count() == 30
    raw = spark.read.parquet(f"{layered_root}/raw")
    assert raw.count() == 20
    # html expired is gone for good; raw expired moved to the archive
    assert load_archive(spark, layered_root, "html") is None
    arch = load_archive(spark, layered_root, "raw")
    assert arch.count() == 30
    # archive carries the reference's year=/month= layout
    months = {
        (r["year"], r["month"])
        for r in arch.select("year", "month").distinct().collect()
    }
    assert len(months) == 2


def test_sweep_is_idempotent(spark, layered_root):
    retention_sweep(spark, layered_root, AS_OF, POLICIES)
    report2 = retention_sweep(spark, layered_root, AS_OF, POLICIES)
    assert report2["html"]["swept_partitions"] == 0
    assert report2["raw"]["swept_partitions"] == 0
    assert load_archive(spark, layered_root, "raw").count() == 30


def test_restore_from_archive(spark, layered_root):
    retention_sweep(spark, layered_root, AS_OF, POLICIES)
    lost_day = AS_OF - timedelta(days=45)
    n = restore_from_archive(spark, layered_root, "raw", [lost_day])
    assert n == 10
    back = spark.read.parquet(f"{layered_root}/raw").filter(
        F.col("ingest_date") == lost_day.isoformat()
    )
    assert back.count() == 10
    # dynamic partition overwrite: the retained live partitions survive
    assert spark.read.parquet(f"{layered_root}/raw").count() == 30
    # restoring an unknown date is a no-op
    assert restore_from_archive(
        spark, layered_root, "raw", [AS_OF - timedelta(days=999)]
    ) == 0


def test_compact_partitions_rewrites_only_fragmented(spark, tmp_path):
    from jobinsight_data_pipeline_v2_spark.maintenance import (
        _partition_bytes_and_files,
        compact_partitions,
    )

    root = str(tmp_path)
    frag_day, healthy_day = "2026-04-01", "2026-04-02"
    # fragmented: 200 rows scattered over 12 tiny files
    spark.range(200).select(
        F.col("id"), F.lit("x").alias("payload")
    ).repartition(12).write.mode("overwrite").parquet(
        f"{root}/staging/ingest_date={frag_day}"
    )
    # healthy: same data volume in a single file
    spark.range(200).select(
        F.col("id"), F.lit("y").alias("payload")
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{root}/staging/ingest_date={healthy_day}"
    )
    before_frag = spark.read.parquet(
        f"{root}/staging/ingest_date={frag_day}"
    ).collect()
    _, healthy_files = _partition_bytes_and_files(
        spark, f"{root}/staging/ingest_date={healthy_day}"
    )

    # tiny target so ceil(bytes/target) lands between 1 and 12
    report = compact_partitions(
        spark, root, "staging", target_file_bytes=64 * 1024
    )
    assert set(report) == {frag_day}
    assert report[frag_day]["files_before"] == 12
    assert report[frag_day]["files_after"] < 12
    # data preserved exactly
    after = spark.read.parquet(f"{root}/staging/ingest_date={frag_day}")
    assert sorted((r.id, r.payload) for r in after.collect()) == sorted(
        (r.id, r.payload) for r in before_frag
    )
    # healthy partition untouched
    _, healthy_after = _partition_bytes_and_files(
        spark, f"{root}/staging/ingest_date={healthy_day}"
    )
    assert healthy_after == healthy_files
    # idempotent: second sweep finds nothing to do
    assert compact_partitions(
        spark, root, "staging", target_file_bytes=64 * 1024
    ) == {}
    # no tmp/old debris
    fs_listing = {
        s.getPath().getName()
        for s in spark._jvm.org.apache.hadoop.fs.Path(
            f"{root}/staging"
        ).getFileSystem(spark._jsc.hadoopConfiguration()).listStatus(
            spark._jvm.org.apache.hadoop.fs.Path(f"{root}/staging")
        )
    }
    assert not any(n.startswith(".compact") for n in fs_listing)


def test_compact_partitions_recovers_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the partition as
    .compact_old only; the next run must restore it before compacting,
    and a completed-swap leftover (.compact_old beside a live
    partition) must be dropped, not restored over the new data."""
    from jobinsight_data_pipeline_v2_spark.maintenance import (
        _fs,
        compact_partitions,
    )

    root = str(tmp_path)
    day_a, day_b = "2026-05-01", "2026-05-02"
    for d, payload in ((day_a, "a"), (day_b, "b")):
        spark.range(50).select(
            F.col("id"), F.lit(payload).alias("payload")
        ).repartition(6).write.mode("overwrite").parquet(
            f"{root}/staging/ingest_date={d}"
        )
    rows_a = sorted(
        (r.id, r.payload)
        for r in spark.read.parquet(
            f"{root}/staging/ingest_date={day_a}"
        ).collect()
    )
    # simulate the mid-swap crash on day A: partition renamed away,
    # a complete tmp left behind
    fs, pa = _fs(spark, f"{root}/staging/ingest_date={day_a}")
    _, oa = _fs(spark, f"{root}/staging/.compact_old_ingest_date={day_a}")
    _, ta = _fs(spark, f"{root}/staging/.compact_tmp_ingest_date={day_a}")
    assert fs.rename(pa, oa)
    spark.range(50).select(
        F.col("id"), F.lit("a").alias("payload")
    ).coalesce(1).write.parquet(f"{root}/staging/.compact_tmp_ingest_date={day_a}")
    # simulate a completed swap with leftover old on day B
    _, ob = _fs(spark, f"{root}/staging/.compact_old_ingest_date={day_b}")
    spark.range(50).select(
        F.col("id"), F.lit("stale").alias("payload")
    ).write.parquet(f"{root}/staging/.compact_old_ingest_date={day_b}")

    report = compact_partitions(
        spark, root, "staging", target_file_bytes=64 * 1024
    )
    # day A restored (then compacted in the same run), rows intact
    got_a = sorted(
        (r.id, r.payload)
        for r in spark.read.parquet(
            f"{root}/staging/ingest_date={day_a}"
        ).collect()
    )
    assert got_a == rows_a
    # day B kept its live (non-stale) data; leftover old dropped
    assert {
        r.payload
        for r in spark.read.parquet(
            f"{root}/staging/ingest_date={day_b}"
        ).collect()
    } == {"b"}
    assert not fs.exists(oa) and not fs.exists(ob) and not fs.exists(ta)
    assert set(report) == {day_a, day_b}


def test_compaction_lock_lifecycle(spark, tmp_path):
    """Single-writer lock: a fresh lock blocks a second acquirer, a
    stale lock is broken (atomically, via rename) and re-acquired, and
    an orphaned break tombstone is cleared by recovery."""
    import os
    import time

    from jobinsight_data_pipeline_v2_spark.maintenance import (
        _acquire_compact_lock,
        _fs,
        _recover_compactions,
        _release_compact_lock,
    )

    layer = f"{tmp_path}/staging"
    os.makedirs(layer)
    fs, lk, token = _acquire_compact_lock(spark, layer)
    assert fs.exists(lk)
    # a live (fresh) lock blocks the next acquirer
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="single-writer"):
        _acquire_compact_lock(spark, layer)
    # age the lock past the stale threshold -> breakable and re-acquired
    fs.setTimes(lk, int((time.time() - 10_000) * 1000), -1)
    fs2, lk2, token2 = _acquire_compact_lock(spark, layer, stale_ms=3600 * 1000)
    assert fs2.exists(lk2)
    assert token2 != token
    # ADVICE r5: the ORIGINAL holder's release must see the lock is no
    # longer its own (the contender overwrote the token) and refuse to
    # delete the contender's live lock
    with _pytest.warns(UserWarning, match="no longer ours"):
        assert not _release_compact_lock(spark, fs, lk, token)
    assert fs2.exists(lk2)
    # the contender's own release succeeds
    assert _release_compact_lock(spark, fs2, lk2, token2)
    assert not fs2.exists(lk2)
    # releasing a vanished lock warns instead of raising
    with _pytest.warns(UserWarning, match="vanished"):
        assert not _release_compact_lock(spark, fs2, lk2, token2)
    # an orphaned tombstone (crash between rename and delete) is inert
    # and cleared by the next recovery pass
    _, tomb = _fs(spark, f"{layer}/.compact_lock_broken_123_456")
    fs.createNewFile(tomb)
    _recover_compactions(spark, layer)
    assert not fs.exists(tomb)


def test_streaming_duration_parser():
    """_duration_ms accepts the subset the streaming twins document and
    rejects everything else loudly."""
    import pytest as _pytest

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        _duration_ms,
        segment_dedup_stream,
    )

    assert _duration_ms("30 seconds") == 30_000
    assert _duration_ms("1 minute") == 60_000
    assert _duration_ms("2 hours") == 7_200_000
    assert _duration_ms("500 milliseconds") == 500
    for bad in ("30", "seconds", "1.5 hours", "30 fortnights"):
        with _pytest.raises(ValueError):
            _duration_ms(bad)
    # ts_col and horizon must travel together
    with _pytest.raises(ValueError, match="together"):
        segment_dedup_stream(None, ts_col="ts")


def test_delete_rows_rewrites_only_dirty_partitions(spark, tmp_path):
    """Right-to-erasure: only partitions containing matching rows are
    rewritten; matching rows vanish, everything else survives exactly,
    clean partitions stay byte-untouched, and the sweep is idempotent.
    Deleting every row of a partition leaves a readable empty one."""
    from jobinsight_data_pipeline_v2_spark.maintenance import (
        _partition_bytes_and_files,
        delete_rows,
    )

    root = str(tmp_path)
    dirty, clean, doomed = "2026-06-01", "2026-06-02", "2026-06-03"
    spark.range(100).select(
        F.col("id").alias("user_id"), F.lit("a").alias("v")
    ).coalesce(2).write.parquet(f"{root}/staging/ingest_date={dirty}")
    # clean ids are ≡ 2 (mod 10): no row can match the predicate
    spark.range(100).select(
        (F.col("id") * 10 + 2).alias("user_id"), F.lit("b").alias("v")
    ).coalesce(1).write.parquet(f"{root}/staging/ingest_date={clean}")
    spark.range(400, 410).select(
        F.col("id").alias("user_id"), F.lit("c").alias("v")
    ).coalesce(1).write.parquet(f"{root}/staging/ingest_date={doomed}")
    clean_stat = _partition_bytes_and_files(
        spark, f"{root}/staging/ingest_date={clean}"
    )

    report = delete_rows(
        spark, root, "staging", "user_id % 10 = 7 OR v = 'c'"
    )
    assert set(report) == {dirty, doomed}
    assert report[dirty]["rows_deleted"] == 10
    assert report[doomed]["rows_deleted"] == 10
    back = spark.read.parquet(f"{root}/staging/ingest_date={dirty}")
    assert back.count() == 90
    assert back.filter("user_id % 10 = 7").count() == 0
    # the doomed partition emptied but stays readable
    assert (
        spark.read.parquet(f"{root}/staging/ingest_date={doomed}").count()
        == 0
    )
    # clean partition byte-untouched
    assert (
        _partition_bytes_and_files(
            spark, f"{root}/staging/ingest_date={clean}"
        )
        == clean_stat
    )
    # idempotent: nothing left to delete
    assert (
        delete_rows(spark, root, "staging", "user_id % 10 = 7 OR v = 'c'")
        == {}
    )
    # no tmp/old debris
    fs_listing = {
        s.getPath().getName()
        for s in spark._jvm.org.apache.hadoop.fs.Path(
            f"{root}/staging"
        ).getFileSystem(spark._jsc.hadoopConfiguration()).listStatus(
            spark._jvm.org.apache.hadoop.fs.Path(f"{root}/staging")
        )
    }
    assert not any(n.startswith(".compact") for n in fs_listing)


def test_delete_rows_keeps_null_evaluating_rows(spark, tmp_path):
    """Three-valued logic guard (review r7 s4): a row where the
    predicate evaluates NULL must be KEPT, not destroyed alongside the
    TRUE matches; rows_deleted counts only positive matches. Dataless
    partition dirs are skipped, not fatal."""
    import os

    from jobinsight_data_pipeline_v2_spark.maintenance import delete_rows

    root = str(tmp_path)
    spark.sql(
        "SELECT * FROM VALUES (CAST(7 AS BIGINT), 'a'),"
        " (CAST(NULL AS BIGINT), 'b'), (CAST(3 AS BIGINT), 'c')"
        " t(user_id, v)"
    ).coalesce(1).write.parquet(f"{root}/staging/ingest_date=2026-07-01")
    # a dataless partition dir (crashed-writer debris) must be skipped
    os.makedirs(f"{root}/staging/ingest_date=2026-07-02")
    report = delete_rows(spark, root, "staging", "user_id = 7")
    assert report == {
        "2026-07-01": {"rows_deleted": 1, "files_after": 1}
    }, report
    back = spark.read.parquet(f"{root}/staging/ingest_date=2026-07-01")
    got = sorted((r.user_id, r.v) for r in back.collect()
                 if r.user_id is not None)
    assert got == [(3, "c")]
    assert back.filter("user_id IS NULL").count() == 1, (
        "NULL-evaluating row was destroyed"
    )
