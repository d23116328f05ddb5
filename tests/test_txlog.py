"""Transaction-log table format (txlog.LogTable): commit atomicity,
optimistic concurrency, time travel, copy-on-write deletes, footer
data skipping, vacuum, checkpoints, idempotent txn appends, and
crash residue invisibility."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.txlog import (
    ConcurrentModificationError,
    LogTable,
)


def _df(spark, lo, hi, status="O"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit(status).alias("status"),
    )


def _rows(df):
    return {(r.k, r.v, r.status) for r in df.collect()}


@pytest.fixture()
def table(spark, tmp_path):
    return LogTable(
        spark, str(tmp_path / "t"), stats_cols=("k",), checkpoint_every=3
    )


def test_append_read_and_history(spark, table):
    v1 = table.append(_df(spark, 0, 10))
    v2 = table.append(_df(spark, 10, 20))
    assert (v1, v2) == (1, 2)
    assert _rows(table.read_snapshot()) == _rows(_df(spark, 0, 20))
    assert _rows(table.read_snapshot(version=1)) == _rows(_df(spark, 0, 10))
    hist = table.history()
    assert [h["op"] for h in hist] == ["append", "append"]
    assert all(h["n_remove"] == 0 for h in hist)


def test_delete_where_is_file_granular(spark, table):
    # two appends with disjoint key ranges → the untouched file's
    # path must survive the delete commit verbatim (no rewrite)
    table.append(_df(spark, 0, 10).coalesce(1))
    table.append(_df(spark, 100, 110).coalesce(1))
    before = set(table.snapshot_state()["files"])
    v = table.delete_where("k >= 100 AND k < 105")
    after = table.snapshot_state()["files"]
    untouched = [p for p in before if p in after]
    assert len(untouched) == 1  # the 0-10 file was not rewritten
    assert v == 3
    assert _rows(table.read_snapshot()) == _rows(_df(spark, 0, 10)) | _rows(
        _df(spark, 105, 110)
    )
    # no-match predicate: no new version, snapshot unchanged
    assert table.delete_where("k = 99999") == 3


def test_compact_preserves_values_and_reduces_files(spark, table):
    for i in range(4):
        table.append(_df(spark, i * 10, i * 10 + 10).coalesce(1))
    assert len(table.snapshot_state()["files"]) == 4
    v = table.compact(small_rows=10**6)
    assert v == 5
    assert len(table.snapshot_state()["files"]) == 1
    assert _rows(table.read_snapshot()) == _rows(_df(spark, 0, 40))
    # pre-compaction snapshot still readable (files retained)
    assert _rows(table.read_snapshot(version=4)) == _rows(_df(spark, 0, 40))


def test_append_rebases_over_version_race(spark, table):
    table.append(_df(spark, 0, 5))
    # a racer steals version 2 with a blind append
    racer = LogTable(spark, table.table_dir, stats_cols=("k",))
    racer_adds = racer._stage_files(_df(spark, 50, 55), 2)
    racer._try_commit(
        2,
        [{"commit": {"version": 2, "op": "append"}}]
        + [{"add": a} for a in racer_adds],
    )
    v = table.append(_df(spark, 5, 10))
    assert v == 3  # rebased, not failed
    assert _rows(table.read_snapshot()) == (
        _rows(_df(spark, 0, 10)) | _rows(_df(spark, 50, 55))
    )


def test_rewrite_conflict_raises_when_read_set_invalidated(spark, table):
    table.append(_df(spark, 0, 10).coalesce(1), txn=None)
    state = table.snapshot_state()
    victims = sorted(state["files"])
    out = table.spark.read.parquet(
        *[os.path.join(table.table_dir, p) for p in victims]
    ).filter("k < 5")
    # a racing DELETE commits first, removing the same file
    racer = LogTable(spark, table.table_dir, stats_cols=("k",))
    racer.delete_where("k >= 8")
    with pytest.raises(ConcurrentModificationError):
        table._commit_rewrite("delete", state, victims, out)
    # the loser's staged files must not leak into the live snapshot
    live = set(table.snapshot_state()["files"])
    on_disk = {f"data/{f}" for f in os.listdir(table.data_dir)}
    removed_but_referenced_by_v1 = on_disk - live
    # v1's original file is retained for time travel; nothing else
    assert len(removed_but_referenced_by_v1) == 1


def test_idempotent_txn_append(spark, table):
    v = table.append(_df(spark, 0, 10), txn=("app", 1))
    assert table.append(_df(spark, 0, 10), txn=("app", 1)) == v
    assert table.latest_version() == v
    assert table.read_snapshot().count() == 10
    # a LOWER batch id is also a replay
    assert table.append(_df(spark, 0, 10), txn=("app", 0)) == v
    # the next batch id commits
    v2 = table.append(_df(spark, 10, 12), txn=("app", 2))
    assert v2 == v + 1 and table.read_snapshot().count() == 12


def test_data_skipping_prunes_and_stays_exact(spark, table):
    for i in range(4):
        table.append(_df(spark, i * 100, i * 100 + 50).coalesce(1))
    kept, total = table.pruned_file_count({"k": (120, 140)})
    assert (kept, total) == (1, 4)
    got = table.read_snapshot(where_between={"k": (120, 140)})
    exact = table.read_snapshot().filter("k BETWEEN 120 AND 140")
    assert _rows(got) == _rows(exact)
    # interval straddling two files
    kept2, _ = table.pruned_file_count({"k": (40, 110)})
    assert kept2 == 2


def test_vacuum_retention_and_crash_residue(spark, table):
    table.append(_df(spark, 0, 10).coalesce(1))
    table.append(_df(spark, 10, 20).coalesce(1))
    table.delete_where("k < 5")
    # crashed stage from an OLD run: hint (1) <= latest -> collectable
    table._stage_files(_df(spark, 900, 950), 1)
    # in-flight stage targeting the NEXT version: must be kept (the
    # review-r12 concurrent-writer guard)
    inflight = table._stage_files(_df(spark, 960, 970), 99)
    os.makedirs(os.path.join(table.table_dir, ".tmp-stage-crashed"))
    n_files_live = len(table.snapshot_state()["files"])
    # readers never see uncommitted files
    assert table.read_snapshot().count() == 15
    deleted = table.vacuum(retain_versions=99)
    # staged-orphans + crashed tmp dir removed; every referenced file
    # kept; the ahead-of-latest stage survives
    assert any(d.startswith("data/0000000000000000000 1".replace(" ", ""))
               for d in deleted)
    assert ".tmp-stage-crashed" in deleted
    for a in inflight:
        assert os.path.exists(os.path.join(table.table_dir, a["path"]))
        assert a["path"] not in deleted
    # grace_seconds: a fresh old-hint stage survives a graced vacuum
    table._stage_files(_df(spark, 980, 990), 1)
    assert not any(
        d.startswith("data/") for d in table.vacuum(
            retain_versions=99, grace_seconds=3600
        )
    )
    assert len(table.snapshot_state()["files"]) == n_files_live
    assert _rows(table.read_snapshot(version=2)) == _rows(_df(spark, 0, 20))
    # retention=1: files referenced ONLY by old versions are reclaimed
    table.vacuum(retain_versions=1)
    assert table.read_snapshot().count() == 15  # latest intact
    with pytest.raises(Exception):
        table.read_snapshot(version=2).count()  # horizon passed: gone


def test_checkpoint_equals_full_replay(spark, table):
    for i in range(7):
        table.append(_df(spark, i * 10, i * 10 + 10).coalesce(1))
    cks = glob.glob(os.path.join(table.log_dir, "*.checkpoint.json"))
    assert {os.path.basename(p).split(".")[0] for p in cks} == {
        "0" * 17 + "003", "0" * 17 + "006"
    }
    # state from checkpoint replay == state from scratch (fresh handle
    # with checkpointing disabled sees identical files)
    raw = LogTable(spark, table.table_dir, checkpoint_every=10**9)
    ck = os.path.join(table.log_dir, "0" * 17 + "006.checkpoint.json")
    with open(ck) as f:
        payload = json.load(f)
    assert {a["path"] for a in payload["files"]} == set(
        raw.snapshot_state(6)["files"]
    )
    assert table.read_snapshot().count() == 70


def test_rewrite_paths_preserve_evolved_schema(spark, table):
    """delete_where / compact on a schema-evolved table must carry
    the union schema through the rewrite (review r12: the rewrite
    reads lacked mergeSchema, so Spark could infer the NARROW file's
    schema and silently drop the evolved column from rewritten
    files)."""
    table.append(_df(spark, 0, 10).coalesce(1))
    table.append(
        _df(spark, 10, 20).withColumn("extra", F.col("k") + 1).coalesce(1)
    )
    table.delete_where("k = 0 OR k = 15")  # victims span BOTH schemas
    got = table.read_snapshot()
    assert "extra" in got.columns
    assert got.filter("extra IS NOT NULL").count() == 9  # 10..19 minus 15
    assert got.count() == 18
    table.compact(small_rows=10**6)
    got2 = table.read_snapshot()
    assert got2.filter("extra IS NOT NULL").count() == 9
    assert got2.count() == 18


def test_clustered_compaction_improves_skipping(spark, table):
    """compact(cluster_by=) — the OPTIMIZE shape: interleaved appends
    give every file a full-range footer (skipping prunes nothing);
    the range-clustered rewrite makes each file own a disjoint key
    range, after which a point interval prunes to one file. Values
    byte-preserved."""
    # 4 appends, each spanning the WHOLE key range (k % 4 == i slices)
    for i in range(4):
        table.append(
            spark.range(0, 400).filter(F.col("id") % 4 == i).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"),
                F.lit("O").alias("status"),
            ).coalesce(1)
        )
    kept0, total0 = table.pruned_file_count({"k": (100, 120)})
    assert (kept0, total0) == (4, 4)  # full-range footers: no pruning
    before = _rows(table.read_snapshot())
    v = table.compact(small_rows=10**6, cluster_by=("k",), n_files=4)
    assert v == 5
    kept1, total1 = table.pruned_file_count({"k": (100, 120)})
    assert total1 == 4 and kept1 <= 2  # disjoint ranges: point prunes
    assert _rows(table.read_snapshot()) == before


def test_restore_rolls_back_as_new_commit(spark, table):
    table.append(_df(spark, 0, 10).coalesce(1))
    table.append(_df(spark, 10, 20).coalesce(1))
    table.delete_where("k < 3")
    assert table.read_snapshot().count() == 17
    v = table.restore(2)
    assert v == 4  # history preserved, rollback versioned
    assert _rows(table.read_snapshot()) == _rows(_df(spark, 0, 20))
    # the delete's state is itself restorable (roll forward)
    table.restore(3)
    assert table.read_snapshot().count() == 17
    # no-op restore: same content → no new version
    assert table.restore(5) == 5
    # restoring past the vacuum horizon raises
    table.vacuum(retain_versions=1)
    with pytest.raises(ValueError):
        table.restore(2)


def test_empty_table_and_schema_evolution(spark, table):
    table.append(_df(spark, 0, 5))
    table.delete_where("k >= 0")
    empty = table.read_snapshot()
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v", "status"}
    # evolved append: extra column merges on read
    table.append(
        _df(spark, 5, 8).withColumn("extra", F.col("k") + 1)
    )
    got = table.read_snapshot()
    assert "extra" in got.columns
    assert got.count() == 3
