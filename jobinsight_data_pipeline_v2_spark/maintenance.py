"""Retention lifecycle: policy-driven sweep + archive restore.

The reference runs maintenance_dag.py daily (cleanup_raw_html,
cleanup_pg_backups, cleanup_dwh_backups) and archive_dag.py weekly
(raw_jobs 30-day HOT → MinIO parquet archive), per the policy table in
docs/governance/retention_policies.md:22-31. Here the whole lifecycle
is one entry point over the parquet catalog:

    retention_sweep(spark, root, as_of)          # enforce all policies
    restore_from_archive(spark, root, layer, d)  # the recovery path

Scale design: layers are partitioned by ``ingest_date=``, so retention
is *partition management* — expired data is dropped or moved a whole
directory at a time, and the retained data is NEVER read or rewritten.
At 100 TB that is the difference between an O(expired) metadata
operation and an O(everything) table rewrite. Archived partitions land
under ``archive/{layer}/year=/month=`` (the reference's bucket layout)
via a write-then-delete two-phase move, so a crash mid-sweep leaves
duplicates in the archive (idempotent to re-sweep), never data loss.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RetentionPolicy:
    """One row of the reference's retention policy table."""

    layer: str  # subdirectory under the warehouse root
    retention_days: int
    action: str  # 'delete' | 'archive'


# docs/governance/retention_policies.md:22-31 — staging is permanent by
# design (the DWH keeps full SCD2 history) and therefore has no policy.
DEFAULT_POLICIES = (
    RetentionPolicy("html", 15, "delete"),      # RETENTION_HTML_DAYS
    RetentionPolicy("raw", 30, "archive"),      # raw_jobs 30-day HOT
    RetentionPolicy("backups", 7, "delete"),    # pg/dwh backup windows
)


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _list_date_partitions(
    spark: SparkSession, layer_path: str, part_col: str = "ingest_date"
) -> list[str]:
    """``part_col`` values present as partition directories, sorted."""
    fs, p = _fs(spark, layer_path)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(f"{part_col}="):
            out.append(name.split("=", 1)[1])
    return sorted(out)


def retention_sweep(
    spark: SparkSession,
    root: str,
    as_of: date,
    policies: tuple[RetentionPolicy, ...] = DEFAULT_POLICIES,
) -> dict[str, dict]:
    """Enforce every retention policy; returns a per-layer report.

    For each policy, partitions with ``ingest_date < as_of -
    retention_days`` are either deleted outright or moved into the
    archive layer (read once, appended under year=/month=, source dir
    deleted). Retained partitions are untouched — no read, no rewrite.
    """
    root = root.rstrip("/")
    report: dict[str, dict] = {}
    for pol in policies:
        if pol.action not in ("delete", "archive"):
            raise ValueError(f"unknown retention action {pol.action!r}")
        layer_path = f"{root}/{pol.layer}"
        cutoff = as_of - timedelta(days=pol.retention_days)
        parts = _list_date_partitions(spark, layer_path)
        expired = [d for d in parts if date.fromisoformat(d) < cutoff]
        if pol.action == "archive" and expired:
            frames = []
            for d in expired:
                day = date.fromisoformat(d)
                frames.append(
                    spark.read.parquet(f"{layer_path}/ingest_date={d}")
                    .withColumn("ingest_date", F.lit(d))
                    .withColumn("year", F.lit(day.year))
                    .withColumn("month", F.lit(day.month))
                )
            archived = frames[0]
            for f in frames[1:]:
                archived = archived.unionByName(f)
            # phase 1: append to the archive (reference bucket layout)
            archived.write.mode("append").partitionBy("year", "month").parquet(
                f"{root}/archive/{pol.layer}"
            )
        # phase 2: drop expired partition directories
        fs, _ = _fs(spark, layer_path)
        for d in expired:
            _, dp = _fs(spark, f"{layer_path}/ingest_date={d}")
            fs.delete(dp, True)
        report[pol.layer] = {
            "action": pol.action,
            "cutoff": cutoff.isoformat(),
            "kept_partitions": len(parts) - len(expired),
            "swept_partitions": len(expired),
        }
    return report


def load_archive(spark: SparkSession, root: str, layer: str) -> DataFrame | None:
    """The archive side of a layer (None if nothing archived yet)."""
    path = f"{root.rstrip('/')}/archive/{layer}"
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    return spark.read.parquet(path)


def restore_from_archive(
    spark: SparkSession, root: str, layer: str, dates: list[date]
) -> int:
    """Recovery path (reference restore_from_archive): copy the given
    ingest dates back from the archive into live partitions. Returns
    the number of rows restored."""
    archive = load_archive(spark, root, layer)
    if archive is None:
        return 0
    wanted = [d.isoformat() for d in dates]
    subset = archive.filter(F.col("ingest_date").isin(wanted))
    n = subset.count()
    if n:
        (
            subset.drop("year", "month")
            .write.mode("overwrite")
            .partitionBy("ingest_date")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{root.rstrip('/')}/{layer}")
        )
    return n


def _partition_bytes_and_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) for one partition directory."""
    fs, p = _fs(spark, path)
    total = files = 0
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            total += status.getLen()
            files += 1
    return total, files


def _recover_compactions(
    spark: SparkSession, layer_path: str, part_col: str = "ingest_date"
) -> list[str]:
    """Finish or roll back swaps a crashed prior compaction left behind.

    Invariant of the swap below: ``.compact_old_{part_col}=d`` exists
    only during the window between the two renames, and the new data
    (``.compact_tmp``) is always complete before that window opens. So:
    old present + partition missing → the crash hit mid-swap: restore
    the old dir (the tmp, if still present, is discarded — it is a
    pure rewrite of the same rows, nothing is lost). Old present +
    partition present → the swap completed but cleanup didn't: drop
    the old copy. Stray tmps are always safe to drop. Returns the
    dates that needed recovery.
    """
    fs, lp = _fs(spark, layer_path)
    if not fs.exists(lp):
        return []
    recovered = []
    for status in fs.listStatus(lp):
        name = status.getPath().getName()
        if name.startswith(f".compact_old_{part_col}="):
            d = name.split("=", 1)[1]
            _, pp = _fs(spark, f"{layer_path}/{part_col}={d}")
            if not fs.exists(pp):
                if not fs.rename(status.getPath(), pp):
                    raise IOError(f"compaction recovery failed for {d}")
            else:
                fs.delete(status.getPath(), True)
            recovered.append(d)
        elif name.startswith(f".compact_tmp_{part_col}="):
            fs.delete(status.getPath(), True)
        elif name.startswith(".compact_lock_broken_"):
            # tombstone from a stale-lock break that crashed between
            # rename and delete — inert, safe to clear
            fs.delete(status.getPath(), False)
    return recovered


# Default stale threshold: 6 h. The per-partition mtime refresh in the
# compaction loop keeps a live run's lock fresh BETWEEN partitions, but
# cannot refresh DURING one partition's rewrite job — so this threshold
# must exceed the worst single-partition rewrite, not just the gap
# between refreshes. Tune it down only if partition rewrites are known
# to be fast; it only delays recovery from a genuinely crashed run.
_COMPACT_LOCK_STALE_MS = 6 * 60 * 60 * 1000


def _acquire_compact_lock(
    spark: SparkSession,
    layer_path: str,
    stale_ms: int = _COMPACT_LOCK_STALE_MS,
):
    """Single-writer guard for ``compact_partitions`` (ADVICE r4).

    Recovery deletes every in-flight ``.compact_tmp_*`` directory, so
    two overlapping compactions of one layer would destroy each
    other's tmp writes and interleave swap renames. A ``.compact_lock``
    file under the layer path serializes them: creation is atomic
    (``FileSystem.createNewFile``), a fresh lock means another writer
    is live (raise — e.g. a cron overlap), and a lock older than
    ``stale_ms`` is a crashed run's leftover. Breaking a stale lock is
    itself race-safe: the breaker must first RENAME the stale lock to
    a tombstone (rename is atomic — of two contenders observing the
    same stale lock, exactly one wins; delete-then-create would let
    the loser delete the winner's fresh lock). Returns
    (fs, lock_path) for the caller's ``finally``.
    """
    import os as _os
    import time as _time

    fs, _ = _fs(spark, layer_path)
    _, lk = _fs(spark, f"{layer_path}/.compact_lock")
    if fs.exists(lk):
        age = _time.time() * 1000 - fs.getFileStatus(lk).getModificationTime()
        if age < stale_ms:
            raise RuntimeError(
                f"another compaction holds {lk} (age {age / 1000:.0f}s); "
                "compact_partitions is single-writer per layer"
            )
        _, tomb = _fs(
            spark,
            f"{layer_path}/.compact_lock_broken_{int(_time.time() * 1000)}"
            f"_{_os.getpid()}",
        )
        if not fs.rename(lk, tomb):
            raise RuntimeError(
                f"stale lock {lk} was broken by a concurrent contender; "
                "compact_partitions is single-writer per layer"
            )
        fs.delete(tomb, False)
    if not fs.createNewFile(lk):
        raise RuntimeError(
            f"lost the compaction lock race for {lk}; "
            "compact_partitions is single-writer per layer"
        )
    # Stamp OUR identity into the lock (ADVICE r5): if this run ever
    # outlives the stale threshold, a contender may legitimately break
    # the lock and create its own — an unconditional delete in the
    # original holder's ``finally`` would then destroy the CONTENDER'S
    # live lock and re-enable overlapping compactions. The release
    # path verifies this token and refuses to delete a lock that is no
    # longer ours. Writing over our freshly-created empty lock is safe:
    # createNewFile already won the race, nobody else owns it yet.
    token = f"{_os.getpid()}_{_time.time_ns()}_{id(spark)}"
    out = fs.create(lk, True)
    try:
        out.write(bytearray(token.encode("utf-8")))
    finally:
        out.close()
    return fs, lk, token


def _release_compact_lock(spark: SparkSession, fs, lk, token: str) -> bool:
    """Delete the compaction lock ONLY if it still carries our token.

    Returns True when released; False (with a warning) when the lock
    was broken and re-acquired by a contender — deleting it then would
    hand a THIRD run an open door while the contender still compacts.
    """
    import warnings

    # exists → open is not atomic: a contender breaking the lock in
    # between must land in the same "vanished" path, not leak a raw
    # FileNotFoundException out of the caller's finally (review r6)
    try:
        stream = fs.open(lk)
    except Exception:
        warnings.warn(
            f"compaction lock {lk} vanished before release; a contender "
            "broke it (run exceeded the stale threshold?)"
        )
        return False
    try:
        current = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8", errors="replace")
    finally:
        stream.close()
    if current != token:
        warnings.warn(
            f"compaction lock {lk} is no longer ours "
            f"(held by {current!r}); leaving it in place"
        )
        return False
    fs.delete(lk, False)
    return True


def compact_partitions(
    spark: SparkSession,
    root: str,
    layer: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    zorder_cols: tuple[str, str] | None = None,
    part_col: str = "ingest_date",
) -> dict[str, dict]:
    """Small-file compaction over a date-partitioned parquet layer.

    Streaming ingestion and per-day incremental writes leave layers
    with many files far below the scan-efficient size; at 100 TB the
    resulting task explosion and namenode/listing pressure dominate
    read cost. For each ``ingest_date=`` partition whose data files
    are BOTH more numerous than ``min_files_to_compact`` AND smaller
    on average than half the target, rewrite the partition at
    ``ceil(bytes / target_file_bytes)`` files, then swap it in with
    two renames (each atomic on HDFS/local; object stores want a
    manifest commit instead). Every run first replays any swap a
    crashed prior run left half-done (``_recover_compactions``): a
    crash can hide a partition only until the next invocation, and
    every rename's return value is checked so a refused rename aborts
    loudly instead of silently reporting success. Compaction is
    SINGLE-WRITER per layer, enforced by an atomic ``.compact_lock``
    file (recovery deletes in-flight tmp dirs, so an overlapping run
    would corrupt a live one): a second invocation while the lock is
    fresh raises; a stale lock (older than the 6 h threshold — a
    crashed holder; see ``_COMPACT_LOCK_STALE_MS`` for the contract)
    is broken automatically via an atomic rename, so two contenders
    can never both claim it. Healthy partitions
    are never read or rewritten — like ``retention_sweep``, this is
    partition management, O(sick partitions) not O(table).

    Returns a per-partition report {date: {files_before, files_after,
    bytes}}; compaction preserves rows exactly (tested) but not
    intra-file ordering — callers that rely on an order must sort at
    read time (every engine consumer already does).

    ``zorder_cols=(a, b)`` clusters WHILE compacting (the OPTIMIZE
    ZORDER BY shape): the rewrite range-partitions + sorts on the
    Morton z-value of the two columns (operators/layout.py) instead of
    a plain repartition — same single rewrite the compaction already
    pays, and every output file's parquet footer becomes a tight
    rectangle in both dimensions, so post-compaction scans with
    predicates on either column skip files at the metadata level.
    Healthy partitions are still never touched: clustering rides the
    fragmentation trigger, it does not add one.
    """
    root = root.rstrip("/")
    layer_path = f"{root}/{layer}"
    fs0, lp0 = _fs(spark, layer_path)
    if not fs0.exists(lp0):
        return {}
    import time as _time

    lock_fs, lock, lock_token = _acquire_compact_lock(spark, layer_path)
    try:
        _recover_compactions(spark, layer_path, part_col)
        report: dict[str, dict] = {}
        for d in _list_date_partitions(spark, layer_path, part_col):
            # refresh the lock mtime between partitions so a
            # many-partition run never looks abandoned; DURING one
            # partition's rewrite the mtime cannot move, which is why
            # the stale threshold must exceed the worst
            # single-partition rewrite (see _COMPACT_LOCK_STALE_MS)
            lock_fs.setTimes(lock, int(_time.time() * 1000), -1)
            part_path = f"{layer_path}/{part_col}={d}"
            nbytes, nfiles = _partition_bytes_and_files(spark, part_path)
            if nfiles < min_files_to_compact or nbytes == 0:
                continue
            if nbytes / nfiles >= target_file_bytes / 2:
                continue  # average file already healthy
            n_out = max(1, -(-nbytes // target_file_bytes))  # ceil
            tmp_path = f"{layer_path}/.compact_tmp_{part_col}={d}"
            part_df = spark.read.parquet(part_path)
            if zorder_cols is None:
                out_df = part_df.repartition(n_out)
            else:
                from .operators.layout import zorder_keys

                out_df = (
                    zorder_keys(part_df, zorder_cols[0], zorder_cols[1])
                    .repartitionByRange(n_out, "__zkey")
                    .sortWithinPartitions("__zkey")
                    .drop("__ux", "__uy", "__zkey")
                )
            out_df.write.mode("overwrite").parquet(tmp_path)
            _swap_partition(
                spark, layer_path, d, tmp_path, part_path, part_col
            )
            _, files_after = _partition_bytes_and_files(spark, part_path)
            report[d] = {
                "files_before": nfiles,
                "files_after": files_after,
                "bytes": nbytes,
            }
        return report
    finally:
        _release_compact_lock(spark, lock_fs, lock, lock_token)


def _swap_partition(
    spark: SparkSession, layer_path: str, d: str, tmp_path: str,
    part_path: str, part_col: str = "ingest_date",
) -> None:
    """Two-rename atomic partition swap (shared by compaction and
    targeted deletion): move the live partition aside, move the
    rewritten tmp in, delete the old — every rename's return value
    checked, and a refused swap-in restores the old data before
    failing so the partition is never left hidden. Crash recovery is
    `_recover_compactions` (all callers use the same `.compact_*`
    naming per partition column, so a half-done swap from any of
    them replays identically)."""
    fs, tp = _fs(spark, tmp_path)
    _, pp = _fs(spark, part_path)
    old_path = f"{layer_path}/.compact_old_{part_col}={d}"
    _, op = _fs(spark, old_path)
    if not fs.rename(pp, op):
        fs.delete(tp, True)
        raise IOError(f"partition swap-out refused for {part_path}")
    if not fs.rename(tp, pp):
        # put the old data back before failing — never leave the
        # partition hidden when we can still restore it
        fs.rename(op, pp)
        raise IOError(f"partition swap-in refused for {part_path}")
    fs.delete(op, True)


def delete_rows(
    spark: SparkSession,
    root: str,
    layer: str,
    predicate: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    part_col: str = "ingest_date",
) -> dict[str, dict]:
    """Targeted row deletion (right-to-erasure / GDPR delete) over a
    date-partitioned parquet layer: rewrite ONLY the partitions that
    contain rows matching ``predicate`` (a Spark SQL boolean
    expression), keeping everything else byte-untouched.

    Deletion is TRUE-only: a row where the predicate evaluates NULL is
    KEPT (three-valued logic must never destroy data it did not
    positively match — review r7 s4).

    Scale shape: the per-partition existence probe is a pushed-filter
    scan with LIMIT 1 — parquet row-group stats usually answer it from
    footers (O(metadata) for clean partitions, which at 100 TB is
    almost all of them); a dirty partition pays one counting scan plus
    one rewrite sized by the SURVIVING bytes (a 99%-delete must not
    shatter the remainder into small-file compaction bait) and swaps
    in atomically (`_swap_partition` — the compaction rename
    discipline, same crash-recovery replay). Dataless partition dirs
    (crashed-writer debris) are skipped like compaction skips them.
    The whole sweep runs under the layer's single-writer
    `.compact_lock`.

    Returns {date: {rows_deleted, files_after}}. Deleting every row of
    a partition leaves an empty (zero-data-file) partition directory —
    readers see zero rows, the layout stays enumerable.
    """
    root = root.rstrip("/")
    layer_path = f"{root}/{layer}"
    fs0, lp0 = _fs(spark, layer_path)
    if not fs0.exists(lp0):
        return {}
    import time as _time

    lock_fs, lock, lock_token = _acquire_compact_lock(spark, layer_path)
    try:
        _recover_compactions(spark, layer_path, part_col)
        report: dict[str, dict] = {}
        for d in _list_date_partitions(spark, layer_path, part_col):
            lock_fs.setTimes(lock, int(_time.time() * 1000), -1)
            part_path = f"{layer_path}/{part_col}={d}"
            nbytes, _ = _partition_bytes_and_files(spark, part_path)
            if nbytes == 0:
                continue  # dataless dir (crashed writer debris): skip
            part_df = spark.read.parquet(part_path)
            if part_df.filter(predicate).limit(1).count() == 0:
                continue  # clean partition: footer-answered, untouched
            # ONE full scan gives both counts; deletion is TRUE-only —
            # a NULL-evaluating predicate keeps its row (three-valued
            # logic must never destroy data it did not positively match)
            counts = part_df.agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(
                    F.when(F.expr(predicate), 1).otherwise(0)
                ).alias("matched"),
            ).collect()[0]
            n_total, n_match = counts["total"], int(counts["matched"] or 0)
            keep = part_df.filter(f"NOT coalesce(({predicate}), false)")
            # size output files by the SURVIVING bytes, not the
            # pre-delete bytes — a 99%-delete must not shatter the
            # remainder into compaction bait
            kept_bytes = nbytes * (n_total - n_match) // max(n_total, 1)
            n_out = max(1, -(-kept_bytes // target_file_bytes))  # ceil
            tmp_path = f"{layer_path}/.compact_tmp_{part_col}={d}"
            keep.repartition(n_out).write.mode("overwrite").parquet(
                tmp_path
            )
            _swap_partition(
                spark, layer_path, d, tmp_path, part_path, part_col
            )
            _, files_after = _partition_bytes_and_files(spark, part_path)
            report[d] = {
                "rows_deleted": n_match,
                "files_after": files_after,
            }
        return report
    finally:
        _release_compact_lock(spark, lock_fs, lock, lock_token)
