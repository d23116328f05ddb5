"""Transaction-log table format: ACID snapshots over plain parquet —
a self-contained implementation of the published lakehouse commit
protocol (Delta Lake / Iceberg shape): an append-only JSON commit log
beside immutable data files, snapshot reads by log replay, time
travel, file-statistics data skipping, copy-on-write deletes,
small-file compaction, version-retained vacuum, log checkpoints, and
idempotent (exactly-once) streaming appends.

Layout::

    table_dir/
      _txlog/00000000000000000001.json     commit 1 (JSON-lines actions)
      _txlog/00000000000000000007.checkpoint.json   full state at v7
      data/00000000000000000001-00003.parquet       immutable data file

Commit protocol (the HDFS-Delta device): a writer stages its commit
to a dot-hidden tmp name, then publishes with ``os.link`` — an atomic
create-if-absent, so exactly ONE of two racing writers can own a
version number; the loser re-reads the log and either rebases (blind
appends never conflict) or raises ``ConcurrentModificationError``
(its read set was invalidated). Data files are renamed into ``data/``
BEFORE the commit attempt: an uncommitted or crashed write leaves
only unreferenced files, invisible to every reader and reclaimed by
``vacuum`` — readers trust the LOG, never the directory listing.

Actions (one JSON object per line): ``{"commit": {"version", "op",
"schema"?, "txn"?}}``, ``{"add": {"path", "rows", "stats"}}``,
``{"remove": {"path"}}``. Stats carry per-file column min/max read
from the parquet footers at write time; ``read_snapshot(where_
between=...)`` prunes the file list against them before Spark ever
plans the scan — partition-pruning semantics without a partition
scheme, exact because the real predicate is still applied.

Determinism: retention and conflict rules are VERSION-based, so
snapshot/commit behavior is replayable (the repo-wide no-rand
discipline). The one wall-clock surface is ``vacuum``'s OPT-IN
``grace_seconds`` mtime guard for concurrent-writer deployments
(documented there); at the default 0 vacuum is clock-free too.

Scale shape: snapshot state is O(live files) metadata, replayed from
the newest checkpoint + log tail (checkpoints every
``checkpoint_every`` commits keep replay bounded); data-file writes
are distributed Spark jobs; only the commit file itself — a few KB of
JSON — is driver-side. Footer-stat collection is one metadata read
per new file in the commit path (what production lakehouse writers
do task-side; at gate scale the driver loop is equivalent).

Reference analog: none (net-new — the storage layer the reference's
parquet catalog would graduate to at 100 TB; storage.py's two-phase
day swap covers the single-table daily-build case, this covers
concurrent multi-writer tables with history).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentModificationError(RuntimeError):
    """A racing commit invalidated this transaction's read set."""


_V_WIDTH = 20


def _vname(version: int) -> str:
    return f"{version:0{_V_WIDTH}d}.json"


class LogTable:
    """One transaction-logged table rooted at ``table_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        stats_cols: tuple[str, ...] = (),
        checkpoint_every: int = 10,
    ) -> None:
        self.spark = spark
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, "_txlog")
        self.data_dir = os.path.join(table_dir, "data")
        self.stats_cols = tuple(stats_cols)
        self.checkpoint_every = checkpoint_every
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------------------
    # log plumbing
    # ------------------------------------------------------------------

    def latest_version(self) -> int:
        vs = [
            int(os.path.basename(p).split(".")[0])
            for p in glob.glob(os.path.join(self.log_dir, "*.json"))
            if not os.path.basename(p).startswith(".")
            and ".checkpoint" not in p
        ]
        return max(vs, default=0)

    def _commit_actions(self, version: int) -> list[dict]:
        with open(os.path.join(self.log_dir, _vname(version))) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _latest_checkpoint_at_or_before(self, version: int) -> int:
        best = 0
        for p in glob.glob(
            os.path.join(self.log_dir, "*.checkpoint.json")
        ):
            v = int(os.path.basename(p).split(".")[0])
            if v <= version:
                best = max(best, v)
        return best

    def snapshot_state(self, version: int | None = None) -> dict:
        """Replay the log (from the newest usable checkpoint) up to
        ``version``: {"version", "files": {path: add-dict},
        "schema": json-or-None, "schemas": sorted-list-or-None,
        "txns": {app_id: batch_id}}.

        ``schemas`` is the SET of distinct schema jsons ever recorded
        by commits up to ``version`` — when it has exactly one entry,
        every live file provably carries that schema (rewrites read
        and re-write it unchanged) and readers can skip the
        distributed mergeSchema footer pass (r12 optimization, guide
        §1.2/§6). ``None`` means unknown (a pre-r12 checkpoint
        without the field): readers fall back to mergeSchema."""
        latest = self.latest_version()
        if version is None:
            version = latest
        if version > latest:
            raise ValueError(
                f"version {version} beyond latest {latest}"
            )
        start = self._latest_checkpoint_at_or_before(version)
        if start:
            with open(
                os.path.join(
                    self.log_dir, f"{start:0{_V_WIDTH}d}.checkpoint.json"
                )
            ) as f:
                state = json.load(f)
            files = {a["path"]: a for a in state["files"]}
            schema = state.get("schema")
            txns = dict(state.get("txns", {}))
            schemas = (
                set(state["schemas"])
                if state.get("schemas") is not None
                else None
            )
        else:
            files, schema, txns = {}, None, {}
            schemas: set | None = set()
        for v in range(start + 1, version + 1):
            for action in self._commit_actions(v):
                if "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
                elif "commit" in action:
                    c = action["commit"]
                    if c.get("schema"):
                        schema = c["schema"]
                        if schemas is not None:
                            schemas.add(c["schema"])
                    if c.get("txn"):
                        txns[c["txn"]["app_id"]] = c["txn"]["batch_id"]
        return {
            "version": version,
            "files": files,
            "schema": schema,
            "schemas": sorted(schemas) if schemas is not None else None,
            "txns": txns,
        }

    def _try_commit(
        self, version: int, lines: list[dict]
    ) -> bool:
        """Atomically publish ``version`` — False when a racer owns
        it. os.link is create-if-absent: exactly one winner."""
        tmp = os.path.join(
            self.log_dir, f".tmp-commit-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as f:
            for obj in lines:
                f.write(json.dumps(obj, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, os.path.join(self.log_dir, _vname(version)))
            committed = True
        except FileExistsError:
            committed = False
        finally:
            os.unlink(tmp)
        if committed and version % self.checkpoint_every == 0:
            self._write_checkpoint(version)
        return committed

    def _write_checkpoint(self, version: int) -> None:
        """Materialize replay state at ``version`` so readers start
        from here instead of commit 1. Best-effort create-if-absent
        (a racing checkpointer writes identical content)."""
        state = self.snapshot_state(version)
        payload = {
            "version": version,
            "files": sorted(
                state["files"].values(), key=lambda a: a["path"]
            ),
            "schema": state["schema"],
            "schemas": state["schemas"],
            "txns": state["txns"],
        }
        tmp = os.path.join(self.log_dir, f".tmp-ckpt-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(payload, f, sort_keys=True)
        try:
            os.link(
                tmp,
                os.path.join(
                    self.log_dir,
                    f"{version:0{_V_WIDTH}d}.checkpoint.json",
                ),
            )
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------------
    # data-file staging
    # ------------------------------------------------------------------

    def _file_stats(self, abspath: str) -> tuple[int, dict]:
        """(row count, {col: {"min", "max"}}) from the parquet footer
        — no data pages are read."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(abspath).metadata
        rows = md.num_rows
        stats: dict = {}
        if not self.stats_cols:
            return rows, stats
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        for col in self.stats_cols:
            if col not in idx:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[col]).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None or s.min < lo else lo
                hi = s.max if hi is None or s.max > hi else hi
            if lo is not None:
                stats[col] = {"min": _jsonable(lo), "max": _jsonable(hi)}
        return rows, stats

    def _stage_files(self, df: DataFrame, version_hint: int) -> list[dict]:
        """Write ``df`` as immutable parquet files under ``data/`` and
        return their add-actions. Files are INVISIBLE until a commit
        references them (crash leaves only vacuum-able orphans)."""
        token = uuid.uuid4().hex[:12]
        tmp = os.path.join(
            self.table_dir, f".tmp-stage-{version_hint}-{token}"
        )
        df.write.mode("overwrite").parquet(tmp)
        adds = []
        for i, part in enumerate(
            sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
        ):
            name = f"{version_hint:0{_V_WIDTH}d}-{token}-{i:05d}.parquet"
            dest = os.path.join(self.data_dir, name)
            os.rename(part, dest)
            rows, stats = self._file_stats(dest)
            adds.append(
                {
                    "path": f"data/{name}",
                    "rows": rows,
                    "stats": stats,
                }
            )
        shutil.rmtree(tmp, ignore_errors=True)
        return adds

    # ------------------------------------------------------------------
    # writer operations
    # ------------------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        txn: tuple[str, int] | None = None,
        max_retries: int = 20,
    ) -> int:
        """Commit ``df`` as new files; returns the committed version.

        Blind appends never logically conflict, so a lost race simply
        rebases onto the next version number. ``txn=(app_id,
        batch_id)`` makes the append IDEMPOTENT: a batch id at or
        below the app's last recorded one is a no-op replay (the
        exactly-once foreachBatch sink contract), checked again after
        every lost race so a duplicate cannot slip in between."""
        version = self.latest_version() + 1
        if txn is not None and self._txn_already_applied(txn):
            return self.latest_version()
        adds = self._stage_files(df, version)
        commit: dict = {"version": version, "op": "append",
                        "schema": df.schema.json()}
        if txn is not None:
            commit["txn"] = {"app_id": txn[0], "batch_id": txn[1]}
        for _ in range(max_retries):
            commit["version"] = version
            lines = [{"commit": commit}] + [{"add": a} for a in adds]
            if self._try_commit(version, lines):
                return version
            if txn is not None and self._txn_already_applied(txn):
                # the racer WAS this txn's earlier attempt (task retry)
                for a in adds:
                    _rm_quiet(os.path.join(self.table_dir, a["path"]))
                return self.latest_version()
            version = self.latest_version() + 1
        raise ConcurrentModificationError(
            f"append lost {max_retries} straight version races"
        )

    def _txn_already_applied(self, txn: tuple[str, int]) -> bool:
        state = self.snapshot_state()
        last = state["txns"].get(txn[0])
        return last is not None and last >= txn[1]

    def _read_files(self, relpaths: list[str], state: dict) -> DataFrame:
        """Read live parquet files with the cheapest SAFE schema
        strategy (r12 optimization, guide §1.2): when the log proves
        every live file was written under ONE schema
        (``state["schemas"]`` has exactly one entry), pass that schema
        explicitly — no footer read, no distributed mergeSchema job.
        Otherwise (evolved table, or a pre-r12 checkpoint without the
        field) fall back to ``mergeSchema=true``, preserving the r12
        review fix that rewrites must carry the union schema."""
        full = [os.path.join(self.table_dir, p) for p in relpaths]
        schemas = state.get("schemas")
        if schemas is not None and len(schemas) == 1:
            from pyspark.sql.types import StructType

            return self.spark.read.schema(
                StructType.fromJson(json.loads(schemas[0]))
            ).parquet(*full)
        return self.spark.read.option("mergeSchema", "true").parquet(
            *full
        )

    def delete_where(self, predicate: str) -> int:
        """Copy-on-write delete: ONE distributed pass finds the files
        that actually contain matching rows (``input_file_name``
        grouped — never a driver-side row loop), only those files are
        rewritten without their matching rows, and the swap commits
        atomically as remove+add. Returns the committed version (the
        current one when no file matches). Raises
        ``ConcurrentModificationError`` if a racing commit touched
        this transaction's read set (rebases over blind appends)."""
        from pyspark.sql import functions as F

        state = self.snapshot_state()
        if not state["files"]:
            return state["version"]
        paths = sorted(state["files"])
        src = self._read_files(paths, state)
        hit_names = {
            os.path.basename(r[0])
            for r in src.filter(predicate)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        victims = [p for p in paths if os.path.basename(p) in hit_names]
        if not victims:
            return state["version"]
        keep = self._read_files(victims, state).filter(
            f"NOT ({predicate})"
        )
        return self._commit_rewrite("delete", state, victims, keep)

    def compact(
        self,
        small_rows: int = 10_000,
        cluster_by: tuple[str, ...] = (),
        n_files: int = 1,
    ) -> int:
        """Rewrite every file smaller than ``small_rows`` rows
        (OPTIMIZE shape): values preserved exactly, file count
        reduced. With ``cluster_by`` the rewrite range-partitions on
        those columns into ``n_files`` files — each output file owns
        a disjoint key range, so the footer stats become maximally
        selective and ``where_between`` skipping prunes to ~1 file
        per point interval (the OPTIMIZE ZORDER BY shape; one sort
        dimension needs no Morton curve). No-op when fewer than two
        small files."""
        state = self.snapshot_state()
        victims = sorted(
            a["path"]
            for a in state["files"].values()
            if a["rows"] < small_rows
        )
        if len(victims) < 2:
            return state["version"]
        src = self._read_files(victims, state)
        if cluster_by:
            merged = src.repartitionByRange(
                max(1, n_files), *cluster_by
            ).sortWithinPartitions(*cluster_by)
        else:
            merged = src.coalesce(max(1, n_files))
        return self._commit_rewrite("compact", state, victims, merged)

    def _commit_rewrite(
        self, op: str, state: dict, victims: list[str], out: DataFrame
    ) -> int:
        """Stage ``out``, then commit remove(victims)+add atomically.
        A lost race rebases iff every intervening commit was a blind
        append (the read set is then provably intact); any
        remove-carrying or non-append racer invalidates it."""
        version = state["version"] + 1
        adds = self._stage_files(out, version)
        while True:
            lines = (
                [{"commit": {"version": version, "op": op}}]
                + [{"remove": {"path": p}} for p in victims]
                + [{"add": a} for a in adds]
            )
            if self._try_commit(version, lines):
                return version
            new_latest = self.latest_version()
            for v in range(version, new_latest + 1):
                for action in self._commit_actions(v):
                    if "remove" in action or (
                        "commit" in action
                        and action["commit"].get("op") != "append"
                    ):
                        for a in adds:
                            _rm_quiet(
                                os.path.join(self.table_dir, a["path"])
                            )
                        raise ConcurrentModificationError(
                            f"{op} read set invalidated by version {v}"
                        )
            version = new_latest + 1

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` as a NEW commit (the
        Delta RESTORE shape — history is preserved, the rollback is
        itself versioned): removes files absent from the target
        snapshot, re-adds the target's files verbatim. Raises
        ``ValueError`` when a target file was already vacuumed (the
        retention horizon bounds restorability, documented on
        vacuum) and ``ConcurrentModificationError`` on any race —
        a restore's read set is the whole table."""
        target = self.snapshot_state(version)
        state = self.snapshot_state()
        for path in target["files"]:
            if not os.path.exists(os.path.join(self.table_dir, path)):
                raise ValueError(
                    f"cannot restore to v{version}: {path} was vacuumed"
                )
        removes = sorted(
            p for p in state["files"] if p not in target["files"]
        )
        adds = [
            target["files"][p]
            for p in sorted(target["files"])
            if p not in state["files"]
        ]
        if not removes and not adds:
            return state["version"]
        new_v = state["version"] + 1
        lines = (
            [
                {
                    "commit": {
                        "version": new_v,
                        "op": "restore",
                        "schema": target["schema"],
                    }
                }
            ]
            + [{"remove": {"path": p}} for p in removes]
            + [{"add": a} for a in adds]
        )
        if not self._try_commit(new_v, lines):
            raise ConcurrentModificationError(
                "restore lost the version race"
            )
        return new_v

    def vacuum(
        self, retain_versions: int = 1, grace_seconds: float = 0.0
    ) -> list[str]:
        """Delete data files unreferenced by every retained snapshot
        (the newest ``retain_versions`` versions) plus crashed stage
        dirs. Time travel older than the retention horizon may lose
        files (the documented lakehouse contract). Returns deleted
        paths.

        Concurrent-writer safety (review r12): a writer renames its
        staged files into ``data/`` BEFORE committing, so a naive
        unreferenced-file sweep would destroy an in-flight write and
        the commit would still publish (the link validates nothing).
        Two guards: (a) files whose embedded version hint is AHEAD of
        the latest committed version are always kept — every
        first-attempt stage targets latest+1, so the common race
        window is deterministically protected; (b) ``grace_seconds``
        skips files/stage dirs younger than the horizon by mtime —
        the Delta retention device covering the lost-race retry
        window, where a writer re-attempts with files staged under an
        older hint. Production sets it above the longest write job;
        the default 0 keeps single-writer vacuums (and the gate)
        fully deterministic."""
        import time as _time

        if retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        latest = self.latest_version()
        referenced: set[str] = set()
        for v in range(
            max(1, latest - retain_versions + 1), latest + 1
        ):
            referenced |= set(self.snapshot_state(v)["files"])
        now = _time.time()

        def _young(path: str) -> bool:
            if grace_seconds <= 0:
                return False
            try:
                return now - os.path.getmtime(path) < grace_seconds
            except OSError:
                return True  # raced away mid-sweep: leave it alone
        deleted = []
        for f in sorted(os.listdir(self.data_dir)):
            rel = f"data/{f}"
            if rel in referenced:
                continue
            hint = f.split("-", 1)[0]
            if hint.isdigit() and int(hint) > latest:
                continue  # in-flight stage targeting the next version
            full = os.path.join(self.data_dir, f)
            if _young(full):
                continue
            _rm_quiet(full)
            deleted.append(rel)
        for d in glob.glob(os.path.join(self.table_dir, ".tmp-stage-*")):
            if _young(d):
                continue
            shutil.rmtree(d, ignore_errors=True)
            deleted.append(os.path.basename(d))
        return deleted

    # ------------------------------------------------------------------
    # readers
    # ------------------------------------------------------------------

    def read_snapshot(
        self,
        version: int | None = None,
        where_between: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """The table AS OF ``version`` (default: latest).

        ``where_between={col: (lo, hi)}`` is the data-skipping path:
        files whose footer [min, max] cannot intersect the interval
        never reach the Spark scan, and the interval is ALSO applied
        as a real filter so results are exact regardless of stats
        quality (a file without stats for the column is conservatively
        read). ``files_scanned`` of the plan == the pruned count —
        tested."""
        state = self.snapshot_state(version)
        files = sorted(state["files"].values(), key=lambda a: a["path"])
        if where_between:
            files = [
                a for a in files
                if all(
                    _may_contain(a, col, lo, hi)
                    for col, (lo, hi) in where_between.items()
                )
            ]
        if not files:
            if state["schema"] is None:
                raise ValueError("empty table with no recorded schema")
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(state["schema"]))
            return self.spark.createDataFrame([], schema)
        df = self._read_files([a["path"] for a in files], state)
        if where_between:
            for col, (lo, hi) in where_between.items():
                df = df.filter(df[col].between(lo, hi))
        return df

    def pruned_file_count(
        self, where_between: dict[str, tuple],
        version: int | None = None,
    ) -> tuple[int, int]:
        """(files after pruning, total live files) — the skipping
        effectiveness metric the tests pin."""
        state = self.snapshot_state(version)
        files = list(state["files"].values())
        kept = [
            a for a in files
            if all(
                _may_contain(a, col, lo, hi)
                for col, (lo, hi) in where_between.items()
            )
        ]
        return len(kept), len(files)

    def history(self) -> list[dict]:
        """[{version, op, n_add, n_remove, txn}] oldest → newest."""
        out = []
        for v in range(1, self.latest_version() + 1):
            actions = self._commit_actions(v)
            meta = next(
                (a["commit"] for a in actions if "commit" in a), {}
            )
            out.append(
                {
                    "version": v,
                    "op": meta.get("op"),
                    "n_add": sum(1 for a in actions if "add" in a),
                    "n_remove": sum(
                        1 for a in actions if "remove" in a
                    ),
                    "txn": meta.get("txn"),
                }
            )
        return out


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _jsonable(v):
    import datetime
    import decimal

    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def _may_contain(add: dict, col: str, lo, hi) -> bool:
    s = (add.get("stats") or {}).get(col)
    if not s:
        return True  # no stats: conservatively read the file
    try:
        return not (s["max"] < lo or s["min"] > hi)
    except TypeError:
        return True  # cross-type stats (evolved schema): read it


def _rm_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass
