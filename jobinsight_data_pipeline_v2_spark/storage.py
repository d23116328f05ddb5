"""Layered parquet storage for the warehouse (SURVEY §7.1 storage rule).

The catalog over parquet IS the database — the reference's
download/upload of a single DuckDB file (minio.py:146-221, SURVEY S11)
disappears. Layout:

    {root}/raw/ingest_date=YYYY-MM-DD/
    {root}/staging/ingest_date=YYYY-MM-DD/
    {root}/warehouse/dim_job/            (full snapshot per write)
    {root}/warehouse/dim_company/
    {root}/warehouse/dim_location/
    {root}/warehouse/dim_date/
    {root}/warehouse/fact_job_posting_daily/load_month=YYYY-MM/
    {root}/warehouse/fact_job_location_bridge/

Two design rules that matter at 100 TB:

1. **Materialize between daily builds.** A day's build references the
   previous snapshot many times (SCD2 splits it into current/history;
   the fact build reads it for carry-forward, max-id, and orphan
   cleanup). Chaining days as one lazy lineage duplicates the whole
   prior plan at every reference — plan size grows exponentially with
   days and OOMs the driver long before data size matters. Each daily
   build therefore READS the prior snapshot from parquet and WRITES the
   new one; lineage length is O(1) per day. (The reference gets the
   same property from its database file.)

2. **Touch one fact partition per day.** Daily facts all land in
   load_month = month(as_of); with dynamic partition overwrite the
   build rewrites exactly that partition and never the history months.
   Dimensions are dimension-sized and rewritten as whole snapshots.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import (
    DIM_COMPANY,
    DIM_JOB,
    FACT_JOB_LOCATION_BRIDGE,
    FACT_JOB_POSTING_DAILY,
)
from .warehouse import WarehouseDay, empty_dim_location


class WarehouseStorage:
    """Parquet-backed warehouse state.

    ``bucketed=True`` additionally maintains catalog twins of the fact
    and bridge tables bucketed (and bucket-sorted) by ``fact_id`` —
    the engine's only big×big join key. The plain parquet snapshot
    stays the committed source of truth (the two-phase swap protocol
    is unchanged); the bucketed twins are refreshed from it after each
    commit, paying the fact_id shuffle once at write time so every
    subsequent fact⋈bridge join reads co-located buckets with zero
    Exchange (asserted in tests/test_storage.py). ``load()`` then
    serves fact/bridge from the catalog twins.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        bucketed: bool = False,
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.bucketed = bucketed
        self.n_buckets = n_buckets
        # the MOST RECENT compact=True sweep's report:
        # {date: {files_before, files_after, bytes}}. {} until a sweep
        # has run, and {} again when a sweep found nothing fragmented
        # (or no staging layer); non-compacting runs leave it untouched
        # — consumers wanting per-run attribution should read it right
        # after the run that requested compaction.
        self.last_compaction_report: dict[str, dict] = {}
        # catalog names are session-global — scope them to this root
        import hashlib

        tok = hashlib.md5(self.root.encode()).hexdigest()[:8]
        self._fact_tbl = f"wh_{tok}_fact_bkt"
        self._bridge_tbl = f"wh_{tok}_bridge_bkt"
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # --- paths ---
    def _p(self, table: str) -> str:
        return f"{self.root}/warehouse/{table}"

    def _fs_path(self, path: str):
        """(Hadoop FileSystem, Path) for any scheme Spark can read —
        local, s3a://, gs://, abfss:// all resolve through the same API,
        so existence checks and the commit swap work uniformly."""
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        hconf = self.spark._jsc.hadoopConfiguration()
        return jpath.getFileSystem(hconf), jpath

    def _exists(self, table: str) -> bool:
        fs, p = self._fs_path(self._p(table))
        return fs.exists(p)

    # --- read ---
    def load(self) -> WarehouseDay | None:
        """Load the current snapshot; None if never written."""
        if not self._exists("dim_job"):
            return None
        sp = self.spark
        if self.bucketed and sp.catalog.tableExists(self._fact_tbl):
            fact = sp.table(self._fact_tbl)
            bridge = sp.table(self._bridge_tbl)
        else:
            fact = sp.read.schema(FACT_JOB_POSTING_DAILY).parquet(
                self._p("fact_job_posting_daily")
            )
            bridge = sp.read.schema(FACT_JOB_LOCATION_BRIDGE).parquet(
                self._p("fact_job_location_bridge")
            )
        return WarehouseDay(
            dim_job=sp.read.schema(DIM_JOB).parquet(self._p("dim_job")),
            dim_company=sp.read.schema(DIM_COMPANY).parquet(self._p("dim_company")),
            dim_location=sp.read.parquet(self._p("dim_location")),
            dim_date=sp.read.parquet(self._p("dim_date")),
            fact=fact,
            bridge=bridge,
        )

    # --- write ---
    def write_day(self, w: WarehouseDay, as_of: date) -> None:
        """Persist one day's build.

        Dimensions + bridge: full snapshot rewrite (dimension-sized).
        Fact: only the load_month(as_of) partition is overwritten —
        history months stay untouched on disk (X4/X7).
        """
        month = as_of.strftime("%Y-%m")
        # Two-phase commit: every new table's plan READS the previous
        # snapshot files (SCD2 splits, carry-forward, orphan cleanup,
        # and cross-table joins like fact→dim). Phase 1 writes ALL new
        # states to __tmp dirs while every old file still exists; only
        # then does phase 2 swap them in. Swapping one table before
        # writing the next would yank files out from under a captured
        # scan and fail with FILE_NOT_EXIST. (Table formats with
        # snapshot isolation — Iceberg/Delta — solve this natively; on
        # plain parquet the tmp+swap is the equivalent commit protocol.)
        swaps: list[tuple[str, str]] = []
        for name, df in (
            ("dim_job", w.dim_job),
            ("dim_company", w.dim_company),
            ("dim_location", w.dim_location),
            ("dim_date", w.dim_date),
            ("fact_job_location_bridge", w.bridge),
        ):
            tmp = self._p(name) + "__tmp"
            df.write.mode("overwrite").parquet(tmp)
            swaps.append((tmp, self._p(name)))
        # Fact: only the load_month(as_of) partition is rewritten;
        # history months stay untouched on disk (X4/X7).
        fact_path = self._p("fact_job_posting_daily")
        if self._exists("fact_job_posting_daily"):
            tmp = f"{fact_path}__tmp_{month}"
            (
                w.fact.filter(F.col("load_month") == month)
                .drop("load_month")  # encoded in the partition dir name
                .write.mode("overwrite")
                .parquet(tmp)
            )
            swaps.append((tmp, f"{fact_path}/load_month={month}"))
        else:
            tmp = fact_path + "__tmp"
            w.fact.write.mode("overwrite").partitionBy("load_month").parquet(tmp)
            swaps.append((tmp, fact_path))
        for tmp, final in swaps:
            self._swap(tmp, final)
        if self.bucketed:
            self._refresh_bucketed()

    def _refresh_bucketed(self) -> None:
        """Rebuild the bucketed fact/bridge catalog twins from the
        just-committed parquet snapshot. Runs after the swap phase, so
        no in-flight plan still references the twins' old files."""
        from .operators.bucketing import write_bucketed

        sp = self.spark
        fact = sp.read.schema(FACT_JOB_POSTING_DAILY).parquet(
            self._p("fact_job_posting_daily")
        )
        bridge = sp.read.schema(FACT_JOB_LOCATION_BRIDGE).parquet(
            self._p("fact_job_location_bridge")
        )
        for name, df, tbl in (
            ("fact_bucketed", fact, self._fact_tbl),
            ("bridge_bucketed", bridge, self._bridge_tbl),
        ):
            write_bucketed(
                df, tbl, "fact_id", self.n_buckets, path=self._p(name)
            )

    def _swap(self, tmp: str, final: str) -> None:
        """Commit one table: delete the old state, rename tmp into place.

        Hadoop FileSystem rename/delete — correct on local paths AND
        object-store roots (where a rename is a copy, slower but still
        a valid commit; snapshot-isolated table formats would replace
        this protocol entirely).
        """
        fs, final_p = self._fs_path(final)
        _, tmp_p = self._fs_path(tmp)
        if fs.exists(final_p):
            fs.delete(final_p, True)
        parent = final_p.getParent()
        if parent is not None and not fs.exists(parent):
            fs.mkdirs(parent)
        if not fs.rename(tmp_p, final_p):
            raise IOError(f"swap failed: rename {tmp} -> {final}")

    # --- staging layer ---
    def write_staging(self, staging: DataFrame, as_of: date) -> None:
        (
            staging.withColumn("ingest_date", F.lit(as_of.isoformat()))
            .write.mode("overwrite")
            .partitionBy("ingest_date")
            .parquet(f"{self.root}/staging")
        )

    def read_staging(self, as_of: date) -> DataFrame:
        """Day-filtered staging read — partition pruning does the work
        (the reference's `WHERE DATE(crawled_at)=?`, SURVEY S4/X3)."""
        return self.spark.read.parquet(f"{self.root}/staging").filter(
            F.col("ingest_date") == as_of.isoformat()
        )


def run_daily_build(
    spark: SparkSession,
    storage: WarehouseStorage,
    raw: DataFrame,
    as_of: date,
    crawled_at,
    compact: bool = False,
    compact_target_file_bytes: int = 128 * 1024 * 1024,
    compact_min_files: int = 8,
) -> WarehouseDay:
    """End-to-end daily pipeline: staging transform → warehouse build →
    persist → reload (so the caller gets parquet-backed frames with O(1)
    lineage, safe to chain into the next day).

    ``compact=True`` additionally runs small-file compaction over the
    ``staging`` layer after the commit — the engine twin of the
    reference's nightly maintenance DAG cadence (maintenance_dag.py
    runs its cleanups right after the pipeline). Opt-in because it is
    pure I/O hygiene: a fragmentation threshold (at least
    ``compact_min_files`` files averaging under half
    ``compact_target_file_bytes``) keeps healthy days untouched, so
    scheduling it daily costs O(today's sick partitions), not
    O(warehouse). NOTE: this entry point does not itself persist
    staging — the layer exists only when the caller maintains it via
    ``storage.write_staging`` (the full-cycle ``pipelines.run_day``
    does); with no staging layer the sweep is a documented no-op. The
    per-partition report lands on
    ``storage.last_compaction_report`` either way, so a caller can
    observe exactly what was (or wasn't) rewritten."""
    from .warehouse import build_warehouse_day, staging_transform

    staging = staging_transform(raw, crawled_at)
    prev = storage.load()
    w = build_warehouse_day(spark, staging, prev, as_of, crawled_at)
    storage.write_day(w, as_of)
    if compact:
        from .maintenance import compact_partitions

        storage.last_compaction_report = compact_partitions(
            spark,
            storage.root,
            "staging",
            target_file_bytes=compact_target_file_bytes,
            min_files_to_compact=compact_min_files,
        )
    loaded = storage.load()
    assert loaded is not None
    return loaded
