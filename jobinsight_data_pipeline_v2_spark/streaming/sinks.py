"""Streaming sinks: foreachBatch MERGE into a keyed parquet table.

The reference's upsert sink is row-at-a-time `INSERT … ON CONFLICT DO
UPDATE` driven by a cron batch (src/storage/postgres.py:34-113); the
batch twin here is operators/merge.upsert. This module is the
*streaming* form: a foreachBatch sink that maintains a keyed
"current state" table incrementally — per key, the row with the
greatest (order_cols…) tuple survives, i.e. newest-wins MERGE, the
same semantics as the warehouse carry-forward (SURVEY W3) feeding the
upsert sink (S6).

Design notes for scale and exactly-once:

- **Batch-order independence.** Micro-batches are not time-ordered
  (a file/kafka source partitions by arrival, not event time), so
  "last batch wins" would make the final table depend on scheduling.
  Reducing existing ∪ batch with a total-order struct-max per key
  makes the final state the *global* maximum — identical to the batch
  twin over the same rows, whatever the batch boundaries were.
- **Replay idempotency.** foreachBatch re-runs a micro-batch after a
  failure. union + reduce is a set-level idempotent operation:
  re-merging rows already absorbed changes nothing, so the sink is
  exactly-once at the table level without a transaction log.
- **Commit protocol.** Same two-phase tmp write + FileSystem-rename
  swap as WarehouseStorage.write_day: the merged plan reads the old
  files, so the old state must survive until the tmp write finishes.
- **At 100 TB.** A full-table rewrite per micro-batch is the local
  parquet simplification. The shape that scales: hash-partition the
  table by key (``.partitionBy(pmod(hash(key), N))``), join the batch
  only against partitions containing its keys, and rewrite just those
  — or swap the sink for a merge-on-read table format (Iceberg/Delta)
  where this whole protocol is a native MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """One row per key: the greatest (order_cols…, remaining cols)
    tuple. The full-column struct gives a *total* order, so the
    survivor is deterministic even when order_cols tie (synthetic data
    has exact-duplicate rows). Hash aggregate with map-side combine —
    no per-partition sort, no global window (the dedup_first rewrite).
    """
    rest = [c for c in df.columns if c != key and c not in order_cols]
    m = df.groupBy(key).agg(
        F.max(F.struct(*order_cols, *rest)).alias("__m")
    )
    return m.select(
        key, *[F.col(f"__m.{c}").alias(c) for c in order_cols + rest]
    ).select(df.columns)


class KeyedLatestSink:
    """foreachBatch sink maintaining a newest-wins keyed parquet table.

    Usage::

        sink = KeyedLatestSink(path, key="user_id", order_cols=["ts"])
        stream.writeStream.foreachBatch(sink).trigger(...).start()

    After the stream drains, ``sink.read(spark)`` equals
    ``latest_per_key(all_rows_ever_streamed)`` — the batch twin — for
    any micro-batch partitioning of the input (tested).
    """

    def __init__(self, path: str, key: str, order_cols: list[str]):
        self.path = path
        self.key = key
        self.order_cols = list(order_cols)

    # -- commit helpers (same protocol as WarehouseStorage._swap) --
    @staticmethod
    def _fs_path(spark: SparkSession, path: str):
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        hconf = spark._jsc.hadoopConfiguration()
        return jpath.getFileSystem(hconf), jpath

    def _exists(self, spark: SparkSession) -> bool:
        fs, p = self._fs_path(spark, self.path)
        return fs.exists(p)

    def _swap(self, spark: SparkSession, tmp: str) -> None:
        fs, final_p = self._fs_path(spark, self.path)
        _, tmp_p = self._fs_path(spark, tmp)
        if fs.exists(final_p):
            fs.delete(final_p, True)
        parent = final_p.getParent()
        if parent is not None and not fs.exists(parent):
            fs.mkdirs(parent)
        if not fs.rename(tmp_p, final_p):
            raise IOError(f"swap failed: rename {tmp} -> {self.path}")

    def read(self, spark: SparkSession) -> DataFrame | None:
        if not self._exists(spark):
            return None
        return spark.read.parquet(self.path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        reduced = latest_per_key(batch_df, self.key, self.order_cols)
        existing = self.read(spark)
        if existing is not None:
            reduced = latest_per_key(
                existing.select(batch_df.columns).unionByName(reduced),
                self.key,
                self.order_cols,
            )
        tmp = self.path + "__tmp"
        # phase 1: full materialization while the old files still exist
        # (the merged plan reads them); phase 2: metadata swap.
        reduced.write.mode("overwrite").parquet(tmp)
        self._swap(spark, tmp)


class TxLogAppendSink:
    """foreachBatch EXACTLY-ONCE append sink over a transaction-log
    table (txlog.LogTable) — the merge-on-read upgrade the
    KeyedLatestSink docstring promises: no full-table rewrite per
    micro-batch, just an O(batch) append whose commit carries
    ``txn=(app_id, batch_id)``. foreachBatch replays a micro-batch
    after a failure with the SAME batch_id; the log's idempotent-txn
    rule turns the replay into a no-op, so every batch lands exactly
    once however many times it runs.

    ``app_id`` identifies the (stream, checkpoint-location) pair —
    the Delta txn contract: restarting the stream from a FRESH
    checkpoint restarts batch ids at 0, so a fresh checkpoint needs a
    fresh app_id (or the old batches replay as no-ops, silently).

    Usage::

        table = LogTable(spark, path, stats_cols=("k",))
        stream.writeStream.foreachBatch(
            TxLogAppendSink(table, app_id="events-v1")
        ).option("checkpointLocation", ckpt).start()
    """

    def __init__(self, table, app_id: str):
        self.table = table
        self.app_id = app_id

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.table.append(batch_df, txn=(self.app_id, int(batch_id)))
