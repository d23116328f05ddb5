"""Generic SCD Type 2 merge on immutable storage (SURVEY W1, §7.2 phase 2).

The reference maintains SCD2 row-at-a-time: per business key, SELECT
current → compare → UPDATE expiry + INSERT inside a transaction
(dimensions/job.py:41-90, company.py). On Spark the whole merge is one
set-based pass over (prev dimension snapshot ⋈ incoming batch):

  unchanged-current  = current rows whose key is absent or equal in batch
  expired            = current rows whose key changed   (expiry=as_of)
  inserts            = new keys + changed keys          (effective=as_of)
  history            = prior non-current rows, untouched

and the new snapshot is their union. Surrogate keys for inserts come
from :func:`assign_batch_sks` — a bucket-strided scheme that replaces
the reference's NEXTVAL sequences (SURVEY X6) without ever funneling
the batch through one task (the W4 rule the fact/bridge builds already
follow).

Invariant (asserted in tests): exactly one is_current row per key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


#: parallelism of insert-batch id assignment; also the stride of the
#: id sequence (gaps per batch are bounded by this x bucket imbalance).
ID_BUCKETS = 64


def assign_batch_sks(
    batch: DataFrame,
    bk_cols: list[str],
    max_sk: DataFrame,
    sk: str,
    *,
    buckets: int = ID_BUCKETS,
) -> DataFrame:
    """Deterministic, fully parallel surrogate ids for an insert batch.

    ``sk = max_existing + (rn_b - 1) * B + b + 1`` where
    ``b = pmod(xxhash64(*bk), B)`` and ``rn_b`` is the row_number
    within bucket ``b`` ordered by the business key. Unique (bucket x
    stride never collides), deterministic across retries (hash bucket
    + total order within bucket), and monotone above every existing
    id. Ids are *strided*, not contiguous — a batch of n rows may
    advance the sequence by up to ``n + B x imbalance`` — which is
    fine: nothing in the engine depends on the ordinal property, only
    on uniqueness and stability.

    Scale: the old form (``row_number() over (order by bk)``) was a
    SinglePartition window — a 100x backfill day with millions of new
    business keys funnels through one task. This window partitions by
    the hash bucket, so id assignment spreads across ``B`` tasks and
    the dimension-build plans contain no ``Exchange SinglePartition``
    (plan-asserted in tests/test_plans.py).
    """
    w = Window.partitionBy("__b").orderBy(*bk_cols)
    return (
        batch.withColumn(
            "__b", F.pmod(F.xxhash64(*bk_cols), F.lit(buckets)).cast("long")
        )
        .withColumn("__rn", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(max_sk))
        .withColumn(
            sk,
            (
                F.col("m")
                + (F.col("__rn") - 1) * buckets
                + F.col("__b")
                + 1
            ).cast("long"),
        )
        .drop("__b", "__rn", "m")
    )


def _null_eq_str(a: Column, b: Column) -> Column:
    """Reference change test: str(old or '') != str(new or '') —
    i.e. NULL ≡ '' (job.py:67-71). Arrays are compared via to_json."""
    return F.coalesce(a.cast("string"), F.lit("")) == F.coalesce(
        b.cast("string"), F.lit("")
    )


def scd2_merge(
    dim_prev: DataFrame,
    incoming: DataFrame,
    *,
    bk: str,
    sk: str,
    compare_cols: list[str],
    attr_cols: list[str],
    as_of,
) -> DataFrame:
    """Merge an incoming batch into an SCD2 dimension snapshot.

    dim_prev: full dimension snapshot (history + current rows) with
        columns [sk, bk, *attr_cols, effective_date, expiry_date,
        is_current].
    incoming: one row per business key with [bk, *attr_cols].
    compare_cols: subset of attr_cols that trigger a new version.
    """
    as_of_col = F.lit(as_of).cast("date")
    current = dim_prev.filter(F.col("is_current"))
    history = dim_prev.filter(~F.col("is_current"))

    inc = incoming.alias("inc")
    cur = current.alias("cur")
    joined = inc.join(cur, F.col(f"inc.{bk}") == F.col(f"cur.{bk}"), "left")

    changed_pred = reduce(
        lambda a, b: a | b,
        [
            ~_null_eq_str(F.col(f"cur.{c}"), F.col(f"inc.{c}"))
            for c in compare_cols
        ],
    )
    is_new = F.col(f"cur.{bk}").isNull()

    # rows needing a fresh version (brand new or changed)
    to_insert = joined.filter(is_new | changed_pred).select(
        F.col(f"inc.{bk}").alias(bk),
        *[F.col(f"inc.{c}").alias(c) for c in attr_cols],
    )
    # current rows to expire (their key changed)
    expired = (
        joined.filter(~is_new & changed_pred)
        .select("cur.*")
        .withColumn("expiry_date", as_of_col)
        .withColumn("is_current", F.lit(False))
    )
    # current rows untouched by this batch (absent key or equal attrs)
    expired_keys = expired.select(bk)
    untouched = current.join(expired_keys, bk, "left_anti")

    max_sk = current.unionByName(history).agg(
        F.coalesce(F.max(sk), F.lit(0)).alias("m")
    )
    inserts = (
        assign_batch_sks(to_insert, [bk], max_sk, sk)
        .withColumn("effective_date", as_of_col)
        .withColumn("expiry_date", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    cols = dim_prev.columns
    return (
        history.select(cols)
        .unionByName(untouched.select(cols))
        .unionByName(expired.select(cols))
        .unionByName(inserts.select(cols))
    )


def scd2_rebuild(
    changes: DataFrame,
    *,
    key: str = "user_id",
    attr: str = "attr_value",
    ts: str = "effective_ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rebuild a full SCD2 chain from change events: every event opens
    a version, expiry = the next event's timestamp (lead window), the
    last version per key is current. One shuffle on the business key —
    the set-based form shared by the scd2_user_history gate.

    ``order_cols`` extends the within-key order past ``ts`` (e.g. an
    event id) so equal-timestamp events chain deterministically."""
    w = Window.partitionBy(key).orderBy(ts, *order_cols)
    return changes.select(
        key,
        attr,
        F.col(ts).alias("effective_ts"),
        F.lead(ts).over(w).alias("expiry_ts"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def scd2_repair(
    history: DataFrame,
    late_rows: DataFrame,
    *,
    key: str = "user_id",
    attr: str = "attr_value",
    ts: str = "effective_ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Merge late-arriving change events into an SCD2 history — the
    batch-repair path the streaming twin points at: ``scd2_stream``
    flags an at-or-behind arrival ``late=true`` and leaves the chain
    untouched (a retroactive mid-history insert is not a streaming
    concern); this operator performs that insert set-based.

    ``history``: the maintained chain (one row per version, with
    ``effective_ts`` — expiry/current columns are recomputed, so
    passing the stream's closed rows plus the current state rows, or
    a warehouse SCD2 snapshot, both work). ``late_rows``: the flagged
    events as (key, attr, ts). Every version collapses back to its
    opening event, the two event sets union, and the chain rebuilds —
    expiries around each insertion point re-stamp automatically.
    Scale shape: one union + the rebuild window's single shuffle on
    the business key; only keys present in ``late_rows`` change, so
    at fleet scale the history side is pre-filtered to affected keys
    with a broadcast semi-join and the repaired slice is upserted
    back (the compact_partitions touch-only-the-sick discipline)."""
    ev_hist = history.select(
        F.col(key), F.col(attr), F.col(ts), *[F.col(c) for c in order_cols]
    )
    ev_late = late_rows.select(
        F.col(key), F.col(attr), F.col(ts), *[F.col(c) for c in order_cols]
    )
    return scd2_rebuild(
        ev_hist.unionByName(ev_late),
        key=key,
        attr=attr,
        ts=ts,
        order_cols=order_cols,
    )
