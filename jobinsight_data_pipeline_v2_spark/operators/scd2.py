"""Generic SCD Type 2 merge on immutable storage (SURVEY W1, §7.2 phase 2).

The reference maintains SCD2 row-at-a-time: per business key, SELECT
current → compare → UPDATE expiry + INSERT inside a transaction
(dimensions/job.py:41-90, company.py). On Spark the whole merge is one
set-based pass over (prev dimension snapshot ⋈ incoming batch):

  unchanged-current  = current rows whose key is absent or equal in batch
  expired            = current rows whose key changed   (expiry=as_of)
  inserts            = new keys + changed keys          (effective=as_of)
  history            = prior non-current rows, untouched

and the new snapshot is their union. Surrogate keys for inserts are
``row_number() over (order by bk) + max(existing sk)`` — the window is
a single narrow pass over only the *insert* rows (dimension-batch
sized, not corpus sized), which is the standard replacement for the
reference's NEXTVAL sequences (SURVEY X6). Escape hatch if a
dimension's daily insert batch ever outgrows one task: switch the sk
to a deterministic key ``xxhash64(bk, effective_date)`` the way the
fact/bridge ids already work (warehouse.build_fact_day) — the ordinal
property is not semantic anywhere in the engine.

Invariant (asserted in tests): exactly one is_current row per key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    w = Window.orderBy(bk)
    inserts = (
        to_insert.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(max_sk))
        .withColumn(sk, (F.col("m") + F.col("__rn")).cast("long"))
        .withColumn("effective_date", as_of_col)
        .withColumn("expiry_date", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
        .drop("__rn", "m")
    )
    cols = dim_prev.columns
    return (
        history.select(cols)
        .unionByName(untouched.select(cols))
        .unionByName(expired.select(cols))
        .unionByName(inserts.select(cols))
    )
