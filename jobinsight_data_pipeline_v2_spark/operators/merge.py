"""Set-based merge/upsert operators (SURVEY S6/S7/J7).

The reference upserts row-at-a-time over a network round-trip per row
(`INSERT … ON CONFLICT DO UPDATE WHERE IS DISTINCT FROM` + RETURNING
xmax classification, src/storage/postgres.py:34-113). On immutable
columnar storage the same semantics are one full-outer join + null-safe
change predicate + snapshot rewrite — N round-trips become one shuffle
on the key (or zero with broadcast when the batch is small).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    update_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """MERGE with per-key counts → (merged, counts_df).

    Matches postgres.bulk_upsert semantics: new keys inserted; existing
    keys updated only when any update_col IS DISTINCT FROM the incoming
    value (only those columns change; other columns keep old values);
    unchanged rows untouched. counts_df has one row:
    (inserted, updated, unchanged).
    """
    ex = existing.alias("ex")
    inc = incoming.alias("inc")
    joined = inc.join(ex, F.col(f"inc.{key}") == F.col(f"ex.{key}"), "left")
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"ex.{c}").eqNullSafe(F.col(f"inc.{c}")) for c in update_cols],
    )
    is_new = F.col(f"ex.{key}").isNull()

    inserted = joined.filter(is_new).select("inc.*")
    updated = joined.filter(~is_new & changed).select(
        F.col(f"inc.{key}").alias(key),
        *[F.col(f"inc.{c}").alias(c) for c in update_cols],
        *[
            F.col(f"ex.{c}").alias(c)
            for c in existing.columns
            if c != key and c not in update_cols
        ],
    ).select(existing.columns)
    touched_keys = joined.filter(is_new | changed).select(
        F.col(f"inc.{key}").alias(key)
    )
    untouched = existing.join(touched_keys, key, "left_anti")

    merged = untouched.unionByName(updated).unionByName(
        inserted.select(existing.columns)
    )
    counts = joined.agg(
        F.sum(is_new.cast("int")).alias("inserted"),
        F.sum((~is_new & changed).cast("int")).alias("updated"),
        F.sum((~is_new & ~changed).cast("int")).alias("unchanged"),
    )
    return merged, counts


def insert_if_absent(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """S7 — `ON CONFLICT DO NOTHING`: append only unseen keys
    (staging/pipeline.py:44-63 → one left_anti join)."""
    fresh = incoming.join(existing.select(key), key, "left_anti")
    return existing.unionByName(fresh.select(existing.columns))


def archive_split(df: DataFrame, cutoff_ts) -> tuple[DataFrame, DataFrame]:
    """S5/S8 — age-based archive split: (kept, archived).

    Reference: archive.py:32-38 selects `crawled_at < NOW() - n days`;
    the archived side is written partitioned year/month (S8). Pure
    filters — pushed to the parquet scan.
    """
    cutoff = F.lit(cutoff_ts).cast("timestamp")
    archived = df.filter(F.col("crawled_at") < cutoff).withColumns(
        {
            "year": F.year("crawled_at"),
            "month": F.month("crawled_at"),
        }
    )
    kept = df.filter((F.col("crawled_at") >= cutoff) | F.col("crawled_at").isNull())
    return kept, archived


def merge_rollup_delta(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental view maintenance for an additive rollup: apply a
    SIGNED delta aggregate (inserts +1 / deletes −1 / updates as
    −old +new, pre-aggregated per group) to the materialized state
    without touching base data. FULL OUTER on the group keys — a
    delta may create a new group or empty an existing one; groups
    whose maintained count reaches zero are dropped (an emptied group
    must disappear exactly like a recompute). Cost is
    O(|state| + |delta groups|), never O(base).

    Additivity is the contract: every maintained column must be a
    SUM/COUNT (signed-delta-mergeable); MIN/MAX are not maintainable
    this way and must recompute."""
    d = delta
    for c in [count_col] + sum_cols:
        d = d.withColumnRenamed(c, f"__d_{c}")
    merged = state.join(d, keys, "full_outer")
    out_cols = [
        (
            F.coalesce(F.col(c), F.lit(0))
            + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
        )
        .cast("long")
        .alias(c)
        for c in [count_col] + sum_cols
    ]
    return (
        merged.select(*keys, *out_cols)
        .filter(F.col(count_col) > 0)
    )


def merge_distinct_support(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    mult_col: str = "m",
    delta_col: str = "dm",
) -> DataFrame:
    """Incremental view maintenance for COUNT(DISTINCT): the state is
    a SUPPORT multiset — one row per (group keys ∪ distinct-value)
    with its multiplicity — and the delta carries signed multiplicity
    changes per key (inserts +1 / deletes −1 / updates as −old +new,
    pre-aggregated). FULL OUTER on the keys; rows whose maintained
    multiplicity reaches zero are dropped (the value left the group —
    exactly when a recompute's DISTINCT would lose it), and the
    group's distinct count is simply the surviving row count. A
    maintained multiplicity below zero means the delta deleted a row
    the state never had — a CDC defect — and fails loudly via an
    in-plan assert. Cost O(|support| + |delta keys|), never O(base).
    """
    merged = state.join(
        delta.withColumnRenamed(delta_col, "__dm"), keys, "full_outer"
    ).select(
        *keys,
        (
            F.coalesce(F.col(mult_col), F.lit(0))
            + F.coalesce(F.col("__dm"), F.lit(0))
        )
        .cast("long")
        .alias(mult_col),
    )
    guard = F.coalesce(
        F.assert_true(
            F.col(mult_col) >= 0,
            F.lit(
                "merge_distinct_support: multiplicity went negative — "
                "the delta deletes a row the support never held (CDC "
                "defect); refuse rather than undercount"
            ),
        ).cast("long"),
        F.lit(0),
    )
    return merged.select(
        *keys, (F.col(mult_col) + guard).alias(mult_col)
    ).filter(F.col(mult_col) > 0)


def merge_minmax_delta(
    state: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    effective: DataFrame,
    keys: list[str],
    val_col: str = "v",
) -> DataFrame:
    """Incremental view maintenance for a (count, MIN, MAX) rollup —
    the NON-additive half ``merge_rollup_delta`` declares out of
    scope. Inserts maintain bounds for free (new_min = least(old,
    ins_min)); a DELETE can only break a bound when it removes an
    extremal value, so groups split into:

    - CLEAN: no delete touched a bound (del_min > state_min AND
      del_max < state_max) — bounds survive, inserts fold in, zero
      base I/O;
    - DIRTY: some delete hit a bound (del_min <= state_min OR
      del_max >= state_max — conservative on ties: deleting ONE of
      two equal minima doesn't move the bound, but proving that
      needs the base, so ties rescan) — ONLY these groups recompute,
      via a semi-join-pruned scan of the post-CDC ``effective``
      table (at scale: partition pruning on the group key makes this
      O(dirty partitions), the delete_rows discipline).

    ``state`` is (keys, n, mn, mx); ``inserts``/``deletes`` are
    per-group (keys, n, mn, mx) aggregates of the CDC batch (updates
    enter as delete-old + insert-new); ``effective`` is the post-CDC
    base (keys, ``val_col``). Returns (keys, n, mn, mx, rescanned) —
    counts maintained additively, emptied groups dropped, new groups
    (insert-only) created clean. The ``ivm_minmax_rollup`` gate pins
    the whole dispatch against a full recompute, including WHICH
    groups rescanned.
    """
    ins = inserts
    for c in ("n", "mn", "mx"):
        ins = ins.withColumnRenamed(c, f"__i_{c}")
    del_ = deletes
    for c in ("n", "mn", "mx"):
        del_ = del_.withColumnRenamed(c, f"__d_{c}")
    merged = state.join(ins, keys, "full_outer").join(
        del_, keys, "full_outer"
    )
    n_new = (
        F.coalesce(F.col("n"), F.lit(0))
        + F.coalesce(F.col("__i_n"), F.lit(0))
        - F.coalesce(F.col("__d_n"), F.lit(0))
    ).cast("long")
    # state-ABSENT groups with same-batch deletes (insert + update of
    # the same row in one CDC batch) have NULL state bounds: the bound
    # comparisons are NULL there, and a coalesce-to-clean would fold
    # the deleted values into least/greatest — rescan them instead
    # (review r9)
    dirty = F.col("__d_n").isNotNull() & (
        F.col("mn").isNull()
        | (F.col("__d_mn") <= F.col("mn"))
        | (F.col("__d_mx") >= F.col("mx"))
    )
    marked = merged.select(
        *keys,
        n_new.alias("__n_new"),
        F.coalesce(dirty, F.lit(False)).alias("__dirty"),
        F.least(F.col("mn"), F.col("__i_mn")).alias("__mn_clean"),
        F.greatest(F.col("mx"), F.col("__i_mx")).alias("__mx_clean"),
    ).filter(F.col("__n_new") > 0).localCheckpoint(eager=False)
    clean = marked.filter(~F.col("__dirty")).select(
        *keys,
        F.col("__n_new").alias("n"),
        F.col("__mn_clean").alias("mn"),
        F.col("__mx_clean").alias("mx"),
        F.lit(False).alias("rescanned"),
    )
    dirty_keys = marked.filter(F.col("__dirty")).select(*keys)
    rescanned = (
        effective.join(F.broadcast(dirty_keys), keys)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(val_col).alias("mn"),
            F.max(val_col).alias("mx"),
        )
        .withColumn("rescanned", F.lit(True))
    )
    return clean.unionByName(rescanned)
