"""Structured Streaming jobs over the events schema.

The reference has no streaming (SURVEY §2.9) — its daily snapshot +
carry-forward is a 1-day tumbling window executed by cron. This module
is the net-new streaming surface: the SAME logical computations as
plans/events.py, expressed incrementally with readStream + watermarks,
so each query has a batch twin whose results define correctness (tested
by running the streaming query over a file source and comparing to the
batch plan on the same data).

All transformations are source-agnostic: they take the events DataFrame
(batch or streaming — Spark's unified API) and return the transformed
frame; only the caller decides read/readStream and the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampNTZType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def hourly_windowed_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling window per event_type with late-data watermark.

    Streaming twin of plans/events.events_hourly. The watermark bounds
    state: windows older than max(event time) − 2h are finalized and
    evicted, so state size is O(active windows), not O(stream length).
    """
    # watermarks require TimestampType; ntz event time is cast once
    # (session-tz interpretation — identical for the batch twin)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap sessionization with the built-in session_window — state-backed
    incremental sessions, the streaming twin of plans/events.sessionize."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state — the streaming twin of
    the batch exact-dedup (SURVEY U4 / plans/text.exact_dedup's
    hash-groupBy shape).

    dropDuplicatesWithinWatermark keeps a key's fingerprint only until
    the watermark passes its event time, so state is O(keys per
    watermark horizon), not O(stream length) — the difference between
    a dedup that survives a month of 100 TB/day and one that OOMs on
    day two. Duplicates arriving later than the horizon are dropped as
    late data, which for a dedup is the same observable outcome.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events parquet drops (swap for kafka/kinesis
    readers in production — the transformations above are
    source-agnostic). ``max_files_per_trigger=1`` makes each file its
    own micro-batch, which tests use to exercise cross-batch state."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def run_stream_to_memory(
    spark: SparkSession, df: DataFrame, name: str, mode: str = "append"
):
    """Drive a streaming frame into an in-memory table (test sink);
    returns the StreamingQuery (caller awaits/stops)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# custom stateful operator: per-user running stats with threshold alerts
# (applyInPandasWithState — the escape hatch for stateful semantics the
# built-in windows can't express)
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: E402

_RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
        StructField("alert", StringType(), True),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE, mx DOUBLE"


def running_user_stats(events: DataFrame, alert_total: float = 1000.0) -> DataFrame:
    """Per-user running aggregate with alert emission — a genuinely
    custom stateful operator (emit-on-change + threshold alerts), which
    neither window() nor session_window() expresses.

    State per user: (event count, running total, running max), carried
    across micro-batches by applyInPandasWithState; each batch emits
    the user's updated stats and an alert marker when the running total
    first crosses ``alert_total``. Arrow-batched per group — state size
    is 3 scalars per user, O(users) total.
    """
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            n, total, mx = state.get
            prev_alerted = total >= alert_total
        else:
            n, total, mx = 0, 0.0, float("-inf")
            prev_alerted = False
        for pdf in pdfs:
            vals = pdf["value"].astype(float)
            n += int(len(pdf))
            total += float(vals.sum())
            mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        alert = (
            "TOTAL_THRESHOLD_CROSSED"
            if (not prev_alerted and total >= alert_total)
            else None
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
                "alert": [alert],
            }
        )

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def health_rollup_stream(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
    fail_threshold: float = 400.0,
) -> DataFrame:
    """Windowed task-health rollup — the streaming twin of the
    monitoring vw_etl_health shape (plans/events.etl_health_rollup):
    per (window, task) run counts, success counts, exact duration sum,
    and last-run timestamp, maintained incrementally.

    The batch view's 7-day recency anchor doesn't stream (it re-reads
    history); the streaming form is the standard tumbling-window
    decomposition — dashboards sum the last 7 windows. Watermark
    bounds state to active windows.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            F.col("event_type").alias("task_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_runs"),
            F.sum((F.col("value") < fail_threshold).cast("long")).alias(
                "success_runs"
            ),
            F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias(
                "total_duration"
            ),
            F.max("ts").alias("last_run"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "task_id",
            "total_runs",
            "success_runs",
            "total_duration",
            "last_run",
        )
    )


# ---------------------------------------------------------------------------
# streaming as-of join: purchases matched to the latest prior view,
# state = per-user view frontier (the streaming twin of
# plans/events.asof_join_purchases)
# ---------------------------------------------------------------------------

_ASOF_SCHEMA = StructType(
    [
        StructField("purchase_id", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("purchase_us", LongType(), True),
        StructField("view_id", LongType(), True),
        StructField("gap_us", LongType(), True),
        StructField("late", BooleanType(), True),
    ]
)

_ASOF_STATE = "view_us LONG, view_id LONG, max_us LONG"


def asof_stream(events: DataFrame) -> DataFrame:
    """Streaming as-of join: each purchase emits the same user's most
    recent view at-or-before it.

    Per user the state is the view FRONTIER (latest view's timestamp +
    id) plus the per-key event-time high-water mark ``max_us`` — three
    scalars, O(users) total state, never a buffer of history. Each
    micro-batch seeds the frontier into the batch's view set and
    matches purchases with a vectorized ``pandas.merge_asof``
    (backward search, exact matches allowed — the same ``ts >=
    view_ts`` tie rule as the batch twin; views sorted by (ts, id) so
    equal-timestamp views resolve to the max id). Assumes per-key
    time-ordered arrival across micro-batches (the guarantee a
    user-keyed Kafka partition provides); within a batch, ordering is
    enforced by the sort.

    Ordering violations SURFACE instead of silently corrupting output
    (ADVICE r3): any event that arrives behind the key's high-water
    mark is excluded from matching and frontier updates (already-
    emitted matches stay exactly what an ordered stream would have
    produced) and is emitted as a ``late=true`` row — a late purchase
    keeps its id/timestamp with a NULL match, a late view appears
    with NULL purchase_id and its own view_id — so downstream can
    count, alert on, or reprocess them. On an ordered stream every
    row has ``late=false`` and dropping the column gives the batch
    twin bit-exactly.
    """
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        v_us, v_id, max_us = state.get if state.exists else (None, None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # only the event types this operator consumes participate in
        # ordering: a click/signup between a purchase and a later view
        # must not advance the mark and flag that view late (the
        # batch twin filters to view/purchase before matching too)
        pdf = pdf[pdf["event_type"].isin(("view", "purchase"))]
        # cross-batch order check: anything behind the high-water mark
        # arrived late (within a batch the sorts below fix ordering)
        late_mask = (
            pdf["us"] < max_us
            if max_us is not None
            else pd.Series(False, index=pdf.index)
        )
        late, on_time = pdf[late_mask], pdf[~late_mask]
        views = on_time[on_time["event_type"] == "view"][["us", "event_id"]]
        if v_us is not None:
            views = pd.concat(
                [pd.DataFrame({"us": [v_us], "event_id": [v_id]}), views],
                ignore_index=True,
            )
        views = views.sort_values(["us", "event_id"]).rename(
            columns={"event_id": "view_id", "us": "view_us"}
        )
        purchases = (
            on_time[on_time["event_type"] == "purchase"][["us", "event_id"]]
            .sort_values(["us", "event_id"])
            .rename(columns={"event_id": "purchase_id"})
        )
        if len(views):
            last = views.iloc[-1]
            v_us, v_id = int(last["view_us"]), int(last["view_id"])
        if len(on_time):
            max_us = (
                int(on_time["us"].max())
                if max_us is None
                else max(max_us, int(on_time["us"].max()))
            )
        state.update((v_us, v_id, max_us))
        out = []
        if len(purchases):
            matched = pd.merge_asof(
                purchases,
                views,
                left_on="us",
                right_on="view_us",
                direction="backward",
                allow_exact_matches=True,
            )
            out.append(
                pd.DataFrame(
                    {
                        "purchase_id": matched["purchase_id"].astype("int64"),
                        "user_id": user_id,
                        "purchase_us": matched["us"].astype("int64"),
                        "view_id": matched["view_id"].astype("Int64"),
                        "gap_us": (matched["us"] - matched["view_us"]).astype(
                            "Int64"
                        ),
                        "late": False,
                    }
                )
            )
        if len(late):
            is_p = late["event_type"] == "purchase"
            # convert to nullable Int64 BEFORE masking: .where() on an
            # int64 column routes through float64 (NaN fill) and would
            # silently corrupt ids above 2^53
            eid = late["event_id"].astype("Int64")
            lus = late["us"].astype("Int64")
            out.append(
                pd.DataFrame(
                    {
                        "purchase_id": eid.where(is_p),
                        "user_id": user_id,
                        "purchase_us": lus.where(is_p),
                        "view_id": eid.where(~is_p),
                        "gap_us": pd.array([pd.NA] * len(late), dtype="Int64"),
                        "late": True,
                    }
                )
            )
        if out:
            yield pd.concat(out, ignore_index=True)

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("us", F.unix_micros("ts"))
        .select("user_id", "event_id", "event_type", "us")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_ASOF_SCHEMA,
            stateStructType=_ASOF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cohort_stream(events: DataFrame, anchor) -> DataFrame:
    """(cohort_week, week_offset, n_active): the weekly cohort-
    retention matrix updating as events arrive — the streaming twin of
    plans/events.cohort_retention's count columns.

    ``anchor`` (a datetime.date) pins the cohort epoch: the batch gate
    derives it with a corpus-min aggregate, which a stream can neither
    compute up front nor take as a broadcast — production pins the
    epoch as config, exactly as passed here. Structured Streaming
    forbids chained aggregations, so the batch plan's two-level shape
    (per-user weekly dedup, then the matrix count) folds into ONE
    aggregation: ``size(collect_set(user_id))`` per matrix cell. State
    is the per-cell distinct-user sets — bounded by (cohorts × weeks)
    cells times their active users, the same information the batch
    first level carries, and quadratically smaller than the event
    stream. Complete mode for finite verification (rule 8); the final
    state equals the batch matrix row for row (tests)."""
    # admission rule SHARED with the batch gate (plans/events) — a
    # re-stated literal here could silently drift from the oracle
    from ..plans.events import _COHORT_WEEKS

    ev = events.select("user_id", F.to_date("ts").alias("d"))
    act = (
        ev.select(
            "user_id",
            (F.col("user_id") % _COHORT_WEEKS).alias("cohort_week"),
            F.datediff("d", F.lit(anchor)).alias("day_off"),
        )
        .filter(F.col("day_off") >= F.col("cohort_week") * 7)
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(F.col("day_off") / 7) - F.col("cohort_week")
            ).alias("week_offset"),
        )
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.size(F.collect_set("user_id")).cast("long").alias("n_active")
    )


# ---------------------------------------------------------------------------
# streaming SCD2 maintenance: every change event opens a version and
# closes its predecessor (the CDC twin of plans/events.scd2_user_history)
# ---------------------------------------------------------------------------

_SCD2_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("attr_value", StringType(), True),
        StructField("effective_us", LongType(), True),
        StructField("expiry_us", LongType(), True),
        StructField("late", BooleanType(), True),
    ]
)

_SCD2_STATE = "eff_us LONG, event_id LONG, attr_value STRING"


def scd2_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD Type 2: each change event CLOSES the key's current
    version (emitting it with its expiry stamped) and becomes the new
    current — the incremental form of the batch gate's lead() window,
    where a closed row here equals a batch row with ``expiry_ts`` set
    and the per-key state always holds the one ``is_current`` version.

    State per key is the current version's (effective_us, event_id,
    attr_value) — three scalars, never a history buffer. Ordering
    contract and late handling follow ``asof_stream``: per-key
    time-ordered arrival across micro-batches is assumed (a keyed
    Kafka partition's guarantee); within a batch rows sort by
    (ts, event_id); any row at or behind the current version's
    (ts, id) mark is emitted ``late=true`` with a NULL expiry and
    does NOT disturb the chain (a retroactive mid-history insert is a
    batch-repair concern, not a streaming one — the flag makes the
    repair set visible). On an ordered stream the closed rows equal
    the batch twin's closed rows bit for bit.
    """
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        cur_us, cur_id, cur_attr = (
            state.get if state.exists else (None, None, None)
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if cur_us is None:
            late_mask = pd.Series(False, index=pdf.index)
        else:
            late_mask = (pdf["us"] < cur_us) | (
                (pdf["us"] == cur_us) & (pdf["event_id"] <= cur_id)
            )
        late = pdf[late_mask]
        on_time = pdf[~late_mask].sort_values(["us", "event_id"])
        out = []
        if len(on_time):
            closed_attr, closed_eff, closed_exp = [], [], []
            for us, eid, attr in zip(
                on_time["us"], on_time["event_id"], on_time["event_type"]
            ):
                if cur_us is not None:
                    closed_attr.append(cur_attr)
                    closed_eff.append(cur_us)
                    closed_exp.append(int(us))
                cur_us, cur_id, cur_attr = int(us), int(eid), str(attr)
            if closed_eff:
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": user_id,
                            "attr_value": closed_attr,
                            "effective_us": pd.array(
                                closed_eff, dtype="Int64"
                            ),
                            "expiry_us": pd.array(closed_exp, dtype="Int64"),
                            "late": False,
                        }
                    )
                )
            state.update((cur_us, cur_id, cur_attr))
        if len(late):
            out.append(
                pd.DataFrame(
                    {
                        "user_id": user_id,
                        "attr_value": late["event_type"].astype(str),
                        "effective_us": late["us"].astype("Int64"),
                        "expiry_us": pd.array(
                            [pd.NA] * len(late), dtype="Int64"
                        ),
                        "late": True,
                    }
                )
            )
        if out:
            yield pd.concat(out, ignore_index=True)

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("us", F.unix_micros("ts"))
        .select("user_id", "event_id", "event_type", "us")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SCD2_SCHEMA,
            stateStructType=_SCD2_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# stream-stream interval join: view→purchase attribution
# (the twin of plans/events.attribution_pairs — the engine's
# double-watermarked stream-stream join; every other streaming join in
# the package is stream-static)
# ---------------------------------------------------------------------------


def attribution_stream(
    events: DataFrame,
    horizon_hours: int = 12,
    watermark: str = "1 hour",
) -> DataFrame:
    """(view, purchase) pairs of the same user with the purchase inside
    (horizon after the view] — the streaming twin of the
    attribution_pairs gate, expressed as Spark's native stream-stream
    inner join with BOTH sides watermarked and the time bound in the
    join condition, so the runtime derives state-eviction thresholds
    itself: a buffered view is dropped once the purchase-side watermark
    passes view_ts + horizon (no future purchase can match it), and
    state is O(events inside the horizon), not O(stream length).

    Late-data contract (pinned as MEASURED by test, this Spark): join
    inputs are NOT pre-filtered by event time and state eviction lags
    the watermark by one micro-batch — a late purchase arriving in the
    very next batch after a watermark jump can still match
    not-yet-evicted view state; once any further batch commits the
    advanced watermark, the view is gone and the late purchase emits
    nothing. Phantom pairs against evicted state are impossible. The
    watermark columns are one-time casts of the ntz event time (rule:
    watermarks need TimestampType); the emitted view_ts/purchase_ts
    stay on the ntz wall clock, bit-identical to the batch gate.
    """
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            F.col("ts").cast("timestamp").alias("v_event_ts"),
        )
        .withWatermark("v_event_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
            F.col("ts").cast("timestamp").alias("p_event_ts"),
        )
        .withWatermark("p_event_ts", watermark)
    )
    return v.join(
        p,
        F.expr(
            "user_id = p_user AND p_event_ts > v_event_ts "
            f"AND p_event_ts <= v_event_ts + INTERVAL {horizon_hours} HOURS"
        ),
        "inner",
    ).select(
        "user_id",
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )


# ---------------------------------------------------------------------------
# online CUSUM drift monitor (twin of plans/events.cusum_drift_days;
# k_ref/alarm trained offline by plans/events.cusum_reference — the
# temperature_stream served-artifact device)
# ---------------------------------------------------------------------------

_CUSUM_SCHEMA = StructType(
    [
        StructField("day_int", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("cusum", LongType(), True),
        StructField("drift", BooleanType(), True),
        StructField("late", BooleanType(), True),
    ]
)

_CUSUM_STATE = "open_day LONG, cnt LONG, s LONG"


def cusum_stream(events: DataFrame, k_ref: int, alarm: int) -> DataFrame:
    """(day, n_events, cusum, drift, late): one-sided CUSUM over daily
    event volume on a LIVE stream — S_t = max(0, S_{t−1} + n_t − k_ref),
    alarm at S_t > alarm, both constants trained offline
    (plans/events.cusum_reference).

    State is THREE scalars for the whole series (open day, its running
    count, the statistic); a day emits when the first event of a LATER
    day arrives (closed-day semantics — the last open day stays in
    state, exactly the frontier contract of asof_stream). Events
    arriving behind the open day flag ``late=true`` with their own
    day's count and a NULL statistic — surfaced, never silently folded
    into an already-closed day. Assumes time-ordered arrival per the
    Kafka-partition contract; per-metric keys replace the constant
    group key in production (state O(series), not O(events))."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        open_day, cnt, s = state.get if state.exists else (None, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        out = []
        late = pdf[pdf["day_int"] < (open_day if open_day is not None else -(1 << 60))]
        if len(late):
            for day, grp in late.groupby("day_int"):
                out.append((int(day), int(len(grp)), None, None, True))
        on_time = pdf[pdf["day_int"] >= (open_day if open_day is not None else -(1 << 60))]
        for day in sorted(on_time["day_int"].unique()):
            day = int(day)
            n_day = int((on_time["day_int"] == day).sum())
            if open_day is None:
                open_day, cnt = day, n_day
                continue
            if day == open_day:
                cnt += n_day
                continue
            s = max(0, s + cnt - k_ref)
            out.append((open_day, cnt, s, s > alarm, False))
            open_day, cnt = day, n_day
        state.update((open_day, cnt, s))
        if out:
            yield pd.DataFrame(
                out,
                columns=["day_int", "n_events", "cusum", "drift", "late"],
            )

    closed = (
        events.withColumn(
            "day_int",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long"),
        )
        .select("day_int", F.lit(1).alias("__series"))
        .groupBy("__series")
        .applyInPandasWithState(
            update,
            outputStructType=_CUSUM_SCHEMA,
            stateStructType=_CUSUM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return closed.select(
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("day_int").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "n_events",
        "cusum",
        "drift",
        "late",
    )


def hll_window_registers(
    events: DataFrame, watermark: str = "2 hours", key_col: str = "user_id"
) -> DataFrame:
    """Streaming HLL registers per 1-hour window (twin 42 — the sketch
    family's streaming face): the register build is itself a
    watermark-bounded streaming aggregate (groupBy(window, slot) +
    MAX(rank)), so per-window distinct-count sketches accumulate with
    O(active windows × 2^p) state and NO raw-key retention — the
    shape that answers "distinct users per hour" on an unbounded
    stream. Emitted register rows merge downstream exactly like the
    batch artifacts (slot-wise max, operators/sketch.hll_merge);
    batch == stream register-for-register (tested)."""
    from ..operators.sketch import hll_registers

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    with_win = events.withWatermark("ts", watermark).withColumn(
        "win", F.window("ts", "1 hour")
    )
    return hll_registers(with_win, key_col, ("win",))


def ab_test_stream(events: DataFrame) -> DataFrame:
    """(arm, n, conv, rate_ppm): the experiment's per-arm conversion
    counters updating as events arrive — twin 50, the
    ab_test_proportions gate's arm aggregation in complete mode over
    the SHARED plans/events.ab_arm_counts transform (chained
    aggregations are unsupported on streams, so the pooled-z² summary
    stays a consumer-side fold over the two emitted arm rows; rate_ppm
    is a plain post-agg projection, which streams fine). Final state
    equals the batch gate's per-arm rows column for column."""
    from ..plans.events import ab_arm_counts

    arms = ab_arm_counts(events)
    return arms.select(
        F.col("arm").cast("long").alias("arm"),
        "n",
        "conv",
        F.expr("(1000000 * conv) div n").cast("long").alias("rate_ppm"),
    )


def mann_whitney_stream(events: DataFrame) -> DataFrame:
    """(cents, c_v, cnt1): the Mann-Whitney gate's distinct-value tie
    counts updating as events arrive — twin 52, the
    mann_whitney_arms gate's value aggregation in complete mode over
    the SHARED plans/events.mw_value_counts transform (chained
    aggregations are unsupported on streams, so the rank fold / U / z²
    stay consumer-side — the ab_test_stream convention). Final state
    equals the batch value-count frame row for row."""
    from ..plans.events import mw_value_counts

    return mw_value_counts(events)
