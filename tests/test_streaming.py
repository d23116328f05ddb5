"""Structured Streaming: incremental results must equal the batch twin."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.streaming.events import (
    hourly_windowed_agg,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)
from jobinsight_data_pipeline_v2_spark.tables import load_events

SF = "/root/testdata/sf0.001"


def _stage_stream_files(spark, tmp_path, n_files=3):
    """Split events into n parquet drops (micro-batch per file)."""
    ev = load_events(spark, SF)
    src = os.path.join(str(tmp_path), "stream_src")
    ev.withColumn("__b", F.pmod(F.col("event_id"), F.lit(n_files))).repartition(
        "__b"
    ).write.partitionBy("__b").parquet(src)
    # flatten partition dirs into plain files-in-dir for the file source
    flat = os.path.join(str(tmp_path), "flat")
    os.makedirs(flat)
    i = 0
    for root, _, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                os.rename(os.path.join(root, f), os.path.join(flat, f"drop_{i}.parquet"))
                i += 1
    return flat, ev


def test_streaming_hourly_equals_batch(spark, tmp_path):
    flat, ev = _stage_stream_files(spark, tmp_path)
    stream = read_events_stream(spark, flat).drop("__b")
    # append mode would hold back windows younger than the watermark
    # horizon at end-of-stream; complete mode emits the full state
    q = run_stream_to_memory(spark, hourly_windowed_agg(stream), "hourly_test", mode="complete")
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT window_start, event_type, n_events, total_value FROM hourly_test"
    )
    expected = hourly_windowed_agg(ev)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0


def test_streaming_sessionize_runs(spark, tmp_path):
    flat, ev = _stage_stream_files(spark, tmp_path)
    stream = read_events_stream(spark, flat).drop("__b")
    q = run_stream_to_memory(spark, sessionize_stream(stream), "sess_test", mode="complete")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_test")
    # session_window semantics differ from the batch lag-based twin only
    # in boundary bookkeeping; assert structure + volume sanity here
    assert got.count() > 0
    assert got.filter(F.col("session_start") > F.col("session_end")).count() == 0
    per_user = got.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    ev_per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    sym = per_user.exceptAll(ev_per_user).count()
    assert sym == 0  # every event lands in exactly one session


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState: state carries across micro-batches and the
    final running totals equal the batch aggregate."""
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        running_user_stats,
    )

    flat, ev = _stage_stream_files(spark, tmp_path)
    stream = read_events_stream(spark, flat, max_files_per_trigger=1).drop("__b")
    q = run_stream_to_memory(
        spark, running_user_stats(stream, alert_total=500.0), "run_stats"
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM run_stats")
    # multiple emissions per user (one per micro-batch touching it)
    assert out.count() > out.select("user_id").distinct().count()
    # last emission per user must equal the batch ground truth
    from pyspark.sql.window import Window

    last = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter("rn = 1")
        .select("user_id", "n_events", "total_value")
    )
    truth = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
    )
    joined = last.join(truth.withColumnRenamed("n_events", "n_true"), "user_id")
    assert joined.filter(F.col("n_events") != F.col("n_true")).count() == 0
    # alert fires at most once per user
    alerts = out.filter(F.col("alert").isNotNull()).groupBy("user_id").count()
    assert alerts.filter("count > 1").count() == 0


def test_streaming_dedup_equals_distinct(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a stream where every event
    appears twice (the duplicate in a later micro-batch) must emit the
    distinct set, exactly once each."""
    from jobinsight_data_pipeline_v2_spark.streaming.events import dedup_stream

    ev = load_events(spark, SF)
    flat = os.path.join(str(tmp_path), "flat")
    os.makedirs(flat)
    # drop 0: the events; drop 1: the same events again (full dup rows)
    ev.coalesce(1).write.parquet(os.path.join(str(tmp_path), "d0"))
    ev.coalesce(1).write.parquet(os.path.join(str(tmp_path), "d1"))
    i = 0
    for d in ("d0", "d1"):
        for root, _, files in os.walk(os.path.join(str(tmp_path), d)):
            for f in files:
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(root, f), os.path.join(flat, f"drop_{i}.parquet")
                    )
                    i += 1
    stream = read_events_stream(spark, flat, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, dedup_stream(stream), "dedup_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_test")
    assert got.count() == ev.count()  # each event exactly once
    assert got.select("event_id").distinct().count() == ev.count()


def test_streaming_keyed_latest_sink_equals_batch(spark, tmp_path):
    """foreachBatch newest-wins MERGE sink: after the stream drains, the
    table equals the batch latest-per-key over all drops, independent of
    micro-batch boundaries (drops are keyed by event_id mod, NOT time-
    ordered — a last-batch-wins sink would fail this)."""
    from jobinsight_data_pipeline_v2_spark.streaming.sinks import (
        KeyedLatestSink,
        latest_per_key,
    )

    flat, ev = _stage_stream_files(spark, tmp_path)
    stream = read_events_stream(spark, flat, max_files_per_trigger=1).drop("__b")
    sink = KeyedLatestSink(
        os.path.join(str(tmp_path), "current_state"),
        key="user_id",
        order_cols=["ts", "event_id"],
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sink.read(spark)
    expected = latest_per_key(ev, "user_id", ["ts", "event_id"])
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    # replay idempotency: re-merging any batch changes nothing
    sink(ev.limit(50), batch_id=999)
    again = sink.read(spark)
    assert again.exceptAll(expected).count() + expected.exceptAll(again).count() == 0


def test_streaming_health_rollup_equals_batch(spark, tmp_path):
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        health_rollup_stream,
    )

    flat, ev = _stage_stream_files(spark, tmp_path)
    stream = read_events_stream(spark, flat).drop("__b")
    q = run_stream_to_memory(
        spark, health_rollup_stream(stream), "health_test", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT window_start, task_id, total_runs, success_runs, "
        "total_duration, last_run FROM health_test"
    )
    expected = health_rollup_stream(ev)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    # every event is a run in exactly one window
    assert (
        got.agg(F.sum("total_runs")).collect()[0][0] == ev.count()
    )


def test_streaming_asof_equals_batch(spark, tmp_path):
    """Stateful streaming as-of join: with per-key time-ordered drops
    (the Kafka-partition guarantee it documents), the union of emitted
    matches must equal the batch as-of gate exactly."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.events import asof_stream

    ev = load_events(spark, SF)
    # three time-ordered drops: rank by ts, cut into thirds
    src = os.path.join(str(tmp_path), "asof_flat")
    os.makedirs(src)
    rows = ev.count()
    per = rows // 3 + 1
    from pyspark.sql.window import Window as W

    ranked = ev.withColumn(
        "__rk", F.row_number().over(W.orderBy("ts", "event_id"))
    ).withColumn("__b", ((F.col("__rk") - 1) / per).cast("int"))
    for b in range(3):
        part = ranked.filter(F.col("__b") == b).drop("__rk", "__b")
        d = os.path.join(str(tmp_path), f"asof_d{b}")
        part.coalesce(1).write.parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    dst = os.path.join(src, f"drop_{b}.parquet")
                    os.rename(os.path.join(root, f), dst)
                    t = time.time() + b  # strictly increasing mtimes
                    os.utime(dst, (t, t))
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, asof_stream(stream), "asof_test")
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT purchase_id, user_id, purchase_us, view_id, gap_us FROM asof_test"
    )
    expected = load_all()["asof_join_purchases"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0


def test_streaming_pack_equals_batch(spark, tmp_path):
    """Stateful streaming packing: per-shard running offsets across
    doc_id-ordered micro-batches reproduce the batch sequence_pack
    assignment exactly."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        _PACK_CAPACITY,
        _PACK_SHARDS,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.packing import pack_stream

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    src = os.path.join(str(tmp_path), "pack_flat")
    os.makedirs(src)
    rows = docs.count()
    per = rows // 3 + 1
    for b in range(3):
        part = docs.filter(
            (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
        )
        d = os.path.join(str(tmp_path), f"pack_d{b}")
        part.coalesce(1).write.parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    dst = os.path.join(src, f"drop_{b}.parquet")
                    os.rename(os.path.join(root, f), dst)
                    t = time.time() + b
                    os.utime(dst, (t, t))
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = run_stream_to_memory(
        spark,
        pack_stream(stream, capacity=_PACK_CAPACITY, n_shards=_PACK_SHARDS),
        "pack_test",
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM pack_test")
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
    expected = load_all()["sequence_pack"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0


def test_streaming_decontaminate_stream_static(spark, tmp_path):
    """Stream-static join: a streaming corpus checked against a static
    benchmark gram table gives the same per-doc hit counts as the batch
    form (stateless — the static side carries all join context)."""
    from jobinsight_data_pipeline_v2_spark.plans.text import _SHINGLE_RE
    from jobinsight_data_pipeline_v2_spark.streaming.packing import (
        decontaminate_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    is_bench = (F.col("doc_id") % 97) == 0
    bench_grams = (
        docs.filter(is_bench)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
                )
            ).alias("g"),
        )
        .localCheckpoint()
    )
    corpus = docs.filter(~is_bench)
    src = os.path.join(str(tmp_path), "dec_flat")
    os.makedirs(src)
    for b in range(2):
        part = corpus.filter(F.pmod("doc_id", F.lit(2)) == b)
        d = os.path.join(str(tmp_path), f"dec_d{b}")
        part.coalesce(1).write.parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(root, f), os.path.join(src, f"drop_{b}.parquet")
                    )
    stream = spark.readStream.schema(corpus.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = run_stream_to_memory(
        spark,
        decontaminate_stream(stream, bench_grams, _SHINGLE_RE),
        "dec_test",
        mode="complete",
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dec_test")
    # expected side written independently as a plain batch aggregation
    # with EXACT count_distinct (allowed in batch, not in streaming) —
    # pins the online form against batch decontaminate semantics
    # instead of against itself (ADVICE r3)
    corpus_grams = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
            )
        ).alias("g"),
    )
    expected = (
        corpus_grams.join(bench_grams, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_gram_hits"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0  # planted near-dups make the hit path real


def _write_drop(df, tmp_path, src, name, mtime):
    """Write df as a single parquet file drop with a pinned mtime."""
    import time

    d = os.path.join(str(tmp_path), f"__stage_{name}")
    df.coalesce(1).write.parquet(d)
    os.makedirs(src, exist_ok=True)
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"{name}.parquet")
                os.rename(os.path.join(root, f), dst)
                os.utime(dst, (mtime, mtime))


def test_streaming_asof_flags_late_arrivals(spark, tmp_path):
    """Ordering violations must SURFACE (ADVICE r3): an event behind
    its key's high-water mark is emitted late=true, excluded from
    matching, and the on-time output stays what an ordered stream
    would have produced."""
    import time

    from jobinsight_data_pipeline_v2_spark.streaming.events import asof_stream

    us = lambda s: f"TIMESTAMP_NTZ '2026-01-01 00:00:{s:02d}'"  # noqa: E731
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    from datetime import datetime

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    drop1 = mk([(1, t(10), 7, "view", 1.0, None), (2, t(20), 7, "purchase", 5.0, None)])
    # view@15 is BEHIND user 7's high-water mark (20) -> late;
    # purchase@25 is on time and must still match view@10
    drop2 = mk([(3, t(15), 7, "view", 1.0, None), (4, t(25), 7, "purchase", 6.0, None)])
    src = os.path.join(str(tmp_path), "late_flat")
    now = time.time()
    _write_drop(drop1, tmp_path, src, "drop_0", now)
    _write_drop(drop2, tmp_path, src, "drop_1", now + 2)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, asof_stream(stream), "asof_late_test")
    q.awaitTermination(120)
    rows = {
        (r.purchase_id, r.view_id, r.late)
        for r in spark.sql("SELECT * FROM asof_late_test").collect()
    }
    assert rows == {
        (2, 1, False),   # purchase@20 -> view@10
        (4, 1, False),   # purchase@25 -> view@10 (late view excluded)
        (None, 3, True), # the out-of-order view surfaces, flagged
    }


def test_streaming_pack_flags_late_arrivals(spark, tmp_path):
    """A doc behind the shard's doc_id high-water mark is flagged
    late=true with NULL pack_id and does not shift subsequent pack
    assignments (ADVICE r3)."""
    import time

    from jobinsight_data_pipeline_v2_spark.streaming.packing import pack_stream

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    four = "w x y z"
    drop1 = mk([(8, four), (16, four)])          # shard 0: cum 0->8
    drop2 = mk([(12, four), (24, four)])         # 12 < 16 -> late; 24 on time
    src = os.path.join(str(tmp_path), "pack_late_flat")
    now = time.time()
    _write_drop(drop1, tmp_path, src, "drop_0", now)
    _write_drop(drop2, tmp_path, src, "drop_1", now + 2)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, pack_stream(stream, capacity=10, n_shards=1), "pack_late_test"
    )
    q.awaitTermination(120)
    rows = {
        (r.doc_id, r.pack_id, r.late)
        for r in spark.sql("SELECT * FROM pack_late_test").collect()
    }
    assert rows == {
        (8, 0, False),      # cum 0
        (16, 0, False),     # cum 4 -> pack 0
        (12, None, True),   # behind high-water mark 16
        (24, 0, False),     # cum 8 -> pack 0 (unchanged by late doc)
    }


def _stage_doc_drops(spark, tmp_path, cols, n_drops=3):
    """Split documents into n single-file parquet drops by doc_id."""
    import time

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(*cols)
    src = os.path.join(str(tmp_path), "doc_flat")
    now = time.time()
    for b in range(n_drops):
        part = docs.filter(F.pmod("doc_id", F.lit(n_drops)) == b)
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    return src, docs


def test_streaming_chunk_equals_batch(spark, tmp_path):
    """Stateless narrow chunking: the streamed union of per-batch
    chunks equals the batch chunk_documents gate exactly."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        chunk_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(spark, chunk_stream(stream), "chunk_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM chunk_test")
    expected = load_all()["chunk_documents"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0


def test_streaming_funnel_equals_batch(spark, tmp_path):
    """Streaming curation funnel: complete-mode final state equals the
    batch curation_funnel gate row for row."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        funnel_stream,
    )

    src, docs = _stage_doc_drops(
        spark, tmp_path, ["doc_id", "lang", "n_chars", "text"]
    )
    stream = (
        spark.readStream.schema("doc_id long, lang string, n_chars long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, funnel_stream(stream), "funnel_test", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM funnel_test")
    expected = load_all()["curation_funnel"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0


def test_streaming_asof_ignores_other_event_types_for_frontier(spark, tmp_path):
    """Only view/purchase participate in ordering: a click with a later
    timestamp in batch 1 must not flag batch 2's on-time view late."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.streaming.events import asof_stream

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    t = lambda s: datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    # click@30 is ahead of everything but must be invisible to the asof
    drop1 = mk([(1, t(10), 7, "view", 1.0, None), (9, t(30), 7, "click", 0.0, None)])
    drop2 = mk([(2, t(15), 7, "view", 1.0, None), (3, t(20), 7, "purchase", 5.0, None)])
    src = os.path.join(str(tmp_path), "click_flat")
    now = time.time()
    _write_drop(drop1, tmp_path, src, "drop_0", now)
    _write_drop(drop2, tmp_path, src, "drop_1", now + 2)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, asof_stream(stream), "asof_click_test")
    q.awaitTermination(120)
    rows = {
        (r.purchase_id, r.view_id, r.late)
        for r in spark.sql("SELECT * FROM asof_click_test").collect()
    }
    # view@15 is ON TIME (the click's t=30 never advanced the mark) and
    # purchase@20 matches it
    assert rows == {(3, 2, False)}


def test_streaming_segment_dedup_equals_batch(spark, tmp_path):
    """Ordered feed (doc_id-range drops): the streamed keep/drop
    decisions equal the batch gate's first-occurrence marking row for
    row, with zero late flags."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        segment_dedup_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    src = os.path.join(str(tmp_path), "seg_ordered")
    now = time.time()
    for b, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]):
        part = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, segment_dedup_stream(stream), "segdedup_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM segdedup_test")
    assert got.filter("late").count() == 0
    per_doc = (
        got.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
    )
    expected = load_all()["segment_dedup"][0](spark, SF).select(
        "doc_id", "n_segs", "n_kept"
    )
    sym = (
        per_doc.exceptAll(expected).count()
        + expected.exceptAll(per_doc).count()
    )
    assert sym == 0


def test_streaming_segment_dedup_keeps_each_segment_once(spark, tmp_path):
    """Unordered feed (doc_id % 3 drops): whatever the arrival order,
    every distinct segment is kept exactly once, every occurrence gets
    a decision row, and order violations surface as late flags rather
    than double-keeps."""
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        segment_dedup_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, segment_dedup_stream(stream), "segdedup_unordered"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM segdedup_unordered")
    kept_per_sk = got.groupBy("sk").agg(
        F.sum(F.col("kept").cast("long")).alias("n_kept")
    )
    assert kept_per_sk.filter("n_kept != 1").count() == 0
    from jobinsight_data_pipeline_v2_spark.plans.corpus import segment_rows
    from jobinsight_data_pipeline_v2_spark.plans.text import _TOKENS

    segs = segment_rows(docs.select("doc_id", F.expr(_TOKENS).alias("t")))
    assert got.count() == segs.count()
    # late rows are exactly the occurrences that would have won under
    # batch order but arrived behind their segment's emitted winner —
    # they must be flagged, not re-kept
    assert got.filter("late AND kept").count() == 0


def test_streaming_cohort_matrix_equals_batch(spark, tmp_path):
    """The cohort-retention matrix as ONE streaming aggregation
    (chained aggs are unsupported, so the per-user weekly dedup folds
    into size(collect_set) per cell): complete-mode final state equals
    the batch gate's count columns row for row, with the cohort epoch
    pinned as config instead of derived by a corpus-min aggregate."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        cohort_stream,
    )

    flat, ev = _stage_stream_files(spark, tmp_path)
    anchor = ev.agg(F.min(F.to_date("ts"))).first()[0]
    stream = read_events_stream(spark, flat).drop("__b")
    q = run_stream_to_memory(
        spark, cohort_stream(stream, anchor), "cohort_test", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT cohort_week, week_offset, n_active FROM cohort_test"
    )
    expected = load_all()["cohort_retention"][0](spark, SF).select(
        "cohort_week", "week_offset", "n_active"
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0


def test_streaming_bloom_decontaminate_equals_direct(spark, tmp_path):
    """The Bloom-prefiltered streaming decontamination path: the
    one-row filter prunes each micro-batch's gram stream before the
    verify join, and — no false negatives — the per-doc output equals
    the direct batch aggregation row for row."""
    from jobinsight_data_pipeline_v2_spark.plans.text import _SHINGLE_RE
    from jobinsight_data_pipeline_v2_spark.streaming.packing import (
        bloom_decontaminate_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    is_bench = (F.col("doc_id") % 97) == 0
    bench_grams = (
        docs.filter(is_bench)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
                )
            ).alias("g"),
        )
        .localCheckpoint()
    )
    corpus = docs.filter(~is_bench)
    src, _ = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .filter(~is_bench)
    )
    q = run_stream_to_memory(
        spark,
        bloom_decontaminate_stream(stream, bench_grams, _SHINGLE_RE),
        "bloom_dec_test",
        mode="complete",
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM bloom_dec_test")
    expected = (
        corpus.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all("text", F.lit(_SHINGLE_RE), F.lit(1))
                )
            ).alias("g"),
        )
        .join(bench_grams, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_gram_hits"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0


def test_streaming_segment_dedup_ttl_bounds_state(spark, tmp_path):
    """TTL-bounded production path (VERDICT r4 #2): with ts_col +
    horizon the state uses EventTimeTimeout — a segment unseen for a
    horizon of event time is dropped from the store, and the next copy
    after expiry is RE-ADMITTED (kept again) exactly once. Segments
    inside the horizon still dedup exactly; final state holds only the
    segments live within the horizon, not every segment ever seen."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        segment_dedup_stream,
    )

    t = lambda s: datetime(2026, 1, 1, 0, 0, 0).replace(  # noqa: E731
        minute=s // 60, second=s % 60
    )
    S0 = "zero " * 7 + "zero"      # 8 tokens, appears once, must expire
    S1 = "alfa " * 7 + "alfa"      # re-appears after the horizon
    S2 = "bravo " * 7 + "bravo"
    S3 = "charlie " * 7 + "charlie"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, ts timestamp_ntz, text string"
    )
    drops = [
        mk([(1, t(0), S0), (2, t(0), S1), (3, t(0), S1)]),  # S1 dup in-batch
        mk([(4, t(10), S1)]),     # within horizon: still a dup
        mk([(5, t(120), S2)]),    # jump: watermark -> +90s after this
        mk([(6, t(130), S3)]),    # S0@+30s and S1@+40s expire HERE
        mk([(7, t(140), S1)]),    # after expiry: S1 re-admitted
    ]
    src = os.path.join(str(tmp_path), "seg_ttl")
    now = time.time()
    for b, d in enumerate(drops):
        _write_drop(d, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp_ntz, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        segment_dedup_stream(stream, ts_col="ts", horizon="30 seconds"),
        "segdedup_ttl",
    )
    q.awaitTermination(120)
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    got = {
        (r.doc_id, r.kept, r.late)
        for r in spark.sql("SELECT * FROM segdedup_ttl").collect()
    }
    assert got == {
        (1, True, False),   # S0 first occurrence
        (2, True, False),   # S1 first occurrence
        (3, False, False),  # S1 in-batch dup
        (4, False, False),  # S1 within-horizon dup
        (5, True, False),   # S2 first occurrence
        (6, True, False),   # S3 first occurrence
        (7, True, False),   # S1 RE-ADMITTED after expiry — the TTL trade
    }
    # bounded state: S0 and the first S1 incarnation expired; the store
    # holds only the horizon-live segments (S1 readmitted, S2, S3) —
    # NOT all four distinct segments ever seen
    assert state_rows == 3


def test_streaming_mixture_equals_batch(spark, tmp_path):
    """Stateless mixture sampling: the streamed union of per-batch
    keep/drop decisions equals the batch decision set exactly, and the
    complete-mode report equals the batch mixture_sample gate."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        mixture_decisions,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        mixture_report_stream,
        mixture_stream,
    )

    src, docs = _stage_doc_drops(
        spark, tmp_path, ["doc_id", "source", "n_chars"]
    )
    schema = "doc_id long, source string, n_chars long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(spark, mixture_stream(stream), "mix_decisions")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mix_decisions")
    expected = mixture_decisions(docs)
    assert got.exceptAll(expected).count() + expected.exceptAll(got).count() == 0

    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = run_stream_to_memory(
        spark, mixture_report_stream(stream2), "mix_report", mode="complete"
    )
    q2.awaitTermination(120)
    got2 = spark.sql("SELECT * FROM mix_report")
    expected2 = load_all()["mixture_sample"][0](spark, SF)
    assert (
        got2.exceptAll(expected2).count() + expected2.exceptAll(got2).count()
        == 0
    )


def test_streaming_bpe_pair_counts_equals_batch(spark, tmp_path):
    """The BPE pair-count statistic as a running streaming aggregation:
    the complete-mode final state equals the batch adjacent-pair
    histogram (pre-LIMIT) over the same documents."""
    from jobinsight_data_pipeline_v2_spark.operators.tokenizer import (
        adjacent_pair_counts,
    )
    from jobinsight_data_pipeline_v2_spark.plans.text import _TOKENS
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        bpe_pair_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, bpe_pair_stream(stream), "bpe_pairs", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM bpe_pairs")
    expected = adjacent_pair_counts(
        docs.select(F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s"))
    ).select(F.concat_ws(" ", "a", "b").alias("pair"), "n")
    assert got.exceptAll(expected).count() + expected.exceptAll(got).count() == 0


def test_streaming_classifier_equals_batch(spark, tmp_path):
    """Stateless in-plan model inference: the streamed union of
    per-batch classifier decisions equals the batch gate exactly."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        classifier_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(spark, classifier_stream(stream), "clf_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM clf_test")
    expected = load_all()["quality_classifier"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0


def test_streaming_ann_serving_equals_batch(spark, tmp_path):
    """Query stream vs static PQ index: the complete-mode best match
    per query equals the identical ADC plan run as a batch."""
    import time

    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        _pq_dims,
        pq_adc_scores,
        pq_encode,
        pq_query_luts,
        pq_train,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.serving import ann_stream

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    cb = pq_train(emb, n_sub=4, codes=8, max_iters=1).localCheckpoint()
    dims = _pq_dims(cb)
    coded = pq_encode(emb, cb, dims=dims).localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # two drops so the stream really runs multi-batch
    src = os.path.join(str(tmp_path), "ann_queries")
    now = time.time()
    for b in range(2):
        part = queries.filter(F.pmod("query_id", F.lit(2)) == b)
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("query_id long, embedding array<bigint>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, ann_stream(stream, coded, cb, dims=dims), "ann_test",
        mode="complete",
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ann_test")
    expected = (
        pq_adc_scores(coded, pq_query_luts(queries, cb, dims=dims), dims)
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(F.col("approx_sim"), (-F.col("id")).alias("negid"))
            ).alias("b")
        )
        .select(
            "query_id",
            (-F.col("b.negid")).alias("vec_id"),
            F.col("b.approx_sim").alias("approx_sim"),
        )
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0


def test_streaming_ann_serving_watermarked_state_eviction_path(spark, tmp_path):
    """Production configuration: state keyed by (arrival window,
    query_id) under a watermark, update mode. Each one-shot query gets
    exactly one update row, equal to the batch ADC best."""
    import time

    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        _pq_dims,
        pq_adc_scores,
        pq_encode,
        pq_query_luts,
        pq_train,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.serving import ann_stream

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    cb = pq_train(emb, n_sub=4, codes=8, max_iters=1).localCheckpoint()
    dims = _pq_dims(cb)
    coded = pq_encode(emb, cb, dims=dims).localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.to_timestamp(F.lit("2026-01-01 00:05:00")).alias("qts"),
    )
    src = os.path.join(str(tmp_path), "ann_wm_queries")
    now = time.time()
    for b in range(2):
        part = queries.filter(F.pmod("query_id", F.lit(2)) == b)
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema(
            "query_id long, embedding array<bigint>, qts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        ann_stream(stream, coded, cb, dims=dims, ts_col="qts"),
        "ann_wm_test",
        mode="update",
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT query_id, vec_id, approx_sim FROM ann_wm_test"
    )
    assert got.count() == got.select("query_id").distinct().count()
    expected = (
        pq_adc_scores(coded, pq_query_luts(queries, cb, dims=dims), dims)
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(F.col("approx_sim"), (-F.col("id")).alias("negid"))
            ).alias("b")
        )
        .select(
            "query_id",
            (-F.col("b.negid")).alias("vec_id"),
            F.col("b.approx_sim").alias("approx_sim"),
        )
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0


def test_streaming_ann_serving_ivfpq_probed_equals_batch(spark, tmp_path):
    """nprobe<all serving: the streamed best-of-probed-cells match per
    query equals the identical probe+ADC plan run as a batch (equi-join
    on cell_id — queries touch only their probed cells' members)."""
    import time

    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        _pq_dims,
        ivfpq_adc_scores,
        ivfpq_encode,
        ivfpq_probes,
        ivfpq_train,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.serving import (
        ann_stream_ivfpq,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    cents, cb = ivfpq_train(emb, kmeans_iters=1, pq_iters=1)
    cents = cents.localCheckpoint()
    cb = cb.localCheckpoint()
    dims = _pq_dims(cb)
    coded = ivfpq_encode(emb, cents, cb, dims=dims).localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    src = os.path.join(str(tmp_path), "ivfpq_queries")
    now = time.time()
    for b in range(2):
        part = queries.filter(F.pmod("query_id", F.lit(2)) == b)
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("query_id long, embedding array<bigint>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        ann_stream_ivfpq(stream, cents, coded, cb, nprobe=2, dims=dims),
        "ivfpq_serving_test",
        mode="complete",
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ivfpq_serving_test")
    expected = (
        ivfpq_adc_scores(
            coded, ivfpq_probes(queries, cents, cb, 2, dims), dims
        )
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(F.col("approx_sim"), (-F.col("id")).alias("negid"))
            ).alias("b")
        )
        .select(
            "query_id",
            (-F.col("b.negid")).alias("vec_id"),
            F.col("b.approx_sim").alias("approx_sim"),
        )
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0


def test_streaming_ann_serving_ivfpq_watermarked_path(spark, tmp_path):
    """Production configuration of the probed-cells serving twin:
    ts_col threads through probes/scores (the carry plumbing) and the
    (arrival window, query_id) watermarked agg emits one update row
    per one-shot query, equal to the batch probe+ADC best."""
    import time

    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        _pq_dims,
        ivfpq_adc_scores,
        ivfpq_encode,
        ivfpq_probes,
        ivfpq_train,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.serving import (
        ann_stream_ivfpq,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    cents, cb = ivfpq_train(emb, kmeans_iters=1, pq_iters=1)
    cents = cents.localCheckpoint()
    cb = cb.localCheckpoint()
    dims = _pq_dims(cb)
    coded = ivfpq_encode(emb, cents, cb, dims=dims).localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.to_timestamp(F.lit("2026-01-01 00:05:00")).alias("qts"),
    )
    src = os.path.join(str(tmp_path), "ivfpq_wm_queries")
    now = time.time()
    for b in range(2):
        part = queries.filter(F.pmod("query_id", F.lit(2)) == b)
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema(
            "query_id long, embedding array<bigint>, qts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        ann_stream_ivfpq(
            stream, cents, coded, cb, nprobe=2, dims=dims, ts_col="qts"
        ),
        "ivfpq_wm_test",
        mode="update",
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT query_id, vec_id, approx_sim FROM ivfpq_wm_test"
    )
    assert got.count() == got.select("query_id").distinct().count()
    expected = (
        ivfpq_adc_scores(
            coded, ivfpq_probes(queries, cents, cb, 2, dims), dims
        )
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(F.col("approx_sim"), (-F.col("id")).alias("negid"))
            ).alias("b")
        )
        .select(
            "query_id",
            (-F.col("b.negid")).alias("vec_id"),
            F.col("b.approx_sim").alias("approx_sim"),
        )
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0


def test_streaming_warc_equals_batch(spark, tmp_path):
    """WARC file-arrival stream (19th twin): records parsed out of the
    streaming binaryFile source — one file per micro-batch — equal the
    batch reader's rows exactly, and the HTML-payload adapter works
    unchanged on the streaming frame."""
    import gzip

    from jobinsight_data_pipeline_v2_spark.sources.warc_source import (
        read_warc_records,
        read_warc_stream,
        warc_html_payloads,
    )
    from tests.test_warc_source import _RESP_404, _RESP_A, _WARCINFO, _record, _http

    land = os.path.join(str(tmp_path), "warc_landing")
    os.makedirs(land)
    with open(os.path.join(land, "crawl-0.warc"), "wb") as f:
        f.write(_WARCINFO + _RESP_A)
    with open(os.path.join(land, "crawl-1.warc.gz"), "wb") as f:
        f.write(gzip.compress(_RESP_404))
    with open(os.path.join(land, "crawl-2.warc"), "wb") as f:
        f.write(
            _record(
                "response",
                "https://b.example/y",
                _http(b"<html>bravo</html>"),
            )
        )

    glob = os.path.join(land, "*")
    stream = read_warc_stream(spark, glob, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, stream, "warc_stream_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM warc_stream_test")
    expected = read_warc_records(spark, glob)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() == 4

    # the S2 adapter is a narrow projection: works on the streaming
    # frame itself (not just the memory-sink output)
    q2 = run_stream_to_memory(
        spark,
        warc_html_payloads(read_warc_stream(spark, glob)),
        "warc_html_stream_test",
    )
    q2.awaitTermination(120)
    pages = spark.sql("SELECT url, html FROM warc_html_stream_test").collect()
    assert {(r.url, r.html) for r in pages} == {
        ("https://a.example/x", "<html>alpha</html>"),
        ("https://b.example/y", "<html>bravo</html>"),
    }


def test_streaming_jsonl_equals_batch(spark, tmp_path):
    """JSONL corpus-drop stream (20th twin): typed docs AND quarantine
    streamed out of newly landed dump files equal the batch reader's
    partition exactly, one file per micro-batch."""
    import json

    from jobinsight_data_pipeline_v2_spark.sources.jsonl_source import (
        read_jsonl_docs,
        read_jsonl_stream,
    )

    land = os.path.join(str(tmp_path), "jsonl_landing")
    os.makedirs(land)
    dumps = [
        [
            json.dumps({"doc_id": 1, "text": "hello world", "lang": "en",
                        "source": "s0", "n_chars": 11}),
            "{broken",
        ],
        [
            json.dumps({"doc_id": 2, "text": "xin chào"}),
            json.dumps({"text": "no id"}),
        ],
        [
            json.dumps({"doc_id": 5}),
            json.dumps({"doc_id": 3, "text": "third dump"}),
        ],
    ]
    for i, lines in enumerate(dumps):
        with open(os.path.join(land, f"dump_{i}.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")

    docs_s, quar_s = read_jsonl_stream(spark, land, max_files_per_trigger=1)
    q1 = run_stream_to_memory(spark, docs_s, "jsonl_docs_stream")
    q2 = run_stream_to_memory(spark, quar_s, "jsonl_quar_stream")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    got_docs = spark.sql("SELECT * FROM jsonl_docs_stream")
    got_quar = spark.sql("SELECT * FROM jsonl_quar_stream")
    exp_docs, exp_quar = read_jsonl_docs(spark, land)
    for got, exp in ((got_docs, exp_docs), (got_quar, exp_quar)):
        sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
        assert sym == 0
    assert got_docs.count() == 3 and got_quar.count() == 3


def test_streaming_substring_dedup_equals_batch(spark, tmp_path):
    """Twin 21: ordered feed — the streamed per-gram keep/drop
    decisions reproduce the batch substring gate's redundant-gram
    marking exactly (dropped positions per doc == the batch dps list),
    with every occurrence decided and zero late flags."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        redundant_gram_positions,
        span_gram_rows,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        substring_dedup_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    src = os.path.join(str(tmp_path), "sub_ordered")
    now = time.time()
    bounds = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]
    for b, (lo, hi) in enumerate(bounds):
        part = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, substring_dedup_stream(stream), "subdedup_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM subdedup_test")
    assert got.filter("late").count() == 0
    toks = docs.select(
        "doc_id", F.expr("filter(split(text, ' '), t -> t != '')").alias("t")
    )
    assert got.count() == span_gram_rows(toks).count()
    dropped = (
        got.filter("NOT kept")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias("dps"))
    )
    expected = redundant_gram_positions(toks)
    sym = (
        dropped.exceptAll(expected).count()
        + expected.exceptAll(dropped).count()
    )
    assert sym == 0


def test_streaming_curation_decisions_equal_batch(spark, tmp_path):
    """Twin 22: the per-doc curation decision stream (exact-dedup
    state + stateless classifier/PII passthrough) equals the batch
    rule set row for row on an ordered feed: first_copy == min-doc_id
    per text hash, quality_keep == the classifier gate, ship == the
    conjunction; zero late flags."""
    import time

    from pyspark.sql import Window

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        classifier_score,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        curation_stream,
    )

    filler = " ".join(f"word{i} thing{i} the of and" for i in range(12))
    planted = spark.createDataFrame(
        [
            (900_001, f"contact me <a.b@mail.example.com> {filler}"),
            (900_002, f"tel 15-123-456-7890 alt 15-111-222-3333 {filler}"),
        ],
        "doc_id long, text string",
    )
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .unionByName(planted)
    )
    n = docs.count()
    src = os.path.join(str(tmp_path), "cur_ordered")
    now = time.time()
    half = n // 2
    base = docs.filter(F.col("doc_id") < 900_000)
    _write_drop(
        base.filter(F.col("doc_id") < half), tmp_path, src, "drop_0", now
    )
    _write_drop(
        base.filter(F.col("doc_id") >= half).unionByName(planted),
        tmp_path, src, "drop_1", now + 1,
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, curation_stream(stream), "curation_test"
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT doc_id, first_copy, quality_keep, ship, late,"
        " n_emails, n_phones FROM curation_test"
    )
    assert got.filter("late").count() == 0
    assert got.filter("ship != (first_copy AND quality_keep)").count() == 0
    # planted PII rides the passthrough columns with real counts
    pii_rows = {
        r.doc_id: (r.n_emails, r.n_phones)
        for r in got.filter("doc_id >= 900000").collect()
    }
    assert pii_rows == {900_001: (1, 0), 900_002: (0, 2)}
    from jobinsight_data_pipeline_v2_spark.plans.curation import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    # the batch rule set: classifier over REDACTED text (curate_corpus
    # stage order), dedup hash over raw text
    redacted = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("text"),
    )
    scored = classifier_score(redacted)  # n_tok > 0 population
    expected = (
        docs.join(scored.select("doc_id", "keep"), "doc_id")
        .withColumn("__sk", F.xxhash64("text"))
        .withColumn(
            "first_copy",
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("__sk")),
        )
        .select(
            "doc_id",
            "first_copy",
            F.col("keep").alias("quality_keep"),
            (F.col("first_copy") & F.col("keep")).alias("ship"),
            F.lit(False).alias("late"),
            F.size(
                F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))
            ).cast("long").alias("n_emails"),
            F.size(
                F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))
            ).cast("long").alias("n_phones"),
        )
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0, "decision stream != batch rules"
    assert got.count() == scored.count()


def test_streaming_substring_ttl_expiry_readmits(spark, tmp_path):
    """The substring twin's TTL wiring (watermark cast, __ts_ms carry,
    EventTimeTimeout) through the shared state machine: a gram unseen
    for the horizon expires and its next copy is RE-ADMITTED, exactly
    like the segment twin's proven behavior; state stays bounded."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        substring_dedup_stream,
    )

    t = lambda s: datetime(2026, 1, 1, 0, 0, 0).replace(  # noqa: E731
        minute=s // 60, second=s % 60
    )
    R1 = "a1 a2 a3 a4"  # one 4-gram per doc at l=4
    R2 = "b1 b2 b3 b4"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, ts timestamp_ntz, text string"
    )
    drops = [
        mk([(1, t(0), R1), (2, t(0), R1)]),   # dup within batch
        mk([(3, t(120), R2)]),                 # jump: watermark advances
        mk([(4, t(130), R2)]),                 # R1's gram expires here
        mk([(5, t(140), R1)]),                 # after expiry: re-admitted
    ]
    src = os.path.join(str(tmp_path), "sub_ttl")
    now = time.time()
    for b, d in enumerate(drops):
        _write_drop(d, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp_ntz, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        substring_dedup_stream(stream, l=4, ts_col="ts",
                               horizon="30 seconds"),
        "subdedup_ttl",
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.kept, r.late)
        for r in spark.sql("SELECT * FROM subdedup_ttl").collect()
    }
    assert got == {
        (1, True, False),
        (2, False, False),
        (3, True, False),
        (4, False, False),
        (5, True, False),  # re-admitted after the horizon — the TTL trade
    }
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] <= 2


def test_streaming_curation_ttl_branch_runs(spark, tmp_path):
    """curation_stream's TTL branch (watermarked dedup state with
    classifier/PII passthrough): decisions still chain ship ==
    first_copy AND quality_keep, a within-horizon duplicate is
    dropped, and the passthrough columns survive the stateful op."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        curation_stream,
    )

    filler = " ".join(f"word{i} thing{i} the of and" for i in range(12))
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, ts timestamp_ntz, text string"
    )
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    drops = [
        mk([(1, t0, filler), (2, t0, filler)]),  # exact dup pair
        mk([(3, t0.replace(second=10), "x " * 3)]),  # low quality
    ]
    src = os.path.join(str(tmp_path), "cur_ttl")
    now = time.time()
    for b, d in enumerate(drops):
        _write_drop(d, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp_ntz, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        curation_stream(stream, ts_col="ts", horizon="1 minute"),
        "curation_ttl",
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.sql(
        "SELECT * FROM curation_ttl").collect()}
    assert rows[1].first_copy and rows[1].quality_keep and rows[1].ship
    assert not rows[2].first_copy and not rows[2].ship  # within-horizon dup
    assert rows[2].quality_keep  # passthrough classifier verdict intact
    assert not rows[3].quality_keep and not rows[3].ship
    assert rows[3].first_copy


def test_streaming_substring_decontaminate_equals_batch(spark, tmp_path):
    """Twin 23: span-granular decontamination over a document stream —
    the complete-mode output (stream-static benchmark probe + per-doc
    watermark-free aggregation + the SHARED span_cut_columns) equals
    the batch substring_decontaminate gate row for row, including
    untouched documents and reassembled clean text."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _DECON_MOD,
        doc_token_arrays,
        span_gram_rows,
        substring_decontaminate,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        substring_decontaminate_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    bench_sks = span_gram_rows(
        doc_token_arrays(docs.filter(F.col("doc_id") % _DECON_MOD == 0))
    ).select("sk")
    corpus = docs.filter(F.col("doc_id") % _DECON_MOD != 0)
    src = os.path.join(str(tmp_path), "decon_stream")
    now = time.time()
    n = corpus.count()
    for b, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 10**9)]
    ):
        part = corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        substring_decontaminate_stream(stream, bench_sks),
        "decon_stream_test",
        mode="complete",
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM decon_stream_test")
    exp = substring_decontaminate(spark, SF)
    assert got.count() == exp.count()
    sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
    assert sym == 0


def test_streaming_substring_decontaminate_ttl_branch(spark, tmp_path):
    """The twin's watermarked branch: append-mode emission once the
    watermark passes a doc's event time, contaminated spans cut,
    untouched docs intact; a doc older than the advanced watermark is
    dropped (the documented late-data contract)."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        substring_decontaminate_stream,
    )

    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def t(s):
        return t0.replace(minute=s // 60, second=s % 60)

    bench = spark.createDataFrame(
        [(100, "s1 s2 s3 s4")], "doc_id long, text string"
    )
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        doc_token_arrays,
        span_gram_rows,
    )

    bench_sks = span_gram_rows(doc_token_arrays(bench), l=4).select("sk")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, ts timestamp_ntz, text string"
    )
    drops = [
        mk([(1, t(0), "a1 s1 s2 s3 s4 a2"), (2, t(1), "b1 b2 b3 b4 b5")]),
        mk([(3, t(300), "c1 c2")]),  # watermark jumps past docs 1-2
        mk([(4, t(2), "d1 s1 s2 s3 s4")]),  # LATE: dropped by watermark
        mk([(5, t(900), "flush flush2 flush3")]),  # flushes doc 3
    ]
    src = os.path.join(str(tmp_path), "decon_ttl")
    now = time.time()
    for b, d in enumerate(drops):
        _write_drop(d, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema(
            "doc_id long, ts timestamp_ntz, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        substring_decontaminate_stream(
            stream, bench_sks, l=4, ts_col="ts", horizon="30 seconds"
        ),
        "decon_ttl_test",
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_spans, r.n_removed, r.clean_text)
        for r in spark.sql("SELECT * FROM decon_ttl_test").collect()
    }
    assert got[1] == (1, 4, "a1 a2")  # span cut, flanks kept
    assert got[2] == (0, 0, "b1 b2 b3 b4 b5")  # untouched
    assert got[3] == (0, 0, "c1 c2")  # short doc, no grams, intact
    # a doc arriving after the watermark passed its event time still
    # emits — and emits CORRECTLY decontaminated: there is no cross-doc
    # state to corrupt, its group just finalizes immediately in the
    # arrival batch (contrast the first-arrival twins, where lateness
    # must be flagged because the state may have already decided)
    assert got[4] == (1, 4, "d1")


def test_streaming_budget_ranked_replay_equals_batch(spark, tmp_path):
    """Windowed running-budget admission (curation back half): on a
    RANKED replay — feed ordered by (score DESC, doc_id), the
    re-sharding use case — the stream's admitted set equals the batch
    select_token_budget cut exactly, cum_tokens included."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        select_token_budget,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        budget_stream_from_docs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    scored = docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("score"),
        F.size(toks).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0).localCheckpoint()
    total = scored.agg(F.sum("n_tokens").alias("t")).first()["t"]
    budget = 3 * int(total) // 10
    expected = select_token_budget(scored, budget).localCheckpoint()

    # ranked feed: 3 drops in (score desc, doc_id) order, one window
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    ranked = (
        docs.join(scored.select("doc_id", "score"), "doc_id")
        .orderBy(F.desc("score"), "doc_id")
        .collect()
    )
    n = len(ranked)
    src = os.path.join(str(tmp_path), "budget_ranked")
    now = time.time()
    for b in range(3):
        part = ranked[b * n // 3 : (b + 1) * n // 3] or ranked[-1:]
        frame = spark.createDataFrame(
            [(r["doc_id"], r["text"], t0) for r in part],
            "doc_id long, text string, ts timestamp_ntz",
        )
        _write_drop(frame, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        budget_stream_from_docs(stream, budget),
        "budget_ranked_test",
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT doc_id, score, n_tokens, cum_tokens "
        "FROM budget_ranked_test WHERE admitted"
    )
    exp = expected.select("doc_id", "score", "n_tokens", "cum_tokens")
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() + exp.exceptAll(got).count() == 0


def test_streaming_budget_deviation_and_window_isolation(spark, tmp_path):
    """The documented deviation, pinned as behavior: an early-admitted
    low-scorer cannot be revoked when a better doc arrives in a later
    micro-batch (batch ranking would have preferred the high-scorer);
    the first rejection CLOSES the window (prefix semantics, no
    knapsack back-fill); and each tumbling window owns an independent
    budget."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        budget_stream,
    )

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    t1 = datetime(2026, 1, 1, 0, 20, 0)  # a later 5-min window
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, score long, n_tokens long, ts timestamp_ntz"
    )
    drops = [
        mk([(1, 5, 6, t0)]),              # low score, eats most budget
        mk([(2, 99, 6, t0),               # high score: no room -> closes
            (3, 50, 1, t0)]),             # would fit, but window closed
        mk([(4, 1, 6, t1)]),              # fresh window, fresh budget
    ]
    src = os.path.join(str(tmp_path), "budget_dev")
    now = time.time()
    for b, d in enumerate(drops):
        _write_drop(d, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema(
            "doc_id long, score long, n_tokens long, ts timestamp_ntz"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        budget_stream(stream, budget=10, window="5 minutes",
                      horizon="1 minute"),
        "budget_dev_test",
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.admitted, r.cum_tokens)
        for r in spark.sql("SELECT * FROM budget_dev_test").collect()
    }
    assert got[1] == (True, 6)  # arrival-order admission
    assert got[2] == (False, None)  # the deviation: better doc loses
    assert got[3] == (False, None)  # prefix closure: no back-fill
    assert got[4] == (True, 6)  # independent budget per window
    ws = {
        r.window_start_ms
        for r in spark.sql("SELECT * FROM budget_dev_test").collect()
    }
    assert len(ws) == 2


def test_streaming_dsir_decisions_equal_batch(spark, tmp_path):
    """Twin 25: DSIR serving — the bucket-class model trained offline
    (dsir_train_classes) and compiled into the stream plan as an array
    literal must reproduce the batch dsir_resample gate's decisions
    row for row over a replayed raw-pool feed (stateless: order and
    batching cannot matter)."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _DSIR_TARGET_LANG,
        dsir_resample,
        dsir_train_classes,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        dsir_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    classes = dsir_train_classes(
        docs, F.col("lang") == _DSIR_TARGET_LANG
    )
    assert len(classes) == 256 and all(-8 <= c <= 8 for c in classes)
    raw = docs.filter(F.col("lang") != _DSIR_TARGET_LANG).select(
        "doc_id", "text"
    )
    n = raw.count()
    src = os.path.join(str(tmp_path), "dsir_stream")
    now = time.time()
    for b, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, 10**12)]
    ):
        part = raw.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, dsir_stream(stream, classes), "dsir_stream_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dsir_stream_test")
    exp = dsir_resample(spark, SF)
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() + exp.exceptAll(got).count() == 0


def test_dsir_stream_default_class_for_unseen_buckets(spark):
    """A model bucket never observed in training scores through the
    smoothed default class — checked by compiling a hand-built model
    where every bucket is the default and verifying the in-plan fold
    uses it (batch-mode execution of the same stateless plan)."""
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        dsir_stream,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_grams, r.score)
           for r in dsir_stream(docs, [2] * 256).collect()}
    # 3 unigrams + 2 bigrams = 5 grams, every one scoring the default
    assert got[1] == (5, 10)
    assert 2 not in got  # empty docs carry no grams and drop out


def test_streaming_perplexity_decisions_equal_batch(spark, tmp_path):
    """Twin 26: perplexity serving — the {bigram -> class} model
    trained offline (ppl_train_model) and compiled into the stream
    plan as a map literal must reproduce the batch
    lm_perplexity_buckets gate's decisions row for row over a
    replayed document feed (stateless: order and batching cannot
    matter)."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _DSIR_TARGET_LANG,
        _PPL_CLAMP,
        _PPL_V,
        lm_perplexity_buckets,
        ppl_train_model,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        perplexity_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    model = ppl_train_model(docs, F.col("lang") == _DSIR_TARGET_LANG)
    assert 0 < len(model) <= _PPL_V
    assert all(-_PPL_CLAMP <= c <= 0 for c in model.values())
    feed = docs.select("doc_id", "text")
    n = feed.count()
    src = os.path.join(str(tmp_path), "ppl_stream")
    now = time.time()
    for b, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, 10**12)]
    ):
        part = feed.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, perplexity_stream(stream, model), "ppl_stream_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ppl_stream_test")
    exp = lm_perplexity_buckets(spark, SF)
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() + exp.exceptAll(got).count() == 0


def test_perplexity_stream_oov_backoff_class(spark):
    """Bigrams absent from the compiled model score through the
    -CLAMP backoff class and are counted as OOV; in-vocab bigrams use
    their literal class (batch-mode execution of the same stateless
    plan)."""
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        perplexity_stream,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bi, r.n_oov, r.score)
        for r in perplexity_stream(docs, {"a b": -3}).collect()
    }
    # doc 1: bigrams 'a b' (class -3) + 'b c' (OOV, -16)
    assert got[1] == (2, 1, -19)
    # single-token and empty docs carry no bigrams and drop out
    assert 2 not in got and 3 not in got


def test_streaming_csv_equals_batch(spark, tmp_path):
    """CSV corpus-drop stream (twin 27): typed docs AND quarantine
    streamed out of newly landed dump files equal the batch reader's
    partition exactly, one file per micro-batch (the read_jsonl_stream
    device over the shared _partition_csv_lines parse)."""
    from jobinsight_data_pipeline_v2_spark.sources.csv_source import (
        read_csv_docs,
        read_csv_stream,
    )

    land = os.path.join(str(tmp_path), "csv_landing")
    os.makedirs(land)
    dumps = [
        ["1,hello world,en,s0,11", "abc,bad id,en,s0,5"],
        ["2,xin chao,vi,s1,8", ",no id,en,s1,5"],
        ["7,,en,s2,0", "3,third dump,en,s2,10"],
    ]
    for i, lines in enumerate(dumps):
        with open(os.path.join(land, f"dump_{i}.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")

    docs_s, quar_s = read_csv_stream(spark, land, max_files_per_trigger=1)
    q1 = run_stream_to_memory(spark, docs_s, "csv_docs_stream")
    q2 = run_stream_to_memory(spark, quar_s, "csv_quar_stream")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    got_docs = spark.sql("SELECT * FROM csv_docs_stream")
    got_quar = spark.sql("SELECT * FROM csv_quar_stream")
    exp_docs, exp_quar = read_csv_docs(spark, land)
    for got, exp in ((got_docs, exp_docs), (got_quar, exp_quar)):
        sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
        assert sym == 0
    assert got_docs.count() == 3 and got_quar.count() == 3


def test_streaming_gopher_equals_batch(spark, tmp_path):
    """Twin 28: stateless Gopher rule battery — the streamed union of
    per-batch flag rows equals the batch gopher_quality_flags gate
    exactly (shared gopher_flag_columns transform)."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        gopher_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(spark, gopher_stream(stream), "gopher_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM gopher_test")
    expected = load_all()["gopher_quality_flags"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0


def test_streaming_temperature_equals_batch(spark, tmp_path):
    """Twin 29: temperature-mixing decisions with batch-trained rates
    compiled into the plan — the streamed union of per-batch decision
    rows equals the batch temperature_decisions projection exactly,
    and its per-group keep aggregates equal the temperature_mixture
    gate (train/serve split parity)."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        temperature_decisions,
        temperature_rates,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        temperature_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id"])
    rates = temperature_rates(docs)
    assert rates and min(rates.values()) >= 0 and max(rates.values()) == 1000

    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, temperature_stream(stream, rates), "temperature_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM temperature_test")
    expected = temperature_decisions(docs, rates)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0

    # serving == gate: per-group kept counts match the oracle-gated row
    gate = {
        r["grp"]: (r["rate_permille"], r["n_kept"], r["kept_id_sum"])
        for r in load_all()["temperature_mixture"][0](spark, SF).collect()
    }
    served = {
        r["grp"]: (r["rate"], r["n_kept"], r["kept_id_sum"])
        for r in got.groupBy("grp")
        .agg(
            F.max("rate_permille").alias("rate"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("doc_id")).otherwise(0)).alias(
                "kept_id_sum"
            ),
        )
        .collect()
    }
    assert served == gate

    # unseen group -> rate 0, dropped (conservative serving contract)
    lone = spark.createDataFrame([(14,)], "doc_id long")  # grp 'd'
    rates_no_d = {k: v for k, v in rates.items() if k != "d"}
    row = temperature_decisions(lone, rates_no_d).collect()[0]
    assert row["rate_permille"] == 0 and not row["kept"]


def test_streaming_orc_equals_batch(spark, tmp_path):
    """ORC corpus-drop stream (twin 30): typed docs AND row-level
    quarantine streamed out of newly landed ORC files equal the batch
    reader's split exactly, one file per micro-batch (the
    read_csv_stream device with the shared _partition_orc_rows
    split)."""
    from jobinsight_data_pipeline_v2_spark.sources.orc_source import (
        read_orc_docs,
        read_orc_stream,
    )

    land = os.path.join(str(tmp_path), "orc_landing")
    schema = (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    drops = [
        [(1, "hello world", "en", "s0", 11), (2, "xin chao", "vi", "s0", 8)],
        [(3, None, "en", "s1", 0), (None, "no id", "en", "s1", 5)],
        [(4, "third drop", "de", "s2", 10)],
    ]
    for rows in drops:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).orc(land)

    docs_s, quar_s = read_orc_stream(spark, land, max_files_per_trigger=1)
    q1 = run_stream_to_memory(spark, docs_s, "orc_docs_stream")
    q2 = run_stream_to_memory(spark, quar_s, "orc_quar_stream")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    got_docs = spark.sql("SELECT * FROM orc_docs_stream")
    got_quar = spark.sql("SELECT * FROM orc_quar_stream")
    exp_docs, exp_quar = read_orc_docs(spark, land)
    for got, exp in ((got_docs, exp_docs), (got_quar, exp_quar)):
        sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
        assert sym == 0
    assert got_docs.count() == 3 and got_quar.count() == 2
    reasons = {r["reason"] for r in got_quar.collect()}
    assert reasons == {"missing:text", "missing:doc_id"}


def test_streaming_curation_normalize_option(spark, tmp_path):
    """curation_stream(normalize=True): a decomposed form variant of
    an already-seen composed doc is NOT a first copy — NFC runs before
    the dedup hash, so both forms share one state key (parity with
    curate_corpus(normalize=True))."""
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        curation_stream,
    )

    land = os.path.join(str(tmp_path), "cur_norm")
    os.makedirs(land)
    composed = "café story time " * 10
    decomposed = composed.replace("\u00e9", "e\u0301")
    assert composed != decomposed  # different forms, same NFC
    for i, rows in enumerate(
        [[(1, composed)], [(2, decomposed)], [(3, "other doc " * 10)]]
    ):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(land)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = run_stream_to_memory(
        spark, curation_stream(stream, normalize=True), "cur_norm_test"
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["first_copy"]
        for r in spark.sql("SELECT * FROM cur_norm_test").collect()
    }
    assert got[1] is True and got[3] is True
    assert got[2] is False, "form variant must hit the same state key"


def _stage_time_ordered_event_drops(spark, tmp_path, tag, n_drops=3):
    import time

    from pyspark.sql.window import Window as W

    ev = load_events(spark, SF)
    src = os.path.join(str(tmp_path), f"{tag}_flat")
    os.makedirs(src)
    per = ev.count() // n_drops + 1
    ranked = ev.withColumn(
        "__rk", F.row_number().over(W.orderBy("ts", "event_id"))
    ).withColumn("__b", ((F.col("__rk") - 1) / per).cast("int"))
    for b in range(n_drops):
        part = ranked.filter(F.col("__b") == b).drop("__rk", "__b")
        d = os.path.join(str(tmp_path), f"{tag}_d{b}")
        part.coalesce(1).write.parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    dst = os.path.join(src, f"drop_{b}.parquet")
                    os.rename(os.path.join(root, f), dst)
                    t = time.time() + b
                    os.utime(dst, (t, t))
    return src, ev


def test_streaming_scd2_equals_batch(spark, tmp_path):
    """Twin 31 (streaming SCD2 / CDC): with per-key time-ordered
    drops, the union of CLOSED versions equals the batch gate's
    expired rows exactly, and the per-key state holds precisely the
    batch gate's is_current versions (checked via each key's max
    emitted expiry == the current version's effective ts)."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.events import scd2_stream

    src, ev = _stage_time_ordered_event_drops(spark, tmp_path, "scd2")
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, scd2_stream(stream), "scd2_test")
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, attr_value, effective_us, expiry_us FROM scd2_test"
        " WHERE late = false"
    )
    assert spark.sql("SELECT * FROM scd2_test WHERE late = true").count() == 0
    batch = load_all()["scd2_user_history"][0](spark, SF)
    expected = batch.filter(F.col("expiry_ts").isNotNull()).select(
        "user_id",
        "attr_value",
        F.unix_micros(F.col("effective_ts").cast("timestamp")).alias(
            "effective_us"
        ),
        F.unix_micros(F.col("expiry_ts").cast("timestamp")).alias(
            "expiry_us"
        ),
    )
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    # current versions: for each user the batch's is_current effective
    # ts must equal the max expiry the stream stamped (the last close
    # handed the chain to the still-open current version)
    cur = {
        r["user_id"]: r["eff"]
        for r in batch.filter("is_current")
        .select(
            "user_id",
            F.unix_micros(F.col("effective_ts").cast("timestamp")).alias(
                "eff"
            ),
        )
        .collect()
    }
    last_close = {
        r["user_id"]: r["mx"]
        for r in got.groupBy("user_id")
        .agg(F.max("expiry_us").alias("mx"))
        .collect()
    }
    for u, mx in last_close.items():
        assert cur[u] == mx, u


def test_streaming_scd2_flags_late_rows(spark, tmp_path):
    """An event at or behind the key's current version is emitted
    late=true with NULL expiry and leaves the chain untouched."""
    import time

    from jobinsight_data_pipeline_v2_spark.streaming.events import scd2_stream

    land = os.path.join(str(tmp_path), "scd2_late")
    os.makedirs(land)
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    in_schema = (
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    )
    drops = [
        [(1, "2024-01-01 10:00:00", 7, "a", 0.0, None),
         (2, "2024-01-01 11:00:00", 7, "b", 0.0, None)],
        # behind the current version (11:00) -> late
        [(3, "2024-01-01 10:30:00", 7, "c", 0.0, None)],
        # on-time: closes 'b'
        [(4, "2024-01-01 12:00:00", 7, "d", 0.0, None)],
    ]
    for i, rows in enumerate(drops):
        df = spark.createDataFrame(rows, in_schema).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        )
        df.coalesce(1).write.parquet(os.path.join(land, f"d{i}"))
        flat = os.path.join(land, f"drop_{i}.parquet")
        for root, _, files in os.walk(os.path.join(land, f"d{i}")):
            for f in files:
                if f.endswith(".parquet"):
                    os.rename(os.path.join(root, f), flat)
        t = time.time() + i
        os.utime(flat, (t, t))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = run_stream_to_memory(spark, scd2_stream(stream), "scd2_late_test")
    q.awaitTermination(120)
    rows = {
        (r["attr_value"], r["late"]): r
        for r in spark.sql("SELECT * FROM scd2_late_test").collect()
    }
    assert ("a", False) in rows and rows[("a", False)]["expiry_us"] is not None
    assert ("c", True) in rows and rows[("c", True)]["expiry_us"] is None
    # the late row did not disturb the chain: 'b' closed at 12:00 by 'd'
    b = rows[("b", False)]
    assert b["expiry_us"] == 1704110400000000


def test_scd2_repair_inserts_late_rows(spark):
    """Closing the twin-31 loop: stream-flagged late rows merged into
    the maintained chain via scd2_repair equal the batch rebuild over
    ALL events — the mid-history insert re-stamps the surrounding
    expiries."""
    from jobinsight_data_pipeline_v2_spark.operators.scd2 import (
        scd2_rebuild,
        scd2_repair,
    )

    def T(s):
        return F.to_timestamp(F.lit(s))

    # maintained chain (what the stream produced): a@10 closed by b@11,
    # b@11 closed by d@12, d current
    hist = spark.createDataFrame(
        [(7, "a", "2024-01-01 10:00:00"),
         (7, "b", "2024-01-01 11:00:00"),
         (7, "d", "2024-01-01 12:00:00")],
        "user_id long, attr_value string, effective_ts string",
    ).withColumn("effective_ts", F.to_timestamp("effective_ts"))
    late = spark.createDataFrame(
        [(7, "c", "2024-01-01 10:30:00")],
        "user_id long, attr_value string, effective_ts string",
    ).withColumn("effective_ts", F.to_timestamp("effective_ts"))

    repaired = {
        r["attr_value"]: (str(r["expiry_ts"]), r["is_current"])
        for r in scd2_repair(hist, late).collect()
    }
    # 'a' now expires at the inserted 'c'; 'c' expires at 'b'
    assert repaired["a"] == ("2024-01-01 10:30:00", False)
    assert repaired["c"] == ("2024-01-01 11:00:00", False)
    assert repaired["b"] == ("2024-01-01 12:00:00", False)
    assert repaired["d"] == ("None", True)

    # equivalence: repair == rebuild over the full event set
    all_ev = hist.unionByName(late)
    a = scd2_repair(hist, late)
    b = scd2_rebuild(all_ev)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_attribution_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval join (the package's one double-watermarked
    join): with time-ordered drops, the union of emitted pairs must
    equal the attribution_pairs batch gate exactly."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        attribution_stream,
    )

    ev = load_events(spark, SF)
    src = os.path.join(str(tmp_path), "attr_flat")
    os.makedirs(src)
    rows = ev.count()
    per = rows // 3 + 1
    from pyspark.sql.window import Window as W

    ranked = ev.withColumn(
        "__rk", F.row_number().over(W.orderBy("ts", "event_id"))
    ).withColumn("__b", ((F.col("__rk") - 1) / per).cast("int"))
    for b in range(3):
        part = ranked.filter(F.col("__b") == b).drop("__rk", "__b")
        _write_drop(part, tmp_path, src, f"attr_drop_{b}", time.time() + b)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(
        spark, attribution_stream(stream), "attr_test"
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, view_id, purchase_id, view_ts, purchase_ts,"
        " purchase_value FROM attr_test"
    )
    expected = load_all()["attribution_pairs"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0, (
        f"stream/batch diverge: {got.count()} vs {expected.count()}"
    )


def test_attribution_stream_drops_late_purchase(spark, tmp_path):
    """Late-data contract (pinned as measured): state eviction lags the
    watermark by one micro-batch and join INPUTS are not pre-filtered
    by event time — so a late purchase arriving one batch after the
    watermark jump can still match not-yet-evicted view state, but
    once a further batch has committed the advanced watermark the view
    is evicted and the late purchase emits nothing (no phantom pairs
    against evicted state)."""
    import time

    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        attribution_stream,
    )

    src = os.path.join(str(tmp_path), "late_flat")
    os.makedirs(src)
    mk = (
        "SELECT CAST({eid} AS BIGINT) AS event_id,"
        " TIMESTAMP_NTZ'{ts}' AS ts, CAST(7 AS BIGINT) AS user_id,"
        " '{et}' AS event_type, CAST(10.0 AS DOUBLE) AS value,"
        " '' AS props"
    )
    batches = [
        # batch 0: the view + an in-horizon purchase (one pair emits)
        mk.format(eid=1, ts="2024-01-01 00:00:00", et="view")
        + " UNION ALL "
        + mk.format(eid=2, ts="2024-01-01 01:00:00", et="purchase"),
        # batch 1: far-future events push both watermarks way past the
        # view's eviction threshold (view_ts + horizon + delay)
        mk.format(eid=3, ts="2024-01-20 00:00:00", et="view")
        + " UNION ALL "
        + mk.format(eid=4, ts="2024-01-20 00:30:00", et="purchase"),
        # batch 2: one more batch so the jumped watermark actually
        # COMMITS an eviction pass (eviction lags one micro-batch);
        # >12h after batch 1 so no cross-batch pair forms
        mk.format(eid=6, ts="2024-01-21 00:00:00", et="view")
        + " UNION ALL "
        + mk.format(eid=7, ts="2024-01-21 00:30:00", et="purchase"),
        # batch 3: a LATE purchase inside batch 0's horizon — its view
        # is now evicted, so nothing emits
        mk.format(eid=5, ts="2024-01-01 02:00:00", et="purchase"),
    ]
    for b, sql in enumerate(batches):
        _write_drop(
            spark.sql(sql), tmp_path, src, f"late_drop_{b}", time.time() + b
        )
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(
        spark, attribution_stream(stream), "attr_late_test"
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT view_id, purchase_id FROM attr_late_test ORDER BY 1, 2"
    ).collect()
    assert [(r[0], r[1]) for r in got] == [(1, 2), (3, 4), (6, 7)], got


def test_fuzzy_match_stream_equals_batch(spark, tmp_path):
    """Online entity resolution (twin 33): dirty records replayed in
    three drops against the static clean master emit exactly the
    fuzzy_name_match gate's lookup rows."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        fuzzy_match_stream,
    )
    from jobinsight_data_pipeline_v2_spark.tables import load_table

    cust = load_table(spark, SF, "customer").filter(
        F.col("c_name").isNotNull()
    )
    clean = cust.select(F.col("c_name").alias("clean_name"))
    dirty = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("did"),
        F.expr(
            "concat(substring(c_name, 1, c_custkey % length(c_name)), "
            "substring(c_name, c_custkey % length(c_name) + 2))"
        ).alias("dirty_name"),
    )
    src = os.path.join(str(tmp_path), "fuzzy_flat")
    os.makedirs(src)
    for b in range(3):
        part = dirty.filter(F.pmod(F.col("did"), F.lit(3)) == b)
        _write_drop(part, tmp_path, src, f"fuzzy_drop_{b}", time.time() + b)
    stream = spark.readStream.schema("did long, dirty_name string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        run_stream_to_memory,
    )

    handle = run_stream_to_memory(
        spark, fuzzy_match_stream(stream, clean), "fuzzy_test"
    )
    handle.awaitTermination(120)
    got = spark.sql(
        "SELECT did, dirty_name, clean_name, dist FROM fuzzy_test"
    )
    expected = load_all()["fuzzy_name_match"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0, f"{got.count()} vs {expected.count()}"


def test_fuzzy_match_stream_watermarked_branch(spark, tmp_path):
    """The production (ts_col + horizon) branch: watermarked dedup
    emits the same match set on an on-time feed, and max_dist > 2
    raises (FastSS blocking is implemented for k in (1, 2) — r12)."""
    import time

    import pytest

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        fuzzy_match_stream,
    )

    clean = spark.sql(
        "SELECT explode(array('alpha', 'alphb', 'gamma')) AS clean_name"
    )
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_match_stream(clean, clean, max_dist=3)
    rows = [
        (1, "alph", "2024-01-01 00:00:00"),
        (2, "gamm", "2024-01-01 01:00:00"),
        (3, "zzzzz", "2024-01-02 00:00:00"),
    ]
    src = os.path.join(str(tmp_path), "fwm_flat")
    for b, (did, w, ts) in enumerate(rows):
        df = spark.sql(
            f"SELECT CAST({did} AS BIGINT) AS did, '{w}' AS dirty_name,"
            f" TIMESTAMP_NTZ'{ts}' AS ts"
        )
        _write_drop(df, tmp_path, src, f"fwm_drop_{b}", time.time() + b)
    stream = spark.readStream.schema(
        "did long, dirty_name string, ts timestamp_ntz"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        run_stream_to_memory,
    )

    q = run_stream_to_memory(
        spark,
        fuzzy_match_stream(stream, clean, ts_col="ts", horizon="1 hour"),
        "fwm_test",
    )
    q.awaitTermination(120)
    got = sorted(
        (r[0], r[1], r[2], r[3])
        for r in spark.sql(
            "SELECT did, dirty_name, clean_name, dist FROM fwm_test"
        ).collect()
    )
    assert got == [
        (1, "alph", "alpha", 1),
        (1, "alph", "alphb", 1),
        (2, "gamm", "gamma", 1),
    ], got


def test_cusum_stream_equals_batch_closed_days(spark, tmp_path):
    """Online CUSUM (twin 34): with k_ref/alarm trained offline
    (cusum_reference) and events replayed in time-ordered drops, the
    closed-day rows equal the batch gate on every day except the last
    (which stays open in state — the frontier contract), and nothing
    flags late on an ordered feed."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.plans.events import (
        cusum_reference,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        cusum_stream,
    )

    k_ref, alarm = cusum_reference(spark, SF)
    ev = load_events(spark, SF)
    src = os.path.join(str(tmp_path), "cusum_flat")
    rows = ev.count()
    per = rows // 3 + 1
    from pyspark.sql.window import Window as W

    ranked = ev.withColumn(
        "__rk", F.row_number().over(W.orderBy("ts", "event_id"))
    ).withColumn("__b", ((F.col("__rk") - 1) / per).cast("int"))
    for b in range(3):
        part = ranked.filter(F.col("__b") == b).drop("__rk", "__b")
        _write_drop(part, tmp_path, src, f"cusum_drop_{b}", time.time() + b)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = run_stream_to_memory(
        spark, cusum_stream(stream, k_ref, alarm), "cusum_test"
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT day, n_events, cusum, drift FROM cusum_test"
        " WHERE NOT late ORDER BY day"
    ).collect()
    assert spark.sql(
        "SELECT COUNT(*) FROM cusum_test WHERE late"
    ).first()[0] == 0
    batch = (
        load_all()["cusum_drift_days"][0](spark, SF).orderBy("day").collect()
    )
    assert len(got) == len(batch) - 1  # last day still open in state
    for g, b in zip(got, batch[:-1]):
        assert (g.day, g.n_events, g.cusum, g.drift) == (
            b.day,
            b.n_events,
            b.cusum,
            b.drift,
        ), (g, b)


def test_streaming_fim_equals_batch(spark, tmp_path):
    """Stateless FIM rewrite: the streamed union of per-batch rows
    equals the batch fim_transform gate exactly (pivots are pure
    functions of the row, so batch boundaries cannot move them)."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        fim_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(spark, fim_stream(stream), "fim_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM fim_test")
    expected = load_all()["fim_transform"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() > 0


def test_streaming_xml_equals_batch(spark, tmp_path):
    """XML corpus-drop stream (twin 36): typed docs AND quarantine
    streamed out of newly landed line-framed XML dumps equal the batch
    reader's partition exactly (the read_jsonl_stream device over the
    shared _partition_xml_lines parse)."""
    from jobinsight_data_pipeline_v2_spark.sources.xml_source import (
        read_xml_docs,
        read_xml_stream,
    )

    land = os.path.join(str(tmp_path), "xml_landing")
    os.makedirs(land)
    dumps = [
        ["<doc><doc_id>1</doc_id><text>hello &amp; bye</text><lang>en</lang></doc>",
         "<doc><doc_id>zz</doc_id><text>bad id</text></doc>"],
        ["<doc><doc_id>2</doc_id><text>xin chào</text></doc>",
         "<doc><text>no id</text></doc>"],
        ["<doc><doc_id>7</doc_id><lang>en</lang></doc>",
         "<doc><doc_id>3</doc_id><text>third dump</text></doc>"],
    ]
    for i, lines in enumerate(dumps):
        with open(os.path.join(land, f"dump_{i}.xml"), "w") as f:
            f.write("\n".join(lines) + "\n")

    docs_s, quar_s = read_xml_stream(spark, land, max_files_per_trigger=1)
    q1 = run_stream_to_memory(spark, docs_s, "xml_docs_stream")
    q2 = run_stream_to_memory(spark, quar_s, "xml_quar_stream")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    got_docs = spark.sql("SELECT * FROM xml_docs_stream")
    got_quar = spark.sql("SELECT * FROM xml_quar_stream")
    exp_docs, exp_quar = read_xml_docs(spark, land)
    for got, exp in ((got_docs, exp_docs), (got_quar, exp_quar)):
        sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
        assert sym == 0
    assert got_docs.count() == 3 and got_quar.count() == 3
    # the entity decode happened on the stream path too
    assert any(
        r.text == "hello & bye" for r in got_docs.collect()
    )


def test_streaming_url_dedup_equals_batch(spark, tmp_path):
    """URL frontier dedup (twin 37): streamed first-arrival decisions
    over the gate's synthesized URL disguises keep exactly the batch
    url_canonical_dedup keeper set (ord = doc_id ⇒ min doc_id wins
    within and across micro-batches on an ordered feed)."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _url_synth_sql,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        url_dedup_stream,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.expr(_url_synth_sql()).alias("url"))
    )
    src = os.path.join(str(tmp_path), "url_flat")
    # ordered drops: doc_id ranges per file so arrival order == doc_id
    import time

    now = time.time()
    n = docs.count()
    for b, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        part = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)

    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(spark, url_dedup_stream(stream), "url_dedup_t")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM url_dedup_t")
    batch = load_all()["url_canonical_dedup"][0](spark, SF)
    keepers = {r["keeper_doc_id"] for r in batch.collect()}
    kept = {r["doc_id"] for r in got.filter("kept").collect()}
    assert kept == keepers
    assert got.count() == n
    assert got.filter("late").count() == 0


def test_streaming_url_dedup_ttl_wiring(spark, tmp_path):
    """url_dedup_stream production path: ts_col+horizon wire the
    EventTimeTimeout branch (decisions unchanged on an ordered
    single-pass feed); mismatched args raise."""
    import pytest as _pytest

    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        url_dedup_stream,
    )

    with _pytest.raises(ValueError):
        url_dedup_stream(spark.range(1).select(F.lit("u").alias("url")), ts_col="ts")

    rows = [
        (1, "http://ex.com/a?utm_source=x", "2024-01-01 00:00:00"),
        (2, "HTTP://EX.COM:80/a", "2024-01-01 00:01:00"),
        (3, "http://ex.com/b", "2024-01-01 00:02:00"),
        # garbage must flow through the stateless malformed branch
        # (kept=false, NULL sk), never kill the micro-batch
        (4, "not a url at all", "2024-01-01 00:03:00"),
    ]
    src = os.path.join(str(tmp_path), "url_ttl")
    os.makedirs(src)
    df = spark.createDataFrame(
        rows, "doc_id long, url string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.coalesce(1).write.parquet(os.path.join(src, "d0"))
    stream = (
        spark.readStream.schema("doc_id long, url string, ts timestamp_ntz")
        .parquet(os.path.join(src, "*"))
    )
    q = run_stream_to_memory(
        spark, url_dedup_stream(stream, ts_col="ts", horizon="1 hour"),
        "url_ttl_t",
    )
    q.awaitTermination(120)
    out_rows = spark.sql("SELECT * FROM url_ttl_t").collect()
    got = {r.doc_id: r.kept for r in out_rows}
    # 1 and 2 canonicalize identically -> first wins; 3 is its own
    # page; 4 is unparseable -> visible, not kept, NULL frontier key
    assert got == {1: True, 2: False, 3: True, 4: False}
    assert [r.sk for r in out_rows if r.doc_id == 4] == [None]


def test_streaming_phrase_equals_batch(spark, tmp_path):
    """Phrase retrieval (twin 38): complete-mode final state over
    streamed document drops equals the batch phrase_match_stats gate
    row for row."""
    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        phrase_stream,
    )

    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, phrase_stream(stream), "phrase_test", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM phrase_test")
    expected = load_all()["phrase_match_stats"][0](spark, SF)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() == 3


def test_extract_stream_equals_batch(spark, tmp_path):
    """Crawl front door as a stream (39th twin): WARC landing prefix →
    HTML payloads → main-content extraction, row-for-row equal to the
    batch path over the same archives."""
    import pyspark.sql.functions as F

    from jobinsight_data_pipeline_v2_spark.sources.html_extract import (
        extract_main_text,
    )
    from jobinsight_data_pipeline_v2_spark.sources.warc_source import (
        read_warc_records,
        warc_html_payloads,
        write_warc_archive,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        extract_stream,
    )

    pages = [
        (
            f"https://e.org/{i}",
            "<html><body><nav><a href='/'>Home</a></nav>"
            f"<p>{' '.join(f'w{i}x{j}' for j in range(12))}</p>"
            "<footer>Copyright 2026 example rights here</footer>"
            "</body></html>",
        )
        for i in range(4)
    ]
    recs = spark.createDataFrame(
        pages, "target_uri string, payload string"
    ).repartition(2)
    land = str(tmp_path / "landing")
    write_warc_archive(
        recs, land, http_content_type="text/html; charset=utf-8"
    ).count()

    out = extract_stream(spark, f"{land}/*", max_files_per_trigger=1)
    assert out.isStreaming
    q = run_stream_to_memory(spark, out, "extract_stream_test")
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT url, text, n_blocks_kept, n_blocks_dropped "
        "FROM extract_stream_test"
    )
    batch = extract_main_text(
        warc_html_payloads(read_warc_records(spark, f"{land}/*"))
    ).select("url", "text", "n_blocks_kept", "n_blocks_dropped")
    assert got.exceptAll(batch).count() + batch.exceptAll(got).count() == 0
    rows = {r.url: r for r in got.collect()}
    assert len(rows) == 4
    assert all(r.n_blocks_kept == 1 and r.text.startswith("w") 
               for r in rows.values())


def test_streaming_avro_equals_batch(spark, tmp_path):
    """Avro corpus-drop stream (twin 40): typed docs AND quarantine
    streamed out of newly landed containers equal the batch reader's
    split exactly, one file per micro-batch — including a corrupt
    middle block whose tail RESYNCS (the shared _partition_containers
    decode, so batch == stream row for row)."""
    from jobinsight_data_pipeline_v2_spark.sources.avro_source import (
        DOC_AVRO_SCHEMA,
        encode_avro_container,
        read_avro_docs,
        read_avro_stream,
    )

    land = os.path.join(str(tmp_path), "avro_landing")
    os.makedirs(land)

    def mk(i, text, lang="en"):
        return {"doc_id": i, "text": text, "lang": lang, "source": "s",
                "n_chars": len(text) if text else 0}

    drops = [
        [mk(1, "hello world"), mk(2, "xin chao", "vi")],
        [mk(3, None), {"doc_id": None, "text": "no id", "lang": "en",
                       "source": "s", "n_chars": 5}],
        [mk(4, "third drop", "de"), mk(5, "fifth doc")],
    ]
    sync = b"stream-avro-sync"
    for i, rows in enumerate(drops):
        codec = "deflate" if i % 2 else "null"
        data = bytearray(
            encode_avro_container(rows, DOC_AVRO_SCHEMA, codec,
                                  rows_per_block=1, sync=sync)
        )
        if i == 2:
            # flip the FIRST data block's first payload byte (header
            # sync + 16, then 1-byte count + 1-byte size varints):
            # doc 4 quarantines as corrupt_block, doc 5 resyncs back
            data[data.index(sync) + 18] ^= 0xFF
        with open(os.path.join(land, f"drop_{i}.avro"), "wb") as f:
            f.write(bytes(data))

    docs_s, quar_s = read_avro_stream(spark, land, max_files_per_trigger=1)
    q1 = run_stream_to_memory(spark, docs_s, "avro_docs_stream")
    q2 = run_stream_to_memory(spark, quar_s, "avro_quar_stream")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    got_docs = spark.sql("SELECT * FROM avro_docs_stream")
    got_quar = spark.sql("SELECT * FROM avro_quar_stream")
    exp_docs, exp_quar = read_avro_docs(spark, land)
    for got, exp in ((got_docs, exp_docs), (got_quar, exp_quar)):
        sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
        assert sym == 0
    assert got_quar.count() >= 3  # 2 row-level + >=1 corrupt block
    reasons = {r["reason"] for r in got_quar.collect()}
    assert reasons == {"missing:text", "missing:doc_id", "corrupt_block"}


def test_streaming_tfrecord_equals_batch(spark, tmp_path):
    """TFRecord landing stream (twin 53): typed docs AND quarantine
    streamed out of newly landed files equal the batch reader's split
    exactly, one file per micro-batch — including a payload-damaged
    record (one-row quarantine, frames after it decode) and a
    framing-lost record whose tail stays unreachable in BOTH modes
    (the shared _partition_records decode, so batch == stream row for
    row)."""
    from jobinsight_data_pipeline_v2_spark.sources.tfrecord_source import (
        encode_example,
        frame_record,
        read_tfrecord_docs,
        read_tfrecord_stream,
    )

    land = os.path.join(str(tmp_path), "tfrec_landing")
    os.makedirs(land)

    def mk(i, text, lang="en"):
        return {"doc_id": i, "text": text, "lang": lang, "source": "s",
                "n_chars": len(text) if text else 0}

    damaged = bytearray(frame_record(encode_example(mk(10, "damaged"))))
    damaged[13] ^= 0xFF
    lost = bytearray(frame_record(encode_example(mk(20, "lost frame"))))
    lost[8] ^= 0xFF
    drops = [
        frame_record(encode_example(mk(1, "hello world")))
        + frame_record(encode_example(mk(2, "xin chao", "vi"))),
        frame_record(encode_example(mk(3, "before damage")))
        + bytes(damaged)
        + frame_record(encode_example(mk(4, "after damage"))),
        bytes(lost) + frame_record(encode_example(mk(5, "unreachable"))),
    ]
    for i, data in enumerate(drops):
        with open(os.path.join(land, f"drop_{i}.tfrecord"), "wb") as f:
            f.write(data)

    docs_s, quar_s = read_tfrecord_stream(spark, land,
                                          max_files_per_trigger=1)
    q1 = run_stream_to_memory(spark, docs_s, "tfrec_docs_stream")
    q2 = run_stream_to_memory(spark, quar_s, "tfrec_quar_stream")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    got_docs = spark.sql("SELECT * FROM tfrec_docs_stream")
    got_quar = spark.sql("SELECT * FROM tfrec_quar_stream")
    exp_docs, exp_quar = read_tfrecord_docs(spark, land)
    for got, exp in ((got_docs, exp_docs), (got_quar, exp_quar)):
        sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
        assert sym == 0
    assert {r.doc_id for r in got_docs.collect()} == {1, 2, 3, 4}
    assert {r["reason"] for r in got_quar.collect()} == {
        "bad_payload_crc", "framing_lost"
    }


def test_streaming_txlog_append_sink_exactly_once(spark, tmp_path):
    """Transaction-log append sink (twin 54): a file stream drained
    through TxLogAppendSink lands every micro-batch exactly once in
    the LogTable — and a foreachBatch REPLAY of an already-committed
    batch id (the failure-recovery path) is a no-op instead of a
    duplicate, because the commit's txn is checked log-side."""
    from jobinsight_data_pipeline_v2_spark.streaming.sinks import (
        TxLogAppendSink,
    )
    from jobinsight_data_pipeline_v2_spark.txlog import LogTable

    land = os.path.join(str(tmp_path), "tx_landing")
    os.makedirs(land)
    for i in range(3):
        spark.range(i * 10, i * 10 + 10).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        ).coalesce(1).write.mode("append").parquet(land)

    table = LogTable(spark, str(tmp_path / "txtable"), stats_cols=("k",))
    sink = TxLogAppendSink(table, app_id="test-stream-v1")
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = spark.read.parquet(land)
    got = table.read_snapshot()
    assert got.exceptAll(batch).count() + batch.exceptAll(got).count() == 0
    v_done = table.latest_version()
    hist = table.history()
    assert [h["txn"]["batch_id"] for h in hist] == list(range(len(hist)))

    # failure-recovery replay: re-deliver the LAST batch id by hand —
    # exactly what foreachBatch does after a crash mid-commit
    last_bid = hist[-1]["txn"]["batch_id"]
    sink(spark.range(100, 110).selectExpr("id as k", "id * 7 as v"),
         last_bid)
    assert table.latest_version() == v_done
    assert table.read_snapshot().count() == 30


def test_streaming_wordpiece_and_skipgram_projections(spark, tmp_path):
    """The wordpiece encode and skip-gram pair builders are claimed
    streaming-safe (narrow projections, vocab as a constant-folded map
    literal, no rule-10 checkpoint dependence) — prove it: the same
    transform over a file stream equals the batch result row for row."""
    from jobinsight_data_pipeline_v2_spark.operators.wordpiece import (
        wordpiece_encode,
        wordpiece_train,
    )

    land = os.path.join(str(tmp_path), "wp_landing")
    rows = [
        (1, "stream batch spark scan"),
        (2, "scan scan stream sort"),
        (3, "sort merge batch batch"),
    ]
    for i, r in enumerate(rows):
        spark.createDataFrame([r], "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(land)
    batch = spark.read.parquet(land)
    vocab = wordpiece_train(batch, n_merges=8)

    toks = "filter(split(text, ' '), t -> t != '')"

    def wp(df):
        syms = df.select(
            F.col("doc_id").alias("id"), F.expr(toks).alias("s")
        )
        return wordpiece_encode(syms, vocab).select(
            "id", F.expr("concat_ws('|', pieces)").alias("joined")
        )

    def sg(df):
        pairs_expr = (
            "flatten(transform(sequence(1, size(tk)), i -> "
            "transform(filter(sequence(greatest(1, i - 2), "
            "least(size(tk), i + 2)), j -> j != i), "
            "j -> struct(element_at(tk, i) AS c, "
            "element_at(tk, j) AS x))))"
        )
        return df.select(
            "doc_id", F.expr(toks).alias("tk")
        ).select("doc_id", F.expr(pairs_expr).alias("ps"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q1 = run_stream_to_memory(spark, wp(stream), "wp_stream")
    q2 = run_stream_to_memory(spark, sg(stream), "sg_stream")
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    for view, builder in (("wp_stream", wp), ("sg_stream", sg)):
        got = spark.sql(f"SELECT * FROM {view}")
        exp = builder(batch)
        sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
        assert sym == 0, view
    assert spark.sql("SELECT * FROM wp_stream").count() == 3


def test_streaming_span_corruption_equals_batch(spark, tmp_path):
    """span_corruption_texts(stream_safe=True) on a file stream equals
    the batch transform row for row — the T5 objective rewrite is a
    stateless narrow projection (twin of the fim_stream contract)."""
    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        span_corruption_texts,
    )

    land = os.path.join(str(tmp_path), "span_landing")
    rows = [
        (1, "a b c d e f g h i j k l m n o p q r"),
        (2, "one two three four five"),
        (3, "solo doc"),
    ]
    for r in rows:
        spark.createDataFrame([r], "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(land)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = run_stream_to_memory(
        spark, span_corruption_texts(stream, stream_safe=True),
        "span_stream",
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM span_stream")
    exp = span_corruption_texts(spark.read.parquet(land))
    sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
    assert sym == 0 and got.count() == 3


def test_streaming_span_guard_survives_pruning(spark, tmp_path):
    """Review r9 pass 2: the sentinel precondition must fire on a
    STREAM too — folded into n_tok, it survives column pruning even
    without the batch path's checkpoint."""
    from pyspark.sql.utils import StreamingQueryException

    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        span_corruption_texts,
    )

    land = os.path.join(str(tmp_path), "span_guard")
    spark.createDataFrame(
        [(1, "evil <X0> token doc")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(land)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(land)
    )
    q = run_stream_to_memory(
        spark, span_corruption_texts(stream, stream_safe=True),
        "span_guard_stream",
    )
    import pytest as _pytest

    with _pytest.raises(StreamingQueryException, match="sentinel"):
        q.awaitTermination(120)
        raise AssertionError("guard did not fire")


def test_streaming_hll_window_registers_equal_batch(spark, tmp_path):
    """Twin 42: per-window HLL registers built AS a streaming
    aggregate equal the batch registers slot-for-slot, and the
    estimates derived from the streamed registers match the batch
    estimates exactly (same registers → same floats)."""
    import datetime as dt

    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        hll_window_registers,
    )

    land = os.path.join(str(tmp_path), "hll_landing")
    base = dt.datetime(2026, 3, 1, 10, 0, 0)
    rows = []
    for i in range(300):
        rows.append(
            (i, base + dt.timedelta(minutes=(i * 7) % 150), i % 40)
        )
    for chunk in (rows[:120], rows[120:]):
        spark.createDataFrame(
            chunk, "event_id long, ts timestamp, user_id long"
        ).coalesce(1).write.mode("append").parquet(land)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = run_stream_to_memory(
        spark, hll_window_registers(stream), "hll_reg_stream",
        mode="complete",
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hll_reg_stream")

    batch = spark.read.parquet(land).withColumn(
        "win", F.window(F.col("ts").cast("timestamp"), "1 hour")
    )
    exp = hll_registers(batch, "user_id", ("win",))
    sym = got.exceptAll(exp).count() + exp.exceptAll(got).count()
    assert sym == 0
    # identical registers → bit-identical estimates
    e_got = {
        (r.win.start, round(r.hll_est, 9))
        for r in hll_estimate(got, ("win",)).collect()
    }
    e_exp = {
        (r.win.start, round(r.hll_est, 9))
        for r in hll_estimate(exp, ("win",)).collect()
    }
    assert e_got == e_exp and len(e_got) >= 2


def test_streaming_license_labels_equal_batch(spark, tmp_path):
    """Stateless license classification: the streamed union of
    per-batch labels equals the batch projection row for row."""
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        license_label_rows,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        license_stream,
    )

    rows = [
        (1, "permission hereby granted sublicense noninfringement body"),
        (2, "licensed apache compliance governing permissions more text"),
        (3, "gnu general public license foundation words"),
        (4, "no header at all just words " * 20),
        (5, "permission hereby granted but only three markers"),
    ]
    src = str(tmp_path / "lic_src")
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    batch.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(spark, license_stream(stream), "lic_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM lic_test")
    expected = license_label_rows(batch)
    assert got.exceptAll(expected).count() + expected.exceptAll(got).count() == 0
    labels = {r["doc_id"]: r["license"] for r in got.collect()}
    assert labels == {1: "mit", 2: "apache", 3: "gpl", 4: "none", 5: "none"}


def test_streaming_bm25_scores_equal_batch_gate(spark, tmp_path):
    """BM25 serving on a document stream (model trained batch-side and
    compiled into the plan) must equal the batch gate's per-doc
    scores: every gate hit row matches exactly, and the stream's extra
    rows are all zero-term docs."""
    from jobinsight_data_pipeline_v2_spark.plans.text import (
        _SEARCH_TERMS,
        bm25_train,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        bm25_stream,
    )

    weights, tt, nn = bm25_train(spark, SF)
    src, docs = _stage_doc_drops(spark, tmp_path, ["doc_id", "text"])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, bm25_stream(stream, weights, tt, nn), "bm25_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM bm25_test")
    # expected: the same scoring run as a batch projection
    expected = bm25_stream(docs.select("doc_id", "text"), weights, tt, nn)
    assert got.exceptAll(expected).count() + expected.exceptAll(got).count() == 0
    # and the batch GATE's top rows (which include training in-plan)
    # must agree with the compiled-model scores on their doc_ids
    from jobinsight_data_pipeline_v2_spark.plans import load_all

    gate = load_all()["bm25_search_ranked"][0](spark, SF)
    joined = gate.join(got, "doc_id").select(
        gate["score_ppm"].alias("gs"),
        got["score_ppm"].alias("ss"),
        gate["n_terms"].alias("gn"),
        got["n_terms"].alias("sn"),
    )
    rows = joined.collect()
    assert len(rows) == gate.count()
    assert all(r["gs"] == r["ss"] and r["gn"] == r["sn"] for r in rows)


def test_streaming_semantic_dedup_equals_batch(spark, tmp_path):
    """Twin 47: ordered feed — the streamed per-doc keep/drop
    decisions equal the batch semantic stage's (within-cell integer
    cosine >= 9/10, first-arrival keep-min), with zero late flags.
    Permutation dups share the token multiset, hence the exact vector
    and cell, and are invisible to every surface-dedup twin."""
    import time

    from jobinsight_data_pipeline_v2_spark.corpus_pipeline import (
        _batch_doc_vectors,
        _sem_hit_docs,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        semantic_dedup_stream,
    )

    def text(i, n=30):
        return " ".join(f"w{i}x{j}" for j in range(n))

    def rev(i):
        return " ".join(reversed(text(i).split()))

    rows = (
        [(i, text(i)) for i in range(0, 8)]
        + [(20, rev(3)), (21, rev(5)), (22, text(40))]
        # 30 is a ROTATION of text(3) — a third distinct permutation,
        # dropped against whichever copy arrived first
        + [(30, " ".join(text(3).split()[5:] + text(3).split()[:5])),
           (31, text(41))]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = os.path.join(str(tmp_path), "sem_ordered")
    now = time.time()
    for b, (lo, hi) in enumerate([(0, 10), (10, 25), (25, 100)]):
        part = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, semantic_dedup_stream(stream), "semdedup_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM semdedup_test")
    assert got.count() == len(rows)
    assert got.filter("late").count() == 0
    stream_kept = {r.doc_id for r in got.filter("kept").collect()}
    # batch expectation: the lifecycle stage's exact logic over the
    # whole set at once
    cellv = _batch_doc_vectors(docs).localCheckpoint(eager=False)
    a = cellv.select(
        F.col("doc_id").alias("__a_id"), "cell",
        F.col("vec").alias("a_vec"),
    )
    b = cellv.select("doc_id", "cell", F.col("vec").alias("b_vec"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("__a_id") < F.col("doc_id"))
        .select("doc_id", "a_vec", "b_vec")
    )
    hits = {r.doc_id for r in _sem_hit_docs(pairs).collect()}
    batch_kept = {i for i, _ in rows} - hits
    assert stream_kept == batch_kept
    # the planted permutation dups dropped; their targets survived
    assert {20, 21, 30} & stream_kept == set()
    assert {3, 5} <= stream_kept


def test_streaming_semantic_dedup_ttl_readmits_after_horizon(
    spark, tmp_path
):
    """Production TTL branch: a cell unseen for the horizon expires
    and the next permutation copy is RE-ADMITTED; within-horizon
    copies still drop; state is bounded by live cells."""
    import time
    from datetime import datetime

    from jobinsight_data_pipeline_v2_spark.corpus_pipeline import (
        _batch_doc_vectors,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        semantic_dedup_stream,
    )

    t = lambda s: datetime(2026, 1, 1, 0, 0, 0).replace(  # noqa: E731
        minute=s // 60, second=s % 60
    )
    T0 = "apple banana cherry durian elder fig grape"
    P0 = "grape fig elder durian cherry banana apple"
    T1 = "hotel india juliet kilo lima mike november"
    T2 = "oscar papa quebec romeo sierra tango uniform"
    # precondition: the three base texts live in THREE distinct cells —
    # otherwise T1/T2 arrivals would keep T0's cell alive past the
    # horizon and the re-admission below could not fire (deterministic:
    # the cell is a pure function of the text)
    cells = {
        r.doc_id: r.cell
        for r in _batch_doc_vectors(
            spark.createDataFrame(
                [(0, T0), (1, T1), (2, T2)], "doc_id long, text string"
            )
        ).collect()
    }
    assert len(set(cells.values())) == 3, (
        f"fixture texts collide in SRP cells ({cells}) — pick others"
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, ts timestamp_ntz, text string"
    )
    drops = [
        mk([(1, t(0), T0), (2, t(0), P0)]),  # dup in-batch
        mk([(3, t(10), P0)]),                # within horizon: dup
        mk([(4, t(120), T1)]),               # jump: watermark advances
        mk([(5, t(130), T2)]),               # T0's cell expires here
        mk([(6, t(140), P0)]),               # after expiry: re-admitted
    ]
    src = os.path.join(str(tmp_path), "sem_ttl")
    now = time.time()
    for b, d in enumerate(drops):
        _write_drop(d, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema(
            "doc_id long, ts timestamp_ntz, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark,
        semantic_dedup_stream(stream, ts_col="ts", horizon="30 seconds"),
        "semdedup_ttl",
    )
    q.awaitTermination(120)
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    got = {
        (r.doc_id, r.kept, r.late)
        for r in spark.sql("SELECT * FROM semdedup_ttl").collect()
    }
    assert got == {
        (1, True, False),
        (2, False, False),
        (3, False, False),
        (4, True, False),
        (5, True, False),
        (6, True, False),  # RE-ADMITTED — the TTL trade
    }
    # T0's first incarnation expired; live cells: readmitted + T1 + T2
    assert state_rows == 3


def test_streaming_calibration_equals_batch(spark, tmp_path):
    """Twin 48: the complete-mode reliability buckets equal the batch
    calibration_ece gate's per-bucket rows column for column once all
    documents have arrived."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        calibration_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    src = os.path.join(str(tmp_path), "calib")
    now = time.time()
    for b, (lo, hi) in enumerate([(0, n // 2), (n // 2, n + 1)]):
        part = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, calibration_stream(stream), "calib_test", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT bucket, n, avg_conf_ppm, acc_ppm, gap_ppm FROM calib_test"
    )
    expected = (
        load_all()["calibration_ece"][0](spark, SF)
        .filter("bucket >= 0")
        .select("bucket", "n", "avg_conf_ppm", "acc_ppm", "gap_ppm")
    )
    sym = (
        got.exceptAll(expected).count()
        + expected.exceptAll(got).count()
    )
    assert sym == 0


def test_streaming_mbox_equals_batch(spark, tmp_path):
    """MBOX landing stream (twin 49): messages parsed out of newly
    landed mailbox files — one file per micro-batch — equal the batch
    reader's rows exactly, quarantine included."""
    from jobinsight_data_pipeline_v2_spark.sources.mbox_source import (
        read_mbox_messages,
        read_mbox_stream,
    )
    from tests.test_mbox_source import _msg

    land = os.path.join(str(tmp_path), "mbox_landing")
    os.makedirs(land)
    with open(os.path.join(land, "a.mbox"), "wb") as f:
        f.write(b"\n".join([_msg(0, "alpha"), _msg(1, "bravo")]))
    with open(os.path.join(land, "b.mbox"), "wb") as f:
        f.write(_msg(2, "no id", drop="Message-ID"))
    with open(os.path.join(land, "c.mbox"), "wb") as f:
        f.write(b"not a mailbox")

    glob = os.path.join(land, "*")
    stream = read_mbox_stream(spark, glob, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, stream, "mbox_stream_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mbox_stream_test")
    expected = read_mbox_messages(spark, glob)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() == 4
    assert got.filter("reason IS NOT NULL").count() == 2


def test_streaming_ab_test_equals_batch(spark, tmp_path):
    """Twin 50: the complete-mode per-arm conversion counters equal
    the batch ab_test_proportions gate's arm rows once all events have
    arrived."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans import load_all
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        ab_test_stream,
    )
    from jobinsight_data_pipeline_v2_spark.tables import load_events

    events = load_events(spark, SF).select("event_id", "value")
    n = events.count()
    src = os.path.join(str(tmp_path), "ab_events")
    now = time.time()
    for b, (lo, hi) in enumerate([(0, n // 2), (n // 2, n + 1)]):
        part = events.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, ab_test_stream(stream), "ab_test", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT arm, n, conv, rate_ppm FROM ab_test")
    expected = (
        load_all()["ab_test_proportions"][0](spark, SF)
        .filter("arm >= 0")
        .select("arm", "n", "conv", "rate_ppm")
    )
    sym = (
        got.exceptAll(expected).count()
        + expected.exceptAll(got).count()
    )
    assert sym == 0


def test_streaming_archive_equals_batch(spark, tmp_path):
    """Archive landing stream (twin 51): members parsed out of newly
    landed ZIP/TAR containers — one file per micro-batch — equal the
    batch reader's rows exactly, quarantine included."""
    from tests.test_archive_source import _tar_bytes, _zip_bytes

    from jobinsight_data_pipeline_v2_spark.sources.archive_source import (
        read_archive_members,
        read_archive_stream,
    )

    land = os.path.join(str(tmp_path), "arch_landing")
    os.makedirs(land)
    with open(os.path.join(land, "a.zip"), "wb") as f:
        f.write(_zip_bytes([("x.txt", b"alpha"), ("y.txt", b"bravo")]))
    with open(os.path.join(land, "b.tar.gz"), "wb") as f:
        f.write(_tar_bytes([("z.txt", b"charlie")], mode="w:gz"))
    with open(os.path.join(land, "c.zip"), "wb") as f:
        f.write(b"not an archive")

    glob = os.path.join(land, "*")
    stream = read_archive_stream(spark, glob, max_files_per_trigger=1)
    q = run_stream_to_memory(spark, stream, "archive_stream_test")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM archive_stream_test")
    expected = read_archive_members(spark, glob)
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0
    assert got.count() == 4
    assert got.filter("reason IS NOT NULL").count() == 1


def test_streaming_mann_whitney_equals_batch(spark, tmp_path):
    """Twin 52: the complete-mode distinct-value tie counts equal the
    batch mann_whitney_arms value aggregation once all events have
    arrived."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans.events import (
        mw_value_counts,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        mann_whitney_stream,
    )
    from jobinsight_data_pipeline_v2_spark.tables import load_events

    events = load_events(spark, SF).select("event_id", "value")
    n = events.count()
    src = os.path.join(str(tmp_path), "mw_events")
    now = time.time()
    for b, (lo, hi) in enumerate([(0, n // 2), (n // 2, n + 1)]):
        part = events.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        _write_drop(part, tmp_path, src, f"drop_{b}", now + b)
    stream = (
        spark.readStream.schema("event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_stream_to_memory(
        spark, mann_whitney_stream(stream), "mw_stream", mode="complete"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mw_stream")
    expected = mw_value_counts(events)
    sym = (
        got.exceptAll(expected).count()
        + expected.exceptAll(got).count()
    )
    assert sym == 0 and got.count() > 0


def test_fuzzy_match_stream_k2_equals_batch_lookup(spark, tmp_path):
    """r12: max_dist=2 routes FastSS k=2 keys through the same
    stream-static join — a two-deletion probe replayed as a stream
    finds its source (and every other clean name within distance 2)
    exactly like a batch k=2 lookup over the same frames."""
    import time

    from jobinsight_data_pipeline_v2_spark.plans.core import (
        fastss_key_rows,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.curation import (
        fuzzy_match_stream,
    )
    from jobinsight_data_pipeline_v2_spark.streaming.events import (
        run_stream_to_memory,
    )
    from jobinsight_data_pipeline_v2_spark.tables import load_table

    cust = load_table(spark, SF, "customer").filter(
        F.col("c_name").isNotNull()
    )
    clean = cust.select(F.col("c_name").alias("clean_name"))
    dirty = cust.filter(F.col("c_custkey") % 15 == 0).select(
        F.col("c_custkey").alias("did"),
        F.expr(
            "concat(substring(c_name, 1, 5), substring(c_name, 8))"
        ).alias("dirty_name"),
    )
    src = os.path.join(str(tmp_path), "fuzzy2_flat")
    os.makedirs(src)
    for b in range(2):
        part = dirty.filter(F.pmod(F.col("did"), F.lit(2)) == b)
        _write_drop(part, tmp_path, src, f"fuzzy2_drop_{b}", time.time() + b)
    stream = spark.readStream.schema("did long, dirty_name string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    handle = run_stream_to_memory(
        spark, fuzzy_match_stream(stream, clean, max_dist=2), "fuzzy2_test"
    )
    handle.awaitTermination(120)
    got = spark.sql(
        "SELECT did, dirty_name, clean_name, dist FROM fuzzy2_test"
    )
    # batch mirror of the same k=2 lookup
    ck = fastss_key_rows(clean, "clean_name", k=2)
    dk = fastss_key_rows(dirty, "dirty_name", k=2)
    expected = (
        dk.join(ck, "kh")
        .select("did", "dirty_name", "clean_name")
        .distinct()
        .withColumn(
            "dist",
            F.levenshtein("dirty_name", "clean_name").cast("long"),
        )
        .filter(F.col("dist") <= 2)
    )
    assert expected.filter(F.col("dist") == 2).count() > 0
    sym = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym == 0, f"{got.count()} vs {expected.count()}"
