"""Streaming sequence packing: the incremental twin of
plans/sampling.sequence_pack.

Batch packing assigns each document to the fixed-capacity training
sequence its first token lands in, via sharded prefix sums. Streaming,
the prefix sum becomes PER-SHARD STATE: one running token total per
shard carried across micro-batches (two scalars of state per shard —
never a buffer of documents). Same ordered-arrival assumption as
asof_stream: documents reach a shard in doc_id order (the guarantee a
doc_id-keyed Kafka partition provides); within a batch the sort
enforces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

_PACK_OUT_SCHEMA = StructType(
    [
        StructField("shard", LongType(), True),
        StructField("doc_id", LongType(), True),
        StructField("n_tokens", LongType(), True),
        StructField("pack_id", LongType(), True),
        StructField("late", BooleanType(), True),
    ]
)

_PACK_STATE = "cum LONG, last_doc LONG"


def pack_stream(
    docs: DataFrame, capacity: int = 512, n_shards: int = 8
) -> DataFrame:
    """(shard, doc_id, n_tokens, pack_id, late): streaming concat-and-
    chunk assignment. ``docs`` needs (doc_id, text); token counts are
    computed narrowly before the stateful operator so the pandas
    function only does integer bookkeeping.

    State per shard: the running token total plus the doc_id
    high-water mark. A doc that arrives at or behind the mark violates
    the ordered-arrival assumption; assigning it would silently shift
    every subsequent pack, so it is emitted as ``late=true`` with a
    NULL pack_id and excluded from the running total — already-emitted
    and future assignments stay exactly what the ordered stream
    produces, and the violation is visible downstream (ADVICE r3). On
    an ordered stream every row is ``late=false``.
    """
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        (shard,) = key
        cum, last_doc = state.get if state.exists else (0, None)
        out = []
        # concat ALL Arrow chunks before the sort: a micro-batch larger
        # than arrow.maxRecordsPerBatch arrives as several chunks with
        # no cross-chunk ordering, and sorting each independently would
        # flag in-batch docs as late against the earlier chunk's ids
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        for doc_id, n_tokens in zip(pdf["doc_id"], pdf["n_tokens"]):
            if last_doc is not None and doc_id <= last_doc:
                out.append((shard, int(doc_id), int(n_tokens), None, True))
                continue
            out.append(
                (shard, int(doc_id), int(n_tokens), cum // capacity, False)
            )
            cum += int(n_tokens)
            last_doc = int(doc_id)
        state.update((cum, last_doc))
        if out:
            yield pd.DataFrame(
                out, columns=["shard", "doc_id", "n_tokens", "pack_id", "late"]
            )

    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.size(F.expr("filter(split(text, ' '), t -> t != '')"))
        .cast("long")
        .alias("n_tokens"),
    )
    return sized.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=_PACK_OUT_SCHEMA,
        stateStructType=_PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# stream-static join: streaming corpus vs static benchmark gram set
# (the incremental form of plans/curation.decontaminate's corpus side)
# ---------------------------------------------------------------------------


def decontaminate_stream(
    docs: DataFrame, bench_grams: DataFrame, shingle_re: str
) -> DataFrame:
    """(doc_id, n_gram_hits, n_bench_docs): per streaming corpus doc,
    its 4-gram overlap with a STATIC benchmark gram table — the same
    columns, exactly, as the batch gate (plans/curation.decontaminate
    corpus side), so stream and batch outputs are comparable row for
    row.

    Structured Streaming's stream-static join: the benchmark side is a
    plain (static) DataFrame that broadcasts into every micro-batch —
    no streaming state at all, because the static side carries the
    whole join context. This is the online form of corpus
    decontamination: documents are checked as they arrive, the
    benchmark set updates only between restarts. bench_grams:
    (bench_id, g) distinct grams per benchmark doc.

    n_bench_docs is EXACT: streaming aggregation forbids
    count_distinct, so it is size(collect_set(bench_id)) — the set is
    bounded by the number of benchmark docs a single corpus doc
    overlaps (small by construction). The previous
    approx_count_distinct emitted an HLL estimate under a name that
    promised an exact count (ADVICE r3).
    """
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all("text", F.lit(shingle_re), F.lit(1))
            )
        ).alias("g"),
    )
    # the static side re-evaluates every micro-batch — materialize the
    # bench gram derivation once (same as bloom_decontaminate_stream)
    return (
        grams.join(F.broadcast(bench_grams.localCheckpoint()), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_gram_hits"),
            F.size(F.collect_set("bench_id")).cast("long").alias("n_bench_docs"),
        )
    )


def bloom_decontaminate_stream(
    docs: DataFrame, bench_grams: DataFrame, shingle_re: str
) -> DataFrame:
    """(doc_id, n_gram_hits, n_bench_docs): decontaminate_stream
    through the Bloom-prefiltered path (the at-scale shape of
    plans/curation.bloom_decontaminate, streamed): the static bench
    gram set folds ONCE into a one-row Bloom bit-array, each
    micro-batch's gram stream drops every filter-rejected gram with a
    narrow bit probe, and only the surviving sliver reaches the exact
    verify join. Bloom filters have no false negatives, so the output
    equals decontaminate_stream's row for row (proven in tests) —
    the filter only cuts join input, never results. Stateless:
    stream-static, zero state store."""
    from ..plans.curation import bloom_build, bloom_probe

    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all("text", F.lit(shingle_re), F.lit(1))
            )
        ).alias("g"),
    ).select("doc_id", F.xxhash64("g").alias("hk"))
    # the static side of a stream-static join is RE-EVALUATED every
    # micro-batch — materialize the filter and the key table once, or
    # a long-running stream pays a full bench-gram scan + bloom
    # aggregation per trigger (the opposite of "folds once")
    bench_keys = (
        bench_grams.select("bench_id", F.xxhash64("g").alias("hk"))
        .localCheckpoint()
    )
    bloom = F.broadcast(
        bloom_build(bench_keys.select("hk").distinct()).localCheckpoint()
    )
    pre = bloom_probe(grams.crossJoin(bloom)).filter("bh").drop("bh")
    return (
        pre.join(F.broadcast(bench_keys), "hk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_gram_hits"),
            F.size(F.collect_set("bench_id")).cast("long").alias("n_bench_docs"),
        )
    )
