"""Streaming ANN serving: a query stream against a static PQ index.

The serving half of the similarity stack: the corpus is encoded ONCE
(``pq_encode`` — codes + reconstructed norms, the static side), and
queries arrive as a stream. Each micro-batch builds its queries' ADC
lookup tables narrowly against the broadcast codebook, scores the
static coded corpus via a stream-static join (n_sub map lookups per
pair — corpus vectors never touched, never shuffled), and a streaming
aggregation keeps the best match per query.

State is ONE struct per live query (the running max), not a candidate
buffer — the bounded-state discipline every twin in this package
follows. Batch == stream is proven in tests/test_streaming.py against
the identical ``pq_adc_scores`` plan run as a batch.

At fleet scale the static side would be IVF-bucketed (ivfpq_encode)
and the stream joined on cell_id after a probe step, so each query
batch touches nprobe cells' partitions instead of the whole corpus;
the all-cells form here is the nprobe=all upper bound of that plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import _pq_dims, pq_adc_scores, pq_query_luts


def _best_match_per_query(
    scored: DataFrame, ts_col: str | None, horizon: str
) -> DataFrame:
    """Shared serving tail: one running-max struct per (arrival
    window,) query, ties to the smallest vec_id (the batch rule).
    Both twins MUST share this — the tie-break and the eviction keying
    are the serving contract, and a divergence between the all-cells
    and probed-cells paths would be invisible to their separate
    batch==stream tests."""
    keys = (
        [F.window(F.col(ts_col), horizon).alias("__w")] if ts_col else []
    ) + [F.col("query_id")]
    out = scored.groupBy(*keys).agg(
        F.max(
            F.struct(F.col("approx_sim"), (-F.col("id")).alias("negid"))
        ).alias("b")
    )
    head = [F.col("__w.start").alias("window_start")] if ts_col else []
    return out.select(
        *head,
        "query_id",
        (-F.col("b.negid")).alias("vec_id"),
        F.col("b.approx_sim").alias("approx_sim"),
    )


def ann_stream(
    queries: DataFrame,
    coded_corpus: DataFrame,
    cb: DataFrame,
    vec_col: str = "embedding",
    dims: tuple[int, int] | None = None,
    ts_col: str | None = None,
    horizon: str = "30 minutes",
) -> DataFrame:
    """(…, query_id, vec_id, approx_sim): best ADC match per streamed
    query. ``queries`` is a streaming (query_id, vector[, ts]) frame;
    ``coded_corpus`` is the static ``pq_encode`` output; ``cb`` the
    codebook. Ties break to the smallest vec_id (the batch rule).

    State bounding: with ``ts_col`` set (production), the aggregate is
    keyed by (window(ts, horizon), query_id) under a watermark, so a
    query's max-struct is EVICTED once the watermark passes its
    arrival window — state is O(queries per horizon); run in update
    mode and the output gains a ``window_start`` column. Without
    ``ts_col`` (finite verification), state is one struct per distinct
    query ever seen and complete mode re-emits the full table per
    trigger — fine for a bounded test feed, unbounded on a real
    serving stream; always pass ``ts_col`` there."""
    dims = dims or _pq_dims(cb)
    carry = (ts_col,) if ts_col is not None else ()
    if ts_col is not None:
        queries = queries.withWatermark(ts_col, horizon)
    q = pq_query_luts(queries, cb, vec_col=vec_col, dims=dims, carry=carry)
    scored = pq_adc_scores(coded_corpus, q, dims, carry=carry)
    return _best_match_per_query(scored, ts_col, horizon)


def ann_stream_ivfpq(
    queries: DataFrame,
    cents: DataFrame,
    coded_corpus: DataFrame,
    cb: DataFrame,
    nprobe: int = 2,
    vec_col: str = "embedding",
    dims: tuple[int, int] | None = None,
    ts_col: str | None = None,
    horizon: str = "30 minutes",
) -> DataFrame:
    """The nprobe<all serving plan: each streamed query probes its
    ``nprobe`` closest IVF cells and ADC-scores ONLY those cells'
    members via a stream-static EQUI-join on cell_id — with the
    ``ivfpq_encode`` output partitioned/bucketed by cell, a query
    batch touches a bounded slice of the index instead of the whole
    corpus (ann_stream's all-cells scan is this plan's nprobe=all
    upper bound). Probe lists and LUTs are narrow projections against
    the two one-row broadcast indexes; state is the same one
    running-max struct per (window,) query as ann_stream, with the
    identical ts_col/horizon bounding contract."""
    from ..operators.similarity import ivfpq_adc_scores, ivfpq_probes

    dims = dims or _pq_dims(cb)
    carry = (ts_col,) if ts_col is not None else ()
    if ts_col is not None:
        queries = queries.withWatermark(ts_col, horizon)
    probes = ivfpq_probes(
        queries, cents, cb, nprobe, dims, vec_col=vec_col, carry=carry
    )
    scored = ivfpq_adc_scores(coded_corpus, probes, dims, carry=carry)
    return _best_match_per_query(scored, ts_col, horizon)
