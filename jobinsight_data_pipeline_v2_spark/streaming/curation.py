"""Streaming curation twins: context-window chunking and the curation
funnel over a document stream.

Both reuse the batch plan verbatim (plans/sampling.chunk_transform,
plans/curation.funnel_report) — the Spark-first payoff of keeping those
transforms narrow/declarative is that the SAME code runs incrementally:

- chunk_stream is stateless (every op stays inside the row), so it
  streams in append mode with zero state store;
- funnel_stream ends in a standard streaming aggregation — complete
  mode for finite verification sinks (CLAUDE.md rule 8), update mode
  with a watermarked window key in production.

Batch == stream is proven in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.curation import funnel_report
from ..plans.sampling import chunk_transform


def chunk_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_hash) per overlapping
    context window of each streaming document — identical rows to the
    batch chunk_documents gate (minus its presentation sort, which a
    stream cannot have in append mode)."""
    return chunk_transform(docs)


def funnel_stream(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, pass_len, pass_lang, kept, kept_chars): the
    per-language curation-funnel report, updating as documents arrive.
    In complete mode the final state equals the batch curation_funnel
    gate row for row."""
    return funnel_report(docs)


def classifier_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, counts…, logit, keep): model-based quality gating over
    a document stream — the batch quality_classifier's inference
    projection run incrementally (stateless append mode, zero state
    store; the model weights are compiled into the plan the way a
    broadcast coefficient vector would be)."""
    from ..plans.corpus import classifier_score

    return classifier_score(docs)


# ---------------------------------------------------------------------------
# streaming segment dedup: corpus-wide first-occurrence state per
# segment hash (the incremental twin of plans/corpus.segment_dedup)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.state import (  # noqa: E402
    GroupState,
    GroupStateTimeout,
)
from pyspark.sql.types import (  # noqa: E402
    BooleanType,
    LongType,
    StructField,
    StructType,
)

_SEG_OUT_SCHEMA = StructType(
    [
        StructField("sk", LongType(), True),
        StructField("doc_id", LongType(), True),
        StructField("seg_idx", LongType(), True),
        StructField("kept", BooleanType(), True),
        StructField("late", BooleanType(), True),
    ]
)

_SEG_STATE = "winner_ord LONG"


def segment_dedup_stream(docs: DataFrame) -> DataFrame:
    """(sk, doc_id, seg_idx, kept, late): per-occurrence keep/drop
    decisions for corpus-wide segment dedup over a document stream.

    State per distinct segment hash: ONE long — the winning
    first-occurrence order key. Within a micro-batch the minimum ord
    wins (exactly the batch gate's rule), across batches the earliest
    arrival wins (what an ordered doc_id-keyed feed produces). A
    smaller ord arriving AFTER its segment's winner was emitted means
    the ordered-arrival assumption broke; re-keeping it would
    contradict the already-emitted drop decisions, so it is emitted
    ``kept=false, late=true`` — visible, never silent (the
    asof/pack_stream discipline). On an ordered single-pass feed the
    output equals plans/corpus.segment_dedup's is_first marking row
    for row (proven in tests/test_streaming.py).

    This is the streaming-exact-dedup state shape: O(distinct
    segments) longs. At fleet scale, bound it with a state TTL the way
    dedup_stream's dropDuplicatesWithinWatermark does — an expired
    segment re-admits one copy per horizon, the standard trade.
    """
    import pandas as pd

    from ..plans.corpus import segment_rows
    from ..plans.text import _TOKENS

    segs = segment_rows(
        docs.select("doc_id", F.expr(_TOKENS).alias("t"))
    ).select("sk", "doc_id", F.col("seg_idx").cast("long"), "ord")

    def update(key, pdfs, state: GroupState):
        (sk,) = key
        (winner,) = state.get if state.exists else (None,)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ord")
        out = []
        for doc_id, seg_idx, ordv in zip(
            pdf["doc_id"], pdf["seg_idx"], pdf["ord"]
        ):
            if winner is None:
                out.append((sk, int(doc_id), int(seg_idx), True, False))
                winner = int(ordv)
            else:
                out.append(
                    (sk, int(doc_id), int(seg_idx), False, int(ordv) < winner)
                )
        state.update((winner,))
        yield pd.DataFrame(
            out, columns=["sk", "doc_id", "seg_idx", "kept", "late"]
        )

    return segs.groupBy("sk").applyInPandasWithState(
        update,
        outputStructType=_SEG_OUT_SCHEMA,
        stateStructType=_SEG_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
