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
