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


def fim_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, pivot_a, pivot_b, fim_hash, fim_chars,
    lossless) per streaming document — the batch fim_transform gate's
    rows (minus its presentation sort). Pivots are md5-derived pure
    functions of the row, so replays/retries rewrite identically, and
    the transform is a stateless narrow projection (append mode, zero
    state store; rule-20-safe — the token array has only whole-array
    consumers, no per-position access)."""
    from ..plans.sampling import fim_rows

    return fim_rows(docs)


def funnel_stream(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, pass_len, pass_lang, kept, kept_chars): the
    per-language curation-funnel report, updating as documents arrive.
    In complete mode the final state equals the batch curation_funnel
    gate row for row."""
    return funnel_report(docs)


def mixture_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_chars, rate_permille, bucket, kept):
    mixture-weighted sampling decisions over a document stream — the
    batch mixture gate's per-document projection run incrementally.
    Stateless append mode, zero state store: the md5-bucket membership
    rule is reprocessing-stable by construction, so a replayed or
    re-ordered stream emits the identical keep/drop set."""
    from ..plans.sampling import mixture_decisions

    return mixture_decisions(docs)


def mixture_report_stream(docs: DataFrame) -> DataFrame:
    """Per-source (rate, totals, kept, kept_chars) mixture report,
    updating as documents arrive — the batch mixture_sample gate's
    aggregation in complete mode (finite verification sinks; update
    mode with a windowed source key in production). In complete mode
    the final state equals the batch gate row for row."""
    from ..plans.sampling import mixture_report

    return mixture_report(docs)


def bpe_pair_stream(docs: DataFrame) -> DataFrame:
    """(pair, n): the BPE merge-training statistic — adjacent-symbol
    pair counts — maintained incrementally over a document stream.
    In-row pair construction stays narrow per micro-batch; the running
    count is a standard streaming aggregation (complete mode for
    finite verification; the batch gate's top-N presentation LIMIT is
    a batch-only affordance — streams emit the full histogram and the
    consumer ranks). Final complete-mode state equals the batch
    adjacent_pair_counts over the same documents."""
    from ..operators.tokenizer import adjacent_pair_counts
    from ..plans.text import _TOKENS

    symbols = docs.select(
        F.col("doc_id").alias("id"), F.expr(_TOKENS).alias("s")
    )
    return adjacent_pair_counts(symbols).select(
        F.concat_ws(" ", "a", "b").alias("pair"), "n"
    )


def classifier_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, counts…, logit, keep): model-based quality gating over
    a document stream — the batch quality_classifier's inference
    projection run incrementally (stateless append mode, zero state
    store; the model weights are compiled into the plan the way a
    broadcast coefficient vector would be)."""
    from ..plans.corpus import classifier_score

    return classifier_score(docs)


def license_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, license, coverage_ppm): header-marker license
    classification over a document stream — the batch license_detect
    gate's per-document projection verbatim
    (plans/corpus.license_label_rows: fully in-row, stateless append
    mode, the marker sets compiled into the plan as literals)."""
    from ..plans.corpus import license_label_rows

    return license_label_rows(docs)


def markdown_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, markdown, text): Markdown → plain-text extraction over
    a document stream — the batch markdown extractor verbatim
    (sources/markdown_extract.extract_markdown_text is a pure JVM-side
    regexp projection: stateless append mode, zero state store, no
    Arrow edge)."""
    from ..sources.markdown_extract import extract_markdown_text

    return extract_markdown_text(docs)


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

def _decision_schema(
    idx_name: str, extras: tuple = ()
) -> StructType:
    return StructType(
        [
            StructField("sk", LongType(), True),
            StructField("doc_id", LongType(), True),
            StructField(idx_name, LongType(), True),
            StructField("kept", BooleanType(), True),
            StructField("late", BooleanType(), True),
            *[StructField(n, t, True) for n, t in extras],
        ]
    )


_SEG_STATE = "winner_ord LONG"


def _first_arrival_decisions(
    rows: DataFrame,
    idx_col: str,
    timeout,
    ttl_ms: int | None,
    extras: tuple = (),
) -> DataFrame:
    """(sk, doc_id, {idx_col}, kept, late[, extras…]): the shared
    first-occurrence-wins state machine behind the dedup stream twins
    (segment and substring dedup differ only in how they cut text into
    hash-keyed occurrence rows). ``rows`` carries (sk, doc_id,
    {idx_col}, ord [, __ts, __ts_ms][, extras…]); state per hash is
    ONE long — the winning order key. ``extras`` is a tuple of
    (column_name, DataType) pairs echoed through per occurrence row
    (curation_stream rides its stateless classifier/PII columns this
    way). Semantics and the TTL/late-row discipline are documented on
    ``segment_dedup_stream``."""
    import pandas as pd

    extra_names = [n for n, _ in extras]

    def update(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # horizon of event time passed with no arrival for this
            # hash: drop the winner — the next copy re-admits
            state.remove()
            return
        (sk,) = key
        (winner,) = state.get if state.exists else (None,)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ord")
        out = []
        for row in pdf.itertuples(index=False):
            ordv = getattr(row, "ord")
            ex = tuple(getattr(row, n) for n in extra_names)
            base = (sk, int(getattr(row, "doc_id")), int(getattr(row, idx_col)))
            if winner is None:
                out.append((*base, True, False, *ex))
                winner = int(ordv)
            else:
                out.append((*base, False, int(ordv) < winner, *ex))
        state.update((winner,))
        if ttl_ms is not None:
            # expire `horizon` past this hash's newest event time.
            # The watermark floor matters on two edges: a late row
            # (batch max behind the watermark) must not set a timeout
            # the watermark already passed (Spark rejects it), and the
            # cold-start watermark (epoch 0) must not make the first
            # batch's timeout instantly stale.
            state.setTimeoutTimestamp(
                max(
                    int(pdf["__ts_ms"].max()) + ttl_ms,
                    state.getCurrentWatermarkMs() + ttl_ms,
                )
            )
        yield pd.DataFrame(
            out,
            columns=["sk", "doc_id", idx_col, "kept", "late", *extra_names],
        )

    return rows.groupBy("sk").applyInPandasWithState(
        update,
        outputStructType=_decision_schema(idx_col, extras),
        stateStructType=_SEG_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )

_DURATION_UNITS_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _duration_ms(horizon: str) -> int:
    """'30 seconds' / '1 minute' → milliseconds (the subset of Spark's
    CalendarInterval syntax the streaming twins use)."""
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s+(millisecond|second|minute|hour|day)s?\s*", horizon
    )
    if not m:
        raise ValueError(f"unparseable duration: {horizon!r}")
    return int(m.group(1)) * _DURATION_UNITS_MS[m.group(2)]


def segment_dedup_stream(
    docs: DataFrame,
    ts_col: str | None = None,
    horizon: str | None = None,
) -> DataFrame:
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

    Without a TTL the state is O(distinct segments) FOREVER — the
    verification-twin configuration only. The PRODUCTION path passes
    ``ts_col`` + ``horizon`` (e.g. "1 hour"): the event-time column is
    cast once and watermarked at the horizon, state uses
    EventTimeTimeout, and a segment unseen for ``horizon`` of event
    time expires — the next copy after expiry is re-admitted (kept
    again) exactly once per horizon, the standard
    dropDuplicatesWithinWatermark trade. State is then O(distinct
    segments per horizon), bounded however long the stream runs.
    """
    from ..plans.corpus import segment_rows
    from ..plans.text import _TOKENS

    if (ts_col is None) != (horizon is None):
        raise ValueError("ts_col and horizon must be provided together")

    if ts_col is None:
        segs = segment_rows(
            docs.select("doc_id", F.expr(_TOKENS).alias("t"))
        ).select("sk", "doc_id", F.col("seg_idx").cast("long"), "ord")
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    else:
        # cast the (possibly ntz) event time ONCE here (rule 8) and
        # watermark before the stateful op; the column rides through
        # the narrow segment build untouched
        toks = (
            docs.withColumn("__ts", F.col(ts_col).cast("timestamp"))
            .withWatermark("__ts", horizon)
            .select("doc_id", "__ts", F.expr(_TOKENS).alias("t"))
        )
        # __ts keeps the watermark attached through the stateful op;
        # __ts_ms is the SAME instant as epoch millis computed
        # JVM-side (unix_millis) — the UDF must never re-derive epoch
        # from the Arrow-transferred naive timestamp, whose wall time
        # is session-zone-local (a tz-dependent expiry bug shape)
        segs = segment_rows(toks, carry=("__ts",)).select(
            "sk",
            "doc_id",
            F.col("seg_idx").cast("long"),
            "ord",
            "__ts",
            F.unix_millis("__ts").alias("__ts_ms"),
        )
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl_ms = _duration_ms(horizon)

    return _first_arrival_decisions(segs, "seg_idx", timeout, ttl_ms)


def substring_dedup_stream(
    docs: DataFrame,
    l: int | None = None,
    ts_col: str | None = None,
    horizon: str | None = None,
) -> DataFrame:
    """(sk, doc_id, pos, kept, late): per-occurrence keep/drop
    decisions for corpus-wide SUBSTRING dedup over a document stream —
    the incremental twin of plans/corpus.substring_dedup's
    redundant-gram marking (overlapping L-token grams at any
    alignment, where segment dedup sees only fixed blocks). A
    downstream consumer cuts each doc's non-kept positions into spans
    exactly as the batch ``cut_duplicate_spans`` does — the decision
    rows here carry everything it needs.

    State per distinct gram hash: ONE long (the winning order key) —
    the same machine as ``segment_dedup_stream``, fed by the same
    ``span_gram_rows`` transform the batch gate uses. TTL semantics
    (``ts_col`` + ``horizon``) and the late-row discipline are
    identical; without a TTL this is the verification-twin
    configuration (state O(distinct grams) forever).
    """
    # streaming frames cannot checkpoint the token arrays, so the
    # gram stream uses the LINEAR scan variant (canonical text rebuilt
    # with one array reference + lookahead regex, in-plan whitespace
    # guard) — the slice variant's per-index array reference would
    # re-tokenize per gram after projection collapse (rule 10,
    # review r6)
    from ..plans.corpus import _SPAN_L, span_gram_rows_scan

    if (ts_col is None) != (horizon is None):
        raise ValueError("ts_col and horizon must be provided together")
    l = _SPAN_L if l is None else l

    if ts_col is None:
        grams = span_gram_rows_scan(docs, l=l).select(
            "sk", "doc_id", F.col("pos").cast("long"), "ord"
        )
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    else:
        with_ts = (
            docs.withColumn("__ts", F.col(ts_col).cast("timestamp"))
            .withWatermark("__ts", horizon)
            .select("doc_id", "__ts", "text")
        )
        grams = span_gram_rows_scan(with_ts, l=l, carry=("__ts",)).select(
            "sk",
            "doc_id",
            F.col("pos").cast("long"),
            "ord",
            "__ts",
            F.unix_millis("__ts").alias("__ts_ms"),
        )
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl_ms = _duration_ms(horizon)

    return _first_arrival_decisions(grams, "pos", timeout, ttl_ms)


def curation_stream(
    docs: DataFrame,
    ts_col: str | None = None,
    horizon: str | None = None,
    normalize: bool = False,
) -> DataFrame:
    """(doc_id, sk, first_copy, late, logit, quality_keep, n_emails,
    n_phones, ship): per-document curation DECISIONS over a stream —
    the incremental front half of ``corpus_pipeline.curate_corpus``.
    Exact dedup is the stateful part (first arrival per RAW-text hash —
    one long of state via the shared machine); the PII counts,
    redaction, and classifier features ride the SAME stateless
    projection and pass through the state op as extra columns, so no
    stream-stream join is ever needed. Stage order matches the batch
    pipeline: the classifier scores the REDACTED text. ``ship`` is the
    shippable verdict: first copy AND classifier keep. Substring-level
    dedup decisions stream separately (``substring_dedup_stream``);
    the global stages (token budget, sharding) are inherently
    batch-final and run on the accumulated shippable set.

    TTL (``ts_col`` + ``horizon``) bounds the dedup state exactly as
    in the dedup twins. Empty-token docs never reach the state op
    (the classifier's n_tok > 0 filter — same docs the batch pipeline
    drops).
    """
    from ..plans.corpus import classifier_score
    from ..plans.curation import _EMAIL_RE, _PHONE_RE

    if (ts_col is None) != (horizon is None):
        raise ValueError("ts_col and horizon must be provided together")

    if normalize:
        # stage 0, same as curate_corpus(normalize=True): NFC before
        # the dedup hash so form variants share one state key.
        # Stateless Arrow projection — streaming-safe by construction.
        from ..operators.unicode_norm import normalize_column

        keep = [c for c in docs.columns if c != "text"]
        docs = docs.select(
            *keep, normalize_column("text", "NFC").alias("text")
        )

    # dedup hashes the RAW text; the classifier sees the REDACTED text
    # — the same stage order as curate_corpus (review r6: classifying
    # un-scrubbed text can flip `keep` near the logit boundary for
    # PII-bearing docs, because redaction collapses k distinct emails
    # into one repeated '[EMAIL]' token)
    pre_cols = [
        "doc_id",
        F.xxhash64("text").alias("sk"),
        F.size(
            F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("text"),
    ]
    extras = (
        ("logit", LongType()),
        ("keep", BooleanType()),
        ("n_emails", LongType()),
        ("n_phones", LongType()),
    )

    if ts_col is None:
        pre = docs.select(*pre_cols)
        scored = classifier_score(
            pre, carry=("sk", "n_emails", "n_phones")
        )
        rows = scored.select(
            "sk",
            "doc_id",
            F.lit(0).cast("long").alias("pos"),
            F.col("doc_id").alias("ord"),
            "logit",
            "keep",
            F.col("n_emails").cast("long"),
            F.col("n_phones").cast("long"),
        )
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    else:
        pre = (
            docs.withColumn("__ts", F.col(ts_col).cast("timestamp"))
            .withWatermark("__ts", horizon)
            .select(*pre_cols, "__ts")
        )
        scored = classifier_score(
            pre, carry=("sk", "n_emails", "n_phones", "__ts")
        )
        rows = scored.select(
            "sk",
            "doc_id",
            F.lit(0).cast("long").alias("pos"),
            F.col("doc_id").alias("ord"),
            "__ts",
            F.unix_millis("__ts").alias("__ts_ms"),
            "logit",
            "keep",
            F.col("n_emails").cast("long"),
            F.col("n_phones").cast("long"),
        )
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl_ms = _duration_ms(horizon)

    decided = _first_arrival_decisions(rows, "pos", timeout, ttl_ms, extras)
    return decided.select(
        "doc_id",
        "sk",
        F.col("kept").alias("first_copy"),
        "late",
        "logit",
        F.col("keep").alias("quality_keep"),
        "n_emails",
        "n_phones",
        (F.col("kept") & F.col("keep")).alias("ship"),
    )


def substring_decontaminate_stream(
    docs: DataFrame,
    bench_sks: DataFrame,
    l: int | None = None,
    ts_col: str | None = None,
    horizon: str | None = None,
) -> DataFrame:
    """(doc_id, n_tok, n_dup_occ, n_spans, n_removed, clean_text):
    span-granular eval decontamination over a DOCUMENT STREAM — the
    incremental twin of plans/corpus.substring_decontaminate (twin 23,
    judge ask r6). ``bench_sks`` is the STATIC benchmark gram-hash set
    (one ``sk`` column, e.g. ``span_gram_rows(bench_toks).select('sk')
    .distinct()``) — benchmark-sized by the decontaminate convention,
    and MATERIALIZED here because a stream-static join re-evaluates
    its static plan EVERY micro-batch (the bloom twin lesson).

    Shape: unlike the dedup twins there is NO cross-document state —
    contamination is per doc against a frozen benchmark. The gram
    stream (``span_gram_rows_scan``, the rule-20 linear variant)
    probes the broadcast benchmark with one stream-static semi-join;
    hit positions regroup per document through a single aggregation
    whose group key carries the doc's text (constant per doc — only
    HIT rows shuffle it, plus one sentinel row per doc so untouched
    documents still emit); the span merge / coverage / reassembly is
    the SAME in-row ``span_cut_columns`` the batch operators run.

    Without ``ts_col`` this is the finite-verification configuration:
    drain in COMPLETE mode (rule 8 — the aggregation state is the
    in-flight doc set). With ``ts_col`` + ``horizon`` the aggregation
    is watermarked and emits in APPEND mode once the watermark passes
    a document's event time, bounding state to the in-horizon doc
    set. A document arriving AFTER the watermark passed its event
    time still emits, correctly decontaminated — its group finalizes
    immediately in the arrival batch; with no cross-document state
    there is no stale decision to flag, unlike the first-arrival
    twins (pinned by the TTL-branch test)."""
    from ..plans.corpus import _SPAN_L, span_cut_columns, span_gram_rows_scan
    from ..plans.text import _TOKENS

    l = _SPAN_L if l is None else l
    if (ts_col is None) != (horizon is None):
        raise ValueError("ts_col and horizon must be provided together")
    static = F.broadcast(bench_sks.select("sk").distinct().localCheckpoint())

    if ts_col is None:
        src = docs.select("doc_id", "text")
        key = ["doc_id", "text"]
    else:
        src = (
            docs.withColumn("__ts", F.col(ts_col).cast("timestamp"))
            .withWatermark("__ts", horizon)
            .select("doc_id", "text", "__ts")
        )
        key = ["doc_id", "text", "__ts"]

    hits = (
        span_gram_rows_scan(src, l=l, carry=("text",) + (("__ts",) if ts_col else ()))
        .join(static, "sk", "left_semi")
        .select(*key, F.col("pos").alias("hit_pos"))
    )
    sentinels = src.select(*key, F.lit(None).cast("int").alias("hit_pos"))
    grouped = (
        sentinels.unionByName(hits)
        .groupBy(*key)
        .agg(F.sort_array(F.collect_list("hit_pos")).alias("dps"))
    )
    joined = grouped.select(
        "doc_id", F.expr(_TOKENS).alias("t"), "dps"
    ).filter(F.size("t") > 0)
    return span_cut_columns(joined, l=l)


_BUDGET_STATE = "cum LONG, closed BOOLEAN"
_BUDGET_SCHEMA = StructType(
    [
        StructField("window_start_ms", LongType(), True),
        StructField("doc_id", LongType(), True),
        StructField("score", LongType(), True),
        StructField("n_tokens", LongType(), True),
        StructField("cum_tokens", LongType(), True),
        StructField("admitted", BooleanType(), True),
    ]
)


def budget_stream(
    rows: DataFrame,
    budget: int,
    window: str = "5 minutes",
    ts_col: str = "ts",
    horizon: str = "1 minute",
) -> DataFrame:
    """(window_start_ms, doc_id, score, n_tokens, cum_tokens, admitted):
    token-budget selection over a DOCUMENT STREAM — the back half of
    the curation funnel made incremental (judge ask, r6). Each
    watermarked tumbling window owns an independent ``budget``; its
    running token sum is the per-window state (ONE long + a closed
    flag), and documents are admitted until the budget exhausts with
    the batch operator's PREFIX semantics: the first rejection closes
    the window — no knapsack skipping, so a replayed feed reproduces
    the identical cut.

    DOCUMENTED DEVIATION from batch ``select_token_budget``: the batch
    operator ranks the WHOLE corpus by (score DESC, doc_id) before
    cutting; an online operator cannot revoke an admission when a
    better document arrives later, so ranking holds within each
    micro-batch only and admission is arrival-ordered across batches.
    When the feed arrives ranked (a replayed ranked dump — the
    re-sharding use case), stream == batch EXACTLY (pinned by test);
    on an unranked feed the budget and prefix-closure semantics still
    hold per window, but a late high-scorer can lose to an earlier
    low-scorer (also pinned by test — the deviation is behavior, not
    accident).

    ``rows`` carries (doc_id, score, n_tokens, ``ts_col``); state
    expires ``horizon`` past the window's end (watermark-floored,
    rule 15) — a row arriving after expiry reopens the window with a
    fresh budget, the same TTL trade every horizon-bounded twin makes.
    """
    import pandas as pd

    win_ms = _duration_ms(window)
    ttl_ms = _duration_ms(horizon)

    keyed = (
        rows.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", horizon)
        .select(
            F.unix_millis(F.window("__ts", window).getField("start")).alias(
                "window_start_ms"
            ),
            F.col("doc_id").cast("long"),
            F.col("score").cast("long"),
            F.col("n_tokens").cast("long"),
            # the watermarked column itself must reach the state op
            # (event-time timeout needs it); the timeout value is
            # computed from the window-start key, so no __ts_ms
            # passthrough is needed here (unlike the per-hash twins)
            "__ts",
        )
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (ws_ms,) = key
        cum, closed = state.get if state.exists else (0, False)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        out = []
        for row in pdf.itertuples(index=False):
            n = int(row.n_tokens)
            if not closed and cum + n <= budget:
                cum += n
                out.append(
                    (int(ws_ms), int(row.doc_id), int(row.score), n,
                     cum, True)
                )
            else:
                closed = True  # prefix semantics: first miss closes
                out.append(
                    (int(ws_ms), int(row.doc_id), int(row.score), n,
                     None, False)
                )
        state.update((cum, closed))
        state.setTimeoutTimestamp(
            max(
                int(ws_ms) + win_ms + ttl_ms,
                state.getCurrentWatermarkMs() + ttl_ms,
            )
        )
        yield pd.DataFrame(
            out,
            columns=[
                "window_start_ms",
                "doc_id",
                "score",
                "n_tokens",
                "cum_tokens",
                "admitted",
            ],
        )

    return keyed.groupBy("window_start_ms").applyInPandasWithState(
        update,
        outputStructType=_BUDGET_SCHEMA,
        stateStructType=_BUDGET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def budget_stream_from_docs(
    docs: DataFrame,
    budget: int,
    window: str = "5 minutes",
    ts_col: str = "ts",
    horizon: str = "1 minute",
) -> DataFrame:
    """budget_stream over raw (doc_id, text, ts) rows, scored exactly
    like the token_budget_select gate: score = distinct-token count,
    n_tokens = token count, empty-token docs dropped upstream."""
    from ..plans.text import _TOKENS  # the ONE canonical tokenizer

    toks = F.expr(_TOKENS)
    rows = docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("score"),
        F.size(toks).alias("n_tokens"),
        ts_col,
    ).filter(F.col("n_tokens") > 0)
    return budget_stream(rows, budget, window, ts_col, horizon)


def dsir_stream(docs: DataFrame, classes: list[int]) -> DataFrame:
    """(doc_id, n_grams, score, rate_permille, kept): DSIR importance-
    resampling decisions over a DOCUMENT STREAM (twin 25) — the
    serving shape of plans/corpus.dsir_resample: the bucket-class
    model is trained OFFLINE (``dsir_train_classes``, B integers) and
    COMPILED INTO THE PLAN as an array literal, the way
    classifier_stream carries its weights. Scoring is one fully
    in-row fold — hash each gram to its bucket, look the class up in
    the literal array, sum — so the operator is a stateless narrow
    projection: append mode, zero state store, no joins, no
    aggregation. Decisions are md5-membership (replay/retry-stable),
    so a re-ordered or replayed stream emits the identical keep set.
    One interpreted md5 per gram inside the fold is the rule-10 trade
    the batch engine already measured as cheaper than an
    explode/shuffle round trip — and on a stream it is also the only
    checkpoint-free shape (rule 20)."""
    from ..plans.corpus import _DSIR_B, _dsir_class_case  # noqa: F401
    from ..plans.corpus import _DSIR_GRAMS
    from ..plans.sampling import _bucket
    from ..plans.text import _TOKENS

    if len(classes) != _DSIR_B:
        raise ValueError(f"classes must have {_DSIR_B} entries")
    cls_arr = F.array(*[F.lit(int(c)) for c in classes])

    def gram_cls(g):
        bucket = (
            F.conv(F.substring(F.md5(g.cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % _DSIR_B
        )
        return F.element_at(cls_arr, (bucket + 1).cast("int")).cast("long")

    toks = docs.select(
        "doc_id", F.expr(_TOKENS).alias("t")
    ).withColumn("__grams", F.expr(_DSIR_GRAMS))
    scored = toks.select(
        "doc_id",
        F.size("__grams").cast("long").alias("n_grams"),
        F.aggregate(
            F.transform("__grams", gram_cls),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("score"),
    ).filter(F.col("n_grams") > 0)
    rate = (
        F.when(F.col("score") >= 0, F.lit(1000))
        .when(
            F.col("score") >= -9,
            F.expr("div(1000, shiftleft(1, -score))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return scored.withColumn("rate_permille", rate).select(
        "doc_id",
        "n_grams",
        "score",
        "rate_permille",
        (_bucket("doc_id", 1000) < F.col("rate_permille")).alias("kept"),
    )


def perplexity_stream(docs: DataFrame, classes: dict[str, int]) -> DataFrame:
    """(doc_id, n_bi, n_oov, score, bucket, rate_permille, kept):
    bigram-LM perplexity bucketing over a DOCUMENT STREAM (twin 26) —
    the serving shape of plans/corpus.lm_perplexity_buckets: the
    {bigram -> class} model is trained OFFLINE (``ppl_train_model``,
    V small integers) and COMPILED INTO THE PLAN as a map literal (the
    dsir_stream array-literal device, keyed by string instead of
    position). Scoring is one fully in-row pass — build the doc's
    bigram array, look each bigram's class up in the literal map
    (missing key = the -CLAMP backoff class), fold the sum — so the
    operator is a stateless narrow projection: append mode, zero
    state store, no joins, no aggregation. Bucketing and keep
    decisions reuse the batch gate's shared SQL (``_ppl_bucket_sql``)
    and the md5-membership rule, so a replayed or re-ordered stream
    emits the identical keep set. The lambda-built bigram array is
    consumed by single-reference folds only (rule 10's safe shape) —
    checkpoint-free by construction, as a stream requires (rule 20).
    """
    from ..plans.corpus import _CCNET_RATES, _PPL_CLAMP, _ppl_bucket_sql
    from ..plans.sampling import _bucket
    from ..plans.text import _TOKENS

    if not classes:
        raise ValueError("empty perplexity model (no training bigrams)")
    keys, vals = zip(*sorted(classes.items()))
    cls_map = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.lit(int(v)) for v in vals]),
    )

    bi_arr = F.expr(
        """
        if(size(t) >= 2,
           transform(sequence(1, size(t) - 1),
                     i -> concat(element_at(t, i), ' ',
                                 element_at(t, i + 1))),
           cast(array() as array<string>))
        """
    )
    toks = docs.select("doc_id", F.expr(_TOKENS).alias("t")).withColumn(
        "__bi", bi_arr
    )
    looked = toks.withColumn(
        "__cls", F.transform("__bi", lambda bg: F.element_at(cls_map, bg))
    )
    scored = looked.select(
        "doc_id",
        F.size("__bi").cast("long").alias("n_bi"),
        F.aggregate(
            "__cls",
            F.lit(0).cast("long"),
            lambda acc, c: acc + F.when(c.isNull(), 1).otherwise(0),
        ).alias("n_oov"),
        F.aggregate(
            "__cls",
            F.lit(0).cast("long"),
            lambda acc, c: acc + F.coalesce(c, F.lit(-_PPL_CLAMP)),
        ).alias("score"),
    ).filter(F.col("n_bi") > 0)
    rate = (
        F.when(F.col("bucket") == "head", _CCNET_RATES["head"])
        .when(F.col("bucket") == "middle", _CCNET_RATES["middle"])
        .otherwise(_CCNET_RATES["tail"])
        .cast("long")
    )
    return (
        scored.withColumn("bucket", F.expr(_ppl_bucket_sql("score", "n_bi")))
        .withColumn("rate_permille", rate)
        .select(
            "doc_id",
            "n_bi",
            "n_oov",
            "score",
            "bucket",
            "rate_permille",
            (_bucket("doc_id", 1000) < F.col("rate_permille")).alias("kept"),
        )
    )


def gopher_stream(docs: DataFrame) -> DataFrame:
    """Gopher rule battery over a DOCUMENT STREAM (twin 28) — the
    batch transform verbatim (the chunk_stream/classifier_stream
    device): ``plans/text.gopher_flag_columns`` is a single linear
    projection of string/array built-ins with no aggregation and no
    checkpoint need (rule 20 satisfied by construction), so the
    streamed union of per-batch flag rows equals the batch gate
    row for row. Stateless append mode, zero state store."""
    from ..plans.text import gopher_flag_columns

    return gopher_flag_columns(docs)


def temperature_stream(docs: DataFrame, rates: dict[str, int]) -> DataFrame:
    """Temperature (alpha = 1/2) mixing decisions over a DOCUMENT
    STREAM (twin 29) — the serving half of the temperature_mixture
    gate: rates train batch-side on a reference snapshot
    (plans/sampling.temperature_rates) and arrive here as a plain
    dict compiled into the plan as a map literal (the
    perplexity_stream device). Stateless append mode, zero state
    store; the md5-membership rule is reprocessing-stable, so a
    replayed or re-ordered stream emits the identical keep/drop set.
    Unseen groups get rate 0 (drop until the next rate refresh)."""
    from ..plans.sampling import temperature_decisions

    return temperature_decisions(docs, rates)


def fuzzy_match_stream(
    dirty: DataFrame,
    clean: DataFrame,
    max_dist: int = 1,
    ts_col: str | None = None,
    horizon: str | None = None,
) -> DataFrame:
    """(did, dirty_name, clean_name, dist): ONLINE entity resolution —
    a stream of dirty records probed against the static clean master
    via FastSS deletion-neighborhood blocking (twin of the
    fuzzy_name_match gates' lookup). ``max_dist`` selects the blocking
    depth — 1 or 2 (r12): the depth-k neighborhood only GENERATES
    distance-≤k candidates, so the verify threshold and the key depth
    must move together; deeper bounds raise (another factor of L in
    key volume — see fastss_key_rows).

    ``dirty`` is a stream of (did, dirty_name); ``clean`` a static
    frame with a clean_name column. The static key side is
    materialized + broadcast (stream-static statics re-evaluate every
    micro-batch — the bloom twin lesson). Blocking keys are built
    in-row and array_distinct'd BEFORE the explode
    (plans/core.fastss_key_rows — stream-safe, no dedup shuffle), so
    the only remaining duplicate source is one (dirty, clean) pair
    sharing several DIFFERENT key strings (possible between
    same-length strings, e.g. transposition-adjacent digits; never
    when probes are strictly shorter/longer than the master, the
    gate's pure insert/delete configuration).

    Those duplicates are collapsed by a dedup whose STATE STORES EVERY
    EMITTED KEY: without ``ts_col`` this is the finite-verification
    configuration (plain dropDuplicates — state grows with total
    matches; fine for a drained replay, not for an unbounded feed).
    For production pass ``ts_col`` + ``horizon``:
    dropDuplicatesWithinWatermark evicts keys once the watermark
    passes them, bounding state to the in-horizon match set."""
    from ..plans.core import fastss_key_rows

    if max_dist not in (1, 2):
        raise ValueError(
            "fuzzy_match_stream: FastSS blocking is implemented for "
            f"k in (1, 2); max_dist={max_dist} would silently miss "
            "matches"
        )
    if (ts_col is None) != (horizon is None):
        raise ValueError("ts_col and horizon must be provided together")
    ck = F.broadcast(
        fastss_key_rows(
            clean.select("clean_name").distinct(), "clean_name",
            k=max_dist,
        ).localCheckpoint()
    )
    carry = ["did", "dirty_name"] + ([ts_col] if ts_col else [])
    dk = fastss_key_rows(dirty.select(*carry), "dirty_name", k=max_dist)
    matched = dk.join(ck, "kh").select(
        *carry,
        "clean_name",
        F.levenshtein("dirty_name", "clean_name").cast("long").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
    if ts_col is None:
        return matched.select(
            "did", "dirty_name", "clean_name", "dist"
        ).dropDuplicates(["did", "clean_name"])
    return (
        matched.withColumn("__wm", F.col(ts_col).cast("timestamp"))
        .withWatermark("__wm", horizon)
        .dropDuplicatesWithinWatermark(["did", "clean_name"])
        .select("did", "dirty_name", "clean_name", "dist")
    )


def url_dedup_stream(
    urls: DataFrame,
    ts_col: str | None = None,
    horizon: str | None = None,
) -> DataFrame:
    """(sk, doc_id, url_idx, kept, late): crawl-frontier URL dedup over
    a stream — canonicalize each arriving URL (the batch
    url_canonical_dedup algebra, shared via canonical_url_columns) and
    keep only the first arrival per canonical string. State per
    distinct canonical URL: ONE long (the winning doc_id), keyed by
    xxhash64 of the canonical string so raw URLs never shuffle or sit
    in the state store (rule 13; collisions are harmless for dedup-
    grouping semantics, the _shingle_key convention). ord = doc_id, so
    on an ordered feed the kept set equals the batch gate's
    keeper_doc_id set exactly (min doc_id wins within AND across
    batches). The production path passes ``ts_col`` + ``horizon``:
    URLs unseen for the horizon expire and the next copy re-crawls —
    exactly the frontier-refresh contract a crawler wants (twin 37;
    the segment_dedup_stream TTL discipline).

    Unparseable URLs canonicalize to NULL (try_parse_url — garbage
    must never kill the frontier). They are routed AROUND the state
    machine and emitted kept=false, late=false with a NULL sk via a
    stateless union branch — visible, never silent, and never
    colliding onto one shared xxhash64(NULL) frontier key (review
    r7 s5).
    """
    from ..plans.corpus import canonical_url_columns

    if (ts_col is None) != (horizon is None):
        raise ValueError("ts_col and horizon must be provided together")

    if ts_col is None:
        base = canonical_url_columns(urls)
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    else:
        wm = urls.withColumn(
            "__ts", F.col(ts_col).cast("timestamp")
        ).withWatermark("__ts", horizon)
        base = canonical_url_columns(wm)
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl_ms = _duration_ms(horizon)

    valid = base.filter(F.col("canonical_url").isNotNull())
    cols = [
        F.xxhash64("canonical_url").alias("sk"),
        F.col("doc_id"),
        F.lit(0).cast("long").alias("url_idx"),
        F.col("doc_id").alias("ord"),
    ]
    if ts_col is not None:
        cols += [F.col("__ts"), F.unix_millis("__ts").alias("__ts_ms")]
    decided = _first_arrival_decisions(valid.select(*cols), "url_idx", timeout, ttl_ms)
    malformed = base.filter(F.col("canonical_url").isNull()).select(
        F.lit(None).cast("long").alias("sk"),
        F.col("doc_id"),
        F.lit(0).cast("long").alias("url_idx"),
        F.lit(False).alias("kept"),
        F.lit(False).alias("late"),
    )
    return decided.unionByName(malformed)


def calibration_stream(docs: DataFrame) -> DataFrame:
    """(bucket, n, conf_sum, n_pos, avg_conf_ppm, acc_ppm, gap_ppm):
    the classifier reliability diagram updating as documents arrive —
    twin 48, the calibration_ece gate's bucket aggregation in complete
    mode over the SHARED calibration_buckets transform (chained
    aggregations are unsupported on streams — the cohort lesson — so
    the one-row ECE summary stays a consumer-side fold over the ≤ 10
    emitted buckets; the per-bucket derived columns are plain
    projections AFTER the agg, which streams fine). Final state equals
    the batch gate's per-bucket rows column for column."""
    from ..plans.corpus import calibration_buckets

    b = calibration_buckets(docs)
    return b.select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        "conf_sum",
        "n_pos",
        F.expr("conf_sum div n").cast("long").alias("avg_conf_ppm"),
        F.expr("(1000000 * n_pos) div n").cast("long").alias("acc_ppm"),
        F.expr("abs(conf_sum - 1000000 * n_pos) div n")
        .cast("long")
        .alias("gap_ppm"),
    )


_SEM_STREAM_STATE = "vecs ARRAY<ARRAY<BIGINT>>, max_ord LONG"


def semantic_dedup_stream(
    docs: DataFrame,
    ts_col: str | None = None,
    horizon: str | None = None,
) -> DataFrame:
    """(cell, doc_id, kept, late): SemDeDup-style semantic dedup over
    a document stream — the twin of run_curation_day's semantic stage
    (twin 47). The frozen hashed-BoW vector + SRP cell label are the
    SAME checkpoint-free projections the batch stage runs
    (corpus_pipeline._batch_doc_vectors — pure functions of the text,
    so a restarted stream recomputes identical cells); state per CELL
    is the vector list of every arrived doc in the cell (the batch
    convention: a doc DROPPED at the stage still suppresses later
    near-copies), and a doc keeps iff no earlier-arrived vector in its
    cell passes the exact integer cosine-≥-9/10 test (Python ints —
    no overflow at any vector scale). Within a micro-batch the minimum
    doc_id decides first (the batch keep-min rule); on an ordered feed
    the decisions equal the batch stage's row for row. A doc arriving
    BEHIND a larger already-processed doc_id in its cell flags
    ``late=true`` but still gets the first-arrival decision (the
    segment-twin discipline: visible, never silent).

    Without a TTL, state is O(arrived docs) per cell FOREVER — the
    verification-twin configuration. The PRODUCTION path passes
    ``ts_col`` + ``horizon``: EventTimeTimeout expires a cell unseen
    for the horizon, so state is O(docs per horizon) — the
    dropDuplicatesWithinWatermark trade, a copy after expiry is
    re-admitted once per horizon."""
    import pandas as pd

    from ..corpus_pipeline import (
        _SEM_COS_DEN,
        _SEM_COS_NUM,
        _batch_doc_vectors,
    )

    if (ts_col is None) != (horizon is None):
        raise ValueError("ts_col and horizon must be provided together")

    if ts_col is None:
        cellv = _batch_doc_vectors(docs.select("doc_id", "text")).select(
            "cell", "doc_id", "vec"
        )
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    else:
        staged = docs.withColumn(
            "__ts", F.col(ts_col).cast("timestamp")
        ).withWatermark("__ts", horizon)
        cellv = _batch_doc_vectors(
            staged.select("doc_id", "text", "__ts"), carry=("__ts",)
        ).select(
            "cell",
            "doc_id",
            "vec",
            "__ts",
            F.unix_millis("__ts").alias("__ts_ms"),
        )
        timeout = GroupStateTimeout.EventTimeTimeout
        ttl_ms = _duration_ms(horizon)

    c2 = _SEM_COS_DEN * _SEM_COS_DEN
    n2 = _SEM_COS_NUM * _SEM_COS_NUM

    def _similar(u: list[int], v: list[int]) -> bool:
        dot = sum(a * b for a, b in zip(u, v))
        if dot <= 0:
            return False
        na = sum(a * a for a in u)
        nb = sum(b * b for b in v)
        return c2 * dot * dot >= n2 * na * nb

    def update(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        (cell,) = key
        if state.exists:
            raw_vecs, max_ord = state.get
            vecs = [[int(x) for x in u] for u in raw_vecs]
            max_ord = int(max_ord)
        else:
            vecs, max_ord = [], None
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "doc_id"
        )
        out = []
        for row in pdf.itertuples(index=False):
            did = int(row.doc_id)
            v = [int(x) for x in row.vec]
            late = max_ord is not None and did < max_ord
            kept = not any(_similar(u, v) for u in vecs)
            out.append((int(cell), did, kept, late))
            vecs.append(v)
            max_ord = did if max_ord is None else max(max_ord, did)
        state.update((vecs, max_ord))
        if ttl_ms is not None:
            state.setTimeoutTimestamp(
                max(
                    int(pdf["__ts_ms"].max()) + ttl_ms,
                    state.getCurrentWatermarkMs() + ttl_ms,
                )
            )
        yield pd.DataFrame(
            out, columns=["cell", "doc_id", "kept", "late"]
        )

    schema = StructType(
        [
            StructField("cell", LongType(), True),
            StructField("doc_id", LongType(), True),
            StructField("kept", BooleanType(), True),
            StructField("late", BooleanType(), True),
        ]
    )
    return cellv.groupBy("cell").applyInPandasWithState(
        update,
        outputStructType=schema,
        stateStructType=_SEM_STREAM_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


def phrase_stream(docs: DataFrame) -> DataFrame:
    """(phrase, n_docs, n_occurrences): the phrase-retrieval report
    updating as documents arrive — the batch phrase_match_stats gate's
    aggregation over the shared stateless phrase_count_rows transform
    (twin 38). In complete mode the final state equals the batch gate
    row for row; the per-doc counting is fully in-row (rule-20-safe:
    bigrams come from whole-array slices, never per-position access),
    so the only state is the phrases-sized aggregation."""
    from ..plans.text import phrase_report

    return phrase_report(docs)


def extract_stream(spark, path_glob: str, **kwargs) -> DataFrame:
    """Crawl front door as a stream (twin 39): newly landed WARC
    archives → HTML payloads → generic main-content extraction —
    read_warc_stream through the IDENTICAL stateless batch transforms
    (warc_html_payloads is a narrow projection,
    sources/html_extract.extract_main_text is one Arrow-batched
    mapInPandas), so stream rows equal batch rows file for file. The
    landing-prefix shape a production crawler feeds curation from."""
    from ..sources.html_extract import extract_main_text
    from ..sources.warc_source import read_warc_stream, warc_html_payloads

    return extract_main_text(
        warc_html_payloads(read_warc_stream(spark, path_glob, **kwargs))
    )


def bm25_stream(
    docs: DataFrame, weights: dict[str, int], tt: int, nn: int
) -> DataFrame:
    """(doc_id, score_ppm, n_terms): exact-integer BM25 scoring over a
    DOCUMENT STREAM — the serving shape of plans/text.
    bm25_search_ranked with the corpus model (per-term idf weights +
    totals, bm25_train) COMPILED INTO THE PLAN as literals (the
    perplexity_stream device). Per query term the interpreted
    size(filter(...)) tf count is projected ONCE into a named column
    in a prior select; score / n_terms consume only the named tf
    columns (CollapseProject will not inline a multiply-referenced
    non-trivial expression, so each tf evaluates once per row) — a
    stateless narrow projection, append mode, zero state store."""
    from ..plans.text import _SEARCH_TERMS, _TOKENS

    toks = docs.select(
        "doc_id",
        F.expr(_TOKENS).alias("t"),
    ).select("doc_id", "t", F.size("t").cast("long").alias("dl"))

    def _is(term: str):
        return lambda x: x == F.lit(term)

    tf_name = {term: f"__tf_{i}" for i, term in enumerate(_SEARCH_TERMS)}
    tfs = toks.select(
        "doc_id",
        "dl",
        *[
            F.size(F.filter(F.col("t"), _is(term)))
            .cast("long")
            .alias(tf_name[term])
            for term in _SEARCH_TERMS
        ],
    )
    contribs = []
    n_terms = []
    for term in _SEARCH_TERMS:
        w = int(weights.get(term, 0))
        tf = tf_name[term]
        n_terms.append(F.when(F.col(tf) > 0, 1).otherwise(0))
        # the division is the gate's shared floor-division text with
        # the model constants inlined (Spark `div`, positive operands)
        contribs.append(
            F.when(
                F.col(tf) > 0,
                F.expr(
                    f"(CAST({w} AS BIGINT) * 22 * "
                    f"{tf} * {tt} * 1000000) "
                    f"div (10 * CAST({tt} AS BIGINT) * "
                    f"{tf} + 3 * {tt} "
                    f"+ 9 * dl * {nn})"
                ),
            ).otherwise(F.lit(0).cast("long"))
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    nt = n_terms[0]
    for c in n_terms[1:]:
        nt = nt + c
    return tfs.select(
        "doc_id",
        score.cast("long").alias("score_ppm"),
        nt.cast("long").alias("n_terms"),
    )
