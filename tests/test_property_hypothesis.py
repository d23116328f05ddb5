"""Hypothesis property tests for the driver-side combinatorial logic
that the Spark fuzz harnesses exercise only at a handful of seeds:
BPE batch selection/packing and the substring-span gap arithmetic.
Pure Python — no SparkSession — so hundreds of generated cases run in
milliseconds and shrinking produces minimal counterexamples.
"""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")  # optional dep — skip, don't break collection
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from jobinsight_data_pipeline_v2_spark.operators.tokenizer import (
    _encode_batches,
    _select_merge_batch,
)

# --- strategies ------------------------------------------------------------

_SYM = st.text(alphabet="abcd", min_size=1, max_size=3)


def _merge_tables():
    """Rank-ordered merge lists, including composed symbols (outputs of
    earlier ranks reused as later members) — the regime that forces
    batch flushes."""

    @st.composite
    def build(draw):
        n = draw(st.integers(0, 12))
        pairs: list[tuple[str, str]] = []
        for _ in range(n):
            pool = [s for p in pairs for s in (p[0] + " " + p[1],)]
            cand = st.one_of(_SYM, st.sampled_from(pool)) if pool else _SYM
            a, b = draw(cand), draw(cand)
            if (a, b) not in pairs:
                pairs.append((a, b))
        return pairs

    return build()


# --- _encode_batches -------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(_merge_tables())
def test_encode_batches_partition_and_disjointness(pairs):
    """Batches must (1) concatenate back to the input in order, and
    (2) within a batch be mutually symbol-disjoint AND never reference
    a symbol produced by an earlier pair of the same batch — the two
    preconditions under which one apply_merges fold equals sequential
    rank-order application."""
    batches = _encode_batches(pairs)
    assert [p for b in batches for p in b] == pairs
    assert all(b for b in batches) or not pairs
    for batch in batches:
        used: set[str] = set()
        produced: set[str] = set()
        for a, b in batch:
            assert a not in used and b not in used, (batch, (a, b))
            assert a not in produced and b not in produced, (batch, (a, b))
            used.update((a, b))
            produced.add(a + " " + b)


# --- _select_merge_batch ---------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(_SYM, _SYM, st.integers(1, 50)),
        min_size=0,
        max_size=20,
    ),
    st.integers(1, 6),
)
def test_select_merge_batch_safety_invariants(rows, limit):
    """Whatever the ranked slice looks like: the batch is a prefix-
    selected symbol-disjoint set, its first element is the global
    argmax (row 0), and every later member's count is STRICTLY above
    the safety bound (the first skipped/overlapping count), so no
    created pair can outrank it mid-batch."""
    ranked = sorted(
        [{"a": a, "b": b, "n": n} for a, b, n in rows],
        key=lambda r: (-r["n"], r["a"], r["b"]),
    )
    batch = _select_merge_batch(ranked, limit, min_count=2, saw_all_pairs=True)
    if not batch:
        return
    assert (batch[0][0], batch[0][1]) == (ranked[0]["a"], ranked[0]["b"])
    assert len(batch) <= limit
    used: set[str] = set()
    for a, b, n in batch:
        assert a not in used and b not in used
        used.update((a, b))
    # spec-level safety (derived from WHY the batch is safe, not from
    # the implementation's walk): applying the batch can only create
    # or boost pairs that involve a batch symbol, and any such pair's
    # current count is bounded by some ranked pair sharing a symbol
    # with the batch. So every non-first member must STRICTLY outrank
    # the best unselected pair that touches the batch's symbols — else
    # sequential BPE might merge that one (or a created pair tied
    # with it) first.
    in_batch = {(a, b) for a, b, _ in batch}
    touching = [
        r["n"]
        for r in ranked
        if (r["a"], r["b"]) not in in_batch
        and (r["a"] in used or r["b"] in used)
    ]
    if touching:
        bound = max(touching)
        for m in batch[1:]:
            assert m[2] > bound, (batch, bound)


# --- substring-span gap arithmetic ----------------------------------------


@settings(max_examples=500, deadline=None)
@given(
    st.lists(st.integers(1, 60), min_size=0, max_size=25, unique=True),
    st.integers(2, 8),
)
def test_span_gap_arithmetic_equals_coverage(positions, l):
    """The closed forms the engine evaluates in-row over the sorted
    redundant-position list — n_removed = l + Σ min(l, gap_j),
    n_spans = 1 + #{j : gap_j > l} — must equal brute-force interval
    union coverage for EVERY position multiset, not just the shapes a
    random corpus generates."""
    dps = sorted(positions)
    covered: set[int] = set()
    for p in dps:
        covered.update(range(p, p + l))
    # brute-force island count over the covered set
    n_spans_bf = sum(1 for p in covered if p - 1 not in covered)
    if not dps:
        n_removed, n_spans = 0, 0
    else:
        n_removed = l + sum(
            min(l, b - a) for a, b in zip(dps, dps[1:])
        )
        n_spans = 1 + sum(1 for a, b in zip(dps, dps[1:]) if b > a + l)
    assert n_removed == len(covered)
    assert n_spans == n_spans_bf


# --- DSIR floor-log2 class ladder ------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 10**14), st.integers(1, 10**14)
        ),
        min_size=1,
        max_size=50,
    )
)
def test_dsir_class_ladder_is_clamped_floor_log2(pairs):
    """The generated CASE ladder (integer multiply/compare only) must
    equal floor(log2(num/den)) clamped to [-8, 8] for arbitrary
    positive BIGINTs — checked by executing the ACTUAL SQL text in
    DuckDB against an exact integer-arithmetic reference (no float
    log anywhere, so no ulp excuses)."""
    import duckdb

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _DSIR_CLAMP,
        _dsir_class_case,
    )

    def ref(num: int, den: int) -> int:
        if num >= den:  # largest c with den * 2^c <= num
            c = 0
            while den << (c + 1) <= num:
                c += 1
            return min(_DSIR_CLAMP, c)
        k = 0  # smallest k with num * 2^k >= den  ->  floor = -k
        while (num << k) < den and k <= _DSIR_CLAMP:
            k += 1
        return -min(_DSIR_CLAMP, k)

    values = ", ".join(
        f"(CAST({n} AS BIGINT), CAST({d} AS BIGINT))" for n, d in pairs
    )
    sql = (
        f"SELECT {_dsir_class_case('num', 'den')} FROM "
        f"(VALUES {values}) t(num, den)"
    )
    got = [r[0] for r in duckdb.execute(sql).fetchall()]
    assert got == [ref(n, d) for n, d in pairs]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10**12), st.integers(1, 10**12)),
        min_size=1,
        max_size=50,
    )
)
def test_ppl_ladder_clamp16_is_clamped_floor_log2(pairs):
    """The perplexity gate runs the same ladder generator at clamp 16
    (lm_perplexity_buckets / ppl_train_model) — pin that configuration
    too: executing the ACTUAL SQL text in DuckDB must equal
    floor(log2(num/den)) clamped to [-16, 16] on arbitrary BIGINTs."""
    import duckdb

    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        _PPL_CLAMP,
        _dsir_class_case,
    )

    def ref(num: int, den: int) -> int:
        if num >= den:
            c = 0
            while den << (c + 1) <= num:
                c += 1
            return min(_PPL_CLAMP, c)
        k = 0
        while (num << k) < den and k <= _PPL_CLAMP:
            k += 1
        return -min(_PPL_CLAMP, k)

    values = ", ".join(
        f"(CAST({n} AS BIGINT), CAST({d} AS BIGINT))" for n, d in pairs
    )
    sql = (
        f"SELECT {_dsir_class_case('num', 'den', clamp=_PPL_CLAMP)} FROM "
        f"(VALUES {values}) t(num, den)"
    )
    got = [r[0] for r in duckdb.execute(sql).fetchall()]
    assert got == [ref(n, d) for n, d in pairs]
