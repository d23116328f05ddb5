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


# ---------------------------------------------------------------------------
# FastSS k=1 blocking completeness (plans/core.fastss_key_rows spec):
# ANY two strings within edit distance 1 share at least one blocking
# key (the string itself ∪ its single-deletion variants) — the
# property that makes the fuzzy-match candidate join lossless at the
# verify bound. Pure-Python mirror of the SQL key builder.
# ---------------------------------------------------------------------------


def _fastss_keys(w: str) -> set[str]:
    return {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}


_WORD = st.text(alphabet="ab0", min_size=1, max_size=8)


@settings(max_examples=400, deadline=None)
@given(_WORD, st.data())
def test_fastss_k1_blocking_is_complete(w, data):
    op = data.draw(st.sampled_from(["sub", "ins", "del"]))
    ch = data.draw(st.sampled_from("ab0"))
    if op == "sub":
        i = data.draw(st.integers(0, len(w) - 1))
        v = w[:i] + ch + w[i + 1 :]
    elif op == "ins":
        i = data.draw(st.integers(0, len(w)))
        v = w[:i] + ch + w[i:]
    else:
        i = data.draw(st.integers(0, len(w) - 1))
        v = w[:i] + w[i + 1 :]
    # v is within edit distance 1 of w (possibly 0) → keys must overlap
    assert _fastss_keys(w) & _fastss_keys(v), (w, v, op)


# ---------------------------------------------------------------------------
# Degree-oriented triangle counting == brute force on random graphs
# (operators/graph.triangle_counts_per_node spec, pure-Python mirror:
# orientation by packed (deg, id) key, wedge enumeration, closing
# lookup — the exact algorithm the Spark plan runs).
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        max_size=25,
    )
)
def test_degree_oriented_triangles_match_brute_force(raw_edges):
    from collections import Counter
    from itertools import combinations

    und = {(min(a, b), max(a, b)) for a, b in raw_edges}
    nodes = {n for e in und for n in e}
    # brute force: every vertex triple with all three edges present
    brute = Counter()
    for u, v, w in combinations(sorted(nodes), 3):
        if (
            (u, v) in und
            and (v, w) in und
            and (u, w) in und
        ):
            brute[u] += 1
            brute[v] += 1
            brute[w] += 1
    # degree-oriented mirror
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    okey = {n: (deg[n] << 32) + n for n in nodes}
    oriented = {
        (a, b) if okey[a] < okey[b] else (b, a) for a, b in und
    }
    by_src: dict[int, list[int]] = {}
    for s, d in oriented:
        by_src.setdefault(s, []).append(d)
    got = Counter()
    for u, outs in by_src.items():
        outs = sorted(outs, key=lambda n: okey[n])
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                v, w = outs[i], outs[j]
                if (v, w) in oriented:
                    got[u] += 1
                    got[v] += 1
                    got[w] += 1
    assert got == brute, (sorted(und), dict(got), dict(brute))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        # df <= n (a term's doc frequency can't exceed the doc count)
        st.tuples(st.integers(1, 10**12), st.integers(1, 10**12)).map(
            lambda p: (max(p), min(p))
        ),
        min_size=1,
        max_size=50,
    )
)
def test_idf_ladder_is_clamped_floor_log2(pairs):
    """keyword_search_ranked's idf weight ladder must equal
    floor(log2(n/df)) clamped to [0, 16] — executed as the ACTUAL SQL
    text in DuckDB against an exact integer reference."""
    import duckdb

    from jobinsight_data_pipeline_v2_spark.plans.text import (
        _IDF_CLAMP,
        _dsir_class_case,
    )

    def ref(n: int, df: int) -> int:
        c = 0
        while df << (c + 1) <= n:
            c += 1
        return min(_IDF_CLAMP, c)

    values = ", ".join(
        f"(CAST({n} AS BIGINT), CAST({d} AS BIGINT))" for n, d in pairs
    )
    sql = (
        f"SELECT {_dsir_class_case('n', 'df', _IDF_CLAMP)} FROM "
        f"(VALUES {values}) t(n, df)"
    )
    got = [r[0] for r in duckdb.execute(sql).fetchall()]
    assert got == [ref(n, d) for n, d in pairs]


@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyzW", min_size=1, max_size=24),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=150, deadline=None)
def test_soundex_transcription_matches_python_reference(names):
    """The soundex SQL transcription (the DuckDB oracle side of
    soundex_name_groups) equals a direct pure-Python implementation of
    the probed Spark semantics — lastCode starts at the first letter's
    code, H/W continue WITHOUT updating it, vowels reset it to 0
    without appending, append iff code ∉ {0, lastCode} — over random
    alphabetic strings (far past the 17-name battery)."""
    import duckdb

    from jobinsight_data_pipeline_v2_spark.plans.text import (
        _SOUNDEX_MAP,
        _soundex_sql,
    )

    def ref(name: str) -> str:
        u = name.upper()
        code = lambda ch: _SOUNDEX_MAP[ord(ch) - ord("A")]
        last = code(u[0])
        out = []
        for ch in u[1:]:
            c = code(ch)
            if c == "7":
                continue
            if c != "0" and c != last:
                out.append(c)
            last = c
        return u[0] + ("".join(out) + "000")[:3]

    values = ", ".join(f"('{n}')" for n in names)
    sql = (
        f"SELECT {_soundex_sql('name')} FROM (VALUES {values}) t(name)"
    )
    got = [r[0] for r in duckdb.execute(sql).fetchall()]
    assert got == [ref(n) for n in names]


@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1,
             max_size=60)
)
@settings(max_examples=300, deadline=None)
def test_cusum_closed_form_equals_recurrence(devs):
    """The CUSUM gate's window algebra: the Page recurrence
    S_d = max(0, S_{d-1} + dev_d) must equal the closed form
    W_d − min(0, min_{j≤d} W_j) with W the running deviation sum —
    the identity the gate's two prefix windows rely on."""
    s = 0
    w = 0
    mn = 0
    for dev in devs:
        s = max(0, s + dev)
        w += dev
        mn = min(mn, w)
        assert s == w - min(0, mn)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # value (heavy ties)
            st.integers(min_value=0, max_value=1),  # arm
        ),
        min_size=2,
        max_size=80,
    )
)
@settings(max_examples=300, deadline=None)
def test_mann_whitney_doubled_ranks_equal_midranks(rows):
    """The gate's tie arithmetic: 2R_g = Σ_v cnt_{g,v}·(2·below_v +
    c_v + 1) must equal twice the classic average-midrank sum, and
    2U_0 + 2U_1 == 2·n_0·n_1."""
    vals = sorted(r[0] for r in rows)
    # classic midranks: rank positions are 1-based over the sorted
    # multiset; tied values share the mean of their positions
    midrank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        midrank[vals[i]] = (i + 1 + j) / 2  # mean of positions i+1..j
        i = j
    two_r = [0, 0]
    for v, a in rows:
        two_r[a] += int(2 * midrank[v])
    # the gate's formula
    from collections import Counter

    c_v = Counter(v for v, _ in rows)
    got = [0, 0]
    for v, a in rows:
        below = sum(c for u, c in c_v.items() if u < v)
        got[a] += 2 * below + c_v[v] + 1
    assert got == two_r
    n = [sum(1 for _, a in rows if a == g) for g in (0, 1)]
    u = [got[g] - n[g] * (n[g] + 1) for g in (0, 1)]
    assert u[0] + u[1] == 2 * n[0] * n[1]


@given(
    st.integers(min_value=1, max_value=500),  # n rows
    st.integers(min_value=1, max_value=16),  # k bins
)
@settings(max_examples=300, deadline=None)
def test_equidepth_bin_rule_populations(n, k):
    """The rank rule bin = ((rn−1)·k) div n must produce bin
    populations of exactly n div k or n div k + 1, cover bins
    0..min(k,n)−1 contiguously, and be monotone in rank — the
    equal-frequency guarantee the gate's closed form rests on."""
    bins = [((rn - 1) * k) // n for rn in range(1, n + 1)]
    assert bins == sorted(bins)
    assert bins[0] == 0 and bins[-1] == ((n - 1) * k) // n <= k - 1
    from collections import Counter

    pops = Counter(bins)
    lo = n // k
    assert all(c in (lo, lo + 1) for c in pops.values())
    if n >= k:
        # with at least one row per bin the bins are contiguous 0..k−1;
        # below that the rule scatters ranks across [0, k) by design
        assert sorted(pops) == list(range(k))


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd Customer#013", max_size=16),
            st.text(alphabet="abcd Customer#013", max_size=16),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_jaro_winkler_ref_matches_duckdb_native(pairs):
    """The pure-Python Jaro-Winkler reference (the pinned semantics:
    greedy window matching, floored transposition halves, boost only
    past jaro 0.7, '' scores 0) agrees with DuckDB's NATIVE
    jaro_winkler_similarity within 1 ppm on arbitrary strings — the
    independent leg of the jaro_winkler_pairs differential."""
    import duckdb
    import math

    from jobinsight_data_pipeline_v2_spark.operators.jarowinkler import (
        jaro_winkler_ref,
    )

    con = duckdb.connect()
    for a, b in pairs:
        native = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        ppm = jaro_winkler_ref(a, b)[3]
        assert abs(ppm - math.floor(1_000_000 * native)) <= 1, (a, b)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd#01", max_size=14),
            st.text(alphabet="abcd#01", max_size=14),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_jw_oracle_transcription_matches_reference(pairs):
    """The shared DuckDB JW transcription (jw_oracle_ctes +
    JW_PPM_SQL — the oracle side of jaro_winkler_pairs AND the
    record-linkage γ_jw comparator) reproduces the pure-Python
    reference count-for-count (m, t2, prefix_l, jw_ppm)."""
    import duckdb

    from jobinsight_data_pipeline_v2_spark.operators.jarowinkler import (
        jaro_winkler_ref,
    )
    from jobinsight_data_pipeline_v2_spark.plans.text import (
        JW_PPM_SQL,
        jw_oracle_ctes,
    )

    values = ", ".join(
        "('%s','%s')" % (a.replace("'", ""), b.replace("'", ""))
        for a, b in pairs
    )
    sql = f"""
    WITH pairs AS (SELECT * FROM (VALUES {values}) t(a, b)),
    {jw_oracle_ctes('pairs', 'a', 'b')}
    SELECT a, b, m, t2, prefix_l, ({JW_PPM_SQL}) AS ppm
    FROM __jw_counted
    """
    for a, b, m, t2, pl, ppm in duckdb.execute(sql).fetchall():
        rm, rt2, rpl, rppm = jaro_winkler_ref(a, b)
        if rm == 0:
            assert m == 0 and ppm == 0, (a, b)
        else:
            assert (m, t2, pl, ppm) == (rm, rt2, rpl, rppm), (a, b)


def _fastss_keys_k2(w: str) -> set[str]:
    d1 = {w[:i] + w[i + 1 :] for i in range(len(w))}
    d2 = {
        w[:p] + w[p + 1 : q] + w[q + 1 :]
        for p in range(len(w) - 1)
        for q in range(p + 1, len(w))
    }
    return {w} | d1 | d2


@settings(max_examples=400, deadline=None)
@given(_WORD, st.data())
def test_fastss_k2_blocking_is_complete(w, data):
    """r12: ed(u, v) <= 2 implies the depth-2 deletion neighborhoods
    intersect (the FastSS theorem at k=2 — the bound
    fuzzy_name_match_k2 and fuzzy_match_stream(max_dist=2) rely on).
    v is built from w by TWO independent random edit ops."""
    v = w
    for _ in range(2):
        op = data.draw(st.sampled_from(["sub", "ins", "del", "none"]))
        if op == "none" or (not v and op != "ins"):
            continue
        ch = data.draw(st.sampled_from("ab0"))
        if op == "sub":
            i = data.draw(st.integers(0, len(v) - 1))
            v = v[:i] + ch + v[i + 1 :]
        elif op == "ins":
            i = data.draw(st.integers(0, len(v)))
            v = v[:i] + ch + v[i:]
        else:
            i = data.draw(st.integers(0, len(v) - 1))
            v = v[:i] + v[i + 1 :]
    assert _fastss_keys_k2(w) & _fastss_keys_k2(v), (w, v)
