"""Jaro-Winkler similarity as an in-row Spark expression.

Spark has no native jaro_winkler; DuckDB does. This module hand-builds
the scorer from higher-order functions so the registry can pin it
differentially against DuckDB's NATIVE implementation (the
soundex_name_groups device, mirrored: there the TRANSCRIPTION was the
oracle, here the transcription is the Spark side).

Semantics pinned against duckdb.jaro_winkler_similarity on 60k
generated string pairs (round 12, zero mismatches):

- match window w = max(floor(max(|a|,|b|)/2) - 1, 0);
- greedy left-to-right matching: a[i] consumes the SMALLEST unused
  j in [i-w, i+w] with b[j] == a[i];
- transpositions t = floor(t2 / 2) where t2 = positions at which the
  matched chars disagree between a-order and b-order;
- jaro = (m/|a| + m/|b| + (m-t)/m) / 3, with jaro = 0 when m = 0
  (and for any empty input — '' vs '' scores 0, NOT 1);
- Winkler boost applied only when jaro > 0.7: jw = jaro +
  l * 0.1 * (1 - jaro) with l = common prefix length capped at 4.

Everything is kept EXACT-integer to the final ppm floor so the
cross-engine hash can pin values bit-for-bit (floats reappear only in
the oracle's native-agreement flag, with a +-1 ppm tolerance for the
float->floor boundary):

    N = m^2 * (|a| + |b|) + (m - t2 div 2) * |a| * |b|
    D = 3 * |a| * |b| * m               (jaro = N / D)
    boost iff (m/|a| + m/|b| + (m-t)/m)/3 > 0.7   IN IEEE DOUBLES
    jw_ppm = floor(1e6 * (l*D + (10-l)*N) / (10*D))   (boosted)
           = floor(1e6 * N / D)                        (otherwise)

The boost DECISION is deliberately the float comparison, with the
same expression tree in Spark, DuckDB, and the Python reference
(identical IEEE-754 ops → identical bit results): the native
implementation decides the 0.7 threshold on its float jaro, and a
rational EXACTLY equal to 7/10 computed in doubles lands just above
0.7's (below-value) double — an exact-integer 10N > 7D condition
diverges from native precisely at those ties (found by hypothesis:
'C0011' vs 'C00000', jaro = 7/10, native boosts). Values stay
exact-integer; only the branch predicate is float.

Cost: the matcher is an interpreted aggregate fold (rule 10) of
O(|a| * w) substring probes per row — built for NAME-scale strings
(record linkage), not documents. The matched-index array is consumed
per-position by several downstream expressions, so batch callers MUST
localCheckpoint after jw_match_columns (the rule-10 sliding-window
trap); jaro_winkler_scored does this for you. No streaming twin: the
per-position consumption has no stream-safe rebuild (rule 20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# matched b-indices in a-order; the match-equality invariant
# b[mj[k]] == a[i_k] lets every later step read chars from b alone.
# array_compact(array(x)) appends x only when non-NULL with ONE
# evaluation of the candidate search (no CASE double-inline); the
# if() guards Spark's sequence(lo, hi) counting DOWN when lo > hi
# (rule 4).
_MJ_EXPR = """
aggregate(
  if(length({a}) < 1, array(), sequence(0, cast(length({a}) as int) - 1)),
  cast(array() as array<int>),
  (acc, i) -> concat(acc, array_compact(array(array_min(filter(
      if(greatest(0, i - __w) > least(cast(length({b}) as int) - 1, i + __w),
         array(),
         sequence(greatest(0, i - __w),
                  least(cast(length({b}) as int) - 1, i + __w))),
      j -> substring({b}, j + 1, 1) = substring({a}, i + 1, 1)
           and not array_contains(acc, j))))))
)
"""

_T2_EXPR = """
cast(size(filter(
    if(size(mj) < 1, array(), sequence(1, size(mj))),
    k -> substring({b}, element_at(mj, k) + 1, 1)
         != substring({b}, element_at(array_sort(mj), k) + 1, 1)))
 as bigint)
"""

# substring(a,1,k) = substring(b,1,k) holds iff k <= lcp, so the
# filter size IS min(4, lcp) — no sequential scan needed.
_PREFIX_EXPR = """
cast(size(filter(array(1, 2, 3, 4),
    k -> k <= least(la, lb)
         and substring({a}, 1, k) = substring({b}, 1, k)))
 as bigint)
"""

_PPM_EXPR = """
case when m = 0 then cast(0 as bigint) else
  cast((1000000 * (case when
         ((m / cast(la as double)) + (m / cast(lb as double))
          + ((m - t2 div 2) / cast(m as double))) / cast(3 as double)
         > cast(0.7 as double)
       then prefix_l * __D + (10 - prefix_l) * __N
       else 10 * __N end)) div (10 * __D) as bigint) end
"""


def jw_match_columns(df: DataFrame, a: str, b: str) -> DataFrame:
    """Append la, lb and the matched-index array ``mj`` for the string
    columns ``a``/``b``. The caller MUST put a materialization
    boundary (localCheckpoint) between this and anything that reads
    ``mj`` per-position (rule 10)."""
    return df.withColumn(
        "la", F.expr(f"cast(length({a}) as bigint)")
    ).withColumn(
        "lb", F.expr(f"cast(length({b}) as bigint)")
    ).withColumn(
        "__w",
        F.expr(
            f"greatest(cast(greatest(length({a}), length({b}))"
            " div 2 as int) - 1, 0)"
        ),
    ).withColumn("mj", F.expr(_MJ_EXPR.format(a=a, b=b))).drop("__w")


def jw_score_columns(df: DataFrame, a: str, b: str) -> DataFrame:
    """From (la, lb, mj) append m, t2, prefix_l and the exact-integer
    jw_ppm. Expects ``df`` to be materialized past jw_match_columns."""
    counted = df.withColumn(
        "m", F.expr("cast(size(mj) as bigint)")
    ).withColumn("t2", F.expr(_T2_EXPR.format(b=b))).withColumn(
        "prefix_l", F.expr(_PREFIX_EXPR.format(a=a, b=b))
    )
    return (
        counted.withColumn(
            "__N", F.expr("m*m*(la+lb) + (m - t2 div 2)*la*lb")
        )
        .withColumn("__D", F.expr("3*la*lb*m"))
        .withColumn("jw_ppm", F.expr(_PPM_EXPR))
        .drop("__N", "__D", "mj")
    )


def jaro_winkler_scored(df: DataFrame, a: str, b: str) -> DataFrame:
    """One-call batch scorer: df + (la, lb, m, t2, prefix_l, jw_ppm),
    with the rule-10 boundary between the matcher fold and its
    per-position consumers."""
    return jw_score_columns(
        jw_match_columns(df, a, b).localCheckpoint(eager=False), a, b
    )


def jaro_winkler_ref(a: str, b: str) -> tuple[int, int, int, int]:
    """Pure-Python reference: (m, t2, prefix_l, jw_ppm) under the
    pinned DuckDB-native semantics — the hypothesis differential's
    independent implementation."""
    la, lb = len(a), len(b)
    w = max(max(la, lb) // 2 - 1, 0)
    used = [False] * lb
    mj: list[int] = []
    for i, c in enumerate(a):
        for j in range(max(0, i - w), min(lb - 1, i + w) + 1):
            if not used[j] and b[j] == c:
                used[j] = True
                mj.append(j)
                break
    m = len(mj)
    if m == 0:
        return (0, 0, 0, 0)
    srt = sorted(mj)
    t2 = sum(1 for k in range(m) if b[mj[k]] != b[srt[k]])
    prefix_l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix_l += 1
    n = m * m * (la + lb) + (m - t2 // 2) * la * lb
    d = 3 * la * lb * m
    # float boost decision — the same IEEE expression tree as both
    # engine sides (see module docstring)
    boost = (m / la + m / lb + (m - t2 // 2) / m) / 3 > 0.7
    numer = prefix_l * d + (10 - prefix_l) * n if boost else 10 * n
    return (m, t2, prefix_l, (1_000_000 * numer) // (10 * d))
