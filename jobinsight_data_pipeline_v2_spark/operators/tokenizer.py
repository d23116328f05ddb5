"""BPE merge training on Spark (tokenizer-prep support).

Greedy byte-pair-encoding training is an iterative global argmax: count
every adjacent symbol pair in the corpus, merge the most frequent pair
everywhere, repeat. The Spark-first decomposition per round:

- pair counting: in-row adjacent-pair construction + explode + ONE
  map-side-combined count on the pair key (the `bpe_pair_counts` gate
  pins this statistic against DuckDB);
- merge selection: TakeOrdered(1) with a total order (count desc, then
  lexicographic) — a single-row fetch, the sanctioned driver action;
- merge application: a narrow in-row left-to-right fold per document —
  no shuffle, no Python, whole corpus rewritten in one map stage.

Rounds run a driver loop O(n_merges) times (the sanctioned iterative-
algorithm case, like kmeans_centroids / component_min_labels); each
round's symbol table is localCheckpointed so lineage stays flat and
the fold's many references to the previous array never re-inline its
construction (CLAUDE.md rule 10).

Symbol granularity is the caller's pre-tokenization: this corpus is
single-space word soup, so symbols start as words and a merge produces
the space-joined super-token — structurally identical to char-level
BPE, which would just seed with character arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def adjacent_pair_counts(symbols: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-pair histogram over (id, s: array<string>).

    In-row pair structs (guarded against Spark's descending
    ``sequence(1, 0)``) → explode → one count keyed on the pair;
    partial aggregation collapses head pairs before the exchange.
    """
    return (
        symbols.select(
            F.explode(
                F.expr(
                    """
                    if(size(s) >= 2,
                       transform(sequence(1, size(s) - 1),
                                 i -> struct(element_at(s, i) AS a,
                                             element_at(s, i + 1) AS b)),
                       cast(array() as array<struct<a: string, b: string>>))
                    """
                )
            ).alias("p")
        )
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def apply_merge(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every non-overlapping left-to-right (a, b) adjacency
    with the joined symbol ``a + ' ' + b`` — the standard greedy BPE
    application, as one narrow fold per document."""
    qa, qb = _sql_quote(a), _sql_quote(b)
    qm = _sql_quote(a + " " + b)
    return symbols.select(
        "id",
        F.expr(
            f"""
            if(size(s) = 0, s,
               aggregate(
                 sequence(1, size(s)),
                 named_struct('out', cast(array() as array<string>),
                              'skip', false),
                 (acc, i) -> if(acc.skip,
                    named_struct('out', acc.out, 'skip', false),
                    if(i < size(s) AND element_at(s, i) = {qa}
                           AND element_at(s, i + 1) = {qb},
                       named_struct('out', concat(acc.out, array({qm})),
                                    'skip', true),
                       named_struct('out',
                                    concat(acc.out,
                                           array(element_at(s, i))),
                                    'skip', false))),
                 acc -> acc.out))
            """
        ).alias("s"),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` greedy BPE merges over the corpus.

    Returns [(a, b, count), …] in the order learned. Ties break
    deterministically (count desc, then (a, b) lexicographic), so
    retraining on the same corpus yields the same merge table. Stops
    early when no pair reaches ``min_count`` (merging hapax pairs
    carries no compression signal).
    """
    import gc

    symbols = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"filter(split({text_col}, ' '), t -> t != '')").alias("s"),
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            adjacent_pair_counts(symbols)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, n))
        prev = symbols
        symbols = apply_merge(symbols, a, b).localCheckpoint(eager=False)
        # the argmax collect above already materialized `prev`; force
        # the NEW checkpoint now so its lineage no longer needs the
        # previous round's blocks, then drop the only Python ref and
        # let the ContextCleaner free them — otherwise every round's
        # full corpus copy stays pinned in block storage for the whole
        # training run (bench.py's gc discipline).
        symbols.count()
        del prev
        gc.collect()
    return merges
