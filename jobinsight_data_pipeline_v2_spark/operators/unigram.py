"""Unigram-LM (SentencePiece-style) subword tokenizer on Spark — the
second major tokenizer family next to BPE (operators/tokenizer.py).

Kudo (2018) trains a piece vocabulary by EM over a unigram language
model and encodes with Viterbi segmentation. The Spark-first,
integer-exact re-expression here:

- **Seeding**: every substring (length ≤ ``max_piece_len``) of every
  distinct corpus word, weighted by word frequency — generated
  IN-ROW over the word dictionary (Heaps-law bounded, vocabulary-
  scale, the frame SentencePiece itself trains on), one map-side-
  combined count. Top ``vocab_size·seed_mult`` by (count desc, piece)
  plus every single character (the coverage guarantee: any word
  always has at least the char-by-char segmentation).
- **Scoring**: integer log-probability surrogate — the DSIR floor-log2
  device: ``score(p) = floor(log2(count_p / total))`` computed with
  exact integer shifts on the driver (counts are driver-side,
  vocabulary-sized), clamped at ``-_SCORE_CLAMP``. No float log
  anywhere, so retraining is bit-stable.
- **EM rounds**: hard (Viterbi) EM — each round Viterbi-encodes the
  word DICTIONARY under the current scores (one narrow Spark job over
  vocabulary-sized rows), usage = Σ word_count per piece used, prune
  to the top ``vocab_size`` by (usage desc, piece) keeping all single
  chars, re-score, repeat. The driver loop is the sanctioned
  iterative shape (bpe_train / kmeans_centroids).
- **Encode**: fully IN-ROW Viterbi as one SQL expression — the piece
  scores compile into the plan as a constant-folded map literal (the
  perplexity_stream device), the DP fold and backtrace are nested
  ``aggregate`` folds over the word's character positions, and the
  whole transform is a narrow zero-shuffle projection — identical on
  batch and streaming frames. Maximize Σ score with composite
  ``score·4096 − 1`` per piece (equal-score segmentations prefer
  FEWER pieces); remaining ties resolve to the longest piece at each
  DP step (ascending start scan with strict improvement). The same
  rule is implemented independently in tests' pure-Python reference.

Pieces carry SentencePiece's ``▁`` word-begin marker, so an encoded
stream reconstructs the exact original text:
``trim(replace(concat(pieces), '▁', ' '))`` — what the
``unigram_encode_roundtrip`` gate hash-pins against the pristine
corpus (the bpe_encode_roundtrip device).

Scale: training touches only the word dictionary (vocabulary-sized at
any corpus size); encoding is one narrow pass over the corpus with a
vocab-sized literal — no shuffle, no UDF, no collect on corpus-sized
frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenizer import _sql_quote

_MARK = "▁"  # ▁ SentencePiece word-begin marker
_SCORE_CLAMP = 30
_PIECE_W = 4096  # composite weight: score dominates, then piece count
_BAD = -(1 << 30)  # absent-piece sentinel inside the DP fold


def _floor_log2_ratio(c: int, total: int) -> int:
    """floor(log2(c / total)) for 0 < c <= total, exact integer math,
    clamped at -_SCORE_CLAMP."""
    k = 0
    cc = c
    while cc < total and k < _SCORE_CLAMP:
        cc <<= 1
        k += 1
    return -k


def _vocab_map_sql(vocab: list[tuple[str, int]]) -> str:
    """{piece: score} as a constant-foldable map literal."""
    keys = ", ".join(_sql_quote(p) for p, _ in vocab)
    vals = ", ".join(f"{s}L" for _, s in vocab)
    return f"map_from_arrays(array({keys}), array({vals}))"


def _viterbi_pieces_sql(
    wv: str, vocab: list[tuple[str, int]], max_piece_len: int
) -> str:
    """SQL expression: word (string variable ``wv``) → array of pieces
    under the vocab's Viterbi-optimal segmentation. Single characters
    must be in ``vocab`` (reachability); enforced by the trainer."""
    vm = _vocab_map_sql(vocab)
    # candidate ending at position i starting at char p (1-based):
    # prev state acc[p] (DP position p-1), piece substr(w, p, i-p+1)
    cand = (
        f"element_at(acc, p).sc + (coalesce(element_at({vm}, "
        f"substr({wv}, p, i - p + 1)), {_BAD}L) * {_PIECE_W} - 1)"
    )
    dp = (
        f"aggregate(sequence(1, length({wv})), "
        f"array(named_struct('sc', 0L, 'bk', 0)), "
        f"(acc, i) -> acc || array("
        f"aggregate(sequence(greatest(1, i - {max_piece_len - 1}), i), "
        f"named_struct('sc', {-(1 << 62)}L, 'bk', 0), "
        f"(best, p) -> if({cand} > best.sc, "
        f"named_struct('sc', cast(({cand}) as bigint), 'bk', p - 1), "
        f"best))))"
    )
    back = (
        f"aggregate(sequence(1, length({wv})), "
        f"named_struct('pos', length({wv}), 'ps', slice(array(''), 1, 0)), "
        f"(st, z) -> if(st.pos <= 0, st, named_struct("
        f"'pos', element_at(acc, st.pos + 1).bk, "
        f"'ps', concat(array(substr({wv}, "
        f"element_at(acc, st.pos + 1).bk + 1, "
        f"st.pos - element_at(acc, st.pos + 1).bk)), st.ps))), "
        f"st -> st.ps)"
    )
    return f"element_at(transform(array({dp}), acc -> {back}), 1)"


def _marked_word_pieces_sql(
    wv: str, vocab: list[tuple[str, int]], max_piece_len: int
) -> str:
    """Word → pieces with the first piece carrying the ▁ marker."""
    vit = _viterbi_pieces_sql(wv, vocab, max_piece_len)
    return (
        f"element_at(transform(array({vit}), ps -> concat("
        f"array(concat('{_MARK}', element_at(ps, 1))), "
        f"slice(ps, 2, greatest(size(ps) - 1, 0)))), 1)"
    )


def unigram_encode(
    symbols: DataFrame,
    vocab: list[tuple[str, int]],
    max_piece_len: int = 4,
) -> DataFrame:
    """(id, s: array<string> words) → (id, pieces: array<string>):
    Viterbi segmentation of every word, word-begin pieces prefixed
    with ▁. One narrow zero-shuffle projection (streaming-safe — the
    scores ride as a constant-folded map literal). Empty-string words
    contribute no pieces (guarded: an unguarded length-0 word would
    drive sequence(1, 0) DOWN into element_at(acc, 0) — rule 4;
    review r8)."""
    marked = _marked_word_pieces_sql("w", vocab, max_piece_len)
    expr = (
        "flatten(transform(s, w -> "
        f"if(length(w) = 0, slice(array(''), 1, 0), {marked})))"
    )
    return symbols.select("id", F.expr(expr).alias("pieces"))


def unigram_train(
    df: DataFrame,
    vocab_size: int = 48,
    n_rounds: int = 2,
    max_piece_len: int = 4,
    seed_mult: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: dict | None = None,
) -> list[tuple[str, int]]:
    """Train a unigram-LM piece vocabulary; returns [(piece, score)]
    sorted (score desc, piece) — deterministic, integer-exact.

    Hard-EM: seed substring counts → score → Viterbi-encode the word
    dictionary → usage counts → prune to ``vocab_size`` (all single
    characters always survive) → re-score; ``n_rounds`` times.
    ``stats`` records {'n_seed': …, 'usage_rounds': [n_alive, …]}.
    """
    toks = df.select(
        F.explode(
            F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
        ).alias("word")
    )
    word_dict = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # seed: all substrings up to max_piece_len, weighted by word count
    subs_expr = (
        "flatten(transform(sequence(1, length(word)), p -> "
        f"transform(sequence(1, least({max_piece_len}, "
        "length(word) - p + 1)), l -> substr(word, p, l))))"
    )
    seed_rows = (
        word_dict.select(F.explode(F.expr(subs_expr)).alias("piece"), "c")
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("n"))
        .orderBy(F.desc("n"), "piece")
        .limit(vocab_size * seed_mult)
        .collect()
    )
    counts: dict[str, int] = {r["piece"]: int(r["n"]) for r in seed_rows}
    # coverage guarantee: every character of the corpus alphabet
    chars = (
        word_dict.select(
            F.explode(F.expr("split(word, '')")).alias("ch"), "c"
        )
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.sum("c").cast("long").alias("n"))
        .collect()
    )
    for r in chars:
        counts.setdefault(r["ch"], int(r["n"]))
    if stats is not None:
        stats["n_seed"] = len(counts)
        stats["usage_rounds"] = []

    def score_table(cnts: dict[str, int]) -> list[tuple[str, int]]:
        total = sum(cnts.values())
        tab = [(p, _floor_log2_ratio(c, total)) for p, c in cnts.items()]
        tab.sort(key=lambda t: (-t[1], t[0]))
        return tab

    vocab = score_table(counts)
    for _ in range(n_rounds):
        # Viterbi-encode the word dictionary under the current scores
        # (no ▁ marker — usage counts are on raw pieces) and weight
        # each word's pieces by its corpus count. One narrow job over
        # the vocabulary-sized dictionary.
        usage_rows = (
            word_dict.select(
                F.explode(
                    F.expr(
                        _viterbi_pieces_sql("word", vocab, max_piece_len)
                    )
                ).alias("piece"),
                "c",
            )
            .groupBy("piece")
            .agg(F.sum("c").cast("long").alias("n"))
            .orderBy(F.desc("n"), "piece")
            .collect()
        )
        usage = {r["piece"]: int(r["n"]) for r in usage_rows}
        if stats is not None:
            stats["usage_rounds"].append(len(usage))
        # prune: top vocab_size by (usage desc, piece); chars always kept
        ranked = sorted(usage.items(), key=lambda t: (-t[1], t[0]))
        kept = dict(ranked[:vocab_size])
        for p, c in counts.items():
            if len(p) == 1 and p not in kept:
                kept[p] = usage.get(p, 1)
        counts = kept
        vocab = score_table(counts)
    return vocab
