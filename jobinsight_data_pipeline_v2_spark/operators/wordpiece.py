"""WordPiece tokenizer (BERT-style) on Spark — the third tokenizer
family next to BPE (operators/tokenizer.py, frequency-ranked merges)
and unigram-LM (operators/unigram.py, Viterbi under piece scores).

WordPiece differs from BPE in exactly one training decision and one
inference algorithm, both re-expressed integer-exact:

- **Merge ranking** (Schuster & Nakajima 2012 / the BERT trainer):
  the next merge maximizes the LIKELIHOOD ratio
  ``count(ab) / (count(a)·count(b))`` — a pair of rare symbols that
  almost always co-occur beats a pair of common ones that co-occur
  incidentally. Ratios are compared by exact integer
  CROSS-MULTIPLICATION (``c_x·a_y·b_y`` vs ``c_y·a_x·b_x`` — three
  corpus-bounded counts, ≤ 1e18 at sf0.1, inside BIGINT), ties by
  pair lexicographic — no float division anywhere, so retraining is
  bit-stable. Counting runs as Spark jobs over the WORD DICTIONARY
  (Heaps-law bounded — the frame real WordPiece trainers use),
  weighted by word frequency; the per-round argmax is a driver pick
  over the vocabulary-scale histograms (the kmeans/bpe sanctioned
  iterative shape; merges apply one per round because each merge
  changes the unigram counts its successors are scored by —
  batched selection is UNSOUND here, unlike count-ranked BPE).
- **Continuation marking**: word-initial symbols are bare,
  non-initial symbols carry the ``##`` prefix; a merge of (a, ##b)
  produces ``a·b`` with a's prefix status. Marked symbols are what
  both counting and the encode vocabulary see, exactly as in BERT
  vocab files.
- **Encode** (greedy longest-match-first, the actual WordPiece
  inference — NOT the training objective): at each position take the
  LONGEST vocabulary piece (``##``-prefixed after the first); a
  position with no match makes the whole word ``[UNK]``. Fully
  in-row: the vocabulary compiles into the plan as a constant-folded
  map literal and the matcher is one aggregate fold over character
  positions with an inner descending-length scan — a narrow,
  zero-shuffle, streaming-safe projection (the unigram_encode
  contract).

Losslessness: for a word with no ``[UNK]``, concatenating its pieces
and stripping ``##`` reconstructs the word exactly — what the
``wordpiece_encode_roundtrip`` gate hash-pins corpus-wide against the
pristine text (the bpe/unigram roundtrip device). Greedy-match
equivalence to a pure-Python reference is pinned separately by unit
tests (including the UNK path, which the covered-alphabet gate corpus
cannot reach).

Scale: training touches only the word dictionary; encoding is one
narrow pass over the corpus with a vocab-sized literal — no shuffle,
no UDF, no corpus-sized collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenizer import _sql_quote

UNK = "[UNK]"


def _word_dict(df: DataFrame, text_col: str) -> DataFrame:
    toks = df.select(
        F.explode(
            F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
        ).alias("word")
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("c"))


_INIT_SYMS = (
    "transform(sequence(1, length(word)), i -> "
    "if(i = 1, substr(word, 1, 1), concat('##', substr(word, i, 1))))"
)


def _merged_symbol(a: str, b: str) -> str:
    """Merging (a, b): the right symbol sheds its ## continuation
    marker; the result keeps a's prefix status."""
    return a + (b[2:] if b.startswith("##") else b)


def wordpiece_train(
    df: DataFrame,
    n_merges: int = 40,
    text_col: str = "text",
    stats: dict | None = None,
) -> list[str]:
    """Train a WordPiece vocabulary; returns the sorted symbol list
    (alphabet + ##-continuations + merged pieces) the encoder matches
    against. ``stats`` records {'merges': [(a, b, c_pair, c_a, c_b)]}.
    """
    words = _word_dict(df, text_col).localCheckpoint(eager=False)
    syms = words.select(
        "word", "c", F.expr(_INIT_SYMS).alias("s")
    ).localCheckpoint(eager=False)
    # the vocabulary keeps the FULL alphabet (bare + ## forms) plus
    # every merge product — the BERT vocab convention: merges ADD
    # pieces, they never remove the symbols they consumed (a word
    # whose best pieces were merged away elsewhere must still encode
    # char-by-char instead of collapsing to [UNK])
    vocab_set = {
        r["sym"]
        for r in syms.select(F.explode("s").alias("sym")).distinct().collect()
    }
    merges: list[tuple[str, str]] = []
    if stats is not None:
        stats["merges"] = []
    for _ in range(n_merges):
        pairs = (
            syms.select(
                F.explode(
                    F.expr(
                        """
                        if(size(s) >= 2,
                           transform(sequence(1, size(s) - 1),
                                     i -> struct(element_at(s, i) AS a,
                                                 element_at(s, i + 1) AS b)),
                           cast(array() as
                                array<struct<a: string, b: string>>))
                        """
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").cast("long").alias("n"))
            .collect()
        )
        if not pairs:
            break
        uni = {
            r["sym"]: int(r["n"])
            for r in syms.select(
                F.explode("s").alias("sym"), "c"
            )
            .groupBy("sym")
            .agg(F.sum("c").cast("long").alias("n"))
            .collect()
        }
        # exact rational argmax: x beats y iff
        # c_x·a_y·b_y > c_y·a_x·b_x; ties by (a, b) lexicographic
        best = None
        for r in pairs:
            cand = (int(r["n"]), uni[r["a"]], uni[r["b"]], r["a"], r["b"])
            if best is None:
                best = cand
                continue
            lhs = cand[0] * best[1] * best[2]
            rhs = best[0] * cand[1] * cand[2]
            if lhs > rhs or (lhs == rhs and cand[3:] < best[3:]):
                best = cand
        c_pair, c_a, c_b, a, b = best
        merges.append((a, b))
        vocab_set.add(_merged_symbol(a, b))
        if stats is not None:
            stats["merges"].append((a, b, c_pair, c_a, c_b))
        qa, qb = _sql_quote(a), _sql_quote(b)
        qm = _sql_quote(_merged_symbol(a, b))
        syms = syms.select(
            "word",
            "c",
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
                           named_struct('out',
                                        concat(acc.out, array({qm})),
                                        'skip', true),
                           named_struct('out',
                                        concat(acc.out,
                                               array(element_at(s, i))),
                                        'skip', false))),
                     acc -> acc.out))
                """
            ).alias("s"),
        ).localCheckpoint(eager=False)
    return sorted(vocab_set)


def _vocab_map_sql(vocab: list[str]) -> str:
    keys = ", ".join(_sql_quote(p) for p in vocab)
    ones = ", ".join("1" for _ in vocab)
    return f"map_from_arrays(array({keys}), array({ones}))"


def wordpiece_encode(
    symbols: DataFrame, vocab: list[str], out_col: str = "pieces"
) -> DataFrame:
    """(id, s: array<string> words) → (id, pieces): greedy
    longest-match-first segmentation of every word against the
    compiled vocabulary; an unmatchable position yields one
    ``[UNK]`` for the whole word (the BERT contract). One narrow
    zero-shuffle projection, streaming-safe."""
    vm = _vocab_map_sql(vocab)
    max_len = max((len(p) - (2 if p.startswith("##") else 0))
                  for p in vocab) if vocab else 1
    # piece text at DP position st.pos (0-based) with length l
    piece = (
        "if(st.pos = 0, substr(w, 1, l), "
        "concat('##', substr(w, st.pos + 1, l)))"
    )
    # longest match: descending-length scan, first hit wins
    best_l = (
        f"aggregate(sequence(least({max_len}, length(w) - st.pos), 1, -1), "
        f"0, (bl, l) -> if(bl > 0, bl, "
        f"if(element_at({vm}, {piece}) IS NOT NULL, l, 0)))"
    )
    took = (
        "named_struct('pos', st.pos + bl, "
        "'ps', concat(st.ps, array("
        "if(st.pos = 0, substr(w, 1, bl), "
        "concat('##', substr(w, st.pos + 1, bl))))), "
        "'dead', false)"
    )
    fold = (
        f"aggregate(sequence(1, length(w)), "
        f"named_struct('pos', 0, "
        f"'ps', cast(array() as array<string>), 'dead', false), "
        f"(st, z) -> if(st.dead OR st.pos >= length(w), st, "
        f"element_at(transform(array({best_l}), bl -> "
        f"if(bl = 0, named_struct('pos', st.pos, 'ps', st.ps, "
        f"'dead', true), {took})), 1)), "
        f"st -> if(st.dead, array('{UNK}'), st.ps))"
    )
    expr = (
        "flatten(transform(s, w -> "
        f"if(length(w) = 0, cast(array() as array<string>), {fold})))"
    )
    return symbols.select("id", F.expr(expr).alias(out_col))


def wordpiece_encode_word(word: str, vocab: list[str]) -> list[str]:
    """Pure-Python reference of the greedy longest-match encode
    (differential tests)."""
    vs = set(vocab)
    max_len = max(
        (len(p) - (2 if p.startswith("##") else 0)) for p in vocab
    ) if vocab else 1
    pos, out = 0, []
    while pos < len(word):
        hit = None
        for l in range(min(max_len, len(word) - pos), 0, -1):
            cand = word[pos : pos + l] if pos == 0 else (
                "##" + word[pos : pos + l]
            )
            if cand in vs:
                hit = (l, cand)
                break
        if hit is None:
            return [UNK]
        pos += hit[0]
        out.append(hit[1])
    return out
