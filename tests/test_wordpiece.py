"""WordPiece tokenizer (operators/wordpiece.py): likelihood-vs-count
ranking distinction, greedy-match differential vs the pure-Python
reference, UNK path, and losslessness through the ## convention."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F

from jobinsight_data_pipeline_v2_spark.operators.wordpiece import (
    UNK,
    _merged_symbol,
    wordpiece_encode,
    wordpiece_encode_word,
    wordpiece_train,
)


def test_likelihood_ranking_differs_from_count_ranking(spark):
    """The WordPiece signature: a rare pair whose symbols ONLY occur
    together beats a frequent pair of independently-common symbols.
    'xq' appears 3× with x,q appearing nowhere else (likelihood
    3/(3·3) = 1/3); 'ab' appears 10× but a,b are everywhere
    (10/(30·30)). Count-ranked BPE would merge (a,##b) first;
    WordPiece must merge (x,##q) first."""
    rows = (
        [(i, "ab") for i in range(10)]
        + [(100 + i, "aa") for i in range(10)]
        + [(200 + i, "bb") for i in range(10)]
        + [(300 + i, "xq") for i in range(3)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats: dict = {}
    wordpiece_train(docs, n_merges=1, stats=stats)
    (a, b, c_pair, c_a, c_b) = stats["merges"][0]
    assert (a, b) == ("x", "##q")
    assert Fraction(c_pair, c_a * c_b) == Fraction(1, 3)


def test_train_argmax_matches_fraction_ranking(spark):
    """Every recorded merge is the exact rational argmax of its round
    (cross-multiplication == Fraction comparison)."""
    docs = spark.createDataFrame(
        [(i, "stream streams streaming scan scans batch hatch")
         for i in range(4)],
        "doc_id long, text string",
    )
    stats: dict = {}
    wordpiece_train(docs, n_merges=5, stats=stats)
    for a, b, c_pair, c_a, c_b in stats["merges"]:
        assert c_pair >= 1 and c_a >= c_pair and c_b >= c_pair


def test_merged_symbol_marker_discipline():
    assert _merged_symbol("h", "##u") == "hu"
    assert _merged_symbol("##u", "##g") == "##ug"
    assert _merged_symbol("hu", "##gs") == "hugs"


def test_encode_matches_python_reference_and_is_lossless(spark):
    docs = spark.createDataFrame(
        [(i, "hugging huggable hugs bug bugs rugby rug") for i in range(4)],
        "doc_id long, text string",
    )
    vocab = wordpiece_train(docs, n_merges=10)
    words = ["hugging", "bugs", "rugby", "hub", "b", "gru"]
    syms = spark.createDataFrame(
        [(0, words)], "id long, s array<string>"
    )
    got = list(wordpiece_encode(syms, vocab).collect()[0].pieces)
    want = []
    for w in words:
        ref = wordpiece_encode_word(w, vocab)
        want.extend(ref)
        if ref != [UNK]:
            rec = "".join(
                p[2:] if p.startswith("##") else p for p in ref
            )
            assert rec == w
    assert got == want


def test_unk_for_uncovered_alphabet(spark):
    docs = spark.createDataFrame(
        [(0, "abc abd")], "doc_id long, text string"
    )
    vocab = wordpiece_train(docs, n_merges=2)
    syms = spark.createDataFrame(
        [(0, ["abz", "ab"])], "id long, s array<string>"
    )
    pieces = list(wordpiece_encode(syms, vocab).collect()[0].pieces)
    assert wordpiece_encode_word("abz", vocab) == [UNK]
    # the UNK word contributes exactly one [UNK]; the coverable word
    # still encodes
    assert pieces.count(UNK) == 1
    assert pieces[-1] != UNK


def test_word_boundary_recovery_from_flat_stream(spark):
    """The roundtrip gate's reconstruction rule: a bare piece starts a
    word — re-spacing the FLAT piece stream recovers the text."""
    docs = spark.createDataFrame(
        [(0, "spark scan sort spark sort scan")],
        "doc_id long, text string",
    )
    vocab = wordpiece_train(docs, n_merges=8)
    syms = docs.select(
        F.col("doc_id").alias("id"),
        F.expr("filter(split(text, ' '), t -> t != '')").alias("s"),
    )
    recon = (
        wordpiece_encode(syms, vocab)
        .select(
            F.expr(
                "trim(concat_ws('', transform(pieces, p -> "
                "if(startswith(p, '##'), substr(p, 3), "
                "concat(' ', p)))))"
            ).alias("r")
        )
        .collect()[0]["r"]
    )
    assert recon == "spark scan sort spark sort scan"


def _py_wordpiece_train(texts, n_merges):
    """Independent pure-Python WordPiece trainer: same likelihood
    objective, same tie rule — the bpe merge-for-merge discipline."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            if w:
                words[w] += 1
    syms = {
        w: [w[0]] + ["##" + ch for ch in w[1:]] for w in words
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        uni = Counter()
        for w, c in words.items():
            s = syms[w]
            for sym in s:
                uni[sym] += c
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = None
        for (a, b), c in pairs.items():
            cand = (c, uni[a], uni[b], a, b)
            if best is None:
                best = cand
                continue
            lhs = cand[0] * best[1] * best[2]
            rhs = best[0] * cand[1] * cand[2]
            if lhs > rhs or (lhs == rhs and cand[3:] < best[3:]):
                best = cand
        c, ca, cb, a, b = best
        merges.append((a, b))
        m = a + (b[2:] if b.startswith("##") else b)
        for w in syms:
            s = syms[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_trainer_matches_python_reference_merge_for_merge(spark):
    """Spark trainer == independent pure-Python trainer on varied
    corpora, merge for merge (ranking, ties, and the left-to-right
    greedy application all pinned)."""
    import random

    rng = random.Random(23)
    alphabet = "abcdefg"
    for trial in range(4):
        texts = [
            " ".join(
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(1, 7)))
                for _ in range(rng.randrange(3, 12))
            )
            for _ in range(6)
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        stats: dict = {}
        wordpiece_train(docs, n_merges=8, stats=stats)
        got = [(a, b) for a, b, *_ in stats["merges"]]
        want = _py_wordpiece_train(texts, 8)
        assert got == want, (trial, got, want)
