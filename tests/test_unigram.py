"""Unigram-LM tokenizer (operators/unigram.py): pure-Python Viterbi
reference differential, trainer invariants, integer-score exactness,
losslessness, and streaming wiring."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from jobinsight_data_pipeline_v2_spark.operators.unigram import (
    _BAD,
    _PIECE_W,
    _SCORE_CLAMP,
    _floor_log2_ratio,
    unigram_encode,
    unigram_train,
)


def _viterbi_ref(word: str, scores: dict[str, int], max_len: int):
    """Independent reference of the in-row DP: maximize composite
    Σ(score·4096 − 1) with ascending-start strict-improvement scan
    (ties → longest piece at each step)."""
    n = len(word)
    best = [(0, 0)]
    for i in range(1, n + 1):
        b = (-(1 << 62), 0)
        for p in range(max(1, i - max_len + 1), i + 1):
            piece = word[p - 1 : i]
            sc = best[p - 1][0] + (scores.get(piece, _BAD) * _PIECE_W - 1)
            if sc > b[0]:
                b = (sc, p - 1)
        best.append(b)
    ps, pos = [], n
    while pos > 0:
        bk = best[pos][1]
        ps.insert(0, word[bk:pos])
        pos = bk
    return ps


def test_floor_log2_ratio_exact():
    """Integer floor(log2(c/total)) matches math.log2 on non-boundary
    values and is exact on powers of two (where float log2 may not
    be)."""
    assert _floor_log2_ratio(8, 8) == 0
    assert _floor_log2_ratio(4, 8) == -1
    assert _floor_log2_ratio(5, 8) == -1
    assert _floor_log2_ratio(1, 8) == -3
    assert _floor_log2_ratio(1, 1 << 40) == -_SCORE_CLAMP  # clamped
    for c in range(1, 200):
        got = _floor_log2_ratio(c, 200)
        assert got == max(-_SCORE_CLAMP, math.floor(math.log2(c / 200)))


def _toy_docs(spark):
    rows = [
        (0, "spark sparkle park parking the theater then"),
        (1, "spark spark park the the the row rowing"),
        (2, "parking theater sparkle rowing spark the park row"),
        (3, "the spark park row then parking"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_invariants(spark):
    stats = {}
    vocab = unigram_train(
        _toy_docs(spark), vocab_size=12, n_rounds=2, max_piece_len=4,
        stats=stats,
    )
    pieces = {p for p, _ in vocab}
    alphabet = set("sparkletheinowgd m".replace(" ", ""))
    corpus_chars = {
        c
        for r in _toy_docs(spark).collect()
        for c in r.text.replace(" ", "")
    }
    # every corpus character survives pruning (coverage guarantee)
    assert corpus_chars <= pieces
    # bounded size: vocab_size + rescued single chars
    assert len(vocab) <= 12 + len(corpus_chars)
    # scores are negative ints within the clamp
    assert all(-_SCORE_CLAMP <= s <= 0 for _, s in vocab)
    assert stats["n_seed"] > len(vocab)
    # deterministic retrain
    assert vocab == unigram_train(
        _toy_docs(spark), vocab_size=12, n_rounds=2, max_piece_len=4
    )


def test_spark_viterbi_matches_reference(spark):
    """The in-row SQL DP equals the pure-Python reference word for
    word — scores, composite, and tie rules (the optimality half the
    roundtrip gate cannot pin)."""
    vocab = unigram_train(
        _toy_docs(spark), vocab_size=12, n_rounds=2, max_piece_len=4
    )
    scores = dict(vocab)
    words = [
        "spark", "sparkle", "park", "parking", "the", "theater",
        "then", "row", "rowing", "sparksparkspark", "xyzzy",
        "a", "pp", "thethethe", "parkrowthe",
    ]
    # absent chars (x, y, z) are not in the toy vocab: give them
    # scores so reachability holds, mirroring both sides
    for ch in "xyz":
        scores[ch] = -9
    vocab2 = sorted(scores.items(), key=lambda t: (-t[1], t[0]))
    df = spark.createDataFrame(
        [(i, [w]) for i, w in enumerate(words)],
        "id long, s array<string>",
    )
    enc = {
        r.id: r.pieces
        for r in unigram_encode(df, vocab2, max_piece_len=4).collect()
    }
    for i, w in enumerate(words):
        ref = _viterbi_ref(w, scores, 4)
        got = enc[i]
        assert got[0].startswith("▁")
        stripped = [got[0][1:]] + list(got[1:])
        assert stripped == ref, f"{w}: {stripped} != {ref}"
        assert "".join(stripped) == w  # lossless by construction


def test_encode_compresses_corpus(spark):
    """A trained vocabulary actually uses multi-char pieces: encoded
    piece count sits strictly between token count and char count."""
    docs = _toy_docs(spark)
    vocab = unigram_train(docs, vocab_size=12, n_rounds=2, max_piece_len=4)
    syms = docs.select(
        F.col("doc_id").alias("id"),
        F.expr("filter(split(text, ' '), t -> t != '')").alias("s"),
    )
    enc = unigram_encode(syms, vocab, 4)
    np = enc.agg(F.sum(F.size("pieces"))).collect()[0][0]
    nt = syms.agg(F.sum(F.size("s"))).collect()[0][0]
    nc = syms.agg(
        F.sum(F.expr("aggregate(s, 0, (a, w) -> a + length(w))"))
    ).collect()[0][0]
    assert nt <= np < nc


def test_unigram_encode_streaming_wiring(spark, tmp_path):
    """The encode projection is narrow and zero-shuffle — the same
    callable runs on a structured-streaming frame unchanged."""
    import os

    d = str(tmp_path / "uni_stream")
    os.makedirs(d)
    docs = _toy_docs(spark)
    vocab = unigram_train(docs, vocab_size=12, n_rounds=1, max_piece_len=4)
    syms = docs.select(
        F.col("doc_id").alias("id"),
        F.expr("filter(split(text, ' '), t -> t != '')").alias("s"),
    )
    syms.write.parquet(d, mode="overwrite")
    stream = spark.readStream.schema(syms.schema).parquet(d)
    out = unigram_encode(stream, vocab, 4)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("uni_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.id: r.pieces for r in spark.sql("select * from uni_stream").collect()}
    batch = {r.id: r.pieces for r in unigram_encode(syms, vocab, 4).collect()}
    assert got == batch


def test_encode_tolerates_empty_words(spark):
    """An empty-string word contributes no pieces instead of driving
    sequence(1, 0) into element_at(acc, 0) (rule 4; review r8)."""
    vocab = [("a", -1), ("b", -2)]
    df = spark.createDataFrame(
        [(1, ["ab", "", "ba"])], "id long, s array<string>"
    )
    rows = unigram_encode(df, vocab, max_piece_len=2).collect()
    assert rows[0].pieces == ["▁a", "b", "▁b", "a"]
