"""Tests for merge, quality, dedup, similarity, and multimodal operators."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    shingle,
    simhash64,
    simhash_near_pairs,
    tokenize,
)
from jobinsight_data_pipeline_v2_spark.operators.merge import (
    archive_split,
    insert_if_absent,
    upsert,
)
from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    documents_as_media,
    extract_features,
    media_exact_dedup,
)
from jobinsight_data_pipeline_v2_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from jobinsight_data_pipeline_v2_spark.quality import (
    ValidationHardFailError,
    business_rule_violations,
    crawl_validation,
    evaluate_gate,
)

SF = "/root/testdata/sf0.001"


# --- merge (S6/S7) --------------------------------------------------------


def test_upsert_counts_and_semantics(spark):
    existing = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "k string, v int, other string"
    )
    incoming = spark.createDataFrame(
        [("a", 1), ("b", 99), ("c", 3)], "k string, v int"
    )
    merged, counts = upsert(existing, incoming.withColumn("other", F.lit("new")), "k", ["v"])
    got = {r["k"]: (r["v"], r["other"]) for r in merged.collect()}
    # a unchanged; b updated (v only — other kept); c inserted
    assert got == {"a": (1, "x"), "b": (99, "y"), "c": (3, "new")}
    c = counts.collect()[0]
    assert (c["inserted"], c["updated"], c["unchanged"]) == (1, 1, 1)


def test_insert_if_absent(spark):
    existing = spark.createDataFrame([("a", 1)], "k string, v int")
    incoming = spark.createDataFrame([("a", 9), ("b", 2)], "k string, v int")
    out = {r["k"]: r["v"] for r in insert_if_absent(existing, incoming, "k").collect()}
    assert out == {"a": 1, "b": 2}  # conflict ignored, absent appended


def test_archive_split(spark):
    df = spark.createDataFrame(
        [(1, datetime(2026, 1, 1)), (2, datetime(2026, 3, 1)), (3, None)],
        "id int, crawled_at timestamp",
    )
    kept, archived = archive_split(df, datetime(2026, 2, 1))
    assert {r["id"] for r in kept.collect()} == {2, 3}
    arch = archived.collect()
    assert [(r["id"], r["year"], r["month"]) for r in arch] == [(1, 2026, 1)]


# --- quality --------------------------------------------------------------


def test_crawl_validation_and_gate(spark):
    rows = [
        ("123", "Valid Title", "Comp"),
        ("124", "Another", "Comp"),
        ("abc", "Bad id", "Comp"),       # non-digit id
        (None, "No id", "Comp"),
        ("125", "", "Comp"),             # blank title
        ("123", "Dup id", "Comp"),       # duplicate
    ]
    df = spark.createDataFrame(rows, "job_id string, title string, company_name string")
    res = crawl_validation(df)
    assert res["total_jobs"] == 6 and res["unique_jobs"] == 4
    assert res["valid_jobs"] == 3  # 123, 124, dup-123
    assert res["field_missing_rates"]["job_id"] == pytest.approx(2 / 6)
    with pytest.raises(ValidationHardFailError):
        evaluate_gate(res)  # below min_job_count=50


def test_business_rules(spark):
    as_of = date(2026, 1, 15)
    rows = [
        # salary max < min → invalid
        ("1", "Long enough title", "Company A", "Hà Nội", 50.0, 10.0, datetime(2026, 2, 1)),
        # deadline past
        ("2", "Another fine title", "Company B", "HCM", None, None, datetime(2026, 1, 1)),
        # title too short + location invalid
        ("3", "abc", "Company C", "n/a", None, None, None),
        # healthy
        ("4", "Perfectly fine title", "Company D", "Đà Nẵng", 10.0, 20.0, datetime(2026, 2, 1)),
    ]
    df = spark.createDataFrame(
        rows,
        "job_id string, title string, company_name string, location string, "
        "salary_min double, salary_max double, due_date timestamp",
    )
    res = business_rule_violations(df, as_of)
    v = res["violations"]
    assert v["salary_invalid"] == 1
    assert v["deadline_past"] == 1
    assert v["title_too_short"] == 1
    assert v["location_invalid"] == 1
    assert res["status"] == "unhealthy"


# --- dedup: production (xxhash64) vs corpus -------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    # plant two exact near-dup pairs: copy of doc with tiny edit
    clones = (
        base.limit(2)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra token tail")).alias("text"),
            "lang", "source", "n_chars",
        )
    )
    return base.unionByName(clones)


def test_minhash_dedup_finds_planted_dups(spark, docs):
    dropped = minhash_dedup(docs, jaccard_threshold=0.6).collect()
    dropped_ids = {r["doc_id"] for r in dropped}
    assert {100000 + 0, 100000 + 1} & dropped_ids or len(dropped_ids) >= 2
    # keepers must be smaller ids than dropped docs
    assert all(r["keeper_id"] < r["doc_id"] for r in dropped)


def test_lsh_candidates_superset_of_high_jaccard(spark, docs):
    """Every pair with jaccard ≥ .8 must surface as an LSH candidate
    (recall check of the banding scheme at these parameters)."""
    sh = shingle(tokenize(docs), "doc_id", 4)
    sig = minhash_signatures(sh, "doc_id", 64)
    cands = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sig, "doc_id", band_size=8).collect()
    }
    # brute-force truth over the small corpus
    a = sh.alias("a"); b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    za = sizes.alias("za"); zb = sizes.alias("zb")
    truth = {
        (r["id_a"], r["id_b"])
        for r in common.join(za, F.col("id_a") == F.col("za.doc_id"))
        .join(zb, F.col("id_b") == F.col("zb.doc_id"))
        .withColumn("j", F.col("n_common") / (F.col("za.n") + F.col("zb.n") - F.col("n_common")))
        .filter(F.col("j") >= 0.8)
        .collect()
    }
    assert truth, "fixture should contain at least the planted near-dups"
    assert truth <= cands


def test_simhash_near_pairs(spark, docs):
    hashes = simhash64(tokenize(docs))
    pairs = simhash_near_pairs(hashes, max_hamming=10).collect()
    planted = {(0, 100000), (1, 100001)}
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert planted <= got
    assert all(r["hamming"] <= 10 for r in pairs)


# --- similarity: LSH recall vs brute force --------------------------------


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=10)
    approx = lsh_topk(emb, queries, k=10, n_planes=4, n_tables=16)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    # theory at cosine≈0.3 neighbors: ≈1-(1-0.6^4)^16 ≈ 0.89
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def _label_centroids_df(emb):
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "c"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("c").cast("double")).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell_id"), "centroid")
    )


def test_ivf_topk_recall_and_exactness(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = _label_centroids_df(emb).localCheckpoint()
    n_cells = cents.count()
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=10)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    # nprobe = all cells degrades to exact brute force — identical set
    full = ivf_topk(emb, cents, queries, k=10, nprobe=n_cells)
    assert {(r["query_id"], r["vec_id"]) for r in full.collect()} == ex
    # The synthetic embeddings are near-random, so label cells carry
    # little neighbor structure and recall grows ~linearly with nprobe
    # (on clustered real data the curve saturates much earlier). Assert
    # the dial's contract: monotone recall, ≥0.9 near the top.
    def _recall(nprobe):
        ap = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(emb, cents, queries, k=10, nprobe=nprobe).collect()
        }
        return len(ex & ap) / len(ex)

    lo, mid, hi = _recall(2), _recall(n_cells // 2), _recall(n_cells - 1)
    assert lo <= mid <= hi, f"recall not monotone in nprobe: {lo} {mid} {hi}"
    assert hi >= 0.9, f"IVF recall too low at nprobe={n_cells - 1}: {hi}"


def test_ivf_learned_quantizer_recall_and_exactness(spark):
    """The learned (k-means) coarse quantizer behind the
    ivf_topk_learned gate: nprobe ≥ cells is exact regardless of the
    centroids; at nprobe < cells the recall dial stays monotone."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qe = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    )
    cents = kmeans_centroids(qe, k=6, max_iters=3).select(
        "cell_id", "centroid"
    ).localCheckpoint()
    n_cells = cents.count()
    queries = qe.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(qe, queries, k=10)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    full = ivf_topk(qe, cents, queries, k=10, nprobe=n_cells)
    assert {(r["query_id"], r["vec_id"]) for r in full.collect()} == ex

    def _recall(nprobe):
        ap = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(qe, cents, queries, k=10, nprobe=nprobe).collect()
        }
        return len(ex & ap) / len(ex)

    lo, hi = _recall(1), _recall(max(n_cells - 1, 1))
    assert lo <= hi, f"recall not monotone in nprobe: {lo} {hi}"


# --- multimodal -----------------------------------------------------------


def test_multimodal_pipeline(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    media = documents_as_media(docs)
    # plant an exact duplicate payload
    dup = media.limit(1).withColumn("media_id", F.lit(999999).cast("long"))
    media = media.unionByName(dup)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 51
    assert all(len(r["content_sha256"]) == 64 for r in rows)
    assert all(r["features"] is not None and len(r["features"]) == 8 for r in rows)
    # features are normalized histograms → sum to ~1
    assert abs(sum(rows[0]["features"]) - 1.0) < 1e-5
    dups = media_exact_dedup(feats).filter(F.col("n_copies") > 1).collect()
    assert len(dups) == 1 and dups[0]["n_copies"] == 2


def test_kmeans_centroids_learned_quantizer(spark):
    """Lloyd's k-means: deterministic, members conserved, and the
    learned quantizer's inertia improves on (or matches) the 1-iter
    seed assignment."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        _dot,
        ivf_assign,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    )
    n = emb.count()
    k = 6
    c5 = kmeans_centroids(emb, k=k, max_iters=5).localCheckpoint()
    # determinism: a second run is identical
    c5b = kmeans_centroids(emb, k=k, max_iters=5)
    assert c5.exceptAll(c5b).count() == 0 and c5b.exceptAll(c5).count() == 0
    rows = c5.collect()
    assert 1 <= len(rows) <= k
    assert sorted(r["cell_id"] for r in rows) == list(range(len(rows)))
    assert sum(r["n_members"] for r in rows) == n
    dim = len(emb.first()["embedding"])
    assert all(len(r["centroid"]) == dim for r in rows)

    def inertia(cents):
        assigned = ivf_assign(emb, cents.select("cell_id", "centroid"))
        return (
            assigned.agg(F.sum(F.lit(1.0) - F.col("cell_sim")).alias("s"))
            .first()["s"]
        )

    c1 = kmeans_centroids(emb, k=k, max_iters=1).localCheckpoint()
    assert inertia(c5) <= inertia(c1) + 1e-9


def test_sample_frames_fanout(spark):
    """Frame sampling: deterministic 1→N fan-out, every_n-th frame
    kept, frames reassemble to a byte-subset of the payload."""
    from jobinsight_data_pipeline_v2_spark.operators.multimodal import (
        documents_as_media,
        media_exact_dedup,
        extract_features,
        sample_frames,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    media = documents_as_media(docs, kind="video")
    frames = sample_frames(media, every_n=3, frame_bytes=64).localCheckpoint()
    rows = frames.collect()
    assert rows, "no frames sampled"
    assert all(r["frame_idx"] % 3 == 0 for r in rows)
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 // 25 for r in rows)
    # per-media frame count = ceil(ceil(bytes/64) / 3)
    sizes = {r["media_id"]: r["n_bytes"] for r in media.select(
        "media_id", F.length("payload").alias("n_bytes")).collect()}
    per = {}
    for r in rows:
        per[r["media_id"]] = per.get(r["media_id"], 0) + 1
    for mid, n in per.items():
        total_frames = -(-sizes[mid] // 64)
        assert n == -(-total_frames // 3)
    # frame rows feed the downstream media operators unchanged
    feats = extract_features(
        frames.select(
            F.col("media_id") * 10000 + F.col("frame_idx"),
            F.lit("video"), F.col("frame"), F.lit("raw"), F.lit("test"))
        .toDF("media_id", "kind", "payload", "mime", "source")
    )
    assert feats.count() == len(rows)
    assert media_exact_dedup(feats).count() >= 1


def test_media_decode_with_real_codec(spark):
    """importorskip-guarded integration path for a REAL codec: where
    PIL exists, extract_features(decode_fn=<PIL decode>) must produce
    the same features Spark-side (Arrow batches, executor Python) as
    the same decode run driver-side. Skips cleanly where PIL is absent
    (this container) — the contract stays honest either way."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    def png_bytes(w, h, color):
        img = PIL_Image.new("RGB", (w, h), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    payloads = [
        (1, png_bytes(8, 6, (255, 0, 0))),
        (2, png_bytes(4, 4, (0, 128, 255))),
        (3, png_bytes(16, 2, (10, 20, 30))),
    ]

    def pil_decode(raw: bytes) -> list[float]:
        img = PIL_Image.open(io.BytesIO(raw)).convert("RGB").resize((2, 2))
        px = list(img.getdata())
        return [float(sum(c[i] for c in px)) / len(px) for i in range(3)]

    media = spark.createDataFrame(
        [(mid, "image", raw, "image/png", "test") for mid, raw in payloads],
        MEDIA_SCHEMA,
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decode_fn=pil_decode).collect()
    }
    for mid, raw in payloads:
        want = pil_decode(raw)
        assert feats[mid] == pytest.approx(want), mid


def test_pq_lossless_roundtrip(spark):
    """On a corpus whose subvectors ARE codebook centroids (each vector
    replaced by its PQ reconstruction), ADC distances are exact — so
    PQ search with refine=k must equal brute force exactly, ids and
    ranks both."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        _PQ_KEY_PAD,
        _pq_cb_index,
        cosine_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    )
    cb = pq_train(emb, n_sub=4, codes=8, max_iters=2).localCheckpoint()
    recon = (
        pq_encode(emb, cb)
        .crossJoin(_pq_cb_index(cb))
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"""
                flatten(transform(sequence(0, 3), mi ->
                  element_at(__cbm, cast(mi AS BIGINT) * {_PQ_KEY_PAD}
                             + element_at(codes, mi + 1)).centroid))
                """
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    queries = recon.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = (
        pq_topk(recon, cb, queries, k=5, refine=5)
        .select("query_id", "vec_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ex = (
        cosine_topk(recon, queries, k=5)
        .select("query_id", "vec_id", "rank")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert pq.equals(ex)


def test_pq_recall_and_determinism(spark):
    """The real PQ configuration (refine ≪ corpus): recall@10 vs brute
    force ≥ 0.6 per query and ≥ 0.7 mean at sf0.001 with M=8 / K=32;
    hash-seeded training makes the whole pipeline bit-deterministic."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    train = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    cb = pq_train(train, n_sub=8, codes=32, max_iters=4).localCheckpoint()
    assert cb.count() <= 8 * 32
    assert cb.select(F.max(F.size("centroid"))).first()[0] == 8
    queries = emb.filter(F.col("vec_id") % 401 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = pq_topk(emb, cb, queries, k=10, refine=100).toPandas()
    pq2 = pq_topk(emb, cb, queries, k=10, refine=100).toPandas()
    assert pq.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        pq2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    ex = cosine_topk(emb, queries, k=10).toPandas()
    recalls = []
    for qid in sorted(pq.query_id.unique()):
        hits = set(pq[pq.query_id == qid].vec_id) & set(
            ex[ex.query_id == qid].vec_id
        )
        recalls.append(len(hits) / 10)
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_pq_code_budget_allocation(spark):
    """PQ recall tuning at a FIXED code budget (VERDICT r4 #6): how the
    bits are allocated across subspaces matters, and on this corpus —
    near-random vectors with no product structure for many-subspace
    factorization to exploit — FEWER subspaces with MORE codes win at
    equal bytes: the tuned 12-bit config (n_sub=2, codes=64) beats the
    r4 default (n_sub=4, codes=8), and quadrupling the budget to
    32 bits (n_sub=8, codes=16 — the ivfpq_topk_probed gate's
    codebook) lifts recall further. Deterministic hash-seeded training
    makes these inequalities exact assertions, not flaky thresholds
    (measured: 0.65 vs 0.40 vs 0.70 at sf0.001; same ordering at
    sf0.1)."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 401 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ex = cosine_topk(emb, queries, k=10).toPandas()
    n_pairs = len(ex)

    def recall(n_sub: int, codes: int) -> float:
        cb = pq_train(emb, n_sub=n_sub, codes=codes, max_iters=2)
        pq = pq_topk(emb, cb, queries, k=10, refine=50).toPandas()
        hits = len(
            pq.merge(ex, on=["query_id", "vec_id"], suffixes=("", "_e"))
        )
        return hits / n_pairs

    default_12bit = recall(4, 8)    # r4 default: 4 subspaces × 3 bits
    tuned_12bit = recall(2, 64)     # same budget, finer subquantizers
    gate_32bit = recall(8, 16)      # the probed gate's codebook config
    assert tuned_12bit > default_12bit, (tuned_12bit, default_12bit)
    assert gate_32bit > default_12bit, (gate_32bit, default_12bit)


def test_ivfpq_exactness_and_recall(spark):
    """IVF-PQ composition: at nprobe ≥ cells and refine ≥ corpus the
    search is bit-identical to brute force (ids, ranks, sims); at the
    real dials (nprobe=4 of 8, refine=100) recall@10 ≥ 0.5 and the
    whole pipeline is deterministic."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
        ivfpq_train,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    train = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0)
    cents, cb = ivfpq_train(train)
    cents = cents.localCheckpoint()
    cb = cb.localCheckpoint()
    queries = emb.filter(F.col("vec_id") % 401 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ex = (
        cosine_topk(emb, queries, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pe = (
        ivfpq_topk(emb, cents, cb, queries, k=5, nprobe=10**6, refine=10**9)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert pe[["query_id", "vec_id", "rank"]].equals(
        ex[["query_id", "vec_id", "rank"]]
    )
    assert (pe.cosine_sim - ex.cosine_sim).abs().max() == 0.0

    pa = ivfpq_topk(emb, cents, cb, queries, k=10, nprobe=4, refine=100).toPandas()
    pa2 = ivfpq_topk(emb, cents, cb, queries, k=10, nprobe=4, refine=100).toPandas()
    assert pa.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        pa2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    ex10 = cosine_topk(emb, queries, k=10).toPandas()
    recalls = []
    for qid in sorted(pa.query_id.unique()):
        hits = set(pa[pa.query_id == qid].vec_id) & set(
            ex10[ex10.query_id == qid].vec_id
        )
        recalls.append(len(hits) / 10)
    assert min(recalls) >= 0.5, recalls


def test_bpe_train_matches_python_reference(spark):
    """Greedy word-BPE on Spark == a pure-Python reference (same
    argmax tie rule, same left-to-right non-overlapping application),
    merge for merge, on a real corpus slice; and training is
    deterministic across runs."""
    from collections import Counter

    from jobinsight_data_pipeline_v2_spark.operators.tokenizer import (
        apply_merge,
        bpe_train,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
        .localCheckpoint()
    )
    texts = {r.doc_id: r.text for r in docs.collect()}

    def ref_bpe(texts, n_merges, min_count=2):
        seqs = {i: t.split() for i, t in texts.items()}
        merges = []
        for _ in range(n_merges):
            c = Counter()
            for s in seqs.values():
                for x, y in zip(s, s[1:]):
                    c[(x, y)] += 1
            if not c:
                break
            (a, b), n = min(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if n < min_count:
                break
            merges.append((a, b, n))
            for i, s in seqs.items():
                out, skip = [], False
                for j, x in enumerate(s):
                    if skip:
                        skip = False
                        continue
                    if j + 1 < len(s) and x == a and s[j + 1] == b:
                        out.append(a + " " + b)
                        skip = True
                    else:
                        out.append(x)
                seqs[i] = out
        return merges, seqs

    expected_merges, expected_seqs = ref_bpe(texts, 6)
    got = bpe_train(docs, n_merges=6)
    assert got == expected_merges
    assert bpe_train(docs, n_merges=6) == got  # deterministic

    # the applied corpus matches the reference symbol-for-symbol
    symbols = docs.select(
        F.col("doc_id").alias("id"),
        F.expr("filter(split(text, ' '), t -> t != '')").alias("s"),
    )
    for a, b, _ in got:
        symbols = apply_merge(symbols, a, b)
    applied = {r.id: list(r.s) for r in symbols.collect()}
    assert applied == expected_seqs


def test_bpe_train_batched_equals_sequential(spark):
    """``batch_max`` > 1 (top-M symbol-disjoint merges per Spark
    round) is merge-for-merge identical to sequential greedy BPE —
    including on adversarial tiny-vocab corpora where created pairs
    and count ties force the safe-batch rule to shrink batches — and
    cuts the round count by ~batch_max on a separated-count corpus."""
    import random
    from collections import Counter

    from jobinsight_data_pipeline_v2_spark.operators.tokenizer import (
        bpe_train,
    )

    def ref_bpe(texts, n_merges, min_count=2):
        seqs = {i: t.split() for i, t in texts.items()}
        merges = []
        for _ in range(n_merges):
            c = Counter()
            for s in seqs.values():
                for x, y in zip(s, s[1:]):
                    c[(x, y)] += 1
            if not c:
                break
            (a, b), n = min(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if n < min_count:
                break
            merges.append((a, b, n))
            for i, s in seqs.items():
                out, skip = [], False
                for j, x in enumerate(s):
                    if skip:
                        skip = False
                        continue
                    if j + 1 < len(s) and x == a and s[j + 1] == b:
                        out.append(a + " " + b)
                        skip = True
                    else:
                        out.append(x)
                seqs[i] = out
        return merges

    # adversarial fuzz: 6-symbol vocab => dense ties, overlap runs
    # ("a b a b"), and created pairs that rank high immediately
    for seed in (7, 21):
        rng = random.Random(seed)
        texts = {
            i: " ".join(
                rng.choice("abcdef") for _ in range(rng.randint(4, 24))
            )
            for i in range(40)
        }
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id: long, text: string"
        )
        expected = ref_bpe(texts, 10)
        stats: dict = {}
        got = bpe_train(docs, n_merges=10, batch_max=4, stats=stats)
        assert got == expected, f"seed {seed}"
        assert sum(stats["batch_sizes"]) == len(got)

    # depth fuzz: 3-symbol vocab, 16 merges — late rounds merge pairs
    # whose SYMBOLS are themselves space-joined merged tokens, the
    # regime where a joined-string membership key collides (review r6)
    rng = random.Random(3)
    texts = {
        i: " ".join(rng.choice("abc") for _ in range(rng.randint(6, 30)))
        for i in range(50)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    expected = ref_bpe(texts, 16)
    got = bpe_train(docs, n_merges=16, batch_max=4)
    assert got == expected
    assert any(" " in a or " " in b for a, b, _ in got)  # depth reached

    # space-collision regression (review r6): merged tokens contain
    # spaces from round 2 on, so the pair ('a', 'b c') and the pair
    # ('a b', 'c') join to the same string — the membership test must
    # compare both adjacency elements exactly, or ['a b', 'c'] gets
    # merged by a batch that only contains ('a', 'b c')
    from jobinsight_data_pipeline_v2_spark.operators.tokenizer import (
        apply_merges,
    )

    sym = spark.createDataFrame(
        [(1, ["a", "b c", "z"]), (2, ["a b", "c", "z"]), (3, ["x", "y"])],
        "id: long, s: array<string>",
    )
    out = {
        r.id: list(r.s)
        for r in apply_merges(sym, [("a", "b c"), ("x", "y")]).collect()
    }
    assert out == {
        1: ["a b c", "z"],      # ('a', 'b c') merges
        2: ["a b", "c", "z"],   # ('a b', 'c') must NOT
        3: ["x y"],
    }

    # separated-count corpus: 50 disjoint pairs with distinct counts,
    # one per 2-token doc -> the batch drains batch_max merges per
    # round and 50 merges take ~ceil(50/16) Spark rounds, not 50
    rows = []
    doc_id = 0
    for i in range(50):
        for _ in range(60 - i):
            rows.append((doc_id, f"a{i:02d} b{i:02d}"))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    texts = {i: t for i, t in rows}
    expected = ref_bpe(texts, 50)
    assert len(expected) == 50
    seq_stats: dict = {}
    bat_stats: dict = {}
    got_seq = bpe_train(docs, n_merges=50, stats=seq_stats)
    got_bat = bpe_train(docs, n_merges=50, batch_max=16, stats=bat_stats)
    assert got_seq == expected
    assert got_bat == expected
    assert seq_stats["rounds"] >= 50
    assert bat_stats["rounds"] <= 5  # ceil(50/16) + slack


def test_cooccur_pairs_equals_naive_reference(spark):
    """The salted two-phase pair generator == the naive 'keys with
    2 <= df <= max_df emit all ordered id pairs' semantics, including
    at-cap keys (df == max_df, lossless), over-cap keys (dropped
    whole), df=1 keys (no pairs), and ids spread across every salt
    bucket."""
    import itertools
    import random
    from collections import Counter

    from jobinsight_data_pipeline_v2_spark.plans.text import _cooccur_pairs

    rng = random.Random(42)
    max_df = 8
    rows = []
    # controlled dfs around the cap
    for key, df in [(100, 1), (101, 2), (102, max_df), (103, max_df + 1), (104, 30)]:
        ids = rng.sample(range(1000), df)
        rows += [(key, i) for i in ids]
    # random background: 60 keys, dfs 1..12
    for key in range(60):
        for i in rng.sample(range(1000), rng.randint(1, 12)):
            rows.append((key, i))
    df_in = spark.createDataFrame(rows, "k long, doc_id long")

    expected = Counter()
    by_key = {}
    for k, i in rows:
        by_key.setdefault(k, []).append(i)
    for k, ids in by_key.items():
        if 2 <= len(ids) <= max_df:
            for a, b in itertools.combinations(sorted(ids), 2):
                expected[(a, b)] += 1

    got = Counter()
    for r in _cooccur_pairs(df_in, "k", max_df=max_df).collect():
        got[(r.doc_a, r.doc_b)] += 1
    assert got == expected


def test_apply_merge_edge_cases_fuzz(spark):
    """apply_merge == the Python left-to-right non-overlapping fold on
    adversarial sequences: odd/even runs of the same symbol ('a a a'),
    merged super-tokens that themselves form the next pair, empty and
    single-symbol docs, and 200 seeded random docs over a 3-symbol
    alphabet with 3 chained merges."""
    import random

    from jobinsight_data_pipeline_v2_spark.operators.tokenizer import (
        apply_merge,
    )

    def ref_apply(s, a, b):
        out, skip = [], False
        for j, x in enumerate(s):
            if skip:
                skip = False
                continue
            if j + 1 < len(s) and x == a and s[j + 1] == b:
                out.append(a + " " + b)
                skip = True
            else:
                out.append(x)
        return out

    rng = random.Random(7)
    docs = [
        [], ["a"], ["a", "a"], ["a", "a", "a"], ["a", "a", "a", "a"],
        ["a", "b", "a", "b", "a"], ["b", "a", "b"], ["a", "b", "b", "a", "b"],
    ] + [
        [rng.choice("abc") for _ in range(rng.randint(0, 8))]
        for _ in range(200)
    ]
    merges = [("a", "a"), ("a", "b"), ("a a", "c")]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "id long, s array<string>"
    )
    expected = {i: list(s) for i, s in enumerate(docs)}
    for a, b in merges:
        df = apply_merge(df, a, b)
        expected = {i: ref_apply(s, a, b) for i, s in expected.items()}
    got = {r.id: list(r.s) for r in df.collect()}
    assert got == expected


def test_ivf_upsert_equals_full_rebuild(spark):
    """Incremental index maintenance: assigning only the new batch
    against the frozen quantizer and unioning (ivf_upsert) yields
    EXACTLY the index a full rebuild over the combined corpus would —
    assignment is per-row deterministic given the centroids, so the
    daily O(batch) upsert can never drift from the O(corpus) rebuild.
    The drift report partitions the batch completely and its cell ids
    all exist in the quantizer."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        ivf_assign,
        ivf_drift_report,
        ivf_upsert,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint))"
        ).alias("embedding"),
    ).localCheckpoint()
    cents = (
        kmeans_centroids(
            emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(4)) == 0),
            k=8,
            max_iters=2,
        )
        .select("cell_id", "centroid")
        .localCheckpoint()
    )
    old_half = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 0)
    new_batch = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 1)

    standing = ivf_assign(old_half, cents)
    upserted = ivf_upsert(standing, new_batch, cents).select(
        "vec_id", "cell_id"
    )
    rebuilt = ivf_assign(emb, cents).select("vec_id", "cell_id")
    sym = (
        upserted.exceptAll(rebuilt).count()
        + rebuilt.exceptAll(upserted).count()
    )
    assert sym == 0
    # ADVICE r5: a REPLAYED ingest (batch overlaps the standing index —
    # at-least-once delivery) must not duplicate candidates: upsert is
    # a true upsert, so replaying the ENTIRE corpus over the standing
    # half still equals the rebuild exactly
    replayed = ivf_upsert(standing, emb, cents).select("vec_id", "cell_id")
    sym2 = (
        replayed.exceptAll(rebuilt).count()
        + rebuilt.exceptAll(replayed).count()
    )
    assert sym2 == 0

    batch_index = ivf_assign(new_batch, cents)
    report = ivf_drift_report(batch_index, min_mean_sim=0.99).toPandas()
    assert report.n_new.sum() == new_batch.count()  # complete partition
    cell_ids = {r.cell_id for r in cents.select("cell_id").collect()}
    assert set(report.cell_id) <= cell_ids
    # near-random vectors sit far from every centroid — the drift
    # monitor must fire at an absurd threshold and stay quiet at 0
    assert report.low_affinity.all()
    assert not ivf_drift_report(batch_index, min_mean_sim=-1.0).toPandas().low_affinity.any()


def test_bpe_encode_matches_min_rank_reference(spark):
    """Encoding with a TRAINED table: the in-plan fold-batch path and
    the Arrow min-rank path both equal a pure-Python reference encoder
    (classic lowest-rank-first iteration), on held-out documents the
    trainer never saw — several seeds, small vocab (dense rank depth,
    composed symbols in late ranks)."""
    import random

    from jobinsight_data_pipeline_v2_spark.operators.tokenizer import (
        bpe_encode,
        bpe_encode_arrow,
        bpe_train,
    )

    def ref_encode(s, ranks):
        s = list(s)
        while len(s) >= 2:
            best_rank, best = None, None
            for xy in zip(s, s[1:]):
                r = ranks.get(xy)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best = r, xy
            if best is None:
                return s
            a, b = best
            out, skip = [], False
            for j, x in enumerate(s):
                if skip:
                    skip = False
                    continue
                if j + 1 < len(s) and x == a and s[j + 1] == b:
                    out.append(a + " " + b)
                    skip = True
                else:
                    out.append(x)
            s = out
        return s

    for seed in (5, 17):
        rng = random.Random(seed)
        train_texts = {
            i: " ".join(rng.choice("abcd") for _ in range(rng.randint(6, 28)))
            for i in range(40)
        }
        serve_texts = {
            i: " ".join(rng.choice("abcd") for _ in range(rng.randint(0, 28)))
            for i in range(100, 130)
        }
        train = spark.createDataFrame(
            list(train_texts.items()), "doc_id: long, text: string"
        )
        merges = bpe_train(train, n_merges=14, batch_max=4)
        assert any(" " in a or " " in b for a, b, _ in merges), "no depth"
        ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

        serve = spark.createDataFrame(
            [(d, t.split()) for d, t in serve_texts.items()],
            "id: long, s: array<string>",
        )
        expected = {
            d: ref_encode(t.split(), ranks) for d, t in serve_texts.items()
        }
        got_plan = {
            r.id: list(r.s) for r in bpe_encode(serve, merges).collect()
        }
        got_arrow = {
            r.id: list(r.s) for r in bpe_encode_arrow(serve, merges).collect()
        }
        assert got_plan == expected, f"plan path, seed {seed}"
        assert got_arrow == expected, f"arrow path, seed {seed}"
        # losslessness + coverage: every doc reconstructs, and the
        # table actually fires on a shared-vocabulary corpus
        for d, s in got_plan.items():
            assert " ".join(s).split() == serve_texts[d].split()
        n_sym = sum(len(s) for s in got_plan.values())
        n_tok = sum(len(t.split()) for t in serve_texts.values())
        assert n_sym < n_tok, "encoder never merged anything"


# ---------------------------------------------------------------------------
# count-min sketch (operators/sketch.py)
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_mergeable(spark):
    """CMS invariants on a skewed key set: (a) est >= exact for EVERY
    key (not just heavy hitters); (b) sketches built on disjoint
    splits merge by adding counters — slot-wise sum of the two half
    sketches equals the whole-corpus sketch exactly."""
    from collections import Counter

    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    rows = [(f"k{i % 97}", 1 + i % 5) for i in range(500)]
    exact = Counter()
    for k, c in rows:
        exact[k] += c
    counts = spark.createDataFrame(
        [(k, v) for k, v in exact.items()], "key string, cnt long"
    )
    # tiny sketch so collisions are guaranteed
    cms = cms_build(counts, depth=3, width=16)
    probed = cms_estimate(counts, "key", cms, depth=3, width=16)
    for r in probed.collect():
        assert r["cms_est"] >= exact[r["key"]], r

    # mergeability: half sketches sum slot-wise to the whole sketch
    h1 = counts.filter(F.crc32("key") % 2 == 0)
    h2 = counts.filter(F.crc32("key") % 2 == 1)
    whole = cms_build(counts, depth=3, width=16).collect()[0]["__cms"]
    m1 = cms_build(h1, depth=3, width=16).collect()[0]["__cms"]
    m2 = cms_build(h2, depth=3, width=16).collect()[0]["__cms"]
    merged = Counter(m1)
    merged.update(m2)
    assert dict(merged) == {k: v for k, v in whole.items()}


def test_cms_estimate_unseen_key_zero_or_collision(spark):
    """A key never inserted probes empty-or-colliding slots: with a
    wide sketch its estimate is 0 (all D slots empty); estimates are
    never negative."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    counts = spark.createDataFrame(
        [("a", 10), ("b", 3)], "key string, cnt long"
    )
    cms = cms_build(counts, depth=4, width=4096)
    probe = spark.createDataFrame(
        [("zzz-unseen",)], "key string"
    )
    est = cms_estimate(probe, "key", cms, depth=4, width=4096).collect()[0]
    assert est["cms_est"] == 0


def test_unicode_normalize_goldens_and_idempotence(spark):
    """NFC composes combining sequences, NFKC additionally folds
    compatibility forms (ligature fi, fullwidth digits); both are
    idempotent; NULLs pass through; bad form raises."""
    import pytest

    from jobinsight_data_pipeline_v2_spark.operators.unicode_norm import (
        normalize_column,
    )

    rows = [
        (1, "café"),        # e + combining acute -> é
        (2, "Àpril"),       # A + combining grave -> À
        (3, "ﬁle"),          # ligature fi (NFC keeps, NFKC folds)
        (4, "１２"),      # fullwidth 12 (NFKC -> "12")
        (5, None),
        (6, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    nfc = {r["id"]: r["n"] for r in df.select(
        "id", normalize_column("t", "NFC").alias("n")).collect()}
    assert nfc[1] == "café"
    assert nfc[2] == "Àpril"
    assert nfc[3] == "ﬁle"       # NFC preserves compatibility chars
    assert nfc[5] is None
    assert nfc[6] == "plain ascii"
    nfkc = {r["id"]: r["n"] for r in df.select(
        "id", normalize_column("t", "NFKC").alias("n")).collect()}
    assert nfkc[3] == "file"
    assert nfkc[4] == "12"
    # idempotence: normalizing the normalized column changes nothing
    again = df.select(
        "id",
        normalize_column(
            normalize_column("t", "NFC"), "NFC"
        ).alias("n2"),
    )
    assert {r["id"]: r["n2"] for r in again.collect()} == nfc
    with pytest.raises(ValueError, match="form="):
        normalize_column("t", "NFX")


def test_cosine_topk_filtered_prunes_and_misses(spark):
    """Filtered search scores only label-matching corpus rows; a query
    whose label matches nothing returns no rows (miss path); results
    within a label equal unfiltered top-k run on that label's slice."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_filtered,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.9, 0.1], "a"),
            (3, [0.0, 1.0], "b"),
            (4, [0.1, 0.9], "b"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0], "a"), (200, [1.0, 0.0], "zz")],
        "query_id long, embedding array<double>, label string",
    )
    got = cosine_topk_filtered(corpus, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q.get(100) == [1, 2]       # only label-a rows, ranked
    assert 200 not in by_q               # miss path: no label match
    # parity with unfiltered search over the label slice
    plain = cosine_topk(
        corpus.filter(F.col("label") == "a"),
        queries.filter(F.col("query_id") == 100).drop("label"),
        k=10,
    ).collect()
    assert [r["vec_id"] for r in plain] == [1, 2]


def test_pagerank_integer_matches_reference(spark):
    """The distributed recurrence equals a pure-Python implementation
    of the same integer spec on a small irregular graph (parallel
    edges, a self-loop, a sink that only receives, a source that only
    emits)."""
    from jobinsight_data_pipeline_v2_spark.operators.graph import (
        pagerank_integer,
    )

    nodes = list(range(6))
    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (2, 2),  # self-loop at 2
        (3, 2), (3, 2),                           # parallel edges
        (4, 5),                                   # 5 is a sink
    ]
    unit, damp, base, k = 1_000_000, 85, 150_000, 4

    ranks = {u: unit for u in nodes}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    for _ in range(k):
        inc = {u: 0 for u in nodes}
        for s, d in edges:
            inc[d] += ranks[s] // outdeg[s]
        ranks = {u: base + (damp * inc[u]) // 100 for u in nodes}

    ndf = spark.createDataFrame([(u,) for u in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(ndf, edf, n_iter=k).collect()
    }
    assert got == ranks
    # skew sanity: the self-loop + parallel-edge hub outranks the sink
    assert got[2] > got[5]


# ---------------------------------------------------------------------------
# fill-in-the-middle transform (plans/sampling.fim_rows)
# ---------------------------------------------------------------------------


def test_fim_rows_semantics(spark):
    """Pivot bounds, sentinel framing, short-doc passthrough, and the
    losslessness invariant on hand-built docs."""
    from jobinsight_data_pipeline_v2_spark.plans.sampling import fim_rows

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # n=6, rewritten
            (2, "one two three"),  # n=3 < 4, passthrough
            (3, "a  b   c d"),  # multi-space: canonicalized to 4 toks
            (4, ""),  # empty text
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fim_rows(docs).collect()}

    # long doc: 1 <= a < b <= n-1 (all three spans non-empty)
    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert 1 <= r1["pivot_a"] < r1["pivot_b"] <= 5
    assert r1["lossless"] is True

    # short doc: untouched canonical text, zero pivots
    import hashlib

    r2 = rows[2]
    assert (r2["pivot_a"], r2["pivot_b"]) == (0, 0)
    assert r2["fim_hash"] == hashlib.md5(b"one two three").hexdigest()
    assert r2["lossless"] is True

    # multi-space doc: token canonicalization, still lossless
    r3 = rows[3]
    assert r3["n_tokens"] == 4
    assert r3["lossless"] is True

    # empty doc: passthrough of the empty canonical string
    r4 = rows[4]
    assert r4["n_tokens"] == 0
    assert r4["fim_hash"] == hashlib.md5(b"").hexdigest()
    assert r4["lossless"] is True


def test_fim_rows_sentinel_structure(spark):
    """The rewritten text is exactly '<PRE> p <SUF> s <MID> m' with the
    three spans sliced at the emitted pivots."""
    import hashlib

    from jobinsight_data_pipeline_v2_spark.plans.sampling import fim_rows

    text = "t0 t1 t2 t3 t4 t5 t6 t7"
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    r = fim_rows(docs).collect()[0]
    toks = text.split(" ")
    a, b = r["pivot_a"], r["pivot_b"]
    expected = (
        "<PRE> "
        + " ".join(toks[:a])
        + " <SUF> "
        + " ".join(toks[b:])
        + " <MID> "
        + " ".join(toks[a:b])
    )
    assert r["fim_hash"] == hashlib.md5(expected.encode()).hexdigest()
    assert r["fim_chars"] == len(expected)


# ---------------------------------------------------------------------------
# URL canonicalization (plans/corpus.canonical_url_columns)
# ---------------------------------------------------------------------------


def test_canonical_url_columns(spark):
    """Canonicalization algebra on adversarial URLs: case, www.,
    default vs real ports, tracking params, param order, fragments,
    and the no-query/no-port identity cases."""
    from jobinsight_data_pipeline_v2_spark.plans.corpus import (
        canonical_url_columns,
    )

    cases = [
        # (raw, expected canonical)
        ("http://www.Ex.com/a?b=2&a=1", "http://ex.com/a?a=1&b=2"),
        ("HTTP://EX.COM:80/a?a=1&b=2#frag", "http://ex.com/a?a=1&b=2"),
        ("https://ex.com:443/a", "https://ex.com/a"),
        ("https://ex.com:8443/a", "https://ex.com:8443/a"),
        ("http://ex.com/a?utm_source=x&a=1&fbclid=y", "http://ex.com/a?a=1"),
        ("http://ex.com/a?utm_source=x", "http://ex.com/a"),
        ("http://ex.com/a", "http://ex.com/a"),
        # :80 under https is NOT a default port — kept
        ("https://ex.com:80/a", "https://ex.com:80/a"),
        # LIKE-wildcard traps (review r7 s5): utm=1 / utmost / fbclid_x
        # are NOT tracking params and must survive
        ("http://ex.com/a?utm=1", "http://ex.com/a?utm=1"),
        ("http://ex.com/a?utmost=x&a=1", "http://ex.com/a?a=1&utmost=x"),
        ("http://ex.com/a?fbclid_x=1", "http://ex.com/a?fbclid_x=1"),
        ("http://ex.com/a?fbclid=zz&a=1", "http://ex.com/a?a=1"),
        # garbage must canonicalize to NULL, not kill the scan
        ("not a url at all", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["canonical_url"]
        for r in canonical_url_columns(df).collect()
    }
    for raw, want in cases:
        assert got[raw] == want, f"{raw}: {got[raw]} != {want}"


# ---------------------------------------------------------------------------
# MMR greedy selection (plans/vectors.mmr_greedy)
# ---------------------------------------------------------------------------


def test_mmr_greedy_prefers_diversity(spark):
    """A near-duplicate of the top hit must NOT be picked second even
    though it has the second-best relevance; a pure-Python greedy
    reference agrees on every rank."""
    from jobinsight_data_pipeline_v2_spark.plans.vectors import mmr_greedy

    # candidates: 1 (rel 100), 2 (rel 99, near-dup of 1: sim 98),
    # 3 (rel 60, dissimilar), 4 (rel 50, dissimilar)
    cand = [(7, 1, 100), (7, 2, 99), (7, 3, 60), (7, 4, 50)]
    sims = {(1, 2): 98, (1, 3): 5, (1, 4): 4, (2, 3): 6, (2, 4): 7, (3, 4): 3}
    pair_rows = []
    for (a, b), s in sims.items():
        pair_rows += [(7, a, b, s), (7, b, a, s)]
    cdf = spark.createDataFrame(cand, "query_id long, vec_id long, s_q long")
    pdf = spark.createDataFrame(
        pair_rows, "query_id long, av long, bv long, s_ab long"
    )
    got = {
        r["rank"]: (r["vec_id"], r["penalty"])
        for r in mmr_greedy(cdf, pdf, 4).collect()
    }
    # rank 1: best relevance. rank 2: 3 wins (60-5=55) over the
    # near-dup 2 (99-98=1) and 4 (50-4=46). rank 3: picked={1,3}, so
    # pen(4)=max(4,3)=4 → 46 beats 2's 99-98=1. rank 4: 2 remains
    # with pen max(98,6,7)=98.
    assert got[1] == (1, 0)
    assert got[2] == (3, 5)
    assert got[3] == (4, 4)
    assert got[4] == (2, 98)

    # pure-Python greedy agrees (the spec, not the example)
    def ref(cands, sims_sym, k):
        picked, out = [], []
        rel = {v: s for _, v, s in cands}
        rest = sorted(rel)
        for r in range(1, k + 1):
            best = None
            for v in rest:
                pen = max((sims_sym[tuple(sorted((v, p)))] for p in picked), default=0)
                key = (-(rel[v] - pen), v)
                if best is None or key < best[0]:
                    best = (key, v, pen)
            out.append((r, best[1], best[2]))
            picked.append(best[1])
            rest.remove(best[1])
        return {r: (v, p if r > 1 else 0) for r, v, p in out}

    assert got == ref(cand, sims, 4)


def test_merge_rollup_delta_edges(spark):
    """IVM edge semantics: a delta can create a brand-new group, empty
    an existing one (the group must disappear like a recompute), and
    net an update to exactly -old+new."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.merge import (
        merge_rollup_delta,
    )

    state = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 50), ("c", 3, 300)],
        "k string, n long, v long",
    )
    # a: +1 insert of 10; b: -1 delete (empties); d: new group;
    # c: update one row 100 -> 120 (net n 0, v +20)
    delta = spark.createDataFrame(
        [("a", 1, 10), ("b", -1, -50), ("d", 2, 70), ("c", 0, 20)],
        "k string, n long, v long",
    )
    got = {
        r.k: (r.n, r.v)
        for r in merge_rollup_delta(state, delta, ["k"], ["v"]).collect()
    }
    assert got == {"a": (3, 110), "c": (3, 320), "d": (2, 70)}
    assert "b" not in got  # emptied group dropped


def test_merge_distinct_support_edges(spark):
    """COUNT(DISTINCT) support-multiset IVM: a value fully deleted
    from a group drops its support row (distinct shrinks), a partial
    delete keeps it, a new (group, value) appears, an update's
    −old/+new pair cancels, and a delete of a never-held row raises
    in-plan (CDC defect, never a silent undercount)."""
    import pytest

    from jobinsight_data_pipeline_v2_spark.operators.merge import (
        merge_distinct_support,
    )

    state = spark.createDataFrame(
        [("jan", 1, 2), ("jan", 2, 1), ("feb", 1, 1)],
        "mo string, cust long, m long",
    )
    delta = spark.createDataFrame(
        # jan/1: one of two rows deleted; jan/2: last row deleted;
        # jan/3: new value; feb/1: update pair nets zero (absent from
        # the pre-aggregated delta — modeled by NOT appearing)
        [("jan", 1, -1), ("jan", 2, -1), ("jan", 3, 1)],
        "mo string, cust long, dm long",
    )
    got = {
        (r.mo, r.cust): r.m
        for r in merge_distinct_support(
            state, delta, ["mo", "cust"]
        ).collect()
    }
    assert got == {("jan", 1): 1, ("jan", 3): 1, ("feb", 1): 1}
    bad = spark.createDataFrame(
        [("feb", 9, -1)], "mo string, cust long, dm long"
    )
    with pytest.raises(Exception, match="multiplicity went negative"):
        merge_distinct_support(state, bad, ["mo", "cust"]).collect()


def test_merge_minmax_delta_dispatch(spark):
    """IVM MIN/MAX maintenance: clean groups keep bounds with zero
    rescan, bound-hitting deletes rescan only their group, equal-value
    (tie) deletes rescan conservatively, emptied groups drop, and
    insert-only new groups appear clean."""
    from jobinsight_data_pipeline_v2_spark.operators.merge import (
        merge_minmax_delta,
    )

    # base: g1 = {1, 5, 9}, g2 = {2, 8}, g3 = {4}
    state = spark.createDataFrame(
        [("g1", 3, 1, 9), ("g2", 2, 2, 8), ("g3", 1, 4, 4)],
        "k string, n long, mn long, mx long",
    )
    # deletes: g1 loses interior 5 (clean); g2 loses its max 8
    # (dirty); g3 loses its only row (emptied)
    deletes = spark.createDataFrame(
        [("g1", 1, 5, 5), ("g2", 1, 8, 8), ("g3", 1, 4, 4)],
        "k string, n long, mn long, mx long",
    )
    # inserts: g1 gains 0 (new min, still clean); g4 is a new group
    inserts = spark.createDataFrame(
        [("g1", 1, 0, 0), ("g4", 2, 7, 11)],
        "k string, n long, mn long, mx long",
    )
    effective = spark.createDataFrame(
        [("g1", 1), ("g1", 9), ("g1", 0), ("g2", 2),
         ("g4", 7), ("g4", 11)],
        "k string, v long",
    )
    got = {
        r.k: (r.n, r.mn, r.mx, r.rescanned)
        for r in merge_minmax_delta(
            state, inserts, deletes, effective, ["k"], "v"
        ).collect()
    }
    assert got == {
        "g1": (3, 0, 9, False),   # clean: bounds survive + insert min
        "g2": (1, 2, 2, True),    # dirty: max deleted → rescanned
        "g4": (2, 7, 11, False),  # new group, insert-only
    }
    assert "g3" not in got        # emptied group dropped

    # tie case: deleting ONE of two equal minima — conservative rescan
    state2 = spark.createDataFrame(
        [("t", 3, 1, 9)], "k string, n long, mn long, mx long"
    )
    dels2 = spark.createDataFrame(
        [("t", 1, 1, 1)], "k string, n long, mn long, mx long"
    )
    ins2 = spark.createDataFrame(
        [], "k string, n long, mn long, mx long"
    )
    eff2 = spark.createDataFrame(
        [("t", 1), ("t", 9)], "k string, v long"
    )
    row = merge_minmax_delta(
        state2, ins2, dels2, eff2, ["k"], "v"
    ).collect()[0]
    assert (row.n, row.mn, row.mx, row.rescanned) == (2, 1, 9, True)


def test_merge_minmax_delta_state_absent_group_with_deletes(spark):
    """Review r9: a group ABSENT from state that gets an insert plus a
    same-batch update (delete-old + insert-new) must RESCAN — the
    clean path would fold the deleted value into the bounds."""
    from jobinsight_data_pipeline_v2_spark.operators.merge import (
        merge_minmax_delta,
    )

    state = spark.createDataFrame(
        [], "k string, n long, mn long, mx long"
    )
    # new row v=1 inserted then updated to 5 within the batch
    inserts = spark.createDataFrame(
        [("g", 2, 1, 5)], "k string, n long, mn long, mx long"
    )
    deletes = spark.createDataFrame(
        [("g", 1, 1, 1)], "k string, n long, mn long, mx long"
    )
    effective = spark.createDataFrame([("g", 5)], "k string, v long")
    row = merge_minmax_delta(
        state, inserts, deletes, effective, ["k"], "v"
    ).collect()[0]
    assert (row.n, row.mn, row.mx, row.rescanned) == (1, 5, 5, True)


def test_span_corruption_positions_match_python_mirror(spark):
    """The hash gate pins span STATISTICS + parse-back losslessness;
    this golden pins the exact span POSITIONS and sentinel framing of
    the emitted (input, target) strings against an independent
    pure-Python mirror of the window/bucket arithmetic."""
    import hashlib

    from jobinsight_data_pipeline_v2_spark.plans.sampling import (
        _SC_LMOD,
        _SC_SMOD,
        _SC_W,
        span_corruption_texts,
    )

    def bucket(doc_id, w, salt, mod):
        h = hashlib.md5(f"{doc_id}:{w}:{salt}".encode()).hexdigest()[:8]
        return int(h, 16) % mod

    def mirror(doc_id, toks):
        inp, tgt, k = [], [], 0
        n = len(toks)
        for w in range((n - 1) // _SC_W + 1):
            win = toks[w * _SC_W : w * _SC_W + _SC_W]
            s = bucket(doc_id, w, "s", _SC_SMOD)
            l = 1 + bucket(doc_id, w, "l", _SC_LMOD)
            if s < len(win):
                span = win[s : s + l]
                inp += win[:s] + [f"<X{k}>"] + win[s + len(span):]
                tgt += [f"<X{k}>"] + span
                k += 1
            else:
                inp += win
        return " ".join(inp), " ".join(tgt)

    rows = [
        (1, "a b c d e f g h i j k l m n o p q r"),
        (2, "one two three"),
        (3, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.input, r.target, r.n_spans, r.n_corrupted)
        for r in span_corruption_texts(docs).collect()
    }
    for doc_id, text in rows:
        toks = text.split()
        e_in, e_tg = mirror(doc_id, toks)
        g_in, g_tg, n_spans, n_corr = got[doc_id]
        assert g_in == e_in, (doc_id, g_in, e_in)
        assert g_tg == e_tg, (doc_id, g_tg, e_tg)
        assert n_spans == e_tg.count("<X")
        assert n_corr == ((len(e_tg.split()) - n_spans) if e_tg else 0)


def test_benford_ppm_literals_match_log10():
    """The shared integer ppm literals ARE Benford's law (the oracle
    and the plan both consume them; neither evaluates a log)."""
    import math

    from jobinsight_data_pipeline_v2_spark.plans.core import _BENFORD_PPM

    for d in range(1, 10):
        assert _BENFORD_PPM[d - 1] == round(math.log10(1 + 1 / d) * 1e6)


def test_sstemmer_matches_python_reference(spark):
    """The CASE-ladder s-stemmer == an independent pure-Python
    transcription of Harman's three rules, over every rule and every
    exception-guard class."""
    from jobinsight_data_pipeline_v2_spark.plans.text import _sstem_case

    def py_sstem(w):
        if w.endswith("ies") and not (
            w.endswith("eies") or w.endswith("aies")
        ):
            return w[:-3] + "y"
        if w.endswith("es") and not (
            w.endswith("aes") or w.endswith("ees") or w.endswith("oes")
        ):
            return w[:-1]
        if w.endswith("s") and not (
            w.endswith("us") or w.endswith("ss")
        ):
            return w[:-1]
        return w

    words = [
        "queries", "eies", "aies", "babies", "stories",
        "batches", "tables", "aes", "trees", "goes", "heroes",
        "scans", "keys", "bus", "class", "pass", "virus",
        "scan", "merge", "s", "es", "ies", "x",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.stem
        for r in df.selectExpr("w", f"{_sstem_case('w')} AS stem").collect()
    }
    for w in words:
        assert got[w] == py_sstem(w), (w, got[w], py_sstem(w))
    # Harman's canonical conflations hold
    assert got["queries"] == "query"
    assert got["batches"] == "batche"  # -es drops ONE s (rule 2)
    assert got["scans"] == "scan"
    assert got["class"] == "class" and got["bus"] == "bus"


def test_trending_decay_clamp_boundary(spark):
    """Orders older than 26 quarters share the floor weight 1 (the
    clamp), and a fresher mix outranks a larger stale count — the
    divergence the gate exists to expose."""
    from jobinsight_data_pipeline_v2_spark.plans.core import (
        _TREND_ANCHOR,
        _TREND_MAXQ,
    )
    import datetime as dt

    anchor = dt.date.fromisoformat(_TREND_ANCHOR)
    rows = []
    # 'stale': 200 orders far older than the clamp → weight 1 each
    for i in range(200):
        rows.append((i, "stale", anchor - dt.timedelta(days=91 * 40)))
    # 'fresh': 3 orders this quarter → weight 2^26 each
    for i in range(3):
        rows.append((1000 + i, "fresh", anchor - dt.timedelta(days=5)))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, d date"
    ).selectExpr(
        "o_orderkey", "o_orderpriority",
        "CAST(d AS TIMESTAMP) AS o_orderdate",
        "1.0 AS o_totalprice", "1 AS o_custkey",
        "'O' AS o_orderstatus",
    )
    import jobinsight_data_pipeline_v2_spark.plans.core as core
    import jobinsight_data_pipeline_v2_spark.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda spark_, sf, name: df
        core.load_table = tables.load_table
        out = {r.priority: (r.n_orders, r.decayed_score, r.trend_rank)
               for r in core.trending_priorities(spark, "ignored").collect()}
    finally:
        tables.load_table = orig
        core.load_table = orig
    assert out["stale"] == (200, 200, 2)        # clamp: weight 1 each
    assert out["fresh"][0] == 3
    assert out["fresh"][1] == 3 * (1 << _TREND_MAXQ)
    assert out["fresh"][2] == 1                 # fresh outranks stale


def test_hits_integer_matches_pure_python(spark):
    """hits_integer pinned against an independent pure-Python
    implementation of the same integer spec on structured small
    graphs — a star (one clear authority), a bipartite hub/authority
    split, and a cycle with a chord (asymmetric scores)."""
    from jobinsight_data_pipeline_v2_spark.operators.graph import (
        hits_integer,
    )

    def ref(n_nodes, edges, n_iter=3, unit=1_000_000):
        hub = {v: unit for v in range(n_nodes)}
        auth = {}

        def rescale(raw):
            mx = max(raw.values())
            return {
                v: (unit * raw.get(v, 0)) // mx for v in range(n_nodes)
            }

        for _ in range(n_iter):
            raw = {}
            for s, d in edges:
                raw[d] = raw.get(d, 0) + hub[s]
            auth = rescale(raw)
            raw = {}
            for s, d in edges:
                raw[s] = raw.get(s, 0) + auth[d]
            hub = rescale(raw)
        return auth, hub

    graphs = {
        "star": (5, [(i, 0) for i in range(1, 5)]),
        "bipartite": (6, [(s, d) for s in (0, 1, 2) for d in (3, 4, 5)]),
        "chorded_cycle": (5, [(i, (i + 1) % 5) for i in range(5)]
                          + [(0, 2), (3, 2)]),
    }
    for name, (n, edges) in graphs.items():
        nodes = spark.createDataFrame(
            [(v,) for v in range(n)], "node long"
        )
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: (r.authority, r.hub)
            for r in hits_integer(nodes, e).collect()
        }
        a, h = ref(n, edges)
        assert got == {v: (a[v], h[v]) for v in range(n)}, name
        # the star's center is the unit authority; leaves the hubs
        if name == "star":
            assert got[0][0] == 1_000_000 and got[1][1] == 1_000_000


def test_hits_integer_raises_on_edgeless_graph(spark):
    """ADVICE r11: an edge-less graph makes the round-max aggregate
    empty — hits_integer must raise loudly (assert_true) instead of
    silently NULLing every score."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from jobinsight_data_pipeline_v2_spark.operators.graph import (
        hits_integer,
    )

    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(SparkRuntimeException, match="no edges"):
        hits_integer(nodes, edges, n_iter=1).collect()


def test_jaro_winkler_spark_chain_matches_reference(spark):
    """The in-row Spark JW chain (operators/jarowinkler.py) equals
    the pure-Python reference count-for-count on 300 seeded random
    pairs spanning short/empty/ASCII-symbol strings — the third leg
    of the differential (reference itself pinned against DuckDB
    native by the hypothesis test)."""
    import random

    from jobinsight_data_pipeline_v2_spark.operators.jarowinkler import (
        jaro_winkler_ref,
        jaro_winkler_scored,
    )

    rng = random.Random(4242)
    rows = []
    for _ in range(300):
        alpha = rng.choice(["abcd", "abcdefgh", "Customer#013", "xy "])
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        rows.append((a, b))
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r.a, r.b): (r.m, r.t2, r.prefix_l, r.jw_ppm)
        for r in jaro_winkler_scored(df, "a", "b").collect()
    }
    for a, b in rows:
        rm, rt2, rpl, rppm = jaro_winkler_ref(a, b)
        gm, gt2, gpl, gppm = got[(a, b)]
        if rm == 0:
            assert gm == 0 and gppm == 0, (a, b)
        else:
            assert (gm, gt2, gpl, gppm) == (rm, rt2, rpl, rppm), (a, b)


def test_kcenter_greedy_matches_pure_python(spark):
    """kcenter_greedy == an independent pure-Python greedy (max
    min-squared-L2, ties -> min id, seed = min id) on a small corpus
    with planted structure: one tight cluster + spread outliers, plus
    an exact duplicate pair (the tie path)."""
    from jobinsight_data_pipeline_v2_spark.operators.similarity import (
        kcenter_greedy,
    )

    vecs = {
        0: [0, 0, 0],
        1: [1, 0, 0],
        2: [0, 1, 0],
        3: [100, 100, 100],
        4: [100, 100, 100],  # duplicate of 3: tie broken by id
        5: [-50, 0, 0],
        6: [0, -80, 10],
        7: [2, 1, 0],
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    picks = [(1, 0, 0)]
    chosen = [0]
    for rnd in range(2, 6):
        best = max(
            vecs,
            key=lambda i: (min(d2(vecs[i], vecs[c]) for c in chosen), -i),
        )
        picks.append(
            (rnd, best, min(d2(vecs[best], vecs[c]) for c in chosen))
        )
        chosen.append(best)

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, v array<bigint>"
    )
    got = [
        (r["round"], r.vec_id, r.min_dist_sq)
        for r in kcenter_greedy(df, 5).orderBy("round").collect()
    ]
    assert got == picks

