"""Salted aggregation/join correctness + approx-variant accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.operators.skew import (
    approx_monthly_stats,
    approx_percentiles,
    salted_agg,
    salted_join,
)

SF = "/root/testdata/sf0.01"


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("qty"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": F.count(F.lit(1)),
            "qty": F.sum(F.col("l_quantity").cast("decimal(20,2)")),
        },
    )
    sym = plain.exceptAll(salted).count() + salted.exceptAll(plain).count()
    assert sym == 0


def test_salted_join_matches_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    plain = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("s")
    )
    salted = salted_join(li, orders, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("s")
    )
    assert plain.collect() == salted.collect()


def test_approx_variants_close_to_exact(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    exact = {
        r["order_month"]: r["n"]
        for r in orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r["order_month"]: r["n_customers_approx"]
        for r in approx_monthly_stats(orders).collect()
    }
    for m, n in exact.items():
        assert abs(approx[m] - n) / max(n, 1) < 0.1, (m, n, approx[m])

    ap = approx_percentiles(orders, "o_totalprice", ["o_orderstatus"]).collect()
    ex = orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50")
    ).collect()
    ex50 = {r["o_orderstatus"]: r["p50"] for r in ex}
    for r in ap:
        assert abs(r["p50"] - ex50[r["o_orderstatus"]]) / ex50[r["o_orderstatus"]] < 0.05


def test_detect_hot_keys_finds_exactly_the_hot_keys(spark):
    """On a frame where one key owns half the rows and 40 cold keys
    share the rest, a 10% detection threshold must flag the hot key
    and no cold one (the CMS overestimate envelope is far below the
    threshold margin)."""
    from jobinsight_data_pipeline_v2_spark.operators.skew import (
        detect_hot_keys,
    )

    rows = [("hot" if i % 2 == 0 else f"k{i % 40}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "key string, v long")
    hot = {r["key"] for r in detect_hot_keys(df, "key", 100).collect()}
    assert hot == {"hot"}


def test_selective_salted_agg_equals_plain_agg(spark):
    """Selective salting is invisible in the result: aggregates equal
    the plain groupBy for every key, was_salted = 1 exactly on the
    detected set, and cold keys produce ONE phase-1 partial row (salt
    pinned to 0)."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.skew import (
        detect_hot_keys,
        selective_salted_agg,
    )

    rows = [("hot" if i % 2 == 0 else f"k{i % 40}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "key string, v long")
    hot = detect_hot_keys(df, "key", 100)
    got = {
        r["key"]: (r["n"], r["s"], r["was_salted"])
        for r in selective_salted_agg(
            df, "key", {"n": F.count(F.lit(1)), "s": F.sum("v")}, hot
        ).collect()
    }
    exp = {
        r["key"]: (r["n"], r["s"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert set(got) == set(exp)
    for k, (n, s) in exp.items():
        gn, gs, flag = got[k]
        assert (gn, gs) == (n, s), k
        assert flag == (1 if k == "hot" else 0), k


def test_selective_salted_agg_rejects_unknown_merge(spark):
    import pytest
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.skew import (
        selective_salted_agg,
    )

    df = spark.createDataFrame([("a", 1)], "key string, v long")
    hot = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="unknown merge"):
        selective_salted_agg(
            df, "key", {"n": F.count(F.lit(1))}, hot, merge={"n": "median"}
        )


def test_selective_salted_join_equals_plain_join(spark):
    """Inner and left results (values AND multiplicities, including
    NULL rows for dim-missing keys) match the unsalted join exactly;
    only detected-hot rows fan out."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.skew import (
        selective_salted_join,
    )

    rows = [("hot", i) for i in range(40)] + [
        (f"k{i % 5}", 100 + i) for i in range(20)
    ]
    fact = spark.createDataFrame(rows, "key string, v long")
    # dim misses k3 entirely; duplicates are NOT in the contract (dim
    # is a dimension table), but multiplicity of the fact side is
    dim = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k1", 3), ("k2", 4), ("k4", 6)],
        "key string, attr long",
    )
    hot = spark.createDataFrame([("hot",)], "key string")

    for how in ("inner", "left"):
        got = (
            selective_salted_join(fact, dim, "key", hot, n_salts=4, how=how)
            .groupBy("key")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("sv"),
                F.min("attr").alias("a"),
            )
            .collect()
        )
        exp = (
            fact.join(dim, "key", how)
            .groupBy("key")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("sv"),
                F.min("attr").alias("a"),
            )
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, exp)), how
    # left keeps the dim-missing key with NULL attr
    left = selective_salted_join(fact, dim, "key", hot, n_salts=4, how="left")
    k3 = left.filter("key = 'k3'").collect()
    assert len(k3) == 4 and all(r.attr is None for r in k3)


def test_replicate_hot_fans_out_only_hot_rows(spark):
    """The small side replicates n_salts x for hot keys and exactly
    once (salt 0) for cold keys — the selective budget the operator
    exists for."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.skew import (
        _replicate_hot,
    )

    dim = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k1", 3)], "key string, attr long"
    )
    hot = F.broadcast(
        spark.createDataFrame([("hot",)], "key string").withColumn(
            "__hot", F.lit(1)
        )
    )
    rep = _replicate_hot(dim, hot, "key", n_salts=8)
    got = {
        r.key: (r.n, r.mn, r.mx)
        for r in rep.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__salt").alias("mn"),
            F.max("__salt").alias("mx"),
        )
        .collect()
    }
    assert got["hot"] == (8, 0, 7)
    assert got["k0"] == (1, 0, 0) and got["k1"] == (1, 0, 0)


def test_selective_salted_join_rejects_right_joins(spark):
    import pytest

    from jobinsight_data_pipeline_v2_spark.operators.skew import (
        selective_salted_join,
    )

    df = spark.createDataFrame([("a", 1)], "key string, v long")
    hot = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="allowed"):
        selective_salted_join(df, df, "key", hot, how="right")


def test_hll_registers_merge_and_estimate(spark):
    """Slot-wise max of split sketches equals the whole-corpus sketch
    (the mergeability that makes registers a persistable artifact),
    and the estimator lands within the gate's 25% bound on real
    cardinalities including the linear-counting small range."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    n = 3000
    df = spark.createDataFrame(
        [(i, f"user{i % 1100}") for i in range(n)], "i long, key string"
    )
    whole = hll_registers(df, "key")
    half_a = hll_registers(df.filter("i % 2 = 0"), "key")
    half_b = hll_registers(df.filter("i % 2 = 1"), "key")
    merged = hll_merge(half_a, half_b)
    a = {(r.slot): r.rank for r in whole.collect()}
    b = {(r.slot): r.rank for r in merged.collect()}
    assert a == b
    est = hll_estimate(whole).collect()[0].hll_est
    assert abs(est - 1100) <= 1100 / 4
    # small range: linear counting keeps tiny cardinalities tight
    tiny = hll_registers(df.filter("i < 7"), "key")
    est_t = hll_estimate(tiny).collect()[0].hll_est
    assert abs(est_t - 7) <= 3.0


def test_hll_registers_persist_and_merge_across_days(spark, tmp_path):
    """The artifact story: per-ingest-day registers written to parquet,
    read back, and merged must equal the whole-corpus sketch — union
    cardinality answered WITHOUT re-reading data."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(i, f"u{i % 900}") for i in range(2500)], "i long, key string"
    )
    days = [df.filter(f"i % 3 = {d}") for d in range(3)]
    for d, frame in enumerate(days):
        hll_registers(frame, "key").write.parquet(
            str(tmp_path / f"regs/day={d}")
        )
    merged = None
    for d in range(3):
        regs = spark.read.parquet(str(tmp_path / f"regs/day={d}"))
        merged = regs if merged is None else hll_merge(merged, regs)
    whole = hll_registers(df, "key")
    a = {r.slot: r.rank for r in whole.collect()}
    b = {r.slot: r.rank for r in merged.collect()}
    assert a == b
    est = hll_estimate(merged).collect()[0].hll_est
    assert abs(est - 900) <= 900 / 4


def test_qhist_merge_and_guard(spark):
    """Bucket-wise addition of split histograms equals the whole
    histogram; non-positive values fail loudly in-plan."""
    import pytest
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        qhist_build,
        qhist_merge,
    )

    df = spark.createDataFrame(
        [(i, 1 + (i * 37) % 5000) for i in range(4000)],
        "i long, v long",
    )
    whole = qhist_build(df, "v")
    merged = qhist_merge(
        qhist_build(df.filter("i % 2 = 0"), "v"),
        qhist_build(df.filter("i % 2 = 1"), "v"),
    )
    a = {r.bucket: r.cnt for r in whole.collect()}
    b = {r.bucket: r.cnt for r in merged.collect()}
    assert a == b and sum(a.values()) == 4000
    bad = spark.createDataFrame([(0,)], "v long")
    with pytest.raises(Exception, match="qhist_build"):
        qhist_build(bad, "v").collect()


def _key_counts(spark, keys):
    return (
        spark.createDataFrame([(int(k),) for k in keys], "k long")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def test_cms_planned_join_flips_on_inner_product(spark):
    """The r9 ask's done-criterion: IDENTICAL side sizes choose
    broadcast vs sort-merge on the inner-product estimate alone —
    uniform keys (fan-out 1) broadcast, a single hot key (fan-out n)
    trips the explosion guard into merge. Plan-asserted both ways."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        cms_build,
        cms_planned_join,
    )

    n = 200
    fact_u = spark.createDataFrame(
        [(i % n, i) for i in range(n)], "k long, payload long"
    )
    dim_u = spark.createDataFrame(
        [(i, i * 10) for i in range(n)], "k long, attr long"
    )
    fact_h = spark.createDataFrame(
        [(7, i) for i in range(n)], "k long, payload long"
    )
    dim_h = spark.createDataFrame(
        [(7, i * 10) for i in range(n)], "k long, attr long"
    )

    cms_fu = cms_build(_key_counts(spark, range(n)), "k", "n")
    cms_du = cms_build(_key_counts(spark, range(n)), "k", "n")
    cms_fh = cms_build(_key_counts(spark, [7] * n), "k", "n")
    cms_dh = cms_build(_key_counts(spark, [7] * n), "k", "n")

    j_u, d_u = cms_planned_join(
        fact_u, dim_u.withColumnRenamed("k", "dk"),
        fact_u.k == F.col("dk"), cms_fact=cms_fu, cms_dim=cms_du,
    )
    assert d_u["strategy"] == "broadcast" and d_u["inputs"] == "cms"
    assert d_u["n_fact"] == n and d_u["n_dim"] == n
    assert "BroadcastHashJoin" in j_u._jdf.queryExecution().executedPlan().toString()

    j_h, d_h = cms_planned_join(
        fact_h, dim_h.withColumnRenamed("k", "dk"),
        fact_h.k == F.col("dk"), cms_fact=cms_fh, cms_dim=cms_dh,
    )
    assert d_h["strategy"] == "merge"
    assert d_h["est_join_rows"] >= n * n  # the hot key's true fan-out
    assert "SortMergeJoin" in j_h._jdf.queryExecution().executedPlan().toString()
    # values are invariant to the choice
    assert j_u.count() == n and j_h.count() == n * n


def test_cms_planned_join_file_size_fallback(spark):
    """Without sketches the decision falls back to the dim side's
    _spread_src_bytes (the tfidf broadcast-gate device); absent that
    too, the conservative merge path wins."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        cms_planned_join,
    )

    fact = spark.createDataFrame([(i, i) for i in range(10)],
                                 "k long, p long")
    dim = spark.createDataFrame([(i, i) for i in range(10)],
                                "dk long, a long")
    dim._spread_src_bytes = 1024
    _, d_small = cms_planned_join(fact, dim, fact.k == dim.dk)
    assert d_small == {"strategy": "broadcast", "inputs": "file_size",
                       "dim_bytes": 1024}
    dim._spread_src_bytes = 10 << 30
    _, d_big = cms_planned_join(fact, dim, fact.k == dim.dk)
    assert d_big["strategy"] == "merge"
    dim2 = spark.createDataFrame([(i, i) for i in range(10)],
                                 "dk long, a long")
    _, d_none = cms_planned_join(fact, dim2, fact.k == dim2.dk)
    assert d_none == {"strategy": "merge", "inputs": "none"}


def test_cms_save_load_roundtrip_drives_same_decision(spark, tmp_path):
    """Sketches persist as parquet artifacts (the per-ingest-batch
    planner-statistics shape) and a LOADED sketch drives the identical
    decision — totals exact, estimate unchanged."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        cms_build,
        cms_join_estimate,
        load_cms,
        save_cms,
    )

    cms_a = cms_build(_key_counts(spark, list(range(50)) * 3), "k", "n")
    cms_b = cms_build(_key_counts(spark, range(100)), "k", "n")
    live = cms_join_estimate(cms_a, cms_b)
    assert live["n_fact"] == 150 and live["n_dim"] == 100
    assert live["est_join_rows"] >= 150  # true join size, overestimate
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    save_cms(cms_a, pa)
    save_cms(cms_b, pb)
    loaded = cms_join_estimate(load_cms(spark, pa), load_cms(spark, pb))
    assert loaded == live


def test_cms_inner_product_empty_sketch_is_zero(spark):
    """Review r10: an empty sketch map explodes to zero rows and a
    bare min() would return NULL — both estimator paths must agree on
    0 for an empty side."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        cms_build,
        cms_inner_product,
        cms_join_estimate,
    )

    empty = cms_build(
        spark.createDataFrame([], "k long, n long"), "k", "n"
    )
    full = cms_build(_key_counts(spark, range(10)), "k", "n")
    assert cms_inner_product(empty, full).collect()[0][0] == 0
    assert cms_inner_product(full, empty).collect()[0][0] == 0
    est = cms_join_estimate(empty, full)
    assert est["n_fact"] == 0 and est["est_join_rows"] == 0


def test_kmv_sketch_merge_and_exact_mode(spark):
    """KMV/theta sketch: (a) exact mode — fewer distinct keys than k
    retains every hash and the estimator returns the exact count;
    (b) mergeability — the merged halves' sketch equals the whole
    corpus's sketch element for element."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_merge_arrays,
        kmv_sketch,
    )

    keys = spark.range(1000).selectExpr("concat('k', id % 120) AS key")
    sk = kmv_sketch(keys, "key", k=256)
    row = sk.select(
        F.size("kmv").alias("n"),
        kmv_distinct_estimate(F.col("kmv"), 256).alias("est"),
    ).collect()[0]
    assert row.n == 120 and row.est == 120.0

    # sketch mode + merge: k=16 over 120 distinct
    whole = kmv_sketch(keys, "key", k=16).collect()[0].kmv
    half_a = kmv_sketch(
        keys.filter("id % 2 = 0"), "key", k=16
    ).selectExpr("kmv AS a")
    half_b = kmv_sketch(
        keys.filter("id % 2 = 1"), "key", k=16
    ).selectExpr("kmv AS b")
    merged = (
        half_a.crossJoin(half_b)
        .select(kmv_merge_arrays(F.col("a"), F.col("b"), 16).alias("m"))
        .collect()[0]
        .m
    )
    assert merged == whole
    assert len(whole) == 16 and whole == sorted(whole)


def test_kmv_set_ops_exact_when_small(spark):
    """With both sketches in exact mode, the theta algebra returns
    EXACT union/intersection/difference counts (theta_u = 2^63, scale
    factor 1) — the correctness floor under the estimator."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        kmv_set_op_counts,
        kmv_sketch,
    )

    a = spark.range(0, 60).selectExpr("concat('x', id) AS key")
    b = spark.range(40, 90).selectExpr("concat('x', id) AS key")
    sa = kmv_sketch(a, "key", k=256).selectExpr("kmv AS kmv_a")
    sb = kmv_sketch(b, "key", k=256).selectExpr("kmv AS kmv_b")
    row = kmv_set_op_counts(
        sa.crossJoin(sb), "kmv_a", "kmv_b", k=256
    ).collect()[0]
    assert row.n_union_s == 90
    assert row.n_inter_s == 20
    assert row.est_union == 90.0
    assert row.est_inter == 20.0
    assert row.est_diff == 40.0


def test_kmv_estimate_within_bound_sketch_mode(spark):
    """k=64 over 5000 distinct keys: the estimate must land within
    ~4 sigma (4/sqrt(63) ~ 50%... pinned tighter at 25%) of truth —
    a loose deterministic regression bound, not a statistical test
    (the hash is fixed, so the estimate is a constant)."""
    from jobinsight_data_pipeline_v2_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    keys = spark.range(5000).selectExpr("concat('y', id) AS key")
    est = (
        kmv_sketch(keys, "key", k=64)
        .select(kmv_distinct_estimate(F.col("kmv"), 64).alias("e"))
        .collect()[0]
        .e
    )
    assert abs(est - 5000) <= 1250
