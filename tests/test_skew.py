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
