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
