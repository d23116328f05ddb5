"""Bucketed co-located join: correctness + shuffle-free physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobinsight_data_pipeline_v2_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.01"


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_bkt", "l_orderkey", n_buckets=8, path=f"{tmp_path}/li_bkt")
    write_bucketed(orders, "ord_bkt", "l_orderkey", n_buckets=8, path=f"{tmp_path}/ord_bkt")
    try:
        # disable auto-broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "li_bkt", "ord_bkt", "l_orderkey")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # correctness vs plain join
        plain = li.join(orders, "l_orderkey")
        assert joined.count() == plain.count()
        a = joined.agg(F.sum("l_extendedprice").cast("decimal(30,2)")).collect()
        b = plain.agg(F.sum("l_extendedprice").cast("decimal(30,2)")).collect()
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")
