"""Bucketed tables: co-located equi-join must plan without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_electricity_spark.sources.loaders import load_table
from bigdata_electricity_spark.sources.sinks import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed_table(li, "li_bucketed", "l_orderkey", 8, sort_col="l_orderkey")
    write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "orders_bucketed", "l_orderkey", 8, sort_col="l_orderkey",
    )
    a = spark.table("li_bucketed")
    b = spark.table("orders_bucketed")
    # Disable broadcast so the join must pick SortMergeJoin — the point is
    # that co-bucketing removes the Exchange, not that the table is small.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # And it still computes the right thing.
        n = joined.count()
        plain = load_table(spark, SF_DIR, "lineitem").join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).count()
        assert n == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
