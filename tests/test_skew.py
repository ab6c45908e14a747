"""Salted join must be result-identical to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_electricity_spark.operators.skew import salted_join
from bigdata_electricity_spark.sources.loaders import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(orders, "o_orderkey").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    salted = salted_join(li, orders, "o_orderkey").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_row_count_with_skewed_key(spark):
    # A hot key covering half the fact table still joins exactly once per row.
    fact = spark.range(10000).select(
        F.when(F.col("id") < 5000, 1).otherwise(F.col("id")).alias("k"), "id"
    )
    dim = spark.range(10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = salted_join(fact, dim, "k", salt_buckets=16)
    assert out.count() == 10000
    assert out.filter(F.col("k") == 1).count() == 5000
