"""Degenerate-input robustness: empty tables, single rows, all-null columns.

Operators must degrade to empty/identity results — not throw — because a
100 TB pipeline always contains an empty partition, date-hole, or
filtered-to-nothing branch somewhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from bigdata_electricity_spark.operators import cleaning as C
from bigdata_electricity_spark.operators import dataframe_ops as O
from bigdata_electricity_spark.operators import dedup as D
from bigdata_electricity_spark.operators.reduction import aggregate_hourly
from bigdata_electricity_spark.operators.transformation import min_max_scale

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


def _empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_dedup_ops_on_empty(spark):
    empty = _empty_docs(spark)
    assert D.exact_dup_groups(empty).count() == 0
    assert D.dedup_exact(empty).count() == 0
    assert D.minhash_lsh_candidates(empty).count() == 0
    assert D.ngram_jaccard_pairs(empty).count() == 0


def test_dedup_single_doc(spark):
    one = spark.createDataFrame([(1, "just one document here")], DOC_SCHEMA)
    assert D.exact_dup_groups(one).count() == 1
    assert D.minhash_lsh_candidates(one).count() == 0  # no pair with itself


def test_cleaning_counts_on_empty(spark):
    schema = StructType(
        [StructField("DateTime", StringType())]
        + [StructField(c, StringType()) for c in C.NUM_COLS]
    )
    empty = spark.createDataFrame([], schema)
    stats = C.compute_before_stats(empty)
    assert stats.total_rows == 0
    assert stats.duplicate_timestamps == 0
    assert C.count_full_row_dups(empty) == 0


def test_hourly_agg_on_empty(spark):
    schema = StructType([
        StructField("DateTime", StringType()),
        StructField("Global_active_power", DoubleType()),
    ])
    empty = spark.createDataFrame([], schema).withColumn(
        "DateTime", F.col("DateTime").cast("timestamp")
    )
    out = aggregate_hourly(empty, num_cols=["Global_active_power"])
    assert out.count() == 0


def test_min_max_scale_on_empty_and_all_null(spark):
    schema = StructType([StructField("x", DoubleType())])
    empty = spark.createDataFrame([], schema)
    assert min_max_scale(empty, ["x"]).count() == 0  # min/max None → guard
    nulls = spark.createDataFrame([(None,), (None,)], schema)
    vals = [r["x_scaled"] for r in min_max_scale(nulls, ["x"]).collect()]
    assert vals == [0.0, 0.0]


def test_topk_and_argmax_on_empty(spark):
    schema = StructType([
        StructField("k", StringType()), StructField("v", DoubleType()),
    ])
    empty = spark.createDataFrame([], schema)
    assert O.top_k(empty, "v", 5).count() == 0
    row = O.argmax(empty, "k", "v").first()
    assert row["k"] is None and row["v"] is None  # max_by of nothing → null row
