"""Reduction + Transformation operators: hourly agg, one-hot, scaling."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bigdata_electricity_spark.operators import cleaning as C
from bigdata_electricity_spark.operators import reduction as R
from bigdata_electricity_spark.operators import transformation as T


@pytest.fixture(scope="module")
def hourly(spark, household_raw):
    df, _ = household_raw
    clean = C.clean_pipeline(df)
    return R.aggregate_hourly(clean)


def test_hourly_aggregation(hourly):
    # 3 days × 24 h of data → 72 hourly rows.
    assert hourly.count() == 72
    cols = set(hourly.columns)
    assert "Hour" in cols
    assert {f"avg_{c}" for c in C.NUM_COLS} <= cols


def test_hourly_avg_value(spark):
    df = spark.createDataFrame(
        [(datetime(2007, 3, 7, 10, m), float(v)) for m, v in [(0, 1.0), (1, 2.0), (2, 6.0)]],
        ["DateTime", "Global_active_power"],
    )
    out = R.aggregate_hourly(df, num_cols=["Global_active_power"]).collect()
    assert len(out) == 1
    assert out[0]["avg_Global_active_power"] == pytest.approx(3.0)
    assert out[0]["Hour"] == datetime(2007, 3, 7, 10, 0)


def test_select_features_drops_reactive(hourly):
    out = R.select_features(hourly)
    assert "avg_Global_reactive_power" not in out.columns
    assert "avg_Global_active_power" in out.columns


def test_stratified_sample_fractions(spark):
    from bigdata_electricity_spark.operators.reduction import stratified_sample
    from bigdata_electricity_spark.sources.loaders import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    sampled = stratified_sample(events, "event_type", {"purchase": 1.0, "view": 0.1})
    by_type = {r["event_type"]: r["count"]
               for r in sampled.groupBy("event_type").count().collect()}
    total = {r["event_type"]: r["count"]
             for r in events.groupBy("event_type").count().collect()}
    assert by_type["purchase"] == total["purchase"]        # fraction 1.0 keeps all
    assert 0 < by_type.get("view", 0) < total["view"] * 0.3  # ~10%
    assert set(by_type) == {"purchase", "view"}            # unlisted strata dropped


def test_sample_deterministic(hourly):
    a = R.sample_rows(hourly, 0.5, seed=42).count()
    b = R.sample_rows(hourly, 0.5, seed=42).count()
    assert a == b
    assert 0 < a < 72


def test_one_hot_exactly_one(hourly):
    out = T.one_hot_encode(T.add_time_derived(hourly))
    dow_sum = sum(F.col(f"dow_{d}") for d in range(1, 8))
    month_sum = sum(F.col(f"month_{m}") for m in range(1, 13))
    bad = out.filter((dow_sum != 1.0) | (month_sum != 1.0)).count()
    assert bad == 0
    # 2007-03-07 is a Wednesday → dayofweek=4 (1=Sunday), month=3.
    first = out.orderBy("Hour").first()
    assert first["dow_4"] == 1.0 and first["month_3"] == 1.0


def test_engineered_total(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0)],
        ["avg_Sub_metering_1", "avg_Sub_metering_2", "avg_Sub_metering_3"],
    )
    out = T.add_engineered(df).first()
    assert out["total_sub_metering"] == 6.0


def test_min_max_scale_bounds(hourly):
    out = T.min_max_scale(hourly, ["avg_Global_active_power"])
    row = out.agg(
        F.min("avg_Global_active_power_scaled").alias("lo"),
        F.max("avg_Global_active_power_scaled").alias("hi"),
    ).first()
    assert row["lo"] == pytest.approx(0.0)
    assert row["hi"] == pytest.approx(1.0)


def test_min_max_scale_constant_column_guard(spark):
    # max == min must not divide by zero (reference would emit null/inf,
    # Transformation.scala:62-65) — engine maps constants to 0.0.
    df = spark.createDataFrame([(5.0,), (5.0,)], ["x"])
    vals = [r["x_scaled"] for r in T.min_max_scale(df, ["x"]).collect()]
    assert vals == [0.0, 0.0]


def test_transform_pipeline_schema(hourly):
    out = T.transform_pipeline(R.select_features(hourly))
    cols = out.columns
    for c in ["date", "hour_of_day", "dow_1", "dow_7", "month_1", "month_12",
              "total_sub_metering", "avg_Global_active_power_scaled",
              "total_sub_metering_scaled"]:
        assert c in cols, c


def test_scalable_packing_offsets_match_global_window(spark):
    # The two-phase per-partition prefix sum must be bit-identical to the
    # single-partition global window it replaces at scale.
    from pyspark.sql import Window, functions as F

    from bigdata_electricity_spark.operators.packing import running_offsets_scalable
    from bigdata_electricity_spark.operators.text import normalize_text
    from bigdata_electricity_spark.sources.loaders import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sized = docs.select(
        "doc_id", F.size(F.split(normalize_text(F.col("text")), " ")).alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["doc_id"]: r["o"]
        for r in sized.withColumn("o", F.sum("n_tokens").over(w) - F.col("n_tokens")).collect()
    }
    got = {
        r["doc_id"]: r["start_offset"]
        for r in running_offsets_scalable(sized, n_partitions=7).collect()
    }
    assert got == want
    # And with Spark-chosen partitioning too.
    got_default = {
        r["doc_id"]: r["start_offset"] for r in running_offsets_scalable(sized).collect()
    }
    assert got_default == want


def test_scalable_packing_has_no_single_partition_exchange(spark):
    from pyspark.sql import functions as F

    from bigdata_electricity_spark.operators.packing import running_offsets_scalable
    from bigdata_electricity_spark.operators.text import normalize_text
    from bigdata_electricity_spark.sources.loaders import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sized = docs.select(
        "doc_id", F.size(F.split(normalize_text(F.col("text")), " ")).alias("n_tokens")
    )
    out = running_offsets_scalable(sized, n_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The window sorts WITHIN partitions; downstream of the pinned
    # checkpoint there is never a funnel through one partition.
    assert "Exchange SinglePartition" not in plan, plan[:1500]
    # The range repartition is pinned behind a lazy localCheckpoint (so
    # the subtotal action and the output plan share ONE partition
    # assignment — repartitionByRange samples boundaries with a
    # per-execution seed); the downstream plan therefore reads the
    # checkpointed RDD instead of re-planning the exchange.
    assert "Scan ExistingRDD" in plan, plan[:1500]
    # The range exchange lives in the checkpointed segment's own plan.
    inner = sized.repartitionByRange(7, F.col("doc_id"))
    inner_plan = inner._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in inner_plan.lower()


def test_multi_column_prefix_sums_match_global_window(spark):
    # exclusive_prefix_sums must agree with the single-partition global
    # window for EVERY requested column, including zero-heavy columns
    # and n_partitions both chosen and forced.
    from pyspark.sql import Window, functions as F

    from bigdata_electricity_spark.operators.packing import exclusive_prefix_sums

    rows = [(float(i % 17) + i * 0.001, i % 3, (i * 7) % 5) for i in range(500)]
    df = (
        spark.createDataFrame(rows, "v double, a long, b long")
        .groupBy("v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["v"]: (r["ae"], r["be"])
        for r in df.select(
            "v",
            F.coalesce(F.sum("a").over(w), F.lit(0)).alias("ae"),
            F.coalesce(F.sum("b").over(w), F.lit(0)).alias("be"),
        ).collect()
    }
    for kwargs in ({"n_partitions": 7}, {}):
        got = {
            r["v"]: (r["a_excl"], r["b_excl"])
            for r in exclusive_prefix_sums(df, "v", ["a", "b"], **kwargs).collect()
        }
        assert got == want
