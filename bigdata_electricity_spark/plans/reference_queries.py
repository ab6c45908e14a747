"""Reference-parity queries: the 5 canonical SQL analytics + RDD-module
equivalents, mapped onto the driver testdata (SURVEY §2.13, §5.2).

Shape mapping (reference → testdata):
  Q1  avg power per hour-of-day            → avg events.value per hour(ts)
  Q2  COUNT(DISTINCT date)+AVG+VARIANCE    → orders global stats
  Q3  RANK years by avg power              → rank years by avg o_totalprice
  Q4  CTE + scalar subquery above-avg days → daily events.value totals
  Q5  ROW_NUMBER top month per year        → monthly lineitem revenue
  RDD threshold/top-k/argmax/categorize    → lineitem/events/orders

All implementations are DataFrame-API (Catalyst plans them identically to
the reference's spark.sql strings); the oracle strings are DuckDB ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.dataframe_ops import argmax, category_counts, threshold_filter, top_k, totals_by_key
from ..sources.loaders import load_table
from ..functions.rounding import dround, hround
from .registry import query


@query(
    "q1_hourly_avg",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           floor((AVG(value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY avg_value DESC
    """,
)
def q1_hourly_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — avg event value per hour of day, descending.

    Reference sql/SQLOperations.scala:39-46 (AVG + GROUP BY + ORDER BY).
    Plan: partial+final hash aggregate over 24 groups; no skew risk.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.hour("ts").alias("hour_of_day"))
        .agg(hround(F.avg("value"), 4).alias("avg_value"))
        .orderBy(F.desc("avg_value"))
    )


@query(
    "q2_global_stats",
    oracle="""
    SELECT CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS distinct_days,
           floor((AVG(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS avg_totalprice,
           floor((VAR_SAMP(o_totalprice)) * 0.01 + 0.5) / 0.01 AS var_totalprice
    FROM orders
    """,
)
def q2_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — global distinct-day count, mean and sample variance.

    Reference sql/SQLOperations.scala:57-63 (COUNT DISTINCT + AVG +
    VARIANCE). Variance is rounded to hundreds: its magnitude is ~2e10 and
    single-pass moment merges differ across engines in the last ~1e-3.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct(F.to_date("o_orderdate")).alias("distinct_days"),
        hround(F.avg("o_totalprice"), 4).alias("avg_totalprice"),
        hround(F.variance("o_totalprice"), -2).alias("var_totalprice"),
    )


@query(
    "q3_rank_years",
    oracle="""
    WITH yearly AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
               AVG(o_totalprice) AS avg_raw
        FROM orders GROUP BY 1
    )
    SELECT year,
           floor((avg_raw) * 10000.0 + 0.5) / 10000.0 AS avg_totalprice,
           CAST(RANK() OVER (ORDER BY avg_raw DESC) AS INTEGER) AS price_rank
    FROM yearly
    ORDER BY price_rank
    """,
)
def q3_rank_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 — rank years by average order price.

    Reference sql/SQLOperations.scala:74-87 (subquery-in-FROM + YEAR()
    group + RANK() OVER global order). The rank window is unpartitioned —
    single-partition exchange over #years rows (tiny post-aggregation;
    safe at any scale because ranking happens AFTER the rollup).
    """
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.avg("o_totalprice").alias("avg_raw")
    )
    w = Window.orderBy(F.desc("avg_raw"))
    return yearly.select(
        "year",
        hround("avg_raw", 4).alias("avg_totalprice"),
        F.rank().over(w).alias("price_rank"),
    ).orderBy("price_rank")


@query(
    "q4_above_avg_days",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, SUM(value) AS total_raw
        FROM events GROUP BY 1
    )
    SELECT day, floor((total_raw) * 100.0 + 0.5) / 100.0 AS total_value
    FROM daily
    WHERE total_raw > (SELECT AVG(total_raw) FROM daily)
    ORDER BY total_value DESC
    """,
)
def q4_above_avg_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 — days whose total event value exceeds the all-days average.

    Reference sql/SQLOperations.scala:97-114 (CTE + scalar subquery).
    DataFrame shape: 1-row aggregate broadcast-cross-joined against the
    daily rollup — the scalar subquery's physical plan, written out.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("total_raw")
    )
    avg_row = daily.agg(F.avg("total_raw").alias("avg_total"))
    return (
        daily.crossJoin(F.broadcast(avg_row))
        .filter(F.col("total_raw") > F.col("avg_total"))
        .select("day", hround("total_raw", 2).alias("total_value"))
        .orderBy(F.desc("total_value"))
    )


@query(
    "q5_top_month_per_year",
    oracle="""
    WITH monthly AS (
        SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
               CAST(month(l_shipdate) AS INTEGER) AS month,
               SUM(l_extendedprice * (1 - l_discount)) AS revenue_raw
        FROM lineitem GROUP BY 1, 2
    ), ranked AS (
        SELECT year, month, revenue_raw,
               ROW_NUMBER() OVER (PARTITION BY year ORDER BY revenue_raw DESC) AS rn
        FROM monthly
    )
    SELECT year, month, floor((revenue_raw) * 100.0 + 0.5) / 100.0 AS revenue
    FROM ranked WHERE rn = 1
    ORDER BY year
    """,
)
def q5_top_month_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — highest-revenue month within each year.

    Reference sql/SQLOperations.scala:124-151 (chained CTEs + ROW_NUMBER
    PARTITION BY + rank=1 filter). Window partitioned by year → parallel;
    runs on the ~84-row monthly rollup, not the base table.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    monthly = lineitem.groupBy(
        F.year("l_shipdate").alias("year"), F.month("l_shipdate").alias("month")
    ).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue_raw")
    )
    w = Window.partitionBy("year").orderBy(F.desc("revenue_raw"))
    return (
        monthly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("year", "month", hround("revenue_raw", 2).alias("revenue"))
        .orderBy("year")
    )


# ---------------------------------------------------------------------------
# RDD-module capabilities, re-expressed declaratively (SURVEY §3.3 mapping)
# ---------------------------------------------------------------------------

@query(
    "rdd_threshold_count",
    oracle="SELECT COUNT(*) AS n_rows FROM lineitem WHERE l_quantity > 45",
)
def rdd_threshold_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14/A12 — threshold filter + count (RDDOperations.scala:21-52)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return threshold_filter(lineitem, "l_quantity", 45.0).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "rdd_top5_days",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, floor((SUM(value)) * 100.0 + 0.5) / 100.0 AS total_value
    FROM events GROUP BY 1
    ORDER BY SUM(value) DESC LIMIT 5
    """,
)
def rdd_top5_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/O3/O4 — top-5 days by total value (RDDOperations.scala:158-232).

    Catalyst plans orderBy+limit as TakeOrderedAndProject: per-partition
    top-k then a k-row merge on the driver — no global sort.
    """
    events = load_table(spark, sf_dir, "events")
    daily = totals_by_key(events, F.to_date("ts"), "value", "day", "total_raw")
    return top_k(daily, "total_raw", 5).select(
        "day", hround("total_raw", 2).alias("total_value")
    )


@query(
    "rdd_hourly_argmax",
    oracle="""
    WITH hourly AS (
        SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day, SUM(value) AS total
        FROM events GROUP BY 1
    )
    SELECT arg_max(hour_of_day, total) AS hour_of_day,
           floor((MAX(total)) * 100.0 + 0.5) / 100.0 AS total_value
    FROM hourly
    """,
)
def rdd_hourly_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13/A16 — busiest hour-of-day by total value.

    Replaces groupByKey+map(sum)+reduce(argmax) (RDDOperations.scala:82-117)
    with hash aggregate + max_by — one pass, no driver-side reduce.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = totals_by_key(events, F.hour("ts"), "value", "hour_of_day", "total")
    return argmax(hourly, "hour_of_day", "total").select(
        "hour_of_day", hround("total", 2).alias("total_value")
    )


@query(
    "rdd_categorize_orders",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 250000 THEN 'medium'
                WHEN o_totalprice < 400000 THEN 'high'
                ELSE 'very_high' END AS category,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1 ORDER BY n_orders DESC
    """,
)
def rdd_categorize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — when-chain bucketing + per-category counts
    (RDDOperations.scala:121-154's usage categorizer)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        category_counts(
            orders,
            "o_totalprice",
            [(100000.0, "low"), (250000.0, "medium"), (400000.0, "high")],
            "very_high",
        )
        .withColumnRenamed("count", "n_orders")
        .orderBy(F.desc("n_orders"))
    )
