"""General OLAP analytics: TPC-H Q1 shape, pivot, cube, set operations.

Extensions beyond the reference surface (it has no joins/set-ops/pivot —
SURVEY §2.7), establishing the engine as a general analytics layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.loaders import load_table
from ..functions.rounding import dround, hround
from .registry import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           floor((SUM(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
           floor((SUM(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
           floor((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0 AS sum_charge,
           floor((AVG(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
           floor((AVG(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
           floor((AVG(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical scan→filter→agg benchmark.

    Predicate pushes to the parquet scan; 8 aggregates compute in one
    partial+final hash-aggregate pass over ~6 groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            hround(F.sum("l_quantity"), 2).alias("sum_qty"),
            hround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            hround(F.sum(disc_price), 2).alias("sum_disc_price"),
            hround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            hround(F.avg("l_quantity"), 4).alias("avg_qty"),
            hround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            hround(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "pivot_event_type_by_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           COUNT(*) AS total
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def pivot_event_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: day × event_type count matrix.

    The pivot values are pinned explicitly — with an unpinned pivot Spark
    runs an extra distinct job to discover them (and the column set
    becomes data-dependent, which would break schema stability).
    """
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    pivoted = (
        events.groupBy(day)
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )
    total = sum((F.col(c) for c in EVENT_TYPES[1:]), F.col(EVENT_TYPES[0]))
    return pivoted.withColumn("total", total.cast("long")).orderBy("day")


@query(
    "cube_lineitem_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           floor((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def cube_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup over (returnflag, linestatus) — all 2^2 grouping sets in
    one pass via Expand. Grouped-out keys surfaced as 'ALL' so the result
    is null-free and hash-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(hround(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "set_ops_customer_segments",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM building UNION SELECT * FROM rich)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
    ORDER BY op
    """,
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (union/intersect/except) between two customer
    cohorts — absent from the reference (SURVEY §2.7), table stakes for an
    engine. Each op is a hash-based set operation, not a sort."""
    customer = load_table(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        one("union", building.union(rich).distinct())
        .union(one("intersect", building.intersect(rich)))
        .union(one("except", building.exceptAll(rich).distinct()))
        .orderBy("op")
    )


@query(
    "unpivot_lineitem_measures",
    oracle=f"""
    WITH long AS (
        SELECT 'l_discount' AS measure, l_discount AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_quantity', l_quantity FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure,
           COUNT(*) AS n_values,
           {dround("SUM(value)", 2)} AS total,
           {dround("AVG(value)", 6)} AS mean
    FROM long
    GROUP BY measure
    ORDER BY measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape: unpivot four lineitem measures into
    (measure, value) rows, then profile each measure in one grouped pass.

    ``DataFrame.unpivot`` plans as an Expand (each input row emits 4
    output rows map-side) — no shuffle until the final per-measure
    aggregate, so the reshape itself is scan-local at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    measures = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    return (
        li.unpivot([], measures, "measure", "value")
        .groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            hround(F.sum("value"), 2).alias("total"),
            hround(F.avg("value"), 6).alias("mean"),
        )
        .orderBy("measure")
    )


@query(
    "binning_equal_frequency",
    oracle=f"""
    WITH ranked AS (
        SELECT o_totalprice,
               CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
        FROM orders
    )
    SELECT decile, COUNT(*) AS n_orders,
           {dround("MIN(o_totalprice)", 2)} AS lo,
           {dround("MAX(o_totalprice)", 2)} AS hi
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
)
def binning_equal_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization: decile bins of order value via
    NTILE, with per-bin boundaries — the quantile-binning feature
    transform (complement of the fixed-width histogram query).

    Tie-broken on the unique orderkey so bin assignment is deterministic
    across engines. NTILE needs a global order (single-partition window
    at scale) — this query is the exact small-data variant; the 100 TB
    twin is `binning_equal_frequency_approx` below (quantile cut points,
    no global sort anywhere in the plan).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            hround(F.min("o_totalprice"), 2).alias("lo"),
            hround(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "binning_equal_frequency_approx",
    oracle=f"""
    WITH cuts AS (
        SELECT quantile_cont(o_totalprice,
            [CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE), CAST(0.3 AS DOUBLE),
             CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.6 AS DOUBLE),
             CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS cs
        FROM orders
    ), binned AS (
        SELECT o_totalprice,
               CAST(1 + len(list_filter(cs, c -> o_totalprice > c)) AS BIGINT) AS decile
        FROM orders, cuts
    )
    SELECT decile, COUNT(*) AS n_orders,
           {dround("MIN(o_totalprice)", 2)} AS lo,
           {dround("MAX(o_totalprice)", 2)} AS hi
    FROM binned
    GROUP BY decile
    ORDER BY decile
    """,
)
def binning_equal_frequency_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency deciles the 100 TB way: 9 interpolated quantile
    cut points (one aggregate — F.percentile ≡ DuckDB quantile_cont, the
    clean_outlier_iqr parity trick), broadcast back, decile = 1 + number
    of cut points strictly below the value.

    No NTILE, no global sort: the plan is agg → broadcast → map-side bin
    assignment → grouped agg. Bin populations can deviate from exact
    NTILE only where duplicate values straddle a boundary (ties all land
    in the lower bin on both engines, so parity is exact). The
    production path swaps F.percentile for approxQuantile when the
    Greenwald-Khanna error bound is acceptable.
    """
    orders = load_table(spark, sf_dir, "orders")
    probs = [i / 10.0 for i in range(1, 10)]
    cuts = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(p) for p in probs])).alias("cs")
    )
    binned = orders.crossJoin(F.broadcast(cuts)).select(
        "o_totalprice",
        (
            F.lit(1)
            + F.size(F.filter("cs", lambda c: F.col("o_totalprice") > c))
        ).cast("bigint").alias("decile"),
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            hround(F.min("o_totalprice"), 2).alias("lo"),
            hround(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "stats_correlation_matrix",
    oracle=f"""
    WITH a AS (
        SELECT corr(l_quantity, l_extendedprice) AS qty_price,
               corr(l_quantity, l_discount) AS qty_discount,
               corr(l_quantity, l_tax) AS qty_tax,
               corr(l_extendedprice, l_discount) AS price_discount,
               corr(l_extendedprice, l_tax) AS price_tax,
               corr(l_discount, l_tax) AS discount_tax
        FROM lineitem
    )
    SELECT pair, {dround('r', 6)} AS r FROM (
        SELECT 'qty_price' AS pair, qty_price AS r FROM a
        UNION ALL SELECT 'qty_discount', qty_discount FROM a
        UNION ALL SELECT 'qty_tax', qty_tax FROM a
        UNION ALL SELECT 'price_discount', price_discount FROM a
        UNION ALL SELECT 'price_tax', price_tax FROM a
        UNION ALL SELECT 'discount_tax', discount_tax FROM a
    )
    ORDER BY pair
    """,
)
def stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the four lineitem measures,
    unpivoted to (pair, r) rows — feature-screening before model
    training (extends stats_moments_lineitem to cross-moments).

    Scale shape: all six correlations are co-moment accumulators in ONE
    partial+final aggregate — one scan, one 1-row shuffle, regardless
    of how many pairs are added.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agged = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("qty_price"),
        F.corr("l_quantity", "l_discount").alias("qty_discount"),
        F.corr("l_quantity", "l_tax").alias("qty_tax"),
        F.corr("l_extendedprice", "l_discount").alias("price_discount"),
        F.corr("l_extendedprice", "l_tax").alias("price_tax"),
        F.corr("l_discount", "l_tax").alias("discount_tax"),
    )
    pairs = [
        "qty_price",
        "qty_discount",
        "qty_tax",
        "price_discount",
        "price_tax",
        "discount_tax",
    ]
    stack_args = ", ".join(f"'{p}', {p}" for p in pairs)
    return (
        agged.selectExpr(f"stack({len(pairs)}, {stack_args}) AS (pair, r_raw)")
        .select("pair", hround(F.col("r_raw"), 6).alias("r"))
        .orderBy("pair")
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, COUNT(*) AS support
    FROM pairs GROUP BY part_a, part_b HAVING COUNT(*) >= 3
    ORDER BY part_a, part_b
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (market-basket support ≥ 3):
    the first iteration of Apriori/FP-growth candidate generation,
    expressed as a blocked self-join.

    Scale shape: pair generation is keyed on l_orderkey, so each task
    enumerates only its order's |items|² pairs (baskets are small);
    the support count is a partial+final aggregate on the pair key.
    Never all-pairs across the catalog — the same blocking argument as
    sim_fuzzy_name_pairs.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
        .orderBy("part_a", "part_b")
    )


@query(
    "rfm_segmentation",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate),
                         (SELECT MAX(o_orderdate) FROM orders)) AS recency,
               COUNT(*) AS frequency,
               {dround('SUM(o_totalprice)', 2)} AS monetary
        FROM orders GROUP BY o_custkey
    ), cuts AS (
        SELECT quantile_cont(recency, 0.5) AS r_med,
               quantile_cont(frequency, 0.5) AS f_med,
               quantile_cont(monetary, 0.5) AS m_med
        FROM cust
    )
    SELECT (CASE WHEN c.recency <= k.r_med THEN 'R+' ELSE 'R-' END ||
            CASE WHEN c.frequency > k.f_med THEN 'F+' ELSE 'F-' END ||
            CASE WHEN c.monetary > k.m_med THEN 'M+' ELSE 'M-' END) AS segment,
           COUNT(*) AS n_customers,
           {dround('avg(c.monetary)', 2)} AS avg_monetary
    FROM cust c CROSS JOIN cuts k
    GROUP BY segment
    ORDER BY segment
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary per
    customer, split at the population median of each metric into 8
    segments — the standard CRM rollup.

    Scale shape: one grouped aggregate builds the per-customer metric
    table; the three medians are ONE exact-percentile aggregate
    broadcast back (a 3-double row); scoring is a map-side CASE chain.
    Per-customer monetary is rounded to cents on both engines BEFORE
    the median/cutoff comparison so partial-sum order can't flip a
    boundary customer.
    """
    orders = load_table(spark, sf_dir, "orders")
    maxdate = orders.agg(F.max("o_orderdate").alias("global_max"))
    cust = (
        orders.crossJoin(F.broadcast(maxdate))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("global_max"), F.max("o_orderdate")).alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            hround(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    cuts = cust.agg(
        F.percentile("recency", F.lit(0.5)).alias("r_med"),
        F.percentile("frequency", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary", F.lit(0.5)).alias("m_med"),
    )
    seg = F.concat(
        F.when(F.col("recency") <= F.col("r_med"), F.lit("R+")).otherwise(F.lit("R-")),
        F.when(F.col("frequency") > F.col("f_med"), F.lit("F+")).otherwise(F.lit("F-")),
        F.when(F.col("monetary") > F.col("m_med"), F.lit("M+")).otherwise(F.lit("M-")),
    )
    return (
        cust.crossJoin(F.broadcast(cuts))
        .select(seg.alias("segment"), "monetary")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            hround(F.avg("monetary"), 2).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


@query(
    "seasonality_profile_events",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(dayofweek(CAST(ts AS DATE)) AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hod,
               AVG(value) AS cell_avg,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ), g AS (
        SELECT SUM(cell_avg * n) / SUM(n) AS grand
        FROM cells
    )
    SELECT dow, hod,
           {dround('cell_avg', 4)} AS cell_avg,
           n AS n_events,
           {dround('cell_avg - g.grand', 4)} AS seasonal_delta
    FROM cells CROSS JOIN g
    ORDER BY dow, hod
    """,
)
def seasonality_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality decomposition grid: mean value per (day-of-week,
    hour-of-day) cell and its delta from the (cell-weighted) grand mean
    — the 7×24 heatmap behind capacity planning and anomaly baselines
    ('is Tuesday 3am normally this quiet?').

    One groupBy on a ≤168-cell key (map-side partial agg does almost
    all the work), grand mean recomputed FROM THE CELLS (weighted) so
    the oracle needs no second raw scan, broadcast back to 168 rows.
    DuckDB dayofweek is 0-6 Sunday-first; Spark's dayofweek is 1-7 —
    aligned via (dayofweek - 1).
    """
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        (F.dayofweek(F.to_date("ts")) - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.avg("value").alias("cell_avg"),
        F.count(F.lit(1)).alias("n"),
    )
    g = cells.agg(
        (F.sum(F.col("cell_avg") * F.col("n")) / F.sum("n")).alias("grand")
    )
    return (
        cells.crossJoin(F.broadcast(g))
        .select(
            "dow", "hod",
            hround("cell_avg", 4).alias("cell_avg"),
            F.col("n").alias("n_events"),
            hround(F.col("cell_avg") - F.col("grand"), 4).alias("seasonal_delta"),
        )
        .orderBy("dow", "hod")
    )


@query(
    "pareto_customer_revenue",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey, {dround('SUM(o_totalprice)', 2)} AS revenue
        FROM orders GROUP BY o_custkey
    ), cuts AS (
        SELECT quantile_cont(revenue, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
        FROM per_cust
    ), bucketed AS (
        SELECT CAST(10 - (CASE WHEN p.revenue > c[1] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[2] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[3] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[4] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[5] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[6] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[7] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[8] THEN 1 ELSE 0 END
                        + CASE WHEN p.revenue > c[9] THEN 1 ELSE 0 END) AS INT) AS decile,
               p.revenue
        FROM per_cust p CROSS JOIN cuts
    ), per_decile AS (
        SELECT decile, COUNT(*) AS n_customers, SUM(revenue) AS rev
        FROM bucketed GROUP BY decile
    )
    SELECT decile, n_customers,
           {dround("SUM(rev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) / SUM(rev) OVER ()", 6)} AS cum_revenue_share
    FROM per_decile
    ORDER BY decile
    """,
)
def pareto_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / cumulative-share curve: customers ranked by revenue,
    cumulative revenue share at each decile of the customer base — the
    80/20 concentration audit behind account prioritization and
    whale-risk checks.

    Deciles come from percentile CUT POINTS on the per-customer
    aggregate (the `binning_equal_frequency_approx` pattern), NOT a
    global ROW_NUMBER — a rank window over |customers| rows is a
    single-partition funnel at 100 TB customer counts. The cuts are a
    broadcast 9-value array, bucketing is a map-side comparison, and
    the only window left runs over the ≤10 decile rows. Decile 1 = top
    customers; revenue rounded pre-bucketing so both engines compare
    identical doubles against identically-interpolated cuts.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        hround(F.sum("o_totalprice"), 2).alias("revenue")
    )
    cuts = per_cust.agg(
        F.percentile(
            "revenue",
            F.array(*[F.lit(q / 10.0) for q in range(1, 10)]),
        ).alias("c")
    )
    bucketed = per_cust.crossJoin(F.broadcast(cuts)).select(
        "revenue",
        (
            F.lit(10)
            - F.aggregate(
                F.transform("c", lambda cv: (F.col("revenue") > cv).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            )
        ).cast("int").alias("decile"),
    )
    per_decile = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("revenue").alias("rev"),
    )
    w10 = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    return (
        per_decile.select(
            "decile",
            "n_customers",
            hround(F.sum("rev").over(w10) / F.sum("rev").over(wall), 6).alias(
                "cum_revenue_share"
            ),
        )
        .orderBy("decile")
    )


@query(
    "segment_bitmap_membership",
    oracle="""
    WITH coded AS (
        SELECT user_id,
               CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                    WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                    WHEN 'view' THEN 4 ELSE 5 END AS type_idx
        FROM events
    ), masks AS (
        SELECT user_id,
               CAST(bit_or(1 << type_idx) AS BIGINT) AS type_mask
        FROM coded GROUP BY user_id
    )
    SELECT type_mask,
           CAST(bit_count(type_mask) AS INTEGER) AS n_types,
           COUNT(*) AS n_users
    FROM masks
    GROUP BY type_mask
    ORDER BY type_mask
    """,
)
def segment_bitmap_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap segment encoding: each user's event-type repertoire packs
    into one 64-bit mask (bit_or of 1<<type_idx), and segment analytics
    (how many users did {click, purchase} but never {error}?) become
    integer bit tests instead of set joins — the roaring-bitmap idea at
    engine level.

    The type->bit mapping is an explicit CASE, not a computed rank, so
    the encoding is stable across runs and engines (a rank would shift
    whenever a new type appears — catastrophic for stored masks).
    Shape: one user_id shuffle agg builds masks with map-side bit_or
    partials, then a tiny mask-distribution agg; both integer-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    type_idx = (
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "error", 1)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "view", 4)
        .otherwise(5)
    )
    masks = (
        ev.select("user_id", type_idx.alias("type_idx"))
        .select("user_id", F.expr("shiftleft(1, type_idx)").alias("bit"))
        .groupBy("user_id")
        .agg(F.bit_or("bit").cast("long").alias("type_mask"))
    )
    return (
        masks.groupBy("type_mask")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "type_mask",
            F.bit_count("type_mask").cast("int").alias("n_types"),
            "n_users",
        )
        .orderBy("type_mask")
    )


@query(
    "transpose_priority_metrics",
    oracle=f"""
    WITH m AS (
        SELECT o_orderpriority AS p,
               {dround('AVG(o_totalprice)', 2)} AS avg_price,
               {dround('CAST(COUNT(*) AS DOUBLE)', 2)} AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT 'avg_price' AS key,
           (SELECT avg_price FROM m WHERE p = '1-URGENT') AS "1-URGENT",
           (SELECT avg_price FROM m WHERE p = '2-HIGH') AS "2-HIGH",
           (SELECT avg_price FROM m WHERE p = '3-MEDIUM') AS "3-MEDIUM",
           (SELECT avg_price FROM m WHERE p = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
           (SELECT avg_price FROM m WHERE p = '5-LOW') AS "5-LOW"
    UNION ALL
    SELECT 'n_orders',
           (SELECT n_orders FROM m WHERE p = '1-URGENT'),
           (SELECT n_orders FROM m WHERE p = '2-HIGH'),
           (SELECT n_orders FROM m WHERE p = '3-MEDIUM'),
           (SELECT n_orders FROM m WHERE p = '4-NOT SPECIFIED'),
           (SELECT n_orders FROM m WHERE p = '5-LOW')
    ORDER BY key
    """,
)
def transpose_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's native `DataFrame.transpose()` — metrics-as-rows,
    groups-as-columns, the report layout every BI handoff asks for and
    the inverse companion of `pivot_event_type_by_day` (pivot widens a
    VALUE column by a key; transpose flips the whole frame around its
    first column). The priority dimension is bounded (5 values, the
    fixture's enum), which is the only regime where transpose is sane —
    column count equals source ROW count, so it is a small-aggregate
    presentation op, never a data-path one.

    Shape: one 5-group aggregate, then transpose collects that 5-row
    frame to the driver to become the schema (inherent to the API — the
    output schema depends on data); the driver-side cost is O(groups).
    All transposed cells share one type (double — counts cast to match;
    transpose requires a least-common type across metric columns).
    """
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(F.col("o_orderpriority").alias("p"))
        .agg(
            hround(F.avg("o_totalprice"), 2).alias("avg_price"),
            hround(F.count(F.lit(1)).cast("double"), 2).alias("n_orders"),
        )
        .orderBy("p")
    )
    return m.transpose().orderBy("key")
