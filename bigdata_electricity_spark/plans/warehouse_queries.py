"""Warehouse-maintenance queries: MERGE/upsert, SCD Type-2 history,
key-skew diagnosis, and event-transition profiling.

The table-maintenance half of a lakehouse deployment. MERGE here is the
copy-on-write shape (one full-outer join on the key, CASE per row) —
the portable core of what table formats run under `MERGE INTO`; SCD2 is
the classic gaps-and-islands window build; the skew diagnosis is the
profiling pass an operator runs BEFORE picking salt factors for the
mechanics in `operators/skew.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.rounding import dround, hround
from ..sources.loaders import load_table
from ..sources.sinks import run_dir
from .registry import query

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "merge_upsert_orders",
    oracle=f"""
    WITH base AS (
        SELECT * FROM orders WHERE o_orderkey % 3 <> 0
    ), changes AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 1.1 AS new_price,
               CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.o_orderkey IS NULL THEN 'kept'
                WHEN b.o_orderkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS action,
           {dround("CASE WHEN c.o_orderkey IS NULL THEN b.o_totalprice ELSE c.new_price END", 4)} AS price
    FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
    -- drop matched deletes (removes the base row) AND unmatched
    -- deletes (no-op); base-only rows have op NULL -> kept
    WHERE c.op IS NULL OR c.op <> 'D'
    ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE: apply a change batch (updates, inserts,
    deletes) to a base snapshot in ONE full-outer join on the key +
    one CASE per row — the portable core of `MERGE INTO`. The change
    batch is derived deterministically from orders itself (keys %2 as
    the batch, %10 as deletes), arranged so all four MERGE classes
    occur: matched-update, matched-delete, not-matched-insert, and
    delete-of-absent-key (a no-op).

    At 100 TB: the join shuffles on the primary key; with the base
    maintained bucketed on that key (`write_bucketed_table`) the
    base side never re-shuffles and each merge is one pass over the
    changed buckets. Deletes of absent keys are no-ops, matching MERGE
    semantics.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    changes = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("c_orderkey"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("new_price"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    merged = base.join(
        changes, base.o_orderkey == changes.c_orderkey, "full_outer"
    )
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("o_orderkey", "c_orderkey").alias("o_orderkey"),
            F.when(F.col("c_orderkey").isNull(), "kept")
            .when(F.col("o_orderkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("action"),
            hround(
                F.when(F.col("c_orderkey").isNull(), F.col("o_totalprice"))
                .otherwise(F.col("new_price")),
                4,
            ).alias("price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scd2_event_intervals",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS new_run
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT user_id, event_type, ts,
               SUM(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_id
        FROM flagged
    ), grouped AS (
        SELECT user_id, CAST(run_id AS INT) AS run_id,
               MIN(event_type) AS state,
               MIN(ts) AS valid_from_ts,
               COUNT(*) AS n_events
        FROM runs
        GROUP BY user_id, run_id
    )
    SELECT user_id, run_id, state,
           strftime(CAST(valid_from_ts AS TIMESTAMP), '{_TS_FMT_DUCK}') AS valid_from,
           COALESCE(strftime(CAST(LEAD(valid_from_ts) OVER (PARTITION BY user_id ORDER BY run_id)
                                  AS TIMESTAMP), '{_TS_FMT_DUCK}'), 'current') AS valid_to,
           n_events
    FROM grouped
    ORDER BY user_id, run_id
    """,
)
def scd2_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: collapse each user's event stream into
    validity intervals of consecutive same-state runs (gaps-and-islands
    via lag≠state flag + running sum), then chain valid_to to the next
    run's valid_from ('current' for the open interval) — the standard
    dimension-history construction for slowly changing attributes.

    Every window partitions by user_id (the entity key) — no global
    order anywhere, so the build scales with the key cardinality.
    Run detection uses full-precision timestamps; only the OUTPUT is
    second-formatted (registry rendering rule).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("new_run"),
    )
    runs = flagged.select(
        "user_id", "event_type", "ts",
        F.sum("new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    grouped = runs.groupBy("user_id", F.col("run_id").cast("int").alias("run_id")).agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    return (
        grouped.select(
            "user_id", "run_id", "state",
            F.date_format("valid_from_ts", _TS_FMT_SPARK).alias("valid_from"),
            F.coalesce(
                F.date_format(F.lead("valid_from_ts").over(wr), _TS_FMT_SPARK),
                F.lit("current"),
            ).alias("valid_to"),
            "n_events",
        )
        .orderBy("user_id", "run_id")
    )


@query(
    "diagnose_key_skew",
    oracle=f"""
    WITH per_key AS (
        SELECT o_custkey, COUNT(*) AS n
        FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS n_keys,
           CAST(MIN(n) AS BIGINT) AS min_n,
           CAST(MAX(n) AS BIGINT) AS max_n,
           {dround('quantile_cont(n, 0.5)', 4)} AS p50,
           {dround('quantile_cont(n, 0.9)', 4)} AS p90,
           {dround('quantile_cont(n, 0.99)', 4)} AS p99,
           {dround('AVG(n)', 4)} AS mean_n,
           {dround('CAST(MAX(n) AS DOUBLE) / AVG(n)', 4)} AS skew_ratio
    FROM per_key
    """,
)
def diagnose_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis over orders.o_custkey: the per-key count
    distribution (min/median/p90/p99/max, and max/mean skew ratio) an
    operator reads BEFORE sizing salt factors (`operators/skew.py`) or
    trusting AQE's skew-join split at 100 TB.

    Two grouped aggregations: keys (one shuffle on the key — the same
    shuffle the diagnosed join would do) then a single global summary
    row of the count distribution. percentile() interpolates exactly
    like DuckDB's quantile_cont (the clean_outlier_mad pattern).
    """
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
        hround(F.percentile("n", F.lit(0.5)), 4).alias("p50"),
        hround(F.percentile("n", F.lit(0.9)), 4).alias("p90"),
        hround(F.percentile("n", F.lit(0.99)), 4).alias("p99"),
        hround(F.avg("n"), 4).alias("mean_n"),
        hround(F.max("n").cast("double") / F.avg("n"), 4).alias("skew_ratio"),
    )


@query(
    "events_transition_matrix",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n,
           {dround("CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY prev_type)", 6)} AS p
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    counts and row-normalized probabilities of (prev→next) event-type
    bigrams — the behavioral fingerprint behind next-event prediction
    and anomalous-flow detection.

    Lag partitions by user (entity-keyed, scalable); the matrix itself
    is |types|² rows, so the final normalization window runs on a
    25-row frame — negligible at any scale.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return (
        counts.select(
            "prev_type", "next_type", "n",
            hround(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS col_name, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
    UNION ALL SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey) FROM orders
    UNION ALL SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus) FROM orders
    UNION ALL SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice) FROM orders
    UNION ALL SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate) FROM orders
    UNION ALL SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority) FROM orders
    ORDER BY col_name
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column profile (null count + exact NDV) in ONE
    aggregate pass — the stats collection a cost-based planner or a
    data-quality dashboard runs per table. All 12 aggregates batch into
    a single scan + single (partial→final) aggregation; the 1-row
    result is unpivoted driver-free with ``stack`` into (col, stats)
    rows.

    Min/max are deliberately NOT stringified: double→string rendering
    (scientific-notation thresholds) diverges across engines, the
    exact blind spot the schema lint exists for. At 100 TB swap the
    exact NDVs for approx_count_distinct / HLL sketches
    (`sketch_approx_stats`); the plan shape is identical.
    """
    orders = load_table(spark, sf_dir, "orders")
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    aggs = []
    for c in cols:
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(c).alias(f"{c}__ndv"))
    one = orders.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv" for c in cols
    )
    return (
        one.select(
            F.expr(
                f"stack({len(cols)}, {stack_expr}) AS (col_name, n_nulls, n_distinct)"
            )
        )
        .orderBy("col_name")
    )


@query(
    "growth_weekly_revenue",
    oracle=f"""
    WITH weekly AS (
        SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS week_start,
               {dround('SUM(o_totalprice)', 2)} AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY 1
    )
    SELECT CAST(week_start AS DATE) AS week_start,
           revenue,
           n_orders,
           {dround("COALESCE((revenue - LAG(revenue) OVER (ORDER BY week_start)) / LAG(revenue) OVER (ORDER BY week_start), 0.0)", 6)} AS wow_growth
    FROM weekly
    ORDER BY week_start
    """,
)
def growth_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: weekly rollup then lag-based
    percent change (first week anchored at 0) — the period-over-period
    primitive of every BI dashboard.

    The lag window is a GLOBAL order, but over the AGGREGATED weekly
    series — |weeks| rows regardless of raw scale, so the
    single-partition window is bounded and correct at 100 TB (the same
    argument as `events_transition_matrix`'s 25-row normalization;
    never do this on the raw table). Revenue is rounded pre-growth so
    both engines difference identical doubles.
    """
    orders = load_table(spark, sf_dir, "orders")
    weekly = (
        orders.groupBy(
            F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start")
        )
        .agg(
            hround(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("week_start")
    return (
        weekly.select(
            "week_start", "revenue", "n_orders",
            hround(
                F.coalesce(
                    (F.col("revenue") - F.lag("revenue").over(w))
                    / F.lag("revenue").over(w),
                    F.lit(0.0),
                ),
                6,
            ).alias("wow_growth"),
        )
        .orderBy("week_start")
    )


@query(
    "maintain_compact_small_files",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           CAST(floor(SUM(value) * 100.0 + 0.5) AS BIGINT) AS total_cents,
           CAST(ceil(COUNT(*) / 4000.0) AS BIGINT) AS planned_files
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def maintain_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (the lakehouse OPTIMIZE primitive): rewrite
    a fragmented date-partitioned table into size-targeted files, then
    audit the compacted table from a fresh read-back.

    Streaming ingest leaves every partition littered with one file per
    micro-batch-task; at 100 TB that is millions of sub-MB files and
    the scan dies on open() overhead, not bytes. The rewrite here is
    the scalable shape: per-partition file counts are PLANNED from row
    counts (ceil(rows / target)), rows are routed to
    (day, hash(event_id) % planned) groups via one shuffle keyed by
    exactly those columns, and each partition directory comes out with
    ~planned files regardless of how fragmented it went in. Content
    equality and the actual file-count drop are asserted from read-back
    in tests; this query returns the per-day audit (counts + checksums
    + planned file count), which the oracle recomputes from the source
    table — compaction must be a pure layout change.

    Partition-AWARE sibling of `sources/sinks.py:compact_parquet` (flat
    directory, byte-targeted, round-robin): here file counts are
    planned per partition directory and rows never cross partitions.
    """
    import glob

    from ..sources.sinks import write_parquet

    target_rows = 4000
    base = run_dir("events_compaction", sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))

    # Fragmented ingest state: every one of 16 writer tasks holds rows of
    # every day, so each day directory gets ~16 small files.
    write_parquet(ev.repartition(16, "event_id"), f"{base}/fragmented",
                  partition_by=["day"])

    frag = spark.read.parquet(f"{base}/fragmented")
    plan = frag.groupBy("day").agg(
        F.ceil(F.count(F.lit(1)) / float(target_rows)).alias("__n_files")
    )
    routed = (
        frag.join(F.broadcast(plan), "day")
        .withColumn("__fg", F.pmod(F.xxhash64("event_id"), F.col("__n_files")))
        .repartition("day", "__fg")
        .drop("__n_files", "__fg")
    )
    write_parquet(routed, f"{base}/compacted", partition_by=["day"])

    n_frag = len(glob.glob(f"{base}/fragmented/day=*/*.parquet"))
    n_comp = len(glob.glob(f"{base}/compacted/day=*/*.parquet"))
    assert n_comp < n_frag, f"compaction grew files: {n_comp} >= {n_frag}"

    back = spark.read.parquet(f"{base}/compacted")
    return (
        back.groupBy(F.col("day").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").alias("id_sum"),
            F.floor(F.sum("value") * 100.0 + F.lit(0.5)).cast("long").alias("total_cents"),
            F.ceil(F.count(F.lit(1)) / float(target_rows)).alias("planned_files"),
        )
        .orderBy("day")
    )


@query(
    "maintain_incremental_agg",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           {dround("SUM(o_totalprice)", 2)} AS total_revenue,
           {dround("MIN(o_totalprice)", 2)} AS min_price,
           {dround("MAX(o_totalprice)", 2)} AS max_price,
           {dround("SUM(o_totalprice) / COUNT(*)", 4)} AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def maintain_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a materialized per-priority
    stats table is kept current by MERGING partial aggregation states
    (count/sum/min/max are all commutative monoids) from a new batch —
    never by rescanning history.

    The entry simulates the lakehouse loop: the 'snapshot' state is the
    partial agg of orders before 1997-07-01, the 'batch' is everything
    after; the two state tables union and fold with sum-of-sums /
    min-of-mins. The oracle aggregates the WHOLE table directly, so the
    driver's hash check proves merge(partial, partial) == recompute(all)
    — the algebraic property that makes incremental view maintenance
    safe at 100 TB (derived avg is re-derived from merged sum/count,
    never averaged across states). Both phases are partial+final
    shuffle aggs on the same key; the union folds |keys|-sized state,
    not row-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-07-01").cast("timestamp")

    def partial_state(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_revenue"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )

    snapshot = partial_state(orders.filter(F.col("o_orderdate") < cutoff))
    batch = partial_state(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        snapshot.unionByName(batch)
        .groupBy("priority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_revenue").alias("sum_rev"),
            F.min("min_price").alias("min_p"),
            F.max("max_price").alias("max_p"),
        )
        .select(
            "priority",
            "n_orders",
            hround("sum_rev", 2).alias("total_revenue"),
            hround("min_p", 2).alias("min_price"),
            hround("max_p", 2).alias("max_price"),
            hround(F.col("sum_rev") / F.col("n_orders"), 4).alias("avg_price"),
        )
        .orderBy("priority")
    )


@query(
    "maintain_cascade_delete",
    oracle="""
    WITH tombstones AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ), doomed_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM tombstones)
    )
    SELECT 'customer' AS tbl,
           (SELECT COUNT(*) FROM tombstones) AS rows_deleted,
           (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM tombstones) AS rows_kept
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM doomed_orders),
           (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM doomed_orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM doomed_orders))
    ORDER BY tbl
    """,
)
def maintain_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade: deletion requests against the customer
    table propagate through the foreign-key chain (customer -> orders ->
    lineitem), and the op certifies the blast radius per table BEFORE
    any rewrite happens — the audit step of a GDPR/CCPA delete job.

    Tombstones (c_custkey % 97 = 0 stands in for the request list) stay
    small relative to the facts but are O(SF), so they carry no forced
    broadcast hint — stats/AQE broadcast the key sets while they fit;
    each fact table splits with ONE left-semi / left-anti join pair
    against the key set, and the doomed-orders key set — itself output
    of a semi join — joins into lineitem the same way. Counts are single-pass aggregates;
    the actual rewrite at 100 TB is this same plan with the anti-join
    side written back (the merge_upsert_orders copy-on-write pattern).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    tombstones = customer.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    doomed_orders = orders.join(
        tombstones, orders.o_custkey == tombstones.c_custkey, "left_semi"
    ).select("o_orderkey")

    def split_counts(tbl: str, df: DataFrame, key, doomed: DataFrame, dkey) -> DataFrame:
        hit = df.join(doomed, key == dkey, "left_semi").agg(
            F.count(F.lit(1)).alias("rows_deleted")
        )
        miss = df.join(doomed, key == dkey, "left_anti").agg(
            F.count(F.lit(1)).alias("rows_kept")
        )
        return hit.crossJoin(miss).select(
            F.lit(tbl).alias("tbl"), "rows_deleted", "rows_kept"
        )

    out_c = split_counts("customer", customer, F.col("c_custkey"), tombstones.select(F.col("c_custkey").alias("tk")), F.col("tk"))
    out_o = split_counts("orders", orders, F.col("o_custkey"), tombstones.select(F.col("c_custkey").alias("tk")), F.col("tk"))
    out_l = split_counts("lineitem", li, F.col("l_orderkey"), doomed_orders.select(F.col("o_orderkey").alias("dk")), F.col("dk"))
    return out_c.unionByName(out_o).unionByName(out_l).orderBy("tbl")


# Canonical row rendering for content digests: integers, exact cents,
# and formatted dates ONLY — a raw double would render differently
# across engines and poison the hash.
_DIGEST_ROW_SQL = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' || "
    "o_orderstatus || '|' || o_orderpriority || '|' || "
    "CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR) || '|' || "
    "strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')"
)
_DIGEST_HASH_SQL = f"CAST(('0x' || substr(md5({_DIGEST_ROW_SQL}), 1, 15)) AS BIGINT)"


def _digest_row_spark() -> F.Column:
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        cents.cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )


def _digest_hash_spark() -> F.Column:
    return F.conv(F.substring(F.md5(_digest_row_spark()), 1, 15), 16, 10).cast("long")


@query(
    "audit_table_digest",
    oracle=f"""
    SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INTEGER) AS order_year,
           COUNT(*) AS n_rows,
           bit_xor({_DIGEST_HASH_SQL}) AS digest
    FROM orders
    GROUP BY 1
    ORDER BY order_year
    """,
)
def audit_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content digest per year partition: every row
    renders to a canonical string (ints, exact cents, formatted dates —
    never raw doubles), md5-hashes to a 60-bit long, and the partition
    digest is the XOR-fold. XOR is commutative+associative, so the
    digest is invariant to row order and partitioning — two replicas
    agree iff their digests agree (modulo a 2^-60 collision), which is
    what makes cross-cluster anti-entropy a metadata-sized exchange
    instead of a data copy.

    Shape: map-side bit_xor partials, one |years|-key shuffle; the
    driver's hash check against DuckDB's independently-computed XOR is
    itself the cross-engine integrity proof.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            _digest_hash_spark().alias("h"),
        )
        .groupBy("order_year")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.bit_xor("h").alias("digest"))
        .orderBy("order_year")
    )


@query(
    "audit_replica_diff",
    oracle=f"""
    WITH primary_d AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
               bit_xor({_DIGEST_HASH_SQL}) AS digest
        FROM orders GROUP BY 1
    ), replica AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               CASE WHEN o_orderkey % 10007 = 0
                    THEN o_totalprice + 0.07 ELSE o_totalprice END AS o_totalprice,
               o_orderdate
        FROM orders
    ), replica_d AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
               bit_xor({_DIGEST_HASH_SQL}) AS digest
        FROM replica GROUP BY 1
    )
    SELECT p.day AS day, p.n AS n_primary, r.n AS n_replica,
           CASE WHEN p.digest = r.digest THEN 0 ELSE 1 END AS corrupted
    FROM primary_d p
    JOIN replica_d r ON p.day = r.day
    WHERE p.digest <> r.digest
    ORDER BY day
    """,
)
def audit_replica_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy between two replicas of the orders table: per-day
    XOR digests are computed on each side and only days whose digests
    disagree are reported — the repair job then re-syncs just those
    partitions. The 'replica' plants a one-cent-class corruption on
    every o_orderkey % 10007 = 0 row, so the diff is non-empty by
    construction and the entry proves the digest actually catches a
    sub-cent single-column mutation.

    Both digest scans aggregate map-side to |days| rows; the reconcile
    join is broadcast-tiny. At 100 TB the exchange is two digest
    tables, never row data.
    """
    orders = load_table(spark, sf_dir, "orders")

    def day_digest(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.to_date("o_orderdate").alias("day"), _digest_hash_spark().alias("h")
            )
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("digest"))
        )

    replica = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10007 == 0, F.col("o_totalprice") + 0.07).otherwise(
            F.col("o_totalprice")
        ),
    )
    p, r = day_digest(orders).alias("p"), day_digest(replica).alias("r")
    return (
        p.join(F.broadcast(r), F.col("p.day") == F.col("r.day"))
        .filter(F.col("p.digest") != F.col("r.digest"))
        .select(
            F.col("p.day").alias("day"),
            F.col("p.n").alias("n_primary"),
            F.col("r.n").alias("n_replica"),
            F.when(F.col("p.digest") == F.col("r.digest"), F.lit(0))
            .otherwise(F.lit(1))
            .alias("corrupted"),
        )
        .orderBy("day")
    )


@query(
    "audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
    UNION ALL
    SELECT 'nation->region',
           (SELECT COUNT(*) FROM nation),
           (SELECT COUNT(*) FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
    ORDER BY fk_edge
    """,
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the star
    schema — the pre-flight every warehouse load runs: per edge, child
    row count and orphan count (children whose parent key doesn't
    exist). Orphans here are structural corruption; the oracle's
    NOT-EXISTS twin certifies the anti-join semantics including
    null-key behavior.

    Scale shape: each edge is ONE left-anti join on the parent key
    set; parent sides join unhinted (orders/customer parents are
    O(SF) — stats/AQE broadcast them while they fit), so the child
    scan streams once per edge. All-integer output.
    """
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "supplier", "nation", "region")
    }
    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    parts = []
    for name, child, ck, parent, pk in edges:
        c, p = tables[child], tables[parent]
        orphans = c.join(
            p.select(pk), c[ck] == F.col(pk), "left_anti"
        )
        parts.append(
            c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            ).select(F.lit(name).alias("fk_edge"), "n_child", "n_orphans")
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out.orderBy("fk_edge")


@query(
    "maintain_parallel_variance_merge",
    oracle=f"""
    WITH halves AS (
        SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END AS half,
               value
        FROM events
    ), parts AS (
        SELECT half,
               CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(value) AS mean,
               var_pop(value) * COUNT(*) AS m2
        FROM halves GROUP BY half
    ), merged AS (
        SELECT a.n + b.n AS n,
               (a.n * a.mean + b.n * b.mean) / (a.n + b.n) AS mean,
               a.m2 + b.m2 + (b.mean - a.mean) * (b.mean - a.mean)
                   * a.n * b.n / (a.n + b.n) AS m2
        FROM (SELECT * FROM parts WHERE half = 0) a,
             (SELECT * FROM parts WHERE half = 1) b
    ), direct AS (
        SELECT var_pop(value) AS v FROM halves
    )
    SELECT CAST(merged.n AS BIGINT) AS n_rows,
           {dround('merged.mean', 6)} AS mean,
           {dround('merged.m2 / merged.n', 2)} AS var_merged,
           abs(merged.m2 / merged.n - direct.v) < CAST(0.000001 AS DOUBLE) AS merge_matches_direct
    FROM merged, direct
    """,
)
def maintain_parallel_variance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chan-formula variance merging — the algebra that makes variance a
    MERGEABLE aggregate (the reason var_pop survives partial
    aggregation and shard-parallel pipelines at all): compute (n, mean,
    M2) independently per half-month shard, merge with
    M2 = M2ₐ + M2ᵦ + (μᵦ−μₐ)²·nₐnᵦ/(nₐ+nᵦ), and certify the merged
    variance equals the direct single-pass var_pop to 1e-6 (flag
    computed identically on both engines). The explicit form of what
    `maintain_incremental_agg` exercises through Spark's own partial
    aggregation.

    Scale shape: per-shard states are 3 doubles; merging is O(#shards)
    arithmetic — this is how per-day profile stats fold into monthly
    ones without rescanning history.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.to_date("ts") < F.lit("2024-01-16").cast("date"), 0)
        .otherwise(1)
        .alias("half"),
        "value",
    )
    parts = ev.groupBy("half").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("mean"),
        (F.var_pop("value") * F.count(F.lit(1))).alias("m2"),
    )
    a = parts.filter(F.col("half") == 0).select(
        F.col("n").alias("na"), F.col("mean").alias("ma"), F.col("m2").alias("m2a")
    )
    b = parts.filter(F.col("half") == 1).select(
        F.col("n").alias("nb"), F.col("mean").alias("mb"), F.col("m2").alias("m2b")
    )
    direct = ev.agg(F.var_pop("value").alias("v"))
    merged = (
        a.crossJoin(b)
        .crossJoin(F.broadcast(direct))
        .select(
            (F.col("na") + F.col("nb")).cast("long").alias("n_rows"),
            hround(
                (F.col("na") * F.col("ma") + F.col("nb") * F.col("mb"))
                / (F.col("na") + F.col("nb")),
                6,
            ).alias("mean"),
            hround(
                (
                    F.col("m2a")
                    + F.col("m2b")
                    + (F.col("mb") - F.col("ma")) * (F.col("mb") - F.col("ma"))
                    * F.col("na") * F.col("nb") / (F.col("na") + F.col("nb"))
                )
                / (F.col("na") + F.col("nb")),
                2,
            ).alias("var_merged"),
            (
                F.abs(
                    (
                        F.col("m2a")
                        + F.col("m2b")
                        + (F.col("mb") - F.col("ma")) * (F.col("mb") - F.col("ma"))
                        * F.col("na") * F.col("nb") / (F.col("na") + F.col("nb"))
                    )
                    / (F.col("na") + F.col("nb"))
                    - F.col("v")
                )
                < F.lit(1e-6)
            ).alias("merge_matches_direct"),
        )
    )
    return merged


@query(
    "warehouse_backlog_aging",
    oracle="""
    WITH snap AS (
        SELECT MAX(CAST(o_orderdate AS DATE)) AS today FROM orders
    ), open_orders AS (
        SELECT o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE), snap.today) AS age,
               o_totalprice
        FROM orders, snap WHERE o_orderstatus = 'O'
    )
    SELECT o_orderpriority,
           CASE WHEN age <= 30 THEN '0-030d' WHEN age <= 90 THEN '031-090d'
                WHEN age <= 365 THEN '091-365d' ELSE '366d+' END AS age_bucket,
           COUNT(*) AS n_orders,
           floor((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 AS backlog_value
    FROM open_orders
    GROUP BY 1, 2 ORDER BY o_orderpriority, age_bucket
    """,
)
def warehouse_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: orders still open ('O') bucketed by
    age at the latest order date, per priority, with counts and value
    at risk — the ops dashboard behind every fulfilment SLA review.

    Snapshot date is a 1-row broadcast aggregate; the rest is one
    filtered scan + one partial-aggregatable groupBy. Bucket labels
    are chosen to sort lexicographically = chronologically so the
    ordering needs no CASE re-mapping.
    """
    orders = load_table(spark, sf_dir, "orders")
    snap = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("today"))
    age = F.datediff(F.col("today"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(age <= 30, "0-030d")
        .when(age <= 90, "031-090d")
        .when(age <= 365, "091-365d")
        .otherwise("366d+")
    )
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            hround(F.sum("o_totalprice"), 2).alias("backlog_value"),
        )
        .orderBy("o_orderpriority", "age_bucket")
    )


@query(
    "maintain_incremental_join",
    oracle="""
    SELECT o.o_custkey AS custkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_custkey
    ORDER BY custkey
    """,
)
def maintain_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view, certified by the driver
    hash: split both base tables at a date watershed into (old, delta),
    maintain the revenue-by-customer join view with the delta-join
    identity  dV = dO |><| L_old  U  O_old |><| dL  U  dO |><| dL,
    merge with the old view's partial aggregates, and the result must
    equal the monolithic recomputation (the oracle) bit-for-bit.

    The IVM algebra the aggregate (`maintain_incremental_agg`) and
    statistics (`maintain_parallel_variance_merge`) entries make
    explicit, now for joins: at 100 TB you never re-join seven years of
    fact data for one day's load — you join the day's deltas against
    the other side (plus delta x delta) and fold partial (count, sum)
    states. Sums are folded as exact cents only at the final merge, so
    partial-aggregation order can't flip the hash.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = "1997-01-01"
    o_old = orders.filter(F.col("o_orderdate") < F.lit(cut).cast("timestamp_ntz"))
    o_new = orders.filter(F.col("o_orderdate") >= F.lit(cut).cast("timestamp_ntz"))
    l_old = li.filter(F.col("l_shipdate") < F.lit(cut).cast("timestamp_ntz"))
    l_new = li.filter(F.col("l_shipdate") >= F.lit(cut).cast("timestamp_ntz"))

    def partial(o, l):
        rev_cents = F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + F.lit(0.5)
        ).cast("long")
        return (
            o.select("o_orderkey", "o_custkey")
            .join(l.select("l_orderkey", "l_extendedprice", "l_discount"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(rev_cents).alias("cents"))
        )

    view = (
        partial(o_old, l_old)
        .unionByName(partial(o_new, l_old))
        .unionByName(partial(o_old, l_new))
        .unionByName(partial(o_new, l_new))
        .groupBy("o_custkey")
        .agg(F.sum("n").alias("n_lines"), F.sum("cents").alias("cents"))
    )
    return view.select(
        F.col("o_custkey").alias("custkey"),
        "n_lines",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
    ).orderBy("custkey")
def _duck_sessions(pred: str) -> str:
    """Session-summary CTE body over events rows satisfying ``pred``:
    (user_id, st, en, n, cents) with 30-min gap islands — the exact
    sessionization from `events_sessionization`, reduced to the summary
    needed for fingerprinting."""
    return f"""
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS st,
               CAST(floor(epoch(MAX(ts))) AS BIGINT) AS en,
               COUNT(*) AS n,
               CAST(floor(SUM(value) * 100.0 + 0.5) AS BIGINT) AS cents
        FROM (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                                 OR date_diff('second',
                                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events WHERE {pred}
            )
        )
        GROUP BY user_id, sid
    """


_SESS_FP = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || CAST(st AS VARCHAR)"
    " || ':' || CAST(en AS VARCHAR) || ':' || CAST(n AS VARCHAR) || ':' ||"
    " CAST(cents AS VARCHAR)), 1, 15)) AS BIGINT)"
)

# Chosen so at least one session actually straddles the boundary at
# every shipped SF (measured: sf0.001/0.01/0.1 all have straddling
# consecutive-event pairs at this hour) — an un-straddled watershed
# would make the stitch path VACUOUS (the r7 late-data lesson: plant
# the condition, then assert it fired).
_WATERSHED = "2024-01-17 13:00:00"


@query(
    "maintain_incremental_sessions",
    oracle=f"""
    WITH mono AS ({_duck_sessions("TRUE")}),
    sa AS ({_duck_sessions(f"ts < TIMESTAMP '{_WATERSHED}'")}),
    sb AS ({_duck_sessions(f"ts >= TIMESTAMP '{_WATERSHED}'")}),
    last_a AS (
        SELECT * FROM (
            SELECT sa.*, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY st DESC) AS rn
            FROM sa
        ) WHERE rn = 1
    ),
    first_b AS (
        SELECT * FROM (
            SELECT sb.*, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY st) AS rn
            FROM sb
        ) WHERE rn = 1
    ),
    merged AS (
        SELECT a.user_id, a.st, b.en AS en, a.n + b.n AS n, a.cents + b.cents AS cents
        FROM last_a a JOIN first_b b USING (user_id)
        WHERE b.st - a.en <= 1800
    ),
    drop_a AS (
        SELECT user_id, st FROM last_a
        WHERE user_id IN (SELECT user_id FROM merged)
    ),
    drop_b AS (
        SELECT user_id, st FROM first_b
        WHERE user_id IN (SELECT user_id FROM merged)
    ),
    stitched AS (
        SELECT user_id, st, en, n, cents FROM sa
        WHERE NOT EXISTS (SELECT 1 FROM drop_a d
                          WHERE d.user_id = sa.user_id AND d.st = sa.st)
        UNION ALL
        SELECT user_id, st, en, n, cents FROM sb
        WHERE NOT EXISTS (SELECT 1 FROM drop_b d
                          WHERE d.user_id = sb.user_id AND d.st = sb.st)
        UNION ALL
        SELECT * FROM merged
    )
    SELECT (SELECT COUNT(*) FROM mono) AS n_sessions_mono,
           (SELECT COUNT(*) FROM stitched) AS n_sessions_incr,
           (SELECT COUNT(*) FROM merged) AS n_stitched_across,
           (SELECT bit_xor({_SESS_FP}) FROM mono)
             = (SELECT bit_xor({_SESS_FP}) FROM stitched) AS sessions_match
    """,
)
def maintain_incremental_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sessionization across a batch boundary, certified
    against monolithic recompute: sessionize each side of a date
    watershed INDEPENDENTLY, then stitch each user's last pre-watershed
    session to their first post-watershed session iff the cross-boundary
    gap is within the 30-min timeout — the per-user boundary state a
    daily batch pipeline carries so it never re-reads history.

    Correctness argument made executable: a monolithic session crosses
    the watershed iff its two boundary events are within the timeout,
    which is exactly the stitch condition — so the stitched session
    multiset must equal the monolithic one. The certification compares
    counts AND an order-invariant XOR of per-session md5 fingerprints
    over (user, start, end, n, cents); cents (not float sums) absorb
    accumulation-order noise between the merged and monolithic paths.
    Every window is user-partitioned; the merge is one per-user join of
    two 1-row-per-user tables.
    """
    ev = load_table(spark, sf_dir, "events")
    watershed = F.lit(_WATERSHED).cast("timestamp_ntz")

    def sessions(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        flagged = df.withColumn(
            "new_session",
            F.when(
                F.lag("ts").over(w).isNull()
                | ((F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
                1,
            ).otherwise(0),
        )
        ws = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            flagged.withColumn("sid", F.sum("new_session").over(ws))
            .groupBy("user_id", "sid")
            .agg(
                F.unix_timestamp(F.min("ts")).alias("st"),
                F.unix_timestamp(F.max("ts")).alias("en"),
                F.count(F.lit(1)).alias("n"),
                F.floor(F.sum("value") * 100.0 + 0.5).cast("long").alias("cents"),
            )
            .drop("sid")
        )

    mono = sessions(ev)
    sa = sessions(ev.filter(F.col("ts") < watershed))
    sb = sessions(ev.filter(F.col("ts") >= watershed))
    last_a = (
        sa.withColumn("rn", F.row_number().over(Window.partitionBy("user_id").orderBy(F.desc("st"))))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    first_b = (
        sb.withColumn("rn", F.row_number().over(Window.partitionBy("user_id").orderBy("st")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    a, b = last_a.alias("a"), first_b.alias("b")
    merged = (
        a.join(b, "user_id")
        .filter(F.col("b.st") - F.col("a.en") <= 1800)
        .select(
            "user_id",
            F.col("a.st").alias("st"),
            F.col("b.en").alias("en"),
            (F.col("a.n") + F.col("b.n")).alias("n"),
            (F.col("a.cents") + F.col("b.cents")).alias("cents"),
        )
    )
    merged_users = merged.select("user_id")
    drop_a = last_a.join(merged_users, "user_id", "left_semi").select("user_id", "st")
    drop_b = first_b.join(merged_users, "user_id", "left_semi").select("user_id", "st")
    stitched = (
        sa.join(drop_a, ["user_id", "st"], "left_anti")
        .unionByName(sb.join(drop_b, ["user_id", "st"], "left_anti"))
        .unionByName(merged)
    )

    def fp(df: DataFrame):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("user_id").cast("string"),
                        F.col("st").cast("string"),
                        F.col("en").cast("string"),
                        F.col("n").cast("string"),
                        F.col("cents").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return df.agg(F.count(F.lit(1)).alias("cnt"), F.bit_xor(h).alias("xfp"))

    m = fp(mono).select(F.col("cnt").alias("n_sessions_mono"), F.col("xfp").alias("fp_m"))
    s = fp(stitched).select(F.col("cnt").alias("n_sessions_incr"), F.col("xfp").alias("fp_s"))
    k = merged.agg(F.count(F.lit(1)).alias("n_stitched_across"))
    return (
        m.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(k))
        .select(
            "n_sessions_mono",
            "n_sessions_incr",
            "n_stitched_across",
            (F.col("fp_m") == F.col("fp_s")).alias("sessions_match"),
        )
    )


# (table, key column for the distinct-count probe, all columns) — schemas
# are the fixture contract (TESTDATA.md), stable across SFs.
_CARD_TABLES = [
    ("region", "r_regionkey", ["r_regionkey", "r_name"]),
    ("nation", "n_nationkey", ["n_nationkey", "n_name", "n_regionkey"]),
    ("customer", "c_custkey",
     ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]),
    ("supplier", "s_suppkey", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
    ("part", "p_partkey",
     ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
    ("orders", "o_orderkey",
     ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"]),
    ("lineitem", "l_orderkey",
     ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"]),
    ("events", "event_id",
     ["event_id", "ts", "user_id", "event_type", "value", "props"]),
    ("documents", "doc_id", ["doc_id", "text", "lang", "source", "n_chars"]),
    ("embeddings", "vec_id", ["vec_id", "embedding", "label"]),
]


def _card_oracle() -> str:
    parts = []
    for t, key, cols in _CARD_TABLES:
        nulls = " + ".join(f"COUNT(*) FILTER ({c} IS NULL)" for c in cols)
        parts.append(f"""
        SELECT '{t}' AS table_name,
               COUNT(*) AS n_rows,
               {len(cols)} AS n_cols,
               COUNT(DISTINCT {key}) AS n_distinct_keys,
               CAST({nulls} AS BIGINT) AS n_null_cells,
               COUNT(*) = COUNT(DISTINCT {key}) AS key_unique
        FROM {t}""")
    return " UNION ALL ".join(parts) + " ORDER BY table_name"


@query("profile_data_card_all_tables", oracle=_card_oracle())
def profile_data_card_all_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-per-table data card across the whole warehouse: row
    count, column count, key distinctness (is the declared key actually
    unique?), and total null cells — the cross-table freshness/contract
    summary a platform publishes alongside every snapshot, and the
    first thing a consumer checks before joining two tables.

    Each table contributes ONE aggregate job (all per-column null
    counts batched into the same partial+final pass — the A12
    single-pass-profiling discipline); the card is the 10-row union of
    their 1-row results. Nothing shuffles but final 1-row aggregates.
    """
    cards = []
    for t, key, cols in _CARD_TABLES:
        df = load_table(spark, sf_dir, t)
        nulls = None
        for c in cols:
            term = F.count(F.when(F.col(c).isNull(), 1))
            nulls = term if nulls is None else nulls + term
        cards.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(key).alias("n_distinct_keys"),
                nulls.cast("long").alias("n_null_cells"),
            ).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                F.lit(len(cols)).alias("n_cols"),
                "n_distinct_keys",
                "n_null_cells",
                (F.col("n_rows") == F.col("n_distinct_keys")).alias("key_unique"),
            )
        )
    out = cards[0]
    for c in cards[1:]:
        out = out.unionByName(c)
    return out.orderBy("table_name")


@query(
    "maintain_vacuum_orphan_audit",
    oracle="""
    SELECT 4 AS n_committed_files,
           5 AS n_disk_files,
           1 AS n_orphans,
           md5((SELECT arg_min(text, doc_id) FROM documents)) AS orphan_md5,
           (SELECT COUNT(*) FROM orders) AS n_rows_committed
    """,
)
def maintain_vacuum_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM's detection half: find files on disk that no committed
    manifest references — the debris a failed/zombie writer leaves that
    silently double-counts rows the moment someone lists the directory
    instead of the manifest. Staged end-to-end: a 4-file parquet commit
    is manifested from its own post-write listing, an orphan file is
    planted beside it (content derived from the corpus so the audit is
    data-dependent, not a constant check), and the audit is one
    binaryFile listing anti-joined against the manifest.

    Scale shape: the listing is O(#files) metadata rows (binaryFile
    content is only read for the orphans found — a projection-ordered
    lazy column); the anti-join keys on path. On a lakehouse the
    manifest side comes from the table log instead of a listing —
    identical plan. Companion to `maintain_compact_small_files`
    (too many live files) and `retention_prune_days` (too-old live
    files); this one handles files that were never live at all.
    """
    import os

    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    out = run_dir("vacuum_demo", sf_dir)
    orders.repartition(4).write.mode("overwrite").parquet(out)

    def listing():
        return (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .load(out)
            .select("path", "content")
        )

    committed_paths = [r.path for r in listing().select("path").collect()]
    n_committed = len(committed_paths)
    # The "commit log" snapshot is materialized EXPLICITLY from the
    # collected paths rather than by reusing the lazy binaryFile
    # listing: a lazy manifest re-lists the directory at anti-join
    # execution time, which would silently absorb the orphan planted
    # below into the "committed" side under any file-index refresh.
    manifest = spark.createDataFrame(
        [(p,) for p in committed_paths], schema="path string"
    )
    # a zombie writer's debris: planted AFTER the manifest snapshot,
    # with corpus-derived bytes so the audit value is data-dependent
    first_text = (
        docs.orderBy("doc_id").select("text").limit(1).collect()[0][0]
    )
    with open(os.path.join(out, "orphan-00000.parquet"), "wb") as fh:
        fh.write(first_text.encode("utf-8"))

    orphans = listing().join(manifest, "path", "left_anti")
    audit = orphans.agg(
        F.count(F.lit(1)).cast("int").alias("n_orphans"),
        F.min(F.md5("content")).alias("orphan_md5"),
    )
    # The committed read goes through the MANIFEST paths — a naive
    # directory-listing read (spark.read.parquet(out)) now fails on the
    # orphan's bogus footer, which is precisely the hazard this audit
    # exists to catch before it bites a consumer.
    n_rows = spark.read.parquet(*committed_paths).count()
    return (
        audit.select(
            F.lit(n_committed).cast("int").alias("n_committed_files"),
            (F.lit(n_committed) + F.col("n_orphans")).cast("int").alias("n_disk_files"),
            "n_orphans",
            "orphan_md5",
            F.lit(n_rows).cast("long").alias("n_rows_committed"),
        )
    )
