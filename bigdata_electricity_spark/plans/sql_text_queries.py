"""Q1-Q5 as literal Spark SQL text over temp views — the reference's API.

The reference's SQL module is a temp view + ``spark.sql`` strings
(sql/SQLOperations.scala:25,39,57,74,97,124). These are the same five
query shapes as plans/reference_queries.py but through the SQL-text
entry point, proving both front-ends produce identical results (each
pair shares one DuckDB oracle; Catalyst compiles both to the same plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import dround
from ..sources.loaders import register_views
from .registry import REGISTRY, query

# Deterministic half-up rounding, Spark SQL side (see functions/rounding.py).
# The 'D' suffix forces DOUBLE literals — a bare 10000.0 is DECIMAL in
# Spark SQL, and decimal division changes the result's scale/rendering.
def _sround(expr: str, n: int) -> str:
    s = repr(float(10.0 ** n))
    return f"floor(({expr}) * {s}D + 0.5D) / {s}D"


_SQL_TEXT: dict[str, str] = {
    "q1_hourly_avg": f"""
        SELECT hour(ts) AS hour_of_day,
               {_sround('AVG(value)', 4)} AS avg_value
        FROM events
        GROUP BY hour(ts)
        ORDER BY avg_value DESC
    """,
    "q2_global_stats": f"""
        SELECT COUNT(DISTINCT to_date(o_orderdate)) AS distinct_days,
               {_sround('AVG(o_totalprice)', 4)} AS avg_totalprice,
               {_sround('VARIANCE(o_totalprice)', -2)} AS var_totalprice
        FROM orders
    """,
    "q3_rank_years": f"""
        SELECT year,
               {_sround('avg_raw', 4)} AS avg_totalprice,
               RANK() OVER (ORDER BY avg_raw DESC) AS price_rank
        FROM (
            SELECT year(o_orderdate) AS year, AVG(o_totalprice) AS avg_raw
            FROM orders GROUP BY year(o_orderdate)
        )
        ORDER BY price_rank
    """,
    "q4_above_avg_days": f"""
        WITH daily AS (
            SELECT to_date(ts) AS day, SUM(value) AS total_raw
            FROM events GROUP BY to_date(ts)
        )
        SELECT day, {_sround('total_raw', 2)} AS total_value
        FROM daily
        WHERE total_raw > (SELECT AVG(total_raw) FROM daily)
        ORDER BY total_value DESC
    """,
    "q5_top_month_per_year": f"""
        WITH monthly AS (
            SELECT year(l_shipdate) AS year, month(l_shipdate) AS month,
                   SUM(l_extendedprice * (1 - l_discount)) AS revenue_raw
            FROM lineitem GROUP BY year(l_shipdate), month(l_shipdate)
        ), ranked AS (
            SELECT year, month, revenue_raw,
                   ROW_NUMBER() OVER (PARTITION BY year ORDER BY revenue_raw DESC) AS rn
            FROM monthly
        )
        SELECT year, month, {_sround('revenue_raw', 2)} AS revenue
        FROM ranked WHERE rn = 1
        ORDER BY year
    """,
}


def _make(df_twin: str, sql_text: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql_text)

    run.__doc__ = (
        f"SQL-text twin of {df_twin} (reference spark.sql API, "
        "sql/SQLOperations.scala) — same oracle, same result hash."
    )
    return run


for _name, _sql in _SQL_TEXT.items():
    # Registered after reference_queries, so the DataFrame twin's oracle
    # exists; sharing it asserts both front-ends agree with DuckDB.
    query(f"{_name}_sqltext", oracle=REGISTRY[_name].oracle)(_make(_name, _sql))


_EDGES_DUCK = """
        SELECT DISTINCT sn.n_nationkey AS src, cn.n_nationkey AS dst
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE sn.n_nationkey <> cn.n_nationkey
"""


@query(
    "sql_recursive_reachability",
    oracle=f"""
    WITH RECURSIVE edges AS ({_EDGES_DUCK}),
    reach(nk, lvl) AS (
        SELECT CAST(0 AS BIGINT) AS nk, 0 AS lvl
        UNION ALL
        SELECT e.dst AS nk, r.lvl + 1 AS lvl
        FROM reach r JOIN edges e ON e.src = r.nk
        WHERE r.lvl < 2
    )
    SELECT nk AS nationkey, CAST(MIN(lvl) AS BIGINT) AS hops
    FROM reach GROUP BY nk ORDER BY nationkey
    """,
)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 `WITH RECURSIVE`) — BFS reachability over
    the supplier→customer nation trade graph from nation 0, depth ≤ 2,
    reporting each reachable nation's minimum hop count. The SAME SQL
    text runs on both engines (DuckDB's recursive CTE is the oracle),
    certifying Spark's recursion semantics, not just the result.

    Scale shape: the recursive step re-joins the 25-node frontier to the
    distinct nation-pair edge list (≤ 25² rows — the heavy lineitem join
    collapses to it before any recursion); depth is bounded by the lvl
    guard. For unbounded graphs the iterative star-contraction CC
    operator (`operators/graph.py`) is the scalable path; this entry
    covers the declarative API.
    """
    register_views(spark, sf_dir)
    # Identical text modulo int literal typing: Spark's CAST(0 AS BIGINT)
    # matches DuckDB; hops cast keeps both engines at int64.
    return spark.sql(
        f"""
        WITH RECURSIVE edges AS ({_EDGES_DUCK}),
        reach(nk, lvl) AS (
            SELECT CAST(0 AS BIGINT) AS nk, 0 AS lvl
            UNION ALL
            SELECT e.dst AS nk, r.lvl + 1 AS lvl
            FROM reach r JOIN edges e ON e.src = r.nk
            WHERE r.lvl < 2
        )
        SELECT nk AS nationkey, CAST(MIN(lvl) AS BIGINT) AS hops
        FROM reach GROUP BY nk ORDER BY nationkey
        """
    )


@query(
    "sqltext_parameterized_topn",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dround('SUM(o_totalprice)', 2)} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def sqltext_parameterized_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter `spark.sql(query, args=...)` (Spark 4) — the
    injection-safe front-end for user-supplied constants: the segment
    and top-N arrive as BOUND PARAMETERS (`:segment`, `:n`), never
    string-spliced into the SQL text. The oracle inlines the same
    literals, so the hash also certifies parameter binding is
    semantically identical to literal substitution.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT c_custkey, c_name,
               {_sround('SUM(o_totalprice)', 2)} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE c_mktsegment = :segment
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT :n
        """,
        args={"segment": "BUILDING", "n": 10},
    )


@query(
    "sqltext_lateral_topn_per_group",
    oracle=f"""
    WITH ranked AS (
        SELECT n.n_name, c.c_custkey, c.c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY n.n_nationkey
                                  ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name, c_custkey, {dround('c_acctbal', 2)} AS acctbal
    FROM ranked WHERE rn <= 2
    ORDER BY n_name, acctbal DESC, c_custkey
    """,
)
def sqltext_lateral_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY ... LIMIT
    (Spark 4 supports lateral correlation into a sorted-limited
    subquery): top-2 customers by account balance per nation, written
    the way an OLTP-habituated user writes it. The oracle computes the
    same result through ROW_NUMBER — deliberately a DIFFERENT mechanism,
    so the hash certifies Spark's lateral decorrelation against the
    window formulation rather than re-running one engine's plan twice.

    Catalyst decorrelates the lateral into exactly that window/rank
    plan (no per-outer-row re-execution — `.explain` shows a single
    partitioned rank, not a nested loop), which is why the pattern is
    safe at 100 TB: the lateral is syntax, the window is the plan.

    ENGINE TRAP (found by the mini-warehouse edge net): if the
    correlated equality needs an implicit widening cast (BIGINT
    c_nationkey vs INT n_nationkey — exactly what a pandas-concat
    rewrite of one table produces), Spark 4.1.2's decorrelation
    SILENTLY drops the correlation and compiles the LIMIT as a GLOBAL
    limit — 2 rows instead of 2-per-nation, no error. Both sides of
    the correlation are therefore CAST to BIGINT explicitly inside the
    query, which keeps the equality coercion-free for any input width.
    Regression-pinned on a width-widened fixture in
    tests/test_r8_entries.py.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT n.n_name, t.c_custkey, {_sround('t.c_acctbal', 2)} AS acctbal
        FROM (SELECT n_name, CAST(n_nationkey AS BIGINT) AS nk FROM nation) n,
             LATERAL (
                 SELECT c_custkey, c_acctbal
                 FROM (SELECT c_custkey, c_acctbal,
                              CAST(c_nationkey AS BIGINT) AS nk
                       FROM customer) c
                 WHERE c.nk = n.nk
                 ORDER BY c_acctbal DESC, c_custkey
                 LIMIT 2
             ) t
        ORDER BY n.n_name, acctbal DESC, t.c_custkey
        """
    )


@query(
    "sqltext_session_variables",
    oracle=f"""
    WITH cutoff AS (
        SELECT {dround('AVG(o_totalprice)', 4)} AS v FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           {dround('MAX(o_totalprice)', 2)} AS max_price,
           (SELECT v FROM cutoff) AS cutoff_used
    FROM orders, cutoff
    WHERE o_totalprice > cutoff.v
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sqltext_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + EXECUTE IMMEDIATE (both Spark 4): a
    cutoff is DECLAREd, SET from a scalar subquery, and then consumed
    by a dynamically-executed statement — the scripting workflow of
    warehouse SQL consoles. The oracle inlines the same cutoff as a
    CTE, so the hash certifies that variable binding + dynamic SQL
    changes nothing semantically.

    DECLARE OR REPLACE keeps the entry idempotent across repeated runs
    in one session (driver, parity sweeps). The variable is rounded at
    binding time (1e-4 lockstep) because it crosses into result rows as
    `cutoff_used`.
    """
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE bde_price_cutoff DOUBLE")
    spark.sql(
        f"SET VAR bde_price_cutoff = (SELECT {_sround('AVG(o_totalprice)', 4)} FROM orders)"
    )
    return spark.sql(
        f"""
        EXECUTE IMMEDIATE
        'SELECT o_orderpriority,
                COUNT(*) AS n_above,
                {_sround("MAX(o_totalprice)", 2).replace("'", "''")} AS max_price,
                bde_price_cutoff AS cutoff_used
         FROM orders
         WHERE o_totalprice > bde_price_cutoff
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority'
        """
    )


_GBA_SQL = """
    SELECT l_returnflag,
           l_linestatus,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           COUNT(*) AS n_lines,
           {rnd} AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
"""


@query(
    "sqltext_group_by_all",
    oracle=_GBA_SQL.format(rnd=dround("SUM(l_quantity)", 2)),
)
def sqltext_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` + `ORDER BY ALL` — the exploratory-SQL shorthand
    (every non-aggregate select item becomes a grouping key; order by
    the whole projection left-to-right). The IDENTICAL SQL text runs on
    both engines (DuckDB originated the syntax; Spark adopted it), so
    the hash certifies that both resolve ALL to the same key set
    (l_returnflag, l_linestatus, ship_year) and the same total order —
    including the derived-expression key, the case that trips naive
    ALL implementations.

    Same physical plan as writing the keys out: one map-combinable
    grouped aggregate; ALL is resolution sugar, not a plan change.
    """
    register_views(spark, sf_dir)
    # Spark's year() returns INT, DuckDB's BIGINT — align width in the
    # projection the same way on both (dround already matched sum_qty).
    return spark.sql(_GBA_SQL.format(rnd=_sround("SUM(l_quantity)", 2)))
