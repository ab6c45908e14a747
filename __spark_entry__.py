"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``bigdata_electricity_spark.plans.REGISTRY`` — every
implemented operator registers a (Spark impl, DuckDB oracle) pair there;
see SURVEY.md §2 for the inventory mapping.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata_electricity_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the 4-way star join revenue rollup (scan → broadcast +
    shuffle joins → aggregate → sort), the widest single plan.
    """
    return REGISTRY["join_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted → rows-only check."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
