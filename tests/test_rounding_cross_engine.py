"""The rounding foundation: hround (Spark) and dround (DuckDB) must agree
bit-for-bit — every oracle comparison in the registry rests on this.

Hypothesis generates adversarial doubles (including the .5-at-the-cut
values where Spark's ROUND and DuckDB's round famously diverge); the
property is checked by actually running both engines, not by reimplementing
the formula in Python.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import example, given, settings, strategies as st

from bigdata_electricity_spark.functions.rounding import dround, hround

# Domain bound: |x|·10ⁿ < 2⁵³ (rounding.py). With n ≤ 6 that means
# |x| < ~9e9; beyond it Spark's floor→LONG and DuckDB's floor→DOUBLE
# legitimately diverge (found by this very test at ±9e11).
FINITE = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-9e9, max_value=9e9
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@pytest.mark.heavy
def test_hround_equals_dround(spark, duck):
    # Planted @examples: exact .5-at-the-cut values (representable in
    # binary at n=0 and n=2, where banker's-vs-half-up divergence
    # lives), negative ties, the motivating divergent double, and a
    # negative-n cut.
    @settings(max_examples=25, deadline=None)
    @example([0.5, 1.5, 2.5, 3.5], 0)
    @example([-0.5, -1.5, -2.5], 0)
    @example([0.125, 0.375, -0.625], 2)
    @example([17947.60995], 4)
    @example([150.0, 250.0, -350.0], -2)
    @example([0.0, -0.0], 3)
    @given(st.lists(FINITE, min_size=1, max_size=40), st.integers(-2, 6))
    def prop(values, n):
        df = spark.createDataFrame([(v,) for v in values], "x double")
        got_spark = [r["y"] for r in df.select(hround("x", n).alias("y")).collect()]
        # CAST: a bare float literal is DECIMAL in DuckDB (same trap as
        # Spark SQL); dround's callers always wrap DOUBLE column exprs.
        got_duck = [
            duck.execute(f"SELECT {dround(f'CAST({v!r} AS DOUBLE)', n)}").fetchone()[0]
            for v in values
        ]
        assert got_spark == got_duck, (n, values, got_spark, got_duck)

    prop()


def test_known_divergent_case(spark, duck):
    # 17947.60995 rounds differently under Spark ROUND vs DuckDB round —
    # the motivating example for hround/dround (functions/rounding.py).
    v = 17947.60995
    # CAST matters: bare literals are DECIMAL in both engines and agree;
    # the divergence is in their DOUBLE rounding (Spark via shortest
    # decimal repr + HALF_UP, DuckDB on the raw binary double).
    spark_plain = spark.sql(f"SELECT round(CAST({v!r} AS DOUBLE), 4) AS y").first()["y"]
    duck_plain = duck.execute(f"SELECT round(CAST({v!r} AS DOUBLE), 4)").fetchone()[0]
    assert spark_plain != duck_plain  # the trap is real
    df = spark.createDataFrame([(v,)], "x double")
    ours_spark = df.select(hround("x", 4).alias("y")).first()["y"]
    ours_duck = duck.execute(f"SELECT {dround(f'CAST({v!r} AS DOUBLE)', 4)}").fetchone()[0]
    assert ours_spark == ours_duck  # and hround/dround dodge it
