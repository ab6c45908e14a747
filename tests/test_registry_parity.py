"""The driver's t2 gate, replicated at sf0.001: every registry query runs
on Spark AND its DuckDB oracle, compared on columns + rowcount + values.

This is the highest-value test in the suite — it is exactly what the
driver measures (CORRECTNESS_r{N}.json), just at the smallest SF so the
whole sweep stays fast.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import REGISTRY
from tools.parity import compare_one, oracle_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = oracle_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_parity(spark, duck, name):
    outcome = compare_one(spark, duck, REGISTRY[name], SF_DIR)
    if outcome is not None and outcome.startswith("ok:"):
        return  # rows-only spec: ran without error
    assert outcome is None, outcome


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)


def test_scale_twins_exist():
    # Every documented exact↔scale-safe pairing must reference real
    # registry entries on both sides (the catalog renders these links).
    from bigdata_electricity_spark.plans import SCALE_TWINS

    for exact, twin in SCALE_TWINS.items():
        assert exact in REGISTRY, exact
        assert twin in REGISTRY, twin
        assert exact != twin
