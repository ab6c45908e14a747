"""The bench headline suite must always run — it IS the driver's BENCH.

Runs every HEADLINE query at sf0.001 (fast) so a registry refactor that
breaks a benched query fails tests before the driver's bench does.
"""

from __future__ import annotations

import pytest

from bench import HEADLINE
from bigdata_electricity_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_headline_names_registered():
    missing = [n for n in HEADLINE if n not in REGISTRY]
    assert not missing, missing


@pytest.mark.parametrize("name", HEADLINE)
def test_headline_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns  # stable non-empty schema
