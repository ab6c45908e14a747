"""End-to-end reference pipeline on the dirty household fixture.

The closest thing to 'running the reference': raw semicolon-CSV with
every pathology → cleaned → reduced → transformed → exported → Q1-Q5 →
ML, all in one call, with invariants checked at each artifact.
"""

from __future__ import annotations

import os

import pytest

from bigdata_electricity_spark.pipeline import run_reference_pipeline
from tests.conftest import COLUMNS, make_household_rows


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    rows, _ = make_household_rows()
    csv_dir = tmp_path_factory.mktemp("household")
    src = csv_dir / "power.csv"
    with open(src, "w") as fh:
        fh.write(";".join(COLUMNS) + "\n")
        for r in rows:
            fh.write(";".join(r) + "\n")
    out_csv = str(csv_dir / "transformed.csv")
    res = run_reference_pipeline(
        spark, str(src), sample_fraction=1.0, export_csv_path=out_csv
    )
    return res


def test_pipeline_profile(result):
    _, expected = make_household_rows()
    assert result.before_stats.total_rows == expected["total_rows"]
    assert result.before_stats.any_null_measurement == expected["any_null"]


def test_pipeline_transformed_schema(result):
    # The 33-column analytical table of FIXTURES.md A2.
    cols = result.transformed.columns
    assert len(cols) == 33
    assert cols[0] == "Hour"
    for c in ("dow_1", "month_12", "total_sub_metering", "total_sub_metering_scaled"):
        assert c in cols


def test_pipeline_export_single_file(result):
    assert result.export_path and os.path.isfile(result.export_path)
    with open(result.export_path) as fh:
        header = fh.readline().strip().split(",")
    assert header[0] == "Hour"
    assert len(header) == 33


def test_pipeline_sql_results(result):
    q1 = result.sql_results["q1_avg_by_hour"].collect()
    assert len(q1) == 24  # all 24 hours present in the fixture
    # Descending by avg_power.
    vals = [r["avg_power"] for r in q1]
    assert vals == sorted(vals, reverse=True)

    q2 = result.sql_results["q2_global_stats"].first()
    assert q2["distinct_days"] == 3

    q5 = result.sql_results["q5_top_month_per_year"].collect()
    assert len(q5) == 1 and q5[0]["month"] == 3  # single March window


def test_pipeline_ml_metrics(result):
    metrics = {r["metric"]: r for r in result.ml_metrics.collect()}
    assert set(metrics) == {"rmse", "mae", "r2"}
    # Power ~ intensity is near-linear in the fixture: model must beat baseline.
    assert metrics["rmse"]["model"] < metrics["rmse"]["baseline"]


def test_observe_metrics_single_action(spark):
    # Stage metrics must arrive as a side effect of the ONE action the
    # pipeline already runs — no extra count() jobs (SURVEY §4.3.2).
    from pyspark.sql import functions as F

    from bigdata_electricity_spark.operators.observability import observe_stage
    from bigdata_electricity_spark.sources.loaders import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    staged, obs_in = observe_stage(
        docs, "ingest",
        F.count(F.lit(1)).alias("n_rows"), F.sum("n_chars").alias("n_chars"),
    )
    kept = staged.filter(F.col("n_chars") >= 100)
    kept, obs_out = observe_stage(kept, "kept")

    n_kept_action = kept.count()  # the single action
    assert obs_out.get["n_rows"] == n_kept_action
    assert obs_in.get["n_rows"] == docs.count()
    assert obs_in.get["n_chars"] == docs.agg(F.sum("n_chars")).first()[0]
