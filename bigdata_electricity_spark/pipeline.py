"""End-to-end reference pipeline: the PySpark Main.scala.

Wires the full flow the reference runs as separate hand-edited stages
(Main.scala:18 switches modules by recompiling): raw CSV → Cleaning →
Reduction → Transformation → export → SQL analytics → ML — as one
composable function over DataFrames, with parquet (not CSV) as the
inter-stage format when materialization is requested (SURVEY §4.3.4).

A user of the reference can point :func:`run_reference_pipeline` at the
same semicolon-CSV and get every artifact the reference produces.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .ml.regression import run_regression_pipeline
from .operators.cleaning import (
    BeforeStats,
    clean_pipeline,
    compute_before_stats,
    add_datetime,
    outlier_report_iqr,
    replace_sentinels_with_null,
)
from .operators.reduction import reduce_pipeline
from .operators.transformation import transform_pipeline
from .sources.loaders import load_household_raw
from .sources.sinks import save_single_csv


@dataclass
class PipelineResult:
    """Every artifact of the reference flow, lazily evaluated where possible."""

    before_stats: BeforeStats
    cleaned: DataFrame
    transformed: DataFrame
    outlier_report: dict[str, int]
    sql_results: dict[str, DataFrame] = field(default_factory=dict)
    ml_metrics: DataFrame | None = None
    export_path: str | None = None


# Q1-Q5 over the transformed household table (temp view power_data), the
# literal query surface of sql/SQLOperations.scala:39-151 with identical
# shapes (names parameterized to the transformed schema of FIXTURES.md A2).
POWER_SQL: dict[str, str] = {
    "q1_avg_by_hour": """
        SELECT hour_of_day, AVG(avg_Global_active_power) AS avg_power
        FROM power_data GROUP BY hour_of_day ORDER BY avg_power DESC
    """,
    "q2_global_stats": """
        SELECT COUNT(DISTINCT date) AS distinct_days,
               AVG(avg_Global_active_power) AS avg_power,
               VARIANCE(avg_Global_active_power) AS var_power
        FROM power_data
    """,
    "q3_rank_years": """
        SELECT year, avg_power, RANK() OVER (ORDER BY avg_power DESC) AS power_rank
        FROM (SELECT YEAR(date) AS year, AVG(avg_Global_active_power) AS avg_power
              FROM power_data GROUP BY YEAR(date))
        ORDER BY power_rank
    """,
    "q4_above_avg_days": """
        WITH daily_consumption AS (
            SELECT date, SUM(avg_Global_active_power) AS total_power
            FROM power_data GROUP BY date
        )
        SELECT date, total_power FROM daily_consumption
        WHERE total_power > (SELECT AVG(total_power) FROM daily_consumption)
        ORDER BY total_power DESC
    """,
    "q5_top_month_per_year": """
        WITH monthly AS (
            SELECT YEAR(date) AS year, MONTH(date) AS month,
                   AVG(avg_Global_active_power) AS avg_power
            FROM power_data GROUP BY YEAR(date), MONTH(date)
        ), ranked AS (
            SELECT year, month, avg_power,
                   ROW_NUMBER() OVER (PARTITION BY year ORDER BY avg_power DESC) AS month_rank
            FROM monthly
        )
        SELECT year, month, avg_power FROM ranked WHERE month_rank = 1 ORDER BY year
    """,
}

ML_LABEL = "avg_Global_active_power"
ML_FEATURES = ["avg_Voltage", "avg_Global_intensity", "total_sub_metering"]


def run_reference_pipeline(spark: SparkSession, raw_csv_path: str,
                           sample_fraction: float = 0.5, seed: int = 42,
                           export_csv_path: str | None = None,
                           run_sql: bool = True, run_ml: bool = True) -> PipelineResult:
    """The complete reference flow on a raw household-power CSV.

    Stages (with reference citations):
      1. load S1 + profile (Cleaning.scala:22-89)
      2. clean: sentinels→DateTime→cast→drop→dedup (Cleaning.scala:92-120)
      3. outlier report (Cleaning.scala:123-152)
      4. reduce: hourly rollup → seeded sample → feature selection
         (reduction.scala:10-43)
      5. transform: time-derived, one-hot, engineered, min-max scale
         (Transformation.scala:12-89)
      6. optional single-file CSV export (Transformation.scala:92-115)
      7. SQL analytics Q1-Q5 on temp view power_data
         (SQLOperations.scala:25-153)
      8. ML regression vs mean baseline (MLOperations.scala:12-167)
    """
    raw = load_household_raw(spark, raw_csv_path)
    prepped = add_datetime(replace_sentinels_with_null(raw))
    before = compute_before_stats(prepped)

    cleaned = clean_pipeline(raw)
    outliers = outlier_report_iqr(cleaned).first().asDict()

    transformed = transform_pipeline(
        reduce_pipeline(cleaned, sample_fraction=sample_fraction, seed=seed)
    )

    export_path = None
    if export_csv_path is not None:
        export_path = save_single_csv(transformed, export_csv_path)

    result = PipelineResult(
        before_stats=before,
        cleaned=cleaned,
        transformed=transformed,
        outlier_report=outliers,
        export_path=export_path,
    )

    if run_sql:
        transformed.createOrReplaceTempView("power_data")
        result.sql_results = {name: spark.sql(q) for name, q in POWER_SQL.items()}

    if run_ml:
        result.ml_metrics = run_regression_pipeline(
            transformed, label_col=ML_LABEL, feature_cols=ML_FEATURES, seed=seed
        )
    return result
