"""ML pipeline — reference parity for ml/MLOperations.scala (SURVEY §2.12).

VectorAssembler → MinMaxScaler → LinearRegression → RegressionEvaluator
(rmse/mae/r2) → mean-predictor baseline comparison (M1-M6), generalized
from the household table to any (label, features) column spec.

Float metrics are seed/solver-dependent → rows-only driver check
(SURVEY §5.2); the pipeline's invariants (schema, metric sanity, model
beating the baseline on a linear target) are unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import MinMaxScaler, VectorAssembler
from pyspark.ml.regression import LinearRegression


def run_regression_pipeline(df: DataFrame, label_col: str,
                            feature_cols: list[str],
                            seed: int = 42) -> DataFrame:
    """Train LR vs mean baseline; return a (metric, model, baseline) DataFrame.

    Mirrors MLOperations.run (MLOperations.scala:12-174): 0.7/0.3 split
    (R2), assemble (M1), min-max scale fit on train only (M2), LR fit
    (M3), evaluate rmse/mae/r2 on test (M4), lit(mean) baseline (M5).
    """
    spark = df.sparkSession
    data = df.select(F.col(label_col).alias("label"), *feature_cols).na.drop()
    train, test = data.randomSplit([0.7, 0.3], seed=seed)

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    scaler = MinMaxScaler(inputCol="features", outputCol="scaledFeatures")
    train_vec = assembler.transform(train)
    test_vec = assembler.transform(test)
    scaler_model = scaler.fit(train_vec)  # fit on train only — no test leakage
    # Cache both scaled splits: LR.fit makes several passes over train
    # and the 3×2 evaluator metrics each scan test — without caching,
    # every pass re-runs split+assemble+scale from the parquet scan
    # (measured ~2× the query time at sf0.1).
    train_scaled = scaler_model.transform(train_vec).cache()
    test_scaled = scaler_model.transform(test_vec).cache()

    lr = LinearRegression(featuresCol="scaledFeatures", labelCol="label")
    model = lr.fit(train_scaled)
    # Cache predictions too — each of the 3 evaluator passes re-runs the
    # model transform otherwise.
    predictions = model.transform(test_scaled).cache()

    # M5 — mean-predictor baseline (MLOperations.scala:128-142).
    train_mean = train.agg(F.avg("label")).first()[0]
    baseline = test_scaled.withColumn("prediction", F.lit(train_mean)).cache()

    try:
        rows = []
        for metric in ("rmse", "mae", "r2"):
            evaluator = RegressionEvaluator(
                labelCol="label", predictionCol="prediction", metricName=metric
            )
            rows.append(
                (metric, float(evaluator.evaluate(predictions)), float(evaluator.evaluate(baseline)))
            )
        return spark.createDataFrame(rows, "metric string, model double, baseline double")
    finally:
        for cached in (train_scaled, test_scaled, predictions, baseline):
            cached.unpersist()


def coefficient_report(df: DataFrame, label_col: str, feature_cols: list[str],
                       seed: int = 42) -> list[tuple[str, float]]:
    """M6 — (feature, coefficient) pairs (MLOperations.scala:169-174)."""
    data = df.select(F.col(label_col).alias("label"), *feature_cols).na.drop()
    train, _ = data.randomSplit([0.7, 0.3], seed=seed)
    vec = VectorAssembler(inputCols=feature_cols, outputCol="features").transform(train)
    model = LinearRegression(featuresCol="features", labelCol="label").fit(vec)
    return list(zip(feature_cols, [float(c) for c in model.coefficients]))
