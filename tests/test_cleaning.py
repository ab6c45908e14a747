"""Cleaning operators on the dirty household fixture (FIXTURES.md §A1).

Every pathology is planted at a known position (conftest), so these
assert exact counts — the reference's manual console inspection
(SURVEY §5.1) replaced with checked invariants.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdata_electricity_spark.operators import cleaning as C


def _prepped(household_raw):
    df, expected = household_raw
    out = C.replace_sentinels_with_null(df)
    out = C.add_datetime(out)
    return out, expected


def test_sentinel_replacement(household_raw):
    df, expected = household_raw
    out = C.replace_sentinels_with_null(df)
    n_marks = out.filter(F.col("Global_active_power") == "?").count()
    assert n_marks == 0
    nulls = out.filter(F.col("Global_active_power").isNull()).count()
    assert nulls == expected["all_null"] + 10  # 2 all-null + 10 single-col


def test_add_datetime_unpadded_parse(spark):
    df = spark.createDataFrame([("7/3/2007", "0:05:00"), ("17/11/2008", "23:59:00")],
                               ["Date", "Time"])
    got = [r["DateTime"] for r in C.add_datetime(df).orderBy("DateTime").collect()]
    assert got == [datetime(2007, 3, 7, 0, 5), datetime(2008, 11, 17, 23, 59)]


def test_before_stats_single_pass(household_raw):
    df, expected = _prepped(household_raw)
    stats = C.compute_before_stats(df)
    assert stats.total_rows == expected["total_rows"]
    assert stats.null_datetime == expected["null_datetime"]
    assert stats.any_null_measurement == expected["any_null"]
    assert stats.all_null_measurement == expected["all_null"]
    assert stats.duplicate_timestamps == expected["dup_timestamps"]
    assert stats.per_column_nulls["Global_active_power"] == 12


def test_cast_failures(household_raw):
    df, expected = _prepped(household_raw)
    cast = C.cast_numerics(df)
    fails = C.count_cast_failures(df, cast)
    assert fails["Global_active_power"] == expected["cast_failures_gap"]
    assert fails["Voltage"] == 0
    assert dict(cast.dtypes)["Global_active_power"] == "double"


def test_full_row_dups(household_raw):
    df, expected = _prepped(household_raw)
    cast = C.cast_numerics(df)
    assert C.count_full_row_dups(cast) == expected["full_row_dups"]
    deduped = C.drop_full_row_dups(cast)
    assert cast.count() - deduped.count() == expected["full_row_dups"]


def test_cadence_gap_detection(household_raw):
    # Gap detection runs on the pre-drop table (reference does it in the
    # before-stats phase) — dropping dirty rows would manufacture gaps.
    df, expected = _prepped(household_raw)
    gaps = C.detect_cadence_gaps(df).filter(F.col("gap_sec") > 60).collect()
    assert len(gaps) == expected["gaps"]
    # The null-DateTime row leaves a 2-min hole; the deletion leaves 21 min.
    assert sorted(g["gap_sec"] for g in gaps) == [120, 21 * 60]


def test_outlier_report(household_raw):
    df, _ = _prepped(household_raw)
    clean = C.clean_pipeline(df)
    report = C.outlier_report_iqr(clean, ["Global_active_power"]).first()
    assert report["outliers_Global_active_power"] >= 5


def test_clean_pipeline_end_state(household_raw):
    df, expected = _prepped(household_raw)
    clean = C.clean_pipeline(df)
    # No nulls, no sentinel rows, no full-row dups, all doubles.
    assert clean.filter(F.col("Global_active_power").isNull()).count() == 0
    assert dict(clean.dtypes)["Sub_metering_3"] == "double"
    # 12 null rows + 1 bad date + 1 cast-failure + 1 dup removed.
    assert clean.count() == expected["total_rows"] - 12 - 1 - 1 - 1
