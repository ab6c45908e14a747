"""Cleaning operators — sentinel handling, typing, dedup, profiling, gaps, outliers.

PySpark-native re-expression of the reference's preprocessing/Cleaning.scala
(SURVEY §2.2/§2.4/§2.5: P1-P9, A1-A2, A11-A12, W1). Structure mirrors the
reference's decomposition but fixes its one-job-per-metric profiling
(SURVEY §4.3.2): every profile here is a SINGLE aggregation pass.

Default column names match the UCI household-power table the reference
targets (Cleaning.scala:11-19); every function takes the column list as a
parameter so the operators run on any table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.scalars import all_null, any_null, null_counts_exprs, to_event_datetime

# Canonical numeric columns of the household table (Cleaning.scala:11-19).
NUM_COLS: list[str] = [
    "Global_active_power",
    "Global_reactive_power",
    "Voltage",
    "Global_intensity",
    "Sub_metering_1",
    "Sub_metering_2",
    "Sub_metering_3",
]

SENTINEL = "?"


def replace_sentinels_with_null(df: DataFrame, sentinel: str = SENTINEL,
                                cols: list[str] | None = None) -> DataFrame:
    """P1 — replace the ``"?"`` missing-value sentinel with null.

    Reference Cleaning.scala:31-33 (na.replace over all columns).
    """
    return df.na.replace(sentinel, None, subset=cols or df.columns)


def add_datetime(df: DataFrame, date_col: str = "Date", time_col: str = "Time",
                 out_col: str = "DateTime") -> DataFrame:
    """P2 — derive a timestamp from unpadded Date+Time strings.

    Reference Cleaning.scala:36-41 (`to_timestamp(concat_ws(...), "d/M/yyyy H:mm:ss")`);
    unparseable rows become null and are accounted for in before_stats.
    """
    return df.withColumn(out_col, to_event_datetime(date_col, time_col))


@dataclass
class BeforeStats:
    """Profile of the raw table prior to cleaning (Cleaning.scala:44-51)."""

    total_rows: int
    null_datetime: int
    any_null_measurement: int
    all_null_measurement: int
    duplicate_timestamps: int
    per_column_nulls: dict[str, int]


def compute_before_stats(df: DataFrame, num_cols: list[str] | None = None,
                         ts_col: str = "DateTime") -> BeforeStats:
    """Single-pass profiling of null/dup pathologies.

    The reference runs 6+ separate count jobs (Cleaning.scala:53-89); here
    the row-level predicates fold into ONE aggregation job plus one
    aggregation for the duplicate-timestamp count (needs its own groupBy).
    """
    num_cols = num_cols or NUM_COLS
    row = df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col(ts_col).isNull(), 1).otherwise(0)).alias("null_dt"),
        F.sum(F.when(any_null(num_cols), 1).otherwise(0)).alias("any_null"),
        F.sum(F.when(all_null(num_cols), 1).otherwise(0)).alias("all_null"),
        *null_counts_exprs(num_cols),
    ).first()
    # A1 — duplicate-timestamp detection (Cleaning.scala:65-66).
    dup = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(ts_col).count().filter(F.col("count") > 1)
        .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("dups"))
        .first()
    )
    return BeforeStats(
        total_rows=row["total_rows"],
        null_datetime=row["null_dt"] or 0,
        any_null_measurement=row["any_null"] or 0,
        all_null_measurement=row["all_null"] or 0,
        duplicate_timestamps=dup["dups"],
        per_column_nulls={c: (row[f"nulls_{c}"] or 0) for c in num_cols},
    )


def drop_missing(df: DataFrame, num_cols: list[str] | None = None) -> DataFrame:
    """P6 — drop rows with any null measurement (Cleaning.scala:92-94)."""
    return df.na.drop("any", subset=num_cols or NUM_COLS)


def cast_numerics(df: DataFrame, num_cols: list[str] | None = None) -> DataFrame:
    """P7 — cast measurement columns string→double (Cleaning.scala:97-101).

    Invalid numerics become null, counted by :func:`count_cast_failures`.
    try_cast, not cast: Spark 4 enables ANSI mode by default, under which
    a plain cast on malformed input raises instead of reproducing the
    reference's Spark-3 null-on-failure semantics.
    """
    return df.withColumns({c: F.col(c).try_cast("double") for c in (num_cols or NUM_COLS)})


def count_cast_failures(before: DataFrame, after: DataFrame,
                        num_cols: list[str] | None = None) -> dict[str, int]:
    """Cast-failure accounting (Cleaning.scala:104-106) in ONE job per table.

    A failure is a value that was non-null pre-cast and null post-cast.
    The reference runs 7 separate count jobs; here we join nothing and
    aggregate each side once.
    """
    num_cols = num_cols or NUM_COLS
    pre = before.agg(*null_counts_exprs(num_cols)).first()
    post = after.agg(*null_counts_exprs(num_cols)).first()
    return {c: (post[f"nulls_{c}"] or 0) - (pre[f"nulls_{c}"] or 0) for c in num_cols}


def drop_full_row_dups(df: DataFrame, key_cols: list[str] | None = None,
                       ts_col: str = "DateTime",
                       num_cols: list[str] | None = None) -> DataFrame:
    """P8 — dropDuplicates on DateTime + all measurements (Cleaning.scala:117-120)."""
    keys = key_cols or [ts_col, *(num_cols or NUM_COLS)]
    return df.dropDuplicates(keys)


def count_full_row_dups(df: DataFrame, key_cols: list[str] | None = None,
                        ts_col: str = "DateTime",
                        num_cols: list[str] | None = None) -> int:
    """A2 — number of redundant full-row duplicates (Cleaning.scala:109-115)."""
    keys = key_cols or [ts_col, *(num_cols or NUM_COLS)]
    row = (
        df.groupBy(*keys).count().filter(F.col("count") > 1)
        .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("dups"))
        .first()
    )
    return row["dups"]


def detect_cadence_gaps(df: DataFrame, ts_col: str = "DateTime",
                        expected_gap_sec: int = 60,
                        tiebreak_cols: list[str] | None = None) -> DataFrame:
    """W1 — lag-based cadence-gap detection (Cleaning.scala:68-79).

    Returns rows whose gap to the previous reading ≠ ``expected_gap_sec``.
    Scale note: the semantics require a global order, which Spark executes
    as a single-partition window — correct but serial (SURVEY §4.3.3). At
    cluster scale, pre-aggregate or partition by a coarse time bucket and
    stitch boundaries; for meter-cadence QA the input is typically already
    a per-device slice, so prefer ``partition_cols`` via
    :func:`detect_cadence_gaps_partitioned`.
    """
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.orderBy(*order)
    return (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("prev_ts", F.lag(ts_col, 1).over(w))
        .withColumn(
            "gap_sec",
            (F.unix_timestamp(ts_col) - F.unix_timestamp("prev_ts")).cast("long"),
        )
        .filter(F.col("prev_ts").isNotNull() & (F.col("gap_sec") != expected_gap_sec))
    )


def detect_cadence_gaps_partitioned(df: DataFrame, partition_cols: list[str],
                                    ts_col: str = "ts",
                                    min_gap_sec: int = 60) -> DataFrame:
    """Scalable gap detection: lag within a partition key (e.g. per device/user).

    The 100 TB-safe variant — the window shuffles by ``partition_cols``
    instead of funnelling everything through one partition.
    """
    w = Window.partitionBy(*partition_cols).orderBy(ts_col)
    return (
        df.withColumn("prev_ts", F.lag(ts_col, 1).over(w))
        .withColumn(
            "gap_sec",
            (F.unix_timestamp(ts_col) - F.unix_timestamp("prev_ts")).cast("long"),
        )
        .filter(F.col("prev_ts").isNotNull() & (F.col("gap_sec") > min_gap_sec))
    )


def outlier_bounds_iqr(df: DataFrame, cols: list[str] | None = None,
                       k: float = 1.5, relative_error: float = 0.001) -> dict[str, tuple[float, float]]:
    """A11 — IQR outlier bounds via approxQuantile (Cleaning.scala:123-152).

    ONE multi-column approxQuantile call (Greenwald-Khanna) instead of the
    reference's per-column loop. Returns {col: (lower, upper)}.
    """
    cols = cols or NUM_COLS
    quantiles = df.stat.approxQuantile(cols, [0.25, 0.75], relative_error)
    out: dict[str, tuple[float, float]] = {}
    for c, (q1, q3) in zip(cols, quantiles):
        iqr = q3 - q1
        out[c] = (q1 - k * iqr, q3 + k * iqr)
    return out


def outlier_report_iqr(df: DataFrame, cols: list[str] | None = None,
                       k: float = 1.5) -> DataFrame:
    """P9 + A12 — per-column outlier counts outside the IQR fence.

    All per-column counts fold into one aggregation job.
    """
    cols = cols or NUM_COLS
    bounds = outlier_bounds_iqr(df, cols, k)
    exprs = []
    for c in cols:
        lo, hi = bounds[c]
        exprs.append(
            F.sum(
                F.when((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)), 1).otherwise(0)
            ).alias(f"outliers_{c}")
        )
    return df.agg(*exprs)


def clean_pipeline(df: DataFrame, num_cols: list[str] | None = None) -> DataFrame:
    """Full cleaning pipeline: sentinels → DateTime → cast → drop → dedup.

    Composition of the reference's Cleaning stages as one lazy plan —
    Catalyst collapses the stacked projections into a single stage.
    """
    num_cols = num_cols or NUM_COLS
    out = replace_sentinels_with_null(df)
    out = add_datetime(out)
    out = cast_numerics(out, num_cols)
    out = drop_missing(out, num_cols)
    out = out.filter(F.col("DateTime").isNotNull())
    out = drop_full_row_dups(out, num_cols=num_cols)
    return out
