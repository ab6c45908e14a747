"""Single-pass pipeline metrics via ``DataFrame.observe``.

A curation pipeline needs to report what it dropped (docs in/out, bytes
kept, per-stage survival) — but at 100 TB every extra ``count()`` is a
full re-scan. ``observe`` attaches aggregate metrics to a plan node;
they are computed AS A SIDE EFFECT of whatever action the caller runs
next, costing zero additional jobs (the reference's profiling, by
contrast, runs 6+ separate count jobs — SURVEY §4.3.2, the anti-pattern
this exists to avoid at the pipeline level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observe_stage(df: DataFrame, name: str, *metrics) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to this point of the plan.

    Returns (df, observation); read ``observation.get`` AFTER the first
    action on the returned DataFrame. Default metrics: row count.
    """
    obs = Observation(name)
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(obs, *metrics), obs
