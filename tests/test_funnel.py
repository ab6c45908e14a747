"""Funnel ordering semantics on planted out-of-order users."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdata_electricity_spark.plans.advanced_queries import funnel_view_click_purchase


def test_funnel_strict_ordering(spark, monkeypatch, tmp_path):
    # u1: view→click→purchase in order (full funnel)
    # u2: view, purchase, THEN click — click (t2) is after view (t0) so
    #     stage 2 passes, but the purchase (t1) precedes the first
    #     qualifying click → stage 3 fails
    # u3: click before any view — counts for view only (click at t0 < view)
    # u4: view only
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "view", 1.0, "{}"), (2, t(1), 1, "click", 1.0, "{}"),
        (3, t(2), 1, "purchase", 1.0, "{}"),
        (4, t(0), 2, "view", 1.0, "{}"), (5, t(1), 2, "purchase", 1.0, "{}"),
        (6, t(2), 2, "click", 1.0, "{}"),
        (7, t(1), 3, "view", 1.0, "{}"), (8, t(0), 3, "click", 1.0, "{}"),
        (9, t(0), 4, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out_dir = str(tmp_path / "events.parquet")
    df.write.parquet(out_dir)
    # The query loads f"{sf_dir}/events.parquet" — point sf_dir at tmp.
    got = funnel_view_click_purchase(spark, str(tmp_path)).first()
    assert got["n_view"] == 4
    assert got["n_view_click"] == 2   # u1 and u2 clicked strictly after a view
    assert got["n_view_click_purchase"] == 1  # only u1 purchased after that click
