"""Boundary-tie sweep (round 7): the r6 bug generalized.

Round 6's only defect was a boundary-tie inversion (`session_window`
merges at exactly-gap distance; the oracle split) that stayed invisible
because ns-precision testdata never lands two events exactly on a
semantic boundary. This sweep plants EXACT collisions on every
boundary-sensitive convention in the registry — as-of strictness,
range-join inclusivity, window-bucket half-openness, RANGE-frame
inclusive bounds, strict funnel ordering, gap thresholds, zero-duration
TWAP spans, hour-run adjacency, week-offset cutoffs, and same-instant
session-boundary ties — and checks each entry against its own DuckDB
oracle with the driver-compare replica, plus hand-computed structural
assertions so a "both engines wrong the same way" regression can't pass
silently.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

from bigdata_electricity_spark.plans import REGISTRY
from tests.conftest import skip_unless_default_tier

B = dt.datetime(2024, 6, 1, 0, 0, 0)


def _s(sec: float) -> dt.datetime:
    return B + dt.timedelta(seconds=sec)


def _events_rows():
    """One compact events table with a planted exact collision for each
    boundary convention under test. (eid, ts, uid, type, value)."""
    return [
        # user 10 — as-of strictness: click and purchase at the SAME
        # instant must NOT match (both directions are strict).
        (100, _s(1000), 10, "click", 1.0),
        (101, _s(2000), 10, "click", 1.0),
        (102, _s(2000), 10, "purchase", 1.0),   # ties e101 exactly
        (103, _s(5000), 10, "purchase", 1.0),
        # user 11 — range join: delta == 60 s included, 61 s excluded,
        # same-instant pair excluded (strict lower bound).
        (110, _s(0), 11, "view", 1.0),
        (111, _s(60), 11, "view", 1.0),
        (112, _s(121), 11, "view", 1.0),
        (113, _s(300), 11, "view", 1.0),
        (114, _s(300), 11, "view", 2.0),
        (115, _s(330), 11, "view", 1.0),
        # user 12 — funnel strict ordering: click AT the first view and
        # purchase AT the first qualifying click must not count; the
        # later click/purchase complete the funnel.
        (120, _s(0), 12, "view", 1.0),
        (121, _s(0), 12, "click", 1.0),         # ties first view
        (122, _s(600), 12, "click", 1.0),
        (123, _s(600), 12, "purchase", 1.0),    # ties first counted click
        (124, _s(1200), 12, "purchase", 1.0),
        # user 13 — view only (funnel stage-1-only control).
        (130, _s(0), 13, "view", 1.0),
        # user 14 — gap thresholds: exactly 3600.0 s is NOT > 3600;
        # 3600.5 s is (and floors to max_gap_sec 3600 — the truncation
        # vs threshold distinction).
        (140, _s(0), 14, "view", 1.0),
        (141, _s(3600), 14, "view", 1.0),
        (142, _s(3600 + 3600.5), 14, "view", 1.0),
        # user 15 — TWAP: the same-instant pair is a zero-duration span
        # (dropped on both engines); only the 10 s span carries weight.
        (150, _s(0), 15, "view", 10.0),
        (151, _s(0), 15, "view", 20.0),
        (152, _s(10), 15, "view", 30.0),
        # user 16 — same-instant tie AT a manual-session boundary: the
        # flag=1 row and its same-ts successor must land in the same new
        # session (the cumsum-order class from ADVICE r6).
        (160, _s(0), 16, "view", 1.0),
        (161, _s(1801), 16, "view", 1.0),
        (162, _s(1801), 16, "view", 1.0),
        # user 17 — hour-run adjacency: ...:59:59.999999 and the next
        # exact hour are CONSECUTIVE hour indexes (one run); hour 2 is
        # skipped so hour 3 starts a second run.
        (170, _s(3599.999999), 17, "view", 1.0),
        (171, _s(3600), 17, "view", 1.0),
        (172, _s(3 * 3600 + 10), 17, "view", 1.0),
        # user 18 — bucket half-openness: an event exactly at a 10-min
        # boundary belongs to the window STARTING there, its ...:09:59.99
        # neighbor to the previous one.
        (180, _s(599.999999), 18, "view", 1.0),
        (181, _s(600), 18, "view", 1.0),
        # user 19 — week-offset cutoff: activity exactly 7 days after
        # the cohort day is week 1; 6d23:59:59 is still week 0.
        (190, _s(0), 19, "view", 1.0),
        (191, _s(7 * 86400 - 1), 19, "view", 1.0),
        (192, _s(7 * 86400), 19, "view", 1.0),
        # user 20 — point-in-time frame edges: a feature event exactly
        # 24h before the purchase is INSIDE cnt_24h, 24h+1s is outside,
        # and a sub-second-earlier event in the SAME epoch second is
        # outside the frame but visible to lag (fractional .75 seconds
        # also exercise the floor-vs-round epoch trap).
        (200, _s(9 * 86400 + 100.75), 20, "view", 1.0),
        (201, _s(9 * 86400 + 99.75), 20, "view", 2.0),
        (202, _s(10 * 86400 + 100.25), 20, "view", 3.0),
        (205, _s(10 * 86400 + 100.75), 20, "purchase", 99.0),
        # user 21 — CDC latest-wins tie: two versions at the identical
        # max timestamp; the higher event_id is the live row.
        (210, _s(100), 21, "view", 1.0),
        (211, _s(200), 21, "view", 5.0),
        (212, _s(200), 21, "view", 7.0),
        # user 22 — attribution ties: first-event purchase is 'direct';
        # a purchase at the same instant as a click (higher event_id)
        # IS attributed to that click.
        (220, _s(0), 22, "purchase", 1.0),
        (221, _s(10), 22, "click", 1.0),
        (222, _s(10), 22, "purchase", 1.0),
        # user 23 — SCD2 same-instant state change: view→click at one
        # timestamp still yields two runs (event_id orders the stream).
        (230, _s(50), 23, "view", 1.0),
        (231, _s(50), 23, "click", 1.0),
        # user 24 — retention cutoff: the last microsecond of Jan 14 is
        # pruned with its partition; midnight Jan 15 exactly survives.
        (240, dt.datetime(2024, 1, 14, 23, 59, 59, 999999), 24, "view", 1.0),
        (241, dt.datetime(2024, 1, 15, 0, 0, 0), 24, "view", 1.0),
        # user 25 — PSI edges: last second of the reference window vs
        # first second of the comparison window (inclusive date bounds),
        # value exactly at the 50-unit bin edge, and the bin-9 cap.
        (250, dt.datetime(2024, 1, 7, 23, 59, 59), 25, "view", 49.99),
        (251, dt.datetime(2024, 1, 22, 0, 0, 0), 25, "view", 50.0),
        (252, dt.datetime(2024, 1, 22, 0, 0, 1), 25, "view", 1000.0),
    ]


ENTRIES = [
    "asof_join_click_to_purchase",
    "asof_join_click_next_purchase",
    "range_join_event_pairs",
    "funnel_view_click_purchase",
    "events_tumbling_10min",
    "events_sliding_10min_5min",
    "hypertable_rollup",
    "events_user_gaps",
    "events_twap_by_user",
    "resample_events_hourly_ohlc",
    "intervals_user_active_runs",
    "events_sessionization",
    "user_engagement_segments",
    "cohort_retention_weekly",
    "featurestore_pit_features",
    "cdc_latest_state",
    "attribution_last_touch",
    "scd2_event_intervals",
    "events_locf_gap_fill",
    "retention_prune_days",
    "drift_psi_value",
]


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tie_events")
    pd.DataFrame(
        [(eid, ts, uid, et, v, "{}") for eid, ts, uid, et, v in _events_rows()],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(os.path.join(d, "events.parquet"), coerce_timestamps="us")
    return str(d)


@pytest.fixture(scope="module")
def duck_con(tie_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tie_dir}/events.parquet'")
    return con


@pytest.mark.parametrize("name", ENTRIES)
def test_tie_fixture_spark_matches_oracle(spark, tie_dir, duck_con, name):
    from parity import compare_one

    err = compare_one(spark, duck_con, REGISTRY[name], tie_dir)
    assert err is None or err.startswith("ok:"), (name, err)


ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings", "partsupp"]


def _single_table_entries(table: str, exclude=()):
    """Every oracled entry whose oracle touches ONLY ``table`` —
    auto-enrolled so future entries inherit the edge sweeps without
    listing themselves. (The curated ENTRIES list above keeps the
    per-convention documentation; these nets catch the rest.)"""
    import re

    others = [t for t in ALL_TABLES if t != table]
    out = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        # sql-text twins register EVERY table as a temp view up front
        # (their point is the spark.sql surface), so they need a full
        # fixture directory regardless of which tables the query reads.
        if "sqltext" in name:
            continue
        sql = spec.oracle.lower()
        if table not in sql:
            continue
        if any(re.search(r"\b" + t + r"\b", sql) for t in others):
            continue
        if name not in exclude:
            out.append(name)
    return sorted(out)


def _events_only_entries():
    return _single_table_entries("events", exclude=ENTRIES)


@pytest.mark.parametrize("name", _events_only_entries())
def test_tie_fixture_events_wide_net(spark, tie_dir, duck_con, name):
    """Wide net: every other events-only oracled entry must survive the
    planted-collision fixture and still match its oracle — same-instant
    rows, sub-second offsets, exact window/threshold edges, and the
    sparse multi-month span are exactly the inputs SF testdata never
    produces (this class caught the OHLC ord-key overflow)."""
    skip_unless_default_tier(name)
    from parity import compare_one

    err = compare_one(spark, duck_con, REGISTRY[name], tie_dir)
    assert err is None or err.startswith("ok:"), (name, err)


def test_asof_ties_are_strict(spark, tie_dir):
    back = {r.event_id: r for r in
            REGISTRY["asof_join_click_to_purchase"].fn(spark, tie_dir).collect()}
    # purchase e102 (ts == click e101) attributes to the EARLIER click.
    assert back[102].gap_sec == 1000
    assert back[103].gap_sec == 3000  # most recent click strictly before
    fwd = {r.event_id: r for r in
           REGISTRY["asof_join_click_next_purchase"].fn(spark, tie_dir).collect()}
    assert fwd[100].gap_sec == 1000   # earliest strictly-later purchase
    assert fwd[101].gap_sec == 3000   # skips the same-instant purchase


def test_range_join_bounds(spark, tie_dir):
    pairs = {(r.id_a, r.id_b): r.delta_sec for r in
             REGISTRY["range_join_event_pairs"].fn(spark, tie_dir)
             .filter("user_id = 11").collect()}
    assert pairs == {(110, 111): 60, (113, 115): 30, (114, 115): 30}


def test_funnel_tie_rows_do_not_advance_stage(spark, tie_dir):
    row = REGISTRY["funnel_view_click_purchase"].fn(spark, tie_dir).collect()[0]
    # viewers: users 11..21, 23..25 (10 and 22 have no view) = 14; only
    # user 12 has a click strictly after its first view and a purchase
    # strictly after that click — the tie rows alone (view-ts click for
    # 23, click-ts purchase for 12/22) never advance a stage.
    assert (row.n_view, row.n_view_click, row.n_view_click_purchase) == (14, 1, 1)


def test_gap_threshold_strict_and_floor(spark, tie_dir):
    g = {r.user_id: r for r in
         REGISTRY["events_user_gaps"].fn(spark, tie_dir).collect()}
    assert g[14].n_gaps == 2
    assert g[14].n_gaps_over_1h == 1        # 3600.0 is not > 3600
    assert g[14].max_gap_sec == 3600        # floor(3600.5)


def test_twap_zero_duration_span_dropped(spark, tie_dir):
    t = {r.user_id: r for r in
         REGISTRY["events_twap_by_user"].fn(spark, tie_dir).collect()}
    assert t[15].n_spans == 1 and abs(t[15].twap - 20.0) < 1e-9


def test_session_boundary_same_instant_pair_stays_together(spark, tie_dir):
    s = [(r.session_id, r.n_events) for r in
         REGISTRY["events_sessionization"].fn(spark, tie_dir)
         .filter("user_id = 16").collect()]
    assert s == [(1, 1), (2, 2)], s  # both ts-tied rows in session 2


def test_hour_runs_merge_on_adjacency(spark, tie_dir):
    r = {x.user_id: x for x in
         REGISTRY["intervals_user_active_runs"].fn(spark, tie_dir).collect()}
    assert (r[17].n_runs, r[17].active_hours, r[17].longest_run) == (2, 3, 2)


def test_tumbling_boundary_event_starts_new_window(spark, tie_dir):
    rows = {r.window_start: r.n_events for r in
            REGISTRY["events_tumbling_10min"].fn(spark, tie_dir).collect()}
    # e180 at 00:09:59.999999 → 00:00 window; e181 at 00:10:00 → 00:10.
    assert rows["2024-06-01 00:00:00"] >= 1
    assert rows["2024-06-01 00:10:00"] >= 1
    # the same-instant boundary event is in exactly one tumbling window:
    total_uid18 = sum(
        1 for eid, ts, uid, *_ in _events_rows() if uid == 18
    )
    assert total_uid18 == 2  # fixture sanity


def test_cohort_week_offset_cutoff(spark, tie_dir):
    rows = REGISTRY["cohort_retention_weekly"].fn(spark, tie_dir).collect()
    offsets = {r.week_offset for r in rows if str(r.cohort_day) == "2024-06-01"}
    assert {0, 1} <= offsets  # day 7 lands in week 1, day 6.99 in week 0


def test_pit_frame_edges_and_same_second_exclusion(spark, tie_dir):
    r = {x.user_id: x for x in
         REGISTRY["featurestore_pit_features"].fn(spark, tie_dir).collect()}[20]
    # cnt_24h counts ONLY the exactly-24h-old event (24h+1s is out;
    # the same-second event is outside the es-1 frame edge)...
    assert r.avg_cnt_24h == 1.0
    # ...while lag, on full-precision (ts, event_id), sees the
    # same-second event as the last observed value.
    assert r.avg_last_val == 3.0
    assert (r.n_purchases, r.max_prior_events) == (1, 3)


def test_cdc_latest_tie_resolves_by_event_id(spark, tie_dir):
    r = {x.user_id: x for x in
         REGISTRY["cdc_latest_state"].fn(spark, tie_dir).collect()}[21]
    assert (r.last_value, r.n_versions) == (7.0, 3)


def test_attribution_same_instant_click_counts(spark, tie_dir):
    got = {r.channel: r.n_purchases for r in
           REGISTRY["attribution_last_touch"].fn(spark, tie_dir).collect()}
    # direct: user 22's first-event purchase. click: users 10 (×2),
    # 12 (×2), and 22's same-instant-as-click purchase. view: user 20.
    assert got == {"direct": 1, "click": 5, "view": 1}


def test_scd2_same_instant_state_change_is_two_runs(spark, tie_dir):
    rows = [r for r in REGISTRY["scd2_event_intervals"].fn(spark, tie_dir).collect()
            if r.user_id == 23]
    assert [(r.run_id, r.state, r.n_events) for r in rows] == [
        (1, "view", 1), (2, "click", 1)]
    assert rows[0].valid_to == rows[1].valid_from  # zero-length interval
    assert rows[1].valid_to == "current"


def test_retention_prunes_partition_strictly_before_cutoff(spark, tie_dir):
    days = {str(r.day): r.n_events for r in
            REGISTRY["retention_prune_days"].fn(spark, tie_dir).collect()}
    assert "2024-01-14" not in days          # last-µs-of-day pruned with its dir
    assert days["2024-01-15"] == 1           # midnight-exactly survives


ORDERS_D0 = dt.datetime(2024, 3, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def orders_tie_dir(tmp_path_factory):
    """Orders fixture for the RANGE-interval frame: customer 1 has two
    orders exactly 90 days apart (inclusive frame edge), customer 2 two
    orders 91 days apart (outside)."""
    rows = [
        (1, 1, "O", 100.0, ORDERS_D0, "1-URGENT"),
        (2, 1, "O", 50.0, ORDERS_D0 + dt.timedelta(days=90), "1-URGENT"),
        (3, 2, "O", 10.0, ORDERS_D0, "1-URGENT"),
        (4, 2, "O", 20.0, ORDERS_D0 + dt.timedelta(days=91), "1-URGENT"),
    ]
    d = tmp_path_factory.mktemp("tie_orders")
    pd.DataFrame(rows, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]).to_parquet(os.path.join(d, "orders.parquet"), coerce_timestamps="us")
    return str(d)


def test_range_frame_90d_edge_inclusive(spark, orders_tie_dir):
    from parity import compare_one

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{orders_tie_dir}/orders.parquet'"
    )
    spec = REGISTRY["range_frame_trailing_spend"]
    err = compare_one(spark, con, spec, orders_tie_dir)
    assert err is None or err.startswith("ok:"), err
    got = {r.o_orderkey: r.trailing_90d_spend
           for r in spec.fn(spark, orders_tie_dir).collect()}
    # exactly-90-days-earlier is INSIDE the trailing frame; 91 is not.
    assert got == {1: 100.0, 2: 150.0, 3: 10.0, 4: 20.0}


def test_psi_window_and_bin_edges(spark, tie_dir):
    rows = {r.bin: r for r in
            REGISTRY["drift_psi_value"].fn(spark, tie_dir).collect()}
    # Only user 25's 23:59:59-Jan-7 event is in the reference period, so
    # with bins {0, 1, 9} present (k=3) the smoothed reference shares
    # are exactly (1+1)/(1+3) for bin 0 and 1/4 elsewhere — pinning the
    # inclusive date bounds, the 50-exactly bin edge, and the bin-9 cap.
    assert set(rows) == {0, 1, 9}
    assert rows[0].p_a == 0.5
    assert rows[1].p_a == 0.25 and rows[9].p_a == 0.25


@pytest.fixture(scope="module")
def orders_edge_dir(tmp_path_factory):
    """Orders fixture for calendar-edge conventions: a Sunday/Monday
    pair straddling the week-truncation boundary, and open orders at
    exactly the 30/90/365-day aging-bucket edges (snapshot day set by a
    closed order so it never enters the backlog itself)."""
    today = dt.datetime(2024, 6, 30)
    rows = [
        (10, 1, "F", 100.0, dt.datetime(2024, 3, 3), "1-URGENT"),   # Sunday
        (11, 1, "F", 200.0, dt.datetime(2024, 3, 4), "1-URGENT"),   # Monday
        (12, 1, "F", 300.0, today, "1-URGENT"),                     # snapshot
        (20, 2, "O", 10.0, today - dt.timedelta(days=30), "2-HIGH"),
        (21, 2, "O", 20.0, today - dt.timedelta(days=31), "2-HIGH"),
        (22, 2, "O", 30.0, today - dt.timedelta(days=90), "2-HIGH"),
        (23, 2, "O", 40.0, today - dt.timedelta(days=91), "2-HIGH"),
        (24, 2, "O", 50.0, today - dt.timedelta(days=365), "2-HIGH"),
        (25, 2, "O", 60.0, today - dt.timedelta(days=366), "2-HIGH"),
        # net plants (dates avoid the week/aging assertion windows):
        # a zero price (Benford leading digit, Gini), a same-customer
        # same-day price tie, an exact cross-customer price tie, and a
        # priority group with two EQUAL values (zero within-group
        # variance — the t-test/z-test denominators' worst case).
        (30, 3, "F", 0.0, dt.datetime(2024, 4, 10), "3-MEDIUM"),
        (31, 3, "F", 500.0, dt.datetime(2024, 4, 10), "3-MEDIUM"),
        (32, 4, "F", 500.0, dt.datetime(2024, 4, 11), "3-MEDIUM"),
        (33, 5, "F", 123.45, dt.datetime(2024, 5, 5), "4-NOT SPECIFIED"),
        (34, 5, "F", 123.45, dt.datetime(2024, 5, 6), "4-NOT SPECIFIED"),
        (35, 6, "F", 99999999.99, dt.datetime(2024, 5, 20), "5-LOW"),
    ]
    d = tmp_path_factory.mktemp("edge_orders")
    pd.DataFrame(rows, columns=[
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]).to_parquet(os.path.join(d, "orders.parquet"), coerce_timestamps="us")
    return str(d)


@pytest.fixture(scope="module")
def orders_edge_con(orders_edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{orders_edge_dir}/orders.parquet'"
    )
    return con


def test_week_trunc_sunday_monday_split(spark, orders_edge_dir, orders_edge_con):
    from parity import compare_one

    spec = REGISTRY["growth_weekly_revenue"]
    err = compare_one(spark, orders_edge_con, spec, orders_edge_dir)
    assert err is None or err.startswith("ok:"), err
    weeks = {str(r.week_start): r.n_orders for r in
             spec.fn(spark, orders_edge_dir).collect()}
    # Both engines truncate weeks to MONDAY: Sun Mar 3 belongs to the
    # week of Feb 26, Mon Mar 4 starts its own week.
    assert weeks["2024-02-26"] == 1 and weeks["2024-03-04"] == 1


def test_aging_bucket_edges_inclusive_upper(spark, orders_edge_dir, orders_edge_con):
    from parity import compare_one

    spec = REGISTRY["warehouse_backlog_aging"]
    err = compare_one(spark, orders_edge_con, spec, orders_edge_dir)
    assert err is None or err.startswith("ok:"), err
    got = {r.age_bucket: (r.n_orders, r.backlog_value) for r in
           spec.fn(spark, orders_edge_dir).collect()}
    # age <= 30 / <= 90 / <= 365 are inclusive: each exact-edge order
    # stays in the lower bucket, edge+1 falls through.
    assert got == {
        "0-030d": (1, 10.0),       # exactly 30 days old
        "031-090d": (2, 50.0),     # 31 and exactly 90
        "091-365d": (2, 90.0),     # 91 and exactly 365
        "366d+": (1, 60.0),        # 366
    }


@pytest.fixture(scope="module")
def lineitem_edge_dir(tmp_path_factory):
    """Full-schema lineitem fixture. Prices: 101 sorted values v[0..100]
    put quantile position q*(n-1) at integer indexes — p01 = v[1] = 1.0,
    p99 = v[99] = 9999.99 — so the clip predicate's strictness at the
    fence is observable, and the top pair straddles the 10k histogram
    bin edge. Other columns plant: the TPC-H q1 shipdate boundary
    (1998-09-02 inclusive vs 09-03), the q6 year window edge
    (1994-12-31 vs 1995-01-01) with discounts exactly at the BETWEEN
    0.05/0.07 bounds and a quantity exactly 24 (strict < 24), a
    zero-quantity line, one NULL l_tax, and shared part/order keys
    dense enough for basket/graph entries."""
    rows = []
    vals = [float(i) for i in range(99)] + [9999.99, 10000.0]
    ships = [dt.datetime(1994, 3, 15), dt.datetime(1994, 12, 31),
             dt.datetime(1995, 1, 1), dt.datetime(1998, 9, 2),
             dt.datetime(1998, 9, 3)]
    for i, v in enumerate(vals):
        rows.append((
            i // 3,                       # l_orderkey: ~3 lines per order
            i % 7,                        # l_partkey
            i % 3,                        # l_suppkey
            i % 3 + 1,                    # l_linenumber
            0.0 if i == 0 else (24.0 if i % 5 == 0 else float(i % 50) + 1),
            v,                            # l_extendedprice (fence ladder)
            [0.05, 0.06, 0.07, 0.0][i % 4],
            None if i == 50 else (0.0 if i % 2 else 0.04),
            "A",                          # single flag (winsorize assert)
            "O" if i % 2 else "F",
            ships[i % 5],
        ))
    d = tmp_path_factory.mktemp("edge_lineitem")
    pd.DataFrame(rows, columns=[
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ]).to_parquet(os.path.join(d, "lineitem.parquet"), coerce_timestamps="us")
    return str(d)


@pytest.fixture(scope="module")
def lineitem_edge_con(lineitem_edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{lineitem_edge_dir}/lineitem.parquet'"
    )
    return con


def test_winsorize_fence_values_not_clipped(spark, lineitem_edge_dir, lineitem_edge_con):
    from parity import compare_one

    spec = REGISTRY["transform_winsorize"]
    err = compare_one(spark, lineitem_edge_con, spec, lineitem_edge_dir)
    assert err is None or err.startswith("ok:"), err
    r = spec.fn(spark, lineitem_edge_dir).collect()[0]
    # strict </>: only 0.0 (< p01=1.0) and 10000.0 (> p99=9999.99) clip;
    # the values sitting exactly ON both fences survive unclipped.
    assert (r.n_rows, r.n_clipped) == (101, 2)


def test_histogram_bin_edge(spark, lineitem_edge_dir, lineitem_edge_con):
    from parity import compare_one

    spec = REGISTRY["histogram_price_bins"]
    err = compare_one(spark, lineitem_edge_con, spec, lineitem_edge_dir)
    assert err is None or err.startswith("ok:"), err
    bins = {r.bin: r for r in spec.fn(spark, lineitem_edge_dir).collect()}
    assert bins[0].n == 100 and bins[0].bin_max == 9999.99
    assert bins[1].n == 1 and bins[1].bin_min == 10000.0  # exact edge → bin 1


@pytest.fixture(scope="module")
def docs_edge_dir(tmp_path_factory):
    """Documents fixture of tokenizer/dedup pathologies real corpora
    contain and SF testdata never does: empty and whitespace-only
    texts, a zero-entropy single-token repeat, unicode, punctuation
    soup, a case variant that collides with its original only AFTER
    normalization, an exact cross-source duplicate, and a long
    all-distinct-token doc. n_chars stays consistent with the text."""
    base = "the quick brown fox jumps over the lazy dog"
    near = "the quick brown fox leaps over the lazy dog"
    rows = [
        (0, base, "en", "src0"),
        (1, base, "en", "src1"),                       # exact cross-source dup
        (2, "", "en", "src0"),                         # empty text
        (3, "   ", "en", "src0"),                      # whitespace only
        (4, "hello", "en", "src0"),                    # single token
        (5, "spam spam spam spam spam spam", "en", "src1"),  # zero entropy
        (6, "héllo wörld ça va bien 日本語 テスト", "fr", "src2"),
        (7, "!!! ??? ... ;;; :::", "de", "src2"),      # punctuation soup
        (8, " ".join(f"tok{i}" for i in range(500)), "es", "src3"),
        (9, near, "en", "src1"),                       # near-dup of 0
        (10, base.title(), "zh", "src3"),              # case variant of 0
        (11, "a\tb\nc d", "en", "src4"),               # tab/newline whitespace
    ]
    d = tmp_path_factory.mktemp("edge_docs")
    pd.DataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def docs_edge_con(docs_edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{docs_edge_dir}/documents.parquet'"
    )
    return con


# multimodal_frame_sample's oracle has a DOCUMENTED ASCII precondition
# (DuckDB md5/substring are VARCHAR-only, so the SQL twin hashes char
# windows; the entry asserts the precondition loudly at runtime and the
# multibyte byte-split path is covered by a Python-md5 unit test) — the
# unicode doc in this fixture violates it by design.
_DOCS_NET_SKIP = {"multimodal_frame_sample"}


@pytest.mark.parametrize(
    "name", _single_table_entries("documents", exclude=_DOCS_NET_SKIP)
)
def test_docs_edge_spark_matches_oracle(spark, docs_edge_dir, docs_edge_con, name):
    skip_unless_default_tier(name)
    from parity import compare_one

    err = compare_one(spark, docs_edge_con, REGISTRY[name], docs_edge_dir)
    assert err is None or err.startswith("ok:"), (name, err)


def test_frame_sample_ascii_precondition_is_loud(spark, docs_edge_dir):
    """The one docs-net exclusion must FAIL FAST on a non-ASCII corpus
    (assert, not silent wrong answers) — pin that contract."""
    with pytest.raises(AssertionError, match="ASCII"):
        REGISTRY["multimodal_frame_sample"].fn(spark, docs_edge_dir).collect()


@pytest.fixture(scope="module")
def emb_edge_dir(tmp_path_factory):
    """Embeddings fixture with the vectors that break naive cosine
    math: the all-zero vector (norm 0), exact duplicates (similarity
    ties), an antipodal pair, denormal-scale and huge-scale vectors,
    plus a spread of deterministic dense vectors."""
    import math

    dim = 64

    def dense(i):
        return [math.sin(0.7 * i + 0.31 * j) for j in range(dim)]

    rows = [
        (0, [0.0] * dim, 0),                            # zero vector
        (1, [1.0] + [0.0] * (dim - 1), 1),              # e0
        (2, [1.0] + [0.0] * (dim - 1), 1),              # exact dup of e0
        (3, [-1.0] + [0.0] * (dim - 1), 2),             # antipodal
        # scale spread stays inside the engine's documented rounding
        # domain (|x|·10ⁿ < 2⁵³, functions/rounding.py): distances over
        # 1e2-scale vectors round exactly at every n the entries use;
        # 1e10-scale would push hround's floor past LONG range.
        (4, [1e-30] * dim, 3),                          # denormal scale
        (5, [1e2] * dim, 4),                            # large scale
    ] + [(i, dense(i), i % 10) for i in range(6, 24)]
    d = tmp_path_factory.mktemp("edge_emb")
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def emb_edge_con(emb_edge_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{emb_edge_dir}/embeddings.parquet'"
    )
    return con


@pytest.mark.parametrize("name", _single_table_entries("embeddings"))
def test_embeddings_edge_spark_matches_oracle(spark, emb_edge_dir, emb_edge_con, name):
    skip_unless_default_tier(name)
    from parity import compare_one

    err = compare_one(spark, emb_edge_con, REGISTRY[name], emb_edge_dir)
    assert err is None or err.startswith("ok:"), (name, err)


@pytest.mark.parametrize("name", _single_table_entries("orders"))
def test_orders_edge_spark_matches_oracle(spark, orders_edge_dir, orders_edge_con, name):
    skip_unless_default_tier(name)
    from parity import compare_one

    err = compare_one(spark, orders_edge_con, REGISTRY[name], orders_edge_dir)
    assert err is None or err.startswith("ok:"), (name, err)


@pytest.mark.parametrize("name", _single_table_entries("lineitem"))
def test_lineitem_edge_spark_matches_oracle(spark, lineitem_edge_dir, lineitem_edge_con, name):
    skip_unless_default_tier(name)
    from parity import compare_one

    err = compare_one(spark, lineitem_edge_con, REGISTRY[name], lineitem_edge_dir)
    assert err is None or err.startswith("ok:"), (name, err)


def _multi_table_entries():
    """Every oracled entry whose oracle touches 2+ tables, plus the
    sql-text twins (they register all views) — the remaining surface
    the single-table nets can't reach."""
    import re

    out = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        sql = spec.oracle.lower()
        hit = [t for t in ALL_TABLES if re.search(r"\b" + t + r"\b", sql)]
        if len(hit) >= 2 or "sqltext" in name:
            out.append(name)
    return sorted(out)


@pytest.fixture(scope="module")
def warehouse_edge_dir(tmp_path_factory):
    """Coherent mini-warehouse: the REAL sf0.001 tables plus the
    relational edges SF generators never produce — a customer with no
    orders (anti/semi/outer join paths and q22 dormancy become
    non-vacuous), a duplicate customer NAME with an exact acctbal tie,
    an order with no lineitems, a part never ordered, an idle supplier
    with a negative balance."""
    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("edge_wh")
    extras = {
        "customer": [
            (999901, "Customer#NoOrders", 0, 0.0, "BUILDING"),
            (999902, "Customer#000000000", 1, 2095.23, "FURNITURE"),
        ],
        "orders": [
            (9999901, 0, "O", 777.77, dt.datetime(1995, 6, 15), "1-URGENT"),
        ],
        "part": [
            (999901, "never ordered widget", "Brand#99", "ECONOMY", 1, 0.01),
        ],
        "supplier": [
            (999901, "Supplier#Idle", 0, -999.99),
        ],
    }
    for t in ALL_TABLES:
        if t == "partsupp":
            continue  # not shipped in testdata
        base = pd.read_parquet(f"{src}/{t}.parquet")
        if t in extras:
            base = pd.concat(
                [base, pd.DataFrame(extras[t], columns=list(base.columns))],
                ignore_index=True,
            )
        base.to_parquet(os.path.join(d, f"{t}.parquet"), coerce_timestamps="us")
    return str(d)


@pytest.fixture(scope="module")
def warehouse_edge_con(warehouse_edge_dir):
    from parity import oracle_connection

    return oracle_connection(warehouse_edge_dir)


@pytest.mark.parametrize("name", _multi_table_entries())
def test_warehouse_edge_spark_matches_oracle(
    spark, warehouse_edge_dir, warehouse_edge_con, name
):
    skip_unless_default_tier(name)
    from parity import compare_one

    err = compare_one(spark, warehouse_edge_con, REGISTRY[name], warehouse_edge_dir)
    assert err is None or err.startswith("ok:"), (name, err)


def test_warehouse_plants_are_non_vacuous(warehouse_edge_dir):
    """The planted relational edges must really be edges — otherwise
    the net silently degrades to a second sf0.001 parity run."""
    con = duckdb.connect()
    d = warehouse_edge_dir
    one = lambda q: con.execute(q).fetchone()[0]  # noqa: E731
    assert one(f"SELECT COUNT(*) FROM '{d}/orders.parquet' WHERE o_custkey = 999901") == 0
    assert one(f"SELECT COUNT(*) FROM '{d}/lineitem.parquet' WHERE l_orderkey = 9999901") == 0
    assert one(f"SELECT COUNT(*) FROM '{d}/orders.parquet' WHERE o_orderkey = 9999901") == 1
    assert one(f"SELECT COUNT(*) FROM '{d}/lineitem.parquet' WHERE l_partkey = 999901") == 0
    assert one(f"SELECT COUNT(*) FROM '{d}/customer.parquet' "
               "WHERE c_name = 'Customer#000000000'") == 2  # duplicate name tie


# ---------------------------------------------------------------------------
# r13 optimization guard: decon_embedding_topk BLAS prune is lossless
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def decon_tie_dir(tmp_path_factory):
    """Embeddings with DUPLICATED eval vectors (eids 13 and 26 are
    bit-identical): every corpus vector's cosine to them is EXACTLY
    equal, so the per-vector argmax is decided purely by the min-eid
    tie-break. The r13 BLAS prescore must retain BOTH tied eval
    candidates (a prune that keeps only numpy's first argmax would pick
    whichever eid happened to be collected first and break the
    tie-break)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64

    def dense(i):
        return [math.sin(0.7 * i + 0.31 * j) for j in range(dim)]

    shared = dense(999)
    rows = []
    for i in range(30):
        if i % 13 == 0:
            rows.append((i, [0.0] * dim if i == 0 else shared))
        else:
            rows.append((i, dense(i)))
    d = tmp_path_factory.mktemp("decon_tie_emb")
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    })
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    return str(d)


def test_decon_embedding_prune_preserves_eid_tiebreak(spark, decon_tie_dir):
    out = REGISTRY["decon_embedding_topk"].fn(spark, decon_tie_dir).collect()
    assert out, "queue must not be empty"
    # eids 13 and 26 are identical vectors; 0 is the zero vector
    # (excluded by the denom > 0 guard) — every argmax must be eid 13.
    assert all(r["eval_id"] == 13 for r in out), out


def test_decon_embedding_tie_fixture_matches_oracle(spark, decon_tie_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{decon_tie_dir}/embeddings.parquet'"
    )
    from parity import compare_one

    err = compare_one(spark, con, REGISTRY["decon_embedding_topk"], decon_tie_dir)
    assert err is None or err.startswith("ok:"), err
