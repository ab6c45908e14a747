"""Sketch aggregates: estimates must sit within their error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_electricity_spark.plans import REGISTRY
from bigdata_electricity_spark.sources.loaders import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_within_bounds(spark):
    got = REGISTRY["sketch_approx_stats"].fn(spark, SF_DIR).first()
    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))").alias("q"),
    ).first()
    # HLL++ at rsd=0.02: allow 3σ ≈ 6%.
    assert abs(got["approx_orders"] - exact["orders"]) <= 0.06 * exact["orders"]
    assert abs(got["approx_parts"] - exact["parts"]) <= 0.06 * exact["parts"]
    # KLL accuracy=10000 → rank error ~1e-4; compare by value within 1%.
    for approx, true in zip(got["price_quantiles"], exact["q"]):
        assert abs(approx - true) <= 0.01 * abs(true)


def test_shard_merge_union_equals_direct(spark):
    """HLL union over per-day sub-sketches must equal the direct
    single-pass sketch (lossless mergeability — the property that makes
    pre-aggregated daily sketches usable for arbitrary later rollups)."""
    got = REGISTRY["sketch_shard_merge"].fn(spark, SF_DIR).first()
    assert got["merged_distinct_users"] == got["direct_distinct_users"]
    assert got["n_daily_sketches"] >= 1
    # Default lgConfigK=12 on ~15 distinct keys: estimate is near-exact.
    exact = got["exact_distinct_users"]
    assert abs(got["merged_distinct_users"] - exact) <= max(1, 0.05 * exact)


def test_bloom_prefilter_no_false_negatives_and_sane_fp(spark):
    # Bloom filters may only err in one direction: every true member
    # must pass (n_true_members == n_members and pass ⊇ members), and
    # the FP rate should sit near the textbook (1-e^(-kn/m))^k ≈ 4.5%
    # for n=75, m=496, k=4 — an order-of-magnitude corridor guards the
    # hash spread without overfitting exact counts.
    from bigdata_electricity_spark.plans import REGISTRY

    r = REGISTRY["sketch_bloom_prefilter"].fn(spark, "/root/testdata/sf0.01").collect()[0]
    assert r.n_true_members == r.n_members
    assert r.n_pass == r.n_true_members + r.n_false_positives
    assert 0.0 < r.fp_rate < 0.15


def test_countmin_never_undercounts(spark):
    # CMS error is one-sided: min-over-rows of colliding counters can
    # only exceed the true count. Per-user check, not just the summary.
    import pyspark.sql.functions as F

    from bigdata_electricity_spark.plans import REGISTRY

    r = REGISTRY["sketch_countmin_user_counts"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_keys > 0
    # One-sided error: the SMALLEST observed overestimate is still ≥ 0.
    assert r.min_overestimate >= 0
    assert r.max_overestimate >= r.min_overestimate
    assert 0 <= r.n_exact <= r.n_keys


def test_rolling_7d_sketch_twin_tracks_exact(spark):
    """r12 VERDICT task 3: the HLL twin of the rolling-WAU entry must
    emit the SAME window set, the EXACT n_events per window (sums
    merge losslessly), and a distinct-user estimate within 5% of the
    exact count per window (default lgk=12 → ~1.6% rse; 5% is the
    conservative gate the quantile-bound test uses)."""
    from bigdata_electricity_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.01"
    exact = {
        r["window_start"]: (r["distinct_users"], r["n_events"])
        for r in REGISTRY["events_rolling_7d_distinct_users"].fn(spark, sf).collect()
    }
    sketch = {
        r["window_start"]: (r["distinct_users_est"], r["n_events"])
        for r in REGISTRY["events_rolling_7d_distinct_users_sketch"].fn(spark, sf).collect()
    }
    assert sketch.keys() == exact.keys()
    assert len(exact) > 7
    for ws, (du, ne) in exact.items():
        est, ne2 = sketch[ws]
        assert ne2 == ne, f"{ws}: n_events {ne2} != exact {ne}"
        assert abs(est - du) / du <= 0.05, f"{ws}: est {est} vs exact {du}"
