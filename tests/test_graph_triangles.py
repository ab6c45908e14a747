"""DOULION triangle-estimate twin: p=1 degeneracy, band accuracy, entry.

The approximate twin (graph_triangle_doulion) must be provably tied to
the exact profile: with sample_mod=1 the deterministic hash gate keeps
every edge, so the sampled graph IS the graph and the estimator reduces
to the exact count; with p>=2 the scaled estimate must land inside a
stated band on a fixture dense enough for the variance bound
(Var(T-hat) ~ T*p^3) to be percent-level, and the band asserted here is
reproducible because the "coin" is xxhash64, not an RNG.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_electricity_spark.operators.similarity import (
    pairwise_near_dups,
    pairwise_near_dups_sampled,
)
from bigdata_electricity_spark.plans.similarity_queries import (
    _triangle_profile,
    graph_triangle_doulion,
    graph_triangle_stats_scaled,
)


def _clustered_embeddings(spark, n_clusters: int, per_cluster: int):
    """Planted near-dup corpus: each cluster is a tight cone of vectors
    (pairwise cosine ~1 within, ~orthogonal across), so the near-dup
    graph at threshold 0.3 is exactly n_clusters disjoint cliques."""
    rows = []
    dim = 8
    for c in range(n_clusters):
        axis = c % dim
        for m in range(per_cluster):
            v = [0.0] * dim
            v[axis] = 1.0
            # tiny deterministic wiggle on a DIFFERENT axis keeps the
            # vectors distinct without leaving the cone
            v[(axis + 1) % dim] = 0.01 * (m + 1)
            rows.append((c * per_cluster + m, v, str(c)))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def test_sampled_p1_equals_unsampled(spark):
    emb = _clustered_embeddings(spark, n_clusters=6, per_cluster=5)
    exact = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in pairwise_near_dups(emb, threshold=0.3).collect()
    }
    sampled = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in pairwise_near_dups_sampled(emb, threshold=0.3, sample_mod=1).collect()
    }
    assert sampled == exact and len(exact) == 6 * 10  # 6 cliques of C(5,2)


def test_sampled_is_exact_subset_gated_by_hash(spark):
    """The p=3 sample must be EXACTLY the hash-selected subset of the
    exact pair relation — same cosines, no extra pairs, gate a pure
    function of (id_a, id_b, seed)."""
    emb = _clustered_embeddings(spark, n_clusters=6, per_cluster=6)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in pairwise_near_dups(emb, threshold=0.3).collect()
    }
    kept = {
        (ia, ib): c
        for (ia, ib), c in exact.items()
        if spark.sql(
            f"SELECT pmod(xxhash64(CAST({ia} AS BIGINT), CAST({ib} AS BIGINT), 7), 3) = 0 AS k"
        ).first()["k"]
    }
    sampled = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in pairwise_near_dups_sampled(
            emb, threshold=0.3, sample_mod=3
        ).collect()
    }
    assert sampled == kept
    assert 0 < len(sampled) < len(exact)


def test_doulion_estimate_within_band(spark):
    """40 planted K8 cliques -> 2240 triangles exactly; the p=2 DOULION
    estimate must land within +/-35% (generous vs the ~17% stddev the
    variance bound gives at this support, and reproducible because the
    sample is hash-deterministic)."""
    emb = _clustered_embeddings(spark, n_clusters=40, per_cluster=8)
    p = 2
    exact_edges = pairwise_near_dups(emb, threshold=0.3).select(
        F.col("id_a").alias("s"), F.col("id_b").alias("d")
    )
    exact = _triangle_profile(spark, exact_edges).first()
    assert exact["n_triangles"] == 40 * math.comb(8, 3)

    sampled_edges = pairwise_near_dups_sampled(
        emb, threshold=0.3, sample_mod=p
    ).select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
    prof = _triangle_profile(spark, sampled_edges).first()
    est_tri = prof["n_triangles"] * p**3
    est_edges = prof["n_edges"] * p
    assert abs(est_tri - exact["n_triangles"]) <= 0.35 * exact["n_triangles"], (
        est_tri,
        exact["n_triangles"],
    )
    assert abs(est_edges - exact["n_edges"]) <= 0.2 * exact["n_edges"]


@pytest.mark.heavy
def test_entry_schema_and_consistency(spark):
    """The registry entry must expose raw sampled support next to the
    scaled estimates, with the scaling identities holding exactly."""
    row = graph_triangle_doulion(spark, "/root/testdata/sf0.001").first()
    p = row["sample_mod"]
    assert p >= 2
    assert row["est_edges"] == row["sampled_edges"] * p
    assert row["est_triangles"] == row["sampled_triangles"] * p**3
    assert row["est_wedges"] == row["sampled_wedges"] * p**2
    if row["sampled_wedges"]:
        want = math.floor(
            3.0 * row["sampled_triangles"] * p / row["sampled_wedges"] * 1e6 + 0.5
        ) / 1e6
        assert row["est_clustering_coeff"] == pytest.approx(want)
    # the sampled edge relation is a subset of the exact twin's
    exact = graph_triangle_stats_scaled(spark, "/root/testdata/sf0.001").first()
    assert row["sampled_edges"] <= exact["n_edges"]
