"""Hyperplane-LSH: recall of planted near-duplicates vs exhaustive truth."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from bigdata_electricity_spark.functions.vectors import cosine_similarity
from bigdata_electricity_spark.operators.lsh import hyperplanes, lsh_near_dup_pairs

DIM = 16


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _jitter(v, rng, eps=0.05):
    out = [x + rng.gauss(0, eps) for x in v]
    n = math.sqrt(sum(x * x for x in out))
    return [x / n for x in out]


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(7)
    rows = []
    # 20 base vectors, each with one jittered near-duplicate (cos ≈ 0.99+),
    # plus 60 unrelated vectors.
    for i in range(20):
        base = _unit(rng)
        rows.append((2 * i, base, 0))
        rows.append((2 * i + 1, _jitter(base, rng), 0))
    for j in range(60):
        rows.append((100 + j, _unit(rng), 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_hyperplanes_deterministic():
    assert hyperplanes(DIM, 8, seed=1) == hyperplanes(DIM, 8, seed=1)
    assert hyperplanes(DIM, 8, seed=1) != hyperplanes(DIM, 8, seed=2)


def test_lsh_recall_on_planted_pairs(planted):
    got = {(r["id_a"], r["id_b"])
           for r in lsh_near_dup_pairs(planted, dim=DIM, k_bits=16, bands=8,
                                       threshold=0.95).collect()}
    planted_pairs = {(2 * i, 2 * i + 1) for i in range(20)}
    # Banding (8 bands × 2 bits) collides near-identical vectors with
    # probability ≈ 1; require ≥90% recall of the planted pairs.
    assert len(got & planted_pairs) >= 18
    # Precision: the verify step filters candidates at cos ≥ 0.95; random
    # 16-dim vectors essentially never reach that.
    assert len(got - planted_pairs) <= 2


def test_lsh_verifies_with_exact_cosine(spark, planted):
    # Every returned pair's cosine must match the exact pairwise cosine.
    pairs = lsh_near_dup_pairs(planted, dim=DIM, k_bits=16, bands=8, threshold=0.95)
    a = planted.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = planted.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    joined = pairs.join(a, "id_a").join(b, "id_b").select(
        "cosine", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("exact")
    )
    bad = joined.filter(F.col("cosine") != F.col("exact")).count()
    assert bad == 0
