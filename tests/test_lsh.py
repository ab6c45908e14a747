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


def test_sim_lsh_clusters_equals_exact_closure(spark):
    """The composed embedding-dedup path (hyperplane bands → exact
    cosine verify → star-contraction closure) must equal the exact
    recursive-CTE closure on a planted fixture. Planted clusters sit at
    cos ≥ 0.99 (per-pair banded catch ≥ 0.999 — deterministic here:
    seeded planes), negatives at cos ≤ 0.5, threshold 0.7 far from
    every planted cosine so a float ulp can't flip membership."""
    import duckdb

    from pyspark.sql import functions as F

    from bigdata_electricity_spark.operators.graph import connected_components
    from bigdata_electricity_spark.operators.lsh import lsh_near_dup_pairs

    def v(**kw):
        out = [0.0] * 8
        for k, val in kw.items():
            out[int(k[1:])] = val
        return out

    vecs = [
        (1, v(p0=1.0, p1=0.05)),
        (2, v(p0=1.0, p2=0.05)),
        (3, v(p0=1.0, p1=0.04, p2=0.04)),
        (10, v(p1=1.0, p2=0.1)),
        (11, v(p1=2.0, p2=0.2)),          # same direction: cos = 1
        (20, v(p3=1.0, p4=0.10)),
        (21, v(p3=1.0, p4=0.12)),
        (30, v(p5=1.0)),
        (31, v(p5=1.0, p6=1.8)),          # cos ≈ 0.49 < 0.7: no edge
        (40, v(p7=1.0)),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vec]) for i, vec in vecs],
        "vec_id long, embedding array<float>",
    )
    pairs = lsh_near_dup_pairs(df, dim=8, k_bits=16, bands=4, threshold=0.7)
    nodes = df.select(F.col("vec_id").alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(nodes, edges)
    got = {r["id"]: r["component"] for r in cc.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)",
                    [(i, [float(x) for x in vec]) for i, vec in vecs])
    oracle = dict(con.execute("""
        WITH RECURSIVE edges AS (
            SELECT a.vec_id AS s, b.vec_id AS d
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                           z -> z[1] * z[2]))
                  / (sqrt(list_sum(list_transform(a.embedding, x -> x*x)))
                     * sqrt(list_sum(list_transform(b.embedding, x -> x*x))))
                  >= 0.7
        ), sym AS (
            SELECT s, d FROM edges UNION ALL SELECT d AS s, s AS d FROM edges
        ), reach AS (
            SELECT vec_id AS id, vec_id AS comp FROM embeddings
            UNION
            SELECT sym.d AS id, reach.comp
            FROM reach JOIN sym ON sym.s = reach.id
            WHERE reach.comp < sym.d
        )
        SELECT id, MIN(comp) AS component FROM reach GROUP BY id
    """).fetchall())

    assert got == oracle
    assert oracle[2] == 1 and oracle[3] == 1      # cluster A closed
    assert oracle[11] == 10 and oracle[21] == 20  # scale-invariant + tight pair
    assert oracle[30] == 30 and oracle[31] == 31 and oracle[40] == 40


def test_scaled_bits_recall_on_planted_pairs(planted):
    """The n-scaled signature (sim_lsh_hyperplane_scaled's shape: 8
    bands × ⌈log₂(n/64)⌉-floored bits) must still catch planted
    near-identical pairs (cos ≈ 0.99): per-band collision shrinks with
    bits, but 8 bands at this angle keep the any-band catch ≥ 0.99."""
    n = planted.count()
    bits = max(4, math.ceil(math.log2(max(n, 128) / 64.0)))
    got = {(r["id_a"], r["id_b"])
           for r in lsh_near_dup_pairs(planted, dim=DIM, k_bits=8 * bits,
                                       bands=8, threshold=0.95).collect()}
    planted_pairs = {(2 * i, 2 * i + 1) for i in range(20)}
    assert len(got & planted_pairs) >= 18
    assert len(got - planted_pairs) <= 2


def test_minhash_signature_law():
    """lsh_signature_for (r10 VERDICT task 1): the law must (a) yield the
    certified (32, 8) operating point everywhere the recall table was
    measured (docs/RECALL_DENSITY.md — up to 10⁷ distinct docs), (b)
    sharpen one row per band per decade past that, and (c) satisfy the
    banded recall bound 1−(1−J_tʳ)ᵇ ≥ 0.98 at J_t = 0.8 for EVERY corpus
    size, including the sharpened regimes."""
    from bigdata_electricity_spark.operators.dedup import lsh_signature_for

    for n in (1, 1000, 50_000, 500_000, 5_000_000, 10_000_000):
        assert lsh_signature_for(n) == (32, 8), n
    for n, r_want in ((10_000_001, 5), (100_000_001, 6), (1_000_000_001, 7)):
        h, b = lsh_signature_for(n)
        r = h // b
        assert r == r_want and h == r * b, (n, h, b)
        assert 1 - (1 - 0.8 ** r) ** b >= 0.98, (n, r, b)
    # the certified point satisfies the bound too
    assert 1 - (1 - 0.8 ** 4) ** 8 >= 0.98
    # pinned second-decade operating point: at a 10⁸-doc footer count the
    # law yields r=5, b re-solved from the recall bound (= 10 → 50
    # hashes) — the exact signature the composed path would run with
    # there (r11 VERDICT task 6; exercised end-to-end below)
    assert lsh_signature_for(100_000_000) == (50, 10)


@pytest.mark.heavy
def test_composed_dedup_exercises_sharpened_signature(spark):
    """r11 VERDICT task 6: the law had never been EXERCISED above r=4 —
    this runs lsh_dedup_clusters with a synthetic 10⁸ footer count
    (n_docs is metadata, not a row count, so a planted corpus drives
    the r=5/b=10 signature path end-to-end) and asserts the partition
    still equals the exact closure: banding/bucketing/verify must hold
    at 50 hashes, and the J=0.82-per-hop chain still co-clusters (the
    sharpened S-curve keeps per-pair catch ≥ 0.98 at J ≥ 0.8 by the
    bound the signature is solved from)."""
    from bigdata_electricity_spark.operators.dedup import lsh_dedup_clusters

    t = [f"t{i}" for i in range(40)]
    x = [f"x{i}" for i in range(12)]
    docs = [
        (1, " ".join(t)),
        (2, " ".join(t[:36] + x[0:4])),       # J=36/44≈0.82 with 1
        (3, " ".join(t[:32] + x[0:8])),       # chain hop
        (10, " ".join(f"u{i}" for i in range(20))),
        (11, " ".join(f"u{i}" for i in range(20))),  # exact duplicate
        (40, "lonely single document vocabulary entirely its own here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in lsh_dedup_clusters(df, threshold=0.6,
                                    n_docs=100_000_000).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 40: 40}
