"""Content-hash sampling/splitting/sharding must be partitioning-proof.

The whole point of the md5-derived draws (training_queries.py) is that
membership never changes when the data moves — across engines (the
DuckDB oracle checks that), across runs, and across REPARTITIONINGS
(checked here, since no oracle can see Spark's physical layout).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_electricity_spark.plans import REGISTRY
from bigdata_electricity_spark.sources.loaders import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_split_assignment_survives_repartition(spark):
    # Same doc -> same split regardless of physical layout. randomSplit
    # fails this exact test; the md5 draw must not.
    base = _rows(REGISTRY["split_hash_deterministic"].fn(spark, SF_DIR))

    import bigdata_electricity_spark.plans.training_queries as tq

    docs = load_table(spark, SF_DIR, "documents").repartition(17, "source")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("s"), F.col("doc_id").cast("string"))), 1, 6),
            16,
            10,
        ).cast("long")
        / F.lit(16777216.0)
    )
    split = F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split")
    reparted = _rows(
        docs.select("source", split)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )
    assert reparted == base
    assert tq is not None


def test_split_fractions_are_roughly_80_10_10(spark):
    rows = REGISTRY["split_hash_deterministic"].fn(spark, SF_DIR).collect()
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["split"]] = totals.get(r["split"], 0) + r["n_docs"]
    n = sum(totals.values())
    assert n > 0
    # Loose bounds — sf0.001 is only ~50 docs; the draw is uniform, not
    # stratified, so just assert the ordering and non-degeneracy.
    assert totals.get("train", 0) > totals.get("val", 0)
    assert totals.get("train", 0) > totals.get("test", 0)
    assert totals.get("train", 0) >= int(0.6 * n)


def test_shard_assignment_is_total_and_balanced(spark):
    out = REGISTRY["corpus_shard_assignment"].fn(spark, SF_DIR).collect()
    n_docs_total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs_total  # total: no doc lost
    assert all(0 <= r["shard"] < 32 for r in out)
    # Balance at tiny SF is noisy; assert no shard hogs the corpus.
    assert max(r["n_docs"] for r in out) <= max(4, n_docs_total // 4)


def test_bernoulli_sample_is_subset_and_rate_ordered(spark):
    sampled = {
        r["source"]: r["n_sampled"]
        for r in REGISTRY["sample_hash_bernoulli"].fn(spark, SF_DIR).collect()
    }
    per_source = {
        r["source"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sampled  # non-degenerate
    for src, n in sampled.items():
        assert 0 < n <= per_source[src]
    # Even sources sample at 50%, odd at 10% — aggregate rates must
    # reflect that ordering.
    even = sum(n for s, n in sampled.items() if int(s[3:]) % 2 == 0)
    even_total = sum(n for s, n in per_source.items() if int(s[3:]) % 2 == 0)
    odd = sum(n for s, n in sampled.items() if int(s[3:]) % 2 == 1)
    odd_total = sum(n for s, n in per_source.items() if int(s[3:]) % 2 == 1)
    assert even / even_total > odd / odd_total
