"""Semantics tests for the corpus-science entries: the BPE merge fold
on planted words (the greedy left-to-right edge cases) and segment-dedup
reconstruction round-trips.
"""

from __future__ import annotations

import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import REGISTRY
from bigdata_electricity_spark.plans.corpus_queries import _bpe_merge_step

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "word,lhs,rhs,want",
    [
        ("aaaa", "a", "a", "aa aa"),  # greedy: merged pair can't re-fuse this round
        ("aaa", "a", "a", "aa a"),
        ("aab", "a", "a", "aa b"),
        ("banana", "a", "n", "b an an a"),
        ("abb", "a", "b", "ab b"),
        ("x", "a", "b", "x"),  # 1-symbol word: fold returns the element
        ("ab", "b", "a", "a b"),  # pair order matters
    ],
)
def test_bpe_fold_greedy_semantics(spark, word, lhs, rhs, want):
    df = spark.createDataFrame([(word,)], ["word"]).select(
        F.split(F.trim(F.regexp_replace("word", "(.)", "$1 ")), " ").alias("syms")
    )
    out = df.select(
        F.aggregate(
            F.col("syms"), F.lit(""), _bpe_merge_step(F.lit(lhs), F.lit(rhs))
        ).alias("sym")
    ).collect()[0]["sym"]
    assert out == want


def test_bpe_merges_deterministic_and_distinct(spark):
    rows = REGISTRY["vocab_bpe_merges"].fn(spark, SF_DIR).collect()
    assert [r["merge_round"] for r in rows] == [1, 2, 3]
    merges = [(r["lhs"], r["rhs"]) for r in rows]
    assert len(set(merges)) == 3  # a merged pair can't be the best again
    for r in rows:
        assert r["merged"] == r["lhs"] + r["rhs"]
        assert r["pair_count"] > 0


def test_segment_dedup_reconstruction_roundtrip(spark):
    """Docs that keep all segments must reconstruct to their exact text
    (fingerprint equality), and kept counts must match a pandas dedup."""
    out = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_segment_exact"].fn(spark, SF_DIR).collect()
    }
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    import hashlib

    seen: set[str] = set()
    # first-occurrence order is (doc_id, seg_idx) — iterate in that order
    for _, row in docs.sort_values("doc_id").iterrows():
        toks = row["text"].split(" ")
        segs = [" ".join(toks[i : i + 16]) for i in range(0, len(toks), 16)]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        got = out[row["doc_id"]]
        assert got["n_segs"] == len(segs)
        assert got["n_kept"] == len(kept)
        want_fp = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert got["kept_fp"] == want_fp
        if len(kept) == len(segs):
            # no segment lost -> reconstruction is the original text
            assert hashlib.md5(row["text"].encode()).hexdigest() == want_fp


def test_bigram_perplexity_matches_python(spark):
    """Recompute the interpolated bigram LM and per-doc perplexity in
    pure Python and compare the top-10 selection."""
    import collections
    import math

    rows = REGISTRY["text_bigram_perplexity"].fn(spark, SF_DIR).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cvw: collections.Counter = collections.Counter()
    uni: collections.Counter = collections.Counter()
    seqs = {}
    for _, r in docs.iterrows():
        t = r["text"].split(" ")
        seqs[r["doc_id"]] = t
        uni.update(t)
        cvw.update(zip(t, t[1:]))
    cv = collections.Counter()
    for (v, _), c in cvw.items():
        cv[v] += c
    n = sum(uni.values())
    ppl = {}
    for did, t in seqs.items():
        nll = [
            -math.log(0.8 * cvw[(v, w)] / cv[v] + 0.2 * uni[w] / n)
            for v, w in zip(t, t[1:])
        ]
        ppl[did] = (
            len(nll),
            math.floor(math.exp(sum(nll) / len(nll)) * 1e4 + 0.5) / 1e4,
        )
    want = sorted(ppl.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]
    got = [(r["doc_id"], (r["n_bigrams"], r["ppl"])) for r in rows]
    assert got == want
