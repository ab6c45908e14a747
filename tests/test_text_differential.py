"""Differential test: text operators vs an independent Python oracle.

A seeded random ASCII corpus (100 docs) goes through the Spark
expressions AND a direct Python re-implementation; results must match
exactly. Catches regex-dialect drift (Java vs Python `\\w` both ASCII
here by construction) and normalization bugs in one sweep.
"""

from __future__ import annotations

import hashlib
import random
import re

import pytest
from pyspark.sql import functions as F

from bigdata_electricity_spark.operators import text as T
from bigdata_electricity_spark.operators.dedup import shingles

WORDS = ["the", "cat", "dog", "spark", "meter", "power", "and", "of", "run",
         "data", "fast", "slow", "x1", "grid_7", "volt"]
PUNCT = [",", ".", "!", "?", ";", "--"]


def _corpus(n: int = 100, seed: int = 1234) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        parts = []
        for _ in range(rng.randint(1, 30)):
            parts.append(rng.choice(WORDS))
            if rng.random() < 0.2:
                parts.append(rng.choice(PUNCT))
        sep = "  " if rng.random() < 0.1 else " "
        text = sep.join(parts)
        if rng.random() < 0.2:
            text = text.upper()
        docs.append((i, text))
    return docs


def _norm(t: str) -> str:
    return " ".join(t.lower().split())


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(_corpus(), ["doc_id", "text"])


def test_text_metrics_match_python(corpus_df):
    got = {
        r["doc_id"]: r
        for r in corpus_df.select(
            "doc_id",
            T.token_count(F.col("text")).alias("ws"),
            T.bpe_ish_token_count(F.col("text")).alias("bpe"),
            T.punct_ratio(F.col("text")).alias("punct"),
            T.fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    for doc_id, text in _corpus():
        g = got[doc_id]
        assert g["ws"] == len(re.findall(r"\S+", text)), (doc_id, text)
        assert g["bpe"] == len(re.findall(r"\w+|[^\w\s]", text, re.ASCII)), (doc_id, text)
        expected_punct = len(re.findall(r"[^\w\s]", text, re.ASCII)) / len(text)
        assert abs(g["punct"] - expected_punct) < 1e-12, (doc_id, text)
        expected_fp = hashlib.md5(_norm(text).encode()).hexdigest()
        assert g["fp"] == expected_fp, (doc_id, text)


def test_shingles_match_python(corpus_df):
    got = {
        r["doc_id"]: list(r["sh"])
        for r in corpus_df.select(
            "doc_id", shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    for doc_id, text in _corpus():
        toks = _norm(text).split(" ")
        if len(toks) < 3:
            expected = [" ".join(toks)]
        else:
            expected = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        assert got[doc_id] == expected, (doc_id, text)
