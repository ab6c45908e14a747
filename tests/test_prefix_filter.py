"""Prefix-filtered candidate generation (operators/dedup.py, r8).

The scale twins claim an exact property: same-block prefix-filtered
pairs EQUAL the blocked baseline's pairs (recall 1 by the both-prefixes
pigeonhole, verification exact). These tests pin that equality on the
real testdata and on planted adversarial cases (near-threshold pairs,
hot tokens, lopsided sizes) where a broken prefix bound would first
lose a pair.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_electricity_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
    prefix_filtered_containment_pairs,
    prefix_filtered_jaccard_pairs,
)
from bigdata_electricity_spark.sources.loaders import load_table

SF_DIR = "/root/testdata/sf0.001"


def _pairs_set(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


@pytest.mark.parametrize("threshold", [0.5, 0.6, 0.8])
def test_jaccard_prefix_equals_blocked(spark, threshold):
    docs = load_table(spark, SF_DIR, "documents")
    base = ngram_jaccard_pairs(docs, block_cols=["source"], threshold=threshold)
    pref = prefix_filtered_jaccard_pairs(
        docs, block_cols=["source"], threshold=threshold
    )
    lhs = _pairs_set(base, ["id_a", "id_b"])
    rhs = _pairs_set(pref, ["id_a", "id_b"])
    assert lhs == rhs
    assert len(lhs) > 0  # non-vacuous on the real corpus


@pytest.mark.parametrize("threshold", [0.7, 0.8])
def test_containment_prefix_equals_blocked(spark, threshold):
    docs = load_table(spark, SF_DIR, "documents")
    base = containment_pairs(docs, block_cols=["source"], threshold=threshold)
    pref = prefix_filtered_containment_pairs(
        docs, block_cols=["source"], threshold=threshold
    )
    cols = ["containee_id", "container_id"]
    lhs = _pairs_set(base, cols)
    rhs = _pairs_set(pref, cols)
    assert lhs == rhs
    assert len(lhs) > 0


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_jaccard_prefix_planted_edges(spark):
    # Planted adversarial set: an exact-threshold pair (J = 3/5 = 0.6),
    # a just-below pair, identical twins, a hot token shared by all, and
    # a lopsided pair killed by the size-ratio prune alone.
    texts = [
        "hot a b c d",        # 0
        "hot a b c e",        # 1: J(0,1) = 4/6 = 0.667 >= 0.6
        "hot a b x y",        # 2: J(0,2) = 3/7 < 0.6
        "hot a b c d",        # 3: identical to 0
        "hot p q r s t u v w x y z a b c d e f g",  # 4: lopsided vs 0
    ]
    docs = _docs(spark, texts)
    got = _pairs_set(
        prefix_filtered_jaccard_pairs(docs, threshold=0.6), ["id_a", "id_b"]
    )
    # brute-force truth
    toks = [set(t.split()) for t in texts]
    want = {
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if len(toks[i] & toks[j]) / len(toks[i] | toks[j]) >= 0.6
    }
    assert got == want
    assert (0, 3) in got and (0, 1) in got and (0, 2) not in got


def test_containment_prefix_planted_edges(spark):
    # A short doc fully inside a long one (containment 1.0, Jaccard
    # tiny), an exact-threshold 4/5 containee, and a sub-threshold case.
    texts = [
        "a b c d",                    # 0
        "a b c d e f g h i j k l m",  # 1: C(0->1) = 1.0
        "a b c x y",                  # 2: C(2->1)=3/5 <0.8; C(0->2)=3/4<0.8
        "a b c d x",                  # 3: C(3->1) = 4/5 = 0.8 exactly
    ]
    docs = _docs(spark, texts)
    got = _pairs_set(
        prefix_filtered_containment_pairs(docs, threshold=0.8),
        ["containee_id", "container_id"],
    )
    toks = [set(t.split()) for t in texts]

    def orient(i, j):
        # containee = smaller set, ties to the lower id
        if (len(toks[i]), i) <= (len(toks[j]), j):
            return i, j
        return j, i

    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = orient(i, j)
            if len(toks[a] & toks[b]) / len(toks[a]) >= 0.8:
                want.add((a, b))
    assert got == want
    assert (0, 1) in got and (3, 1) in got and (2, 1) not in got


def test_prefix_plans_have_no_cartesian(spark):
    docs = load_table(spark, SF_DIR, "documents")
    for df in (
        prefix_filtered_jaccard_pairs(docs, block_cols=["source"], threshold=0.6),
        prefix_filtered_containment_pairs(docs, block_cols=["source"], threshold=0.8),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# incremental_jaccard_flags (r10): batch-vs-corpus flags
# ---------------------------------------------------------------------------


def _flags_map(df):
    return {r["id"]: (r["n_matches"], round(r["best_jaccard"], 4), r["is_dup"])
            for r in df.collect()}


def test_incremental_flags_planted(spark):
    # corpus: two docs; batch: an exact dup, a near-dup >= 0.6, a doc
    # below threshold, and a doc of tokens the corpus has never seen
    # (df=0 rank path).
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "q r s t u v w x y z")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "a b c d e f g h i j"),   # J=1.0 with doc 1
            (11, "a b c d e f g h i k"),   # J=9/11=0.8181 with doc 1
            (12, "a b c m n o p zz yy xx"),  # J=3/17 with doc 1 — below
            (13, "n1 n2 n3 n4 n5"),        # all tokens unseen by corpus
        ],
        "doc_id long, text string",
    )
    from bigdata_electricity_spark.operators.dedup import incremental_jaccard_flags

    got = _flags_map(incremental_jaccard_flags(corpus, batch, threshold=0.6))
    assert got[10] == (1, 1.0, True)
    assert got[11] == (1, 0.8182, True)
    assert got[12] == (0, 0.0, False)
    assert got[13] == (0, 0.0, False)
    assert set(got) == {10, 11, 12, 13}  # every batch doc reported


def test_incremental_flags_equal_bruteforce_on_corpus(spark):
    # On the real sf0.001 corpus (same-source blocking, doc_id%7 split),
    # the prefix-filtered incremental path must equal a brute-force
    # batch x corpus join: recall 1, exact verify.
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    from bigdata_electricity_spark.operators.dedup import incremental_jaccard_flags

    got = _flags_map(
        incremental_jaccard_flags(corpus, batch, block_cols=["source"], threshold=0.6)
    )

    def toks(df):
        from bigdata_electricity_spark.operators.text import normalize_text
        return df.select(
            "doc_id", "source",
            F.array_distinct(F.split(normalize_text(F.col("text")), " ")).alias("t"),
        )
    b, c = toks(batch).alias("b"), toks(corpus).alias("c")
    inter = F.size(F.array_intersect(F.col("b.t"), F.col("c.t")))
    union = F.size(F.col("b.t")) + F.size(F.col("c.t")) - inter
    j = inter.cast("double") / union.cast("double")
    brute = (
        b.join(c, F.col("b.source") == F.col("c.source"))
        .select(F.col("b.doc_id").alias("id"), j.alias("j"))
        .filter(F.col("j") >= 0.6)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("j").alias("bj"))
    )
    want = {r["id"]: (r["n"], round(r["bj"], 4), True) for r in brute.collect()}
    flagged = {k: v for k, v in got.items() if v[2]}
    assert flagged == want
    assert len(want) > 0  # non-vacuous
    # clean docs all report zeros
    assert all(v == (0, 0.0, False) for k, v in got.items() if k not in want)


def test_incremental_flags_degenerate_inputs(spark):
    from bigdata_electricity_spark.operators.dedup import incremental_jaccard_flags

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    empty = docs.filter("doc_id < 0")
    # empty batch -> empty output, schema intact
    out = incremental_jaccard_flags(docs, empty, threshold=0.6)
    assert out.count() == 0
    assert out.columns == ["id", "n_matches", "best_jaccard", "is_dup"]
    # empty corpus -> every batch doc clean (df=0 rank path end-to-end)
    got = _flags_map(incremental_jaccard_flags(empty, docs, threshold=0.6))
    assert got == {1: (0, 0.0, False), 2: (0, 0.0, False)}


@pytest.mark.heavy
def test_index_param_mismatch_rejected(spark):
    """An index built at one threshold/blocking cannot silently serve
    another (r10 ADVICE): prefix lengths are ⌈(1−t)·n⌉+1 at BUILD time,
    so a looser serve threshold would lose recall — it must raise."""
    from bigdata_electricity_spark.operators.dedup import (
        build_incremental_index,
        incremental_flags_from_index,
    )

    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    batch = spark.createDataFrame([(10, "a b c d e")], "doc_id long, text string")
    index = build_incremental_index(corpus, threshold=0.8)
    assert index["threshold"] == 0.8 and index["block_cols"] == []
    # matching parameters serve fine
    got = _flags_map(incremental_flags_from_index(index, batch, threshold=0.8))
    assert got[10] == (1, 1.0, True)
    with pytest.raises(ValueError, match="threshold"):
        incremental_flags_from_index(index, batch, threshold=0.6)
    with pytest.raises(ValueError, match="block_cols"):
        incremental_flags_from_index(index, batch, block_cols=["source"],
                                     threshold=0.8)
    # a TIGHTER serve threshold is recall-safe (build prefixes are a
    # superset of what the tighter bound needs) and must be allowed,
    # with the exact verify applying the serve value (r11 ADVICE);
    # float noise within tolerance of the build value must also serve.
    loose = build_incremental_index(corpus, threshold=0.6)
    near_b = spark.createDataFrame(
        [(11, "a b c d x"), (12, "a b c d e")], "doc_id long, text string"
    )
    tight = _flags_map(incremental_flags_from_index(loose, near_b, threshold=0.8))
    assert tight[11] == (0, 0.0, False)   # J=4/6≈0.667 < 0.8 — dropped
    assert tight[12] == (1, 1.0, True)
    noisy = _flags_map(
        incremental_flags_from_index(loose, near_b, threshold=0.6 - 1e-12)
    )
    assert noisy[11] == (1, 0.6667, True)
    # a legacy index dict without recorded parameters still serves
    legacy = {k: index[k] for k in ("tok_df", "prefix", "arrays")}
    got = _flags_map(incremental_flags_from_index(legacy, batch, threshold=0.6))
    assert got[10][2] is True


@pytest.mark.heavy
def test_incremental_flags_property_random_corpora(spark):
    """Random token-set corpora: the prefix-filtered incremental path
    must equal a driver-side brute force at every threshold — the case
    a broken prefix/α bound (recall < 1) or df=0 rank path would fail
    first."""
    from hypothesis import example, given, settings, strategies as st

    from bigdata_electricity_spark.operators.dedup import incremental_jaccard_flags

    token = st.integers(0, 11)  # small alphabet -> dense overlaps
    doc = st.lists(token, min_size=1, max_size=8, unique=True)

    # Planted @examples: identical docs, prefix-boundary J (exactly at
    # threshold), singleton-token docs, batch tokens fully unseen.
    @settings(max_examples=8, deadline=None)
    @example([[0, 1, 2, 3, 4]], [[0, 1, 2, 3, 4]], 0.6)
    @example([[0, 1, 2, 3, 4]], [[0, 1, 2]], 0.6)   # J=3/5=0.6 boundary
    @example([[5]], [[5], [6]], 0.5)
    @example([[0, 1]], [[10, 11]], 0.5)
    @given(
        st.lists(doc, min_size=1, max_size=6),
        st.lists(doc, min_size=1, max_size=6),
        st.sampled_from([0.5, 0.6, 0.8]),
    )
    def prop(corpus_toks, batch_toks, threshold):
        def text(ts):
            return " ".join(f"w{t}" for t in ts)

        corpus = spark.createDataFrame(
            [(i, text(ts)) for i, ts in enumerate(corpus_toks)],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [(100 + i, text(ts)) for i, ts in enumerate(batch_toks)],
            "doc_id long, text string",
        )
        got = _flags_map(incremental_jaccard_flags(corpus, batch, threshold=threshold))
        for i, bts in enumerate(batch_toks):
            b = set(bts)
            js = [
                len(b & set(cts)) / len(b | set(cts)) for cts in corpus_toks
            ]
            hits = [j for j in js if j >= threshold]
            want = (len(hits), round(max(hits), 4) if hits else 0.0, bool(hits))
            assert got[100 + i] == want, (bts, corpus_toks, threshold)

    prop()
