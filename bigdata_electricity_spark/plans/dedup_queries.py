"""Deduplication queries over documents (north-star extension).

Exact and Jaccard dedup are oracle-checked; MinHash-LSH and SimHash are
engine-specific signatures → rows-only checks (the driver records the
weaker check; the pair-generation semantics are unit-tested instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import (
    exact_dup_groups,
    incremental_jaccard_flags,
    lsh_dedup_clusters,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    prefix_filtered_containment_pairs,
    prefix_filtered_jaccard_pairs,
    simhash_near_dups,
)
from ..sources.loaders import load_table
from ..functions.rounding import dround, hround
from .registry import query

_DUCK_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    ORDER BY keep_id
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: content-hash groupBy with lowest-id
    representative. Shuffle key is the 16-byte hash, not the body."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_groups(docs).orderBy("keep_id")


@query(
    "dedup_summary",
    oracle="""
    SELECT COUNT(*) AS n_total,
           COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_unique
    FROM documents
    """,
)
def dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup rate: total vs content-distinct documents."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.text import fingerprint

    return docs.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct(fingerprint(F.col("text"))).alias("n_unique"),
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS t
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           floor((CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.t, b.t)))) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM toks a JOIN toks b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / len(list_distinct(list_concat(a.t, b.t))) >= 0.6
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs, blocked by source.

    Blocking bounds the self-join to same-source pairs — the all-pairs
    O(n²) never materializes (SURVEY north-star: candidate generation must
    be blocked/bucketed at scale).

    exact, small-data: the block key has FIXED cardinality, so block
    populations — and the per-block pair count, quadratically — grow
    with the corpus (r8 sf1 audit, docs/SCALING_SF1.md: 55× for 10×
    rows). Scale twin: `dedup_ngram_jaccard_prefix` (prefix-filtered
    global candidates, same exact verification).
    """
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, block_cols=["source"], threshold=0.6).orderBy(
        "id_a", "id_b"
    ).select("id_a", "id_b", hround("jaccard", 4).alias("jaccard"))


# Same oracle as dedup_ngram_jaccard — the prefix twin produces the
# IDENTICAL pair set (prefix filtering has recall 1, verification is
# exact), so the baseline's SQL certifies both plans.
_JACCARD_SRC_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split({_DUCK_NORM}, ' ')) AS t
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           floor((CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.t, b.t)))) * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM toks a JOIN toks b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
          / len(list_distinct(list_concat(a.t, b.t))) >= 0.6
    ORDER BY id_a, id_b
    """


@query("dedup_ngram_jaccard_prefix", oracle=_JACCARD_SRC_ORACLE)
def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard near-dup pairs with PPJoin-style prefix filtering —
    the scale twin of `dedup_ngram_jaccard` (r8 sf1 audit), producing
    the IDENTICAL same-source pair set under a plan whose candidate
    mass tracks true pairs instead of block².

    Candidate rule: tokens ranked by ascending GLOBAL document frequency
    (ties by hash); a pair is considered only if it shares a token in
    both docs' rarest-⌈(1−t)·n⌉+1 prefix AND the same block. Recall is
    provably 1 for ANY global token order (pigeonhole on the required
    overlap ⌈t·n⌉), verification is exact — so the twin shares the
    baseline's oracle verbatim, and the oracle may rank string tokens
    while Spark ranks xxhash64 longs.

    Why not drop the block and go global: measured r8 — this corpus is
    57% near-duplicate at t=0.6 (7.1M of 12.5M pairs at sf0.1), so the
    GLOBAL pair listing is itself Θ(n²) regardless of candidate scheme;
    on dense corpora the scalable global semantics are clusters
    (`dedup_cc_clusters` + `dedup_minhash_lsh`), not pairs. And why the
    baseline keeps its plan at bench SF: r6 measured source blocking
    within 1.4× of the true-pair floor at sf0.1 — prefix filtering wins
    only past the crossover the sf1 audit exposed (55× → the candidate
    side, 250M doomed same-source candidates vs ~40M here).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        prefix_filtered_jaccard_pairs(docs, block_cols=["source"], threshold=0.6)
        .select("id_a", "id_b", hround("jaccard", 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


_CONTAINMENT_BEST_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split({_DUCK_NORM}, ' ')) AS t
        FROM documents
    ), pairs AS (
        SELECT CASE WHEN len(a.t) <= len(b.t) THEN a.doc_id ELSE b.doc_id END AS containee_id,
               CASE WHEN len(a.t) <= len(b.t) THEN b.doc_id ELSE a.doc_id END AS container_id,
               CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
               / least(len(a.t), len(b.t)) AS containment
        FROM toks a JOIN toks b
          ON a.source = b.source AND a.doc_id < b.doc_id
    ), best AS (
        SELECT containee_id, container_id, containment,
               row_number() OVER (PARTITION BY containee_id
                   ORDER BY containment DESC, container_id) AS rn
        FROM pairs WHERE containment >= 0.8
    )
    SELECT containee_id, container_id,
           {dround('containment', 6)} AS containment
    FROM best WHERE rn = 1
    ORDER BY containee_id
    """


@query("dedup_containment_best_prefix", oracle=_CONTAINMENT_BEST_ORACLE)
def dedup_containment_best_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-container containment dedup with prefix-filtered candidates —
    the scale twin of `dedup_containment_best` (r8 sf1 audit), producing
    the IDENTICAL result (same oracle) under a candidate plan bounded by
    content instead of block².

    The containee's rarest-token prefix probes the container side's FULL
    postings (the asymmetric relation bounds only the containee — a tiny
    set can sit inside any huge one), restricted to the same source
    block, then exact verification and the same best-container pick (max
    containment, ties to the smallest container id). The per-token join
    fan-out is df(rare-token), not df(hot): prefixes prefer the globally
    rarest tokens by construction. Recall 1 by pigeonhole on the
    ⌈t·|A|⌉ required overlap.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = prefix_filtered_containment_pairs(
        docs, block_cols=["source"], threshold=0.8
    )
    w = Window.partitionBy("containee_id").orderBy(
        F.desc("containment"), F.col("container_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "containee_id",
            "container_id",
            hround("containment", 6).alias("containment"),
        )
        .orderBy("containee_id")
    )


def _curation_oracle() -> str:
    from .text_queries import _duck_lang_score, _LANG_CASE
    from ..operators.text import LANG_STOPWORDS

    best = "greatest(" + ", ".join(_duck_lang_score(lang) for lang in LANG_STOPWORDS) + ")"
    return _CURATION_ORACLE_TEMPLATE.format(best=best, lang_case=_LANG_CASE)


_CURATION_ORACLE_TEMPLATE = """
    WITH fps AS (
        SELECT doc_id, source, text,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    ), keep AS (
        SELECT doc_id, source, text,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fps
    ), scored0 AS (
        SELECT doc_id, source, text,
               floor((LEAST(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 50.0, 1.0) * 0.5
                      + (CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
                  THEN CAST(len(list_distinct(regexp_extract_all(text, '\\S+'))) AS DOUBLE)
                       / len(regexp_extract_all(text, '\\S+')) END) * 0.5) * 1000000.0 + 0.5) / 1000000.0 AS q,
               {best} AS best
        FROM keep WHERE rn = 1
    ), scored AS (
        SELECT doc_id, source, q,
               CASE WHEN best = 0 THEN 'und' {lang_case} ELSE 'und' END AS pl
        FROM scored0
    )
    SELECT source,
           COUNT(*) AS n_curated,
           floor((AVG(q)) * 10000.0 + 0.5) / 10000.0 AS avg_quality
    FROM scored
    WHERE q >= 0.5 AND pl <> 'und'
    GROUP BY source
    ORDER BY source
    """


@query("curation_pipeline", oracle=_curation_oracle())
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation flagship: exact-dedup (keep lowest id per
    content hash) → quality filter (rounded score ≥ 0.5) → language filter
    (lang-ID ≠ 'und') → per-source corpus stats, as ONE lazy plan.

    Physical shape: one shuffle on the 16-byte fingerprint (dedup window),
    everything else map-side projections + final per-source aggregate.
    The quality threshold compares the ROUNDED score on both engines so
    a ulp at exactly 0.5 can't flip membership.
    """
    from pyspark.sql import Window

    from ..operators.text import fingerprint, predict_language, quality_score

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            hround(quality_score(F.col("text")), 6).alias("q"),
            predict_language(F.col("text")).alias("pl"),
        )
        .filter((F.col("q") >= 0.5) & (F.col("pl") != "und"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_curated"),
            hround(F.avg("q"), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )


@query("dedup_minhash_lsh")  # rows-only: signatures are engine-specific (xxhash64 seeds)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: 32 hashes, 8 bands × 4 rows.

    shingle→minhash→band→bucket-join — the scalable near-dup shape. The
    xxhash64-seeded signature is deterministic within Spark but not
    reproducible in DuckDB → rows-only check; Jaccard recall is
    unit-tested on synthetic near-dups instead (tests/test_dedup.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs).orderBy("id_a", "id_b")


@query("dedup_lsh_clusters")  # rows-only: banded edges are xxhash64-seeded
def dedup_lsh_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL duplicate clusters, production path: MinHash bands →
    exact-Jaccard verify → star-contraction closure → per-doc cluster id
    + keeper flag.

    The composition the docs point 100 TB users at instead of a global
    pair listing (`dedup_ngram_jaccard*` outputs are Θ(n²·density)
    unblocked — measured 57% pair density on this corpus): candidate
    mass is band-bounded, edges are exactly verified (precision 1), the
    closure is O(log n) shuffle rounds, and the OUTPUT is one row per
    document. Rows-only (edges depend on xxhash64 band seeds); cluster-
    set equality to the exact recursive-CTE closure is pytest-proven on
    a planted fixture (tests/test_graph_cc.py).

    r11: identical-token-set docs contract to one representative before
    banding (exactly partition-preserving — see the operator docstring),
    and the signature size derives from the parquet footer row count
    (lsh_signature_for: r=4/b=8 at every tested SF, sharpening one row
    per band per decade past 10⁷ distinct docs to pin false-candidate
    mass against n² pair growth).

    r12: the candidate-pair relation is never materialized — per-bucket
    spanning edges + full-signature unions feed the closure, then ONE
    ints-only exhaustive cross-component bucket join certifies
    exactness (see the operator docstring; sf1f composed cost 105 →
    ~28 s, sf10f 577.6 → 77.6 s, recall/precision re-certified
    identical in docs/RECALL_DENSITY.md).
    """
    from ..sources.loaders import parquet_row_count

    docs = load_table(spark, sf_dir, "documents")
    n = parquet_row_count(f"{sf_dir}/documents.parquet")
    return lsh_dedup_clusters(docs, threshold=0.6, n_docs=n).orderBy("doc_id")


@query("dedup_simhash")  # rows-only: bit-level fingerprint, engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 8 within 16-bit prefix blocks).

    Fingerprints via an Arrow-batched Pandas UDF (bit-majority voting is
    the rare genuinely-non-expressible op); blocking keeps the verify
    join per-bucket.
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dups(docs).orderBy("id_a", "id_b")


@query("dedup_simhash_grouped")  # rows-only: bit-level fingerprint, engine-specific
def dedup_simhash_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup relation over DISTINCT fingerprints — the scale
    twin of `dedup_simhash` (r9 density-controlled sweep). Identical
    fingerprints collide in all four quarter-blocks, so one k-member fp
    group costs the baseline 4·C(k,2) candidate rows (measured: one
    hot-bucket task, >23 min at 100× the bench SF). Identical fps are
    Hamming-0 by definition, so this entry collapses them to one
    representative + count first and joins distinct fps only, emitting
    (rep_a, rep_b, hamming, n_a, n_b) group pairs; expansion back to
    id-level pairs is an explicit downstream explode whose Θ(n_a·n_b)
    cost the output row itself quotes. Pair-set equality of the
    expansion to the baseline is pytest-proven on a planted fixture.
    """
    from ..operators.dedup import simhash_group_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_group_pairs(docs).orderBy("rep_a", "rep_b")


_DUCK_PREFIX_FP = (
    f"md5(array_to_string(list_slice(string_split({_DUCK_NORM}, ' '), 1, 8), ' '))"
)


@query(
    "dedup_incremental_new_batch",
    oracle=f"""
    WITH corpus AS (
        SELECT DISTINCT {_DUCK_PREFIX_FP} AS fp
        FROM documents WHERE source = 'src0'
    ), batch AS (
        SELECT doc_id, source, n_chars, {_DUCK_PREFIX_FP} AS fp
        FROM documents WHERE source <> 'src0'
    )
    SELECT b.source AS source,
           COUNT(*) AS n_new,
           CAST(SUM(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_of_corpus,
           CAST(SUM(CASE WHEN c.fp IS NULL THEN b.n_chars ELSE 0 END) AS BIGINT) AS chars_admitted
    FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
    GROUP BY b.source
    ORDER BY source
    """,
)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a new ingest batch (every source but 'src0')
    checked against the already-ingested corpus ('src0') by PREFIX
    fingerprint — md5 of the first 8 normalized tokens, the boilerplate
    catch that also flags near-dups sharing an opening (the testdata has
    no byte-exact dups, so the whole-doc fingerprint of
    `dedup_exact_groups` would make this check vacuous). Per source:
    batch docs colliding with the corpus and the chars actually
    admitted.

    The production shape for continuous corpus builds: the historical
    side reduces to DISTINCT fingerprints (16 bytes/doc — at 100 TB
    this is the only state kept, typically bucketed on fp so each daily
    batch joins shuffle-free); bodies never cross the join. Left join +
    null test rather than semi/anti so both admit and reject counts
    come from ONE pass.
    """
    from ..operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8))
    ).alias("fp")
    corpus = docs.filter(F.col("source") == "src0").select(fp).distinct()
    batch = docs.filter(F.col("source") != "src0").select(
        "doc_id", "source", "n_chars", fp
    )
    return (
        batch.join(
            corpus.withColumnRenamed("fp", "corpus_fp"),
            batch.fp == F.col("corpus_fp"),
            "left_outer",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(
                F.when(F.col("corpus_fp").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_dup_of_corpus"),
            F.sum(
                F.when(F.col("corpus_fp").isNull(), F.col("n_chars")).otherwise(F.lit(0))
            ).alias("chars_admitted"),
        )
        .orderBy("source")
    )


_DUCK_QUALITY = """floor((LEAST(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 50.0, 1.0) * 0.5
                      + (CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
                  THEN CAST(len(list_distinct(regexp_extract_all(text, '\\S+'))) AS DOUBLE)
                       / len(regexp_extract_all(text, '\\S+')) END) * 0.5) * 1000000.0 + 0.5) / 1000000.0"""


@query(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, {_DUCK_PREFIX_FP} AS fp, {_DUCK_QUALITY} AS q
        FROM documents
    ), ranked AS (
        SELECT fp, doc_id, q,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY q DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY fp) AS n_members
        FROM scored
    )
    SELECT fp, doc_id AS keep_doc_id, q AS keep_quality, n_members
    FROM ranked WHERE rn = 1 AND n_members >= 2
    ORDER BY fp
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    (prefix fingerprint — md5 of the first 8 normalized tokens), keep the
    HIGHEST-quality document instead of the arbitrary lowest id.

    The curation refinement on top of `dedup_exact_groups`: dedup should
    discard the worse copies, not a random one. One shuffle on the
    16-byte fingerprint serves both the rank and the member count
    (same window partitioning → single Exchange); bodies never shuffle —
    only (fp, doc_id, q). Ties on the rounded score break to the lowest
    doc_id so both engines pick the same winner. Only multi-member
    clusters surface (singletons are no-ops for dedup).
    """
    from pyspark.sql import Window

    from ..operators.text import normalize_text, quality_score

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(normalize_text(F.col("text")), " "), 1, 8))
    ).alias("fp")
    scored = docs.select("doc_id", fp, hround(quality_score(F.col("text")), 6).alias("q"))
    w_rank = Window.partitionBy("fp").orderBy(F.col("q").desc(), "doc_id")
    w_fp = Window.partitionBy("fp")
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n_members", F.count(F.lit(1)).over(w_fp))
        .filter((F.col("rn") == 1) & (F.col("n_members") >= 2))
        .select(
            "fp",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("q").alias("keep_quality"),
            "n_members",
        )
        .orderBy("fp")
    )


@query(
    "dedup_containment_best",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split({_DUCK_NORM}, ' ')) AS t
        FROM documents
    ), pairs AS (
        SELECT CASE WHEN len(a.t) <= len(b.t) THEN a.doc_id ELSE b.doc_id END AS containee_id,
               CASE WHEN len(a.t) <= len(b.t) THEN b.doc_id ELSE a.doc_id END AS container_id,
               CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
               / least(len(a.t), len(b.t)) AS containment
        FROM toks a JOIN toks b
          ON a.source = b.source AND a.doc_id < b.doc_id
    ), best AS (
        SELECT containee_id, container_id, containment,
               row_number() OVER (PARTITION BY containee_id
                   ORDER BY containment DESC, container_id) AS rn
        FROM pairs WHERE containment >= 0.8
    )
    SELECT containee_id, container_id,
           {dround('containment', 6)} AS containment
    FROM best WHERE rn = 1
    ORDER BY containee_id
    """,
)
def dedup_containment_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup — for every document ≥80% token-contained in a
    larger same-source document, the single best container (max
    containment, ties to the smallest container id). The asymmetric
    relation Jaccard structurally misses: a quote or boilerplate block
    embedded in a longer page has near-zero Jaccard but containment 1.0,
    and the training-corpus action (drop the containee, keep the
    container) needs exactly this orientation.

    Shape: the blocked self-join from :func:`containment_pairs` (no
    size-ratio prune exists for the asymmetric relation — blocking is
    the candidate bound), then a containee-partitioned row_number to
    keep the best container. Both shuffles key on ids, never bodies.

    exact, small-data (r8 sf1 audit, 58×): the fixed-cardinality block
    goes quadratic; scale twin `dedup_containment_best_prefix` produces
    the IDENTICAL result (same oracle) with prefix-filtered candidates.
    """
    from pyspark.sql import Window

    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = containment_pairs(docs, block_cols=["source"], threshold=0.8)
    w = Window.partitionBy("containee_id").orderBy(
        F.desc("containment"), F.col("container_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "containee_id",
            "container_id",
            hround("containment", 6).alias("containment"),
        )
        .orderBy("containee_id")
    )


@query(
    "corpus_source_overlap_matrix",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split({_DUCK_NORM}, ' ') AS t
        FROM documents
    ), fps AS (
        SELECT DISTINCT source,
               md5(array_to_string(t[i:i+4], ' ')) AS fp
        FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
    ), sizes AS (
        SELECT source, COUNT(*) AS n_fps FROM fps GROUP BY source
    ), shared AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM fps a JOIN fps b
          ON a.fp = b.fp AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b, CAST(s.n_shared AS BIGINT) AS n_shared,
           {dround('CAST(s.n_shared AS DOUBLE) / (sa.n_fps + sb.n_fps - s.n_shared)', 6)}
               AS fp_jaccard
    FROM shared s
    JOIN sizes sa ON sa.source = s.src_a
    JOIN sizes sb ON sb.source = s.src_b
    ORDER BY n_shared DESC, src_a, src_b
    """,
)
def corpus_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source×source contamination matrix: for every source pair, the
    count of distinct 5-gram fingerprints they share and the Jaccard of
    their gram-fingerprint sets — the who-duplicates-whom diagnostic
    that orders dedup work (dedupe the heavily overlapping crawl
    snapshots against each other first; leave disjoint sources alone).
    `dedup_summary` answers "how much is duplicated"; `dedup_repeated_
    ngrams` finds WHICH grams repeat; this answers "between WHOM".
    Gram-level (not whole-document) fingerprints because cross-source
    overlap in real corpora is phrase reuse long before full-document
    copies — measured here: 0 shared document fingerprints but 1061
    shared 5-grams at sf0.01.

    Shape: one distinct over (source, 16-byte md5 of the gram) — gram
    strings never shuffle past the first projection — then a
    fingerprint-keyed self-join whose per-key fan-out is bounded by
    C(|sources sharing the gram|, 2) ≤ C(20,2), and a ≤C(20,2)-row
    rollup joined to two broadcast-sized size tables.
    """
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.dedup import token_shingles
    from ..operators.text import normalize_text

    toks = docs.select(
        "source", F.split(normalize_text(F.col("text")), " ").alias("t")
    )  # short docs yield empty shingle arrays; explode drops them (r13)
    fps = toks.select(
        "source", F.explode(token_shingles("t", 5)).alias("g")
    ).select("source", F.md5("g").alias("fp")).distinct()
    sizes = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n_fps"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_fps").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_fps").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            hround(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("fp_jaccard"),
        )
        .orderBy(F.desc("n_shared"), "src_a", "src_b")
    )


# Shared by dedup_incremental_batch and its streaming twin: the final
# flag table is micro-batch-boundary-INVARIANT (each batch doc appears
# exactly once across micro-batches; its flags depend only on that row
# and the static corpus), so one brute-force oracle certifies both.
_INCR_FLAGS_ORACLE = """
    WITH toks AS (
        SELECT doc_id, source,
               list_distinct(string_split({norm}, ' ')) AS t
        FROM documents
    ), corpus AS (
        SELECT * FROM toks WHERE doc_id % 7 <> 0
    ), batch AS (
        SELECT * FROM toks WHERE doc_id % 7 = 0
    ), matched AS (
        SELECT b.doc_id AS doc_id,
               CAST(len(list_intersect(b.t, c.t)) AS DOUBLE)
                   / len(list_distinct(list_concat(b.t, c.t))) AS j
        FROM batch b JOIN corpus c ON b.source = c.source
        WHERE CAST(len(list_intersect(b.t, c.t)) AS DOUBLE)
              / len(list_distinct(list_concat(b.t, c.t))) >= 0.6
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_matches, MAX(j) AS bj
        FROM matched GROUP BY doc_id
    )
    SELECT b.doc_id AS doc_id,
           COALESCE(a.n_matches, 0) AS n_matches,
           {bj} AS best_jaccard,
           COALESCE(a.n_matches, 0) > 0 AS is_dup
    FROM batch b LEFT JOIN agg a ON b.doc_id = a.doc_id
    ORDER BY doc_id
    """.format(norm=_DUCK_NORM, bj=dround("COALESCE(a.bj, 0.0)", 4))


@query(
    "dedup_incremental_batch",
    oracle=_INCR_FLAGS_ORACLE,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: flag each NEW-batch document that
    near-duplicates (same-source token Jaccard >= 0.6) the EXISTING
    corpus, without ever pairing corpus docs with each other.

    The production pattern this registry previously lacked: a deduped
    100 TB corpus receives a daily batch; re-running global dedup is
    off the table, so the batch probes a REUSABLE corpus index (token
    document frequencies + ranked prefix postings, derived from the
    corpus alone — materialize-once in production) and only
    batch-prefix x corpus-prefix candidates are generated (recall-1
    prefix filter, exact verify; operators/dedup.py
    incremental_jaccard_flags). The oracle brute-forces batch x corpus
    in DuckDB — identical relation, candidate plan irrelevant to it.

    Batch split is deterministic and engine-portable: doc_id % 7 == 0
    (~14% of docs arrive "new"; 7 because the synthetic generator strides
    duplicate-cluster ids by multiples of 5, so a %5 split would never
    cross a cluster — measured: 0 of 3536 near-dup pairs cross %5 at
    sf0.001, 910 cross %7).

    CONTRACT: the production ingest batch is BOUNDED (a day's arrivals,
    not a constant fraction of the corpus). The %7 registry split
    scales the batch WITH the corpus, so its cost grows on both sides
    of the candidate relation — measured 205.4 s / 23.1 GB at 5M docs
    (714k-doc "batch") vs 34.9 s / 2.2 GB for the contract shape
    (5k-doc batch vs the same 5M-doc index), where the 2.2 GB is the
    fresh-lineage index term a bucketed persisted index amortizes
    (docs/TIME_sf100f_breadth_r13.json).
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    flags = incremental_jaccard_flags(
        corpus, batch, block_cols=["source"], threshold=0.6
    )
    return flags.select(
        F.col("id").alias("doc_id"),
        "n_matches",
        hround("best_jaccard", 4).alias("best_jaccard"),
        "is_dup",
    ).orderBy("doc_id")


@query(
    "streaming_incremental_dedup",
    oracle=_INCR_FLAGS_ORACLE,
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `dedup_incremental_batch`: the new-doc stream
    (doc_id % 7 == 0) arrives via ``readStream`` and every micro-batch
    is flagged against the STATIC corpus inside ``foreachBatch``, the
    per-batch flags appended to a parquet snapshot — the production
    ingest-gate topology (Kafka/files-on-arrival → dedup gate → keep or
    drop) run on the real streaming engine.

    Shares the batch twin's brute-force oracle VERBATIM: each batch doc
    appears exactly once across micro-batches and its flags depend only
    on that row plus the static corpus, so the final snapshot is
    micro-batch-boundary-invariant — foreachBatch offset tracking and
    the append bookkeeping are exactly what the hash check certifies.
    At 100 TB the corpus-side index (token df + ranked prefix postings,
    corpus-only by construction) is materialized once and every
    micro-batch reuses it; here it is rebuilt per batch because the
    entry must be stateless.
    """
    import shutil

    from ..operators.dedup import incremental_jaccard_flags
    from ..sources.sinks import run_dir

    out = run_dir("stream_incr_dedup", sf_dir)
    shutil.rmtree(out, ignore_errors=True)  # append sink: clear prior run
    docs_static = load_table(spark, sf_dir, "documents")
    corpus = docs_static.filter(F.col("doc_id") % 7 != 0)
    stream = (
        spark.readStream.schema(docs_static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(F.col("doc_id") % 7 == 0)
    )

    def flag_batch(batch_df, batch_id: int) -> None:
        flags = incremental_jaccard_flags(
            corpus, batch_df, block_cols=["source"], threshold=0.6
        )
        (
            flags.select(
                F.col("id").alias("doc_id"),
                "n_matches",
                hround("best_jaccard", 4).alias("best_jaccard"),
                "is_dup",
            )
            .write.mode("append")
            .parquet(out)
        )

    query_handle = (
        stream.writeStream.outputMode("append").foreachBatch(flag_batch).start()
    )
    try:
        query_handle.processAllAvailable()
    finally:
        query_handle.stop()
    return spark.read.parquet(out).orderBy("doc_id")


@query(
    "dedup_index_roundtrip",
    scale_class="certification",
    oracle=_INCR_FLAGS_ORACLE,
)
def dedup_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistence certification for the incremental-dedup index: the
    corpus-only index (token df + ranked prefix postings + verify
    arrays, `operators/dedup.py::build_incremental_index`) is WRITTEN
    to parquet, RELOADED in place, and the batch is served entirely
    from the reloaded copies — proving the materialize-once claim the
    incremental entries make is real, not an argument: nothing about
    the flags depends on in-session lineage.

    Shares the brute-force oracle with `dedup_incremental_batch` and
    `streaming_incremental_dedup` verbatim — same relation through a
    third execution topology (fresh build / streamed batches / cold
    reload). At 100 TB the prefix table would be written bucketed by
    tok (write_bucketed_table) so every batch's candidate probe is a
    co-located join; plain parquet keeps this entry engine-portable.
    """
    import json
    import os
    import shutil

    from ..operators.dedup import build_incremental_index, incremental_flags_from_index
    from ..sources.sinks import run_dir

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    base = run_dir("incr_index", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    built = build_incremental_index(corpus, block_cols=["source"], threshold=0.6)
    # DataFrames go to parquet; the build parameters (threshold /
    # block_cols) travel as a one-row JSON manifest and are restored
    # into the reloaded dict — incremental_flags_from_index asserts
    # they match the serve call (r10 ADVICE: a looser serve threshold
    # than build would silently lose recall).
    tables = {k: v for k, v in built.items() if isinstance(v, DataFrame)}
    params = {k: v for k, v in built.items() if not isinstance(v, DataFrame)}
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{base}/{name}")
    os.makedirs(base, exist_ok=True)
    with open(f"{base}/manifest.json", "w") as fh:
        json.dump(params, fh)
    with open(f"{base}/manifest.json") as fh:
        loaded = json.load(fh)
    loaded.update({name: spark.read.parquet(f"{base}/{name}") for name in tables})
    flags = incremental_flags_from_index(
        loaded, batch, block_cols=["source"], threshold=0.6
    )
    return flags.select(
        F.col("id").alias("doc_id"),
        "n_matches",
        hround("best_jaccard", 4).alias("best_jaccard"),
        "is_dup",
    ).orderBy("doc_id")
