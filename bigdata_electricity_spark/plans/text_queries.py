"""Text-analysis queries over documents (north-star extension).

Every op here is expression-level Spark with a DuckDB oracle — language
ID, quality scoring, token counting and fingerprinting are all
SQL-expressible by design (SURVEY §7.2 step 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.text import (
    LANG_STOPWORDS,
    bpe_ish_token_count,
    distinct_token_ratio,
    fingerprint,
    predict_language,
    punct_ratio,
    quality_score,
    token_count,
)
from ..sources.loaders import load_table
from ..functions.rounding import dround, hround
from .registry import query


@query(
    "text_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS INTEGER) AS n_bpe_tokens,
           floor((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' '))) * 1000000.0 + 0.5) / 1000000.0 AS distinct_ratio
    FROM documents
    ORDER BY doc_id
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics per document: chars, whitespace tokens, BPE-ish
    (word-or-punct) tokens, distinct-token ratio. Pure projection —
    map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        hround(distinct_token_ratio(c), 6).alias("distinct_ratio"),
    ).orderBy("doc_id")


@query(
    "text_quality",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               LEAST(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 50.0, 1.0) * 0.5
               + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' '))) * 0.5 AS q,
               floor((CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                     / length(text)) * 1000000.0 + 0.5) / 1000000.0 AS punct_ratio
        FROM documents
    )
    SELECT doc_id, floor((q) * 1000000.0 + 0.5) / 1000000.0 AS quality, punct_ratio,
           CASE WHEN q >= 0.75 THEN 'keep' ELSE 'drop' END AS verdict
    FROM scored
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length-saturation × token diversity composite with
    a keep/drop verdict — the filter stage of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    q = quality_score(c)
    return docs.select(
        "doc_id",
        hround(q, 6).alias("quality"),
        hround(punct_ratio(c), 6).alias("punct_ratio"),
        F.when(q >= 0.75, "keep").otherwise("drop").alias("verdict"),
    ).orderBy("doc_id")


def _duck_lang_score(lang: str) -> str:
    pattern = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pattern}'))"


_LANG_CASE = " ".join(
    f"WHEN {_duck_lang_score(lang)} = best THEN '{lang}'" for lang in sorted(LANG_STOPWORDS)
)

@query(
    "text_langid",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               greatest({', '.join(_duck_lang_score(lang) for lang in LANG_STOPWORDS)}) AS best,
               text
        FROM documents
    ), predicted AS (
        SELECT lang,
               CASE WHEN best = 0 THEN 'und' {_LANG_CASE} ELSE 'und' END AS predicted_lang
        FROM scored
    )
    SELECT lang, predicted_lang, COUNT(*) AS n
    FROM predicted
    GROUP BY lang, predicted_lang
    ORDER BY lang, predicted_lang
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-signature argmax) with a confusion
    matrix against the labeled ``lang`` column. Expression-only n-gram
    heuristic — no model, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", predict_language(F.col("text")).alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted_lang")
    )


def _duck_word_count(words: list[str]) -> str:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pattern}'))"


from ..operators.text import NEGATIVE_WORDS, POSITIVE_WORDS  # noqa: E402

_POS = _duck_word_count(POSITIVE_WORDS)
_NEG = _duck_word_count(NEGATIVE_WORDS)


@query(
    "text_sentiment",
    oracle=f"""
    SELECT source,
           CASE WHEN {_POS} > {_NEG} THEN 'positive'
                WHEN {_NEG} > {_POS} THEN 'negative'
                ELSE 'neutral' END AS sentiment,
           COUNT(*) AS n
    FROM documents
    GROUP BY 1, 2
    ORDER BY source, sentiment
    """,
)
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword sentiment per source: the wordlist-count classifier of the
    classic Spark sentiment pipelines, as a pure expression."""
    from ..operators.text import sentiment_label

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", sentiment_label(F.col("text")).alias("sentiment"))
        .groupBy("source", "sentiment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "sentiment")
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over normalized text — engine-portable
    document identity (the exact-dedup key)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


@query(
    "text_top_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency top-20 (explode → count → top-k;
    tie-broken by token for determinism). The explode fan-out is bounded
    per-row; counts partially aggregate map-side."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@query(
    "text_tfidf_top_term",
    oracle="""
    WITH tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               floor((tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token AS top_term, tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
          FROM scored)
    WHERE rn = 1
    ORDER BY doc_id
    """,
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: highest-scoring term per document.

    The full distributed shape: explode → (doc, term) counts → document
    frequency join → per-doc window argmax. The df side aggregates to
    |vocab| rows (broadcastable); scores are rounded BEFORE ranking so
    libm ln() ulp differences can't flip the per-doc argmax across
    engines (tie-break on term).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .select(
            "doc_id",
            "token",
            hround(
                F.col("tf") * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_term"), "tfidf")
        .orderBy("doc_id")
    )
