"""Training-corpus pipeline queries: PII redaction, chunking, embedding
quantization, JSONL publishing, and partition-pruned scans.

The ingestion/publishing half of an LLM data pipeline (the curation half
lives in dedup_queries/training_queries/quality_queries). Everything is
expression-level Spark — regex, array HOFs, sequence/explode — so the
hot paths stay inside whole-stage codegen; the two sink-backed entries
certify their manifests from files read BACK off disk.

Determinism notes (registry rules, SURVEY §7.4): regex patterns are the
Java-regex ∩ RE2 subset so the same string runs on both engines; float
outputs cross the boundary hround/dround-rounded; DuckDB's ``list_zip``
produces unnamed structs — elements are addressed ``p[1]``/``p[2]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rounding import dround, hround
from ..operators.text import normalize_text, redact_pii
from ..sources.loaders import load_table
from ..sources.sinks import run_dir
from .registry import query

# Token-window chunking grid: 32-token chunks, 8-token overlap → stride
# 24. Chunk k covers tokens [1 + 24k, 24k + 32]; every token lands in
# ≥1 chunk and consecutive chunks share exactly 8 tokens (last chunk may
# run short).
_CHUNK = 32
_STRIDE = 24


@query(
    "redact_pii_props",
    oracle="""
    WITH red AS (
        SELECT event_type,
               props,
               regexp_replace(props, '\\d+', '<NUMBER>', 'g') AS redacted,
               length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS n_digits
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN redacted <> props THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
           CAST(SUM(n_digits) AS BIGINT) AS digits_removed,
           COUNT(DISTINCT redacted) AS n_templates
    FROM red
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def redact_pii_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-redaction audit over the one testdata column that contains
    digit runs (events.props JSON payloads): scrub with
    :func:`redact_pii`'s number class, then report per event type how
    many payloads changed, how many digit chars were removed, and how
    many distinct templates remain after redaction (the usual
    cardinality-collapse check — redaction should shrink the payload
    space to a near-closed template vocabulary).

    The full class ladder (email/ipv4/card/phone/number, ordered so
    structured classes win before the digit-run class eats their
    digits) is exercised on planted fixtures in
    tests/test_pipeline_ops.py — documents.text is digit-free, so only
    the number class has signal in testdata.

    Scale shape: one projection of chained regexp_replace (single pass,
    codegen) + one groupBy on a 5-value key; COUNT(DISTINCT redacted)
    is the only wide shuffle and it shuffles post-redaction templates,
    not raw payloads.
    """
    ev = load_table(spark, sf_dir, "events")
    red = ev.select(
        "event_type",
        "props",
        redact_pii(F.col("props"), classes=("number",)).alias("redacted"),
        (
            F.length("props")
            - F.length(F.regexp_replace("props", r"[0-9]", ""))
        ).alias("n_digits"),
    )
    return (
        red.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("redacted") != F.col("props")).cast("long")).alias("n_redacted"),
            F.sum("n_digits").cast("long").alias("digits_removed"),
            F.countDistinct("redacted").alias("n_templates"),
        )
        .orderBy("event_type")
    )


@query(
    "chunk_documents_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(generate_series(1, len(t), {_STRIDE})) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) // {_STRIDE} AS INT) AS chunk_idx,
           CAST(len(list_slice(t, s, s + {_CHUNK} - 1)) AS INT) AS n_tokens,
           md5(array_to_string(list_slice(t, s, s + {_CHUNK} - 1), ' ')) AS chunk_fp
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the doc→training-sample
    fan-out: normalize, tokenize, emit one row per 32-token window at
    stride 24 (8-token overlap carries context across chunk
    boundaries), each with its token count and content fingerprint.

    Scale shape: tokens are materialized as a column ONCE before the
    window fan-out (HOF expressions have no cross-expression CSE — the
    r1 minhash trap), the explode is in-partition (no shuffle; output
    stays on the input's partitioning), and chunk text never leaves the
    row — downstream dedup joins on chunk_fp, 16 bytes.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("t")
    )
    exploded = toks.select(
        "doc_id",
        "t",
        F.posexplode(F.sequence(F.lit(1), F.size("t"), F.lit(_STRIDE))).alias(
            "chunk_idx", "s"
        ),
    )
    chunk = F.slice(F.col("t"), F.col("s"), _CHUNK)
    return (
        exploded.select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(chunk).alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "quantize_embeddings_int8",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), mm AS (
        SELECT vec_id, label, v,
               list_min(v) AS mn,
               (list_max(v) - list_min(v)) / 255.0 AS sc
        FROM v
    ), q AS (
        SELECT vec_id, label, v, mn, sc,
               list_transform(v, x -> CASE WHEN sc = 0 THEN 0
                   ELSE least(greatest(floor((x - mn) / sc + 0.5), 0), 255)
               END) AS qv
        FROM mm
    ), e AS (
        SELECT vec_id, label, mn, sc, qv,
               list_transform(list_zip(v, qv), p ->
                   abs(p[1] - (mn + p[2] * sc))) AS err
        FROM q
    )
    SELECT vec_id, label,
           CAST(list_min(qv) AS INT) AS q_lo,
           CAST(list_max(qv) AS INT) AS q_hi,
           {dround('list_max(err)', 9)} AS max_abs_err,
           {dround('list_sum(err) / len(err)', 9)} AS mean_abs_err
    FROM e
    ORDER BY vec_id
    """,
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector affine int8 (0..255) quantization audit — the storage
    compression step before ANN serving: q = clamp(⌊(x−min)/scale+½⌋),
    scale = (max−min)/255, plus the reconstruction-error profile
    (max/mean |x − dequant(q)|) that tells you whether 8 bits suffice
    for the corpus.

    All math is double-accumulated array HOFs (no Arrow crossing);
    each intermediate array is materialized in its own projection so
    HOF results aren't recomputed per consumer (no cross-expression
    CSE). Degenerate constant vectors quantize to 0 with zero error on
    both engines. 4× smaller vectors at 100 TB means 4× more of the
    index fits in executor memory; the op is embarrassingly parallel
    (no shuffle at all).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    mm = v.select(
        "vec_id", "label", "v",
        F.array_min("v").alias("mn"),
        ((F.array_max("v") - F.array_min("v")) / F.lit(255.0)).alias("sc"),
    )
    q = mm.select(
        "vec_id", "label", "v", "mn", "sc",
        F.transform(
            "v",
            lambda x: F.when(F.col("sc") == 0, F.lit(0).cast("long")).otherwise(
                F.least(
                    F.greatest(
                        F.floor((x - F.col("mn")) / F.col("sc") + F.lit(0.5)),
                        F.lit(0).cast("long"),
                    ),
                    F.lit(255).cast("long"),
                )
            ),
        ).alias("qv"),
    )
    e = q.select(
        "vec_id", "label", "qv",
        F.zip_with(
            "v", "qv",
            lambda x, qi: F.abs(x - (F.col("mn") + qi * F.col("sc"))),
        ).alias("err"),
    )
    return e.select(
        "vec_id", "label",
        F.array_min("qv").cast("int").alias("q_lo"),
        F.array_max("qv").cast("int").alias("q_hi"),
        hround(F.array_max("err"), 9).alias("max_abs_err"),
        hround(
            F.aggregate("err", F.lit(0.0), lambda acc, x: acc + x)
            / F.size("err"),
            9,
        ).alias("mean_abs_err"),
    ).orderBy("vec_id")


@query(
    "export_corpus_jsonl",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def export_corpus_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish the corpus as sharded JSON-Lines (the trainer-facing
    interchange format) and certify the export: the per-source manifest
    is computed from the files read BACK off disk, so a lost shard or
    truncated write shows up as a count/char mismatch against the
    oracle, which reads the original table.

    Shards are written in parallel (one per task — no coalesce); at
    100 TB the same op lands behind a `repartition(n_shards)` sized to
    the trainer's reader parallelism. Output pinned under the repo
    warehouse so the driver session's cwd is irrelevant.
    """
    from ..sources.sinks import export_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    written = export_jsonl(docs, run_dir("corpus_jsonl", sf_dir))
    return (
        written.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


@query(
    "scan_partition_pruned_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-10'
    GROUP BY 1
    ORDER BY day
    """,
)
def scan_partition_pruned_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan — THE dominant cost lever at 100 TB: write
    events date-partitioned (`day=.../`), then answer a 3-day query by
    reading back with a partition-key predicate, so the scan plans only
    3 of ~30 directories (PartitionFilters in the physical plan —
    asserted in tests/test_pipeline_ops.py) and the other ~90% of the
    data is never opened.

    The oracle computes the same counts from the ORIGINAL table, so the
    result also certifies the partitioned write was lossless for the
    selected window. Day derives from the NTZ event time (timezone-free
    — same civil date on both engines).
    """
    from ..sources.sinks import write_parquet

    out_dir = run_dir("events_by_day", sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    write_parquet(ev, out_dir, partition_by=["day"])
    back = spark.read.parquet(out_dir)
    return (
        back.filter(
            F.col("day").between(F.lit("2024-01-08"), F.lit("2024-01-10"))
        )
        .groupBy(F.col("day").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )


@query(
    "scan_dynamic_partition_pruning",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-05' OR CAST(ts AS DATE) = DATE '2024-01-15'
    GROUP BY 1
    ORDER BY day
    """,
)
def scan_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP) — the star-schema cousin of the
    static pruned scan: the fact side is date-partitioned, but the day
    predicate lives on the DIMENSION (``kind = 'campaign'``), so no
    static partition filter exists at plan time. Catalyst runs the
    broadcast dim side first and injects its join keys as a runtime
    partition filter (``SubqueryAdaptiveBroadcast dynamicpruning#N`` in
    the physical plan — asserted in tests/test_pipeline_ops.py), so only
    the 2 campaign-day directories out of ~30 are ever opened.

    At 100 TB this is THE mechanism that makes "fact join filtered dim"
    queries cheap without the user hand-copying the dim predicate onto
    the fact's partition column. The oracle computes the same counts
    from the original table with the resolved day list inlined, so the
    result also certifies the pruned read was lossless.
    """
    from ..sources.sinks import write_parquet

    out_dir = run_dir("events_by_day_dpp", sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    write_parquet(ev, out_dir, partition_by=["day"])
    back = spark.read.parquet(out_dir)
    dim = spark.createDataFrame(
        [("2024-01-05", "campaign"), ("2024-01-15", "campaign"), ("2024-01-20", "organic")],
        "day_key string, kind string",
    ).select(F.col("day_key").cast("date").alias("day_key"), "kind")
    return (
        back.join(dim.filter(F.col("kind") == "campaign"), back.day == dim.day_key)
        .groupBy(F.col("day").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )


def _zorder_oracle() -> str:
    from ..operators.layout import morton_code_sql

    mc = morton_code_sql("user_id", "(hour(ts) * 60 + minute(ts))", bits=16)
    return f"""
    WITH z AS (
        SELECT user_id,
               CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS m,
               {mc} AS zc
        FROM events
    )
    SELECT zc >> 16 AS bucket,
           COUNT(*) AS n_events,
           MIN(user_id) AS user_lo, MAX(user_id) AS user_hi,
           MIN(m) AS minute_lo, MAX(m) AS minute_hi
    FROM z
    GROUP BY 1
    ORDER BY bucket
    """


@query("layout_zorder_buckets", oracle=_zorder_oracle())
def layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit — the multi-dimension
    data-skipping layout: interleave the bits of user_id and
    minute-of-day into one code, then profile each high-order code
    range (bucket = zc >> 16 — 6 interleaved high bits, ≤64 buckets for the 11-bit testdata dims) with its bounding box in
    BOTH dimensions. Tight boxes per bucket are exactly what makes
    file-level min/max pruning work on either column after a z-ordered
    write (the write path is :func:`operators.layout.zorder_write`,
    skip-ratio asserted in tests/test_pipeline_ops.py).

    The Morton code is 16 unrolled shift/and/or terms per dimension —
    pure integer expressions inside whole-stage codegen, and the oracle
    evaluates the IDENTICAL generated bit math (morton_code_sql), so
    this entry cross-checks the layout key itself, not just the
    bucketing. No UDFs, one groupBy shuffle on the bucket key.
    """
    from ..operators.layout import morton_code

    ev = load_table(spark, sf_dir, "events")
    m = (F.hour("ts") * 60 + F.minute("ts")).cast("long")
    z = ev.select(
        "user_id",
        m.alias("m"),
        morton_code(F.col("user_id"), m, bits=16).alias("zc"),
    )
    return (
        z.groupBy(F.shiftright("zc", 16).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("user_lo"),
            F.max("user_id").alias("user_hi"),
            F.min("m").alias("minute_lo"),
            F.max("m").alias("minute_hi"),
        )
        .orderBy("bucket")
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_lang,
           CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_lang
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two writer generations land in one dataset
    (v1 lacks the ``lang`` column, v2 adds it) and a ``mergeSchema``
    scan unifies them — v1 rows surface lang as NULL, nothing is
    rewritten. The audit counts both generations per source from the
    files READ BACK off disk, certified against the original table.

    The lakehouse reality at 100 TB: columns get added for new data
    only, and the reader — not a rewrite of petabytes — reconciles.
    mergeSchema costs one footer read per file at planning time (on big
    tables, enable it per-read like here, not globally).
    """
    out_dir = run_dir("docs_evolving", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "source")
    v2 = docs.filter(F.col("doc_id") % 2 != 0).select(
        "doc_id", "text", "source", "lang"
    )
    v1.write.mode("overwrite").parquet(f"{out_dir}/gen=1")
    v2.write.mode("overwrite").parquet(f"{out_dir}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out_dir}/gen=1", f"{out_dir}/gen=2"
    )
    return (
        merged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("lang").isNull().cast("long")).alias("n_missing_lang"),
            F.sum(F.col("lang").isNotNull().cast("long")).alias("n_with_lang"),
        )
        .orderBy("source")
    )


@query(
    "udtf_tokenize_lateral",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(generate_subscripts(t, 1) - 1 AS INT) AS pos,
           unnest(t) AS tok
    FROM toks
    ORDER BY doc_id, pos
    """,
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) + LATERAL join: one input row fans out to
    (pos, token) rows from an arbitrary Python generator — the §2.11
    table-function surface, exercised end-to-end through SQL.

    Honest caveat in the docstring it ships with: a Python UDTF is the
    row-at-a-time slow path (pickled rows both ways, no Arrow); the
    expression-level twin is `F.posexplode(F.split(...))` (used by
    `chunk_documents_overlap`). Use a UDTF when the fan-out logic is
    genuinely imperative (stateful parsers, third-party tokenizers) —
    then at 100 TB prefer `mapInPandas` with arrow batches. Tokens
    split on single spaces over the normalized text so the Python
    semantics (''.split(' ') == ['']) match the oracle's string_split
    exactly.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class SplitTokens:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                yield i, t

    spark.udtf.register("split_tokens", SplitTokens)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", normalize_text(F.col("text")).alias("norm")
    )
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.tok
        FROM __udtf_docs d, LATERAL split_tokens(d.norm) s
        ORDER BY d.doc_id, s.pos
        """
    )


@query(
    "retention_prune_days",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-15'
    GROUP BY 1
    ORDER BY day
    """,
)
def retention_prune_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention enforcement on a date-partitioned dataset: drop every
    partition directory older than the cutoff (a METADATA operation —
    no surviving row is read or rewritten), then audit the survivors
    from a fresh read-back against the original table.

    This is how deletes work on partition boundaries at 100 TB:
    directory unlink, not data rewrite (row-level retention inside a
    partition is the copy-on-write MERGE in `merge_upsert_orders`).
    The post-prune scan also proves pruned data is GONE, not merely
    filtered — the read-back plans over the remaining directories only.
    """
    import shutil

    from ..sources.sinks import write_parquet

    out_dir = run_dir("events_retention", sf_dir)
    cutoff = "2024-01-15"
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    write_parquet(ev, out_dir, partition_by=["day"])

    import glob as _glob
    import os as _os

    for d in _glob.glob(f"{out_dir}/day=*"):
        if _os.path.basename(d).split("=", 1)[1] < cutoff:
            shutil.rmtree(d)

    back = spark.read.parquet(out_dir)
    return (
        back.groupBy(F.col("day").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("day")
    )


@query(
    "pyds_synthetic_events",
    oracle="""
    WITH synth AS (
        SELECT range AS event_id,
               CAST(CAST(('0x' || substr(md5('u' || CAST(range AS VARCHAR)), 1, 6)) AS BIGINT) % 50 AS BIGINT) AS user_id,
               CAST(floor(CAST(CAST(('0x' || substr(md5('v' || CAST(range AS VARCHAR)), 1, 6)) AS BIGINT) AS DOUBLE)
                    / 16777216.0 * 50000.0 + 0.5) AS BIGINT) / 100.0 AS value
        FROM range(0, 2000)
    )
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           floor(SUM(value) * 100.0 + 0.5) / 100.0 AS total_value
    FROM synth
    GROUP BY 1
    ORDER BY user_bucket
    """,
)
def pyds_synthetic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 connector API) end-to-end:
    register `synthetic_events`, read it like any format, aggregate.
    Every generated field is md5-derived from the row id
    (`sources/pydatasource.py`), so the ORACLE regenerates the
    identical rows from a bare integer range — the value hash checks
    the connector's partition planning + generation, not just row
    counts. Partition slices generate independently on executors (no
    driver coordination, no shuffle until the groupBy).
    """
    from ..sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 2000)
        .option("n_partitions", 8)
        .load()
    )
    return (
        df.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_bucket")
    )


@query(
    "pyds_jsonl_sink_roundtrip",
    scale_class="certification",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def pyds_jsonl_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python SINK (`jsonl_manifest`) certified end-to-end:
    write the corpus through the DataSourceWriter commit protocol, read
    the shards back, and verify BOTH that the manifest's total matches
    the commit messages and that the per-source read-back aggregates
    match the original table (the oracle). A torn write fails twice —
    manifest vs files, and values vs oracle.
    """
    import json as _json
    import shutil as _shutil

    from ..sources.pydatasource import register_sink

    register_sink(spark)
    out = run_dir("pyds_jsonl_sink", sf_dir)
    _shutil.rmtree(out, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.format("jsonl_manifest").mode("append").option("path", out).save()

    manifest = _json.load(open(f"{out}/_MANIFEST.json"))
    back = spark.read.schema("doc_id long, lang string, source string, n_chars long").json(
        f"{out}/part-*.jsonl"
    )
    if manifest["total_rows"] != back.count():
        raise AssertionError(
            f"manifest says {manifest['total_rows']} rows, files hold {back.count()}"
        )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


def _zorder3d_oracle() -> str:
    from ..operators.layout import morton_code_nd_sql

    mc = morton_code_nd_sql(
        ["user_id", "(hour(ts) * 60 + minute(ts))", "CAST(floor(value / 50) AS BIGINT)"],
        bits=10,
    )
    return f"""
    WITH z AS (
        SELECT user_id,
               CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS m,
               CAST(floor(value / 50) AS BIGINT) AS vb,
               {mc} AS zc
        FROM events
    )
    SELECT zc >> 24 AS bucket,
           COUNT(*) AS n_events,
           MIN(user_id) AS user_lo, MAX(user_id) AS user_hi,
           MIN(m) AS minute_lo, MAX(m) AS minute_hi,
           MIN(vb) AS vbucket_lo, MAX(vb) AS vbucket_hi
    FROM z
    GROUP BY 1
    ORDER BY bucket
    """


@query("layout_zorder3d_buckets", oracle=_zorder3d_oracle())
def layout_zorder3d_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-dimension Z-order clustering audit: user_id ×
    minute-of-day × value-bucket interleaved with
    :func:`operators.layout.morton_code_nd` (bit i of dim d → position
    3i+d), profiled per high-order code range with the bounding box in
    ALL THREE dimensions — a file clustered this way prunes on any of
    the three predicates. 10 bits/dim → 30-bit code; bucket = zc >> 24
    keeps ≤64 buckets of 6 interleaved high bits. The oracle evaluates
    the identical generated bit math (morton_code_nd_sql), so the
    3-D layout key itself is value-hash-checked.
    """
    from ..operators.layout import morton_code_nd

    ev = load_table(spark, sf_dir, "events")
    m = (F.hour("ts") * 60 + F.minute("ts")).cast("long")
    vb = F.floor(F.col("value") / 50).cast("long")
    z = ev.select(
        "user_id",
        m.alias("m"),
        vb.alias("vb"),
        morton_code_nd(
            [F.col("user_id"), m, vb], bits=10
        ).alias("zc"),
    )
    return (
        z.groupBy(F.shiftright("zc", 24).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("user_lo"),
            F.max("user_id").alias("user_hi"),
            F.min("m").alias("minute_lo"),
            F.max("m").alias("minute_hi"),
            F.min("vb").alias("vbucket_lo"),
            F.max("vb").alias("vbucket_hi"),
        )
        .orderBy("bucket")
    )


@query(
    "dynamic_partition_overwrite_recent",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           floor(SUM(value * CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-25'
                                  THEN 2.0 ELSE 1.0 END) * 100.0 + 0.5) / 100.0
             AS total_value
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def dynamic_partition_overwrite_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the reprocess-a-window write
    pattern: publish the full date-partitioned dataset, then rewrite
    ONLY the recent days (here: values doubled, days ≥ Jan 25) with
    ``partitionOverwriteMode=dynamic``, which replaces exactly the
    partitions present in the incoming frame and leaves every other
    directory untouched. The read-back audit proves it: old days carry
    original sums, rewritten days carry doubled sums — a static
    overwrite would have dropped the old days entirely.

    This is how backfills and late-data reprocessing ship at 100 TB:
    recompute the affected window, overwrite just those directories,
    never touch (or list) the other 9 years. Option-scoped conf — the
    session default stays static.
    """
    from ..sources.sinks import write_parquet

    out_dir = run_dir("events_dyn_overwrite", sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value", F.to_date("ts").alias("day")
    )
    write_parquet(ev, out_dir, partition_by=["day"])

    recent = ev.filter(F.col("day") >= F.lit("2024-01-25")).withColumn(
        "value", F.col("value") * 2.0
    )
    (
        recent.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(out_dir)
    )

    back = spark.read.parquet(out_dir)
    return (
        back.groupBy(F.col("day").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            hround(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("day")
    )


@query(
    "export_orc_roundtrip",
    scale_class="certification",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def export_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC interchange: write lineitem as ORC (Spark's other built-in
    columnar format — the Hive-ecosystem handoff), read it back, and
    audit the aggregate against the original parquet. Round-tripping
    through a second columnar codec catches type-mapping drift
    (decimal/timestamp/char quirks) that staying inside parquet never
    exercises.
    """
    out_dir = run_dir("lineitem_orc", sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    li.write.mode("overwrite").orc(out_dir)
    back = spark.read.orc(out_dir)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "ingest_jsonl_from_text",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def ingest_jsonl_from_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-ingestion path: corpus shards read back as PLAIN TEXT lines
    (`spark.read.text` — the zero-schema entry point every scraped
    corpus starts from) and parsed with `from_json` against an explicit
    schema; malformed lines become nulls instead of failures
    (PERMISSIVE semantics), and the audit counts must still match the
    original table — proving parse-side losslessness, not just
    write-side.

    Completes the semi-structured parsing trio: per-path
    get_json_object (`events_json_extract`), parse-once VARIANT
    (`events_variant_extract`), and schema-projected from_json here.
    """
    out_dir = run_dir("corpus_jsonl_text", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.mode("overwrite").json(out_dir)

    lines = spark.read.text(out_dir)
    parsed = lines.select(
        F.from_json(
            "value", "doc_id long, lang string, source string, n_chars long"
        ).alias("d")
    ).select("d.*")
    return (
        parsed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "ps_api_source_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           floor(AVG(CAST(n_chars AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def ps_api_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-on-Spark API surface: the same per-source corpus stats
    expressed through ``DataFrame.pandas_api()`` (pyspark.pandas
    groupby/agg) and converted back with ``to_spark()`` — the migration
    on-ramp for pandas codebases. It compiles to the identical
    Catalyst aggregation plan as the native API (no Python row path),
    which is exactly why it hash-matches the SQL oracle.

    Caveat the docstring ships with: pandas-on-Spark defaults can
    inject global ordering (index semantics) — this entry sticks to
    groupby/agg where no implicit index sort occurs.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pdf = docs.pandas_api()
    out = (
        pdf.groupby("source")
        .agg(
            n_docs=("doc_id", "count"),
            total_chars=("n_chars", "sum"),
            avg_chars_raw=("n_chars", "mean"),
        )
        .reset_index()
    )
    sdf = out.to_spark()
    return sdf.select(
        "source",
        "n_docs",
        F.col("total_chars").cast("long").alias("total_chars"),
        hround(F.col("avg_chars_raw").cast("double"), 4).alias("avg_chars"),
    ).orderBy("source")


@query(
    "corpus_build_chunks_pipeline",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM documents
    ), starts AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t), {_STRIDE})) AS s
        FROM toks
    ), chunks AS (
        SELECT CAST(len(list_slice(t, s, s + {_CHUNK} - 1)) AS INT) AS n_tokens,
               md5(array_to_string(list_slice(t, s, s + {_CHUNK} - 1), ' ')) AS chunk_fp
        FROM starts
    ), dedup AS (
        SELECT chunk_fp, MIN(n_tokens) AS n_tokens, COUNT(*) AS n_copies
        FROM chunks GROUP BY chunk_fp
    )
    SELECT CAST(CAST(('0x' || substr(chunk_fp, 1, 6)) AS BIGINT) % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_dups_removed
    FROM dedup
    GROUP BY 1
    ORDER BY shard
    """,
)
def corpus_build_chunks_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end chunk-level corpus build in ONE lazy plan — the
    composition the individual operators exist for: normalize →
    overlap-chunk (32/24) → exact-dedup at CHUNK granularity (16-byte
    fingerprint groupBy; cross-document boilerplate dies here even when
    whole docs differ) → deterministic md5 sharding → per-shard
    chunk/token/dups-removed accounting.

    Every stage is shuffle-frugal: the chunk fan-out is in-partition,
    dedup shuffles fingerprints (never chunk text), shard assignment is
    a map-side hash — one wide shuffle total (the fp groupBy), then a
    tiny 8-key rollup. This is the plan shape a 100 TB corpus build
    runs nightly; the parts are individually oracle-checked
    (`chunk_documents_overlap`, `dedup_exact_groups`,
    `corpus_shard_assignment`) and the composition is value-checked
    here end-to-end.
    """
    from ..operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("t")
    )
    chunk = F.slice(F.col("t"), F.col("s"), _CHUNK)
    chunks = toks.select(
        "t",
        F.posexplode(F.sequence(F.lit(1), F.size("t"), F.lit(_STRIDE))).alias("i", "s"),
    ).select(
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )
    dedup = chunks.groupBy("chunk_fp").agg(
        F.min("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    shard = (
        F.conv(F.substring("chunk_fp", 1, 6), 16, 10).cast("long") % 8
    ).alias("shard")
    return (
        dedup.groupBy(shard)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.col("n_copies") - 1).alias("n_dups_removed"),
        )
        .orderBy("shard")
    )


@query(
    "arrow_map_doc_bytes",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def arrow_map_doc_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` — the zero-copy batch API: each task receives pyarrow
    RecordBatches and computes UTF-8 byte and character lengths with
    pyarrow.compute kernels (C++-vectorized, no pandas materialization —
    the cheapest Python crossing Spark offers). The per-source rollup is
    then a plain JVM aggregate, and the oracle recomputes the same
    lengths from SQL, certifying the Arrow path end-to-end.

    This is the plumbing shape for binary/multimodal payloads where
    pandas conversion would copy (see operators/multimodal.py for the
    mapInPandas cousin); per-batch memory is one Arrow batch, and the
    map is partition-local — no shuffle until the rollup.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def batch_lengths(batches):
        for batch in batches:
            text = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                ["source", "n_bytes", "n_chars"],
            )

    mapped = docs.mapInArrow(
        batch_lengths, schema="source string, n_bytes long, n_chars long"
    )
    return (
        mapped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


@query(
    "arrow_grouped_lang_extremes",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def arrow_grouped_lang_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().applyInArrow` — grouped-map over pyarrow Tables (the
    Arrow-native sibling of applyInPandas): one Table per language group,
    reduced to (count, min, max) with pyarrow.compute aggregation
    kernels. Completes the Arrow per-key API matrix alongside
    mapInArrow, applyInPandas, cogroup and the stateful variant.

    One shuffle on the group key; per-group memory is that group's
    Table. The oracle is the plain SQL aggregate — any batch-boundary
    or dtype drift in the Arrow path breaks the hash.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")

    def extremes(table: pa.Table) -> pa.Table:
        col = table.column("n_chars")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": pa.array([table.num_rows], pa.int64()),
                "min_chars": pa.array([pc.min(col).as_py()], pa.int64()),
                "max_chars": pa.array([pc.max(col).as_py()], pa.int64()),
            }
        )

    out = docs.groupBy("lang").applyInArrow(
        extremes, schema="lang string, n_docs long, min_chars long, max_chars long"
    )
    return out.orderBy("lang")


@query(
    "ingest_quarantine_bad_json",
    oracle="""
    SELECT source,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE n_chars END) AS BIGINT) AS valid_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def ingest_quarantine_bad_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine — the ingestion contract every raw feed
    needs: records that fail JSON parsing are COUNTED into a quarantine
    bucket, never dropped silently and never allowed to poison the batch.
    The corpus is round-tripped through JSON text with a deterministic
    fault injection (every 7th doc_id loses its closing brace);
    `from_json` yields NULL for the mangled rows (PERMISSIVE semantics),
    and the audit reports quarantined/valid counts plus the valid-side
    payload volume per source. The oracle re-derives the same split from
    the injection rule, so a parser that silently "repairs" or drops rows
    fails the hash.

    Scale shape: to_json/from_json are row-local codegen expressions —
    no shuffle until the per-source rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "n_chars"))
    mangled = F.when(
        F.col("doc_id") % 7 == 0, F.expr("substring(to_json(struct(doc_id, n_chars)), 1, length(to_json(struct(doc_id, n_chars))) - 1)")
    ).otherwise(line)
    parsed = docs.select(
        "source",
        F.from_json(mangled, "doc_id long, n_chars long").alias("rec"),
    )
    return (
        parsed.groupBy("source")
        .agg(
            # PERMISSIVE from_json NEVER yields a null struct — malformed rows
            # come back as all-null FIELDS, so quarantine keys off a required
            # field's nullity.
            F.sum(F.col("rec.doc_id").isNull().cast("long")).alias("n_quarantined"),
            F.sum(F.col("rec.doc_id").isNotNull().cast("long")).alias("n_valid"),
            F.sum(
                F.when(F.col("rec.doc_id").isNotNull(), F.col("rec.n_chars")).otherwise(0)
            ).alias("valid_chars"),
        )
        .orderBy("source")
    )


@query(
    "ingest_quarantine_bad_csv",
    oracle="""
    SELECT source,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE n_chars END) AS BIGINT) AS valid_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def ingest_quarantine_bad_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine for CSV — the reference's own raw
    format (SURVEY §2.1: semicolon CSV with '?' sentinels is its whole
    ingestion story): records whose numeric field fails CSV parsing are
    counted into quarantine, never silently dropped. Deterministic
    fault injection (every 5th doc_id gets a trailing letter on its
    numeric column), `from_csv` PERMISSIVE nulls the BAD FIELD ONLY
    (doc_id still parses — unlike the JSON twin, where the whole
    record's fields null out), and the audit keys quarantine off the
    corrupted field's nullity. Completes the malformed-ingest trio:
    from_json (`ingest_quarantine_bad_json`), raw-text+from_json
    (`ingest_jsonl_from_text`), and now from_csv.

    to_csv/from_csv are row-local codegen expressions — no shuffle
    until the per-source rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    line = F.to_csv(F.struct("doc_id", "n_chars"))
    mangled = F.when(F.col("doc_id") % 5 == 0, F.concat(line, F.lit("x"))).otherwise(line)
    parsed = docs.select(
        "source",
        F.from_csv(mangled, "doc_id long, n_chars long").alias("rec"),
    )
    return (
        parsed.groupBy("source")
        .agg(
            F.sum(F.col("rec.n_chars").isNull().cast("long")).alias("n_quarantined"),
            F.sum(F.col("rec.n_chars").isNotNull().cast("long")).alias("n_valid"),
            F.sum(F.coalesce("rec.n_chars", F.lit(0))).alias("valid_chars"),
        )
        .orderBy("source")
    )


@query(
    "export_xml_roundtrip",
    scale_class="certification",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(md5(text)) AS min_fp,
           MAX(md5(text)) AS max_fp
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def export_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML interchange (Spark 4's native built-in XML source — no
    spark-xml package): write the corpus as XML documents, read them
    back with rowTag schema inference, and audit per-source counts,
    sizes, AND content fingerprints against the original table — the
    fingerprints catch what counts can't: entity-escaping or
    whitespace mangling of the text payload through the markup
    round-trip. Third interchange codec after ORC
    (`export_orc_roundtrip`) and JSONL (`ingest_jsonl_from_text`).

    The fingerprint travels as a column (md5 computed BEFORE the
    write), so a lossy round-trip breaks the read-back md5-of-text
    equality check below, and any drift breaks the driver hash.
    """
    out_dir = run_dir("corpus_xml", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text", F.md5("text").alias("fp_written")
    )
    docs.write.mode("overwrite").format("xml").option("rowTag", "doc").save(out_dir)
    # ignoreSurroundingSpaces defaults to TRUE on the reader, which
    # trims whitespace-ONLY payloads to '' — this very audit caught it
    # on a planted "   " doc. With it off, empty, whitespace-only, and
    # tab/newline payloads all round-trip byte-exact (probed).
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .load(out_dir)
    )
    # content integrity: the text that came back must hash to the
    # fingerprint computed before the write, for every row. Null-safe
    # comparison: if the XML reader nulls a payload out (e.g. an
    # empty/whitespace-only text element), md5(NULL) != fp evaluates to
    # NULL and a plain filter would silently drop the row — exactly the
    # lossy case this audit exists to catch.
    n_mangled = back.filter(~F.md5("text").eqNullSafe(F.col("fp_written"))).count()
    assert n_mangled == 0, f"XML round-trip mangled {n_mangled} text payloads"
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("fp_written").alias("min_fp"),
            F.max("fp_written").alias("max_fp"),
        )
        .orderBy("source")
    )


@query(
    "sql_collation_groupby",
    oracle="""
    WITH mangled AS (
        SELECT CASE WHEN doc_id % 7 = 0 THEN upper(source)
                    WHEN doc_id % 3 = 0 THEN upper(substr(source, 1, 1))
                                             || substr(source, 2)
                    ELSE source END AS src_cased,
               n_chars
        FROM documents
    )
    SELECT lower(src_cased) AS source_key,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT src_cased) AS BIGINT) AS n_case_variants,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM mangled
    GROUP BY lower(src_cased)
    ORDER BY source_key
    """,
)
def sql_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): deterministic
    case-mangling is injected into `source` (every 7th doc uppercased,
    every 3rd title-cased), then the group key is the column COLLATED
    as UTF8_LCASE — the engine groups case-insensitively with no
    lower() rewrite of the data, which is the point of collations: the
    comparison semantics move into the type, so every downstream
    join/sort/distinct inherits them. n_case_variants counts the
    distinct raw spellings per group (binary-collated DISTINCT inside
    a lowercase-collated GROUP BY — two collations in one aggregate);
    the output key is explicitly lowercased because a collated group's
    representative value is whichever spelling a partition saw first.
    """
    docs = load_table(spark, sf_dir, "documents")
    mangled = docs.select(
        F.when(F.col("doc_id") % 7 == 0, F.upper("source"))
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.upper(F.substring("source", 1, 1)), F.expr("substr(source, 2)")),
        )
        .otherwise(F.col("source"))
        .alias("src_cased"),
        "n_chars",
    )
    return (
        mangled.groupBy(F.expr("collate(src_cased, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.expr("collate(src_cased, 'UTF8_BINARY')"))
            .cast("long")
            .alias("n_case_variants"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.lower(F.col("k").cast("string")).alias("source_key"),
            "n_docs",
            "n_case_variants",
            "total_chars",
        )
        .orderBy("source_key")
    )


@query(
    "ingest_binary_files",
    oracle="""
    WITH first_doc AS (
        SELECT source, arg_min(text, doc_id) AS text
        FROM documents GROUP BY source
    )
    SELECT source,
           1 AS n_files,
           CAST(octet_length(encode(text)) + 1 AS BIGINT) AS n_bytes,
           md5(text || chr(10)) AS content_md5
    FROM first_doc
    ORDER BY source
    """,
)
def ingest_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` ingestion certified end-to-end — the multimodal
    entry point: opaque blobs land as (path, length, content binary)
    rows, keys derive from the PATH, and payload integrity is proven by
    checksum against the source of truth. One blob per source is staged
    from its lowest-id document (a Spark text write, source-partitioned
    directories, one row per source → exactly one file each, '\\n'
    appended by the sink — accounted for in both checksums), then read
    back with format('binaryFile') + recursiveFileLookup +
    pathGlobFilter('*.txt') (recursive lookup disables partition
    inference, so the source key is regexp-extracted from the path —
    the standard layout-to-column recovery for blob stores).

    Scale shape: binaryFile streams each blob as ONE row — fine for
    media objects; the md5/length projection is per-row expression
    work, and everything aggregates per directory key. The oracle
    counts UTF-8 BYTES (octet_length(encode(..)) — char length
    undercounts any non-ASCII doc, which the docs edge sweep caught)
    plus the sink's newline; md5 over VARCHAR already hashes UTF-8
    bytes on both engines.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    first_doc = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "text")
    )
    out_dir = run_dir("binary_blobs", sf_dir)
    first_doc.write.mode("overwrite").partitionBy("source").text(out_dir)
    blobs = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.txt")
        .load(out_dir)
    )
    return (
        blobs.select(
            F.regexp_extract("path", "source=([^/]+)", 1).alias("source"),
            F.col("length"),
            F.md5("content").alias("content_md5"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_files"),
            F.sum("length").cast("long").alias("n_bytes"),
            F.min("content_md5").alias("content_md5"),
        )
        .orderBy("source")
    )


@query(
    "observe_export_metrics",
    oracle=f"""
    WITH exported AS (
        SELECT * FROM orders WHERE o_totalprice >= 1000.0
    )
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT) AS n_null_dates,
           {dround('MIN(o_totalprice)', 2)} AS min_price,
           {dround('MAX(o_totalprice)', 2)} AS max_price,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_scanned
    FROM exported
    """,
)
def observe_export_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.observe()` riding a WRITE action — the export circuit
    breaker: the filtered orders stream to parquet while an Observation
    accumulates row count, null count and price bounds; the entry
    returns those observed metrics (plus a second observation on the
    pre-filter scan) as one row, so a pipeline can abort on bad metrics
    without a validation pass over the data it just wrote. Sibling of
    `observe_filter_funnel_metrics`, which attaches observations to a
    QUERY's own action — together they cover both halves of the
    Observation API's production use.

    The observed values are deterministic aggregates (count/min/max
    commute with partitioning), so the entry stays hash-checkable
    against an oracle that recomputes them relationally. Metrics travel
    driver-side as O(1) rows — the data path is untouched.
    """
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs_scan = Observation("scan")
    obs_export = Observation("export")
    staged = (
        orders.observe(obs_scan, F.count(F.lit(1)).alias("n_scanned"))
        .filter(F.col("o_totalprice") >= 1000.0)
        .observe(
            obs_export,
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("n_null_dates"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    staged.write.mode("overwrite").parquet(run_dir("observed_orders", sf_dir))
    m_export, m_scan = obs_export.get, obs_scan.get
    # min/max observe as None when the filter matched nothing (the
    # degenerate-input class): pass NULL through, never float(None).
    row = [
        (
            int(m_export["n_rows"]),
            int(m_export["n_null_dates"]),
            None if m_export["min_price"] is None else float(m_export["min_price"]),
            None if m_export["max_price"] is None else float(m_export["max_price"]),
            int(m_scan["n_scanned"]),
        )
    ]
    out = spark.createDataFrame(
        row, "n_rows long, n_null_dates long, min_price double, max_price double, n_scanned long"
    )
    return out.select(
        "n_rows",
        "n_null_dates",
        hround("min_price", 2).alias("min_price"),
        hround("max_price", 2).alias("max_price"),
        "n_scanned",
    )


@query(
    "scan_path_glob_filter",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 15)) AS BIGINT)) AS content_fp
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    ORDER BY source
    """,
)
def scan_path_glob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-selection options on the parquet source: write the English
    slice of `documents` under nested `lang=en/part*.parquet` dirs,
    PLANT decoys next to the real files (a `.csv`, a `.parquet.bak`,
    and a `_manifest.json` — exactly what real lake directories
    accumulate), then read back with `recursiveFileLookup` +
    `pathGlobFilter='*.parquet'` and certify BY CONTENT that precisely
    the planted parquet rows — no decoy, nothing missed — were read:
    the oracle computes the same per-source counts and an
    order-insensitive md5-slice XOR fingerprint straight from the
    original table (the audit_table_digest idiom — DuckDB's hash()
    is not xxhash64).

    recursiveFileLookup disables partition discovery (dir names carry
    no columns — the slice keeps its own `source`/`lang` columns), and
    pathGlobFilter filters on file NAME, the standard way to skim a
    mixed-content landing zone without a manifest. If either option
    regressed (decoy read -> parse error or extra rows; subdir skipped
    -> missing rows) the fingerprint breaks. At 100 TB file listing
    itself is the scan bottleneck — glob filtering happens in the
    driver-side listing, before any executor opens a file; the planted
    decoys cost O(#files), not O(bytes).
    """
    import os

    from ..sources.sinks import run_dir

    out_dir = run_dir("glob_docs", sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    (
        docs.repartition(4)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lang=en"))
    )
    # decoys a glob-filtered recursive scan must skip
    with open(os.path.join(out_dir, "lang=en", "_manifest.json"), "w") as f:
        f.write('{"note": "not data"}')
    with open(os.path.join(out_dir, "lang=en", "decoy.csv"), "w") as f:
        f.write("doc_id,text\n999999,decoy\n")
    with open(os.path.join(out_dir, "stale.parquet.bak"), "w") as f:
        f.write("junk bytes")
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(out_dir)
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.bit_xor(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.md5("text"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
            ).alias("content_fp"),
        )
        .orderBy("source")
    )
