"""Sinks. The only custom plumbing the reference has: a single-file CSV export.

The reference triplicates this utility (Cleaning.scala:155-178,
Transformation.scala:92-115, reduction.scala:52-76): coalesce(1) → write
CSV into a temp dir → rename the part file → delete the temp dir. One
shared implementation here (SURVEY §4.3.5).

``coalesce(1)`` lives ONLY inside this explicit export operator — never on
a compute path (it would serialize the whole plan through one task at
scale). For big outputs use :func:`write_parquet` which keeps
parallelism and is the engine's interchange format (SURVEY §4.3.4).
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import time

from pyspark.sql import DataFrame


def run_dir(entry: str, sf_dir: str) -> str:
    """Per-run scratch directory for export / round-trip entries.

    A fixed output path lets two concurrent driver sessions clobber each
    other's round-trip audits (one overwrites the directory the other is
    reading back). Deriving the path from the data dir's basename AND
    the process id isolates concurrent runs, while staying idempotent
    within one process (every writer uses mode("overwrite"), so reruns
    of an entry in the same session overwrite their own output).
    spark-warehouse/ is gitignored scratch; sibling dirs for the same
    (entry, tag) left by processes that no longer exist are pruned
    best-effort on each call so repeated driver/test runs don't
    accumulate unbounded scratch copies of the big tables.
    """
    tag = re.sub(r"[^A-Za-z0-9_.-]+", "_",
                 os.path.basename(os.path.normpath(sf_dir)) or "data")
    _prune_dead_run_dirs(f"{entry}_{tag}")
    return f"/root/repo/spark-warehouse/{entry}_{tag}_pid{os.getpid()}"


def _pid_start_epoch(pid: int) -> float | None:
    """Best-effort start time (epoch seconds) of ``pid`` via /proc.

    Field 22 of /proc/<pid>/stat is the start time in clock ticks since
    boot; the process name (field 2) may contain spaces/parens, so the
    parse splits after the LAST ')'. Returns None off-Linux or on any
    read/parse failure — callers fall back to liveness-only pruning.
    """
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            stat = fh.read().decode("ascii", "replace")
        ticks = float(stat.rsplit(")", 1)[1].split()[19])
        with open("/proc/uptime") as fh:
            uptime = float(fh.read().split()[0])
        return time.time() - uptime + ticks / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


def _prune_dead_run_dirs(prefix: str) -> None:
    """Delete spark-warehouse/<prefix>_pid<N> trees whose pid is dead
    OR whose pid was recycled by a younger, unrelated process.

    Liveness alone (kill -0) under-prunes: on a long-lived machine the
    OS reuses pids, so a stale dir can be "protected" forever by an
    unrelated process that happens to hold the number, and zombies pass
    the probe too. The tiebreaker is causal: the dir's mtime is bounded
    above by its creator's lifetime (the creator is the only writer),
    so if the process now holding the pid STARTED after the dir was
    last touched (60 s slack for clock fuzz), it cannot be the creator
    — the dir is debris and is reclaimed. Where /proc is unavailable
    the probe stays liveness-only (best-effort, documented).

    A live concurrent run's dir is never touched (its pid is alive and
    its process predates its own writes), and any filesystem race just
    leaves the dir for the next call. Keeps the scratch area bounded by
    the number of CONCURRENT runs instead of the number of historical
    ones.
    """
    for path in glob.glob(f"/root/repo/spark-warehouse/{prefix}_pid[0-9]*"):
        m = re.search(r"_pid(\d+)$", path)
        if not m or int(m.group(1)) == os.getpid():
            continue
        pid = int(m.group(1))
        try:
            os.kill(pid, 0)  # raises if the pid is gone
        except ProcessLookupError:
            shutil.rmtree(path, ignore_errors=True)
            continue
        except PermissionError:
            pass  # pid exists but owned elsewhere — fall through to age check
        started = _pid_start_epoch(pid)
        try:
            if started is not None and started > os.path.getmtime(path) + 60:
                shutil.rmtree(path, ignore_errors=True)  # recycled pid
        except OSError:
            pass  # dir vanished under us — nothing to prune


def run_table(base: str) -> str:
    """Per-run catalog table identifier, mirroring ``run_dir``.

    A pid-isolated file path alone only half-closes the concurrency
    hole: two drivers sharing a metastore still race on the
    DROP TABLE + saveAsTable sequence if the table NAME is fixed.
    Suffixing the identifier the same way as the path makes the whole
    (name, location) pair per-process. Table names can't contain dots
    or dashes, so only [A-Za-z0-9_] survives.
    """
    safe = re.sub(r"[^A-Za-z0-9_]+", "_", base)
    return f"{safe}_pid{os.getpid()}"


def save_single_csv(df: DataFrame, out_path: str, header: bool = True) -> str:
    """S6 — export a (small) DataFrame as exactly one CSV file at ``out_path``.

    Mirrors reference Cleaning.scala:155-178 semantics: overwrite, header,
    single part file renamed to the target name. Uses local-FS rename
    (the reference drives Hadoop FS via the JVM; for local/posix paths
    shutil is equivalent and avoids py4j round-trips).
    """
    tmp_dir = out_path + "__tmp"
    (df.coalesce(1).write.option("header", str(header).lower())
       .mode("overwrite").csv(tmp_dir))
    part = glob.glob(os.path.join(tmp_dir, "part-*.csv"))
    if not part:  # e.g. compressed part files
        part = [p for p in glob.glob(os.path.join(tmp_dir, "part-*")) if not p.endswith(".crc")]
    if os.path.exists(out_path):
        os.remove(out_path)
    shutil.move(part[0], out_path)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_path


def write_parquet(df: DataFrame, out_dir: str, partition_by: list[str] | None = None) -> str:
    """Parquet sink — the engine's default intermediate/interchange format."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_dir)
    return out_dir


def write_bucketed_table(df: DataFrame, table_name: str, bucket_col: str,
                         n_buckets: int = 16,
                         sort_col: str | None = None,
                         path: str | None = None) -> str:
    """Bucketed managed-table sink: pre-shuffles ONCE at write time so
    every later equi-join/aggregation on ``bucket_col`` between
    co-bucketed tables runs shuffle-free (SortMergeJoin without
    Exchange).

    The 100 TB pattern for repeatedly-joined fact tables: pay the
    partitioning once, reuse it across the workload. Spark buckets only
    via ``saveAsTable`` (the bucket metadata lives in the catalog).
    tests/test_bucketing.py asserts the co-located join plan contains no
    shuffle exchange.

    ``path`` pins the table files to an explicit location (external
    table) — pass it when the session's warehouse dir (defaults to
    cwd/spark-warehouse) is not a place you control.
    """
    # saveAsTable cannot redefine an existing EXTERNAL table's layout in
    # one step on every catalog; drop first so overwrite is total.
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    return table_name


def export_corpus(df: DataFrame, out_dir: str, partition_col: str) -> DataFrame:
    """Publish a curated corpus: parquet partitioned by ``partition_col``
    (e.g. predicted language or source domain) plus a manifest DataFrame
    — one row per partition value with its doc count, computed from the
    written files themselves (not the input plan), so the manifest
    certifies what actually landed on disk.

    At scale the partition column doubles as the mixture-control handle:
    a trainer reads `lang=en/` directories directly, and directory
    pruning keeps unrelated partitions unscanned.
    """
    import pyspark.sql.functions as F

    df.write.mode("overwrite").partitionBy(partition_col).parquet(out_dir)
    spark = df.sparkSession
    written = spark.read.parquet(out_dir)
    return (
        written.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(partition_col)
    )


def compact_parquet(spark, in_dir: str, out_dir: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) evenly-sized files. Returns the file count.

    The lakehouse maintenance op streaming/incremental writers make
    necessary — thousands of KB-sized part files turn scan planning and
    task scheduling into the bottleneck. Sizing from the actual on-disk
    bytes (not row counts) keeps output files near the row-group sweet
    spot regardless of schema width. The rewrite is one round-robin
    repartition — no key skew, fully parallel.
    """
    import glob as _glob
    import math
    import os as _os

    total = sum(
        _os.path.getsize(p)
        for p in _glob.glob(_os.path.join(in_dir, "**", "*.parquet"), recursive=True)
        if _os.path.isfile(p)
    ) or sum(
        _os.path.getsize(_os.path.join(r, f))
        for r, _, fs in _os.walk(in_dir)
        for f in fs
        if f.startswith("part-")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(in_dir).repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return n_files


def export_jsonl(df: DataFrame, out_dir: str) -> DataFrame:
    """Publish a corpus as JSON-Lines shards (the lingua franca of LLM
    training-data interchange) and return the READ-BACK DataFrame.

    ``df.write.json`` emits one JSON object per line per part file —
    exactly the sharded .jsonl layout trainers consume, written in
    parallel (one shard per task, no coalesce). The return value is
    re-read from disk with the input's own schema pinned (schema
    inference on read would widen/reorder fields), so any manifest
    computed over it certifies the files that actually landed.
    """
    df.write.mode("overwrite").json(out_dir)
    return df.sparkSession.read.schema(df.schema).json(out_dir)
