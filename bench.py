"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "steady_value": sec, "queries_steady": {...},
"sf": ...}. The driver runs this per-round and records BENCH_r{N}.json;
target is ≤2× the driver BASELINE (BASELINE.md). "value"/"queries" are
the COLD pass (per-query Catalyst compile included — the historically
comparable number); "steady_value"/"queries_steady" are the best of the
follow-up in-process passes, which strip compile + first-touch cost and
are the number to compare across rounds on a noisy shared VM.

Headline set spans the engine's plan shapes: full-table agg, star join,
window rank, event-time windows, sessionization, text analysis, exact
dedup, and embedding top-k — the queries whose physical plans matter most
at 100 TB (SURVEY §4).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_electricity_spark.plans import REGISTRY  # noqa: E402
from bigdata_electricity_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1_pricing_summary",   # wide scan + 8-agg groupBy
    "join_revenue_by_nation",    # 4-way star join (broadcast dims)
    "join_region_rollup",        # 6-way join rollup
    "q5_top_month_per_year",     # groupBy + partitioned window rank
    "events_tumbling_10min",     # event-time tumbling window agg
    "events_sessionization",     # gap-based session windows (lag + cumsum)
    "rdd_top5_days",             # agg + global top-k (TakeOrderedAndProject)
    "text_stats",                # documents: tokenize/length profile
    "dedup_exact_groups",        # hash-groupBy duplicate detection
    "sim_topk_bruteforce",       # embedding cosine top-k (higher-order fns)
    "tpch_q3_shipping_priority", # selective dim filter + grouped top-k join
    "tpch_q6_forecast_revenue",  # pure scan pushdown, join-free agg
    "decon_ngram_overlap",       # n-gram explode + broadcast semi-ish join
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # --repeat N: total suite passes. Pass 1 is COLD (includes each
    # query's Catalyst+codegen compile — what the driver's run sees and
    # what BASELINE.md was measured as); passes 2..N are STEADY and the
    # best one is reported alongside. Default 2 so every bench artifact
    # carries both numbers: round-over-round comparisons on this
    # shared/noisy VM need the steady number to tell a plan regression
    # from a slow box (r7 VERDICT task 1). --repeat 1 = cold only.
    repeat = 2
    if "--repeat" in sys.argv:
        idx = sys.argv.index("--repeat")
        if idx + 1 >= len(sys.argv) or not sys.argv[idx + 1].isdigit():
            sys.exit("usage: bench.py [--repeat N] [--record]")
        repeat = int(sys.argv[idx + 1])
        if repeat < 1:
            sys.exit("usage: bench.py [--repeat N] [--record] (N >= 1)")
    record = "--record" in sys.argv
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")

    # Warm the JVM/session so per-query timings measure the plan, not
    # one-time class-loading/JIT. The 1-row ladder below exercises the
    # expression-class families the headline set uses (regex, hash,
    # window, join, explode, higher-order fns): first use of e.g.
    # regexp_replace inside whole-stage codegen pays ~3-4 s of
    # Janino/JIT warm-up that would otherwise land on whichever query
    # hits it first. Each query's own Catalyst compile is still timed.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    one = spark.range(2).select(
        F.col("id"),
        F.lit("a b  c").alias("s"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("v"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    one.select(
        F.md5(F.trim(F.regexp_replace(F.lower("s"), r"\s+", " "))).alias("fp"),
        F.aggregate(F.zip_with("v", "v", lambda a, b: a * b),
                    F.lit(0.0), lambda acc, x: acc + x).alias("dot"),
        F.explode(F.split("s", " ")).alias("tok"),
    ).groupBy("fp").count().count()
    one.withColumn("rn", F.row_number().over(
        Window.partitionBy("s").orderBy("id"))).join(
        one.select(F.col("id").alias("jid")), F.col("id") == F.col("jid")
    ).groupBy(F.window("ts", "10 minutes")).count().count()

    timings: dict[str, float] = {}          # pass 1: cold
    steady: dict[str, float] = {}           # best of passes 2..N
    errors: list[str] = []
    for p in range(1, repeat + 1):
        for name in HEADLINE:
            if name in errors:
                continue
            # One broken query must not cost the whole bench artifact:
            # record the failure, keep timing the rest, still emit JSON.
            try:
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, sf_dir)
                n = df.count()
                el = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errors.append(name)
                print(f"# {name}: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
                continue
            if p == 1:
                timings[name] = el
                print(f"# {name}: {n} rows in {el:.3f}s", file=sys.stderr)
            elif name not in steady or el < steady[name]:
                steady[name] = el
        if p > 1:
            print(f"# steady pass {p - 1}/{repeat - 1} done", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if steady:
        out["steady_value"] = round(sum(steady.values()), 3)
        out["queries_steady"] = steady
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    if record:
        # Same-VM trend artifact (r7 VERDICT task 1): cold + steady per
        # session, appended so round-over-round VM variance is provable.
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "BENCH_HEADLINE.jsonl"), "a") as fh:
            fh.write(json.dumps(out) + "\n")
    spark.stop()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
