"""Heavy-entry bench: cross-round perf tracking for the expensive plans.

The headline suite (bench.py) is frozen at 13 queries for cross-round
comparability with BENCH_r01; the registry's costliest extension entries
would distort that total, so they are tracked HERE instead. Prints one
BENCH-style JSON line and, with --record, appends it to
docs/BENCH_HEAVY.jsonl so the trend survives rounds:

    python tools/bench_heavy.py [--repeat N] [--record] [--sf1 | --sf1f]
                                [--round N]

--sf1 (r8 VERDICT task 6) switches to the synthesized 10× dataset
(.localdata/sf1, regenerate with tools/make_sf.py) and to the SF1 suite:
the scale twins and banded/IVF production paths whose regressions only
show above the bench SF. The Θ(block²) exact baselines are deliberately
NOT in the sf1 suite — they are documented small-data semantics whose
~400 s runtimes would drown the twins the trend exists to watch; their
scaling story lives in docs/SCALING_SF1.md. Emits metric
heavy_suite_sf1_sec so JSONL consumers never mix the two totals.

--sf1f (r9 VERDICT task 4) is the SAME suite over the fresh-content 10×
corpus (.localdata/sf1f, tools/make_sf.py --fresh-content): replicated
sf1 carries mult² duplicate density, so its absolute numbers overstate
production cost and silently drift if synthesis changes; the fresh
corpus has within-replica density only. Adds dedup_lsh_clusters (the
composed global-dedup path), which replicated sf1 excludes by
construction. Metric heavy_suite_sf1f_sec — the trend to extend from
r10 on.

Every line now carries round + date (r9 VERDICT task 4): round is
--round if given, else 1 + the highest BENCH_r{N}.json in the repo root
(the driver writes round N's file AFTER the round, so during round N
the max on disk is N-1).

Same harness discipline as bench.py: $SPARK_GRAFT_SF_DIR data dir,
best-of-N with --repeat, per-query isolation so one failure doesn't cost
the artifact. Timings are only comparable same-VM (ROUND_NOTES r3).

Trend trustworthiness (r10 VERDICT task 2): four same-round sf1f records
spanned 391-568 s — ±40% box-load noise, too wide to detect a twin
regression. So --record now (a) forces repeat >= 3, recording the min of
three warm passes (r11 task 4: min-of-2 still left 13% max-to-min
spread across records, above the <10% target); (b) stamps the 1-minute
load average into the JSON line; and (c) REFUSES to record at all when
the box is already busy (load1 > --max-load, default 4.0 on this 32-CPU
box) — a contended single shot is worse than no data point. Ad-hoc runs
without --record keep repeat 1.

Suite split by scale_class (r11 VERDICT task 4): exact-baseline twins'
scaling laws are pinned in docs/SCALING_SF10.md; the recurring trend
benches production + certification entries only (at sf1f that removes
97 of ~313 s — sim_lsh_hyperplane 76.9 s, dedup_simhash 20.2 s — whose
re-measurement bought nothing and doubled noise exposure). Pass
--include-baselines for an on-demand all-entries sweep. Each JSONL line
carries suite_filter + value_by_class so totals never mix filters;
per-query trends stay comparable across every line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_electricity_spark.plans import REGISTRY  # noqa: E402
from bigdata_electricity_spark.session import get_spark  # noqa: E402

HEAVY = [
    "dedup_cc_clusters",              # near-dup pair-gen + star-contraction CC
    "graph_label_propagation",        # sync LPA rounds over the similarity graph
    "streaming_stream_stream_join",   # state-store-bound stream-stream join
    "embedding_pca_top_component",    # covariance join + power iteration
    "dedup_minhash_lsh",              # rolling-hash shingles + banded LSH
    "sim_bucketed_nn",                # bucketed ANN pair verification
    "ml_linear_regression",           # assemble/scale/fit/eval pipeline
    # r8 additions (suite TOTAL comparable only from r8 on; per-query
    # trends remain comparable throughout): the prefix-filtered scale
    # twins and the scaled-nlist IVF from the sf1 audit.
    "dedup_ngram_jaccard_prefix",
    "dedup_cc_clusters_prefix",
    "sim_ivf_scaled_nlist",
]

# --sf1 suite: every scale twin + the banded/IVF production paths + the
# composed global-dedup entry. Linear plans whose twin-regressions only
# become visible above the bench SF.
HEAVY_SF1 = [
    "dedup_ngram_jaccard_prefix",
    "dedup_containment_best_prefix",
    "dedup_cc_clusters_prefix",
    # dedup_lsh_clusters is deliberately absent: replicated sf1 makes
    # every cross-replica copy a TRUE near-dup, so the global edge set
    # is quadratic by construction — the artifact --fresh-content
    # exists to remove. Its scaling lives in the sf1f/sf3f/sf10f fresh
    # sweeps (docs/SCALING_SF10.md).
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_lsh_hyperplane",
    "sim_ivf_scaled_nlist",
    "sim_ivf_probe_topk",
    "graph_triangle_stats_scaled",
    "sketch_shard_merge",
    "binning_equal_frequency_approx",
]


def _current_round(repo_root: str) -> int:
    """1 + the highest recorded BENCH_r{N}.json (driver writes round N's
    file after round N ends, so during round N the max on disk is N-1)."""
    rounds = [0]
    for f in os.listdir(repo_root):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main() -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suite = HEAVY
    metric = "heavy_suite_sec"
    if "--sf1" in sys.argv:
        sf_dir = "/root/repo/.localdata/sf1"
        suite = HEAVY_SF1
        metric = "heavy_suite_sf1_sec"
        if not os.path.isdir(sf_dir):
            sys.exit("--sf1 needs .localdata/sf1 — run: python tools/make_sf.py")
    if "--sf1f" in sys.argv:
        sf_dir = "/root/repo/.localdata/sf1f"
        # r10 additions: the incremental-ingest pair. Suite TOTAL is
        # comparable from r10 on; per-query trends throughout.
        # r10 additions: the incremental-ingest pair; r13 additions
        # (r12 VERDICT task 6): the substring-dedup pair + the
        # streaming embedding-ingest gate — one-off TIME records until
        # now, recurring trend from r13 on; late-r13: the composed
        # curation_pipeline (quality→dedup→mix), measured clean at 5M
        # docs (docs/TIME_sf100f_breadth_r13.json) and now trended here
        # like the other composed plans. Suite TOTAL comparable within
        # the same suite version; per-query trends throughout.
        suite = HEAVY_SF1 + ["dedup_lsh_clusters",
                             "dedup_incremental_batch",
                             "sim_incremental_batch",
                             "dedup_substring_rolling",
                             "dedup_substring_incremental",
                             "streaming_incremental_sim",
                             "curation_pipeline"]
        metric = "heavy_suite_sf1f_sec"
        if not os.path.isdir(sf_dir):
            sys.exit("--sf1f needs .localdata/sf1f — run: "
                     "python tools/make_sf.py --fresh-content --mult 10 "
                     "--out .localdata/sf1f")
    round_no = _current_round(repo_root)
    if "--round" in sys.argv:
        idx = sys.argv.index("--round")
        if idx + 1 >= len(sys.argv) or not sys.argv[idx + 1].isdigit():
            sys.exit("usage: bench_heavy.py [--round N]")
        round_no = int(sys.argv[idx + 1])
    repeat = 1
    if "--repeat" in sys.argv:
        idx = sys.argv.index("--repeat")
        if idx + 1 >= len(sys.argv) or not sys.argv[idx + 1].isdigit():
            sys.exit("usage: bench_heavy.py [--repeat N] [--record]")
        repeat = int(sys.argv[idx + 1])
        if repeat < 1:
            # "0".isdigit() is True, so catch non-positive here: repeat=0
            # would skip the timing loop and leave best=None for every entry.
            sys.exit("usage: bench_heavy.py [--repeat N] [--record] (N >= 1)")
    record = "--record" in sys.argv
    # r11 VERDICT task 4: exact-baseline twins' scaling laws are already
    # pinned (docs/SCALING_SF10.md) — re-measuring them every trend run
    # bought nothing and doubled noise exposure (97 of 313 s at sf1f).
    # The recurring trend benches PRODUCTION + certification entries
    # only; pass --include-baselines for an on-demand baseline sweep.
    if "--include-baselines" not in sys.argv:
        suite = [
            n for n in suite if REGISTRY[n].scale_class != "exact-baseline"
        ]
    max_load = 4.0
    if "--max-load" in sys.argv:
        idx = sys.argv.index("--max-load")
        if idx + 1 >= len(sys.argv):
            sys.exit("usage: bench_heavy.py [--max-load X]")
        max_load = float(sys.argv[idx + 1])
    load1 = os.getloadavg()[0]
    if record and load1 > max_load:
        sys.exit(
            f"refusing --record: 1-min load average {load1:.2f} > {max_load:.1f} "
            "— a contended run pollutes the trend (rerun when idle, or raise "
            "--max-load deliberately)"
        )
    if record and repeat < 3:
        # Recorded points are min-of-3 warm passes (r11 VERDICT task 4:
        # min-of-2 left 13% max-to-min spread across records; the target
        # is <10%). A single shot on a shared box swung ±40% (r10).
        repeat = 3
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench_heavy")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # session warm-up

    timings: dict[str, float] = {}
    errors: list[str] = []
    for name in suite:
        try:
            best, n = None, 0
            for _ in range(repeat):
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, sf_dir)
                n = df.count()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            timings[name] = round(best, 3)
            print(f"# {name}: {n} rows in {timings[name]:.3f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            errors.append(name)
            print(f"# {name}: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)

    by_class: dict[str, float] = {}
    for name, sec in timings.items():
        cls = REGISTRY[name].scale_class
        by_class[cls] = round(by_class.get(cls, 0.0) + sec, 3)
    out = {
        "metric": metric,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "value_by_class": by_class,
        "sf": sf,
        "repeat": repeat,
        "round": round_no,
        "date": time.strftime("%Y-%m-%d"),
        "load1_at_start": round(load1, 2),
        # suite TOTALS are only comparable within the same filter;
        # per-query trends remain comparable across all lines.
        "suite_filter": (
            "all" if "--include-baselines" in sys.argv
            else "production+certification"
        ),
    }
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    print(line)
    if record:
        with open(os.path.join(repo_root, "docs", "BENCH_HEAVY.jsonl"), "a") as f:
            f.write(line + "\n")
    spark.stop()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
