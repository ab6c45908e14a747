"""Heavy-entry bench: cross-round perf tracking for the expensive plans.

The headline suite (bench.py) is frozen at 13 queries for cross-round
comparability with BENCH_r01; the registry's costliest extension entries
would distort that total, so they are tracked HERE instead. Prints one
BENCH-style JSON line and, with --record, appends it to
docs/BENCH_HEAVY.jsonl so the trend survives rounds:

    python tools/bench_heavy.py [--repeat N] [--record]

Same harness discipline as bench.py: $SPARK_GRAFT_SF_DIR data dir,
best-of-N with --repeat, per-query isolation so one failure doesn't cost
the artifact. Timings are only comparable same-VM (ROUND_NOTES r3).
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench_heavy")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # session warm-up

    timings: dict[str, float] = {}
    errors: list[str] = []
    for name in HEAVY:
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

    out = {
        "metric": "heavy_suite_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "repeat": repeat,
    }
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    print(line)
    if "--record" in sys.argv:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "docs", "BENCH_HEAVY.jsonl"), "a") as f:
            f.write(line + "\n")
    spark.stop()
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
