"""Round-over-round shuffle-BYTE trend (r12 VERDICT task 5).

Wall-clock on this shared box drifts ±10% with load; the bytes a plan
moves do not. This runs the 13-query headline suite plus the heaviest
recurring production entries through tools/shuffle_bytes.measure_one
(noop-sink materialization, per-query session) and appends ONE line to
docs/SHUFFLE_TREND.jsonl:

    {"round": N, "date": ..., "sf_dir": ..., "queries":
     {name: {"shuffle_write_bytes": W, "shuffle_read_bytes": R}},
     "flags": ["name: 1.7x write vs r12", ...]}

FLAG THRESHOLD: a query whose shuffle-write bytes exceed 1.5× the
previous recorded line's value (and 10 MB absolute — sub-10 MB deltas
are AQE coalescing noise at sf0.1) is a PLAN regression even when
wall-time noise hides it. Flags print prominently and are recorded in
the line; exit is 0 unless --strict (the closing gate prints them for
adjudication — a deliberate plan change legitimately moves bytes, so a
hard failure would punish intentional rewrites).

    python tools/shuffle_trend.py [--sf-dir DIR] [--round N] [--strict]
"""

from __future__ import annotations

import importlib.util
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "SHUFFLE_TREND.jsonl")

# The heaviest recurring PRODUCTION entries at the bench SF — the plans
# whose byte regressions matter most at 100 TB (the exact-baseline
# twins are excluded for the same reason bench_heavy excludes them).
EXTRA = [
    "dedup_lsh_clusters",
    "dedup_incremental_batch",
    "sim_incremental_batch",
    "dedup_substring_rolling",
    "dedup_minhash_lsh",
]

FLAG_RATIO = 1.5
FLAG_ABS_BYTES = 10 * 1024 * 1024


def _load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _current_round() -> int:
    rounds = [0]
    for f in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def _previous_line() -> dict | None:
    if not os.path.exists(OUT):
        return None
    last = None
    with open(OUT) as fh:
        for ln in fh:
            ln = ln.strip()
            if ln:
                last = json.loads(ln)
    return last


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    round_no = _current_round()
    if "--round" in args:
        i = args.index("--round")
        round_no = int(args[i + 1])
        del args[i : i + 2]
    strict = "--strict" in args

    bench = _load_module("bench_headline", os.path.join(REPO, "bench.py"))
    sb = _load_module("shuffle_bytes", os.path.join(REPO, "tools",
                                                    "shuffle_bytes.py"))
    suite = list(bench.HEADLINE) + EXTRA
    prev = _previous_line()
    prev_q = (prev or {}).get("queries", {})

    line = {"round": round_no,
            "date": time.strftime("%Y-%m-%d %H:%M:%S"),
            "sf_dir": sf_dir, "queries": {}, "flags": []}
    for name in suite:
        m = sb.measure_one(name, sf_dir)
        cur = {"shuffle_write_bytes": m["shuffle_write_bytes"],
               "shuffle_read_bytes": m["shuffle_read_bytes"]}
        line["queries"][name] = cur
        pw = prev_q.get(name, {}).get("shuffle_write_bytes")
        tag = ""
        if pw is not None and cur["shuffle_write_bytes"] > max(
                FLAG_RATIO * pw, pw + FLAG_ABS_BYTES):
            ratio = cur["shuffle_write_bytes"] / max(pw, 1)
            flag = (f"{name}: shuffle-write {ratio:.2f}x vs "
                    f"r{prev['round']} ({pw:,} -> "
                    f"{cur['shuffle_write_bytes']:,})")
            line["flags"].append(flag)
            tag = "  << FLAG"
        print(f"{name}: write={cur['shuffle_write_bytes']:,} "
              f"read={cur['shuffle_read_bytes']:,}{tag}", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(line) + "\n")
    if line["flags"]:
        print("SHUFFLE-TREND FLAGS (plan regressions unless deliberate):",
              flush=True)
        for f in line["flags"]:
            print(f"  {f}", flush=True)
        return 2 if strict else 0
    print(f"shuffle trend: {len(suite)} queries recorded, 0 flags",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
