"""Cross-round bench trend: per-query timings across BENCH_r{N}.json.

The driver records one BENCH_r{N}.json per round; this prints a
query × round table plus deltas against the previous round so plan
regressions stand out immediately (ROUND_NOTES: deltas under ~1 s/query
on cold runs are Catalyst/codegen compile noise, not regressions).

    python tools/bench_trend.py [dir=/root/repo]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def load_rounds(root: str) -> list[tuple[int, dict]]:
    rounds = []
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (json.JSONDecodeError, OSError) as exc:
            print(f"warn: skipping {path}: {exc}", file=sys.stderr)
            continue
        # The driver nests bench.py's JSON line under "parsed".
        if "queries" not in data and isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        rounds.append((int(m.group(1)), data))
    return sorted(rounds)


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
    rounds = load_rounds(root)
    if not rounds:
        print(f"no BENCH_r*.json under {root}")
        return 0
    queries: list[str] = []
    for _, data in rounds:
        for q in data.get("queries", {}):
            if q not in queries:
                queries.append(q)
    header = ["query"] + [f"r{n}" for n, _ in rounds] + ["Δ last"]
    widths = [max(len(q) for q in queries + ["query", "TOTAL"]) + 1]
    rows: list[list[str]] = []
    for q in queries:
        vals = [data.get("queries", {}).get(q) for _, data in rounds]
        cells = [f"{v:.2f}" if v is not None else "-" for v in vals]
        present = [v for v in vals if v is not None]
        delta = f"{present[-1] - present[-2]:+.2f}" if len(present) >= 2 else "-"
        rows.append([q, *cells, delta])
    totals = [data.get("value") for _, data in rounds]
    t_delta = f"{totals[-1] - totals[-2]:+.2f}" if len(totals) >= 2 else "-"
    rows.append(["TOTAL", *[f"{t:.2f}" if t is not None else "-" for t in totals], t_delta])
    widths += [max(len(r[i]) for r in rows + [header]) + 1 for i in range(1, len(header))]
    for line in [header, *rows]:
        print("".join(c.ljust(w) for c, w in zip(line, widths)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
