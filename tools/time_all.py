"""Spark-side-only timing of every registry query at a given SF.

parity.py checks values at sf0.01; this runs ONLY the Spark side at a
larger SF (default sf0.1, 10× the driver's correctness SF) and flags
queries whose runtime scales pathologically — the local proxy for "would
this survive the next 10×". No DuckDB, no value compare.

    python tools/time_all.py [sf_dir] [--flag-sec N] [--json out.json]
                             [--only name1,name2,...] [--partitions N]

--only restricts the sweep to a comma-separated subset of registry
entries (the heavy tier for large synthesized SFs, where a full-registry
sweep would burn hours on entries already proven linear).

Shuffle partitions scale with the sweep SF (r9 VERDICT task 5):
32 · (sf/0.1) capped at 256 — constant bytes-per-partition as the data
grows, so decade ratios measure the PLAN, not the 32-partition floor
(graph_adamic_adar's 21× local decade was ~15× once the sf10f run got
256 partitions; the floor inflates every shuffle-bound entry's large-SF
numbers). The cap is 8 task waves on the 32-core box. --partitions
overrides. AQE still coalesces small stages, so small entries don't pay
for the higher default.

--json writes {"sf_dir": ..., "timings": {name: sec}, "errors": [...]}
for cross-SF ratio analysis (tools/scaling_report.py).
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import REGISTRY  # noqa: E402
from bigdata_electricity_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    flag_sec = 10.0
    json_out = None
    if "--flag-sec" in args:
        i = args.index("--flag-sec")
        flag_sec = float(args[i + 1])
        del args[i : i + 2]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = {n.strip() for n in args[i + 1].split(",") if n.strip()}
        del args[i : i + 2]
        unknown = only - set(REGISTRY)
        if unknown:
            print(f"unknown --only entries: {sorted(unknown)}")
            return 2
    partitions = None
    if "--partitions" in args:
        i = args.index("--partitions")
        partitions = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    if partitions is None:
        m = re.search(r"sf([0-9.]+)", sf_dir)
        sf = float(m.group(1)) if m else 0.1
        partitions = min(256, max(32, int(32 * sf / 0.1)))
    spark = get_spark("time-all")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    print(f"-- shuffle partitions: {partitions} ({sf_dir})")
    timings: list[tuple[float, str]] = []
    errors: list[str] = []
    failures = 0
    for name, spec in REGISTRY.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            n = spec.fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            errors.append(name)
            failures += 1
            continue
        dt = time.perf_counter() - t0
        timings.append((dt, name))
        print(f"{dt:7.2f}s  {n:>9} rows  {name}")
    timings.sort(reverse=True)
    print("\n-- slowest 10:")
    for dt, name in timings[:10]:
        mark = "  <-- FLAG" if dt > flag_sec else ""
        print(f"{dt:7.2f}s  {name}{mark}")
    flagged = [n for dt, n in timings if dt > flag_sec]
    print(f"-- {len(timings)} ran, {failures} errors, {len(flagged)} over {flag_sec:.0f}s: {flagged}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "shuffle_partitions": partitions,
                    "timings": {n: round(dt, 3) for dt, n in sorted(timings, key=lambda t: t[1])},
                    "errors": errors,
                },
                fh,
                indent=1,
            )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
