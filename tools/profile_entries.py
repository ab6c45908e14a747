"""Steady-state noop-sink profiling of selected registry entries.

For each named entry: run the plan N times (default 3) through the
noop sink (guide §1.4 — computes every column of every row, no count()
column pruning), report cold (first) and steady (best of rest), plus
the AQE-final exchange/join shape. Isolation harness for optimization
rounds — NOT the driver bench (bench.py keeps its historical count()
methodology and cross-round comparability).

    python tools/profile_entries.py [sf_dir] name1 name2 ... [--repeat N]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import REGISTRY  # noqa: E402
from bigdata_electricity_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    repeat = 3
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    spark = get_spark("profile-entries")
    sc = spark.sparkContext
    for name in names:
        times = []
        for p in range(repeat):
            sc.setJobDescription(f"{name} pass {p}")
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        cold, steady = times[0], min(times[1:]) if len(times) > 1 else times[0]
        print(f"{name}: cold {cold:.2f}s steady {steady:.2f}s  all={['%.2f' % t for t in times]}",
              flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
