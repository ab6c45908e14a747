"""Resume a tools/time_all.py sweep from its log.

Long sweeps at synthesized SFs can outlive a harness timeout; time_all
only writes --json at the end, but its per-entry log lines are already a
complete record. This tool parses the partial log, times ONLY the
registry entries that have no line yet (appending to the same log), and
merges everything into the JSON artifact time_all would have written.

    python tools/time_resume.py <log_path> <sf_dir> --json out.json
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import REGISTRY  # noqa: E402
from bigdata_electricity_spark.session import get_spark  # noqa: E402

LINE = re.compile(r"([0-9.]+)s\s+(\d+) rows\s+(\S+)\s*$")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    log_path, sf_dir = args
    done: dict[str, float] = {}
    errors: list[str] = []
    with open(log_path) as fh:
        for ln in fh:
            m = LINE.search(ln)
            if m:
                done[m.group(3)] = float(m.group(1))
            elif ln.startswith("ERROR "):
                errors.append(ln.split()[1].rstrip(":"))
    todo = [n for n in REGISTRY if n not in done and n not in errors]
    print(f"resuming: {len(done)} done, {len(errors)} errors, {len(todo)} to run")
    spark = get_spark("time-resume")
    with open(log_path, "a") as fh:
        for name in todo:
            t0 = time.perf_counter()
            try:
                n = REGISTRY[name].fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001
                print(f"ERROR {name}: {exc}")
                fh.write(f"ERROR {name}: {exc}\n")
                errors.append(name)
                continue
            dt = time.perf_counter() - t0
            done[name] = dt
            line = f"{dt:7.2f}s  {n:>9} rows  {name}"
            print(line)
            fh.write(line + "\n")
            fh.flush()
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "timings": {k: round(v, 3) for k, v in sorted(done.items())},
                    "errors": sorted(set(errors)),
                },
                fh,
                indent=1,
            )
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
