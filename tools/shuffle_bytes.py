"""Measure per-query shuffle/scan byte volume from Spark's status store.

Wall-clock on a shared VM is noisy; the byte volumes a plan moves are
not. This runs each named registry query in its OWN SparkSession and
reports, summed over the query's completed stages:

    shuffle_write_bytes  — bytes written to shuffle (the cost that
                           scales with cluster bisection bandwidth)
    shuffle_read_bytes   — bytes read back from shuffle
    input_bytes          — bytes the input task metric reports. CAVEAT
                           (measured r12): on local[*] the vectorized
                           parquet reader's NIO path bypasses the
                           FileSystem statistics, so LOCAL parquet scans
                           under-report (a 6 MB scan showed 7 KB);
                           cached/localCheckpoint block re-reads DO
                           count. Treat input_bytes as a lineage-
                           recomputation signal, not scan volume; the
                           shuffle numbers are exact either way.
    output_rows          — rows the action returned

    python tools/shuffle_bytes.py [--sf-dir DIR] [--json out.json] q1 [q2 ...]

Set SPARK_GRAFT_REPO to import the registry from a different checkout
(e.g. a `git worktree` of HEAD) — that is how before/after comparisons
of a plan rewrite are produced without touching the working tree.

Metrics come from the AppStatusStore (same numbers the UI's Stages tab
shows); one session per query keeps the stage set unambiguous.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.environ.get("SPARK_GRAFT_REPO", "/root/repo")
sys.path.insert(0, REPO)


def measure_one(name: str, sf_dir: str, demote: bool = False) -> dict:
    from bigdata_electricity_spark.plans import REGISTRY
    from bigdata_electricity_spark.session import get_spark

    spark = get_spark(f"shuffle-bytes-{name}")
    if demote:
        # The 100 TB condition: no fact-sized side fits a broadcast, so
        # every unhinted join degrades to its shuffle form. Explicit
        # F.broadcast hints (constant-cardinality dims) are still honored
        # — exactly what a real cluster would do.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY[name].fn(spark, sf_dir)
        # Materialize through the noop sink, NOT count(): under count()
        # Catalyst prunes every column the row count doesn't need, so a
        # plan whose expensive work lives in non-multiplicity columns
        # (window flags, collect_list reassembly, md5 fingerprints)
        # measures near-zero (r12: dedup_substring_rolling read 7 KB
        # instead of its real 52 MB scan). The noop sink consumes every
        # column. Checkpointed plans were immune (localCheckpoint
        # materializes all columns), which is why earlier artifacts for
        # the checkpoint-heavy entries stand.
        df.write.format("noop").mode("overwrite").save()
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        # Spark 4.x signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus) — empty statuses = all stages.
        jvm = sc._jvm
        stages = store.stageList(
            jvm.java.util.ArrayList(), False, False,
            sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )
        tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0, "input_bytes": 0}
        for i in range(stages.size()):
            s = stages.apply(i)
            tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
            tot["shuffle_read_bytes"] += s.shuffleReadBytes()
            tot["input_bytes"] += s.inputBytes()
        # row count AFTER the metrics snapshot — its (pruned) stages
        # must not inflate the byte totals.
        tot["output_rows"] = df.count()
        return tot
    finally:
        spark.stop()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    json_out = None
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    demote = "--demote" in args
    if demote:
        args.remove("--demote")
    if not args:
        sys.exit(__doc__)
    out = {"sf_dir": sf_dir, "repo": REPO, "demote": demote, "queries": {}}
    for name in args:
        m = measure_one(name, sf_dir, demote=demote)
        out["queries"][name] = m
        print(
            f"{name}: shuffle_write={m['shuffle_write_bytes']:,} "
            f"shuffle_read={m['shuffle_read_bytes']:,} "
            f"input={m['input_bytes']:,} rows={m['output_rows']}",
            flush=True,
        )
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
