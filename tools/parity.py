"""Local replica of the driver's t2 correctness gate.

Runs every REGISTRY query on Spark and its oracle on DuckDB at a given
scale factor, compares row count, column names/order-insensitive values,
and reports per-query PASS/FAIL with a diff sample. Use while iterating:

    python tools/parity.py [--time] [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import REGISTRY  # noqa: E402
from bigdata_electricity_spark.session import get_spark  # noqa: E402
from bigdata_electricity_spark.sources.loaders import TESTDATA_TABLES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "\x00NULL"  # sortable sentinel (tuples with None don't compare)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)  # exact repr; normalize -0.0
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out)


def oracle_connection(sf_dir: str):
    """DuckDB connection with the testdata tables registered as views."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_one(spark, con, spec, sf_dir: str) -> str | None:
    """Run one query on Spark and its oracle on DuckDB; None = match.

    Mirrors the driver's t2 compare: column names, row count, and
    order-insensitive value equality over name-sorted columns.
    Returns a failure description, or "rows-only (N rows)" prefixed with
    "ok:" for oracle-less specs.
    """
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return f"ok:rows-only ({len(s_rows)} rows)"
    res = con.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    if sc != dc:
        return f"columns differ spark={sc} duck={dc}"
    if len(sr) != len(dr):
        return f"rowcount spark={len(sr)} duck={len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        return f"values differ; first diffs: {diffs}"
    return None


def run(sf_dir: str, names: list[str] | None = None, timed: bool = False) -> int:
    unknown = set(names or []) - set(REGISTRY)
    if unknown:
        print(f"FAIL unknown query names: {sorted(unknown)}")
        return 1
    spark = get_spark("parity")
    con = oracle_connection(sf_dir)
    failures = 0
    import time as _time

    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        t0 = _time.perf_counter()
        try:
            outcome = compare_one(spark, con, spec, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: error: {exc}")
            failures += 1
            continue
        stamp = f"  [{_time.perf_counter() - t0:6.2f}s]" if timed else ""
        if outcome is None:
            print(f"PASS {name}{stamp}")
        elif outcome.startswith("ok:"):
            print(f"ok   {name}: {outcome[3:]}{stamp}")
        else:
            print(f"FAIL {name}: {outcome}")
            failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    timed = "--time" in args
    args = [a for a in args if a != "--time"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or None
    sys.exit(1 if run(sf_dir, names, timed=timed) else 0)
