"""Local replica of the driver's t2 correctness gate.

Runs every REGISTRY query on Spark and its oracle on DuckDB at a given
scale factor, compares row count, column names/order-insensitive values,
and reports per-query PASS/FAIL with a diff sample. Use while iterating:

    python tools/parity.py [sf_dir] [query ...]
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
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)  # exact repr; normalize -0.0
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out)


def run(sf_dir: str, names: list[str] | None = None) -> int:
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        sc, sr = _norm_rows(s_cols, s_rows)
        dc, dr = _norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            failures += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            failures += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            failures += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
    spark.stop()
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or None
    sys.exit(1 if run(sf_dir, names) else 0)
