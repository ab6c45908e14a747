"""Synthesize a larger scale factor from driver testdata by replication.

The driver ships sf0.001/0.01/0.1; nothing in the repo has ever run at
10x the bench SF, so super-linear scaling cliffs (wedge explosions,
accidental all-pairs, global sorts) can hide below the noise floor
(r7 VERDICT task 2). This tool builds an sfN-equivalent locally:

    python tools/make_sf.py [--mult 10] [src_dir] [dst_dir]

defaults: --mult 10  /root/testdata/sf0.1  /root/repo/.localdata/sf1

Method: each fact/entity table is replicated ``mult`` times with every
key column offset by ``replica_index * (max_key + 1)`` so primary keys
stay unique and every foreign key keeps pointing at the matching
replica's parent rows (replica i of lineitem joins replica i of orders).
Dimension tables bounded by the domain, not the data (region, nation),
are copied as-is — exactly how a real 100 TB warehouse scales. Value
columns, timestamps, and text are left untouched: per-group
distributions are preserved, group counts grow 10x, and duplicate-text
groups grow 10x (a realistic dedup workload).

pyarrow end-to-end so the parquet physical types match the originals
exactly — in particular events.ts stays TIMESTAMP(NANOS), which the
loaders' nanosAsLong path expects.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: key_domain}; columns sharing a domain share a stride,
# so FKs follow their PKs into the same replica.
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
# key_domain -> (table, column) that defines the stride (max+1 of the PK side)
DOMAIN_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
COPY_AS_IS = ("region", "nation")


def build(src: str, dst: str, mult: int) -> None:
    os.makedirs(dst, exist_ok=True)
    strides: dict[str, int] = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        t = pq.read_table(f"{src}/{tbl}.parquet", columns=[col])
        strides[dom] = int(pc.max(t.column(0)).as_py()) + 1
    for tbl in COPY_AS_IS:
        shutil.copyfile(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
        print(f"{tbl}: copied (domain-bounded dimension)")
    for tbl, keycols in KEYED.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        replicas = [t]
        for i in range(1, mult):
            cols = []
            for name in t.schema.names:
                col = t.column(name)
                if name in keycols:
                    off = pa.scalar(
                        i * strides[keycols[name]], type=col.type
                    )
                    col = pc.add_checked(col, off)
                cols.append(col)
            replicas.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{tbl}.parquet", compression="snappy")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows} rows")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    mult = 10
    if "--mult" in args:
        i = args.index("--mult")
        mult = int(args[i + 1])
        del args[i : i + 2]
    src = args[0] if args else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/root/repo/.localdata/sf1"
    build(src, dst, mult)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
