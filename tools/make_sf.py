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

--fresh-content (r8 VERDICT task 1): plain replication grows TRUE
near-duplicate pairs by mult² (every copy of doc X is a J=1.0 neighbor
of every other copy), so a sweep over replicated data conflates
candidate-plan growth with output-mass growth — the ambiguity that made
sim_lsh_hyperplane's 17.7× flag need hand analysis. With this flag,
replica i>0 gets density-controlled content:

* documents.text — every whitespace token gets a per-replica suffix
  ``~i``. A per-token bijection preserves token-set sizes and
  intersections EXACTLY, so within-replica Jaccard/containment/shingle
  structure (and therefore per-replica duplicate density) is unchanged,
  while cross-replica token sets are disjoint (Jaccard 0: no
  cross-replica near-dups exist). n_chars is recomputed to match.
* embeddings.embedding — a per-replica random coordinate permutation ×
  sign flips (a signed permutation matrix: orthogonal). Within-replica
  cosines are preserved exactly; a cross-replica pair's cosine becomes
  cos(x, Qy) for a random signed permutation Q, concentrated near 0 at
  these dims — no cross-replica near-neighbors above any real
  threshold. Deterministic (seeded by replica index).

Result: true-pair output mass scales ×mult (linear), so any remaining
super-linear runtime is the CANDIDATE plan's fault — exactly what the
scale audit needs to attribute.

--dup-density X (r9 VERDICT task 3): the shipped corpus is ~57% of
docs in non-singleton near-dup clusters (measured, docs/SCALING_SF10.md)
— an order denser than real corpora (1–20%). This knob rewrites a
deterministic, seeded subset of documents to be globally UNIQUE (every
token gets a per-doc ``~u{doc_id}`` suffix: the token set becomes
disjoint from everything, the doc a singleton; token counts and size
distribution are preserved). A doc is kept duplicate-eligible with
probability r = X / base_density (override the measured 0.57 with
--base-density); a thinned cluster of size k keeps ~Binomial(k, r)
members, so the achieved density lands near X for the large clusters
that dominate the mass — REPORT the achieved value, don't assume it
(tools/recall_density.py measures it from the exact closure). The
keep/rewrite decision keys on the ORIGINAL doc row, so every replica
thins the same cluster positions and per-replica structure stays
comparable. Documents only — embeddings are out of scope for the knob.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
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


def _fresh_documents(t: pa.Table, i: int) -> pa.Table:
    """Per-replica token bijection: tok -> tok~i; recompute n_chars."""
    texts = t.column("text").to_pylist()
    sfx = f"~{i}"
    new_texts = [
        " ".join(tok + sfx for tok in s.split(" ")) if s is not None else None
        for s in texts
    ]
    cols = []
    for name in t.schema.names:
        if name == "text":
            cols.append(pa.array(new_texts, type=pa.string()))
        elif name == "n_chars":
            cols.append(
                pa.array(
                    [len(s) if s is not None else None for s in new_texts],
                    type=t.schema.field("n_chars").type,
                )
            )
        else:
            cols.append(t.column(name))
    return pa.table(cols, schema=t.schema)


def _fresh_embeddings(t: pa.Table, i: int) -> pa.Table:
    """Per-replica signed coordinate permutation (orthogonal transform)."""
    arr = t.column("embedding").combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # single-chunk after combine
        arr = arr.chunk(0)
    offsets = arr.offsets.to_numpy()
    widths = np.diff(offsets)
    d = int(widths[0])
    if not (widths == d).all():  # ragged: skip transform, keep as-is
        raise ValueError("embeddings are ragged; fresh-content needs fixed dim")
    flat = arr.values.to_numpy(zero_copy_only=False).reshape(-1, d)
    rng = np.random.default_rng(20260815 + i)
    perm = rng.permutation(d)
    signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=d)
    fresh = (flat[:, perm] * signs).astype(np.float32)
    new_col = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(fresh.reshape(-1), type=pa.float32()),
    ).cast(t.schema.field("embedding").type)
    cols = [
        new_col if name == "embedding" else t.column(name)
        for name in t.schema.names
    ]
    return pa.table(cols, schema=t.schema)


FRESHEN = {"documents": _fresh_documents, "embeddings": _fresh_embeddings}


def _thin_documents(t: pa.Table, keep_mask: "np.ndarray") -> pa.Table:
    """Uniquify the docs where ``keep_mask`` is False: every token gets
    a per-doc ``~u{doc_id}`` suffix, so the token set is disjoint from
    every other doc's (a guaranteed singleton under ANY token-overlap
    similarity) while token count / size distribution are unchanged.
    Applied AFTER freshen, so the mask indexes the same rows in every
    replica."""
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    new_texts = []
    for keep, s, did in zip(keep_mask, texts, ids):
        if keep or s is None:
            new_texts.append(s)
        else:
            sfx = f"~u{did}"
            new_texts.append(" ".join(tok + sfx for tok in s.split(" ")))
    cols = []
    for name in t.schema.names:
        if name == "text":
            cols.append(pa.array(new_texts, type=pa.string()))
        elif name == "n_chars":
            cols.append(
                pa.array(
                    [len(s) if s is not None else None for s in new_texts],
                    type=t.schema.field("n_chars").type,
                )
            )
        else:
            cols.append(t.column(name))
    return pa.table(cols, schema=t.schema)


def build(src: str, dst: str, mult: int, fresh: bool = False,
          dup_density: float | None = None,
          base_density: float = 0.57,
          tables: list[str] | None = None) -> None:
    """``tables`` restricts the build (e.g. ["documents"] for a dedup
    decade run — no point replicating lineitem 1000×). Replicas are
    STREAMED to the writer one at a time (r13: mult=1000 for sf100f
    would otherwise hold the whole 5M-row table in memory via
    concat_tables)."""
    os.makedirs(dst, exist_ok=True)
    keyed = {t: c for t, c in KEYED.items() if tables is None or t in tables}
    needed_domains = {d for cols in keyed.values() for d in cols.values()}
    strides: dict[str, int] = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        if dom not in needed_domains:
            continue
        t = pq.read_table(f"{src}/{tbl}.parquet", columns=[col])
        strides[dom] = int(pc.max(t.column(0)).as_py()) + 1
    for tbl in COPY_AS_IS:
        if tables is not None and tbl not in tables:
            continue
        shutil.copyfile(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
        print(f"{tbl}: copied (domain-bounded dimension)")
    keep_mask = None
    if dup_density is not None:
        r = min(1.0, dup_density / base_density)
        n_docs = pq.ParquetFile(f"{src}/documents.parquet").metadata.num_rows
        rng = np.random.default_rng(20260815)
        keep_mask = rng.random(n_docs) < r
        print(
            f"documents: dup-density target {dup_density} "
            f"(keep-dup frac {r:.3f}, {int(keep_mask.sum())}/{n_docs} "
            f"rows stay duplicate-eligible per replica)"
        )
    for tbl, keycols in keyed.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        writer = None
        n_out = 0
        try:
            for i in range(mult):
                if i == 0:
                    rep = t
                else:
                    cols = []
                    for name in t.schema.names:
                        col = t.column(name)
                        if name in keycols:
                            off = pa.scalar(
                                i * strides[keycols[name]], type=col.type
                            )
                            col = pc.add_checked(col, off)
                        cols.append(col)
                    rep = pa.table(cols, schema=t.schema)
                    if fresh and tbl in FRESHEN:
                        rep = FRESHEN[tbl](rep, i)
                if tbl == "documents" and keep_mask is not None:
                    rep = _thin_documents(rep, keep_mask)
                if writer is None:
                    writer = pq.ParquetWriter(
                        f"{dst}/{tbl}.parquet", rep.schema,
                        compression="snappy",
                    )
                writer.write_table(rep)
                n_out += rep.num_rows
        finally:
            if writer is not None:
                writer.close()
        print(f"{tbl}: {t.num_rows} -> {n_out} rows", flush=True)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    mult = 10
    fresh = False
    dup_density = None
    base_density = 0.57
    if "--mult" in args:
        i = args.index("--mult")
        mult = int(args[i + 1])
        del args[i : i + 2]
    if "--fresh-content" in args:
        fresh = True
        args.remove("--fresh-content")
    if "--dup-density" in args:
        i = args.index("--dup-density")
        dup_density = float(args[i + 1])
        del args[i : i + 2]
    if "--base-density" in args:
        i = args.index("--base-density")
        base_density = float(args[i + 1])
        del args[i : i + 2]
    tables = None
    if "--tables" in args:
        i = args.index("--tables")
        tables = args[i + 1].split(",")
        del args[i : i + 2]
    src = args[0] if args else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/root/repo/.localdata/sf1"
    build(src, dst, mult, fresh=fresh, dup_density=dup_density,
          base_density=base_density, tables=tables)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
