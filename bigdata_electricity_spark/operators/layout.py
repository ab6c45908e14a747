"""Data-layout operators: Morton (Z-order) codes and multi-dimension
clustered writes — the data-skipping lever for 100 TB scans.

A single-column sort gives perfect file-level min/max pruning on that
column and none on any other. Interleaving the bits of two (or more)
dimensions into one sort key gives every file a small bounding box in
BOTH dimensions, so predicates on either column skip most files. This
is the same layout trick lakehouse table formats call Z-ORDER / OPTIMIZE;
here it's plain Spark: an expression-level Morton code (bitwise ops stay
inside whole-stage codegen — no UDF) + repartitionByRange on the code.

The locality win is asserted quantitatively in
tests/test_pipeline_ops.py: per-file bounding boxes from a z-ordered
write are ~an order of magnitude tighter on the second dimension than a
single-column sort's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    x's bit i lands at position 2i, y's at 2i+1. Pure bitwise
    expressions (shiftleft/shiftright/and/or) — codegen-friendly,
    deterministic, and reproducible in any engine with bit ops.

    Callers are responsible for mapping dimensions into the 0..2^bits-1
    range first (truncate, bucket, or rank); values beyond ``bits`` bits
    simply stop influencing the interleave (their high bits are masked).
    """
    xl = x.cast("long")
    yl = y.cast("long")
    z: Column = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def morton_code_sql(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB/ANSI SQL fragment computing exactly :func:`morton_code`
    — used by oracle strings so both engines evaluate the same bit math."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(df: DataFrame, out_dir: str, zcol: Column,
                 n_files: int = 8) -> str:
    """Cluster ``df`` into ``n_files`` range-partitions of the z-code and
    write parquet — each output file then covers a compact z-range, i.e.
    a small bounding box in every interleaved dimension, so engine-side
    min/max (or partition) pruning on ANY of those dimensions skips
    whole files.

    ``repartitionByRange`` samples the code distribution (no global
    sort); ``sortWithinPartitions`` keeps row groups internally ordered
    for page-level skipping. Both are shuffle-once, fully parallel.
    """
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def morton_code_nd(cols: list[Column], bits: int = 16) -> Column:
    """N-dimensional Morton interleave: bit i of dimension d lands at
    position i*len(cols) + d. Generalizes :func:`morton_code` (which is
    the n=2 case with its historical bit layout) to cluster 3+
    dimensions; total code width is len(cols)*bits, so keep
    len(cols)*bits ≤ 62 for a BIGINT key.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} dims × {bits} bits exceeds a signed 64-bit key")
    z: Column = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for d, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cl, i).bitwiseAND(one), i * n + d)
            )
    return z


def morton_code_nd_sql(exprs: list[str], bits: int = 16) -> str:
    """DuckDB/ANSI fragment computing exactly :func:`morton_code_nd` —
    generated alongside the Spark expression so oracles evaluate the
    same interleave."""
    n = len(exprs)
    terms = []
    for d, e in enumerate(exprs):
        for i in range(bits):
            terms.append(f"((({e} >> {i}) & 1) << {i * n + d})")
    return "(" + " | ".join(terms) + ")"
