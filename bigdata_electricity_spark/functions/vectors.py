"""Array/vector Column helpers built on higher-order functions.

Used by the similarity-search operators over ``embeddings.embedding``
(array<float>). Higher-order functions (``zip_with`` + ``aggregate``)
keep the math JVM-side and codegen-compatible — preferred over a Pandas
UDF at 100 TB scale because no Arrow serialization boundary is crossed
(SURVEY §2.11).

All accumulation is in double, sequentially over the array, which makes
results deterministic and bit-comparable with a sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """√(Σ aᵢ²)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def unit_vector(a: Column) -> Column:
    """Element-wise a/‖a‖ with the norm evaluated ONCE PER ROW by
    construction — bit-identical to dividing every element by a
    materialized norm column.

    Why not ``transform(a, x -> x / nrm_col)`` over a projected norm:
    predicate pushdown substitutes a filter's ``nrm > 0`` below the
    defining projection, the now-adjacent projections collapse (a
    single lambda reference passes CollapseProject's cheapness guard),
    and the norm FOLD lands inside the division lambda — re-evaluated
    per ARRAY ELEMENT, 64× per row (the HOF-CSE trap, re-discovered
    r13: every `_unit_base` consumer's plan carried
    ``x / SQRT(aggregate(...))`` inside the transform). Here the norm
    travels in ARGUMENT position (``array_repeat``), so however the
    optimizer inlines the whole expression, the fold stays once-per-row
    and the lambda references only its zipped element."""
    nrm = l2_norm(a)
    return F.zip_with(
        a, F.array_repeat(nrm, F.size(a)), lambda x, y: x.cast("double") / y
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖), NULL when either vector has zero norm.

    A zero vector has no direction, so its cosine to anything is
    undefined — surfaced as NULL, never an ANSI divide-by-zero (Spark)
    or ±inf/NaN (DuckDB's x/0). Oracles mirror the guard with a CASE
    on the same product (plans/similarity_queries._DUCK_COS)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


# ---------------------------------------------------------------------------
# Unrolled fixed-dimension variants (r10)
# ---------------------------------------------------------------------------
#
# Measured this round: zip_with/aggregate are CodegenFallback — every
# evaluation walks an INTERPRETED expression tree, which is what made the
# n×√n IVF assignment folds cost ~35 s at 10× the bench SF (and ~700 s at
# 100× for the triangle entries before their estimator twin moved to
# BLAS). When the dimension is a known constant, the same math unrolls
# into `dim` explicit element_at terms — plain arithmetic expressions
# that whole-stage codegen compiles — with the IDENTICAL result bit for
# bit: the fold computes ((0.0 + t0) + t1) + …, the unrolled chain
# computes (t0 + t1) + …, and 0.0 + t0 == t0 exactly in IEEE double, so
# the addition order (and thus every rounding step) is unchanged. The
# oracled entries can therefore switch freely between the two forms.
#
# Caveat: element_at past the array end is NULL under the default
# (non-ANSI) session, so a row whose vector is SHORTER than `dim`
# yields NULL instead of a partial sum; under
# spark.sql.ansi.enabled=true the same access THROWS and fails the
# whole job. Either way, pass the table's true constant dimension —
# these helpers assume fixed-dim vectors. (try_element_at would give
# NULL in both modes, at the cost of a per-element branch; the engine's
# own sessions are non-ANSI, so the plain form is kept.)
#
# Unrolling is NOT universally faster — measure per plan. Where the
# expression lands inside a compiled stage (the IVF hash-aggregate
# assignment inputs), it won 7×; where the surrounding stage falls out
# of whole-stage codegen anyway, the interpreted unrolled tree walks
# 64 element_at nodes per row and LOSES ~2× to the HOF's tight
# interpreted loop (measured on the MMR/RRF/k-center crossJoin
# projections at sf1f, r10 — those entries keep the HOF forms).


def squared_l2_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Σ (aᵢ−bᵢ)² as ``dim`` codegen'd terms — bit-identical to the
    aggregate/zip_with fold, ~10× faster evaluation (interpreted →
    compiled). dim < 1 (an empty probe table) degenerates to the
    fold's empty-array result, 0.0."""
    if dim < 1:
        return F.lit(0.0)
    out: Column | None = None
    for i in range(1, dim + 1):
        d = F.element_at(a, i).cast("double") - F.element_at(b, i).cast("double")
        t = d * d
        out = t if out is None else out + t
    assert out is not None
    return out


def dot_product_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Σ aᵢ·bᵢ as ``dim`` codegen'd terms — bit-identical to
    :func:`dot_product`. dim < 1 degenerates to 0.0 (empty fold)."""
    if dim < 1:
        return F.lit(0.0)
    out: Column | None = None
    for i in range(1, dim + 1):
        t = F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        out = t if out is None else out + t
    assert out is not None
    return out


def l2_norm_unrolled(a: Column, dim: int) -> Column:
    """√(Σ aᵢ²) as ``dim`` codegen'd terms — bit-identical to
    :func:`l2_norm`. dim < 1 degenerates to 0.0 (empty fold)."""
    if dim < 1:
        return F.sqrt(F.lit(0.0))
    out: Column | None = None
    for i in range(1, dim + 1):
        x = F.element_at(a, i).cast("double")
        t = x * x
        out = t if out is None else out + t
    assert out is not None
    return F.sqrt(out)


def cosine_similarity_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Unrolled :func:`cosine_similarity` — same NULL-on-zero-norm guard,
    same accumulation order, compiled instead of interpreted."""
    denom = l2_norm_unrolled(a, dim) * l2_norm_unrolled(b, dim)
    return F.when(denom > 0, dot_product_unrolled(a, b, dim) / denom)


def embedding_dim(df, vec_col: str = "embedding") -> int:
    """The constant vector dimension of a table, from ONE row (limit-1
    scan — a single parquet page, not a pass over the data)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).head()
    if row is None:
        return 0
    return int(row["d"])
