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


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖), NULL when either vector has zero norm.

    A zero vector has no direction, so its cosine to anything is
    undefined — surfaced as NULL, never an ANSI divide-by-zero (Spark)
    or ±inf/NaN (DuckDB's x/0). Oracles mirror the guard with a CASE
    on the same product (plans/similarity_queries._DUCK_COS)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
