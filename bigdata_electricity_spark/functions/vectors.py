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
    """dot(a,b) / (‖a‖·‖b‖); null-safe only insofar as inputs are non-empty."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
