from .scalars import all_null, any_null, null_counts_exprs, to_event_datetime
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "any_null",
    "all_null",
    "null_counts_exprs",
    "to_event_datetime",
    "dot_product",
    "cosine_similarity",
    "l2_norm",
]
