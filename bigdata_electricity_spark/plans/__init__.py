"""Named-query registry: every driver-checkable query + its DuckDB oracle.

Importing this package populates :data:`REGISTRY` from the query modules.
"""

from .registry import REGISTRY, QuerySpec, query

# Import for registration side effects — order defines registry order.
from . import reference_queries  # noqa: E402,F401
from . import cleaning_queries  # noqa: E402,F401
from . import join_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import special_queries  # noqa: E402,F401
from . import advanced_queries  # noqa: E402,F401
from . import sql_text_queries  # noqa: E402,F401
from . import tpch_queries  # noqa: E402,F401
from . import training_queries  # noqa: E402,F401
from . import quality_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import warehouse_queries  # noqa: E402,F401
from . import insight_queries  # noqa: E402,F401
from . import corpus_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
