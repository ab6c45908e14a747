"""Query registry — the contract between the engine and the driver.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI/DuckDB oracle SQL string (or None for ops whose
semantics aren't SQL-expressible: seeded sampling, ML metrics, streaming,
LSH — the driver then records a weaker rows-only check).

Determinism rules enforced across the registry (SURVEY §7.4):
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates are rounded magnitude-aware on BOTH sides so partial
  aggregation order cannot flip the driver's value hash;
- timestamps cross the boundary as formatted strings or DATEs, never raw
  (events.ts is ns in parquet, µs in Spark);
- integer-ish derived values are cast to the same width on both sides
  (DuckDB year()/hour() return BIGINT, Spark INT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco
