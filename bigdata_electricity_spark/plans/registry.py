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


SCALE_CLASSES = ("production", "exact-baseline", "certification")


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str
    # How the entry should be used at scale (r10 VERDICT task 6 — the
    # driver-facing surfacing of plans.SCALE_TWINS):
    #   production     — the plan survives a 100× scale-up as written;
    #   exact-baseline — deliberately exact small-data semantics kept as
    #                    an oracle-checkable baseline; a named scale twin
    #                    in plans.SCALE_TWINS computes the production
    #                    variant (set automatically from that dict);
    #   certification  — exists to certify an engine property
    #                    (persistence roundtrip, crash recovery, recall
    #                    audit, sink format), not to answer a query.
    scale_class: str = "production"


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None,
          scale_class: str = "production") -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    ``scale_class`` defaults to "production"; pass "certification" for
    property-certification entries. "exact-baseline" is assigned
    centrally from plans.SCALE_TWINS, never at the definition site."""
    if scale_class not in SCALE_CLASSES:
        raise ValueError(f"unknown scale_class {scale_class!r} for {name}")

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(),
            scale_class=scale_class,
        )
        return fn

    return deco
