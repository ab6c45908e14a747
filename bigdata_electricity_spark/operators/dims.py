"""Broadcast-hint policy for dimension tables (100 TB discipline).

An explicit ``F.broadcast`` hint is a *promise to the planner* that the
build side fits in every executor (and under Spark's 8 GB broadcast hard
cap) at ANY data scale — AQE does not demote an explicit hint the way it
demotes a stats-based broadcast choice (the demotion test in
tests/test_physical_plans.py documents this). That promise only holds
for dimensions whose cardinality is CONSTANT in the scale factor:

- ``nation`` (25 rows) and ``region`` (5 rows) in the TPC-H schema —
  fixed by the spec at every SF;
- single-row / O(k) aggregates (cutoffs, medians, centroid sets), which
  are bounded by construction, keep their explicit hints at call sites.

``customer``, ``part``, ``supplier`` (and any subset that is a constant
*fraction* of them, e.g. one brand of ``part``) grow linearly with SF:
at the 100 TB tier they are tens of GB — past the broadcast cap — so a
forced hint turns into a planner error. Those tables go through
:func:`hint_dim` UNhinted: Catalyst picks broadcast-hash-join from file
statistics when the table is genuinely small (as in the test fixtures),
and AQE promotes a shuffle join to broadcast at runtime when the
post-filter size qualifies — the strategy stays optimal at every scale
without hard-coding an assumption that breaks at one of them.

Reference: the reference engine has zero joins (SURVEY §2.3 — grep
verified); this policy is new-engine scale discipline, not parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Dimensions whose row count is fixed by the schema at every scale
#: factor — the only tables an unconditional broadcast hint is safe for.
CONSTANT_DIMS = frozenset({"nation", "region"})


def hint_dim(df: DataFrame, table: str) -> DataFrame:
    """Broadcast-hint ``df`` only if ``table`` is constant-cardinality.

    SF-scaling tables are returned unhinted so Catalyst (plan-time file
    stats) and AQE (runtime shuffle stats) choose the join strategy —
    broadcast when actually small, shuffle when not.
    """
    if table in CONSTANT_DIMS:
        return F.broadcast(df)
    return df
