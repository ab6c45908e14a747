"""Distributed connected components (label propagation over joins).

Near-dup dedup at corpus scale needs the *transitive closure* of the
pairwise similarity graph: if A~B and B~C, all three are one duplicate
cluster even when A~C never passes the threshold. The reference has no
graph ops (SURVEY §2.7 — none); this is a north-star extension built
purely from DataFrame joins, no GraphX/graphframes dependency.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, a node's label becomes the min of its own
and its neighbors' labels; converged when no label changes. The result
(min reachable id per node) is fully deterministic, so it is
DuckDB-oracle-checkable via a recursive CTE.

Scale notes (100 TB tier):
- rounds = graph diameter; near-dup graphs are unions of near-cliques,
  so diameter stays small (single digits) — for long-chain graphs the
  large-star/small-star variant halves diameters per round, same join
  primitives;
- each round is one shuffle join (edges ⋈ labels on dst) + one
  co-partitioned min-aggregate — no collect, no driver-side graph;
- lineage is truncated every round via localCheckpoint, otherwise the
  iterated plan grows linearly and re-executes from the scan (on a
  cluster, prefer a reliable checkpoint dir);
- the convergence check is one count action per round on the changed
  set, which is empty-ish near the end (cheap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """Label every node with the min node id of its component.

    ``nodes``: one column ``id``; ``edges``: columns ``src``/``dst``
    (undirected, any orientation). Returns (id, component).
    """
    # Materialize the symmetrized edge set ONCE: candidate-pair
    # generation upstream (e.g. a blocked Jaccard self-join) is far more
    # expensive than any propagation round, and without truncation every
    # round's join would re-execute it from the scan.
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = nodes.select(F.col("id"), F.col("id").alias("component")).localCheckpoint(eager=False)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # Carry the previous label through the propagation select so the
        # convergence check is a filter over THIS result — not a second
        # id⋈id join per round. The count action also materializes the
        # lazy checkpoint, which the next round's join then reuses.
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.col("component").alias("__prev"),
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("component") != F.col("__prev")).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    return labels
