"""Connected-components label propagation: closure, chains, singletons."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_electricity_spark.operators.graph import connected_components


def _cc(spark, node_ids, edge_pairs, max_iter=25):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(edge_pairs or [(0, 0)], "src long, dst long")
    if not edge_pairs:
        edges = edges.filter(F.lit(False))
    out = connected_components(nodes, edges, max_iter=max_iter)
    return {r["id"]: r["component"] for r in out.collect()}


def test_transitive_closure_chain(spark):
    # 1-2, 2-3, 3-4: one component even though 1-4 never appears directly.
    got = _cc(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components_and_singleton(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 99], [(1, 2), (2, 3), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_edge_orientation_irrelevant(spark):
    # dst < src orientation must give the same labeling.
    got = _cc(spark, [5, 6, 7], [(7, 6), (6, 5)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [3, 1, 2], [])
    assert got == {1: 1, 2: 2, 3: 3}


def test_long_chain_converges_within_diameter(spark):
    # Chain of 8 nodes: diameter 7, must converge (min id floods right).
    n = 8
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0}


def test_cc_matches_union_find_property(spark):
    """Random graphs: distributed label propagation must equal a
    driver-side union-find (the sequential ground truth)."""
    from hypothesis import example, given, settings, strategies as st

    # Planted @examples: edgeless graph (all singletons), duplicate +
    # reversed edges (must not double-merge), max-diameter chain (the
    # convergence bound), and two components merged by a single late
    # bridge edge.
    @settings(max_examples=10, deadline=None)
    @example(2, [])
    @example(5, [(0, 1), (1, 0), (0, 1), (3, 4)])
    @example(14, [(i, i + 1) for i in range(13)])
    @example(6, [(0, 1), (1, 2), (3, 4), (4, 5), (2, 3)])
    @given(
        st.integers(2, 14),
        st.lists(st.tuples(st.integers(0, 13), st.integers(0, 13)), max_size=25),
    )
    def prop(n_nodes, raw_edges):
        edges = [(a, b) for a, b in raw_edges if a < n_nodes and b < n_nodes and a != b]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # Min reachable id per node = min over the component's members.
        comp_min = {}
        for v in range(n_nodes):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        want = {v: comp_min[find(v)] for v in range(n_nodes)}
        got = _cc(spark, list(range(n_nodes)), edges)
        assert got == want

    prop()
