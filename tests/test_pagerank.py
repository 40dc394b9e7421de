"""PageRank semantics beyond oracle parity: structural ranking facts on
known graphs, near-conservation of integer mass, and the iterative-op
partitioning-independence discipline (kmeans/BPE/perceptron family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
)


def _sym(spark, undirected_edges):
    both = [(a, b) for a, b in undirected_edges] + [
        (b, a) for a, b in undirected_edges
    ]
    return spark.createDataFrame(both, "src long, dst long")


def test_hub_outranks_leaves(spark):
    # star: node 0 linked to 1..6 — the hub concentrates rank
    edges = _sym(spark, [(0, i) for i in range(1, 7)])
    r = {row["node"]: row["rank_scaled"] for row in pagerank(edges).collect()}
    assert all(r[0] > r[i] for i in range(1, 7))
    leaf = {r[i] for i in range(1, 7)}
    assert len(leaf) == 1  # symmetric leaves tie exactly (integer math)


def test_ring_is_uniform(spark):
    n = 8
    edges = _sym(spark, [(i, (i + 1) % n) for i in range(n)])
    ranks = {r["rank_scaled"] for r in pagerank(edges).collect()}
    assert len(ranks) == 1  # perfect symmetry -> identical integer ranks


def test_mass_nearly_conserved(spark):
    edges = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    rows = pagerank(edges, iterations=5).collect()
    total = sum(r["rank_scaled"] for r in rows)
    # floor division leaks < 1 unit per node per div, 2 divs x 5 iters
    assert total <= PAGERANK_SCALE
    assert total >= PAGERANK_SCALE - len(rows) * 2 * 5 - len(rows)


def test_partitioning_independent(spark):
    edges = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)])
    a = sorted(map(tuple, pagerank(edges, iterations=4).collect()))
    b = sorted(
        map(tuple, pagerank(edges.repartition(7), iterations=4).collect())
    )
    assert a == b


def test_more_iterations_spread_from_init(spark):
    # path graph: end nodes lose rank to the middle over iterations
    edges = _sym(spark, [(0, 1), (1, 2)])
    one = {r["node"]: r["rank_scaled"] for r in pagerank(edges, 1).collect()}
    five = {r["node"]: r["rank_scaled"] for r in pagerank(edges, 5).collect()}
    assert five[1] > five[0]  # middle node dominates
    assert one.keys() == five.keys() == {0, 1, 2}


def _model(edge_list, iterations):
    """Sequential python model of the exact integer iteration."""
    from collections import defaultdict

    deg: dict[int, int] = defaultdict(int)
    nodes: set[int] = set()
    for s, d in edge_list:
        deg[s] += 1
        nodes.add(s)
        nodes.add(d)
    init = PAGERANK_SCALE // len(nodes)
    base = (15 * init) // 100
    r = {v: init for v in nodes}
    for _ in range(iterations):
        contrib: dict[int, int] = defaultdict(int)
        for s, d in edge_list:
            contrib[d] += r[s] // deg[s]
        r = {
            v: (base + 85 * contrib[v] // 100) if v in contrib else base
            for v in nodes
        }
    return r


def test_source_only_node_keeps_rank_and_contributes(spark):
    """ADVICE round 9: a node with out-edges but no in-edges must stay in
    the rank frame (at the base term) and keep contributing — the old
    contribs.groupBy rebuild dropped it after iteration 1, losing both
    its rank row and its downstream mass. Directed graph, node 0 is
    source-only; exact python-model equivalence."""
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    for iters in (1, 2, 4):
        got = {
            r["node"]: r["rank_scaled"]
            for r in pagerank(edges, iterations=iters).collect()
        }
        assert got == _model(edge_list, iters)
    # node 0 is present and pinned at the base term
    init = PAGERANK_SCALE // 3
    assert got[0] == (15 * init) // 100


def test_dangling_node_accumulates_without_redistributing(spark):
    """A dst-only (dangling) node is part of the node universe: it
    accumulates rank, contributes nothing, and the whole frame still
    matches the python model exactly."""
    edge_list = [(0, 1), (1, 0), (0, 2), (1, 2)]  # node 2 dangling
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(edges, iterations=3).collect()
    }
    assert got == _model(edge_list, 3)
    assert 2 in got
