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
