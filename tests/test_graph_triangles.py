"""triangle_stats semantics on hand-built graphs + a brute-force model
equivalence on a pseudo-random graph (the oriented wedge join must agree
with direct neighborhood-intersection counting on every node)."""

from __future__ import annotations

from itertools import combinations

from db_integration_via_kafka_ksql_spark.operators.graph import triangle_stats


def _sym_df(spark, undirected):
    both = [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected]
    return spark.createDataFrame(both, "src long, dst long")


def _model(undirected):
    adj: dict[int, set[int]] = {}
    for a, b in undirected:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for n, nbrs in adj.items():
        tri = sum(
            1 for x, y in combinations(sorted(nbrs), 2) if y in adj[x]
        )
        deg = len(nbrs)
        permille = 2 * tri * 1000 // (deg * (deg - 1)) if deg >= 2 else 0
        out[n] = (deg, tri, permille)
    return out


def _collect(spark, undirected):
    return {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_permille"])
        for r in triangle_stats(_sym_df(spark, undirected)).collect()
    }


def test_single_triangle(spark):
    got = _collect(spark, [(0, 1), (1, 2), (0, 2)])
    assert got == {0: (2, 1, 1000), 1: (2, 1, 1000), 2: (2, 1, 1000)}


def test_star_has_no_triangles(spark):
    got = _collect(spark, [(0, i) for i in range(1, 6)])
    assert got[0] == (5, 0, 0)
    assert all(got[i] == (1, 0, 0) for i in range(1, 6))


def test_square_with_diagonal(spark):
    # 0-1-2-3-0 plus diagonal 0-2: two triangles sharing edge 0-2
    got = _collect(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    assert got == _model([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    assert got[0][1] == 2 and got[1][1] == 1


def test_skewed_graph_matches_brute_force_model(spark):
    # hub node 0 with high degree plus a clique: exercises the
    # degree-ordered orientation's tie-breaks and the (deg, id) wedge
    # canonicalization (an id-ordered wedge probe undercounts here)
    edges = [(0, i) for i in range(1, 12)]
    edges += [(a, b) for a, b in combinations(range(1, 6), 2)]
    edges += [(11, 12), (12, 13), (13, 11)]
    assert _collect(spark, edges) == _model(edges)


def test_deterministic_hash_seeded_graph(spark):
    # pseudo-random without Math.random: edge (a, b) iff md5-ish mix is
    # even — fixed corpus, model equivalence
    nodes = range(14)
    edges = [
        (a, b)
        for a, b in combinations(nodes, 2)
        if (a * 7919 + b * 104729) % 3 == 0
    ]
    assert _collect(spark, edges) == _model(edges)
