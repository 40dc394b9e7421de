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


def test_cooccurrence_knn_edges_cap_drops_stopword_contexts(spark):
    """The co-occurrence kNN builder (extracted r14) and its
    context_cap scale knob: per-context pair space is occupancy^2, so a
    stop-word context everyone shares dominates cost while carrying no
    partner signal — capping drops it BEFORE the self-join. Crafted
    frame: items 1..6 all share context 100 (occupancy 6); (1,2) also
    share contexts 201+202, (3,4) share 301."""
    from db_integration_via_kafka_ksql_spark.operators.graph import (
        cooccurrence_knn_edges,
    )

    rows = (
        [(s, 100) for s in range(1, 7)]
        + [(1, 201), (2, 201), (1, 202), (2, 202), (3, 301), (4, 301)]
    )
    df = spark.createDataFrame(rows, "s long, p long")
    # uncapped: every pair shares the hot context -> complete graph at
    # k large enough; (1,2) strongest (3 shared)
    full = cooccurrence_knn_edges(df, "s", "p", k=10)
    got_full = {(r["src"], r["dst"]) for r in full.collect()}
    assert (1, 2) in got_full and (2, 1) in got_full
    assert (5, 6) in got_full  # hot context alone created this edge
    # capped at 4: context 100 (occupancy 6) is dropped; only the
    # genuine-signal edges survive
    capped = cooccurrence_knn_edges(df, "s", "p", k=10, context_cap=4)
    got = {(r["src"], r["dst"]) for r in capped.collect()}
    assert got == {(1, 2), (2, 1), (3, 4), (4, 3)}
    # duplicate (item, context) rows collapse (distinct) — weights count
    # DISTINCT shared contexts, so re-feeding the frame changes nothing
    dup = cooccurrence_knn_edges(
        df.unionByName(df), "s", "p", k=10, context_cap=4
    )
    assert {(r["src"], r["dst"]) for r in dup.collect()} == got
    import pytest

    with pytest.raises(ValueError, match="context_cap"):
        cooccurrence_knn_edges(df, "s", "p", k=10, context_cap=0)
