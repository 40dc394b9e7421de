"""Hand-built semantics tests for BFS hop levels (the oracle gate proves
engine parity on the trade graph; these pin the intended meaning)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from db_integration_via_kafka_ksql_spark.operators.graph import bfs_levels


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _sources(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def _levels(df):
    return {r["node"]: r["level"] for r in df.collect()}


def test_bfs_path_levels_and_hop_bound(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = _levels(bfs_levels(e, _sources(spark, [1]), max_hops=3))
    # node 5 is 4 hops out — beyond the bound, absent
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_level_is_min_hops_not_any_path(spark):
    # diamond + long way around: 1->4 direct and via 2->3
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = _levels(bfs_levels(e, _sources(spark, [1]), max_hops=3))
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_is_directed(spark):
    e = _edges(spark, [(2, 1), (1, 3)])
    got = _levels(bfs_levels(e, _sources(spark, [1]), max_hops=2))
    # the in-edge 2->1 never explores backwards
    assert got == {1: 0, 3: 1}


def test_bfs_multi_source_takes_min_level(spark):
    e = _edges(spark, [(1, 2), (2, 3), (9, 3)])
    got = _levels(bfs_levels(e, _sources(spark, [1, 9]), max_hops=3))
    # 3 is reachable at hop 2 from source 1 but hop 1 from source 9
    assert got == {1: 0, 9: 0, 2: 1, 3: 1}


def test_bfs_early_exit_on_exhausted_frontier(spark):
    # component exhausts at hop 1; max_hops=5 must not fail or relabel
    e = _edges(spark, [(1, 2), (7, 8)])
    got = _levels(bfs_levels(e, _sources(spark, [1]), max_hops=5))
    assert got == {1: 0, 2: 1}


def test_bfs_zero_hops_is_sources_only(spark):
    e = _edges(spark, [(1, 2)])
    got = _levels(bfs_levels(e, _sources(spark, [1]), max_hops=0))
    assert got == {1: 0}


def test_bfs_rejects_negative_hops(spark):
    import pytest

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="max_hops"):
        bfs_levels(e, _sources(spark, [1]), max_hops=-1)
