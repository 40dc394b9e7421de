"""Differential gate: every registered query with an oracle must match
DuckDB bit-exactly at sf0.001 (the driver re-runs this at sf0.01)."""

from __future__ import annotations

import pytest

from db_integration_via_kafka_ksql_spark.registry import (
    QUERIES,
    all_oracles,
    all_queries,
)

from .oracle_diff import compare

_QUERIES = all_queries()
_ORACLES = all_oracles()


def test_every_query_has_callable():
    assert _QUERIES, "no queries registered"
    for name in _ORACLES:
        assert name in _QUERIES, f"oracle without query: {name}"


def test_driver_window_holds_every_exported_query():
    # the external driver verifies at most 50 queries() entries; anything
    # beyond that silently loses its correctness row (round-2 verdict)
    assert len(QUERIES) <= 50, (
        f"{len(QUERIES)} driver-exported queries > 50-row driver window; "
        "move baseline twins to driver=False"
    )


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    compare(df, _ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_oracleless_query_runs(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
