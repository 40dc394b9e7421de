"""Differential gate: every registered query with an oracle must match
DuckDB bit-exactly at sf0.001 (the driver re-runs this at sf0.01)."""

from __future__ import annotations

import pytest

from db_integration_via_kafka_ksql_spark.registry import ORACLES, QUERIES

from .oracle_diff import compare


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name in ORACLES:
        assert name in QUERIES, f"oracle without query: {name}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracleless_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
