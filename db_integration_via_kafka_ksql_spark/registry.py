"""Query registry: every implemented operator as a (spark, sf_dir) -> DataFrame
callable plus, where SQL-expressible, a DuckDB oracle producing identical
columns/values. __spark_entry__.py re-exports these for the driver.

Parity rules (driver hash-compares sorted columns at sf0.01):
- Alias every computed column identically in Spark and SQL.
- Timestamps are exposed as epoch microseconds (Spark ``unix_micros`` ==
  DuckDB ``epoch_us`` for parquet-sourced values) — timezone-independent.
- Money/double aggregations go through DECIMAL(18,4) so the sum is
  order-independent and bit-identical in both engines, then cast back to
  DOUBLE for a schema both sides agree on.
- Counts/sums of ints are cast to BIGINT explicitly (DuckDB sums ints to
  INT128 otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Oracle-baseline twins and redundant variants: fully implemented and
# DuckDB-parity-gated in tests (tests/test_oracle_parity.py runs BOTH
# registries), but kept OUT of queries() because the external driver
# verifies at most 50 entries — the 50 driver slots go to the scale-path
# variant of each family, never to its intentionally-quadratic or
# single-probe baseline twin.
AUX_QUERIES: dict[str, QueryFn] = {}
AUX_ORACLES: dict[str, str] = {}


def query(
    name: str, oracle: str | None = None, driver: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL).

    driver=False registers into the auxiliary registry: still parity-gated
    locally, not exported to the external driver's 50-row window."""

    def deco(fn: QueryFn) -> QueryFn:
        (QUERIES if driver else AUX_QUERIES)[name] = fn
        if oracle is not None:
            (ORACLES if driver else AUX_ORACLES)[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    """Driver + auxiliary queries (for tests and local tooling)."""
    return {**QUERIES, **AUX_QUERIES}


def all_oracles() -> dict[str, str]:
    return {**ORACLES, **AUX_ORACLES}


# importing the query modules populates the registry
from db_integration_via_kafka_ksql_spark.queries import (  # noqa: E402,F401
    cdc_queries,
    relational_queries,
    dedup_queries,
    similarity_queries,
    kmeans_queries,
    text_queries,
    multimodal_queries,
    sketch_queries,
    retrieval_queries,
    analytics_queries,
)
