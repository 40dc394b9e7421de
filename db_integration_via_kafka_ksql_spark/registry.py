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


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# importing the query modules populates the registry
from db_integration_via_kafka_ksql_spark.queries import (  # noqa: E402,F401
    cdc_queries,
    relational_queries,
    dedup_queries,
    similarity_queries,
    text_queries,
    multimodal_queries,
)
