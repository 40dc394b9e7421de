"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over db_integration_via_kafka_ksql_spark.registry — the
queries and their DuckDB oracles live next to the operators they exercise.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from db_integration_via_kafka_ksql_spark.registry import (
    ORACLES,
    QUERIES,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: changelog compaction to latest-per-key — the reference's
    core semantic (ksqlDB TABLE materialization) — on sf0.001. Resolved
    from the FULL registry so driver-window rotations (which may move the
    flagship's oracle slot to aux) can never break the smoke entry."""
    return all_queries()["cdc_compact_latest"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
