"""Testdata loaders.

All batch operators take DataFrames, never paths — these helpers are the
only place that knows the on-disk layout (one parquet file per table,
see TESTDATA.md). At 100 TB each table would be a partitioned parquet/
Iceberg dataset; ``spark.read.parquet`` handles both shapes unchanged and
Catalyst pushes filters/column pruning into the scan either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet carries TIMESTAMP(NANOS) which vanilla Spark rejects;
    # read it as epoch-nanos long (queries expose epoch-micros via `DIV 1000`,
    # matching DuckDB's truncate-to-micros read of the same column).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() queries work."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
