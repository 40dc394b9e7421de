"""Testdata loaders.

All batch operators take DataFrames, never paths — these helpers are the
only place that knows the on-disk layout (one parquet file per table,
see TESTDATA.md). At 100 TB each table would be a partitioned parquet/
Iceberg dataset; ``spark.read.parquet`` handles both shapes unchanged and
Catalyst pushes filters/column pruning into the scan either way.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

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
    # events.parquet has shipped with `ts` as either TIMESTAMP(NANOS) or
    # timestamp[us]; tolerate both. The legacy flag only affects
    # nanos-precision columns (read as epoch-nanos long); micros arrive as
    # TIMESTAMP_NTZ. Consumers must go through epoch_us_col(), never do
    # integer math on `ts` directly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the session timezone for any string<->timestamp parsing in
    # queries. epoch_us_col itself no longer depends on this (its NTZ
    # branch is tz-independent wall-time arithmetic), but a pinned UTC
    # session keeps every other timestamp-touching expression
    # host-independent too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def epoch_us_col(df: DataFrame, ts_col: str = "ts") -> Column:
    """Epoch-microseconds expression for ``ts_col``, robust to encoding.

    The single audited place that knows how timestamps arrive on disk:

    - ``LongType``: legacy parquet TIMESTAMP(NANOS) read via
      ``nanosAsLong`` — truncate to micros (``DIV 1000``), matching
      DuckDB's micros read of the same nanosecond column.
    - ``TIMESTAMP_NTZ`` (parquet timestamp[us]/[ms]): wall-time micros
      since the NTZ epoch via ``timestampdiff`` — NTZ-only arithmetic,
      so the result is independent of ``spark.sql.session.timeZone``
      (an NTZ→timestamp cast would silently shift by the ambient zone)
      and equals DuckDB ``epoch_us(ts)`` on the same naive column.
    - ``TIMESTAMP`` (instant semantics): ``unix_micros`` directly —
      already zone-independent.

    Pure Column arithmetic either way — stays inside whole-stage codegen,
    no UDF, pushdown-friendly.
    """
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        return F.expr(f"`{ts_col}` DIV 1000")
    if isinstance(dt, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(ts_col))
    raise TypeError(
        f"column {ts_col!r} has unsupported timestamp encoding {dt}; "
        "expected epoch-nanos LongType or a parquet timestamp type"
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() queries work."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
