"""File-backed changelog sources: tests, replay, and snapshot+stream.

- `file_changelog_stream`: a parquet-directory streaming source — each
  file dropped into the directory becomes (part of) a micro-batch. This
  is the test harness's stand-in for a Kafka topic: same columns, same
  ordering contract (monotone `offset` per key).
- `snapshot_then_changelog` (S2): the reference's snapshot.mode=initial —
  a batch full-table read emitted logically *before* the stream. In Spark
  the union happens at the state level: seed the state store/sink with
  the snapshot (offset 0), then start the stream from the first real
  offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def file_changelog_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming changelog from a parquet directory (one topic ≈ one dir).

    maxFilesPerTrigger=1 makes each dropped file its own micro-batch —
    deterministic batch boundaries for the scenario tests.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )


def snapshot_as_changelog(
    snapshot: DataFrame,
    deleted_col: str = "__deleted",
    offset_col: str = "offset",
) -> DataFrame:
    """Adapt a full-table snapshot to changelog shape: every row is an
    upsert at offset 0 (all real offsets start at 1)."""
    out = snapshot
    if deleted_col not in out.columns:
        out = out.withColumn(deleted_col, F.lit("false"))
    if offset_col not in out.columns:
        out = out.withColumn(offset_col, F.lit(0).cast("bigint"))
    return out
