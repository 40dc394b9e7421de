"""Partitioned training-dataset materialization (the curation output side).

A curated corpus is consumed by trainers as hive-partitioned parquet:

- **partition by the routing columns** the trainer filters on (epoch,
  source): readers prune whole directories before opening a single file —
  an epoch-0 reader of a 100 TB corpus lists only `epoch=0/`;
- **bound the file count explicitly**: `repartition(partition_cols)` puts
  each partition value in one task, so each leaf directory gets exactly
  one file instead of one-per-upstream-task (the small-files explosion —
  32 tasks x 20 leaf dirs = 640 files without it);
  `maxRecordsPerFile` re-splits oversized partitions so a hot source
  still parallelizes on read;
- **sort within files** (doc id / fingerprint) so related rows co-locate
  and parquet min/max row-group stats stay selective.

This is deliberately plain `DataFrameWriter.partitionBy` — Catalyst's
partition pruning and parquet's predicate pushdown do the read-side work;
`plans/audit.py` exposes `PartitionFilters` so tests pin that pruning
actually happens rather than trusting it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_dataset(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """Write `df` as hive-partitioned parquet with a bounded file count.

    One shuffle (on the partition columns) routes every row of a
    partition value to one task; the in-task sort is partition cols first
    (so a task holding several values writes each directory contiguously)
    then `sort_cols` for intra-file locality.
    """
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    routed = df.repartition(*[F.col(c) for c in partition_cols])
    routed = routed.sortWithinPartitions(*partition_cols, *sort_cols)
    writer = routed.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Read a dataset written by `write_dataset`. Filters on the partition
    columns become directory-level pruning (PartitionFilters in the scan,
    asserted in tests/test_dataset_sink.py), not row-level work."""
    return spark.read.parquet(path)
