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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_Z_COL = "__zorder__"


def _dim_bin(df: DataFrame, col: str, bins: int) -> Column:
    """Map one z-order dimension to 0..bins-1.

    Numeric columns bin by approximate QUANTILES (driver collects bins-1
    cut points — bounded, one pass) so skewed distributions still spread
    across bins; the bin is a JVM-side binary-search-equivalent
    `size(filter(cuts, c <= v))` over the literal cut array. Non-numeric
    columns hash-bin (xxhash64 mod bins): that clusters EQUALITY
    predicates (`source = 'web'` skips files), which is what string
    filters are in practice; range predicates on strings stay unclustered
    and the docstring says so. NULLs deterministically land in bin 0."""
    field = df.schema[col]
    if isinstance(field.dataType, NumericType):
        probs = [i / bins for i in range(1, bins)]
        cuts = df.stat.approxQuantile(col, probs, 0.001)
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        return F.size(
            F.filter(arr, lambda c: c <= F.col(col).cast("double"))
        )
    return F.pmod(F.xxhash64(F.col(col)), F.lit(bins)).cast("int")


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits_per_dim: int = 8
) -> Column:
    """Interleaved-bit (Morton) key over `cols`: bit i of every
    dimension's bin lands at position i*ndims+j, so sorting by the key
    gives every listed column locality simultaneously — per-file parquet
    min/max stats narrow on ALL of them, instead of only the first sort
    column. ~2^bits_per_dim quantile bins per dimension; ndims *
    bits_per_dim total bits (<= 63 enforced).

    Note: the numeric-bin cut points come from `df.stat.approxQuantile`,
    an eager ACTION on `df` — pass a materialized/checkpointed frame, not
    an expensive unsaved pipeline, or it will recompute."""
    if not cols:
        raise ValueError("zorder cols must be non-empty")
    nd = len(cols)
    if nd * bits_per_dim > 63:
        raise ValueError("ndims * bits_per_dim must fit a signed long")
    bins = 1 << bits_per_dim
    dim_bins = [_dim_bin(df, c, bins) for c in cols]
    z = F.lit(0).cast("bigint")
    for bit in range(bits_per_dim):
        for j, q in enumerate(dim_bins):
            z = z + F.call_function(
                "shiftleft",
                F.call_function("getbit", q.cast("bigint"), F.lit(bit)).cast(
                    "bigint"
                ),
                F.lit(bit * nd + j),
            )
    return z


def write_dataset(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    zorder_cols: Sequence[str] = (),
    zorder_bits: int = 8,
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """Write `df` as hive-partitioned parquet with a bounded file count.

    One shuffle (on the partition columns) routes every row of a
    partition value to one task; the in-task sort is partition cols first
    (so a task holding several values writes each directory contiguously)
    then `sort_cols` for intra-file locality.

    `zorder_cols` replaces the plain sort with a Morton-key sort
    (:func:`zorder_key`) inside each hive partition: with
    `max_records_per_file` splitting the partition into several files,
    each file covers a contiguous z-range — a small rectangle in EVERY
    z-ordered dimension — so point/range reads on any of those columns
    skip most files via row-group stats, where a single-column sort only
    helps its first column (test_dataset_sink.py measures both).
    Mutually exclusive with `sort_cols`.
    """
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    if zorder_cols and sort_cols:
        raise ValueError("pass sort_cols or zorder_cols, not both")
    if zorder_cols:
        df = df.withColumn(_Z_COL, zorder_key(df, zorder_cols, zorder_bits))
        sort_cols = (_Z_COL,)
    routed = df.repartition(*[F.col(c) for c in partition_cols])
    routed = routed.sortWithinPartitions(*partition_cols, *sort_cols)
    if zorder_cols:
        routed = routed.drop(_Z_COL)
    writer = routed.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Read a dataset written by `write_dataset`. Filters on the partition
    columns become directory-level pruning (PartitionFilters in the scan,
    asserted in tests/test_dataset_sink.py), not row-level work."""
    return spark.read.parquet(path)
