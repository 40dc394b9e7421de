"""Space-filling-curve data layout: Z-order (Morton) clustering keys for
multi-dimensional scan locality.

Reference: none (the reference's tables are key-ordered Kafka topics);
this is the storage-layout extension a 100 TB lakehouse engine needs —
the same feature as Delta/Iceberg `ZORDER BY`/`sort_order`: parquet
row-group min/max statistics prune a scan only along the physical sort
order, so sorting by ONE column leaves filters on every other column
unprunable. Interleaving the bits of several normalized columns into one
Morton key gives every participating column bounded value extent within
any key range — each file/row-group then carries tight min/max stats on
ALL the z-ordered columns and a multi-dimensional predicate skips most
of them.

Exactness: bucket normalization is the histogram_quantiles fixed-order
IEEE recipe (broadcast min/max bounds, `floor((v - vmin) * 2^bits /
(vmax - vmin))` with exponent-notation literals via dlit — plain decimal
literals parse as DECIMAL with divergent scale rules across engines),
and the bit interleave is pure integer arithmetic (DIV / % / *), so the
DuckDB oracle replays the whole key derivation bit for bit.

Scale shape: one tiny bounds aggregate (single broadcast row), then the
key is scan-side column math; `zorder_layout` adds ONE range shuffle —
exactly what any global sort costs — after which the write is
embarrassingly parallel with per-file locality in every dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions.detmath import dlit

ZORDER_BITS = 16


def morton_interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave `bits` low bits of each bucket column: bit k of column
    j lands at key bit k * ncols + j. THE shared Morton kernel — both
    this module's deterministic equi-width keys and the quantile-binned
    write path (sinks/dataset.py `zorder_key`) compose it; the two
    differ only in how they bin, deliberately:

    - here: min/max equi-width buckets — a pure scan-side expression,
      no action on the input, bit-replayable in SQL (the oracle-gated
      exactness surface);
    - sinks/dataset.py: approxQuantile cut points + hash bins for
      strings — an eager action, skew-robust, for physical writes where
      balanced files matter more than replayability.
    """
    ncols = len(bucket_cols)
    z = F.lit(0).cast("bigint")
    for k in range(bits):
        for j, q in enumerate(bucket_cols):
            z = z + F.shiftleft(
                F.shiftright(q.cast("bigint"), k).bitwiseAND(F.lit(1)),
                k * ncols + j,
            )
    return z


def _bucket_expr(col: str, bits: int) -> str:
    """Normalize `col` into [0, 2^bits) against broadcast bounds
    `{col}__min` / `{col}__max` (vmax == vmin collapses to bucket 0)."""
    lo, hi, n = f"{col}__min", f"{col}__max", 1 << bits
    return (
        f"CASE WHEN {hi} = {lo} THEN CAST(0 AS BIGINT) "
        f"ELSE least(CAST(floor((CAST({col} AS DOUBLE) - {lo}) * {dlit(n)}"
        f" / ({hi} - {lo})) AS BIGINT), {n - 1}) END"
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS
) -> DataFrame:
    """Append per-column buckets (`zb_<col>`) and the interleaved Morton
    key (`zval`) for `cols` (2+ numeric columns; bits * ncols <= 62)."""
    if len(cols) < 2:
        raise ValueError("z-order needs at least 2 columns")
    if bits * len(cols) > 62:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows BIGINT")
    bounds = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(F.col(c).cast("double")).alias(f"{c}__min"),
                F.max(F.col(c).cast("double")).alias(f"{c}__max"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    bucket_names = []
    for c in cols:
        bn = f"zb_{c}"
        out = out.withColumn(bn, F.expr(_bucket_expr(c, bits)))
        bucket_names.append(bn)
    out = out.withColumn(
        "zval", morton_interleave([F.col(b) for b in bucket_names], bits)
    )
    return out.drop(*[f"{c}__{m}" for c in cols for m in ("min", "max")])


def zorder_layout(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = ZORDER_BITS
) -> DataFrame:
    """Range-partition + sort the frame by its Morton key: the physical
    layout step (write the result with `.write.parquet` and every file
    carries tight min/max stats on ALL of `cols`)."""
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(n_partitions, "zval").sortWithinPartitions(
        "zval"
    )
