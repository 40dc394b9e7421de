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


ZONEMAP_RANK_PARTS = 64


def zone_map_skip_report(
    df: DataFrame,
    cols: list[str],
    predicates: dict[str, tuple[float, float]],
    id_col: str,
    n_files: int = 64,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Measure what a layout actually BUYS: per-file min/max zone maps
    under two candidate physical orders, and how many files a
    conjunctive range predicate skips in each — the before/after gauge
    for a ZORDER rewrite (Delta/Iceberg OPTIMIZE ZORDER decisions are
    made on exactly this number, usually by guessing; this computes it).

    Files are EQUAL-ROW-COUNT rank cuts — exactly the balanced files a
    `repartitionByRange(n).sortWithinPartitions` write produces (equal
    KEY-range cuts would concentrate most rows in a few giant files
    wherever the data clusters in key space, making 'files skipped'
    meaningless). The global rank is NOT a global sort: rank within a
    key-range part (partitioned window ordered by (key, id_col) — the
    id tiebreak keeps file boundaries deterministic under key ties)
    plus broadcast prefix-sum offsets, the curriculum_order discipline;
    file = rank * n_files DIV n_rows. Layout `zorder` ranks by the
    Morton key, `single_<col0>` by the first column alone — the
    one-column-sorted baseline. Per file the zone map is min/max of
    every predicate column plus a row count; a file is skipped iff some
    predicate column's range is disjoint from the file's [min, max] —
    the parquet row-group pruning rule.

    Output (one row per layout): (layout, n_files_total, files_skipped,
    rows_total, rows_scanned, scan_permille). Z-order files bound the
    extent of ALL participating columns, so they prune on whichever
    column the predicate is selective; the single-column sort prunes
    only along its own axis (its files have unbounded extent in every
    other) — but when the predicate is tight on that one axis the
    single sort legitimately wins, which is exactly why this is
    measured, not assumed.

    Scale shape: the keyed frame is checkpointed once (both layouts
    share the scan-side key derivation), each layout pays one
    partitioned window + an n_parts-row offsets broadcast + one
    partially-aggregated groupBy to <= n_files rows; the report is an
    aggregate over those rows. All math replays in SQL
    (`events_zone_map_skip`'s oracle)."""
    from pyspark.sql.window import Window

    if n_files < 2:
        raise ValueError(f"n_files must be >= 2, got {n_files}")
    missing = [c for c in predicates if c not in df.columns]
    if missing:
        raise ValueError(f"predicate columns absent from frame: {missing}")
    keyed = zorder_key(df, cols, bits).localCheckpoint(eager=True)
    n_rows = keyed.count()  # bounded: one int off a checkpointed frame
    if n_rows == 0:
        return df.sparkSession.createDataFrame(
            [],
            "layout string, n_files_total bigint, files_skipped bigint, "
            "rows_total bigint, rows_scanned bigint, scan_permille bigint",
        )
    layouts = {
        "zorder": ("zval", 1 << (bits * len(cols))),
        f"single_{cols[0]}": (f"zb_{cols[0]}", 1 << bits),
    }
    reports = []
    for name, (key, domain) in layouts.items():
        part_width = max(domain // ZONEMAP_RANK_PARTS, 1)
        wpos = Window.partitionBy("part").orderBy(F.col(key), F.col(id_col))
        positioned = (
            keyed.select(id_col, key, *predicates)
            .withColumn("part", F.expr(f"{key} DIV {part_width}"))
            .withColumn("rn", (F.row_number().over(wpos) - 1).cast("bigint"))
            .localCheckpoint(eager=True)  # feeds sizes AND the file math
        )
        sizes = positioned.groupBy("part").agg(F.count(F.lit(1)).alias("sz"))
        woff = Window.orderBy("part").rowsBetween(
            Window.unboundedPreceding, Window.currentRow - 1
        )
        offsets = sizes.select(
            "part",
            F.coalesce(F.sum("sz").over(woff), F.lit(0))
            .cast("bigint")
            .alias("off"),
        )
        filed = positioned.join(F.broadcast(offsets), "part").select(
            *predicates,
            F.expr(f"(off + rn) * {n_files} DIV {n_rows}").alias("file_id"),
        )
        zm = filed.groupBy("file_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            *[
                agg
                for c in predicates
                for agg in (
                    F.min(F.col(c).cast("double")).alias(f"{c}__min"),
                    F.max(F.col(c).cast("double")).alias(f"{c}__max"),
                )
            ],
        )
        skip = F.lit(False)
        for c, (lo, hi) in predicates.items():
            skip = skip | (
                (F.col(f"{c}__max") < F.expr(dlit(float(lo))))
                | (F.col(f"{c}__min") > F.expr(dlit(float(hi))))
            )
        reports.append(
            zm.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_files_total"),
                F.sum(F.when(skip, 1).otherwise(0))
                .cast("bigint")
                .alias("files_skipped"),
                F.sum("n_rows").cast("bigint").alias("rows_total"),
                F.sum(F.when(skip, 0).otherwise(F.col("n_rows")))
                .cast("bigint")
                .alias("rows_scanned"),
            ).select(
                F.lit(name).alias("layout"),
                "n_files_total",
                "files_skipped",
                "rows_total",
                "rows_scanned",
                F.expr("rows_scanned * 1000 DIV rows_total").alias(
                    "scan_permille"
                ),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


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
