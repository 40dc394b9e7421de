"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key — the canonical time-series alignment operator
(trade/quote, event/state). Spark has no built-in; this is the
union-sort-window formulation:

    tag rows (right=0, left=1) → single window per key ordered by
    (ts, tag, order) → last non-null right value seen so far → keep left.

Scale properties: ONE shuffle on the key (the window partition), no
range-condition join explosion (a naive l.ts >= r.ts theta-join is
O(n·m) per key; this is O((n+m) log(n+m)) via the window sort), and
skew follows the key distribution like any window. The tag orders a
right row BEFORE a left row at equal ts, giving the inclusive
`r.ts <= l.ts` match of SQL's ASOF JOIN (DuckDB's native ASOF is the
differential oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    order_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + the latest right `value_cols`
    with right.ts <= left.ts on the same key (nulls when no prior right
    row exists). `order_col` breaks ties among right rows sharing
    (key, ts) — latest wins; required for determinism if such ties occur.
    """
    tag = "__asof_tag"
    ordr = "__asof_order"
    l = left.withColumn(tag, F.lit(1)).withColumn(
        ordr, F.lit(None).cast("bigint") if order_col is None else F.col(order_col)
    )
    r_cols = [*key_cols, ts_col, *value_cols]
    r = (
        right.select(*r_cols)
        .withColumn(tag, F.lit(0))
        .withColumn(
            ordr, F.lit(None).cast("bigint") if order_col is None else F.col(order_col)
        )
    )
    # align schemas: left carries its own columns; right contributes only
    # the value columns (renamed), padded with nulls on the other side
    out_vals = [f"{c}{suffix}" for c in value_cols]
    l_aligned = l.select(
        *left.columns,
        tag,
        ordr,
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(value_cols, out_vals)],
    )
    r_aligned = r.select(
        *[
            F.col(c) if c in (*key_cols, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        tag,
        ordr,
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
    )
    unioned = l_aligned.unionByName(r_aligned)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col(tag).asc(), F.col(ordr).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        F.col(tag),
        *[
            F.last(F.col(o), ignorenulls=True).over(w).alias(o)
            for o in out_vals
        ],
    )
    return filled.filter(F.col(tag) == 1).drop(tag)
