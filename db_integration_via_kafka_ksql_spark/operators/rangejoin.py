"""Range / interval joins — the second custom-operator family (with as-of)
that Spark has no built-in for.

Two shapes:
- **keyed_range_join**: point-in-interval where both sides share an equi
  key (event ↦ its session). The equi key carries the join — Spark plans
  a hash join on the key and the range predicate is a post-filter; with
  bounded intervals per key this is the right plan at any scale.
- **interval_join_bucketed**: NO equi key. A naive theta join is O(n·m);
  bucketing makes it linear-ish: intervals explode to the fixed-width
  buckets they cover, points map to exactly one bucket, and the join is
  bucket-equi + exact containment filter. A point lies in exactly one
  bucket, so no dedup pass is needed. Bucket width trades explode factor
  (wide intervals → many buckets) against bucket occupancy; pick it near
  the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Rows of `points` joined to the interval(s) of the same key that
    contain them (start <= point <= end, inclusive)."""
    ivs = intervals
    for k in key_cols:
        ivs = ivs.withColumnRenamed(k, f"__iv_{k}")
    cond = None
    for k in key_cols:
        c = points[k] == ivs[f"__iv_{k}"]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (points[point_col] >= ivs[start_col])
        & (points[point_col] <= ivs[end_col])
    )
    return points.join(ivs, cond, how).drop(*[f"__iv_{k}" for k in key_cols])


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Unkeyed point-in-interval join via fixed-width bucketing.

    cost ~ |points| + sum(interval_len/width) + matches, vs |points|·|intervals|
    for the theta join. Exact: the bucket join only generates candidates;
    the containment filter decides.
    """
    b = "__bucket"
    pts = points.withColumn(b, (F.col(point_col) / bucket_width).cast("bigint"))
    ivs = intervals.withColumn(
        b,
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("bigint"),
                (F.col(end_col) / bucket_width).cast("bigint"),
            )
        ),
    )
    return (
        pts.join(ivs, b)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop(b)
    )
