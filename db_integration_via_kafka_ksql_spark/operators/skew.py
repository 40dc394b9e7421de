"""Skew-handling operators: explicit salting where AQE can't help.

AQE's skew-join splitting only rescues sort-merge *joins*; skewed
*windows* and *exact top-k per key* still serialize one hot key into one
task (a key holding 10% of a 100 TB table = one task processing 10 TB).
The two-phase salted pattern below bounds per-task work at
|key partition| / n_salts for rank-style operators whose semantics
decompose (top-k does: global top-k ⊆ union of salted local top-k's).

The salt is derived from a stable hash of the row's order column — NOT
random — so results are deterministic and replays/retries see identical
assignments (required for the driver's hash gate and for streaming
idempotence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
    n_salts: int = 16,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per key, skew-safe.

    Phase 1: rank within (key, salt) — n_salts parallel tasks per hot key,
    each keeping only k rows. Phase 2: rank the <= k*n_salts survivors per
    key. Total shuffled rows per key <= k*n_salts regardless of key size.

    Equivalent to the direct window formulation (asserted in tests);
    deterministic given a deterministic tiebreak_col.
    """
    tiebreak: Column = F.col(tiebreak_col or order_col)
    salt = (F.xxhash64(tiebreak) % n_salts).cast("int").alias("__salt")
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(
        F.col(order_col).desc(), tiebreak.asc()
    )
    local = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), tiebreak.asc()
    )
    return (
        local.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .drop("__salt")
    )


def salted_distinct_count(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-safe.

    Phase 1 groups by (key, salt(value)) and collects per-salt distinct
    counts — a value always lands in the same salt bucket, so buckets
    partition the distinct space and counts add exactly.
    """
    salt = (F.xxhash64(F.col(value_col)) % n_salts).cast("int")
    per_salt = (
        df.select(*key_cols, F.col(value_col).alias("__v"), salt.alias("__salt"))
        .groupBy(*key_cols, "__salt")
        .agg(F.countDistinct("__v").alias("__d"))
    )
    return per_salt.groupBy(*key_cols).agg(
        F.sum("__d").alias(f"n_distinct_{value_col}")
    )


def skew_key_report(
    df: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Key-skew diagnostics: the report a planner reads BEFORE choosing a
    shuffle strategy (broadcast the dim? salt these keys? let AQE split?).
    For the top_k heaviest keys: count, integer share of all rows in
    permille, cumulative share, and rank — 'the top 3 user_ids carry 41%
    of events' is the number that decides whether salted_topk_per_key
    (above) is worth its second aggregation pass.

    Exactness: shares are integer permille against the exact total
    (single-row broadcast), ORDER is total (count DESC, key ASC), so the
    report is engine-replayable.

    Scale shape: one map-side-combined count per key, a TakeOrdered
    top_k (no global sort), the cumulative window over top_k rows only,
    and the total as a broadcast scalar. The per-key count frame — NOT
    the raw rows — is the largest thing that moves.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.withColumn("cum", F.sum("cnt").over(w)).select(
        F.col("key").cast("string").alias("key"),
        F.col("cnt").cast("bigint").alias("cnt"),
        F.expr("cnt * 1000 DIV total").alias("share_permille"),
        F.expr("cum * 1000 DIV total").alias("cum_share_permille"),
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
        ).cast("bigint").alias("rank"),
    )
