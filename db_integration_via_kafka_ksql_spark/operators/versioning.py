"""Dataset snapshot diff — content-hash versioning between two corpus
snapshots.

Reference: none (the reference versions nothing; its tables are
latest-state views). This is the dataset-versioning primitive a training
pipeline runs between crawl refreshes: which documents were added,
removed, changed, or untouched — the input to incremental re-processing
(only `added`+`changed` need re-curation/re-embedding) and to dataset
cards ("v2 = v1 - 3.1M removed + 12.4M added").

Semantics: rows align on a key column; content identity is the md5 of
the fingerprint columns (concat_ws with a US unit separator so column
boundaries can't alias: ('ab','c') != ('a','bc'); each column carries a
0/1 null-indicator prefix so NULL != '' and a NULL column can't collapse
out of the concatenation — ('a',NULL,'b') != ('a','b')). change_type is
one of added / removed / changed / unchanged.

Scale shape: fingerprints are scan-side column math; the diff is ONE
full-outer sort-merge/hash join on the key (each side shuffles once —
unavoidable for an alignment); the summary re-aggregates the diff frame
map-side-combined. No driver involvement at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"  # unit separator: unambiguous multi-column fingerprints


def _fingerprint(cols: tuple[str, ...]):
    # concat_ws SKIPS null args, so a bare cast would conflate NULL with
    # '' and let a NULL column collapse out entirely (('a',NULL,'b') ==
    # ('a','b')). A 0/1 null-indicator prefix per column is collision-free
    # without needing an in-band sentinel the data could contain.
    parts = [
        F.concat(
            F.when(F.col(c).isNull(), F.lit("0")).otherwise(F.lit("1")),
            F.coalesce(F.col(c).cast("string"), F.lit("")),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    fingerprint_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Row-level diff: (key, change_type, old_fp, new_fp)."""
    o = old.select(
        F.col(key_col).alias("k"), _fingerprint(fingerprint_cols).alias("old_fp")
    )
    n = new.select(
        F.col(key_col).alias("k"), _fingerprint(fingerprint_cols).alias("new_fp")
    )
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key_col),
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        "old_fp",
        "new_fp",
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    fingerprint_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """The dataset-card rollup: (change_type, n)."""
    return (
        snapshot_diff(old, new, key_col, fingerprint_cols)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
