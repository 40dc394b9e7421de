"""snapshot_diff semantics: all four change legs on hand-built frames,
multi-column fingerprint boundary unambiguity, and the summary rollup."""

from __future__ import annotations

from db_integration_via_kafka_ksql_spark.operators.versioning import (
    snapshot_diff,
    snapshot_diff_summary,
)


def test_all_change_legs(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["change_type"]
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    summary = {
        r["change_type"]: r["n"]
        for r in snapshot_diff_summary(old, new).collect()
    }
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_multi_column_fingerprint_no_boundary_alias(spark):
    # ('ab','c') must differ from ('a','bc'): the unit separator keeps
    # column boundaries in the hash
    old = spark.createDataFrame([(1, "ab", "c")], "doc_id long, a string, b string")
    new = spark.createDataFrame([(1, "a", "bc")], "doc_id long, a string, b string")
    got = snapshot_diff(old, new, fingerprint_cols=("a", "b")).collect()
    assert got[0]["change_type"] == "changed"


def test_null_fingerprint_column_stable(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    got = {r["doc_id"]: r["change_type"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "unchanged"}


def test_null_vs_empty_reported_as_changed(spark):
    # the null-indicator prefix keeps NULL != '' in the fingerprint
    old = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "")], "doc_id long, text string")
    got = snapshot_diff(old, new).collect()
    assert got[0]["change_type"] == "changed"


def test_null_column_shift_reported_as_changed(spark):
    # concat_ws skips NULLs, so without the indicator ('a',NULL,'b') and
    # ('a','b',NULL) would hash identically — a NULL transition between
    # columns must be reported as changed
    schema = "doc_id long, a string, b string, c string"
    old = spark.createDataFrame([(1, "a", None, "b")], schema)
    new = spark.createDataFrame([(1, "a", "b", None)], schema)
    got = snapshot_diff(old, new, fingerprint_cols=("a", "b", "c")).collect()
    assert got[0]["change_type"] == "changed"
