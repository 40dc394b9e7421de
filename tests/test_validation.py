"""Constraint-suite unit tests: every constraint family exercised on a
deliberately dirty frame (the oracle-parity query only sees clean TPC-H
data, where every check passes — the fail paths live here)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as ST

from db_integration_via_kafka_ksql_spark.operators import validation as VAL

SCHEMA = ST.StructType(
    [
        ST.StructField("id", ST.LongType()),
        ST.StructField("fk", ST.LongType()),
        ST.StructField("status", ST.StringType()),
        ST.StructField("amount", ST.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, 10, "O", 5.0),
        (2, 10, "F", -1.0),  # predicate violation
        (2, 11, "X", 3.0),  # duplicate id + domain violation
        (3, None, None, None),  # null fk (not an orphan), null status/amount
        (4, 99, "O", 2.0),  # orphan fk
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame([(10,), (11,), (11,)], ["pk"])


def _checks(ref):
    return [
        VAL.completeness("fk_complete", "fk"),
        VAL.in_set("status_domain", "status", ("O", "F")),
        VAL.predicate("amount_positive", "amount > 0"),
        VAL.uniqueness("id_unique", "id"),
        VAL.referential("fk_resolves", "fk", ref, "pk"),
    ]


def test_every_family_counts_exact_violations(dirty, ref):
    rep = {
        r["constraint"]: r
        for r in VAL.check_constraints(dirty, _checks(ref)).collect()
    }
    assert len(rep) == 5
    # completeness: 1 NULL fk of 5
    assert (rep["fk_complete"]["n_bad"], rep["fk_complete"]["metric_permille"]) == (1, 800)
    # domain: 'X' and NULL both violate
    assert rep["status_domain"]["n_bad"] == 2
    # predicate: -1.0 fails, NULL fails (coalesce false)
    assert rep["amount_positive"]["n_bad"] == 2
    # uniqueness: id 2 appears twice -> 1 surplus occurrence
    assert rep["id_unique"]["n_bad"] == 1
    # referential: fk 99 is the only orphan; NULL fk is NOT an orphan,
    # and the duplicated reference key 11 is deduplicated before the join
    assert rep["fk_resolves"]["n_bad"] == 1
    assert rep["fk_resolves"]["n_rows"] == 5
    assert all(r["status"] == "fail" for r in rep.values())


def test_min_permille_bar_splits_pass_fail(dirty, ref):
    checks = [
        VAL.completeness("soft_complete", "fk", min_permille=800),
        VAL.completeness("hard_complete", "fk", min_permille=900),
    ]
    rep = {r["constraint"]: r["status"] for r in VAL.check_constraints(dirty, checks).collect()}
    assert rep == {"soft_complete": "pass", "hard_complete": "fail"}


def test_clean_frame_passes_everything(spark, ref):
    clean = spark.createDataFrame([(1, 10, "O", 1.0), (2, 11, "F", 2.0)], SCHEMA)
    rep = VAL.check_constraints(clean, _checks(ref)).collect()
    assert {r["status"] for r in rep} == {"pass"}
    assert {r["metric_permille"] for r in rep} == {1000}


def test_empty_frame_vacuous_pass(spark, ref):
    empty = spark.createDataFrame([], SCHEMA)
    rep = VAL.check_constraints(empty, _checks(ref)).collect()
    assert len(rep) == 5
    assert all(r["status"] == "pass" and r["metric_permille"] == 1000 for r in rep)
    assert all(r["n_rows"] == 0 and r["n_bad"] == 0 for r in rep)


def test_duplicate_constraint_names_refused(dirty, ref):
    with pytest.raises(ValueError, match="unique"):
        VAL.check_constraints(
            dirty,
            [VAL.completeness("x", "fk"), VAL.uniqueness("x", "id")],
        )


def test_in_set_escapes_quotes(spark):
    df = spark.createDataFrame([(1, None, "o'k", 1.0)], SCHEMA)
    rep = VAL.check_constraints(
        df, [VAL.in_set("quoted", "status", ("o'k",))]
    ).collect()
    assert rep[0]["n_bad"] == 0 and rep[0]["status"] == "pass"


def test_empty_checks_list_yields_empty_typed_report(spark):
    df = spark.createDataFrame([(1, None, "ok", 1.0)], SCHEMA)
    rep = VAL.check_constraints(df, [])
    assert rep.count() == 0
    assert [f.name for f in rep.schema.fields] == [
        "constraint", "n_rows", "n_bad", "metric_permille", "status",
    ]


def test_in_set_empty_domain_marks_every_row_bad(spark):
    # an empty allowed set means no value conforms — and must not emit
    # the invalid `IN ()` SQL fragment
    df = spark.createDataFrame([(1, None, "a", 1.0), (2, None, None, 2.0)], SCHEMA)
    rep = VAL.check_constraints(df, [VAL.in_set("none", "status", ())]).collect()
    assert rep[0]["n_bad"] == 2 and rep[0]["status"] == "fail"
