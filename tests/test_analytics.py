"""Hand-built semantics tests for cohort retention and ordered funnels
(the oracle gate proves engine parity; these pin the intended meaning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.analytics import (
    WEEK_US,
    cohort_retention,
    funnel_conversion,
)


def _events(spark, rows):
    # rows: (user_id, event_type, week_float) -> ts in epoch micros
    data = [(u, t, int(w * WEEK_US)) for u, t, w in rows]
    return spark.createDataFrame(
        data, "user_id long, event_type string, us long"
    )


def test_cohort_retention_matrix(spark):
    ev = _events(
        spark,
        [
            # cohort week 0: users 1, 2; user 1 returns weeks 1 and 2,
            # user 2 returns week 1 only
            (1, "view", 0.1), (1, "view", 1.2), (1, "view", 2.5),
            (2, "view", 0.8), (2, "view", 1.9),
            # cohort week 1: user 3, never returns
            (3, "view", 1.5),
        ],
    )
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_users"], r["cohort_size"], r["retained_permille"]
        )
        for r in cohort_retention(ev, F.col("us")).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1000),
        (0, 1): (2, 2, 1000),
        (0, 2): (1, 2, 500),
        (1, 0): (1, 1, 1000),
    }


def test_funnel_requires_strict_time_order(spark):
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "view", 0.1), (1, "click", 0.2), (1, "purchase", 0.3),
            # user 2: clicked BEFORE viewing -> stops at view
            (2, "click", 0.1), (2, "view", 0.2), (2, "purchase", 0.3),
            # user 3: view+click ordered, purchase before click -> step 2
            (3, "view", 0.1), (3, "purchase", 0.15), (3, "click", 0.2),
            # user 4: never viewed
            (4, "click", 0.1), (4, "purchase", 0.2),
        ],
    )
    got = {
        r["step"]: (r["n_users"], r["conversion_permille"])
        for r in funnel_conversion(
            ev, F.col("us"), ["view", "click", "purchase"]
        ).collect()
    }
    # user 2 DOES convert: view@0.2 then a later click? no later click
    # exists (click@0.1 < view) -> stops after view
    assert got == {
        "view": (3, 1000),
        "click": (2, 666),
        "purchase": (1, 333),
    }


def test_funnel_rejects_empty_steps(spark):
    import pytest

    ev = _events(spark, [(1, "view", 0.1)])
    with pytest.raises(ValueError):
        funnel_conversion(ev, F.col("us"), [])


def test_transition_matrix_hand_example(spark):
    from db_integration_via_kafka_ksql_spark.operators.analytics import (
        event_transition_matrix,
    )

    rows = [
        # user 1: view -> click -> view ; user 2: view -> view
        (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "view", 30),
        (2, 4, "view", 10), (2, 5, "view", 20),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, us long"
    )
    got = {
        (r["from_type"], r["to_type"]): (
            r["n_transitions"], r["from_total"], r["permille"]
        )
        for r in event_transition_matrix(ev, F.col("us")).collect()
    }
    assert got == {
        ("view", "click"): (1, 2, 500),
        ("view", "view"): (1, 2, 500),
        ("click", "view"): (1, 1, 1000),
    }


def test_transition_matrix_tie_breaks_on_event_id(spark):
    from db_integration_via_kafka_ksql_spark.operators.analytics import (
        event_transition_matrix,
    )

    # identical timestamps: event_id supplies the total order
    rows = [(1, 1, "a", 10), (1, 2, "b", 10), (1, 3, "c", 10)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, us long"
    )
    got = {
        (r["from_type"], r["to_type"])
        for r in event_transition_matrix(ev, F.col("us")).collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_funnel_zero_first_step_is_all_zero_not_divide_by_zero(spark):
    """ADVICE round 9: if no user performs step 1, first_n is 0 and the
    unguarded DIV raised DIVIDE_BY_ZERO under Spark 4's default ANSI
    mode; the guarded ratio returns three zero rows instead."""
    ev = _events(
        spark,
        [(1, "click", 0.1), (1, "purchase", 0.2), (2, "click", 0.3)],
    )
    got = {
        r["step"]: (r["n_users"], r["conversion_permille"])
        for r in funnel_conversion(
            ev, F.col("us"), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": (0, 0), "click": (0, 0), "purchase": (0, 0)}
