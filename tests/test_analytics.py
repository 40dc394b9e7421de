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


# -- hourly gap-fill ---------------------------------------------------------

from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    HOUR_US,
    DAY_US,
    decay_engagement,
    hourly_gapfill,
)


def _hour_events(spark, rows):
    # rows: (event_type, hour) -> one event in that hour
    data = [(t, h * HOUR_US + 7) for t, h in rows]
    return spark.createDataFrame(data, "event_type string, us long")


def test_gapfill_zero_fills_and_moving_window_spans_gaps(spark):
    ev = _hour_events(
        spark,
        # type a: hours 0 (x2) and 3 — hours 1, 2 are gaps
        [("a", 0), ("a", 0), ("a", 3),
         # type b: only hour 1 — the global range [0, 3] still applies
         ("b", 1)],
    )
    got = {
        (r["event_type"], r["hour"]): (
            r["n_events"], r["mov_sum"], r["mov_hours"], r["mov_avg_milli"]
        )
        for r in hourly_gapfill(ev, F.col("us"), trailing_hours=3).collect()
    }
    # dense grid: 2 types x hours 0..3, zeros explicit
    assert len(got) == 8
    # type a: the hour-3 window spans the two zero-filled gap hours
    assert got[("a", 0)] == (2, 2, 1, 2000)
    assert got[("a", 1)] == (0, 2, 2, 1000)
    assert got[("a", 2)] == (0, 2, 3, 666)
    assert got[("a", 3)] == (1, 1, 3, 333)
    # type b quiet at both edges still gets the full global range
    assert got[("b", 0)] == (0, 0, 1, 0)
    assert got[("b", 1)] == (1, 1, 2, 500)
    assert got[("b", 3)] == (0, 1, 3, 333)


def test_hour_bucketing_floors_pre_1970_timestamps(spark):
    """ADVICE r14: truncating DIV collapsed (-1h, 0) into bucket 0; the
    floor_div_sql bucketing puts it in hour -1, matching python's //
    (the sequential-model convention) AND the DuckDB oracle rendering."""
    import duckdb

    from db_integration_via_kafka_ksql_spark.operators.analytics import (
        floor_div_sql,
        hourly_counts,
    )

    us = [-1, -HOUR_US, -HOUR_US - 1, 0, HOUR_US - 1, HOUR_US]
    ev = spark.createDataFrame(
        [("a", u) for u in us], "event_type string, us long"
    )
    got = {
        r["hour"]: r["n_events"]
        for r in hourly_counts(ev, F.col("us")).collect()
    }
    expect: dict[int, int] = {}
    for u in us:
        expect[u // HOUR_US] = expect.get(u // HOUR_US, 0) + 1
    assert got == expect  # {-2: 1, -1: 2, 0: 2, 1: 1}
    # the duckdb rendering floors identically on the same inputs
    dd = duckdb.sql(
        "SELECT "
        + floor_div_sql("u", HOUR_US, "duckdb")
        + " AS h FROM (SELECT unnest(["
        + ", ".join(str(u) for u in us)
        + "]::BIGINT[]) AS u)"
    ).fetchall()
    assert sorted(h for (h,) in dd) == sorted(u // HOUR_US for u in us)


def test_gapfill_from_counts_preaggregates_duplicate_keys(spark):
    """ADVICE r14: a duplicate (type, hour) key in the caller's count
    table must sum, not fan out the grid join / double-count windows."""
    from db_integration_via_kafka_ksql_spark.operators.analytics import (
        gapfill_from_counts,
    )

    counts = spark.createDataFrame(
        [("a", 0, 2), ("a", 0, 3), ("a", 1, 1)],
        "event_type string, hour long, n_events long",
    )
    got = {
        (r["event_type"], r["hour"]): (r["n_events"], r["mov_sum"])
        for r in gapfill_from_counts(counts, trailing_hours=2).collect()
    }
    assert got == {("a", 0): (5, 5), ("a", 1): (1, 6)}


def test_gapfill_rejects_bad_window(spark):
    ev = _hour_events(spark, [("a", 0)])
    import pytest

    with pytest.raises(ValueError, match="trailing_hours"):
        hourly_gapfill(ev, F.col("us"), trailing_hours=0)


# -- recency-decay engagement ------------------------------------------------


def _day_events(spark, rows):
    # rows: (user_id, day) -> one event that day
    data = [(u, d * DAY_US + 11) for u, d in rows]
    return spark.createDataFrame(data, "user_id long, us long")


def test_decay_halves_stepwise_per_half_life(spark):
    ev = _day_events(
        spark,
        # horizon = day 20 (user 3's event). half_life 7: ages 0 and 6
        # -> 2^0 (1M ppm); ages 7..13 -> 2^1 (500k); age 14 -> 2^2 (250k)
        [(1, 20), (1, 14), (1, 13), (1, 6),
         (3, 20)],
    )
    got = {
        r["user_id"]: (r["n_events"], r["last_seen_day"], r["score_ppm"])
        for r in decay_engagement(ev, F.col("us"), half_life_days=7).collect()
    }
    assert got[1] == (4, 20, 1_000_000 + 1_000_000 + 500_000 + 250_000)
    assert got[3] == (1, 20, 1_000_000)


def test_decay_shift_exponent_is_capped(spark):
    # an event 10,000 days before the horizon would shift by 1428 without
    # the cap (BIGINT overflow in the 2^x term); capped it scores 0 ppm
    ev = _day_events(spark, [(1, 10_000), (2, 0)])
    got = {
        r["user_id"]: r["score_ppm"]
        for r in decay_engagement(ev, F.col("us"), half_life_days=7).collect()
    }
    assert got == {1: 1_000_000, 2: 0}


def test_decay_rejects_bad_half_life(spark):
    import pytest

    ev = _day_events(spark, [(1, 0)])
    with pytest.raises(ValueError, match="half_life_days"):
        decay_engagement(ev, F.col("us"), half_life_days=0)


def test_gapfill_guards_corrupted_timestamp_span(spark):
    # one stray far-future hour would inflate the dense spine to millions
    # of rows — the guard must raise at execution, not materialize it
    ev = _hour_events(spark, [("a", 0), ("a", 5_000_000)])
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="max_span_hours"):
        hourly_gapfill(ev, F.col("us")).collect()
    with pytest.raises(ValueError, match="max_span_hours"):
        hourly_gapfill(ev, F.col("us"), max_span_hours=0)


def test_decay_excludes_null_user_and_ts_from_scores_and_horizon(spark):
    """Code-review r14: the NULL stance must match the streaming twin's
    at-ingest filter — a NULL-user or NULL-ts event carries no
    engagement AND does not move the as-of horizon."""
    ev = spark.createDataFrame(
        [(1, 0 * DAY_US + 1), (None, 7 * DAY_US + 1), (1, None)],
        "user_id long, us long",
    )
    got = {
        r["user_id"]: (r["n_events"], r["last_seen_day"], r["score_ppm"])
        for r in decay_engagement(ev, F.col("us"), half_life_days=7).collect()
    }
    # horizon is day 0 (the NULL-user day-7 row is excluded), so user 1
    # scores a full 1M ppm; no NULL-keyed row appears
    assert got == {1: (1, 0, 1_000_000)}


# -- time-series similarity search --------------------------------------------

from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    series_similarity_topk,
)


def _series(spark, rows):
    # rows: (event_type, hour, n_events) — a DENSE series
    return spark.createDataFrame(
        rows, "event_type string, hour long, n_events long"
    )


def test_series_similarity_finds_planted_repeat(spark):
    # type a repeats the exact pattern [5,1,4] at hours 0-2 and 7-9; the
    # query window (last full 3h window, hours 7-9) must match hours 0-2
    # at distance 0 ahead of everything else
    a = {0: 5, 1: 1, 2: 4, 3: 0, 4: 0, 5: 0, 6: 9, 7: 5, 8: 1, 9: 4}
    rows = [("a", h, n) for h, n in a.items()]
    rows += [("b", h, 2) for h in range(10)]  # constant control type
    got = series_similarity_topk(
        _series(spark, rows), window_hours=3, top_k=1
    ).collect()
    by_q = {r["query_type"]: r for r in got}
    assert by_q["a"]["match_type"] == "a"
    assert by_q["a"]["match_start"] == 0
    assert by_q["a"]["dist"] == 0
    # b's own history is all-constant: its best match is itself at the
    # earliest eligible start (dist 0, ties break on type asc, start asc)
    assert (
        by_q["b"]["match_type"],
        by_q["b"]["match_start"],
        by_q["b"]["dist"],
    ) == ("b", 0, 0)


def test_series_similarity_nonoverlap_boundary(spark):
    # 6 hours, window 3: query start = 3; eligible starts satisfy
    # start + 3 <= 3 -> only start 0 (start 1 would overlap hour 3)
    rows = [("a", h, h) for h in range(6)]
    got = series_similarity_topk(
        _series(spark, rows), window_hours=3, top_k=5
    ).collect()
    assert {r["match_start"] for r in got} == {0}


def test_series_similarity_cross_type_match(spark):
    # type b's query window equals type a's early window exactly
    rows = [("a", 0, 7), ("a", 1, 8), ("a", 2, 0), ("a", 3, 0),
            ("b", 0, 1), ("b", 1, 1), ("b", 2, 7), ("b", 3, 8)]
    got = {
        r["query_type"]: r
        for r in series_similarity_topk(
            _series(spark, rows), window_hours=2, top_k=1
        ).collect()
    }
    assert got["b"]["match_type"] == "a"
    assert got["b"]["match_start"] == 0
    assert got["b"]["dist"] == 0


def test_series_similarity_too_short_series_is_empty(spark):
    # 4 hours, window 3: query start = 1, no window ends by hour 1
    rows = [("a", h, 1) for h in range(4)]
    assert (
        series_similarity_topk(
            _series(spark, rows), window_hours=3, top_k=2
        ).count()
        == 0
    )


def test_series_similarity_rejects_bad_params(spark):
    import pytest

    s = _series(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="window_hours"):
        series_similarity_topk(s, window_hours=0)
    with pytest.raises(ValueError, match="top_k"):
        series_similarity_topk(s, top_k=0)


# -- series discords (matrix-profile screen) -----------------------------------

from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    series_discords,
)


def test_discords_flag_the_planted_spike(spark):
    # constant traffic except a single spike at hour 10: the windows
    # containing the spike have no near neighbor anywhere -> top discords
    rows = [("a", h, 50 if h == 10 else 2) for h in range(20)]
    got = series_discords(
        _series(spark, rows), window_hours=3, recent_windows=100, top_k=3
    ).collect()
    by_rank = {r["rnk"]: r for r in got}
    # starts 8, 9, 10 all contain the spike with identical nn_dist 48^2;
    # ties break on start asc
    assert [by_rank[i]["start"] for i in (1, 2, 3)] == [8, 9, 10]
    assert by_rank[1]["nn_dist"] == 48 * 48
    # their nearest neighbors are constant windows (dist to [2,2,2])
    assert all(r["nn_dist"] == 2304 for r in got)


def test_discords_respect_the_exclusion_zone(spark):
    # constant series: every window identical (nn_dist 0), but the
    # nearest neighbor must come from OUTSIDE |delta| >= window_hours
    rows = [("a", h, 5) for h in range(12)]
    got = series_discords(
        _series(spark, rows), window_hours=4, recent_windows=100, top_k=100
    ).collect()
    assert got
    for r in got:
        assert abs(r["nn_start"] - r["start"]) >= 4
        assert r["nn_dist"] == 0


def test_discords_probe_only_recent_windows(spark):
    rows = [("a", h, h % 3) for h in range(15)]
    got = series_discords(
        _series(spark, rows), window_hours=3, recent_windows=4, top_k=100
    ).collect()
    # full windows end at start 12; probes are starts > 12 - 4 = {9..12}
    assert {r["start"] for r in got} <= {9, 10, 11, 12}
    assert len(got) == 4


def test_discords_reject_bad_params(spark):
    import pytest

    s = _series(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="recent_windows"):
        series_discords(s, recent_windows=0)
    with pytest.raises(ValueError, match="top_k"):
        series_discords(s, top_k=0)


# -- lead-lag cross-correlation ------------------------------------------------

from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    series_lag_correlation,
)


def test_lag_correlation_finds_planted_lead_lag(spark):
    # a spikes at hour 0, b spikes at hour 3 -> b follows a by 3
    cells = {("a", h): 0 for h in range(6)} | {("b", h): 0 for h in range(6)}
    cells[("a", 0)] = 1
    cells[("b", 3)] = 1
    rows = [(t, h, n) for (t, h), n in cells.items()]
    got = {
        (r["src_type"], r["dst_type"]): (r["lag_hours"], r["avg_prod_milli"])
        for r in series_lag_correlation(
            _series(spark, rows), max_lag_hours=4, top_k=1
        ).collect()
    }
    # overlap for lag 3 over hours 0..5 is 3 hours -> 1000 * 1 // 3
    assert got[("a", "b")] == (3, 333)


def test_lag_correlation_self_pair_finds_period(spark):
    # period-2 square wave: autocorrelation peaks at even lags; the
    # earliest peak (lag 2) wins the (avg desc, lag asc) tie-break
    rows = [("c", h, 1 if h % 2 == 0 else 0) for h in range(6)]
    got = {
        (r["src_type"], r["dst_type"]): (r["lag_hours"], r["avg_prod_milli"])
        for r in series_lag_correlation(
            _series(spark, rows), max_lag_hours=4, top_k=1
        ).collect()
    }
    assert got[("c", "c")] == (2, 500)


def test_lag_correlation_rejects_bad_params(spark):
    import pytest

    s = _series(spark, [("a", 0, 1)])
    with pytest.raises(ValueError, match="max_lag_hours"):
        series_lag_correlation(s, max_lag_hours=0)
    with pytest.raises(ValueError, match="top_k"):
        series_lag_correlation(s, top_k=0)


# -- hour-of-day seasonality profile -------------------------------------------

from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    hour_of_day_profile,
)


def test_hour_of_day_profile_folds_days_and_shares(spark):
    # two days of dense series: type a puts 3 events at hod 2 each day
    # and 1 at hod 5 on day one; everything else zero
    cells = {("a", h): 0 for h in range(48)}
    cells[("a", 2)] = 3
    cells[("a", 26)] = 3   # hod 2, day 2
    cells[("a", 5)] = 1
    rows = [(t, h, n) for (t, h), n in cells.items()]
    got = {
        r["hour_of_day"]: (r["n_events"], r["type_total"], r["share_permille"])
        for r in hour_of_day_profile(_series(spark, rows)).collect()
    }
    assert len(got) == 24  # every slot present, zeros explicit
    assert got[2] == (6, 7, 857)
    assert got[5] == (1, 7, 142)
    assert got[0] == (0, 7, 0)


def test_hour_of_day_profile_zero_traffic_type_is_all_zero_shares(spark):
    rows = [("quiet", h, 0) for h in range(24)]
    got = hour_of_day_profile(_series(spark, rows)).collect()
    assert len(got) == 24
    assert all(r["share_permille"] == 0 and r["type_total"] == 0 for r in got)


def test_hour_of_day_profile_pre_epoch_hours_stay_in_contract(spark):
    # pre-1970 hours are negative; % would emit hod -1 — pmod keeps the
    # 0..23 contract (hour -1 is 23:00 UTC on 1969-12-31)
    rows = [("a", h, 1) for h in range(-2, 3)]
    got = {
        r["hour_of_day"]
        for r in hour_of_day_profile(_series(spark, rows)).collect()
    }
    assert got == {22, 23, 0, 1, 2}
