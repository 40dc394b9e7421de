"""Product-analytics query surface (cohort retention, ordered funnel)
with DuckDB oracles. All math is integer — epoch micros, week indexes,
permille ratios — so parity is bit-exact; timestamps go through
io.epoch_us_col on the Spark side and epoch_us(ts) in DuckDB (the
encoding-robust pairing verified in tests/test_testdata_schema.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from db_integration_via_kafka_ksql_spark.io import epoch_us_col, load_table
from db_integration_via_kafka_ksql_spark.operators import analytics as AN
from db_integration_via_kafka_ksql_spark.registry import query

FUNNEL_STEPS = ["view", "click", "purchase"]


@query(
    "events_cohort_retention",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-14 rotation: promoted into the external driver window
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
    WITH ev AS (
        SELECT user_id,
               {AN.floor_div_sql("epoch_us(ts)", AN.WEEK_US, "duckdb")} AS week
        FROM events
    ),
    first AS (
        SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1
    ),
    cells AS (
        SELECT DISTINCT cohort_week, week - cohort_week AS week_offset,
               ev.user_id
        FROM ev JOIN first ON ev.user_id = first.user_id
    ),
    counts AS (
        SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
        FROM cells GROUP BY 1, 2
    ),
    sizes AS (
        SELECT cohort_week, n_users AS cohort_size
        FROM counts WHERE week_offset = 0
    )
    SELECT c.cohort_week, c.week_offset, c.n_users, s.cohort_size,
           c.n_users * 1000 // s.cohort_size AS retained_permille
    FROM counts c JOIN sizes s ON c.cohort_week = s.cohort_week
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the event stream: cohorts by
    first-event week, cells = users active again k weeks later, with the
    permille retained against the cohort size."""
    ev = load_table(spark, sf_dir, "events")
    return AN.cohort_retention(ev, epoch_us_col(ev, "ts"))


@query(
    "events_funnel_conversion",
    driver=False,  # round-12 rotation: stable veteran slot ceded to cdc_scd2_history
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    s1 AS (
        SELECT user_id, min(t) AS t1 FROM base
        WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
    ),
    s2 AS (
        SELECT b.user_id, min(t) AS t2
        FROM base b JOIN s1 ON b.user_id = s1.user_id
        WHERE event_type = '{FUNNEL_STEPS[1]}' AND t > t1 GROUP BY 1
    ),
    s3 AS (
        SELECT b.user_id, min(t) AS t3
        FROM base b JOIN s2 ON b.user_id = s2.user_id
        WHERE event_type = '{FUNNEL_STEPS[2]}' AND t > t2 GROUP BY 1
    ),
    n AS (
        SELECT 1 AS step_idx, '{FUNNEL_STEPS[0]}' AS step,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, '{FUNNEL_STEPS[1]}', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, '{FUNNEL_STEPS[2]}', CAST(count(*) AS BIGINT) FROM s3
    ),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS first_n FROM s1)
    SELECT step_idx, step, n_users,
           CASE WHEN first_n > 0 THEN n_users * 1000 // first_n
                ELSE CAST(0 AS BIGINT) END AS conversion_permille
    FROM n, n1
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: per-user conditional-min
    chaining with strict time ordering, conversion in permille of the
    step-1 population."""
    ev = load_table(spark, sf_dir, "events")
    return AN.funnel_conversion(ev, epoch_us_col(ev, "ts"), FUNNEL_STEPS)


@query(
    "events_transition_matrix",
    driver=False,  # round-15 rotation: veteran slot (r10) ceded to the series family
    # round-10 rotation: promoted into the external driver window
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
    ),
    seq AS (
        SELECT event_type AS to_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
               ) AS from_type
        FROM ev
    ),
    pairs AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
    ),
    totals AS (
        SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS from_total
        FROM pairs GROUP BY 1
    )
    SELECT p.from_type, p.to_type, p.n_transitions, t.from_total,
           p.n_transitions * 1000 // t.from_total AS permille
    FROM pairs p JOIN totals t ON p.from_type = t.from_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts + integer permille of each source type's outgoing
    transitions, (ts, event_id)-totally-ordered."""
    ev = load_table(spark, sf_dir, "events")
    return AN.event_transition_matrix(ev, epoch_us_col(ev, "ts"))



GAPFILL_TRAILING_HOURS = 3
DECAY_HALF_LIFE_DAYS = 7
SIM_WINDOW_HOURS = 6
SIM_TOP_K = 3
DISCORD_RECENT_WINDOWS = 24
DISCORD_TOP_K = 3
LAG_MAX_HOURS = 12
LAG_TOP_K = 1

# THE single DuckDB replay of the dense gap-filled grid — shared by all
# four series-family oracles (a hand-copied CTE block would let a
# gap-fill semantics fix drift apart silently; the decay_weight_ppm_sql
# single-definition stance applied to SQL text)
_GAPFILL_CTES = f"""ev AS (
        SELECT event_type,
               {AN.floor_div_sql("epoch_us(ts)", AN.HOUR_US, "duckdb")} AS hour
        FROM events
    ),
    counts AS (
        SELECT event_type, hour, CAST(count(*) AS BIGINT) AS n_events
        FROM ev GROUP BY 1, 2
    ),
    b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM ev),
    hours AS (SELECT unnest(generate_series(h0, h1)) AS hour FROM b),
    types AS (SELECT DISTINCT event_type FROM ev),
    grid AS (SELECT event_type, hour FROM types, hours),
    filled AS (
        SELECT g.event_type, g.hour,
               CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
        FROM grid g
        LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.hour = c.hour
    )"""

# the full-window vector frame over that grid (similarity + discords)
_WINS_CTES = f"""{_GAPFILL_CTES},
    wins0 AS (
        SELECT event_type, hour AS start,
               list(n_events) OVER (
                   PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN CURRENT ROW
                            AND {SIM_WINDOW_HOURS - 1} FOLLOWING
               ) AS vec
        FROM filled
    ),
    wins AS (SELECT * FROM wins0 WHERE len(vec) = {SIM_WINDOW_HOURS})"""


def _sqdist_dd(left: str, right: str) -> str:
    """Exact BIGINT squared Euclidean distance between two list columns
    — the DuckDB rendering of operators/analytics._sqdist_sql."""
    return (
        f"CAST(list_sum([({left}[i] - {right}[i]) * ({left}[i] - {right}[i]) "
        f"for i in generate_series(1, {SIM_WINDOW_HOURS})]) AS BIGINT)"
    )


def _dense_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense (event_type, hour, n_events) series every series-family
    query consumes — one shared construction (AN.hourly_gapfill; the mov
    columns are column-pruned away by Catalyst, plan-pin-verified)."""
    ev = load_table(spark, sf_dir, "events")
    return AN.hourly_gapfill(ev, epoch_us_col(ev, "ts")).select(
        "event_type", "hour", "n_events"
    )


@query(
    "events_hourly_gapfill",
    # round-15 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_GAPFILL_CTES},
    w AS (
        SELECT event_type, hour, n_events,
               CAST(sum(n_events) OVER win AS BIGINT) AS mov_sum,
               CAST(count(*) OVER win AS BIGINT) AS mov_hours
        FROM filled
        WINDOW win AS (
            PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN {GAPFILL_TRAILING_HOURS - 1} PRECEDING
                     AND CURRENT ROW
        )
    )
    SELECT event_type, hour, n_events, mov_sum, mov_hours,
           {AN.split_permille_sql("mov_sum", "mov_hours")
            .replace(" DIV ", " // ")} AS mov_avg_milli
    FROM w
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample with zero-filled gaps + trailing 3-hour
    moving window (analytics.hourly_gapfill): one row per (type, hour)
    over the global observed range — the gap-fill primitive that makes
    ROWS-window moving averages time-correct (a bare groupBy skips empty
    hours, silently shrinking the window's time span)."""
    ev = load_table(spark, sf_dir, "events")
    return AN.hourly_gapfill(
        ev, epoch_us_col(ev, "ts"), trailing_hours=GAPFILL_TRAILING_HOURS
    )


@query(
    "events_decay_engagement",
    # round-15 rotation: promoted into the external driver window
    oracle=f"""
    WITH ev AS (
        SELECT user_id,
               {AN.floor_div_sql("epoch_us(ts)", AN.DAY_US, "duckdb")} AS day
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    horizon AS (SELECT max(day) AS asof_day FROM ev),
    weighted AS (
        SELECT user_id, day,
               {AN.decay_weight_ppm_sql(DECAY_HALF_LIFE_DAYS, "duckdb")} AS w
        FROM ev, horizon
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(day) AS BIGINT) AS last_seen_day,
           CAST(sum(w) AS BIGINT) AS score_ppm
    FROM weighted GROUP BY 1
    """,
)
def events_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency-decayed engagement (analytics.decay_engagement):
    each event is worth 1e6 ppm halved stepwise per elapsed 7-day
    half-life against the corpus max day — pure-BIGINT shift/div math,
    so the freshness-weighted activity score replays bit-exactly."""
    ev = load_table(spark, sf_dir, "events")
    return AN.decay_engagement(
        ev, epoch_us_col(ev, "ts"), half_life_days=DECAY_HALF_LIFE_DAYS
    )


@query(
    "events_series_similarity_topk",
    # round-15 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_WINS_CTES},
    qs AS (SELECT max(start) AS qstart FROM wins),
    queries AS (
        SELECT event_type AS query_type, start AS query_start, vec AS qvec
        FROM wins, qs WHERE start = qstart
    ),
    scored AS (
        SELECT q.query_type, w.event_type AS match_type,
               w.start AS match_start, {_sqdist_dd("q.qvec", "w.vec")} AS dist
        FROM wins w
        JOIN queries q ON w.start + {SIM_WINDOW_HOURS} <= q.query_start
    )
    SELECT query_type, match_type, match_start, dist, rnk FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_type
            ORDER BY dist ASC, match_type ASC, match_start ASC
        ) AS INTEGER) AS rnk
        FROM scored
    ) WHERE rnk <= {SIM_TOP_K}
    """,
)
def events_series_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (analytics.series_similarity_topk)
    over the dense gap-filled hourly traffic: for each type's most
    recent 6-hour window, the 3 most similar earlier non-overlapping
    windows across all types by exact integer squared-Euclidean
    distance — the "which past period looked like right now" probe,
    replayed end to end (gap-fill, window collection, distance, rank)
    by the oracle."""
    return AN.series_similarity_topk(
        _dense_series(spark, sf_dir),
        window_hours=SIM_WINDOW_HOURS,
        top_k=SIM_TOP_K,
    )


@query(
    "events_series_discords",
    # round-15 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_WINS_CTES},
    qm AS (SELECT max(start) AS qmax FROM wins),
    probes AS (
        SELECT event_type AS p_type, start AS p_start, vec AS pvec
        FROM wins, qm WHERE start > qmax - {DISCORD_RECENT_WINDOWS}
    ),
    cand AS (
        SELECT p.p_type, p.p_start, w.start AS nn_start,
               {_sqdist_dd("p.pvec", "w.vec")} AS nn_dist
        FROM wins w
        JOIN probes p
          ON w.event_type = p.p_type
         AND abs(w.start - p.p_start) >= {SIM_WINDOW_HOURS}
    ),
    nn AS (
        SELECT p_type AS event_type, p_start AS start, nn_start, nn_dist
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY p_type, p_start
                ORDER BY nn_dist ASC, nn_start ASC
            ) AS rn FROM cand
        ) WHERE rn = 1
    )
    SELECT event_type, start, nn_start, nn_dist, rnk FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY event_type
            ORDER BY nn_dist DESC, start ASC
        ) AS INTEGER) AS rnk
        FROM nn
    ) WHERE rnk <= {DISCORD_TOP_K}
    """,
)
def events_series_discords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile discord screen (analytics.series_discords): for
    each type's 24 most recent 6-hour windows, the exact-integer
    distance to the nearest same-type window outside the overlap
    exclusion zone; the top-3 per type whose nearest neighbor is
    FARTHEST — traffic shaped like nothing else in that type's history.
    The shape-anomaly complement of the hourly z-score screen, replayed
    end to end by the oracle."""
    return AN.series_discords(
        _dense_series(spark, sf_dir),
        window_hours=SIM_WINDOW_HOURS,
        recent_windows=DISCORD_RECENT_WINDOWS,
        top_k=DISCORD_TOP_K,
    )


@query(
    "events_series_lag_correlation",
    # round-15 rotation: promoted into the external driver window
    # the avg uses the same overflow-safe split form as the operator:
    # 1000*s//n == 1000*(s//n) + (1000*(s%n))//n exactly (s >= 0)
    oracle=f"""
    WITH {_GAPFILL_CTES},
    lags AS (
        SELECT unnest(generate_series(1, {LAG_MAX_HOURS})) AS lag_hours
    ),
    agg AS (
        SELECT s.event_type AS src_type, d.event_type AS dst_type,
               l.lag_hours,
               CAST(count(*) AS BIGINT) AS n_hours,
               1000 * (CAST(sum(s.n_events * d.n_events) AS BIGINT)
                       // CAST(count(*) AS BIGINT))
               + (1000 * (CAST(sum(s.n_events * d.n_events) AS BIGINT)
                          % CAST(count(*) AS BIGINT)))
                   // CAST(count(*) AS BIGINT) AS avg_prod_milli
        FROM filled s
        CROSS JOIN lags l
        JOIN filled d ON d.hour = s.hour + l.lag_hours
        GROUP BY 1, 2, 3
    )
    SELECT src_type, dst_type, lag_hours, n_hours, avg_prod_milli, rnk
    FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY src_type, dst_type
            ORDER BY avg_prod_milli DESC, lag_hours ASC
        ) AS INTEGER) AS rnk
        FROM agg
    ) WHERE rnk <= {LAG_TOP_K}
    """,
)
def events_series_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag scan (analytics.series_lag_correlation) over the dense
    hourly traffic: for every ordered type pair and lag 1..12h, the
    per-overlap-hour integer product of src's series against dst's
    shifted series; the best lag per pair answers "does dst follow src
    by k hours" (self-pairs: the dominant period). Replayed end to end
    by the oracle."""
    return AN.series_lag_correlation(
        _dense_series(spark, sf_dir),
        max_lag_hours=LAG_MAX_HOURS,
        top_k=LAG_TOP_K,
    )


@query(
    "events_hour_of_day_profile",
    # round-15 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_GAPFILL_CTES},
    slots AS (
        SELECT event_type, ((hour % 24) + 24) % 24 AS hour_of_day,
               CAST(sum(n_events) AS BIGINT) AS n_events
        FROM filled GROUP BY 1, 2
    ),
    totals AS (
        SELECT event_type, CAST(sum(n_events) AS BIGINT) AS type_total
        FROM slots GROUP BY 1
    )
    SELECT s.event_type, s.hour_of_day, s.n_events, t.type_total,
           CASE WHEN t.type_total > 0
                THEN {AN.split_permille_sql("s.n_events", "t.type_total")
                      .replace(" DIV ", " // ")}
                ELSE CAST(0 AS BIGINT) END AS share_permille
    FROM slots s JOIN totals t ON s.event_type = t.event_type
    """,
)
def events_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC hour-of-day seasonality profile (analytics.hour_of_day_profile)
    over the dense gap-filled series: per (type, 0..23) slot, total
    events + exact permille share of the type's traffic — the typical
    day shape a monitoring pass divides out before screening."""
    return AN.hour_of_day_profile(_dense_series(spark, sf_dir))
