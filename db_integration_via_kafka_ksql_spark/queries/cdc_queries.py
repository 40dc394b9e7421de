"""CDC query surface (SURVEY §2.5 ST1, §2.2 T2/T3/T6, §2.3 A1-A2).

The driver's `events` table plays the changelog (see
operators.cdc.events_as_changelog): key=user_id, offset=event_id,
event_type='error' is the DELETE rewrite. Timestamps exposed as epoch
micros for hash parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.io import epoch_us_col, load_table
from db_integration_via_kafka_ksql_spark.operators import cdc
from db_integration_via_kafka_ksql_spark.registry import query

# shared projection: changelog with ts as epoch micros
def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = cdc.events_as_changelog(load_table(spark, sf_dir, "events"))
    # epoch_us_col handles both historical `ts` encodings (epoch-nanos long
    # and timestamp[us]) and matches DuckDB epoch_us(ts) in either case.
    return log.withColumn("ts_us", epoch_us_col(log, "ts")).drop("ts")

_CHANGELOG_SQL = """
    SELECT user_id AS key_id,
           event_id AS "offset",
           event_type,
           "value",
           props,
           CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted,
           epoch_us(ts) AS ts_us
    FROM events
"""

_COMPACT_SQL = f"""
    SELECT key_id, "offset", event_type, "value", props, __deleted, ts_us
    FROM (
        SELECT *, row_number() OVER (PARTITION BY key_id ORDER BY "offset" DESC) AS rn
        FROM ({_CHANGELOG_SQL})
    )
    WHERE rn = 1
"""


@query(
    "cdc_compact_latest",
    # round-16 rotation: veteran returns (2 rounds out); still the entry() flagship
    oracle=_COMPACT_SQL,
)
def cdc_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: latest record per key (ksqlDB TABLE materialization)."""
    log = _changelog(spark, sf_dir)
    return cdc.compact_latest(log, key_cols=["key_id"], order_cols=["offset"])


@query(
    "cdc_soft_delete_filter",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle=f"SELECT * FROM ({_COMPACT_SQL}) WHERE __deleted <> 'true'",
)
def cdc_soft_delete_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1+T2/T3: materialized state after delete rewrite removal —
    what the JDBC sink's target table contains."""
    log = _changelog(spark, sf_dir)
    state = cdc.compact_latest(log, key_cols=["key_id"], order_cols=["offset"])
    return cdc.soft_delete_filter(state)


@query(
    "cdc_upsert_merge",
    driver=False,  # round-16 rotation: veteran slot ceded to cdc_compact_latest's return
    # replay-rebuild invariant: merging the tail onto compacted-head state
    # equals compacting the whole log (then dropping deleted keys).
    oracle=f"SELECT * FROM ({_COMPACT_SQL}) WHERE __deleted <> 'true'",
)
def cdc_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2 as a batch op: upsert+delete a changelog tail onto prior state."""
    # threshold from the raw column (parquet footer stats / aggregate
    # pushdown eligible); head/tail re-scan with the offset predicate
    # pushed down — cheaper than caching the full changelog
    thr = (
        load_table(spark, sf_dir, "events").agg(F.max("event_id")).first()[0] // 2
    )
    log = _changelog(spark, sf_dir)
    head = log.filter(F.col("offset") <= thr)
    tail = log.filter(F.col("offset") > thr)
    state = cdc.soft_delete_filter(
        cdc.compact_latest(head, key_cols=["key_id"], order_cols=["offset"])
    )
    return cdc.apply_changelog(
        state, tail, key_cols=["key_id"], order_cols=["offset"]
    )


@query(
    "cdc_changelog_stats",
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
    oracle=f"""
    SELECT key_id,
           CAST(count(*) AS BIGINT) AS n_versions,
           CAST(sum(CASE WHEN __deleted = 'true' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
           max("offset") AS max_offset
    FROM ({_CHANGELOG_SQL})
    GROUP BY key_id
    """,
)
def cdc_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/offset accounting: per-key version/delete/offset verification."""
    log = _changelog(spark, sf_dir)
    return cdc.changelog_stats(log)


@query(
    "cdc_state_count",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS total
    FROM ({_COMPACT_SQL}) WHERE __deleted <> 'true'
    """,
)
def cdc_state_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: COUNT(*) pull query over materialized state
    (TOMBSTONE_HANDLING_GUIDE.md:192-194)."""
    log = _changelog(spark, sf_dir)
    state = cdc.soft_delete_filter(
        cdc.compact_latest(log, key_cols=["key_id"], order_cols=["offset"])
    )
    return state.agg(F.count(F.lit(1)).alias("total"))


@query(
    "cdc_point_lookup",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle=f"SELECT * FROM ({_COMPACT_SQL}) WHERE __deleted <> 'true' AND key_id = 7",
)
def cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: pull-query point lookup on the materialized state
    (TOMBSTONE_HANDLING_GUIDE.md:189)."""
    log = _changelog(spark, sf_dir)
    state = cdc.soft_delete_filter(
        cdc.compact_latest(log, key_cols=["key_id"], order_cols=["offset"])
    )
    return state.filter(F.col("key_id") == 7)


@query(
    "sessionize_events_batch",
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
    oracle="""
    WITH ordered AS (
        SELECT user_id,
               epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts)
                    ) >= 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    marked AS (
        SELECT user_id, ts_us,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           min(ts_us) AS start_us,
           max(ts_us) AS end_us,
           count(*) AS n_events
    FROM marked
    GROUP BY user_id, session_id
    """,
)
def sessionize_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, batch form (30-min gap). The streaming
    twin (applyInPandasWithState, streaming/windows.sessionize_events) is
    exercised by tests/test_streaming_windows.py; this registered form
    makes the session semantics oracle-verifiable."""
    from db_integration_via_kafka_ksql_spark.streaming.windows import sessionize_batch

    raw = load_table(spark, sf_dir, "events")
    ev = raw.select("user_id", epoch_us_col(raw, "ts").alias("ts_us"), "value")
    return sessionize_batch(ev, gap_minutes=30)


@query(
    "asof_join_events",
    # round-16 rotation: veteran returns (3 rounds out)
    # DuckDB's native ASOF JOIN is the oracle for our union-sort-window
    # formulation (operators/asof.py)
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, "value" FROM events
    ),
    l AS (SELECT * FROM ev WHERE event_id % 2 = 1),
    r AS (SELECT * FROM ev WHERE event_id % 2 = 0)
    SELECT l.user_id, l.event_id, l.ts_us, l."value",
           r."value" AS value_asof, r.event_id AS event_id_asof
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark has no built-in): align each
    odd event with the latest even event at or before it, per user."""
    from db_integration_via_kafka_ksql_spark.operators.asof import asof_join

    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(
        "user_id", "event_id", epoch_us_col(raw, "ts").alias("ts_us"), "value"
    )
    left = ev.filter(F.col("event_id") % 2 == 1)
    right = ev.filter(F.col("event_id") % 2 == 0)
    return asof_join(
        left,
        right,
        key_cols=["user_id"],
        ts_col="ts_us",
        value_cols=["value", "event_id"],
        order_col="event_id",
    )


_SESSIONS_SQL = """
    WITH ordered AS (
        SELECT user_id,
               epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts)
                    ) >= 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    marked AS (
        SELECT user_id, ts_us,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           min(ts_us) AS start_us,
           max(ts_us) AS end_us
    FROM marked
    GROUP BY user_id, session_id
"""


@query(
    "range_join_events_sessions",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    oracle=f"""
    WITH sess AS ({_SESSIONS_SQL})
    SELECT e.user_id, e.event_id, epoch_us(e.ts) AS ts_us,
           s.session_id, s.start_us, s.end_us
    FROM events e
    JOIN sess s
      ON e.user_id = s.user_id
     AND epoch_us(e.ts) >= s.start_us
     AND epoch_us(e.ts) <= s.end_us
    """,
)
def range_join_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed range join (custom operator): each event joined to the
    session interval containing it. Round-trips the sessionizer: every
    event falls inside exactly one of its user's sessions."""
    from db_integration_via_kafka_ksql_spark.operators.rangejoin import (
        keyed_range_join,
    )
    from db_integration_via_kafka_ksql_spark.streaming.windows import sessionize_batch

    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(
        "user_id", "event_id", epoch_us_col(raw, "ts").alias("ts_us"), "value"
    )
    sessions = sessionize_batch(
        ev.select("user_id", "ts_us", "value"), gap_minutes=30
    ).select("user_id", "session_id", "start_us", "end_us")
    return keyed_range_join(
        ev.select("user_id", "event_id", "ts_us"),
        sessions,
        key_cols=["user_id"],
        point_col="ts_us",
        start_col="start_us",
        end_col="end_us",
    ).select("user_id", "event_id", "ts_us", "session_id", "start_us", "end_us")


from db_integration_via_kafka_ksql_spark.operators.relational import (  # noqa: E402
    dsum,
)
from db_integration_via_kafka_ksql_spark.queries.relational_queries import (  # noqa: E402
    _msum,
)


@query(
    "cdc_state_group_agg",
    driver=False,  # aux: batch twin of streaming/aggview.IncrementalAggView
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_msum('CAST(coalesce("value", 0) AS DECIMAL(18,4))', "sum_value")}
    FROM ({_COMPACT_SQL})
    WHERE __deleted <> 'true'
    GROUP BY event_type
    """,
)
def cdc_state_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ksqlDB aggregate-TABLE read path in batch form: per-group
    count + decimal sum over the materialized live state — exactly what
    streaming/aggview.IncrementalAggView maintains incrementally (its
    `recompute()`); this oracle-gates the aggregate the incremental path
    is equivalence-tested against. Sum exposed via the engine's standard
    exact-decimal→double bridge (dsum/_msum) for bit-stable comparison."""
    log = _changelog(spark, sf_dir)
    state = cdc.soft_delete_filter(
        cdc.compact_latest(log, key_cols=["key_id"], order_cols=["offset"])
    )
    return state.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum(
            F.coalesce(F.col("value"), F.lit(0)).cast("decimal(18,4)"),
            "sum_value",
        ),
    )


@query(
    "interval_join_clicks_purchases",
    driver=False,  # round-16 rotation: veteran (r9) slot ceded to asof_join_events' return
    # promoted to the driver window round 9; batch twin of streaming joins
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS tu
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch_us(ts) AS tu
        FROM events WHERE event_type = 'click'
    )
    SELECT p.purchase_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST(count(c.tu) AS BIGINT) AS n_clicks_10m
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.tu BETWEEN p.tu - 600000000 AND p.tu
    GROUP BY p.purchase_id, p.user_id
    """,
)
def interval_join_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ksqlDB `JOIN ... WITHIN`-style interval join, batch twin: for each
    purchase, how many clicks the same user made in the preceding 10
    minutes (streaming/joins.interval_join — the IDENTICAL builder the
    watermarked stream-stream path runs; before=600s, after=0)."""
    from db_integration_via_kafka_ksql_spark.streaming.joins import interval_join

    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(epoch_us_col(raw, "ts")).alias("t"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("t").alias("pt"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("t").alias("ct")
    )
    j = interval_join(
        p, c, on=["user_id"], left_ts="pt", right_ts="ct",
        before_seconds=600, after_seconds=0, how="left",
    )
    return j.groupBy("purchase_id", "user_id").agg(
        F.count("ct").cast("bigint").alias("n_clicks_10m")
    )


@query(
    "cdc_scd2_history",
    # round-12 rotation: promoted into the driver window
    oracle="""
    WITH ch AS (
        SELECT user_id AS key_id, event_id AS version, epoch_us(ts) AS t,
               event_type, value, props,
               CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
                 AS __deleted
        FROM events
    ),
    led AS (
        SELECT *, lead(t) OVER (
            PARTITION BY key_id ORDER BY version
        ) AS valid_to_us
        FROM ch
    )
    SELECT key_id, version, t AS valid_from_us, valid_to_us,
           valid_to_us IS NULL AS is_current,
           event_type, value, props
    FROM led WHERE __deleted = 'false'
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history from the changelog: every surviving
    version with its validity interval (deletes close intervals without
    emitting rows), one key-hash shuffle total."""
    ev = load_table(spark, sf_dir, "events")
    ch = cdc.events_as_changelog(ev)
    return cdc.scd2_history(ch, epoch_us_col(ch, "ts"))


_SCD2_END_CLOSED = 1 << 62  # open-ended current version, closed for the join


@query(
    "cdc_scd2_point_in_time",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH ch AS (
        SELECT user_id AS key_id, event_id AS version, epoch_us(ts) AS t,
               event_type,
               CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END
                 AS __deleted
        FROM events
    ),
    led AS (
        SELECT *, lead(t) OVER (
            PARTITION BY key_id ORDER BY version
        ) AS valid_to_us
        FROM ch
    ),
    hist AS (
        SELECT key_id, version, t AS valid_from_us, valid_to_us, event_type
        FROM led WHERE __deleted = 'false'
    ),
    probes AS (
        SELECT event_id AS purchase_id, user_id AS key_id, epoch_us(ts) AS t
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.key_id, p.t, h.version,
           h.event_type AS type_at_time
    FROM probes p JOIN hist h
      ON p.key_id = h.key_id
     AND p.t >= h.valid_from_us
     AND p.t <= coalesce(h.valid_to_us - 1, {_SCD2_END_CLOSED})
    """,
)
def cdc_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase joined to the SCD2
    version of its user valid AT purchase time — the scd2_history x
    keyed_range_join composition (half-open [from, to) intervals closed
    by -1 micro for the inclusive range join; the open current version
    closes at 2^62). Exactly one row per purchase: a purchase is itself
    a live version, so a containing interval always exists."""
    from db_integration_via_kafka_ksql_spark.operators.rangejoin import (
        keyed_range_join,
    )

    ev = load_table(spark, sf_dir, "events")
    ch = cdc.events_as_changelog(ev)
    hist = cdc.scd2_history(
        ch, epoch_us_col(ch, "ts"), attrs=["event_type"]
    ).select(
        "key_id",
        "version",
        "valid_from_us",
        F.coalesce(
            F.col("valid_to_us") - 1, F.lit(_SCD2_END_CLOSED)
        ).alias("end_closed"),
        F.col("event_type").alias("type_at_time"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("key_id"),
        epoch_us_col(ev, "ts").alias("t"),
    )
    return keyed_range_join(
        probes, hist, ["key_id"], "t", "valid_from_us", "end_closed"
    ).select("purchase_id", "key_id", "t", "version", "type_at_time")
