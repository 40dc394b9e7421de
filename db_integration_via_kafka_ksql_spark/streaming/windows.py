"""Event-time streaming operators: watermarked windowed aggregation and
custom stateful sessionization.

The reference has NO time axis (SURVEY §2.5 "Not present: watermarks,
event-time windows") — CDC order is Kafka offset order. These operators are
the BASELINE.json extension surface for the `events` stream table, built
on the two canonical Structured Streaming shapes:

- `windowed_event_counts`: watermark + tumbling window + groupBy — the
  built-in, fully incremental path. State size ~ |open windows x types|;
  append mode emits a window exactly once, when the watermark passes its
  end — downstream sinks get finalized rows (idempotent-friendly).
- `sessionize_events`: gap-based sessions via applyInPandasWithState —
  the custom-stateful-operator escape hatch for semantics the built-ins
  can't express. State per key is O(1) (start/end/count), timeouts are
  event-time based so sessions close exactly when the watermark passes
  last_event + gap, independent of processing wall-clock.

Scale notes: both operators shuffle once on the grouping key. Sessionize
keys on user_id — uniform in the testdata; a hot key (one user = 30% of
events) would need key-salting with session re-merge, documented here as
the known limit rather than silently assumed away.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.relational import dsum, money

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
SESSION_STATE_SCHEMA = "start bigint, end bigint, n bigint, val double"


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window with late-data bound.

    Batch twin: queries/relational_queries.events_hourly_counts — same
    bucketing math, so the streaming results can be cross-checked against
    the batch oracle on a closed input.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(money("value"), "sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_events(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization: a session is a maximal run of one user's
    events with < gap_minutes between consecutive events. Emits one row
    per closed session (append semantics).

    applyInPandasWithState: state = (start, end, count, value-sum) per
    user; an event extends the open session or (if it arrives >= gap after
    the session end — possible within one batch too) closes it and starts
    a new one. Event-time timeout closes idle sessions when the watermark
    passes end + gap.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                closed.append((s, e, n, v))
                state.remove()
        else:
            rows: list[tuple[int, float]] = []
            for pdf in pdfs:
                ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
                vals = pdf["value"].astype("float64").tolist()
                rows.extend(zip(ts_ms, vals))
            rows.sort()
            if state.exists:
                s, e, n, v = state.get
            else:
                s = e = n = 0
                v = 0.0
            for t, val in rows:
                if n == 0:
                    s, e, n, v = t, t, 1, val
                elif t - e >= gap_ms:
                    closed.append((s, e, n, v))
                    s, e, n, v = t, t, 1, val
                else:
                    e, n, v = max(e, t), n + 1, v + val
            if n > 0:
                state.update((s, e, n, v))
                state.setTimeoutTimestamp(e + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _ in closed],
                    "n_events": [n for _, _, n, _ in closed],
                    "sum_value": [v for _, _, _, v in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> Column | DataFrame:
    """Batch twin of sessionize_events (same session definition) — a
    window-function formulation used to cross-check the stateful stream
    on a closed input: session boundaries where the gap to the previous
    event >= gap, then one row per (user, session)."""
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us")
    marked = events.select(
        "user_id",
        F.col("ts_us"),
        F.col("value"),
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) >= gap_us, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup: keep the first arrival per key, with state
    bounded by the watermark (dropDuplicatesWithinWatermark — state for a
    key is dropped once the watermark passes it, so unbounded streams run
    in bounded memory; a duplicate arriving later than the watermark delay
    is the documented trade-off, same as any watermarked operator).

    Batch twin: operators/dedup.exact_duplicates keep_doc semantics.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
