"""Stream-stream interval (windowed) join — the ksqlDB `JOIN ... WITHIN`
surface the reference's stack offers its users beyond the CDC core
(reference scope note: SURVEY §2.5 "not present" list; this is the
same extension family as streaming/windows.py's event-time windows).

Semantics: rows from two keyed event streams pair when their keys match
and their event times satisfy

    left.ts - before <= right.ts <= left.ts + after

(ksqlDB's ``WITHIN n`` is the symmetric case before == after == n;
``WITHIN (b, a)`` the asymmetric one). The SAME builder produces the
batch plan and the streaming plan — batch twins are what the DuckDB
oracle verifies, and Structured Streaming executes the identical join
condition with watermarks bounding state.

Scale shape: both sides shuffle once, keyed by the join key; per-key
state is bounded by (watermark delay + window width) x per-key arrival
rate — eviction is Spark's own watermark mechanism, not custom code.
A hot key concentrates its window of rows on one task (inherent to any
keyed stream join); AQE skew-split applies to the batch twin, salting
does not apply to stateful streaming state (same trade-off ksqlDB has).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_condition(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    before_seconds: float,
    after_seconds: float,
) -> Column:
    """The key-equality + time-range predicate, built from DataFrame
    column references so Spark can disambiguate same-named key columns."""
    cond = reduce(
        lambda a, b: a & b, [left[k] == right[k] for k in on]
    )
    lo = left[left_ts] - F.expr(f"INTERVAL '{float(before_seconds)}' SECOND")
    hi = left[left_ts] + F.expr(f"INTERVAL '{float(after_seconds)}' SECOND")
    return cond & (right[right_ts] >= lo) & (right[right_ts] <= hi)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    before_seconds: float,
    after_seconds: float,
    how: str = "inner",
    watermark_seconds: float | None = None,
) -> DataFrame:
    """Keyed interval join, batch or streaming.

    Batch (``watermark_seconds=None``): a plain equi-join on the key with
    the range predicate — Catalyst plans the key shuffle and post-filters
    the range, which is the right plan when keys are selective (the
    common case for per-user/per-entity event streams).

    Streaming: pass ``watermark_seconds`` and streaming frames; both
    sides get ``withWatermark`` on their time column, which (a) admits
    the stateful stream-stream join and (b) bounds state: a side's rows
    are evicted once the GLOBAL watermark (min across sources) passes
    their last possible match, so rows later than delay+window silently
    drop instead of growing state — asserted in
    tests/test_streaming_joins.py. ``how`` may be left_outer/right_outer
    in streaming only with the watermark set (Spark's requirement);
    unmatched rows emit after the watermark closes their window.

    Output columns: all of left, then right's non-key columns (key
    columns deduplicated to the left side). Non-key name collisions are
    the caller's to rename first.
    """
    if watermark_seconds is not None:
        left = left.withWatermark(left_ts, f"{watermark_seconds} seconds")
        right = right.withWatermark(right_ts, f"{watermark_seconds} seconds")
    cond = interval_join_condition(
        left, right, on, left_ts, right_ts, before_seconds, after_seconds
    )
    joined = left.join(right, cond, how)
    keep_right = [right[c] for c in right.columns if c not in set(on)]
    return joined.select(*[left[c] for c in left.columns], *keep_right)
