"""Property-based tests (hypothesis) for the round-14 analytics/graph
additions: BFS levels vs a sequential python BFS on random digraphs,
gap-fill vs a python resample model, and decay engagement vs a python
weight fold — the random-structure coverage fixtures can't give
(frontier collisions, multi-source min races, gap runs at the range
edges, horizon ties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.analytics import (
    DAY_US,
    HOUR_US,
    decay_engagement,
    hourly_gapfill,
)
from db_integration_via_kafka_ksql_spark.operators.graph import bfs_levels

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)
_sources = st.sets(
    st.integers(min_value=0, max_value=9), min_size=1, max_size=3
)


def _py_bfs(edges, sources, max_hops):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    levels = {n: 0 for n in sources}
    frontier = set(sources)
    for hop in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        nxt -= levels.keys()
        if not nxt:
            break
        for n in nxt:
            levels[n] = hop
        frontier = nxt
    return levels


@given(edges=_edges, sources=_sources, max_hops=st.integers(0, 4))
@_SETTINGS
def test_bfs_levels_match_python_bfs(spark, edges, sources, max_hops):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(n,) for n in sources], "node long")
    got = {
        r["node"]: r["level"]
        for r in bfs_levels(e, s, max_hops=max_hops).collect()
    }
    assert got == _py_bfs(edges, sources, max_hops)


_hour_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=30,
)


def _py_gapfill(rows, trailing):
    counts: dict[tuple[str, int], int] = {}
    for t, h in rows:
        counts[(t, h)] = counts.get((t, h), 0) + 1
    h0 = min(h for _, h in rows)
    h1 = max(h for _, h in rows)
    out = {}
    for t in {t for t, _ in rows}:
        series = [counts.get((t, h), 0) for h in range(h0, h1 + 1)]
        for i, h in enumerate(range(h0, h1 + 1)):
            lo = max(0, i - trailing + 1)
            window = series[lo : i + 1]
            out[(t, h)] = (
                series[i],
                sum(window),
                len(window),
                sum(window) * 1000 // len(window),
            )
    return out


@given(rows=_hour_rows, trailing=st.integers(1, 4))
@_SETTINGS
def test_gapfill_matches_python_resample(spark, rows, trailing):
    ev = spark.createDataFrame(
        [(t, h * HOUR_US + 1) for t, h in rows], "event_type string, us long"
    )
    got = {
        (r["event_type"], r["hour"]): (
            r["n_events"], r["mov_sum"], r["mov_hours"], r["mov_avg_milli"]
        )
        for r in hourly_gapfill(ev, F.col("us"), trailing_hours=trailing)
        .collect()
    }
    assert got == _py_gapfill(rows, trailing)


_day_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=40),
    ),
    min_size=1,
    max_size=30,
)


def _py_decay(rows, half_life):
    horizon = max(d for _, d in rows)
    out: dict[int, list[int]] = {}
    for u, d in rows:
        out.setdefault(u, [0, 0, 0])
        out[u][0] += 1
        out[u][1] = max(out[u][1], d)
        out[u][2] += 1_000_000 // (
            1 << min((horizon - d) // half_life, 62)
        )
    return {u: tuple(v) for u, v in out.items()}


@given(rows=_day_rows, half_life=st.integers(1, 10))
@_SETTINGS
def test_decay_matches_python_fold(spark, rows, half_life):
    ev = spark.createDataFrame(
        [(u, d * DAY_US + 5) for u, d in rows], "user_id long, us long"
    )
    got = {
        r["user_id"]: (r["n_events"], r["last_seen_day"], r["score_ppm"])
        for r in decay_engagement(
            ev, F.col("us"), half_life_days=half_life
        ).collect()
    }
    assert got == _py_decay(rows, half_life)
