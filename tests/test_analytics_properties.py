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


from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    series_similarity_topk,
)

_series_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=25,
).map(lambda rows: list({(t, h): n for t, h, n in rows}.items()))


def _py_series_sim(cells, w, k):
    """cells: {(type, hour): n} over a DENSE per-type grid."""
    types = sorted({t for t, _ in cells})
    hours = sorted({h for _, h in cells})
    vecs = {
        (t, s): [cells[(t, h)] for h in range(s, s + w)]
        for t in types
        for s in hours
        if s + w - 1 <= hours[-1]
    }
    if not vecs:
        return {}
    qstart = max(s for _, s in vecs)
    out = {}
    for qt in types:
        qvec = vecs[(qt, qstart)]
        cands = sorted(
            (
                sum((a - b) ** 2 for a, b in zip(qvec, v)),
                mt,
                s,
            )
            for (mt, s), v in vecs.items()
            if s + w <= qstart
        )
        for rnk, (dist, mt, s) in enumerate(cands[:k], start=1):
            out[(qt, rnk)] = (mt, s, dist)
    return out


@given(rows=_series_rows, w=st.integers(1, 4), k=st.integers(1, 3))
@_SETTINGS
def test_series_similarity_matches_python_model(spark, rows, w, k):
    # densify: every (type in data) x (hour 0..max) cell, absent -> 0
    types = sorted({t for (t, _), _ in rows})
    hmax = max(h for (_, h), _ in rows)
    cells = {
        (t, h): 0 for t in types for h in range(0, hmax + 1)
    }
    cells.update({(t, h): n for (t, h), n in rows})
    df = spark.createDataFrame(
        [(t, h, n) for (t, h), n in cells.items()],
        "event_type string, hour long, n_events long",
    )
    got = {
        (r["query_type"], r["rnk"]): (
            r["match_type"], r["match_start"], r["dist"]
        )
        for r in series_similarity_topk(df, window_hours=w, top_k=k)
        .collect()
    }
    assert got == _py_series_sim(cells, w, k)


from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    series_discords,
)


def _py_discords(cells, w, r, k):
    types = sorted({t for t, _ in cells})
    hours = sorted({h for _, h in cells})
    vecs = {
        (t, s): [cells[(t, h)] for h in range(s, s + w)]
        for t in types
        for s in hours
        if s + w - 1 <= hours[-1]
    }
    if not vecs:
        return {}
    qmax = max(s for _, s in vecs)
    out = {}
    for t in types:
        probes = [
            s for (pt, s) in vecs if pt == t and s > qmax - r
        ]
        nns = []
        for p in probes:
            cands = sorted(
                (
                    sum((a - b) ** 2 for a, b in zip(vecs[(t, p)], v)),
                    s,
                )
                for (ct, s), v in vecs.items()
                if ct == t and abs(s - p) >= w
            )
            if cands:
                nns.append((cands[0][0], p, cands[0][1]))
        nns.sort(key=lambda x: (-x[0], x[1]))
        for rnk, (d, p, s) in enumerate(nns[:k], start=1):
            out[(t, rnk)] = (p, s, d)
    return out


@given(rows=_series_rows, w=st.integers(1, 3), r=st.integers(1, 6),
       k=st.integers(1, 3))
@_SETTINGS
def test_series_discords_match_python_model(spark, rows, w, r, k):
    types = sorted({t for (t, _), _ in rows})
    hmax = max(h for (_, h), _ in rows)
    cells = {(t, h): 0 for t in types for h in range(0, hmax + 1)}
    cells.update({(t, h): n for (t, h), n in rows})
    df = spark.createDataFrame(
        [(t, h, n) for (t, h), n in cells.items()],
        "event_type string, hour long, n_events long",
    )
    got = {
        (r_["event_type"], r_["rnk"]): (
            r_["start"], r_["nn_start"], r_["nn_dist"]
        )
        for r_ in series_discords(
            df, window_hours=w, recent_windows=r, top_k=k
        ).collect()
    }
    assert got == _py_discords(cells, w, r, k)


from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    series_lag_correlation,
)


def _py_lag_corr(cells, max_lag, k):
    types = sorted({t for t, _ in cells})
    hmax = max(h for _, h in cells)
    out = {}
    for s in types:
        for d in types:
            rows = []
            for lag in range(1, max_lag + 1):
                hs = [h for h in range(0, hmax + 1) if h + lag <= hmax]
                if not hs:
                    continue
                tot = sum(cells[(s, h)] * cells[(d, h + lag)] for h in hs)
                rows.append((1000 * tot // len(hs), -lag, len(hs)))
            rows.sort(reverse=True)
            for rnk, (avg, neglag, n) in enumerate(rows[:k], start=1):
                out[(s, d, rnk)] = (-neglag, n, avg)
    return out


@given(rows=_series_rows, max_lag=st.integers(1, 5), k=st.integers(1, 2))
@_SETTINGS
def test_lag_correlation_matches_python_model(spark, rows, max_lag, k):
    types = sorted({t for (t, _), _ in rows})
    hmax = max(h for (_, h), _ in rows)
    cells = {(t, h): 0 for t in types for h in range(0, hmax + 1)}
    cells.update({(t, h): n for (t, h), n in rows})
    df = spark.createDataFrame(
        [(t, h, n) for (t, h), n in cells.items()],
        "event_type string, hour long, n_events long",
    )
    got = {
        (r["src_type"], r["dst_type"], r["rnk"]): (
            r["lag_hours"], r["n_hours"], r["avg_prod_milli"]
        )
        for r in series_lag_correlation(
            df, max_lag_hours=max_lag, top_k=k
        ).collect()
    }
    assert got == _py_lag_corr(cells, max_lag, k)


# -- the two r15 SQL-text helpers: property-equal to python semantics ------
# (floor_div_sql must equal python //, split_permille_sql must equal
# 1000*n//d — on BOTH dialects, across sign and magnitude extremes)

from hypothesis import example  # noqa: E402

from db_integration_via_kafka_ksql_spark.operators.analytics import (  # noqa: E402
    floor_div_sql,
    split_permille_sql,
)


@settings(deadline=None, max_examples=40)
@given(
    us=st.lists(
        st.integers(min_value=-(2**52), max_value=2**52),
        min_size=1,
        max_size=20,
    ),
    div=st.sampled_from([3_600_000_000, 86_400_000_000, 7, 1]),
)
@example(us=[-1, 0, 1, -3_600_000_000], div=3_600_000_000)
def test_floor_div_sql_equals_python_floor_both_dialects(spark, us, div):
    import duckdb

    want = [u // div for u in us]
    got_spark = [
        r["b"]
        for r in spark.createDataFrame([(u,) for u in us], "u long")
        .select(F.expr(floor_div_sql("u", div, "spark")).alias("b"))
        .collect()
    ]
    assert got_spark == want
    got_dd = [
        b
        for (b,) in duckdb.sql(
            "SELECT "
            + floor_div_sql("u", div, "duckdb")
            + " FROM (SELECT unnest(["
            + ", ".join(str(u) for u in us)
            + "]::BIGINT[]) AS u)"
        ).fetchall()
    ]
    assert got_dd == want


@settings(deadline=None, max_examples=40)
@given(
    # built as n = q*d + r (r < d): n ranges far past the naive 1000*n
    # overflow point (9.2e15) — the whole reason the split form exists —
    # while the RESULT 1000*q + ... stays in BIGINT (the helper's
    # documented domain: the ratio fits, the intermediate needn't)
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),   # quotient q
            st.integers(min_value=1, max_value=2**22),   # divisor d
            st.integers(min_value=0, max_value=2**22 - 1),  # remainder seed
        ).map(lambda t: (t[0] * t[1] + (t[2] % t[1]), t[1])),
        min_size=1,
        max_size=20,
    )
)
@example(pairs=[(2**62, 2**20), (10**16, 7), (0, 1)])
def test_split_permille_sql_is_exact_and_overflow_safe(spark, pairs):
    import duckdb

    want = [1000 * n // d for n, d in pairs]
    expr = split_permille_sql("n", "d")
    got_spark = [
        r["p"]
        for r in spark.createDataFrame(pairs, "n long, d long")
        .select(F.expr(expr).alias("p"))
        .collect()
    ]
    assert got_spark == want
    # BIGINT-typed relation (bare VALUES literals type as INT32 and
    # 1000 * (n % d) would overflow INT32 — exactly the class of bug the
    # helper guards against in the engines)
    ns = ", ".join(str(n) for n, _ in pairs)
    ds = ", ".join(str(d) for _, d in pairs)
    got_dd = [
        p
        for (p,) in duckdb.sql(
            "SELECT CAST("
            + expr.replace(" DIV ", " // ")
            + " AS BIGINT) FROM (SELECT unnest(["
            + ns
            + "]::BIGINT[]) AS n, unnest(["
            + ds
            + "]::BIGINT[]) AS d)"
        ).fetchall()
    ]
    assert got_dd == want
