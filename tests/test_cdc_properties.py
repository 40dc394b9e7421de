"""Property-based tests (hypothesis) for the CDC core invariants.

The replay-rebuild equivalence (TOMBSTONE_HANDLING_GUIDE.md:103-113) must
hold for EVERY changelog and EVERY split point, not just the scenario
fixtures — exactly the kind of claim property testing is for. Logs are
generated with duplicate keys, interleaved deletes, and re-inserts.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_integration_via_kafka_ksql_spark.operators import cdc

# a changelog event: (key in small space → collisions, payload, deleted?)
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=99),
        st.booleans(),
    ),
    min_size=1,
    max_size=30,
)


def _log_df(spark, events):
    rows = [
        (key, off + 1, f"p{payload}", "true" if deleted else "false")
        for off, (key, payload, deleted) in enumerate(events)
    ]
    return spark.createDataFrame(rows, ["id", "offset", "payload", "__deleted"])


def _model_state(events):
    """Reference model: a plain dict replay."""
    state: dict[int, str] = {}
    for off, (key, payload, deleted) in enumerate(events):
        if deleted:
            state.pop(key, None)
        else:
            state[key] = f"p{payload}"
    return state


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=_events)
def test_compaction_matches_dict_replay(spark, events):
    """compact+filter == sequential dict replay, for any log."""
    df = _log_df(spark, events)
    got = {
        r["id"]: r["payload"]
        for r in cdc.soft_delete_filter(
            cdc.compact_latest(df, ["id"], ["offset"])
        ).collect()
    }
    assert got == _model_state(events)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=_events, split_frac=st.floats(min_value=0.0, max_value=1.0))
def test_replay_rebuild_equivalence(spark, events, split_frac):
    """apply_changelog(compact(log[:n]), log[n:]) == compact(log) for any
    split point n — the incremental path never diverges from full replay."""
    df = _log_df(spark, events)
    n = int(len(events) * split_frac)
    head = df.filter(f"offset <= {n}")
    tail = df.filter(f"offset > {n}")
    state = cdc.soft_delete_filter(cdc.compact_latest(head, ["id"], ["offset"]))
    merged = cdc.apply_changelog(state, tail, ["id"], ["offset"])
    got = {r["id"]: r["payload"] for r in merged.collect()}
    assert got == _model_state(events)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=_events)
def test_compaction_idempotent(spark, events):
    """Compacting a compacted log is a no-op (log-compaction validity)."""
    df = _log_df(spark, events)
    once = cdc.compact_latest(df, ["id"], ["offset"])
    twice = cdc.compact_latest(once, ["id"], ["offset"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
