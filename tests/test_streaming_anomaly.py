"""Streaming anomaly screen (streaming/anomaly.py): python-model
equivalence of the at-arrival scoring across a batch sequence, both
crash interleavings, idle epochs, retention pruning, and a live stream."""

from __future__ import annotations

import math
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.streaming.anomaly import (
    HOUR_US,
    StreamingAnomaly,
)

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("us", LongType()),
    ]
)

H = HOUR_US

# hourly traffic for type 'a' establishing a tight distribution
# (hours 0..3 ~ 2 events), then a 10-event spike in hour 4; type 'b'
# stays cold (one hour) so it must always score 0.0
BATCHES = [
    [("a", 0 * H + 1), ("a", 0 * H + 2),
     ("a", 1 * H + 1), ("a", 1 * H + 2), ("a", 1 * H + 3)],
    [("a", 2 * H + 1), ("a", 2 * H + 2),
     ("a", 3 * H + 1), ("a", 3 * H + 2), ("a", 3 * H + 3),
     ("b", 0 * H + 5)],
    [("a", 4 * H + i) for i in range(10)],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingAnomaly(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _model(batches):
    """Sequential reference: per epoch, score batch (type, hour) totals
    against PRE-batch per-type hourly moments, then merge counts."""
    state: dict[tuple[str, int], int] = {}
    out = {}
    for e, rows in enumerate(batches):
        hc: dict[tuple[str, int], int] = {}
        for t, us in rows:
            hc[(t, us // H)] = hc.get((t, us // H), 0) + 1
        epoch_rows = {}
        for (t, h), nb in hc.items():
            prior = [n for (pt, _), n in state.items() if pt == t]
            total = state.get((t, h), 0) + nb
            nh = len(prior)
            if nh > 1:
                s, ss = sum(prior), sum(n * n for n in prior)
                var = (ss - s * s / nh) / (nh - 1)
                z = (total - s / nh) / math.sqrt(var) if var > 0 else 0.0
            else:
                z = 0.0
            epoch_rows[(t, h)] = (nb, total, z, abs(z) >= 2.0)
        out[e] = epoch_rows
        for k, nb in hc.items():
            state[k] = state.get(k, 0) + nb
    return out


def _epoch_out(st, e):
    return {
        (r["event_type"], r["hour_bucket"]): (
            r["n_batch"], r["n_total"], r["zscore"], r["is_anomaly"]
        )
        for r in st.anomalies().filter(f"epoch = {e}").collect()
    }


def test_model_equivalence_and_spike_flagged(spark, tmp_path):
    st = _st(spark, tmp_path)
    want = _model(BATCHES)
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        got = _epoch_out(st, e)
        assert set(got) == set(want[e]), f"epoch {e}"
        for k, (nb, total, z, flag) in want[e].items():
            gnb, gtotal, gz, gflag = got[k]
            assert (gnb, gtotal, gflag) == (nb, total, flag), (e, k)
            assert gz == pytest.approx(z, abs=1e-12), (e, k)
    # the hour-4 spike is flagged; the cold type never is
    assert got[("a", 4)][3] is True
    assert all(not v[3] for ep in range(2) for k, v in _epoch_out(st, ep).items())


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    # crash AFTER output commit, BEFORE state commit
    state1 = str(tmp_path / "state" / "epoch=1")
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert os.path.isdir(state1)
    # full replay: additive counts must NOT double
    before = _epoch_out(st, 1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert _epoch_out(st, 1) == before
    # fresh instance continues the prefix identically to the model
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    want = _model(BATCHES)[2]
    got = _epoch_out(st2, 2)
    assert {k: v[:2] for k, v in got.items()} == {
        k: v[:2] for k, v in want.items()
    }
    assert got[("a", 4)][3] is True


def test_idle_epoch_and_cold_start(spark, tmp_path):
    st = _st(spark, tmp_path)
    # idle-only stream: NOTHING committed, anomalies() returns the
    # guarded empty frame instead of PATH_NOT_FOUND (r14: the r13
    # idle-commit sweep had missed this stage — a quiet stream grew one
    # empty output dir per trigger)
    st.process_batch(_df(spark, []), 0)
    assert st.anomalies().count() == 0
    assert not os.path.isdir(str(tmp_path / "out"))
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert not os.path.isdir(str(tmp_path / "out" / "epoch=1"))
    assert _epoch_out(st, 1) == {}
    # first epoch: no prior hours anywhere -> all zscores 0.0
    assert all(v[2] == 0.0 and not v[3] for v in _epoch_out(st, 0).values())
    st.process_batch(_df(spark, BATCHES[2]), 2)
    got = _epoch_out(st, 2)
    # state skipped the idle gap: totals reflect batches 0 and 2 only
    assert got[("a", 4)][1] == 10


def test_retention_prunes_old_hours(spark, tmp_path):
    st = _st(spark, tmp_path, retention_hours=2)
    st.process_batch(_df(spark, BATCHES[0]), 0)  # hours 0, 1
    st.process_batch(_df(spark, BATCHES[1]), 1)  # hours 2, 3 (+b hour 0)
    state = (
        spark.read.parquet(str(tmp_path / "state"))
        .filter("epoch = 1")
        .collect()
    )
    hours = {(r["event_type"], r["hour_bucket"]) for r in state}
    assert hours == {("a", 2), ("a", 3)}  # horizon 3, keep > 3 - 2


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    st = _st(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        st.start(spark.readStream.schema(SCHEMA).parquet(src))


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows]),
                "us": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        f"{src}/b0.parquet",
    )
    st = _st(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = st.start(spark.readStream.schema(SCHEMA).parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if os.path.isdir(str(tmp_path / "out" / "epoch=0")):
                break
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    got = _epoch_out(st, 0)
    assert got[("a", 0)][:2] == (2, 2)
    assert got[("a", 1)][:2] == (3, 3)


# -- hourly_series: the streaming gap-fill view -------------------------------


def test_hourly_series_prefix_contract_vs_batch_gapfill(spark, tmp_path):
    """With retention_hours None, hourly_series() after every epoch is
    bit-equal to analytics.hourly_gapfill over the arrived prefix — the
    state count table IS the batch op's count table, and both serve
    through gapfill_from_counts."""
    from pyspark.sql import functions as F

    from db_integration_via_kafka_ksql_spark.operators.analytics import (
        hourly_gapfill,
    )

    st = _st(spark, tmp_path)
    seen: list[tuple[str, int]] = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        seen += rows
        got = {
            (r["event_type"], r["hour"]): (
                r["n_events"], r["mov_sum"], r["mov_hours"],
                r["mov_avg_milli"],
            )
            for r in st.hourly_series(trailing_hours=3).collect()
        }
        want = {
            (r["event_type"], r["hour"]): (
                r["n_events"], r["mov_sum"], r["mov_hours"],
                r["mov_avg_milli"],
            )
            for r in hourly_gapfill(
                _df(spark, seen), F.col("us"), trailing_hours=3
            ).collect()
        }
        assert got == want, f"epoch {e}"
        # the gap-fill property on real state: type b is quiet outside
        # hour 0 but still carries explicit rows over the global range
        if e >= 1:
            assert got[("b", 1)][0] == 0


def test_hourly_series_empty_state_is_empty_not_error(spark, tmp_path):
    st = _st(spark, tmp_path)
    assert st.hourly_series().count() == 0


def test_discords_prefix_contract_vs_batch_chain(spark, tmp_path):
    """discords() after every epoch equals the batch gap-fill ->
    series_discords chain over the arrived prefix."""
    from pyspark.sql import functions as F

    from db_integration_via_kafka_ksql_spark.operators.analytics import (
        hourly_gapfill,
        series_discords,
    )

    st = _st(spark, tmp_path)
    seen: list[tuple[str, int]] = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        seen += rows
        got = {
            (r["event_type"], r["rnk"]): (
                r["start"], r["nn_start"], r["nn_dist"]
            )
            for r in st.discords(window_hours=2, recent_windows=5, top_k=2)
            .collect()
        }
        series = hourly_gapfill(
            _df(spark, seen), F.col("us")
        ).select("event_type", "hour", "n_events")
        want = {
            (r["event_type"], r["rnk"]): (
                r["start"], r["nn_start"], r["nn_dist"]
            )
            for r in series_discords(
                series, window_hours=2, recent_windows=5, top_k=2
            ).collect()
        }
        assert got == want, f"epoch {e}"


def test_similar_past_windows_prefix_contract_vs_batch_chain(spark, tmp_path):
    """similar_past_windows() after every epoch equals the batch
    gap-fill -> series_similarity_topk chain over the arrived prefix."""
    from pyspark.sql import functions as F

    from db_integration_via_kafka_ksql_spark.operators.analytics import (
        hourly_gapfill,
        series_similarity_topk,
    )

    st = _st(spark, tmp_path)
    seen: list[tuple[str, int]] = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        seen += rows
        got = {
            (r["query_type"], r["rnk"]): (
                r["match_type"], r["match_start"], r["dist"]
            )
            for r in st.similar_past_windows(window_hours=2, top_k=2)
            .collect()
        }
        series = hourly_gapfill(
            _df(spark, seen), F.col("us")
        ).select("event_type", "hour", "n_events")
        want = {
            (r["query_type"], r["rnk"]): (
                r["match_type"], r["match_start"], r["dist"]
            )
            for r in series_similarity_topk(
                series, window_hours=2, top_k=2
            ).collect()
        }
        assert got == want, f"epoch {e}"
