"""Streaming robust outlier screen (streaming/robustoutlier.py): the
state-derived med/MAD prefix contract vs the batch operator, at-arrival
Hampel flagging, cold start, both crash interleavings, idle epochs, the
checkpoint guard, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.relational import (
    robust_outlier_report,
)
from db_integration_via_kafka_ksql_spark.streaming.robustoutlier import (
    StreamingRobustOutlier,
)

SCHEMA = StructType(
    [StructField("t", StringType()), StructField("val", DoubleType())]
)

# group 'a': a tight 8..12 distribution over two epochs, then a wild 100.0
# landing at epoch 2 (must flag AT ARRIVAL); group 'b' stays cold (single
# prior value -> mad over one value is 0; its epoch-0 sighting must not
# flag). Duplicated values exercise the weighted (count-table) medians.
BATCHES = [
    [("a", 10.0), ("a", 10.0), ("a", 9.0), ("a", 11.0), ("b", 5.0)],
    [("a", 8.0), ("a", 12.0), ("a", 10.0), ("a", 10.0)],
    [("a", 100.0), ("a", 10.0)],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingRobustOutlier(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        group_col="t",
        value_col="val",
        trigger_seconds=0,
        **kw,
    )


def _epoch_out(st, e):
    return {
        (r["grp"], r["v"]): (r["n_batch"], r["med"], r["mad"], r["is_outlier"])
        for r in st.outliers().where(f"epoch = {e}").collect()
    }


def _batch_stats(spark, rows):
    rep = robust_outlier_report(_df(spark, rows), "t", "val")
    return {
        r["t"]: (r["n"], r["med"], r["mad"]) for r in rep.collect()
    }


def test_prefix_contract_state_stats_match_batch_op(spark, tmp_path):
    """After every epoch the state-derived (n, med, mad) equal the batch
    operator's over the arrived prefix — same selection rule (min value
    with cum*2 >= n), same MAD recipe, bit-exact."""
    st = _st(spark, tmp_path)
    seen: list[tuple[str, float]] = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        seen += rows
        got = {
            r["grp"]: (r["n"], r["med"], r["mad"])
            for r in st.current_stats().collect()
        }
        assert got == _batch_stats(spark, seen), f"epoch {e}"


def test_at_arrival_flagging_and_cold_start(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    got0 = _epoch_out(st, 0)
    # cold start: no prior distribution anywhere -> med/mad NULL, no flag
    assert all(v[1] is None and v[2] is None and not v[3] for v in got0.values())
    st.process_batch(_df(spark, BATCHES[1]), 1)
    got1 = _epoch_out(st, 1)
    # epoch-1 'a' values score against epoch-0's med=10, mad=0.5... wait:
    # prior a-values {9,10,10,11}: med 10, adevs {1,0,0,1} med -> 0;
    # mad=0 flags every deviating value (the documented degenerate edge)
    assert got1[("a", 10.0)][1] == 10.0
    assert got1[("a", 10.0)][3] is False
    assert got1[("a", 8.0)][3] is True  # deviates under mad=0
    st.process_batch(_df(spark, BATCHES[2]), 2)
    got2 = _epoch_out(st, 2)
    # prior a-values now {8,9,10,10,10,10,11,12}: med 10, adevs
    # {2,1,0,0,0,0,1,2} -> mad 0 at cum*2>=n picks 0... adev counts:
    # 0 x4, 1 x2, 2 x2 -> cum(0)=4, 4*2>=8 -> mad=0.0; 100.0 flags, 10.0 not
    assert got2[("a", 100.0)][3] is True
    assert got2[("a", 10.0)][3] is False


def test_mad_nonzero_thresholding_is_exact(spark, tmp_path):
    """A prior with genuine spread: values 1..9 give med 5, adevs
    {4,3,2,1,0,1,2,3,4} -> mad 2; cut = 3 * 1.4826 * 2 = 8.8956 — so an
    arrival of 13.9 (adev 8.9) flags and 13.8 (adev 8.8) does not: the
    threshold is the exact fold, not an approximation."""
    st = _st(spark, tmp_path)
    st.process_batch(
        _df(spark, [("a", float(i)) for i in range(1, 10)]), 0
    )
    st.process_batch(_df(spark, [("a", 13.9), ("a", 13.8)]), 1)
    got = _epoch_out(st, 1)
    assert got[("a", 13.9)] == (1, 5.0, 2.0, True)
    assert got[("a", 13.8)] == (1, 5.0, 2.0, False)


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
    stats_before = {tuple(r) for r in st.current_stats().collect()}
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert _epoch_out(st, 1) == before
    assert {tuple(r) for r in st.current_stats().collect()} == stats_before
    # fresh instance continues the prefix identically
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    seen = BATCHES[0] + BATCHES[1] + BATCHES[2]
    got = {
        r["grp"]: (r["n"], r["med"], r["mad"])
        for r in st2.current_stats().collect()
    }
    assert got == _batch_stats(spark, seen)
    assert _epoch_out(st2, 2)[("a", 100.0)][3] is True


def test_idle_epochs_commit_nothing(spark, tmp_path):
    st = _st(spark, tmp_path)
    # idle-only stream: no dirs at all, outliers() returns empty frame
    st.process_batch(_df(spark, []), 0)
    assert st.outliers().count() == 0
    assert not os.path.isdir(str(tmp_path / "out"))
    st.process_batch(_df(spark, BATCHES[0]), 1)
    out_before = set(os.listdir(str(tmp_path / "out")))
    st.process_batch(_df(spark, []), 2)
    assert set(os.listdir(str(tmp_path / "out"))) == out_before
    # state skipped the gap: epoch 3 reads epoch-1 state
    st.process_batch(_df(spark, BATCHES[1]), 3)
    got = {
        r["grp"]: (r["n"], r["med"], r["mad"])
        for r in st.current_stats().collect()
    }
    assert got == _batch_stats(spark, BATCHES[0] + BATCHES[1])


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    st = _st(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        st.start(spark.readStream.schema(SCHEMA).parquet(src))


def test_k_tenths_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="k_tenths"):
        _st(spark, tmp_path, k_tenths=0)


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "t": pa.array([r[0] for r in rows]),
                "val": pa.array([r[1] for r in rows], pa.float64()),
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
    got = {
        r["grp"]: (r["n"], r["med"], r["mad"])
        for r in st.current_stats().collect()
    }
    assert got == _batch_stats(spark, rows)


def test_cold_start_guard_types_follow_configuration(spark, tmp_path):
    """code review r14: the empty cold-start guards must not hardcode
    string/double — a bigint-grouped stream's idle-only outliers() and
    first-epoch prior must carry the configured types so they union/join
    cleanly with the post-first-epoch frames."""
    st = StreamingRobustOutlier(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        group_col="uid",
        value_col="amount",
        group_type="bigint",
        value_type="bigint",
        trigger_seconds=0,
    )
    empty = st.outliers()
    types = {f.name: f.dataType.simpleString() for f in empty.schema.fields}
    assert types["grp"] == "bigint" and types["v"] == "bigint"
    assert types["med"] == "bigint" and types["mad"] == "bigint"
    rows = [(7, 10), (7, 12), (8, 5)]
    st.process_batch(
        spark.createDataFrame(rows, "uid long, amount long"), 0
    )
    st.process_batch(
        spark.createDataFrame([(7, 11)], "uid long, amount long"), 1
    )
    real = st.outliers()
    real_types = {f.name: f.dataType.simpleString() for f in real.schema.fields}
    # the guard and the real frame agree column-for-column
    assert {k: v for k, v in real_types.items() if k != "epoch"} == {
        k: v for k, v in types.items() if k != "epoch"
    }
    # and the stats path works on integer values end to end
    got = {r["grp"]: (r["n"], r["med"]) for r in st.current_stats().collect()}
    assert got == {7: (3, 11), 8: (1, 5)}
