"""StreamingHistogram (streaming/histsketch.py): the prefix contract
(state after epoch e == batch sketch over everything arrived), replay
no-ops for additive state, idle epochs, fresh-instance restart, and a
live stream."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.sketches import (
    loghist_sketch,
)
from db_integration_via_kafka_ksql_spark.streaming.histsketch import (
    StreamingHistogram,
)

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

BATCHES = [
    [("a", 0.01 * (i + 1)) for i in range(50)] + [("b", 5.0)],
    [("a", 1.0 + 0.5 * i) for i in range(30)],
    [("b", 100.0 + i) for i in range(20)],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingHistogram(spark, state_path=str(tmp_path / "state"),
                              trigger_seconds=0, **kw)


def _want(spark, rows):
    df = _df(spark, rows)
    return {
        (r["event_type"], r["bucket"]): r["cnt"]
        for r in loghist_sketch(df, ["event_type"], "value").collect()
    }


def _got(st):
    return {
        (r["event_type"], r["bucket"]): r["cnt"]
        for r in st.buckets().collect()
    }


def test_prefix_contract(spark, tmp_path):
    st = _st(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix = [r for b in BATCHES[: e + 1] for r in b]
        assert _got(st) == _want(spark, prefix), f"epoch {e}"
    # quantile view runs the batch picker over the accumulated state
    qs = {
        (r["event_type"], r["q_permille"]): r["bucket"]
        for r in st.quantiles((500, 990)).collect()
    }
    assert ("a", 500) in qs and ("b", 990) in qs


def test_replay_is_noop_and_restart_continues(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    before = _got(st)
    st.process_batch(_df(spark, BATCHES[0]), 0)  # crash replay
    assert _got(st) == before  # additive counts did NOT double
    st2 = _st(spark, tmp_path)  # fresh instance reads the cursor
    st2.process_batch(_df(spark, BATCHES[1]), 1)
    prefix = BATCHES[0] + BATCHES[1]
    assert _got(st2) == _want(spark, prefix)


def test_idle_epoch_advances_cursor(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert st._read_state()["epoch"] == 1
    st.process_batch(_df(spark, BATCHES[1]), 2)
    assert _got(st) == _want(spark, BATCHES[0] + BATCHES[1])


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
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }
        ),
        f"{src}/b0.parquet",
    )
    st = _st(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = st.start(spark.readStream.schema(SCHEMA).parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and st._read_state()["epoch"] < 0:
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    assert _got(st) == _want(spark, rows)
