"""Streaming HLL (streaming/hll.py): the prefix contract (state after
epoch e == batch registers over batches 0..e — exact, merge is
lossless), replay idempotence in both interleavings, idle batches,
estimate agreement with the batch operator, and a live stream."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators import sketches as SK
from db_integration_via_kafka_ksql_spark.streaming.hll import StreamingHll

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
    ]
)

BATCHES = [
    [("view", u) for u in range(40)] + [("click", u) for u in range(10)],
    [("view", u) for u in range(20, 60)] + [("buy", 1), ("buy", 2)],
    [("click", u) for u in range(5, 30)],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _hll(spark, tmp_path, **kw):
    return StreamingHll(
        spark, state_path=str(tmp_path / "hll"), trigger_seconds=0, **kw
    )


def _reg_key(df):
    return sorted(map(tuple, df.collect()))


def test_prefix_contract_every_epoch(spark, tmp_path):
    h = _hll(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        h.process_batch(_df(spark, rows), e)
        prefix = [r for b in BATCHES[: e + 1] for r in b]
        want = SK.hll_registers(
            _df(spark, prefix), ["event_type"], F.col("user_id")
        )
        assert _reg_key(h.registers()) == _reg_key(want), f"epoch {e}"


def test_estimates_match_batch_operator(spark, tmp_path):
    h = _hll(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        h.process_batch(_df(spark, rows), e)
    all_rows = [r for b in BATCHES for r in b]
    want = SK.hll_estimate(
        SK.hll_registers(_df(spark, all_rows), ["event_type"], F.col("user_id")),
        ["event_type"],
    )
    assert _reg_key(h.estimates()) == _reg_key(want)


def test_replay_is_idempotent_both_interleavings(spark, tmp_path):
    h = _hll(spark, tmp_path)
    h.process_batch(_df(spark, BATCHES[0]), 0)
    after = _reg_key(h.registers())
    # replay of an applied epoch: cursor guard short-circuits
    h.process_batch(_df(spark, BATCHES[0]), 0)
    assert _reg_key(h.registers()) == after
    # crash BEFORE the cursor write: simulate by re-merging the batch into
    # already-updated state — max-merge idempotence absorbs it
    state = h._read_state()
    state["epoch"] = -1
    h._write_state(state)
    h.process_batch(_df(spark, BATCHES[0]), 0)
    assert _reg_key(h.registers()) == after
    # fresh instance over the same state dir continues, not restarts
    h2 = _hll(spark, tmp_path)
    h2.process_batch(_df(spark, BATCHES[1]), 1)
    prefix = BATCHES[0] + BATCHES[1]
    want = SK.hll_registers(
        _df(spark, prefix), ["event_type"], F.col("user_id")
    )
    assert _reg_key(h2.registers()) == _reg_key(want)


def test_idle_batch_advances_cursor_only(spark, tmp_path):
    h = _hll(spark, tmp_path)
    h.process_batch(_df(spark, BATCHES[0]), 0)
    before = _reg_key(h.registers())
    h.process_batch(_df(spark, []), 1)
    assert h._read_state()["epoch"] == 1
    assert _reg_key(h.registers()) == before


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    h = _hll(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        h.start(spark.readStream.schema(SCHEMA).parquet(src))


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([t for t, _ in BATCHES[0]]),
                "user_id": pa.array(
                    [u for _, u in BATCHES[0]], pa.int64()
                ),
            }
        ),
        f"{src}/b0.parquet",
    )
    h = _hll(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = h.start(spark.readStream.schema(SCHEMA).parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and h._read_state()["epoch"] < 0:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    want = SK.hll_registers(
        _df(spark, BATCHES[0]), ["event_type"], F.col("user_id")
    )
    assert _reg_key(h.registers()) == _reg_key(want)
