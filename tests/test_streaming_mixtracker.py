"""Streaming mixture burn-down (streaming/mixtracker.py): per-epoch
prefix contract vs a plain groupBy, fill/done semantics, unplanned
sources, both crash interleavings, idle epochs, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.streaming.mixtracker import (
    StreamingMixTracker,
)

SCHEMA = StructType(
    [StructField("source", StringType()), StructField("text", StringType())]
)

PLAN = {"web": 12, "code": 6}

BATCHES = [
    [("web", "a b c d"), ("web", "e f"), ("code", "x y z")],
    [("web", "g h i j k l m"), ("rogue", "q r")],  # rogue: not in the plan
    [("code", "u v w p")],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingMixTracker(
        spark,
        plan=dict(PLAN),
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _want(spark, rows):
    return {
        r["source"]: (r["d"], r["t"])
        for r in _df(spark, rows)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("d"),
            F.sum(F.size(F.split("text", " "))).alias("t"),
        )
        .collect()
    }


def test_prefix_contract_fill_and_done(spark, tmp_path):
    st = _st(spark, tmp_path)
    prefix: list = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix += rows
        got = {
            r["source"]: r
            for r in st.report().filter(f"epoch = {e}").collect()
        }
        want = _want(spark, prefix)
        for src, r in got.items():
            assert (r["cum_docs"], r["cum_tokens"]) == want[src], (e, src)
    # epoch 0: web has 6 of 12 tokens -> 500 permille, not done
    e0 = {r["source"]: r for r in st.report().filter("epoch = 0").collect()}
    assert e0["web"]["fill_permille"] == 500 and not e0["web"]["done"]
    assert e0["code"]["fill_permille"] == 500 and not e0["code"]["done"]
    # epoch 1: web reaches 13 >= 12 -> capped 1000, done; rogue is
    # unplanned -> budget 0, fill 1000, surfaced not dropped
    e1 = {r["source"]: r for r in st.report().filter("epoch = 1").collect()}
    assert e1["web"]["done"] and e1["web"]["fill_permille"] == 1000
    assert e1["rogue"]["budget_tokens"] == 0 and e1["rogue"]["fill_permille"] == 1000
    # epoch 2: code reaches 7 >= 6 -> done
    e2 = {r["source"]: r for r in st.report().filter("epoch = 2").collect()}
    assert e2["code"]["done"]


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    shutil.rmtree(str(tmp_path / "state" / "epoch=1"))
    st.process_batch(_df(spark, BATCHES[1]), 1)  # half-committed replay
    st.process_batch(_df(spark, BATCHES[1]), 1)  # full replay
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    got = {
        r["source"]: (r["cum_docs"], r["cum_tokens"])
        for r in st2.report().filter("epoch = 2").collect()
    }
    want = _want(spark, BATCHES[0] + BATCHES[1] + BATCHES[2])
    assert got["code"] == want["code"]  # counters did not double


def test_idle_epoch_and_bad_plan(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert os.path.isdir(str(tmp_path / "out" / "epoch=1"))
    st.process_batch(_df(spark, BATCHES[2]), 2)
    got = {r["source"]: r for r in st.report().filter("epoch = 2").collect()}
    assert got["code"]["cum_tokens"] == 7
    with pytest.raises(ValueError, match="budgets"):
        StreamingMixTracker(
            spark, plan={"web": -1},
            output_path=str(tmp_path / "o2"), state_path=str(tmp_path / "s2"),
        )


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows]),
                "text": pa.array([r[1] for r in rows]),
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
    got = {r["source"]: r for r in st.report().filter("epoch = 0").collect()}
    assert got["web"]["cum_tokens"] == 6 and got["code"]["cum_tokens"] == 3
