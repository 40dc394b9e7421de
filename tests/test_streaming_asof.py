"""StreamingAsof (streaming/asof.py): prefix contract vs the batch as-of
operator, same-batch visibility, both crash interleavings, horizon
compaction, idle epochs, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.asof import asof_join
from db_integration_via_kafka_ksql_spark.streaming.asof import StreamingAsof

SCHEMA = StructType(
    [
        StructField("side", StringType()),
        StructField("fact_id", LongType()),
        StructField("key", LongType()),
        StructField("t", LongType()),
        StructField("value", LongType()),
    ]
)

# (side, fact_id, key, t, value) — dims carry value, facts carry fact_id
BATCHES = [
    [("dim", None, 1, 10, 100), ("dim", None, 2, 10, 200),
     ("fact", 1, 1, 15, None),              # joins v=100
     ("fact", 2, 1, 10, None),              # same-ts dim visible: v=100
     ("fact", 3, 2, 5, None)],              # before any version: NULL
    [("dim", None, 1, 20, 111),
     ("fact", 4, 1, 25, None),              # joins the NEW version 111
     ("fact", 5, 1, 12, None)],             # out-of-order fact: still 100
    [("fact", 6, 2, 50, None), ("fact", 7, 3, 50, None)],  # 7: no dim ever
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingAsof(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _want(spark, all_rows, fact_rows):
    dims = spark.createDataFrame(
        [(k, t, v) for s, f, k, t, v in all_rows if s == "dim"],
        "key long, t long, value long",
    )
    facts = spark.createDataFrame(
        [(f, k, t) for s, f, k, t, v in fact_rows if s == "fact"],
        "fact_id long, key long, t long",
    )
    return {
        r["fact_id"]: r["value_asof"]
        for r in asof_join(facts, dims, ["key"], "t", ["value"]).collect()
    }


def _epoch_out(st, e):
    return {
        r["fact_id"]: r["value_asof"]
        for r in st.enriched().filter(f"epoch = {e}").collect()
    }


def test_prefix_contract_and_same_batch_visibility(spark, tmp_path):
    st = _st(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        arrived = [r for b in BATCHES[: e + 1] for r in b]
        assert _epoch_out(st, e) == _want(spark, arrived, rows), f"epoch {e}"
    # spot checks of the interesting rows
    assert _epoch_out(st, 0) == {1: 100, 2: 100, 3: None}
    assert _epoch_out(st, 1) == {4: 111, 5: 100}
    assert _epoch_out(st, 2) == {6: 200, 7: None}


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    # crash AFTER output, BEFORE state: wipe state epoch 1 and replay
    state1 = str(tmp_path / "state" / "epoch=1")
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert os.path.isdir(state1)
    before = _epoch_out(st, 1)
    st.process_batch(_df(spark, BATCHES[1]), 1)  # full replay: no-op
    assert _epoch_out(st, 1) == before
    st2 = _st(spark, tmp_path)  # fresh instance continues
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    assert _epoch_out(st2, 2) == {6: 200, 7: None}


def test_idle_epoch(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert os.path.isdir(str(tmp_path / "out" / "epoch=1"))
    st.process_batch(_df(spark, BATCHES[1]), 2)
    assert _epoch_out(st, 2) == {4: 111, 5: 100}


def test_horizon_compacts_to_anchor(spark, tmp_path):
    st = _st(spark, tmp_path, horizon_us=20)
    # key 1 versions at t=10, 15, 100: horizon 20 from wm=100 keeps
    # t=100 and the ANCHOR (newest <= 80) = t=15; t=10 is dropped
    st.process_batch(
        _df(spark, [("dim", None, 1, 10, 1), ("dim", None, 1, 15, 2),
                    ("dim", None, 1, 100, 3)]), 0,
    )
    state = (
        spark.read.parquet(str(tmp_path / "state"))
        .filter("epoch = 0").select("t").collect()
    )
    assert sorted(r["t"] for r in state) == [15, 100]
    # in-horizon facts are exact; an older-than-horizon fact NEVER gets
    # a version from its future — point-in-time correctness: t=12
    # precedes the retained anchor (t=15), so it yields NULL (the true
    # t=10 version was compacted away); t=16 lands on the anchor value
    st.process_batch(
        _df(spark, [("fact", 1, 1, 99, None), ("fact", 2, 1, 12, None),
                    ("fact", 3, 1, 16, None)]), 1
    )
    got = _epoch_out(st, 1)
    assert got[1] == 2       # newest version <= 99 among retained
    assert got[2] is None    # pre-anchor fact: NULL, never future leakage
    assert got[3] == 2       # at-or-after the anchor: anchor value


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
                "side": pa.array([r[0] for r in rows]),
                "fact_id": pa.array([r[1] for r in rows], pa.int64()),
                "key": pa.array([r[2] for r in rows], pa.int64()),
                "t": pa.array([r[3] for r in rows], pa.int64()),
                "value": pa.array([r[4] for r in rows], pa.int64()),
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
    assert _epoch_out(st, 0) == {1: 100, 2: 100, 3: None}
