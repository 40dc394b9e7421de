"""StreamingQualityDrift (streaming/drift.py): python-model equivalence
of the at-arrival scoring, cold start, crash interleavings, idle epochs,
and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
    quality_bucket_counts,
)
from db_integration_via_kafka_ksql_spark.streaming.drift import (
    StreamingQualityDrift,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)

GOOD = " ".join(f"w{i}" for i in range(60))
BAD = "the the the the the"

BATCHES = [
    [(1, GOOD, "a"), (2, GOOD, "a"), (3, GOOD, "b")],
    [(4, GOOD, "a"), (5, BAD, "junk"), (6, BAD, "junk")],
    [(7, BAD, "a"), (8, GOOD, "b")],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingQualityDrift(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _buckets(spark, rows):
    return {
        (r["source"], r["bucket"]): r["cnt"]
        for r in quality_bucket_counts(_df(spark, rows)).collect()
    }


def _model(spark, batches):
    state: dict = {}
    out = {}
    for e, rows in enumerate(batches):
        sb = _buckets(spark, rows)
        gtotal = sum(state.values())
        per_source: dict = {}
        for (s, b), c in sb.items():
            per_source.setdefault(s, {})[b] = c
        epoch_rows = {}
        for s, hist in per_source.items():
            n = sum(hist.values())
            buckets = set(hist) | {b for (_, b) in state}
            d = 0
            if gtotal:  # cold start defines the distribution: distance 0
                for b in sorted(buckets):
                    share = hist.get(b, 0) * 1000 // n
                    gcnt = sum(c for (_, bb), c in state.items() if bb == b)
                    d += abs(share - gcnt * 1000 // gtotal)
            epoch_rows[s] = (n, d)
        out[e] = epoch_rows
        for k, c in sb.items():
            state[k] = state.get(k, 0) + c
    return out


def _epoch_out(st, e):
    return {
        r["source"]: (r["n_docs"], r["drift_permille"])
        for r in st.drift().filter(f"epoch = {e}").collect()
    }


def test_model_equivalence_and_junk_feed_flagged(spark, tmp_path):
    st = _st(spark, tmp_path)
    want = _model(spark, BATCHES)
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        assert _epoch_out(st, e) == want[e], f"epoch {e}"
    # cold start scores 0; the junk feed drifts hard once a corpus exists
    assert all(v[1] == 0 for v in _epoch_out(st, 0).values())
    e1 = _epoch_out(st, 1)
    assert e1["junk"][1] > e1["a"][1]


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    state1 = str(tmp_path / "state" / "epoch=1")
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)  # output skips, state heals
    assert os.path.isdir(state1)
    before = _epoch_out(st, 1)
    st.process_batch(_df(spark, BATCHES[1]), 1)  # full replay: no-op
    assert _epoch_out(st, 1) == before
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    assert _epoch_out(st2, 2) == _model(spark, BATCHES)[2]


def test_idle_epoch(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert os.path.isdir(str(tmp_path / "out" / "epoch=1"))
    st.process_batch(_df(spark, BATCHES[1]), 2)
    want = _model(spark, [BATCHES[0], [], BATCHES[1]])
    assert _epoch_out(st, 2) == want[2]


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
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "source": pa.array([r[2] for r in rows]),
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
    assert set(got) == {"a", "b"} and all(v[1] == 0 for v in got.values())
