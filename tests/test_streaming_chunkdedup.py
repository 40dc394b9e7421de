"""Streaming chunk-level dedup (streaming/chunkdedup.py): per-epoch
prefix contract vs the batch chunker, new/dup accounting, both crash
interleavings, idle epochs, and a live stream."""

from __future__ import annotations

import os
import random
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.multimodal import (
    content_defined_chunks,
)
from db_integration_via_kafka_ksql_spark.streaming.chunkdedup import (
    StreamingChunkDedup,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)

_rng = random.Random(42)
_A = bytes(_rng.randrange(256) for _ in range(2000))
_B = bytes(_rng.randrange(256) for _ in range(1500))
_C = bytes(_rng.randrange(256) for _ in range(120)) + _A  # shifted re-upload of A

# batch 0: two distinct payloads + an exact duplicate of A;
# batch 1: A re-uploaded under a new id (all dup) + novel C whose tail
#          chunks resynchronize onto A's witnesses;
# batch 2: B again (all dup)
BATCHES = [
    [(0, _A), (1, _B), (2, _A)],
    [(3, _A), (4, _C)],
    [(5, _B)],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingChunkDedup(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _witness_set(spark, tmp_path, epoch):
    df = spark.read.parquet(str(tmp_path / "state")).filter(f"epoch = {epoch}")
    return {r["chunk_md5"] for r in df.collect()}


def _batch_hashes(spark, rows):
    return {
        r["chunk_md5"]
        for r in content_defined_chunks(_df(spark, rows)).collect()
    }


def test_prefix_contract_and_new_dup_split(spark, tmp_path):
    st = _st(spark, tmp_path)
    prefix: list = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix += rows
        # witness set == distinct chunk hashes of the batch operator
        # over everything arrived
        assert _witness_set(spark, tmp_path, e) == _batch_hashes(spark, prefix), e
    led = st.ledger()
    # epoch 0: doc 2 is an exact copy of doc 0 -> every doc-2 chunk dup
    e0 = led.filter("epoch = 0").collect()
    assert all(not r["is_new"] for r in e0 if r["doc_id"] == 2)
    assert all(r["is_new"] for r in e0 if r["doc_id"] == 0)
    # epoch 1: re-upload of A fully dedups; C's resynchronized tail
    # mostly dedups against A's witnesses but its head is new
    e1 = led.filter("epoch = 1").collect()
    assert all(not r["is_new"] for r in e1 if r["doc_id"] == 3)
    c_new = [r for r in e1 if r["doc_id"] == 4 and r["is_new"]]
    c_all = [r for r in e1 if r["doc_id"] == 4]
    assert 0 < len(c_new) < len(c_all) / 2  # most of C arrived known
    # epoch 2: nothing new at all
    assert led.filter("epoch = 2 AND is_new").count() == 0
    # the ledger tiles every payload exactly
    total = sum(
        r["length"] for r in led.filter("epoch = 1 AND doc_id = 4").collect()
    )
    assert total == len(_C)


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    # crash AFTER output commit, BEFORE state commit
    state1 = str(tmp_path / "state" / "epoch=1")
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert os.path.isdir(state1)
    want = _batch_hashes(spark, BATCHES[0] + BATCHES[1])
    assert _witness_set(spark, tmp_path, 1) == want
    # full replay: idempotent (set state + committed-epoch guard)
    before = st.ledger().filter("epoch = 1").count()
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert st.ledger().filter("epoch = 1").count() == before
    assert _witness_set(spark, tmp_path, 1) == want
    # fresh instance continues the prefix
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    assert _witness_set(spark, tmp_path, 2) == _batch_hashes(
        spark, BATCHES[0] + BATCHES[1] + BATCHES[2]
    )
    assert st2.ledger().filter("epoch = 2 AND is_new").count() == 0


def test_idle_epoch_keeps_witnesses(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    out_before = set(os.listdir(str(tmp_path / "out")))
    # idle triggers commit nothing (incl. idle replays) — quiet streams
    # must not grow empty epoch dirs
    st.process_batch(_df(spark, []), 1)
    st.process_batch(_df(spark, []), 1)
    assert set(os.listdir(str(tmp_path / "out"))) == out_before
    st.process_batch(_df(spark, [(9, _A)]), 2)
    assert st.ledger().filter("epoch = 2 AND is_new").count() == 0


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    st = _st(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        st.start(spark.readStream.schema(SCHEMA).parquet(src))


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 2], pa.int64()),
                "payload": pa.array([_A, _A], pa.binary()),
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
    led = st.ledger().filter("epoch = 0").collect()
    assert led and all(not r["is_new"] for r in led if r["doc_id"] == 2)
    assert all(r["is_new"] for r in led if r["doc_id"] == 0)


def test_ledger_on_idle_only_stream_is_empty(spark, tmp_path):
    """ADVICE r13: after the idle-commit removal, a stream that has only
    seen idle triggers has no output dir — ledger() must return an empty
    ledger-shaped frame, not raise PATH_NOT_FOUND (the scd2.history /
    fingerprintpairs.pairs guard)."""
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, []), 0)  # idle: commits nothing
    led = st.ledger()
    assert led.count() == 0
    assert set(led.columns) == {
        "doc_id", "chunk_idx", "offset", "length", "chunk_md5",
        "is_new", "epoch",
    }
    # the empty frame is filterable exactly like the real ledger
    assert led.filter("epoch = 0 AND is_new").count() == 0
    # and once a real batch lands, the schema agrees with the guard's
    st.process_batch(_df(spark, BATCHES[0]), 1)
    real = st.ledger()
    assert set(real.columns) == set(led.columns)
    assert {f.name: f.dataType for f in real.schema.fields} == {
        f.name: f.dataType for f in led.schema.fields
    }
