"""Streaming key-uniqueness audit (streaming/keyaudit.py): per-epoch
reconciliation with the batch uniqueness constraint, NULL-key stance,
both crash interleavings, idle epochs, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators import validation as V
from db_integration_via_kafka_ksql_spark.streaming.keyaudit import StreamingKeyAudit

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", StringType())]
)

# batch 0: ids 1,2,2 (one in-batch dup); batch 1: 2,3 (cross-batch dup);
# batch 2: 1,1,4 (cross-batch dup + in-batch dup) + a NULL id (ignored)
BATCHES = [
    [(1, "a"), (2, "b"), (2, "c")],
    [(2, "d"), (3, "e")],
    [(1, "f"), (1, "g"), (4, "h"), (None, "i")],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingKeyAudit(
        spark,
        key_col="id",
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _batch_unique_bad(spark, rows):
    rep = V.check_constraints(_df(spark, rows), [V.uniqueness("u", "id")]).first()
    return rep["n_bad"]


def test_reconciles_with_batch_uniqueness_per_epoch(spark, tmp_path):
    st = _st(spark, tmp_path)
    prefix: list = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix += rows
        assert st.duplicate_rows_total() == _batch_unique_bad(spark, prefix), e
    led = {(r["epoch"], r["key"]): r for r in st.ledger().collect()}
    assert led[(0, "2")]["n_in_batch"] == 2 and not led[(0, "2")]["known_before"]
    assert led[(1, "2")]["known_before"] is True
    assert led[(1, "3")]["known_before"] is False
    assert led[(2, "1")]["known_before"] is True
    assert led[(2, "1")]["n_in_batch"] == 2
    # the NULL id never entered the ledger
    assert not any(k is None for _, k in led)


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    want = st.duplicate_rows_total()
    # crash AFTER output commit, BEFORE state commit
    shutil.rmtree(str(tmp_path / "state" / "epoch=1"))
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert st.duplicate_rows_total() == want
    # full replay: idempotent
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert st.duplicate_rows_total() == want
    # fresh instance continues the prefix
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    assert st2.duplicate_rows_total() == _batch_unique_bad(
        spark, BATCHES[0] + BATCHES[1] + BATCHES[2]
    )


def test_idle_epoch_keeps_witnesses(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert os.path.isdir(str(tmp_path / "out" / "epoch=1"))
    st.process_batch(_df(spark, [(1, "z")]), 2)
    led = {r["epoch"]: r for r in st.ledger().filter("key = '1'").collect()}
    assert led[2]["known_before"] is True


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        _st(spark, tmp_path).start(spark.readStream.schema(SCHEMA).parquet(src))


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "v": pa.array([r[1] for r in rows]),
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
    assert st.duplicate_rows_total() == _batch_unique_bad(spark, rows)
