"""Streaming connected components (streaming/components.py): the prefix
contract (labels after epoch e == batch cc over every edge arrived),
cross-batch component merges, replay/restart, idle epochs, live stream."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.graph import (
    connected_components,
)
from db_integration_via_kafka_ksql_spark.streaming.components import (
    StreamingComponents,
)

# batch 0: {1,2,3} and {10,11} form; batch 1: {20,21} forms, {1..3} grows;
# batch 2: ONE edge (4, 10) merges component {1,2,3,4} with {10,11} —
# the cross-batch merge only the contracted-history increment can see
BATCHES = [
    [(1, 2), (2, 3), (10, 11)],
    [(20, 21), (3, 4)],
    [(4, 10)],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _sc(spark, tmp_path, **kw):
    return StreamingComponents(
        spark, state_path=str(tmp_path / "cc"), trigger_seconds=0, **kw
    )


def _want(spark, rows):
    edges = _df(spark, rows)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return {
        (r["id"], r["label"])
        for r in connected_components(nodes, edges).collect()
    }


def _got(sc):
    return {(r["id"], r["label"]) for r in sc.labels().collect()}


def test_empty_state_is_readable(spark, tmp_path):
    sc = _sc(spark, tmp_path)
    df = sc.labels()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "label"]


def test_prefix_contract_and_cross_batch_merge(spark, tmp_path):
    sc = _sc(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        sc.process_batch(_df(spark, rows), e)
        prefix = [r for b in BATCHES[: e + 1] for r in b]
        assert _got(sc) == _want(spark, prefix), f"epoch {e}"
    got = dict(_got(sc))
    # the epoch-2 edge merged {1,2,3,4} with {10,11}: all six share min 1
    assert {got[n] for n in (1, 2, 3, 4, 10, 11)} == {1}
    assert got[20] == got[21] == 20


def test_replay_and_fresh_restart(spark, tmp_path):
    sc = _sc(spark, tmp_path)
    sc.process_batch(_df(spark, BATCHES[0]), 0)
    sc.process_batch(_df(spark, BATCHES[1]), 1)
    snap = _got(sc)
    sc.process_batch(_df(spark, BATCHES[1]), 1)  # replay: committed skip
    assert _got(sc) == snap
    sc2 = _sc(spark, tmp_path)  # crash-restart continues the prefix
    sc2.process_batch(_df(spark, BATCHES[2]), 2)
    assert _got(sc2) == _want(spark, [r for b in BATCHES for r in b])


def test_idle_epoch_keeps_labels(spark, tmp_path):
    sc = _sc(spark, tmp_path)
    sc.process_batch(_df(spark, BATCHES[0]), 0)
    sc.process_batch(_df(spark, []), 1)
    assert _got(sc) == _want(spark, BATCHES[0])
    sc.process_batch(_df(spark, BATCHES[1]), 2)
    assert _got(sc) == _want(spark, BATCHES[0] + BATCHES[1])


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    sc = _sc(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        sc.start(spark.readStream.schema("src long, dst long").parquet(src))


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.int64()),
                "dst": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        f"{src}/b0.parquet",
    )
    sc = _sc(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = sc.start(spark.readStream.schema("src long, dst long").parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not sc.batches_seen:
            time.sleep(0.5)
        time.sleep(1.5)  # let the first batch finish committing
    finally:
        q.stop()
        q.awaitTermination(30)
    assert _got(sc) == _want(spark, rows)
