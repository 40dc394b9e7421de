"""Online k-means (streaming/kmeans.py): batch-sequence equivalence
against a sequential python model (centroids AND per-epoch assignments),
replay idempotence, idle batches, the dims guard, and a live stream."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from db_integration_via_kafka_ksql_spark.streaming.kmeans import StreamingKMeans

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)

DIMS = 4
INIT = [[0, 0, 0, 0], [1000, 1000, 1000, 1000]]


def _emb(q):
    """Float embedding whose quantization (floor(x*1024)) is exactly q."""
    return [x / 1024.0 for x in q]


def _batch(spark, rows):
    return spark.createDataFrame(
        [(vid, _emb(q)) for vid, q in rows], SCHEMA
    )


def py_streaming_kmeans(batches, init):
    k, dims = len(init), len(init[0])
    sums = [[0] * dims for _ in range(k)]
    counts = [0] * k
    cents = [list(c) for c in init]
    asg_by_epoch = []
    for rows in batches:
        asg = {}
        for vid, q in rows:
            best = min(
                (sum((a - b) ** 2 for a, b in zip(q, c)), cid)
                for cid, c in enumerate(cents)
            )
            asg[vid] = best[1]
        for vid, q in rows:
            c = asg[vid]
            counts[c] += 1
            for i, x in enumerate(q):
                sums[c][i] += x
        for c in range(k):
            if counts[c]:
                cents[c] = [sums[c][i] // counts[c] for i in range(dims)]
        asg_by_epoch.append(asg)
    return cents, asg_by_epoch


def _km(spark, tmp_path, **kw):
    return StreamingKMeans(
        spark,
        state_path=str(tmp_path / "clusters"),
        initial_centroids=[list(c) for c in INIT],
        assignments_path=str(tmp_path / "assignments"),
        trigger_seconds=0,
        **kw,
    )


BATCHES = [
    [(1, [10, 0, 5, 0]), (2, [900, 950, 1000, 1000]), (3, [0, 30, 0, 7])],
    [(4, [850, 1000, 900, 990]), (5, [5, 5, 5, 5])],
    [(6, [400, 400, 420, 400]), (7, [999, 999, 999, 999])],
]


def test_batch_sequence_matches_python_model(spark, tmp_path):
    km = _km(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        km.process_batch(_batch(spark, rows), e)
    want_cents, want_asg = py_streaming_kmeans(BATCHES, INIT)
    assert km.centroids() == want_cents
    for e in range(len(BATCHES)):
        got = {
            r["vec_id"]: r["cluster"]
            for r in km.assignments().filter(f"epoch = {e}").collect()
        }
        assert got == want_asg[e], f"epoch {e} assignments diverged"


def test_replay_is_a_noop_for_state_and_assignments(spark, tmp_path):
    km = _km(spark, tmp_path)
    km.process_batch(_batch(spark, BATCHES[0]), 0)
    km.process_batch(_batch(spark, BATCHES[1]), 1)
    cents = km.centroids()
    n_rows = km.assignments().count()
    km.process_batch(_batch(spark, BATCHES[1]), 1)  # crash-replay
    assert km.centroids() == cents
    assert km.assignments().count() == n_rows
    # a fresh instance over the same state dirs (restart) converges too
    km2 = _km(spark, tmp_path)
    km2.process_batch(_batch(spark, BATCHES[1]), 1)
    assert km2.centroids() == cents


def test_idle_batch_advances_cursor_without_touching_centroids(spark, tmp_path):
    km = _km(spark, tmp_path)
    km.process_batch(_batch(spark, BATCHES[0]), 0)
    cents = km.centroids()
    km.process_batch(_batch(spark, []), 1)
    assert km.centroids() == cents
    assert km._read_state()["epoch"] == 1


def test_dims_mismatch_raises(spark, tmp_path):
    km = _km(spark, tmp_path)
    with pytest.raises(ValueError, match="batch vectors have"):
        km.process_batch(_batch(spark, [(1, [1, 2, 3])]), 0)


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)

    def write_feed(rows, name):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([v for v, _ in rows], pa.int64()),
                    "embedding": pa.array(
                        [_emb(q) for _, q in rows], pa.list_(pa.float64())
                    ),
                }
            ),
            f"{src}/{name}",
        )

    write_feed(BATCHES[0], "b0.parquet")
    km = _km(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = km.start(stream)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and km._read_state()["epoch"] < 0:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    want_cents, want_asg = py_streaming_kmeans(BATCHES[:1], INIT)
    assert km.centroids() == want_cents
    got = {
        r["vec_id"]: r["cluster"] for r in km.assignments().collect()
    }
    assert got == want_asg[0]
