"""Streaming CMS join-size tracker (streaming/joinsize.py): per-epoch
prefix contract against the batch operator, replay no-ops, restart
continuation, idle epochs, numeric-key string discipline, checkpoint
guard, and a live stream."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.sketches import (
    cms_join_size,
)
from db_integration_via_kafka_ksql_spark.streaming.joinsize import (
    StreamingJoinSize,
)

# (side, key): left keys cluster on 1-5, right on 3-9 — overlap moves
# per epoch so the estimate must track the growing prefix
BATCHES = [
    [("left", k % 5 + 1) for k in range(40)]
    + [("right", k % 7 + 3) for k in range(30)],
    [("left", k % 3 + 2) for k in range(25)]
    + [("right", k % 4 + 1) for k in range(35)],
    [("right", k % 6 + 4) for k in range(50)],
    [("left", 7) for _ in range(10)],
]

DEPTH, WIDTH = 4, 64


def _df(spark, rows):
    return spark.createDataFrame(rows, "side string, k long")


def _sj(spark, tmp_path, **kw):
    return StreamingJoinSize(
        spark, state_path=str(tmp_path / "sj"), depth=DEPTH, width=WIDTH,
        trigger_seconds=0, **kw,
    )


def _batch_est(spark, prefix):
    left = _df(spark, [r for r in prefix if r[0] == "left"]).select("k")
    right = _df(spark, [r for r in prefix if r[0] == "right"]).select("k")
    return cms_join_size(
        left, F.col("k").cast("string"), right, F.col("k").cast("string"),
        depth=DEPTH, width=WIDTH,
    ).collect()[0]["join_size_est"]


def _exact(prefix):
    from collections import Counter

    lc = Counter(k for s, k in prefix if s == "left")
    rc = Counter(k for s, k in prefix if s == "right")
    return sum(c * rc.get(k, 0) for k, c in lc.items())


def test_prefix_contract_every_epoch(spark, tmp_path):
    """After epoch e the streaming estimate equals the batch operator
    over the whole prefix (same grids, same integer algebra), and stays
    one-sided vs the exact join size."""
    sj = _sj(spark, tmp_path)
    prefix = []
    for e, rows in enumerate(BATCHES):
        sj.process_batch(_df(spark, rows), e)
        prefix += rows
        got = sj.estimate()
        assert got == _batch_est(spark, prefix), f"epoch {e}"
        assert got >= _exact(prefix)
    sizes = sj.grid_sizes()
    assert all(0 < n <= DEPTH * WIDTH for n in sizes.values())


def test_replay_is_noop_and_restart_continues(spark, tmp_path):
    sj = _sj(spark, tmp_path)
    sj.process_batch(_df(spark, BATCHES[0]), 0)
    sj.process_batch(_df(spark, BATCHES[1]), 1)
    snap = sj.estimate()
    sj.process_batch(_df(spark, BATCHES[1]), 1)  # replay: cursor skips
    assert sj.estimate() == snap
    # fresh instance (post-crash restart) reads the state and continues
    sj2 = _sj(spark, tmp_path)
    sj2.process_batch(_df(spark, BATCHES[2]), 2)
    assert sj2.estimate() == _batch_est(
        spark, [r for b in BATCHES[:3] for r in b]
    )


def test_idle_epoch_advances_cursor_only(spark, tmp_path):
    sj = _sj(spark, tmp_path)
    sj.process_batch(_df(spark, BATCHES[0]), 0)
    before = sj.estimate()
    sj.process_batch(_df(spark, []), 1)
    assert sj.estimate() == before
    assert sj._read_state()["epoch"] == 1


def test_one_sided_side_absence(spark, tmp_path):
    """Left-only traffic estimates 0 (no hash row can have a nonzero
    inner product) — the batch operator's missing-row rule carried into
    the python fold."""
    sj = _sj(spark, tmp_path)
    sj.process_batch(_df(spark, [("left", k) for k in range(20)]), 0)
    assert sj.estimate() == 0


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    sj = _sj(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        sj.start(spark.readStream.schema("side string, k long").parquet(src))


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "side": pa.array([s for s, _ in rows]),
                "k": pa.array([k for _, k in rows], pa.int64()),
            }
        ),
        f"{src}/b0.parquet",
    )
    sj = _sj(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = sj.start(spark.readStream.schema("side string, k long").parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not sj.batches_seen:
            time.sleep(0.5)
        time.sleep(1.5)  # let the first batch finish committing
    finally:
        q.stop()
        q.awaitTermination(30)
    assert sj.estimate() == _batch_est(spark, rows)
    assert sj.estimate() >= _exact(rows)
