"""Streaming SCD2 (streaming/scd2.py): the prefix contract (closed
epochs + open snapshot == batch scd2_history over everything arrived),
update/delete/reinsert across batches, both crash interleavings, idle
epochs, fresh-instance restart, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.cdc import scd2_history
from db_integration_via_kafka_ksql_spark.streaming.scd2 import StreamingScd2

SCHEMA = StructType(
    [
        StructField("key_id", LongType()),
        StructField("offset", LongType()),
        StructField("us", LongType()),
        StructField("__deleted", StringType()),
        StructField("event_type", StringType()),
        StructField("value", StringType()),
    ]
)

ATTRS = ["event_type", "value"]

# key 1: two versions in one batch, update next batch, delete in the last;
# key 2: insert -> delete -> REINSERT across batches;
# key 3: single insert, then silent (open version must carry over);
# key 4: insert+delete within ONE batch (version closes, none opens)
BATCHES = [
    [
        (1, 1, 100, "false", "ins", "a"),
        (1, 2, 200, "false", "upd", "b"),
        (2, 3, 150, "false", "ins", "x"),
    ],
    [
        (1, 4, 300, "false", "upd", "c"),
        (2, 5, 250, "true", "del", None),
        (3, 6, 50, "false", "ins", "z"),
    ],
    [
        (1, 7, 400, "true", "del", None),
        (2, 8, 500, "false", "ins", "y"),
        (4, 9, 600, "false", "ins", "q"),
        (4, 10, 700, "true", "del", None),
    ],
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingScd2(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        attrs=ATTRS,
        trigger_seconds=0,
        **kw,
    )


_COLS = [
    "key_id", "version", "valid_from_us", "valid_to_us", "is_current",
    *ATTRS,
]


def _want(spark, rows):
    return {
        tuple(r)
        for r in scd2_history(
            _df(spark, rows), F.col("us"), attrs=ATTRS
        ).select(*_COLS).collect()
    }


def _got(st):
    return {tuple(r) for r in st.history().select(*_COLS).collect()}


def test_empty_history_is_readable(spark, tmp_path):
    st = _st(spark, tmp_path)
    df = st.history()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == _COLS


def test_prefix_contract_every_epoch(spark, tmp_path):
    st = _st(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix = [r for b in BATCHES[: e + 1] for r in b]
        assert _got(st) == _want(spark, prefix), f"epoch {e}"
    got = _got(st)
    # delete closed key 1's last interval at the delete's ts, no open row
    assert (1, 4, 300, 400, False, "upd", "c") in got
    assert not any(t[0] == 1 and t[4] for t in got)
    # key 2 reinserted: old closed interval AND a fresh open one
    assert (2, 3, 150, 250, False, "ins", "x") in got
    assert (2, 8, 500, None, True, "ins", "y") in got
    # key 3 open version carried over untouched batches
    assert (3, 6, 50, None, True, "ins", "z") in got
    # key 4's same-batch insert+delete closed without ever opening
    assert (4, 9, 600, 700, False, "ins", "q") in got
    assert not any(t[0] == 4 and t[4] for t in got)


def test_closed_versions_are_immutable_across_epochs(spark, tmp_path):
    """A version emitted as closed in epoch e must never be rewritten by
    later epochs (append-only output: bytes stay identical)."""
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    out0 = str(tmp_path / "out" / "epoch=0")
    before = {
        n: os.path.getsize(os.path.join(out0, n))
        for n in os.listdir(out0)
    }
    st.process_batch(_df(spark, BATCHES[1]), 1)
    st.process_batch(_df(spark, BATCHES[2]), 2)
    after = {
        n: os.path.getsize(os.path.join(out0, n))
        for n in os.listdir(out0)
    }
    assert after == before


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    # crash AFTER output commit, BEFORE state commit: wipe the state
    # partition and replay — output skips, state recommits identically
    st.process_batch(_df(spark, BATCHES[1]), 1)
    state1 = str(tmp_path / "state" / "epoch=1")
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert os.path.isdir(state1)
    prefix = BATCHES[0] + BATCHES[1]
    assert _got(st) == _want(spark, prefix)
    # full replay of a committed epoch: no-op
    before = _got(st)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert _got(st) == before
    # fresh instance continues the prefix
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    assert _got(st2) == _want(spark, [r for b in BATCHES for r in b])


def test_idle_epoch_keeps_history(spark, tmp_path):
    """Idle triggers commit NOTHING (ADVICE r12: one empty epoch dir
    per 2 s trigger grows unbounded on a quiet stream) — history is
    unchanged, replays of the idle epoch stay no-ops, and the next
    data-bearing epoch picks up across the gap."""
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    epochs_before = set(os.listdir(str(tmp_path / "out")))
    for idle_epoch in (1, 2, 1):  # two idle triggers + an idle replay
        st.process_batch(_df(spark, []), idle_epoch)
    assert set(os.listdir(str(tmp_path / "out"))) == epochs_before
    assert _got(st) == _want(spark, BATCHES[0])
    st.process_batch(_df(spark, BATCHES[1]), 3)
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
                "key_id": pa.array([r[0] for r in rows], pa.int64()),
                "offset": pa.array([r[1] for r in rows], pa.int64()),
                "us": pa.array([r[2] for r in rows], pa.int64()),
                "__deleted": pa.array([r[3] for r in rows]),
                "event_type": pa.array([r[4] for r in rows]),
                "value": pa.array([r[5] for r in rows]),
            }
        ),
        f"{src}/b0.parquet",
    )
    st = _st(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = st.start(spark.readStream.schema(SCHEMA).parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not st.batches_seen:
            time.sleep(0.5)
        time.sleep(1.5)  # let the first batch finish committing
    finally:
        q.stop()
        q.awaitTermination(30)
    assert _got(st) == _want(spark, rows)


def test_closed_epoch_compaction_composition(spark, tmp_path):
    """compact_epochs over the append-only CLOSED-version output (epochs
    are provenance there — the open snapshot is latest-before state and
    must NOT be compacted): history() is row-identical after compaction,
    a replay of a compacted epoch stays a no-op, and later batches
    continue the prefix."""
    from db_integration_via_kafka_ksql_spark.streaming import epochdir

    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    before = _got(st)
    stats = epochdir.compact_epochs(spark, st.output_path, "epoch", upto=1)
    assert stats["compacted_epochs"] >= 1
    assert _got(st) == before
    st.process_batch(_df(spark, BATCHES[1]), 1)  # replay: still a no-op
    assert _got(st) == before
    st.process_batch(_df(spark, BATCHES[2]), 2)
    assert _got(st) == _want(spark, [r for b in BATCHES for r in b])
