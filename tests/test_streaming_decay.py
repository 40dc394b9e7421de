"""Streaming decay engagement (streaming/decayengagement.py): the
state-derived score prefix contract vs the batch operator (including a
moving horizon re-weighting old days), per-epoch ticks, both crash
interleavings, idle epochs, the checkpoint guard, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.analytics import (
    DAY_US,
    decay_engagement,
)
from db_integration_via_kafka_ksql_spark.streaming.decayengagement import (
    StreamingDecayEngagement,
)

SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("us", LongType())]
)

# (user, day) arrivals. The horizon MOVES: epoch 0 tops out at day 10,
# epoch 1 at day 17 (one half-life later — epoch-0 events must re-weight
# to 500k ppm), epoch 2 jumps to day 31 (three half-lives from day 10).
# User 2 only ever arrives early — a churned user whose score decays
# across epochs while n_events stays put.
BATCHES = [
    [(1, 10), (1, 10), (2, 9), (2, 3)],
    [(1, 17), (3, 17), (3, 16)],
    [(1, 31), (3, 30)],
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, d * DAY_US + 123) for u, d in rows], SCHEMA
    )


def _st(spark, tmp_path, **kw):
    return StreamingDecayEngagement(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _batch_scores(spark, rows):
    rep = decay_engagement(_df(spark, rows), F.col("us"), half_life_days=7)
    return {
        r["user_id"]: (r["n_events"], r["last_seen_day"], r["score_ppm"])
        for r in rep.collect()
    }


def _stream_scores(st):
    return {
        r["user_id"]: (r["n_events"], r["last_seen_day"], r["score_ppm"])
        for r in st.scores().collect()
    }


def test_prefix_contract_scores_match_batch_op(spark, tmp_path):
    """After every epoch scores() equals the batch operator over the
    arrived prefix — including the moving-horizon re-weighting of old
    days (per-user scores are NOT additive; per-day counts are)."""
    st = _st(spark, tmp_path)
    seen: list[tuple[int, int]] = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        seen += rows
        assert _stream_scores(st) == _batch_scores(spark, seen), f"epoch {e}"
    # spot-check the churn story: user 2 last arrived at day 9, horizon
    # is day 31 -> ages 22 and 28 days = 3 and 4 half-lives
    assert _stream_scores(st)[2] == (2, 9, 125_000 + 62_500)


def test_ticks_are_per_epoch_arrival_counts(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    got = {
        (r["epoch"], r["user_id"]): (r["n_batch"], r["last_day_batch"])
        for r in st.ticks().collect()
    }
    assert got == {
        (0, 1): (2, 10),
        (0, 2): (2, 9),
        (1, 1): (1, 17),
        (1, 3): (2, 17),
    }


def test_replay_both_interleavings(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    # crash AFTER output commit, BEFORE state commit
    state1 = str(tmp_path / "state" / "epoch=1")
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert os.path.isdir(state1)
    # full replay: additive counts must NOT double
    before = _stream_scores(st)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert _stream_scores(st) == before
    # fresh instance continues the prefix identically
    st2 = _st(spark, tmp_path)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    seen = BATCHES[0] + BATCHES[1] + BATCHES[2]
    assert _stream_scores(st2) == _batch_scores(spark, seen)


def test_idle_epochs_commit_nothing(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, []), 0)
    assert st.ticks().count() == 0
    assert st.scores().count() == 0
    assert not os.path.isdir(str(tmp_path / "out"))
    st.process_batch(_df(spark, BATCHES[0]), 1)
    out_before = set(os.listdir(str(tmp_path / "out")))
    st.process_batch(_df(spark, []), 2)
    assert set(os.listdir(str(tmp_path / "out"))) == out_before
    # state skipped the gap: epoch 3 reads epoch-1 state
    st.process_batch(_df(spark, BATCHES[1]), 3)
    assert _stream_scores(st) == _batch_scores(
        spark, BATCHES[0] + BATCHES[1]
    )


def test_cold_start_guard_types_follow_configuration(spark, tmp_path):
    st = _st(spark, tmp_path, user_type="string", user_col="uid")
    empty = st.ticks()
    types = {f.name: f.dataType.simpleString() for f in empty.schema.fields}
    assert types["user_id"] == "string"
    st.process_batch(
        spark.createDataFrame(
            [("alice", 10 * DAY_US)], "uid string, us long"
        ),
        0,
    )
    got = _stream_scores(st)
    assert got == {"alice": (1, 10, 1_000_000)}


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    st = _st(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        st.start(spark.readStream.schema(SCHEMA).parquet(src))


def test_half_life_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="half_life_days"):
        _st(spark, tmp_path, half_life_days=0)


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "us": pa.array(
                    [r[1] * DAY_US + 123 for r in rows], pa.int64()
                ),
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
    assert _stream_scores(st) == _batch_scores(spark, rows)


def test_maintenance_bounds_state_listings_and_keeps_prefix_contract(
    spark, tmp_path
):
    """The scheduled-maintenance contract on this stream: pruned state
    epochs keep their replay markers while only the newest K carry full
    copies, and scores() stays bit-equal to the batch op throughout."""
    from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
        MaintenancePolicy,
    )

    # cadence 1: maintenance ticks on every BUSY epoch (idle epochs
    # commit nothing and skip the hook), so the final busy epoch leaves
    # exactly state_keep_last full copies
    st = _st(
        spark,
        tmp_path,
        maintenance=MaintenancePolicy(every_n_epochs=1, state_keep_last=2),
    )
    seen: list[tuple[int, int]] = []
    batches = [
        [(1, d)] if d % 3 else [] for d in range(8)  # idle epochs mixed in
    ]
    for e, rows in enumerate(batches):
        st.process_batch(_df(spark, rows), e)
        seen += rows
        if seen:
            assert _stream_scores(st) == _batch_scores(spark, seen), e
    state_dirs = sorted(os.listdir(str(tmp_path / "state")))
    # every committed epoch keeps its marker dir...
    assert len(state_dirs) == len([b for b in batches if b])
    # ...but only the newest keep_last carry data files
    full = [
        d for d in state_dirs
        if any(f.endswith(".parquet")
               for f in os.listdir(str(tmp_path / "state" / d)))
    ]
    assert len(full) <= 2
    # and a fresh instance over the pruned store still agrees
    st2 = _st(spark, tmp_path)
    assert _stream_scores(st2) == _batch_scores(spark, seen)


def test_archive_fold_is_output_lossless_and_shrinks_state(spark, tmp_path):
    """Ages >= 20 half-lives weigh exactly 0 ppm (1e6 < 2^20), so the
    day-archive fold must change NO output bit while collapsing a user's
    ancient days to one state row."""
    st = _st(
        spark, tmp_path, half_life_days=1, archive_after_half_lives=20
    )
    # user 1: ancient burst (days 0..2) + recent activity (days 50, 51)
    batches = [
        [(1, 0), (1, 1), (1, 2), (2, 1)],
        [(1, 50), (1, 51), (2, 51)],
    ]
    seen: list[tuple[int, int]] = []
    for e, rows in enumerate(batches):
        st.process_batch(
            spark.createDataFrame(
                [(u, d * DAY_US + 9) for u, d in rows], SCHEMA
            ),
            e,
        )
        seen += rows
        # prefix contract holds THROUGH the fold (batch op never folds)
        want = {
            r["user_id"]: (r["n_events"], r["last_seen_day"], r["score_ppm"])
            for r in decay_engagement(
                spark.createDataFrame(
                    [(u, d * DAY_US + 9) for u, d in seen], SCHEMA
                ),
                F.col("us"),
                half_life_days=1,
            ).collect()
        }
        assert _stream_scores(st) == want, f"epoch {e}"
    # state: user 1's days 0..2 folded into one (day=2, c=3) row
    state = {
        (r["u"], r["day"]): r["c"]
        for r in st._prior_counts(None).collect()
    }
    assert state[(1, 2)] == 3
    assert (1, 0) not in state and (1, 1) not in state
    assert state[(1, 50)] == 1 and state[(1, 51)] == 1
    # user 2's ancient day folds too (archive-only max preserved)
    assert state[(2, 1)] == 1
    # replay with the fold enabled stays byte-idempotent on outputs
    before = _stream_scores(st)
    st.process_batch(
        spark.createDataFrame(
            [(u, d * DAY_US + 9) for u, d in batches[1]], SCHEMA
        ),
        1,
    )
    assert _stream_scores(st) == before


def test_archive_fold_refuses_lossy_thresholds(spark, tmp_path):
    with pytest.raises(ValueError, match="archive_after_half_lives"):
        _st(spark, tmp_path, archive_after_half_lives=19)
