"""Scheduled epochdir maintenance (streaming/maintenance.py +
epochdir.prune_state_epochs): a long idle+busy run keeps state/output
listings BOUNDED while every reader contract (latest-before state,
lossless output, replay no-op) survives — r13 verdict #5, the cadence
the per-store primitives were missing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators.relational import (
    robust_outlier_report,
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)
from db_integration_via_kafka_ksql_spark.streaming.robustoutlier import (
    StreamingRobustOutlier,
)

SCHEMA = StructType(
    [StructField("t", StringType()), StructField("val", DoubleType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _data_epochs(path, batch_col="epoch"):
    return [
        e
        for e in epochdir.list_epochs(path, batch_col)
        if any(
            n.endswith(".parquet")
            for n in os.listdir(epochdir.partition_dir(path, batch_col, e))
        )
    ]


def test_prune_state_epochs_keeps_markers_and_latest(spark, tmp_path):
    path = str(tmp_path / "state")
    for e in range(6):
        epochdir.commit_epoch(
            _df(spark, [("a", float(e))]), path, "epoch", e
        )
    r = epochdir.prune_state_epochs(path, "epoch", keep_last=2)
    assert r["pruned_epochs"] == 4
    # every epoch dir survives as a replay marker...
    assert epochdir.list_epochs(path, "epoch") == list(range(6))
    assert all(
        epochdir.epoch_committed(path, "epoch", e) for e in range(6)
    )
    # ...but only the newest 2 still carry data
    assert _data_epochs(path) == [4, 5]
    # readers of the whole root see exactly the kept rows
    vals = {r["val"] for r in spark.read.parquet(path).collect()}
    assert vals == {4.0, 5.0}
    # idempotent: a second pass prunes nothing
    assert epochdir.prune_state_epochs(path, "epoch", keep_last=2) == {
        "pruned_epochs": 0
    }
    with pytest.raises(ValueError, match="keep_last"):
        epochdir.prune_state_epochs(path, "epoch", keep_last=0)


def test_long_idle_busy_run_keeps_listings_bounded(spark, tmp_path):
    """The composition contract: 14 epochs (busy + idle mix) under a
    4-epoch cadence leave O(keep_last) state copies and O(output_keep_last)
    data-bearing output partitions — while the prefix contract vs the
    batch operator and the replay no-op both still hold."""
    st = StreamingRobustOutlier(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        group_col="t",
        value_col="val",
        trigger_seconds=0,
        maintenance=MaintenancePolicy(
            every_n_epochs=4,
            state_keep_last=2,
            compact_outputs=True,
            output_keep_last=2,
        ),
    )
    seen: list[tuple[str, float]] = []
    rows_so_far = 0
    for e in range(14):
        if e % 3 == 2:
            st.process_batch(_df(spark, []), e)  # idle
            continue
        rows = [("a", float(10 + (e % 5))), ("b", float(100 + e))]
        st.process_batch(_df(spark, rows), e)
        seen += rows
        rows_so_far += 2
    # bounded listings: state copies <= keep_last + (cadence gap worth)
    state_data = _data_epochs(str(tmp_path / "state"))
    assert len(state_data) <= 2 + 3, state_data
    out_data = _data_epochs(str(tmp_path / "out"))
    assert len(out_data) <= 2 + 3, out_data
    # output compaction was LOSSLESS: every scored row still present
    assert st.outliers().count() == rows_so_far
    # latest-before state still answers exactly the batch op's numbers
    want = {
        r["t"]: (r["n"], r["med"], r["mad"])
        for r in robust_outlier_report(_df(spark, seen), "t", "val").collect()
    }
    got = {
        r["grp"]: (r["n"], r["med"], r["mad"])
        for r in st.current_stats().collect()
    }
    assert got == want
    # replay of a long-pruned epoch is STILL a byte-level no-op: the
    # stripped partition dir remains its commit marker
    listing_before = {
        p: sorted(os.listdir(epochdir.partition_dir(p, "epoch", 0)))
        for p in (str(tmp_path / "out"), str(tmp_path / "state"))
    }
    st.process_batch(_df(spark, [("a", 10.0), ("b", 100.0)]), 0)
    for p, before in listing_before.items():
        assert sorted(os.listdir(epochdir.partition_dir(p, "epoch", 0))) == before


def test_maintain_cadence_ttl_and_error_isolation(spark, tmp_path):
    calls: list[int] = []

    def expire(horizon: int) -> int:
        calls.append(horizon)
        return 0

    pol = MaintenancePolicy(every_n_epochs=5, witness_ttl_epochs=3)
    # not due -> no-op, expire untouched
    assert maintain(spark, pol, 4, "epoch", expire=expire) is None
    # due -> expire called with epoch - ttl
    rep = maintain(spark, pol, 10, "epoch", expire=expire)
    assert calls == [7] and rep["expired"] == 0
    # horizon <= 0 -> skipped (nothing can be older than epoch 0)
    maintain(spark, pol, 0, "epoch", expire=expire)
    assert calls == [7]
    # a failing primitive is isolated into a RuntimeWarning, not a crash
    def boom(horizon: int) -> int:
        raise OSError("disk on fire")

    with pytest.warns(RuntimeWarning, match="disk on fire"):
        rep = maintain(spark, pol, 10, "epoch", expire=boom)
    assert "error" in rep
    # no policy -> never anything
    assert maintain(spark, None, 10, "epoch", expire=expire) is None
    with pytest.raises(ValueError, match="every_n_epochs"):
        MaintenancePolicy(every_n_epochs=0)
    # ttl=0 would expire THIS epoch's witnesses every tick (code review
    # r14): reject it like the sibling knobs
    with pytest.raises(ValueError, match="witness_ttl_epochs"):
        MaintenancePolicy(witness_ttl_epochs=0)


def test_prune_sees_subpartitioned_epoch_data(spark, tmp_path):
    """code review r14: epochs committed with partition_cols (the vector
    index's list_id/q_bucket layout) keep their parquet files in
    SUBDIRECTORIES — the data check must walk recursively or maintenance
    silently no-ops on exactly the dirs that grow."""
    path = str(tmp_path / "sub")
    for e in range(4):
        epochdir.commit_epoch(
            _df(spark, [("a", float(e)), ("b", float(e))]),
            path, "epoch", e, partition_cols=("t",),
        )
    # every epoch's data is nested (epoch=N/t=*/...parquet)
    assert not any(
        n.endswith(".parquet")
        for n in os.listdir(epochdir.partition_dir(path, "epoch", 0))
    )
    r = epochdir.prune_state_epochs(path, "epoch", keep_last=1)
    assert r["pruned_epochs"] == 3
    vals = {r["val"] for r in spark.read.parquet(path).collect()}
    assert vals == {3.0}
    assert all(epochdir.epoch_committed(path, "epoch", e) for e in range(4))
