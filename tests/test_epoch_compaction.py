"""compact_epochs (streaming/epochdir.py): row-identity, marker
preservation (replay still skips), crash-resume via the intent file,
idempotent re-runs, and composition with a live epoch producer."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.streaming import epochdir


def _publish(spark, path, epochs):
    for e, rows in epochs.items():
        df = spark.createDataFrame(rows, "k long, v string")
        epochdir.commit_epoch(df, path, "epoch", e)


def _all_rows(spark, path):
    return sorted(
        map(tuple, spark.read.parquet(path).select("k", "v").collect())
    )


EPOCHS = {
    0: [(1, "a"), (2, "b")],
    1: [(3, "c")],
    2: [],                      # empty committed epoch
    3: [(4, "d"), (5, "e")],
    4: [(6, "f")],
}


def test_compaction_preserves_rows_and_markers(spark, tmp_path):
    path = str(tmp_path / "ds")
    _publish(spark, path, EPOCHS)
    before = _all_rows(spark, path)
    stats = epochdir.compact_epochs(spark, path, "epoch", upto=3)
    # epochs 0..3 all carry part files (an empty commit still writes a
    # 0-row parquet — compaction sweeps those too); 5 real rows survive
    assert stats == {"compacted_epochs": 4, "rows": 5}
    assert _all_rows(spark, path) == before
    # every epoch <= 3 still reads as committed (replay stays a no-op)
    for e in range(4):
        assert epochdir.epoch_committed(path, "epoch", e)
    # old epochs hold no data files; epoch 4 is untouched
    for e in (0, 1):
        d = epochdir.partition_dir(path, "epoch", e)
        assert all(n == "_SUCCESS" for n in os.listdir(d))
    # a replayed commit of a compacted epoch is skipped, not rewritten
    df = spark.createDataFrame([(9, "X")], "k long, v string")
    assert epochdir.commit_epoch(df, path, "epoch", 1) is False
    assert _all_rows(spark, path) == before


def test_compaction_is_idempotent_and_appends_continue(spark, tmp_path):
    path = str(tmp_path / "ds")
    _publish(spark, path, EPOCHS)
    epochdir.compact_epochs(spark, path, "epoch", upto=3)
    again = epochdir.compact_epochs(spark, path, "epoch", upto=3)
    assert again == {"compacted_epochs": 0, "rows": 0}
    # later epochs keep appending; a wider compaction folds them in
    _publish(spark, path, {5: [(7, "g")]})
    stats = epochdir.compact_epochs(spark, path, "epoch", upto=10)
    assert stats["compacted_epochs"] == 3  # merged 3, 4, 5
    assert len(_all_rows(spark, path)) == 7


def test_crash_resume_via_intent(spark, tmp_path, monkeypatch):
    """Crash at the first post-intent rename: the intent file is durable,
    so the NEXT compact call completes the interrupted run before doing
    anything else, and no row is lost or duplicated."""
    path = str(tmp_path / "ds")
    _publish(spark, path, EPOCHS)
    before = _all_rows(spark, path)
    real_rename = os.rename
    calls = {"n": 0}

    def crashy(a, b):
        # let the staging parquet write's internal renames through; crash
        # on the first COMPACTION rename (staging/trash moves are siblings
        # of the dataset dir containing the marker)
        if "__compact_" in a or "__compact_" in b:
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("simulated crash during compaction publish")
        return real_rename(a, b)

    monkeypatch.setattr(os, "rename", crashy)
    with pytest.raises(OSError, match="simulated crash"):
        epochdir.compact_epochs(spark, path, "epoch", upto=3)
    monkeypatch.setattr(os, "rename", real_rename)
    assert os.path.isfile(os.path.join(path, "_compact_intent.json"))
    stats = epochdir.compact_epochs(spark, path, "epoch", upto=3)
    assert _all_rows(spark, path) == before
    assert not os.path.isfile(os.path.join(path, "_compact_intent.json"))
    for e in range(4):
        assert epochdir.epoch_committed(path, "epoch", e)


def test_single_data_epoch_is_noop(spark, tmp_path):
    path = str(tmp_path / "ds")
    _publish(spark, path, {0: [(1, "a")]})
    assert epochdir.compact_epochs(spark, path, "epoch", upto=5) == {
        "compacted_epochs": 0, "rows": 0,
    }
    assert _all_rows(spark, path) == [(1, "a")]


def test_compaction_composes_with_streaming_transitions(spark, tmp_path):
    """Compact a REAL streaming stage's output mid-stream: the cumulative
    matrix is identical before and after, later epochs keep appending,
    and a crash-replay of a compacted epoch stays a no-op."""
    from db_integration_via_kafka_ksql_spark.streaming.transitions import (
        StreamingTransitions,
    )

    st = StreamingTransitions(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
    )
    schema = "user_id long, event_id long, event_type string, us long"
    batches = [
        [(1, 1, "view", 10), (1, 2, "click", 20)],
        [(1, 3, "buy", 30), (2, 4, "view", 5)],
        [(2, 5, "click", 15)],
    ]
    for e, rows in enumerate(batches):
        st.process_batch(spark.createDataFrame(rows, schema), e)
    before = {
        (r["from_type"], r["to_type"]): r["n"] for r in st.matrix().collect()
    }
    stats = epochdir.compact_epochs(
        spark, str(tmp_path / "out"), "epoch", upto=1
    )
    assert stats["compacted_epochs"] == 2
    after = {
        (r["from_type"], r["to_type"]): r["n"] for r in st.matrix().collect()
    }
    assert after == before
    # a replay of a compacted epoch is skipped (the marker survived)
    st.process_batch(spark.createDataFrame(batches[0], schema), 0)
    assert {
        (r["from_type"], r["to_type"]): r["n"] for r in st.matrix().collect()
    } == before
    # the stream keeps going
    st.process_batch(
        spark.createDataFrame([(1, 6, "view", 40)], schema), 3
    )
    final = {
        (r["from_type"], r["to_type"]): r["n"] for r in st.matrix().collect()
    }
    assert final[("buy", "view")] == 1
