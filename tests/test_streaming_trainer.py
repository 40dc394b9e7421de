"""Online averaged-perceptron training (streaming/trainer.py): batch-
sequence equivalence against the sequential python model, crash-replay
idempotence of the weight state, idle-trigger handling, live-stream
end-to-end, and the serve loop into StreamingCurator."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators import classifier as C
from db_integration_via_kafka_ksql_spark.streaming.trainer import (
    StreamingPerceptronTrainer,
)
from tests.test_classifier import py_features

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ]
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "to find some more interesting food in the next valley over the hill "
    "where many other animals live together in a peaceful way every day"
)

DIM = 64


def py_online(batches, dim, threshold, min_tokens):
    """Sequential reference: one synchronized update per batch, averaged."""
    w = [0] * (dim + 1)
    avg = [0] * (dim + 1)
    for rows in batches:
        feats = py_features(
            [(d, t) for d, _, t in rows], dim, threshold, min_tokens
        )
        upd = {}
        for y, f in feats.values():
            margin = sum(c * w[b] for b, c in f.items())
            if y * margin <= 0:
                for b, c in f.items():
                    upd[b] = upd.get(b, 0) + y * c
        for b, u in upd.items():
            w[b] += u
        for i in range(dim + 1):
            avg[i] += w[i]
    return avg


def _rows(i0, n, good=True):
    return [
        (
            i0 + i,
            "s",
            (GOOD + f" tail{i0 + i}") if good else "the the the the the",
        )
        for i in range(n)
    ]


def _batch(spark, rows):
    return spark.createDataFrame(list(rows), SCHEMA)


def _trainer(spark, tmp_path, **kw):
    return StreamingPerceptronTrainer(
        spark,
        weights_path=str(tmp_path / "weights"),
        dim=DIM,
        threshold=0.7,
        min_tokens=20,
        trigger_seconds=0,
        **kw,
    )


def test_batch_sequence_matches_python_model(spark, tmp_path):
    tr = _trainer(spark, tmp_path)
    batches = [
        _rows(0, 4) + _rows(100, 3, good=False),
        _rows(10, 3, good=False) + _rows(200, 2),
        _rows(20, 5),
    ]
    for e, rows in enumerate(batches):
        tr.process_batch(_batch(spark, rows), e)
    assert tr.weights() == py_online(batches, DIM, 0.7, 20)


def test_replayed_epoch_is_a_noop(spark, tmp_path):
    tr = _trainer(spark, tmp_path)
    b0, b1 = _rows(0, 4), _rows(10, 3, good=False)
    tr.process_batch(_batch(spark, b0), 0)
    tr.process_batch(_batch(spark, b1), 1)
    after = tr.weights()
    # crash between state write and checkpoint commit -> batch 1 replays
    tr.process_batch(_batch(spark, b1), 1)
    assert tr.weights() == after
    # a fresh trainer instance over the same state dir (restart) too
    tr2 = _trainer(spark, tmp_path)
    tr2.process_batch(_batch(spark, b1), 1)
    assert tr2.weights() == after == py_online([b0, b1], DIM, 0.7, 20)


def test_idle_trigger_advances_cursor_without_diluting_average(spark, tmp_path):
    tr = _trainer(spark, tmp_path)
    b0 = _rows(0, 4)
    tr.process_batch(_batch(spark, b0), 0)
    tr.process_batch(_batch(spark, []), 1)  # idle trigger
    assert tr.weights() == py_online([b0], DIM, 0.7, 20)
    assert tr._read_state()["epoch"] == 1  # cursor advanced
    assert tr._read_state()["n_updates"] == 1


def test_dim_mismatch_on_stored_state_raises(spark, tmp_path):
    tr = _trainer(spark, tmp_path)
    tr.process_batch(_batch(spark, _rows(0, 3)), 0)
    import pytest

    wrong = StreamingPerceptronTrainer(
        spark, weights_path=str(tmp_path / "weights"), dim=DIM * 2,
        threshold=0.7, min_tokens=20, trigger_seconds=0,
    )
    with pytest.raises(ValueError, match="stored weights have dim"):
        wrong.weights()


def test_live_stream_trains_and_serves_curator_gate(spark, tmp_path):
    """End-to-end loop: a file stream trains the model through a real
    checkpointed query; the refreshed averaged weights then gate a
    curation batch (model-negative doc filtered)."""
    from db_integration_via_kafka_ksql_spark.sources.changelog import (
        file_changelog_stream,
    )
    from db_integration_via_kafka_ksql_spark.streaming.curation import (
        StreamingCurator,
    )

    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)

    def write_feed(rows, name):
        ids, sources, texts = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "source": pa.array(sources, pa.string()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            f"{src}/{name}",
        )

    write_feed(_rows(0, 5) + _rows(100, 5, good=False), "b0.parquet")
    tr = _trainer(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = tr.start(file_changelog_stream(spark, src, SCHEMA))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and tr._read_state()["n_updates"] < 1:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    w = tr.weights()
    assert tr._read_state()["n_updates"] >= 1 and any(w)
    scored = {
        r["doc_id"]: r["pred"]
        for r in C.score_quality_perceptron(
            _batch(
                spark,
                [(1, "a", GOOD + " unseen one"), (2, "a", "the the the the the")],
            ).select("doc_id", "text"),
            w,
            min_tokens=20,
        ).collect()
    }
    assert scored[1] == 1 and scored[2] == -1
    cur = StreamingCurator(
        spark,
        dataset_path=str(tmp_path / "corpus"),
        state_path=str(tmp_path / "dedup_state"),
        min_quality=0.7,
        min_tokens=20,
        trigger_seconds=0,
        classifier_weights=w,
    )
    cur.process_batch(
        _batch(
            spark,
            [(1, "a", GOOD + " unseen one"), (2, "a", "the the the the the")],
        ),
        0,
    )
    assert [r["doc_id"] for r in cur.read_corpus().collect()] == [1]
