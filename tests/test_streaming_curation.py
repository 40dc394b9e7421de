"""Streaming incremental curation: continuous ingest → cross-batch dedup
→ idempotent partitioned append (streaming/curation.py).

Scenarios mirror the CDC suite's stance: end-to-end through a live
StreamingQuery, plus direct process_batch calls for the two
crash-replay interleavings the idempotence argument covers, plus
batch-equivalence (the streaming result must be the batch curation of
the union, hash-for-hash).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from db_integration_via_kafka_ksql_spark.streaming.curation import StreamingCurator

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


def _write_docs(directory: str, rows, name: str) -> None:
    os.makedirs(directory, exist_ok=True)
    ids, sources, texts = zip(*rows)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(sources, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, f"{directory}/{name}")


@pytest.fixture
def curator(spark, tmp_path):
    return StreamingCurator(
        spark,
        dataset_path=str(tmp_path / "corpus"),
        state_path=str(tmp_path / "dedup_state"),
        min_quality=0.7,
        min_tokens=20,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=0,
    )


def _batch(spark, rows):
    return spark.createDataFrame(list(rows), SCHEMA)


def test_streaming_curation_end_to_end(spark, tmp_path, curator):
    """Three overlapping feeds through a live stream: each surviving text
    is accepted exactly once, junk is filtered, and the dataset lands in
    ingest_batch=*/source=* partitions."""
    src = str(tmp_path / "incoming")
    _write_docs(
        src,
        [(1, "web", GOOD + " one"), (2, "web", "junk junk junk junk junk")],
        "f1.parquet",
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = curator.start(stream)
    try:
        q.processAllAvailable()
        # second feed: one dup of doc 1, one new doc
        _write_docs(
            src,
            [(3, "web", GOOD + " one"), (4, "books", GOOD + " two")],
            "f2.parquet",
        )
        q.processAllAvailable()
        # third feed: dup of doc 4 plus a new one
        _write_docs(
            src,
            [(5, "books", GOOD + " two"), (6, "web", GOOD + " three")],
            "f3.parquet",
        )
        q.processAllAvailable()
    finally:
        q.stop()

    corpus = curator.read_corpus()
    rows = {r["doc_id"]: r for r in corpus.collect()}
    # first occurrence of each unique text won; junk never entered
    assert set(rows) == {1, 4, 6}
    assert corpus.count() == corpus.select("h").distinct().count()
    # hive layout: ingest_batch=*/source=*
    leaves = [
        os.path.relpath(d, curator.dataset_path)
        for d, _s, files in os.walk(curator.dataset_path)
        if any(f.endswith(".parquet") for f in files)
    ]
    assert leaves and all(
        leaf.startswith("ingest_batch=") and "/source=" in leaf for leaf in leaves
    )
    # partition-column filters prune (trainer read path)
    assert curator.read_corpus().filter(F.col("source") == "books").count() == 1


def test_replay_before_state_update_overwrites_own_partition(spark, curator):
    """Crash AFTER the dataset append, BEFORE the state update: the replay
    recomputes the same accepted set and dynamic-overwrites its own
    ingest_batch partitions — no duplicates."""
    batch = _batch(spark, [(1, "web", GOOD + " one"), (2, "books", GOOD + " two")])
    curator.process_batch(batch, 7)
    assert curator.read_corpus().count() == 2
    # simulate the crash: state as it was BEFORE batch 7 ran (empty),
    # dataset already holds batch 7's output
    curator.state.destroy()
    curator.process_batch(batch, 7)  # the replay
    corpus = curator.read_corpus()
    assert corpus.count() == 2
    assert {r["doc_id"] for r in corpus.collect()} == {1, 2}


def test_replay_after_state_update_appends_nothing(spark, curator):
    """Crash AFTER the state update (before the checkpoint commit): the
    replay's anti-join empties the batch; dynamic overwrite touches no
    partitions, so the earlier append stands untouched."""
    batch = _batch(spark, [(1, "web", GOOD + " one"), (2, "books", GOOD + " two")])
    curator.process_batch(batch, 7)
    before = sorted(r["doc_id"] for r in curator.read_corpus().collect())
    curator.process_batch(batch, 7)  # replay with state already updated
    after = sorted(r["doc_id"] for r in curator.read_corpus().collect())
    assert before == after == [1, 2]


def test_rebuild_state_from_dataset(spark, curator):
    """The dataset is the recovery log: a destroyed dedup state rebuilds
    from one corpus scan and keeps rejecting known hashes."""
    curator.process_batch(_batch(spark, [(1, "web", GOOD + " one")]), 1)
    curator.state.destroy()
    curator.rebuild_state()
    # same text, later batch: still a duplicate after the rebuild
    curator.process_batch(_batch(spark, [(9, "web", GOOD + " one")]), 2)
    assert [r["doc_id"] for r in curator.read_corpus().collect()] == [1]


def test_streaming_matches_batch_curation(spark, curator):
    """Hash-for-hash equivalence with the one-shot batch pass over the
    union of all feeds (the incremental pipeline must never accept a doc
    the batch pass rejects, or vice versa)."""
    feeds = [
        [(1, "web", GOOD + " a"), (2, "web", "junk junk junk junk junk")],
        [(3, "books", GOOD + " b"), (4, "web", GOOD + " a")],
        [(5, "web", GOOD + " c"), (6, "books", "x y z")],
    ]
    for i, rows in enumerate(feeds):
        curator.process_batch(_batch(spark, rows), i)
    union = _batch(spark, [r for rows in feeds for r in rows])
    batch_hashes = {
        r["h"] for r in curator.curate_batch(union).select("h").collect()
    }
    stream_hashes = {
        r["h"] for r in curator.read_corpus().select("h").collect()
    }
    assert stream_hashes == batch_hashes


def test_classifier_gate_filters_model_negative_docs(spark, tmp_path):
    """The learned-model serve path: weights trained offline
    (train_quality_perceptron) gate each micro-batch — a doc must score
    strictly positive under the fixed weight vector AND pass the
    heuristic filter. The gate is deterministic (literal integer
    weights), so replaying the same batch against the same pre-batch
    state accepts the identical set — the epochdir idempotence
    contract is unchanged."""
    from db_integration_via_kafka_ksql_spark.operators import classifier as C

    train = _batch(
        spark,
        [(i, "s", GOOD + f" tail{i}") for i in range(6)]
        + [(100 + i, "s", "the the the the the") for i in range(6)],
    )
    w = C.train_quality_perceptron(train, dim=64, epochs=3, threshold=0.7, min_tokens=20)
    cur = StreamingCurator(
        spark,
        dataset_path=str(tmp_path / "corpus"),
        state_path=str(tmp_path / "dedup_state"),
        min_quality=0.7,
        min_tokens=20,
        trigger_seconds=0,
        classifier_weights=w,
    )
    rows = [
        (1, "a", GOOD + " uniquely one"),
        (2, "a", "the the the the the"),  # model- and heuristic-negative
    ]
    # the model must actually separate the two classes on this corpus
    scored = {
        r["doc_id"]: r["pred"]
        for r in C.score_quality_perceptron(
            _batch(spark, rows).select("doc_id", "text"), w, min_tokens=20
        ).collect()
    }
    assert scored[1] == 1 and scored[2] == -1
    cur.process_batch(_batch(spark, rows), 0)
    got = [r["doc_id"] for r in cur.read_corpus().collect()]
    assert got == [1]
    # replay converges to the same accepted set (no duplicate partition)
    cur.process_batch(_batch(spark, rows), 0)
    assert [r["doc_id"] for r in cur.read_corpus().collect()] == [1]
