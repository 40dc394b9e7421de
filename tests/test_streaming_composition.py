"""Composition-level exactly-once for chained streaming stages
(curator → packer, where the curated dataset is simultaneously stage 1's
sink and stage 2's file-stream source).

Round 6 documented this composition as at-least-once across one crash
window: a stage-1 crash between its dataset write and its state update
replayed into a dynamic-overwrite rewrite with FRESH part-file names,
which a file-name-tracking downstream source re-ingested. The
`streaming/epochdir` name-stable atomic partition commit closes it:
these tests kill stage 1 in exactly that window and assert the packer
ingests no duplicate rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.curation import StreamingCurator
from db_integration_via_kafka_ksql_spark.streaming.packer import StreamingPacker

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "to find some more interesting food in the next valley over the hill"
)


def _batch(spark, rows):
    return spark.createDataFrame(
        list(rows), "doc_id bigint, source string, text string"
    )


def _files_of(dataset_path):
    out = set()
    for d, _s, files in os.walk(dataset_path):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(d, f), dataset_path))
    return out


@pytest.fixture
def stages(spark, tmp_path):
    curator = StreamingCurator(
        spark,
        dataset_path=str(tmp_path / "curated"),
        state_path=str(tmp_path / "curation_state"),
        min_quality=0.2,
        min_tokens=8,
        checkpoint_dir=str(tmp_path / "ckpt_curate"),
        trigger_seconds=0,
    )
    packer = StreamingPacker(
        spark,
        dataset_path=str(tmp_path / "packed"),
        state_path=str(tmp_path / "packing_state"),
        capacity=64,
        checkpoint_dir=str(tmp_path / "ckpt_pack"),
        trigger_seconds=0,
    )
    return curator, packer


def _pack_available(spark, curator, packer):
    """Run the packer over whatever the curated dataset holds right now
    (one live micro-stream pass, then stop)."""
    curated = spark.readStream.schema(curator.read_corpus().schema).parquet(
        curator.dataset_path
    )
    q = packer.start(curated.select("doc_id", "source", "text"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stage1_crash_between_write_and_state_no_downstream_dupes(
    spark, tmp_path, stages
):
    """Kill stage 1 BETWEEN its dataset publish and its state update
    (the round-6 at-least-once window); the downstream packer must
    ingest each curated row exactly once across the crash + replay."""
    curator, packer = stages
    b0 = [(1, "web", GOOD + " one"), (2, "books", GOOD + " two")]
    b1 = [(3, "web", GOOD + " three"), (4, "books", GOOD + " four")]

    curator.process_batch(_batch(spark, b0), 0)
    _pack_available(spark, curator, packer)
    assert packer.read_packed().count() == 2

    # stage-1 crash: partition published, state update never happens
    orig_apply = curator.state.apply_batch

    def crash(df):
        raise RuntimeError("injected crash before state update")

    curator.state.apply_batch = crash
    with pytest.raises(RuntimeError, match="injected crash"):
        curator.process_batch(_batch(spark, b1), 1)
    curator.state.apply_batch = orig_apply
    assert epochdir.epoch_committed(curator.dataset_path, "ingest_batch", 1)

    # downstream runs while stage 1 is down — it SEES the committed epoch
    _pack_available(spark, curator, packer)
    assert packer.read_packed().count() == 4
    files_before = _files_of(curator.dataset_path)

    # stage-1 replay of the same epoch (checkpoint re-delivers batch 1):
    # the partition is already committed — file names must NOT change
    curator.process_batch(_batch(spark, b1), 1)
    assert _files_of(curator.dataset_path) == files_before

    # downstream re-lists: nothing new to ingest, no duplicates
    _pack_available(spark, curator, packer)
    packed = packer.read_packed()
    assert packed.count() == 4
    assert packed.select("doc_id").distinct().count() == 4
    # offsets are a consistent gapless packing: per shard, the state's
    # base offset equals the sum of packed token counts
    state = {
        r.source: r.base_offset for r in packer.read_state().collect()
    }
    sums = {
        r.source: r.total
        for r in packed.groupBy("source")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    assert state == sums
    # and stage 1's state catch-up happened on the replay: a later
    # duplicate of batch-1 text is still rejected
    curator.process_batch(
        _batch(spark, [(9, "web", GOOD + " three")]), 2
    )
    corpus_ids = sorted(
        r.doc_id for r in curator.read_corpus().select("doc_id").collect()
    )
    assert corpus_ids == [1, 2, 3, 4]


def test_stage1_crash_mid_staging_publishes_nothing_downstream(
    spark, tmp_path, stages
):
    """A crash DURING the staging write leaves only an orphan staging
    dir: the dataset (and thus the downstream source) sees nothing; the
    replay commits once and the orphan is swept."""
    curator, packer = stages
    curator.process_batch(
        _batch(spark, [(1, "web", GOOD + " one")]), 0
    )
    # emulate a mid-staging crash artifact
    orphan = f"{curator.dataset_path}__epoch_staging_deadbeef"
    os.makedirs(orphan)
    b1 = [(2, "books", GOOD + " two")]
    curator.process_batch(_batch(spark, b1), 1)
    assert not os.path.isdir(orphan)  # swept by the successful commit
    _pack_available(spark, curator, packer)
    packed = packer.read_packed()
    assert packed.count() == 2
    assert packed.select("doc_id").distinct().count() == 2


def test_every_epochdir_stage_refuses_checkpointless_start(spark, tmp_path):
    """The epochdir skip-if-committed guard is only sound when Spark's
    batch numbering survives restarts: a checkpoint-less restart would
    renumber epochs from 0, silently skip the 'already committed'
    partitions, and still advance the state — permanent data loss. Every
    stage's start() must refuse (round-7 review finding: only the packer
    enforced the contract its own module documented)."""
    from db_integration_via_kafka_ksql_spark.streaming.neardup import (
        StreamingNearDup,
    )
    from db_integration_via_kafka_ksql_spark.streaming.semdedup import (
        StreamingSemDedup,
    )
    from db_integration_via_kafka_ksql_spark.streaming.substrdedup import (
        StreamingSubstringDedup,
    )
    from db_integration_via_kafka_ksql_spark.streaming.trainer import (
        StreamingPerceptronTrainer,
    )
    from db_integration_via_kafka_ksql_spark.streaming.kmeans import (
        StreamingKMeans,
    )

    stream = spark.readStream.format("rate").load()  # never started
    stages = [
        StreamingCurator(
            spark,
            dataset_path=str(tmp_path / "c1"),
            state_path=str(tmp_path / "s1"),
        ),
        StreamingNearDup(
            spark,
            dataset_path=str(tmp_path / "c2"),
            state_path=str(tmp_path / "s2"),
        ),
        StreamingSemDedup(
            spark,
            dataset_path=str(tmp_path / "c3"),
            state_path=str(tmp_path / "s3"),
            centroids=[[1024, 0], [0, 1024]],
        ),
        StreamingPacker(
            spark,
            dataset_path=str(tmp_path / "c4"),
            state_path=str(tmp_path / "s4"),
        ),
        StreamingSubstringDedup(
            spark,
            index_path=str(tmp_path / "c5"),
            output_path=str(tmp_path / "s5"),
        ),
        StreamingPerceptronTrainer(
            spark,
            weights_path=str(tmp_path / "c6"),
        ),
        StreamingKMeans(
            spark,
            state_path=str(tmp_path / "c7"),
            initial_centroids=[[0, 0], [1024, 1024]],
        ),
    ]
    for stage in stages:
        assert stage.checkpoint_dir is None  # the dataclass default
        with pytest.raises(ValueError, match="requires checkpoint_dir"):
            stage.start(stream)


def test_curator_crash_window_never_dupes_substring_index(
    spark, tmp_path, stages
):
    """Composition: the curated dataset is simultaneously the curator's
    sink and the substring-dedup stage's file-stream source. Kill the
    curator in the round-6 at-least-once window (partition published,
    state update lost); if the replay re-published the epoch under fresh
    part-file names, the downstream would ingest every doc's grams TWICE
    — doubling each gram count and cutting unique docs as duplicates of
    themselves. Exactly-once means: unique texts yield ZERO cut spans
    across the crash + replay."""
    from db_integration_via_kafka_ksql_spark.streaming.substrdedup import (
        StreamingSubstringDedup,
    )

    curator, _ = stages
    sd = StreamingSubstringDedup(
        spark,
        index_path=str(tmp_path / "gram_index"),
        output_path=str(tmp_path / "cut_spans"),
        min_tokens=6,
        checkpoint_dir=str(tmp_path / "ckpt_sd"),
        trigger_seconds=0,
    )
    b0 = [(1, "web", GOOD + " uniquely one"), (2, "books", GOOD + " two")]
    orig_apply = curator.state.apply_batch

    def crash(df):
        raise RuntimeError("injected crash before state update")

    curator.state.apply_batch = crash
    with pytest.raises(RuntimeError):
        curator.process_batch(_batch(spark, b0), 0)
    curator.state.apply_batch = orig_apply
    curator.process_batch(_batch(spark, b0), 0)  # replay

    curated = spark.readStream.schema(curator.read_corpus().schema).parquet(
        curator.dataset_path
    )
    q = sd.start(curated.select("doc_id", "text"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # each doc's grams indexed exactly once...
    idx = spark.read.parquet(sd.index_path)
    assert idx.count() == idx.select("doc_id", "pos").distinct().count()
    # ...so the GOOD prefix shared by both docs cuts BOTH (a real cross-doc
    # duplicate), but neither doc is ever matched against a ghost copy of
    # itself: each cut is EXACTLY the shared prefix — a doubled index
    # would extend the interval over the doc's unique tail.
    prefix_len = len(GOOD.split(" "))
    cuts = sd.cut_spans().select("doc_id", "start", "end").collect()
    assert {r["doc_id"] for r in cuts} == {1, 2}
    for r in cuts:
        assert (r["start"], r["end"]) == (0, prefix_len)


def test_epochdir_rejects_scheme_qualified_paths(spark):
    """The publish/skip protocol is driver-local os.rename/isdir; on an
    hdfs:// or s3a:// URI epoch_committed would be False forever and the
    rename would crash after the staging write — so both entry points
    reject URIs up front (ADVICE r7)."""
    df = spark.range(1)
    for uri in ("hdfs://nn/data/corpus", "s3a://bucket/corpus"):
        with pytest.raises(ValueError, match="driver-local POSIX path"):
            epochdir.commit_epoch(df, uri, "ingest_batch", 0)
        with pytest.raises(ValueError, match="driver-local POSIX path"):
            epochdir.epoch_committed(uri, "ingest_batch", 0)
