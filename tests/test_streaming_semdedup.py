"""StreamingSemDedup: frozen-codebook semantic dedup over a vector feed —
single-batch == batch keep-one, cross-batch witness drops, both
crash-replay interleavings, witness expiry, and a live StreamingQuery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import kmeans as KM
from db_integration_via_kafka_ksql_spark.streaming.semdedup import (
    StreamingSemDedup,
)

# frozen 2-cluster codebook in quantized space: the unit axes
CODEBOOK = [[1024, 0, 0, 0], [0, 1024, 0, 0]]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def _sem(spark, tmp_path, **kw):
    return StreamingSemDedup(
        spark,
        dataset_path=str(tmp_path / "corpus"),
        state_path=str(tmp_path / "state"),
        centroids=CODEBOOK,
        threshold_pct=95,
        **kw,
    )


def _ids(d):
    return sorted(r["vec_id"] for r in d.read_corpus().collect())


def test_single_batch_is_batch_keep_one(spark, tmp_path):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),  # cos vs #1 ~0.994 -> same group
        (3, [0.0, 1.0, 0.0, 0.0]),  # other cluster, distinct
    ]
    d = _sem(spark, tmp_path)
    d.process_batch(_df(spark, rows), 0)
    assert _ids(d) == [1, 3]  # min-id rep of the near-dup group + distinct


def test_cross_batch_witness_drops_later_arrival(spark, tmp_path):
    d = _sem(spark, tmp_path)
    d.process_batch(_df(spark, [(1, [1.0, 0.0, 0.0, 0.0])]), 0)
    d.process_batch(
        _df(
            spark,
            [
                (2, [0.95, 0.05, 0.0, 0.0]),  # near-dup of seen #1 -> drop
                (3, [0.0, 1.0, 0.0, 0.0]),  # novel direction -> keep
            ],
        ),
        1,
    )
    assert _ids(d) == [1, 3]


def test_dropped_vector_still_witnesses(spark, tmp_path):
    """#2 is dropped as a dup of #1, but #3 (a dup of #2, slightly
    further from #1) must still be dropped — witnesses persist for
    dropped vectors too."""
    d = _sem(spark, tmp_path)
    d.process_batch(_df(spark, [(1, [1.0, 0.0, 0.0, 0.0])]), 0)
    d.process_batch(_df(spark, [(2, [0.95, 0.05, 0.0, 0.0])]), 1)
    d.process_batch(_df(spark, [(3, [0.94, 0.06, 0.0, 0.0])]), 2)
    assert _ids(d) == [1]


def test_replay_interleavings_converge(spark, tmp_path):
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    d = _sem(spark, tmp_path)
    d.process_batch(_df(spark, rows), 5)
    first = _ids(d)
    assert first == [1, 2]

    d.state.destroy()  # crash before state update
    d.process_batch(_df(spark, rows), 5)  # replay
    assert _ids(d) == first

    d.process_batch(_df(spark, rows), 5)  # crash after state update: replay
    assert _ids(d) == first


def test_expire_witnesses_bounds_state_and_readmits(spark, tmp_path):
    d = _sem(spark, tmp_path)
    d.process_batch(_df(spark, [(1, [1.0, 0.0, 0.0, 0.0])]), 0)
    d.process_batch(_df(spark, [(2, [0.0, 1.0, 0.0, 0.0])]), 1)
    dropped = d.expire_witnesses(min_epoch=1)
    assert dropped == 1  # the epoch-0 witness
    # re-admission past the horizon: a dup of expired #1 now survives
    d.process_batch(_df(spark, [(9, [0.99, 0.01, 0.0, 0.0])]), 2)
    assert _ids(d) == [1, 2, 9]


def test_frozen_codebook_blocks_cross_cluster_pairs(spark, tmp_path):
    """The SemDeDup trade, asserted: two similar vectors assigned to
    DIFFERENT frozen clusters are never compared."""
    # 45-degree vector ties between clusters -> (dist2, cid) tie-break
    # puts it in cluster 0; a vector just past the bisector lands in 1
    d = _sem(spark, tmp_path)
    d.process_batch(_df(spark, [(1, [0.8, 0.79, 0.0, 0.0])]), 0)  # cluster 0
    d.process_batch(_df(spark, [(2, [0.79, 0.8, 0.0, 0.0])]), 1)  # cluster 1
    # cosine ~0.9999 but different blocks: both kept (documented recall trade)
    assert _ids(d) == [1, 2]
    asg = {r.vec_id: r.cluster for r in d.state.read().collect()}
    assert asg[1] == 0 and asg[2] == 1


def test_rejects_empty_codebook(spark, tmp_path):
    with pytest.raises(ValueError, match="non-empty"):
        StreamingSemDedup(
            spark,
            dataset_path=str(tmp_path / "c"),
            state_path=str(tmp_path / "s"),
            centroids=[],
        )


def test_codebook_from_kmeans_fit_composes(spark, tmp_path, sf_dir):
    """The documented workflow: fit the codebook offline on a bootstrap
    corpus, freeze it into the stream."""
    from db_integration_via_kafka_ksql_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = KM.kmeans_fit(emb, k=4, iters=1, seed=3)
    d = StreamingSemDedup(
        spark,
        dataset_path=str(tmp_path / "corpus"),
        state_path=str(tmp_path / "state"),
        centroids=cents,
        threshold_pct=40,
    )
    batch = emb.limit(50).select("vec_id", "embedding")
    d.process_batch(batch, 0)
    n = d.read_corpus().count()
    assert 0 < n <= 50
    assert d.state.read().count() == 50  # every arrival witnessed


def test_live_stream_end_to_end(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", IntegerType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    src = str(tmp_path / "in")
    os.makedirs(src)

    def drop(name, rows):
        ids, vecs = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int32()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                }
            ),
            f"{src}/{name}",
        )

    d = _sem(spark, tmp_path)
    d.checkpoint_dir = str(tmp_path / "ckpt")
    d.trigger_seconds = 0
    # f2 is dropped only after f1's batch is fully processed: the file
    # source orders same-mtime files arbitrarily, so pre-dropping both
    # would race the arrival order the assertion depends on
    drop("f1.parquet", [(1, [1.0, 0.0, 0.0, 0.0])])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = d.start(stream)
    try:
        q.processAllAvailable()
        drop(
            "f2.parquet",
            [(2, [0.97, 0.03, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0])],
        )
        q.processAllAvailable()
        q.processAllAvailable()  # idle trigger -> empty batch path
    finally:
        q.stop()
    assert _ids(d) == [1, 3]


def test_zero_norm_vectors_collapse_and_replay_idempotent(spark, tmp_path):
    """Zero-norm (all-zero) embeddings are degenerate: they are DEFINED
    as duplicates of each other, so (a) within a batch they collapse to
    the min-id zero vector, and (b) on a replay AFTER the state update
    every vector — zero or not — collides with its own witness and the
    epoch partition is left untouched (ADVICE r6: the old `qdot > 0`
    condition made zero vectors match nothing, including themselves, so
    a replayed epoch was overwritten with ONLY the zero vectors)."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero-norm
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero-norm dup of #2 -> dropped
    ]
    d = _sem(spark, tmp_path)
    d.process_batch(_df(spark, rows), 7)
    assert _ids(d) == [1, 2]
    # crash after state update: replay must not rewrite the partition
    d.process_batch(_df(spark, rows), 7)
    assert _ids(d) == [1, 2]
    # cross-batch: a later zero vector is dropped by the zero witness
    d.process_batch(_df(spark, [(9, [0.0, 0.0, 0.0, 0.0])]), 8)
    assert _ids(d) == [1, 2]
