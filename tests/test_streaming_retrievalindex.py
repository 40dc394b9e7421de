"""Incremental inverted index (streaming/retrievalindex.py): per-epoch
serve == batch BM25 over the arrived prefix, replay safety, idle epochs,
and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators import retrieval as R
from db_integration_via_kafka_ksql_spark.streaming.retrievalindex import (
    StreamingPostings,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

BATCHES = [
    [(0, "hash join hash join scan"), (1, "stream window agg window")],
    [(2, "hash scan sort"), (3, "vector sort the fast sort")],
    [(4, "join stream join")],
]
QUERIES = [(0, "hash join"), (1, "sort stream")]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, **kw):
    return StreamingPostings(
        spark, index_path=str(tmp_path / "idx"), trigger_seconds=0, **kw
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_serve_matches_batch_bm25_per_epoch(spark, tmp_path):
    st = _st(spark, tmp_path)
    prefix: list = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix += rows
        want = R.bm25_topk(spark, _df(spark, prefix), QUERIES, top_k=10)
        assert _rows(st.serve(QUERIES, top_k=10)) == _rows(want), f"epoch {e}"
        # the index is exactly the batch postings over the prefix
        assert _rows(st.index()) == _rows(R.postings(_df(spark, prefix)))


def test_replay_skips_committed_epoch(spark, tmp_path):
    st = _st(spark, tmp_path)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    before = _rows(st.index())
    st.process_batch(_df(spark, BATCHES[0]), 0)  # replay: no duplication
    assert _rows(st.index()) == before
    # half-committed epoch (partition removed) recommits identically
    shutil.rmtree(str(tmp_path / "idx" / "epoch=0"))
    st.process_batch(_df(spark, BATCHES[0]), 0)
    assert _rows(st.index()) == before
    # fresh instance serves the same index
    st2 = _st(spark, tmp_path)
    assert _rows(st2.index()) == before


def test_idle_epoch_and_empty_index(spark, tmp_path):
    st = _st(spark, tmp_path)
    assert st.index().count() == 0  # pre-ingest serve surface exists
    # idle triggers commit NOTHING (the SCD2 ADVICE discipline): a quiet
    # stream must not grow one empty epoch dir per 2 s trigger
    st.process_batch(_df(spark, []), 0)
    assert not os.path.isdir(str(tmp_path / "idx" / "epoch=0"))
    st.process_batch(_df(spark, []), 0)  # idle replay: still nothing
    st.process_batch(_df(spark, BATCHES[0]), 1)
    assert st.index().count() == R.postings(_df(spark, BATCHES[0])).count()


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        _st(spark, tmp_path).start(
            spark.readStream.schema(SCHEMA).parquet(src)
        )


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[0]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        ),
        f"{src}/b0.parquet",
    )
    st = _st(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = st.start(spark.readStream.schema(SCHEMA).parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if os.path.isdir(str(tmp_path / "idx" / "epoch=0")):
                break
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    want = R.bm25_topk(spark, _df(spark, rows), QUERIES, top_k=10)
    assert _rows(st.serve(QUERIES, top_k=10)) == _rows(want)


def test_epoch_compaction_preserves_index_and_serve(spark, tmp_path):
    """compact_epochs composition: merging the per-trigger postings
    partitions (the small-files maintenance a long-running index stream
    needs) must change neither the cumulative index nor a single served
    score — and a checkpoint replay of a compacted epoch stays a no-op."""
    from db_integration_via_kafka_ksql_spark.streaming import epochdir

    st = _st(spark, tmp_path)
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
    idx_before = _rows(st.index())
    serve_before = _rows(st.serve(QUERIES, top_k=10))
    epochdir.compact_epochs(spark, str(tmp_path / "idx"), "epoch", upto=1)
    assert _rows(st.index()) == idx_before
    assert _rows(st.serve(QUERIES, top_k=10)) == serve_before
    # replay of a compacted (now file-less but committed) epoch: no-op
    st.process_batch(_df(spark, BATCHES[0]), 0)
    assert _rows(st.index()) == idx_before


def test_streaming_hybrid_rrf_serve_matches_batch(spark, tmp_path):
    """Composition: the incremental index's BM25 list fused with a dense
    ranked list through rrf_fuse equals the same fusion over a batch
    index of the arrived prefix — the streaming half of hybrid serving
    (the dense list is ranker-agnostic: RRF only consumes ranks, so a
    fixed external ANN list stands in)."""
    st = _st(spark, tmp_path)
    # an external dense ranked list (query_id, doc_id, rnk), as an ANN
    # stage would emit it
    dense = spark.createDataFrame(
        [(0, 2, 1), (0, 0, 2), (1, 3, 1), (1, 4, 2)],
        "query_id int, doc_id long, rnk int",
    )
    prefix: list = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix += rows
        lex_stream = st.serve(QUERIES, top_k=10).select(
            "query_id", "doc_id", "rnk"
        )
        lex_batch = R.bm25_topk(
            spark, _df(spark, prefix), QUERIES, top_k=10
        ).select("query_id", "doc_id", "rnk")
        got = _rows(R.rrf_fuse([lex_stream, dense], top_k=5))
        want = _rows(R.rrf_fuse([lex_batch, dense], top_k=5))
        assert got == want, f"epoch {e}"
        # fused output carries contributions from BOTH rankers
        assert any(t[3] == 2 for t in got)


def test_serve_keyphrases_prefix_contract(spark, tmp_path):
    """Per epoch, the streamed index's TF-IDF tags equal the batch
    operator over the arrived prefix — including the corpus-aware df
    effect where a later epoch's near-duplicate demotes terms of docs
    tagged in EARLIER epochs (a per-batch tagger cannot do this)."""
    from db_integration_via_kafka_ksql_spark.operators.retrieval import (
        tfidf_keyphrases,
    )

    st = _st(spark, tmp_path)
    prefix: list = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix = prefix + rows
        got = sorted(
            tuple(r) for r in st.serve_keyphrases(top_k=3, min_df=1).collect()
        )
        want = sorted(
            tuple(r)
            for r in tfidf_keyphrases(
                _df(spark, prefix), top_k=3, min_df=1
            ).collect()
        )
        assert got == want, f"epoch {e}"


def test_scheduled_maintenance_bounds_index_partitions(spark, tmp_path):
    """r14: the compaction primitive now has a SCHEDULE — with a
    MaintenancePolicy(compact_outputs=True) the per-trigger partitions
    are merged on cadence from inside process_batch, the cumulative
    index and every served score stay identical, and replays of
    compacted epochs stay no-ops."""
    from db_integration_via_kafka_ksql_spark.streaming import epochdir
    from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
        MaintenancePolicy,
    )

    plain = _st(spark, tmp_path / "plain")
    st = _st(
        spark, tmp_path / "maint",
        maintenance=MaintenancePolicy(
            every_n_epochs=4, compact_outputs=True, output_keep_last=2
        ),
    )
    batches = [
        [(10 * e, f"hash join epoch{e} scan"), (10 * e + 1, f"sort window epoch{e}")]
        for e in range(9)
    ]
    for e, rows in enumerate(batches):
        plain.process_batch(_df(spark, rows), e)
        st.process_batch(_df(spark, rows), e)

    def _data_epochs(p):
        return [
            ep
            for ep in epochdir.list_epochs(p, "epoch")
            if any(
                n.endswith(".parquet")
                for n in os.listdir(epochdir.partition_dir(p, "epoch", ep))
            )
        ]

    # the scheduled stage is bounded; the unscheduled one grew one
    # data-bearing partition per busy trigger
    assert len(_data_epochs(str(tmp_path / "plain" / "idx"))) == 9
    assert len(_data_epochs(str(tmp_path / "maint" / "idx"))) <= 2 + 4
    # identical index and serve results
    assert _rows(st.index()) == _rows(plain.index())
    q = [(0, "hash join"), (1, "sort window")]
    assert _rows(st.serve(q, top_k=10)) == _rows(plain.serve(q, top_k=10))
    # replay of a compacted epoch stays a no-op
    before = _rows(st.index())
    st.process_batch(_df(spark, batches[0]), 0)
    assert _rows(st.index()) == before
