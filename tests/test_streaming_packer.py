"""StreamingPacker: cross-batch offset continuity, equivalence with the
batch packer under in-order arrival, straddling sequences, both
crash-replay interleavings, and a live StreamingQuery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
    pack_sequences,
)
from db_integration_via_kafka_ksql_spark.streaming.packer import StreamingPacker


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def _packer(spark, tmp_path, **kw):
    kw.setdefault("capacity", 8)
    return StreamingPacker(
        spark,
        dataset_path=str(tmp_path / "packed"),
        state_path=str(tmp_path / "state"),
        **kw,
    )


def _rows(p):
    return sorted(
        (
            (r.doc_id, r.source, r.n_tokens, r.start_offset, r.first_seq, r.last_seq)
            for r in p.read_packed().collect()
        )
    )


def _tok(n):
    return " ".join(f"w{i}" for i in range(n))


def test_offsets_continue_across_batches(spark, tmp_path):
    p = _packer(spark, tmp_path)
    p.process_batch(_df(spark, [(1, "a", _tok(5)), (2, "a", _tok(6))]), 0)
    p.process_batch(_df(spark, [(3, "a", _tok(4))]), 1)
    got = {r[0]: r for r in _rows(p)}
    assert got[1][3] == 0 and got[2][3] == 5
    assert got[3][3] == 11  # continues where batch 0 ended
    # capacity 8: doc 2 (tokens 5..10) straddles seqs 0 and 1
    assert (got[2][4], got[2][5]) == (0, 1)
    assert (got[3][4], got[3][5]) == (1, 1)
    st = {r.source: r.base_offset for r in p.read_state().collect()}
    assert st == {"a": 15}


def test_shards_pack_independently(spark, tmp_path):
    p = _packer(spark, tmp_path)
    p.process_batch(
        _df(spark, [(1, "a", _tok(7)), (2, "b", _tok(3))]), 0
    )
    p.process_batch(
        _df(spark, [(3, "a", _tok(2)), (4, "b", _tok(9))]), 1
    )
    got = {r[0]: r for r in _rows(p)}
    assert got[3][3] == 7  # shard a continues at 7
    assert got[4][3] == 3  # shard b continues at 3
    st = {r.source: r.base_offset for r in p.read_state().collect()}
    assert st == {"a": 9, "b": 12}


def test_in_order_stream_equals_batch_packer(spark, tmp_path):
    rows = [
        (i, "s" if i % 2 else "t", _tok(3 + (i * 7) % 11)) for i in range(20)
    ]
    p = _packer(spark, tmp_path)
    # ascending doc_id batches == the batch twin's global doc_id order
    p.process_batch(_df(spark, rows[:7]), 0)
    p.process_batch(_df(spark, rows[7:15]), 1)
    p.process_batch(_df(spark, rows[15:]), 2)
    batch = {
        (r.doc_id): (r.n_tokens, r.start_offset, r.first_seq, r.last_seq)
        for r in pack_sequences(
            _df(spark, rows), capacity=8, shard_cols=("source",)
        ).collect()
    }
    stream = {
        r[0]: (r[2], r[3], r[4], r[5]) for r in _rows(p)
    }
    assert stream == batch


def test_replay_interleavings_converge(spark, tmp_path):
    rows1 = [(1, "a", _tok(5))]
    rows2 = [(2, "a", _tok(6))]
    p = _packer(spark, tmp_path)
    p.process_batch(_df(spark, rows1), 0)
    p.process_batch(_df(spark, rows2), 1)
    want = _rows(p)

    # crash AFTER the state swap: replaying either epoch is a no-op
    p.process_batch(_df(spark, rows2), 1)
    p.process_batch(_df(spark, rows1), 0)
    assert _rows(p) == want
    assert {r.source: r.base_offset for r in p.read_state().collect()} == {"a": 11}

    # crash BEFORE the state swap: dataset partition written, state not
    # advanced — simulate by rolling the state back one epoch, replaying
    p2 = _packer(spark, tmp_path / "x")
    p2.process_batch(_df(spark, rows1), 0)
    first = _rows(p2)
    import shutil

    shutil.rmtree(p2.state_path)  # state swap "never happened"
    p2.process_batch(_df(spark, rows1), 0)  # replay recomputes identically
    assert _rows(p2) == first
    assert {r.source: r.base_offset for r in p2.read_state().collect()} == {"a": 5}


def test_rejects_bad_capacity(spark, tmp_path):
    with pytest.raises(ValueError, match="capacity"):
        _packer(spark, tmp_path, capacity=0)


def test_live_stream_end_to_end(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import StringType, IntegerType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", IntegerType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    src = str(tmp_path / "in")
    os.makedirs(src)

    def drop(name, rows):
        ids, srcs, txts = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int32()),
                    "source": pa.array(srcs),
                    "text": pa.array(txts),
                }
            ),
            f"{src}/{name}",
        )

    p = _packer(spark, tmp_path)
    p.checkpoint_dir = str(tmp_path / "ckpt")
    p.trigger_seconds = 0
    drop("f1.parquet", [(1, "a", _tok(5))])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = p.start(stream)
    try:
        q.processAllAvailable()
        drop("f2.parquet", [(2, "a", _tok(6))])
        q.processAllAvailable()
        q.processAllAvailable()  # idle empty batch path
    finally:
        q.stop()
    got = {r[0]: r for r in _rows(p)}
    assert got[1][3] == 0 and got[2][3] == 5


def test_null_shard_key_continues_across_batches(spark, tmp_path):
    """NULL shard values must behave like the batch twin (one group):
    null-safe state joins, continuous offsets, a single state row."""
    p = _packer(spark, tmp_path)
    rows1 = [(1, None, _tok(5))]
    rows2 = [(2, None, _tok(6))]
    p.process_batch(_df(spark, rows1), 0)
    p.process_batch(_df(spark, rows2), 1)
    got = {r[0]: r for r in _rows(p)}
    assert got[2][3] == 5  # continues, not reset to 0
    st = p.read_state().collect()
    assert len(st) == 1 and st[0].source is None and st[0].base_offset == 11


def test_start_requires_checkpoint_dir(spark, tmp_path):
    p = _packer(spark, tmp_path)  # checkpoint_dir defaults to None
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="checkpoint_dir"):
        p.start(stream)
