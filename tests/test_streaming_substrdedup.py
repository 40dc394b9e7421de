"""Incremental exact substring dedup (streaming/substrdedup.py).

THE gate is the prefix-equivalence identity the module docstring
states: the epoch-e output equals the BATCH operator
(duplicate_cut_spans) run over all docs of batches 0..e, restricted to
batch e's docs — boundaries AND n_runs. Plus: crash-replay idempotence
(both interleavings of the two epoch commits), hot-gram occ_cap
behavior across batches, idle batches, live-stream end-to-end, and the
checkpoint guard."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators import text_analysis as TA
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.substrdedup import (
    StreamingSubstringDedup,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

L = 6


def _tokens(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def _df(spark, docs):
    return spark.createDataFrame(list(docs), SCHEMA)


def _sd(spark, tmp_path, **kw):
    return StreamingSubstringDedup(
        spark,
        index_path=str(tmp_path / "gram_index"),
        output_path=str(tmp_path / "cut_spans"),
        min_tokens=L,
        trigger_seconds=0,
        **kw,
    )


def _expected_prefix(spark, prefix_docs, batch_docs, occ_cap=64):
    """duplicate_cut_spans over the prefix corpus, restricted to the
    arriving batch — the semantics contract."""
    ids = {d for d, _ in batch_docs}
    return sorted(
        tuple(r)
        for r in TA.duplicate_cut_spans(
            _df(spark, prefix_docs), min_tokens=L, occ_cap=occ_cap
        ).collect()
        if r["doc_id"] in ids
    )


def _epoch_rows(sd, epoch):
    return sorted(
        tuple(r)
        for r in sd.cut_spans()
        .filter(f"epoch = {epoch}")
        .select("doc_id", "start", "end", "n_runs")
        .collect()
    )


SHARED = _tokens("s", 20)
BATCH0 = [
    (0, " ".join(_tokens("a", 4) + SHARED)),          # introduces the block
    (1, " ".join(_tokens("b", 9))),                   # clean
]
BATCH1 = [
    (2, " ".join(_tokens("c", 7) + SHARED + _tokens("d", 3))),  # dups vs doc 0
    (3, " ".join(_tokens("e", 3) + _tokens("e", 3))),           # within-doc repeat
]
BATCH2 = [
    (4, " ".join(SHARED[5:15] + _tokens("f", 6))),    # partial overlap
]


def test_prefix_equivalence_per_epoch(spark, tmp_path):
    sd = _sd(spark, tmp_path)
    prefix = []
    for e, batch in enumerate([BATCH0, BATCH1, BATCH2]):
        prefix = prefix + batch
        sd.process_batch(_df(spark, batch), e)
        assert _epoch_rows(sd, e) == _expected_prefix(spark, prefix, batch), (
            f"epoch {e} diverged from the batch operator over the prefix"
        )
    # epoch 0: the block exists once -> no dups yet; epoch 1 cuts doc 2
    assert _epoch_rows(sd, 0) == []
    assert any(r[0] == 2 for r in _epoch_rows(sd, 1))
    # history is immutable: doc 0 (now a duplicate source) was never cut
    assert not any(
        r["doc_id"] == 0 for r in sd.cut_spans().select("doc_id").collect()
    )


def test_replay_both_crash_interleavings_converge(spark, tmp_path):
    sd = _sd(spark, tmp_path)
    sd.process_batch(_df(spark, BATCH0), 0)
    sd.process_batch(_df(spark, BATCH1), 1)
    want = _epoch_rows(sd, 1)
    # (a) crash AFTER both commits: replay is a pure skip
    sd.process_batch(_df(spark, BATCH1), 1)
    assert _epoch_rows(sd, 1) == want
    # (b) crash BETWEEN output and index commit: drop the index partition,
    # replay must recompute the identical output (skip) and re-land the index
    idx_part = epochdir.partition_dir(sd.index_path, sd.batch_col, 1)
    shutil.rmtree(idx_part)
    sd.process_batch(_df(spark, BATCH1), 1)
    assert os.path.isdir(idx_part)
    assert _epoch_rows(sd, 1) == want
    # the index is whole again: a THIRD batch still matches the contract
    prefix = BATCH0 + BATCH1 + BATCH2
    sd.process_batch(_df(spark, BATCH2), 2)
    assert _epoch_rows(sd, 2) == _expected_prefix(spark, prefix, BATCH2)


def test_occ_cap_applies_across_batches(spark, tmp_path):
    """A gram under the cap at arrival produces cuts; once the
    accumulated count exceeds occ_cap, later arrivals of the same
    boilerplate produce none — exactly the batch operator's behavior
    over the grown prefix."""
    boiler = _tokens("h", L)
    mk = lambda i: (i, " ".join([f"u{i}"] + boiler + [f"v{i}"]))
    sd = _sd(spark, tmp_path, occ_cap=3)
    prefix = []
    got_by_epoch = {}
    for e in range(5):
        batch = [mk(e)]
        prefix = prefix + batch
        sd.process_batch(_df(spark, batch), e)
        got_by_epoch[e] = _epoch_rows(sd, e)
        assert got_by_epoch[e] == _expected_prefix(
            spark, prefix, batch, occ_cap=3
        )
    assert got_by_epoch[0] == []            # first copy: nothing to match
    assert got_by_epoch[1] != []            # second copy: cut
    assert got_by_epoch[4] == []            # past the cap: boilerplate dropped


def test_idle_batch_commits_nothing(spark, tmp_path):
    sd = _sd(spark, tmp_path)
    sd.process_batch(_df(spark, []), 0)
    assert not os.path.isdir(sd.output_path)
    assert not os.path.isdir(sd.index_path)


def test_start_requires_checkpoint_dir(spark, tmp_path):
    sd = _sd(spark, tmp_path)
    with pytest.raises(ValueError, match="requires checkpoint_dir"):
        sd.start(None)


def test_live_stream_end_to_end(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.sources.changelog import (
        file_changelog_stream,
    )

    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)

    def write_feed(rows, name):
        ids, texts = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            f"{src}/{name}",
        )

    write_feed(BATCH0, "b0.parquet")
    sd = _sd(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = sd.start(file_changelog_stream(spark, src, SCHEMA))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not epochdir.epoch_committed(
            sd.index_path, sd.batch_col, 0
        ):
            time.sleep(0.5)
        write_feed(BATCH1, "b1.parquet")
        while time.time() < deadline and not any(
            r["doc_id"] == 2
            for r in (
                sd.cut_spans().select("doc_id").collect()
                if os.path.isdir(sd.output_path)
                else []
            )
        ):
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = sorted(
        tuple(r)
        for r in sd.cut_spans()
        .select("doc_id", "start", "end", "n_runs")
        .collect()
    )
    # each epoch against ITS OWN prefix: epoch 0 saw only BATCH0 (the
    # block was unique then — empty), epoch 1 saw both
    want = _expected_prefix(spark, BATCH0, BATCH0) + _expected_prefix(
        spark, BATCH0 + BATCH1, BATCH1
    )
    assert got == sorted(want) and any(r[0] == 2 for r in got)

def test_scheduled_maintenance_keeps_prefix_contract(spark, tmp_path):
    """r14: scheduled output/index compaction from inside process_batch.
    With compact_outputs on a cadence, the cumulative cut ledger equals
    the unscheduled twin's, the strictly-before gram read still sees
    every compacted gram (provenance collapses to an epoch < any future
    one), and the NEXT batch's prefix contract still holds."""
    from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
        MaintenancePolicy,
    )

    plain = _sd(spark, tmp_path / "plain")
    sd = _sd(
        spark, tmp_path / "maint",
        maintenance=MaintenancePolicy(
            every_n_epochs=2, compact_outputs=True, output_keep_last=1
        ),
    )
    prefix = []
    for e, batch in enumerate([BATCH0, BATCH1, BATCH2]):
        prefix = prefix + batch
        plain.process_batch(_df(spark, batch), e)
        sd.process_batch(_df(spark, batch), e)
        # the per-epoch semantics contract survives compaction ticks
        assert _epoch_rows(sd, e) == _expected_prefix(spark, prefix, batch)
    # cumulative ledgers identical (modulo epoch provenance, which
    # compaction collapses by contract)
    led = lambda s: sorted(  # noqa: E731
        tuple(r)
        for r in s.cut_spans().select("doc_id", "start", "end", "n_runs").collect()
    )
    assert led(sd) == led(plain)
    # compaction actually ran: fewer data-bearing index partitions
    def _data_epochs(p):
        return [
            ep
            for ep in epochdir.list_epochs(p, "epoch")
            if any(
                n.endswith(".parquet")
                for n in os.listdir(epochdir.partition_dir(p, "epoch", ep))
            )
        ]

    assert len(_data_epochs(str(tmp_path / "maint" / "gram_index"))) < len(
        _data_epochs(str(tmp_path / "plain" / "gram_index"))
    )
