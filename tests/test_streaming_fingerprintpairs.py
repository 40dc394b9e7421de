"""Streaming fingerprint pair emitter (streaming/fingerprintpairs.py):
the exact-once prefix contract vs the batch banded hamming join, both
crash interleavings, replay no-ops, idle epochs, witness TTL, and a
live stream — over the audio energy fingerprint."""

from __future__ import annotations

import os
import struct
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import multimodal as M
from db_integration_via_kafka_ksql_spark.streaming.fingerprintpairs import (
    StreamingFingerprintPairs,
)

HAM = 3


def _wave(shape_seed: int, n: int = 520, scale: int = 10) -> bytes:
    xs = [
        int(150 * scale * (1 + ((t // 40 + shape_seed * (t // 160)) % 5)))
        * (1 if t % 2 else -1)
        for t in range(n)
    ]
    return b"".join(struct.pack("<h", max(-32768, min(32767, x))) for x in xs)


# doc_id -> payload: 1/2 share a contour (amplitude variants), 3 shares
# with both at a different scale, 4/5 unrelated contours, 6 empty
DOCS = {
    1: _wave(0, scale=10),
    2: _wave(0, scale=9),
    3: _wave(0, n=1040, scale=10),   # same contour, different length
    4: _wave(3, scale=10),
    5: _wave(5, scale=8),
    6: b"",
}
BATCHES = [[1, 4], [2, 6], [3, 5]]


def _fingerprint(df):
    return M.audio_energy_fingerprint(df).filter(F.col("n_samples") > 0)


def _df(spark, ids):
    return spark.createDataFrame(
        [(i, DOCS[i]) for i in ids], "doc_id long, payload binary"
    )


def _sp(spark, tmp_path, **kw):
    kw.setdefault("max_hamming", HAM)
    return StreamingFingerprintPairs(
        spark,
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        fingerprint=_fingerprint,
        n_state_buckets=4,
        trigger_seconds=0,
        **kw,
    )


def _batch_pairs(spark, ids):
    return {
        tuple(r)
        for r in M.audio_neardup_pairs(_df(spark, ids), max_hamming=HAM)
        .collect()
    }


def _got(sp):
    return [tuple(r) for r in sp.pairs().collect()]


def test_prefix_contract_exact_once(spark, tmp_path):
    """Union of epoch outputs == batch pairs over the prefix, each pair
    exactly once, at every epoch boundary."""
    sp = _sp(spark, tmp_path)
    seen: list[int] = []
    for e, ids in enumerate(BATCHES):
        sp.process_batch(_df(spark, ids), e)
        seen += ids
        got = _got(sp)
        assert len(got) == len(set(got)), "pair emitted twice"
        assert set(got) == _batch_pairs(spark, seen), f"epoch {e}"
    # sanity: the fixture really produces cross-batch pairs
    assert any(
        {a, b} == {1, 2} for a, b, _ in _got(sp)
    ), "amplitude twins should pair across batches"


def test_replay_is_noop(spark, tmp_path):
    sp = _sp(spark, tmp_path)
    sp.process_batch(_df(spark, BATCHES[0]), 0)
    sp.process_batch(_df(spark, BATCHES[1]), 1)
    snap = sorted(_got(sp))
    sp.process_batch(_df(spark, BATCHES[1]), 1)  # full replay
    assert sorted(_got(sp)) == snap
    sp2 = _sp(spark, tmp_path)  # restart continues the prefix
    sp2.process_batch(_df(spark, BATCHES[2]), 2)
    assert set(_got(sp2)) == _batch_pairs(
        spark, [i for b in BATCHES for i in b]
    )


def test_crash_between_output_and_state_converges(spark, tmp_path, monkeypatch):
    """Crash AFTER the output epoch commit but BEFORE the witness upsert:
    the replay must re-apply only the state (idempotent) and later
    epochs still see every witness — no pair lost, none duplicated."""
    sp = _sp(spark, tmp_path)
    sp.process_batch(_df(spark, BATCHES[0]), 0)

    real_apply = sp._store.apply_batch
    calls = {"n": 0}

    def crashing_apply(rows):
        calls["n"] += 1
        raise RuntimeError("simulated crash before witness upsert")

    monkeypatch.setattr(sp._store, "apply_batch", crashing_apply)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sp.process_batch(_df(spark, BATCHES[1]), 1)
    monkeypatch.setattr(sp._store, "apply_batch", real_apply)
    sp.process_batch(_df(spark, BATCHES[1]), 1)  # replay: output skipped
    sp.process_batch(_df(spark, BATCHES[2]), 2)
    got = _got(sp)
    assert len(got) == len(set(got))
    assert set(got) == _batch_pairs(spark, [i for b in BATCHES for i in b])


def test_idle_epoch_commits_nothing(spark, tmp_path):
    sp = _sp(spark, tmp_path)
    sp.process_batch(_df(spark, BATCHES[0]), 0)
    epochs = set(os.listdir(str(tmp_path / "out")))
    sp.process_batch(_df(spark, []), 1)
    assert set(os.listdir(str(tmp_path / "out"))) == epochs
    assert set(_got(sp)) == _batch_pairs(spark, BATCHES[0])


def test_expire_witnesses_readmits_old_duplicates(spark, tmp_path):
    sp = _sp(spark, tmp_path)
    sp.process_batch(_df(spark, [1]), 0)
    dropped = sp.expire_witnesses(min_epoch=1)
    assert dropped > 0
    sp.process_batch(_df(spark, [2]), 1)
    # 1's witnesses are gone: the (1,2) pair is NOT emitted any more —
    # the documented TTL trade
    assert not any({a, b} == {1, 2} for a, b, _ in _got(sp))


def test_rejects_bad_radius_and_missing_checkpoint(spark, tmp_path):
    with pytest.raises(ValueError, match="max_hamming"):
        _sp(spark, tmp_path, max_hamming=16)
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    sp = _sp(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        sp.start(
            spark.readStream.schema("doc_id long, payload binary").parquet(src)
        )


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    ids = [1, 2, 4]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array([DOCS[i] for i in ids], pa.binary()),
            }
        ),
        f"{src}/b0.parquet",
    )
    sp = _sp(spark, tmp_path, checkpoint_dir=str(tmp_path / "ckpt"))
    q = sp.start(
        spark.readStream.schema("doc_id long, payload binary").parquet(src)
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not sp.batches_seen:
            time.sleep(0.5)
        time.sleep(1.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    assert set(_got(sp)) == _batch_pairs(spark, ids)


def test_compaction_composition(spark, tmp_path):
    """compact_epochs over the append-only pair output (pairs are
    immutable once emitted — provenance-only epochs) leaves pairs()
    identical, keeps replay markers, and the stream continues into new
    epochs after compaction."""
    from db_integration_via_kafka_ksql_spark.streaming import epochdir

    sp = _sp(spark, tmp_path)
    sp.process_batch(_df(spark, BATCHES[0]), 0)
    sp.process_batch(_df(spark, BATCHES[1]), 1)
    before = sorted(_got(sp))
    stats = epochdir.compact_epochs(
        spark, sp.output_path, sp.batch_col, upto=1
    )
    assert stats["compacted_epochs"] >= 1
    assert sorted(_got(sp)) == before
    # replay of a compacted epoch is still a no-op
    sp.process_batch(_df(spark, BATCHES[1]), 1)
    assert sorted(_got(sp)) == before
    # and the stream continues
    sp.process_batch(_df(spark, BATCHES[2]), 2)
    assert set(_got(sp)) == _batch_pairs(
        spark, [i for b in BATCHES for i in b]
    )
