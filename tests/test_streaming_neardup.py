"""Streaming MinHash/LSH near-dup dedup (streaming/neardup.py).

The module docstring's guarantee list, made executable: pairwise
bucket-disjoint output, a collision witness for every drop,
single-batch == batch keep-one, crash-replay convergence — the first
two property-tested over random corpora AND random batch splits
(the arrival-order freedom is exactly what hypothesis should drive).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.dedup import minhash_band_keys
from db_integration_via_kafka_ksql_spark.streaming.neardup import StreamingNearDup

# near-dup-prone corpus: few distinct words, heavy overlap between docs
_doc = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]),
    min_size=3,
    max_size=8,
).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=10)


def _dedup(spark, tmp_path, tag=""):
    return StreamingNearDup(
        spark,
        dataset_path=str(tmp_path / f"corpus{tag}"),
        state_path=str(tmp_path / f"state{tag}"),
        trigger_seconds=0,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _buckets(spark, rows) -> dict[int, set]:
    bk = minhash_band_keys(_df(spark, rows)).collect()
    out: dict[int, set] = {}
    for r in bk:
        out.setdefault(r["doc_id"], set()).add((r["band_id"], r["band_key"]))
    return out


def _batch_keep_one(buckets: dict[int, set]) -> set[int]:
    """Reference model: connected components over bucket-collision edges
    (python union-find), min doc id per component kept."""
    parent = {d: d for d in buckets}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(buckets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if buckets[a] & buckets[b]:
                parent[find(a)] = find(b)
    comps: dict[int, list[int]] = {}
    for d in ids:
        comps.setdefault(find(d), []).append(d)
    return {min(members) for members in comps.values()}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus, data=st.data())
def test_streaming_invariants_any_split(spark, tmp_path_factory, texts, data):
    """For EVERY corpus and EVERY batch split: (1) accepted docs are
    pairwise bucket-disjoint, (2) every dropped doc shares a bucket with
    an earlier-or-same-batch doc."""
    rows = list(enumerate(texts))
    n_batches = data.draw(st.integers(1, min(4, len(rows))), label="n_batches")
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, len(rows) - 1),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
                unique=True,
            ),
            label="cuts",
        )
        if len(rows) > 1
        else []
    )
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        if rows[prev:c]:
            batches.append(rows[prev:c])
        prev = c

    d = _dedup(spark, tmp_path_factory.mktemp("nd"))
    for i, b in enumerate(batches):
        d.process_batch(_df(spark, b), i)

    kept = {r["doc_id"] for r in d.read_corpus().collect()}
    buckets = _buckets(spark, rows)
    arrival = {doc_id: bi for bi, b in enumerate(batches) for doc_id, _ in b}
    ks = sorted(kept)
    for i, a in enumerate(ks):  # (1) pairwise bucket-disjoint
        for b in ks[i + 1 :]:
            assert not (buckets[a] & buckets[b]), (a, b)
    for doc_id, _ in rows:  # (2) witness for every drop
        if doc_id in kept:
            continue
        assert any(
            other != doc_id
            and arrival[other] <= arrival[doc_id]
            and buckets[other] & buckets[doc_id]
            for other in buckets
        ), f"doc {doc_id} dropped without witness"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus)
def test_single_batch_equals_batch_keep_one(spark, tmp_path_factory, texts):
    """All data in one batch == the batch-mode connected-components
    keep-one (component minima) exactly."""
    rows = list(enumerate(texts))
    d = _dedup(spark, tmp_path_factory.mktemp("nd1"))
    d.process_batch(_df(spark, rows), 0)
    kept = {r["doc_id"] for r in d.read_corpus().collect()}
    assert kept == _batch_keep_one(_buckets(spark, rows))


def test_cross_batch_near_dup_dropped(spark, tmp_path):
    """A later near-duplicate (exactly one TOKEN changed) of an accepted
    doc is dropped; an unrelated doc passes; resemblance to a DROPPED doc
    also drops (witnesses persist)."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    # substitute exactly one token: str.replace("eta", "iota") would also
    # rewrite z**eta** and th**eta** (3 of 8 words), and the variant stops
    # being an LSH candidate of `base` at k=8/bands=4.
    near = " ".join(w if w != "eta" else "iota" for w in base.split())
    # fixture self-check: the variant must actually share a band key with
    # its original, or the test silently tests nothing.
    b = _buckets(spark, [(1, base), (2, near)])
    assert b[1] & b[2], "fixture bug: near-dup is not an LSH candidate of base"

    d = _dedup(spark, tmp_path)
    d.process_batch(_df(spark, [(1, base)]), 0)
    d.process_batch(
        _df(
            spark,
            [
                (2, near),                             # near-dup of 1 → drop
                (3, "one two three four five six"),    # unrelated → keep
            ],
        ),
        1,
    )
    # resembles 2 (which was dropped) — must still be caught
    d.process_batch(_df(spark, [(4, near)]), 2)
    assert {r["doc_id"] for r in d.read_corpus().collect()} == {1, 3}


def test_replay_interleavings_converge(spark, tmp_path):
    """Both crash-replay interleavings (before/after the state update)
    leave the dataset identical — the StreamingCurator idempotence story."""
    rows = [(1, "alpha beta gamma delta"), (2, "one two three four")]
    d = _dedup(spark, tmp_path)
    d.process_batch(_df(spark, rows), 5)
    first = sorted(r["doc_id"] for r in d.read_corpus().collect())

    d.state.destroy()                      # crash before state update
    d.process_batch(_df(spark, rows), 5)   # replay
    assert sorted(r["doc_id"] for r in d.read_corpus().collect()) == first

    d.process_batch(_df(spark, rows), 5)   # crash after state update: replay
    assert sorted(r["doc_id"] for r in d.read_corpus().collect()) == first


def test_live_stream_end_to_end(spark, tmp_path):
    """Through a real StreamingQuery over a file source: exact dup and
    near-dup across files dropped, distinct docs kept, idle empty batch
    tolerated."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "in")
    os.makedirs(src)

    def drop(name, rows):
        ids, texts = zip(*rows)
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
            ),
            f"{src}/{name}",
        )

    d = _dedup(spark, tmp_path)
    d.checkpoint_dir = str(tmp_path / "ckpt")
    drop("f1.parquet", [(1, "alpha beta gamma delta epsilon zeta")])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = d.start(stream)
    try:
        q.processAllAvailable()
        drop(
            "f2.parquet",
            [
                (2, "alpha beta gamma delta epsilon zeta"),  # exact dup
                (3, "one two three four five six"),          # new
            ],
        )
        q.processAllAvailable()
        q.processAllAvailable()  # idle trigger → empty batch path
    finally:
        q.stop()
    assert {r["doc_id"] for r in d.read_corpus().collect()} == {1, 3}


def test_salted_band_join_equivalence_on_hot_bucket(spark, tmp_path):
    """salt_bands must not change semantics: on a batch where 90% of docs
    share every band bucket (identical text → identical minhash), the
    salted pair generation and the plain one accept the same docs, and
    the hot bucket's quadratic pair output is spread across salt
    partitions instead of piling into one."""
    hot = [(i, "alpha beta gamma delta") for i in range(18)]  # one bucket
    cold = [(100, "one two three four"), (101, "five six seven eight")]
    docs = _df(spark, hot + cold)

    plain = _dedup(spark, tmp_path, tag="_plain")
    salted = _dedup(spark, tmp_path, tag="_salted")
    salted.salt_bands = 4

    acc_plain, bk = plain.accepted_of_batch(docs)
    acc_salted, _ = salted.accepted_of_batch(docs)
    assert {r["doc_id"] for r in acc_plain.collect()} == {
        r["doc_id"] for r in acc_salted.collect()
    }

    # identical pair sets from both join shapes
    par = spark.sparkContext.defaultParallelism
    bk = bk.localCheckpoint()
    p_plain = {(r["doc_a"], r["doc_b"]) for r in plain._batch_pairs(bk, par).collect()}
    p_salted = {
        (r["doc_a"], r["doc_b"]) for r in salted._batch_pairs(bk, par).collect()
    }
    assert p_plain == p_salted
    assert len(p_plain) == 18 * 17 // 2  # full clique over the hot bucket


def _py_sig(text: str, k: int = 8) -> list[str]:
    """Python mirror of functions/text.minhash_signature over distinct
    words: min of md5 hex of f's{i}|{w}'."""
    import hashlib

    words = set(text.split(" "))
    return [
        min(hashlib.md5(f"s{i}|{w}".encode()).hexdigest() for w in words)
        for i in range(k)
    ]


def _py_est(a: list[str], b: list[str]) -> float:
    return sum(x == y for x, y in zip(a, b)) / len(a)


def _py_bands(sig: list[str], bands: int = 4) -> set:
    rows = len(sig) // bands
    return {
        (b, "".join(sig[b * rows : (b + 1) * rows])) for b in range(bands)
    }


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus)
def test_rerank_single_batch_matches_python_model(spark, tmp_path_factory, texts):
    """With rerank_threshold set, a single-batch run keeps exactly the
    min-id representative of each connected component over edges =
    {band collision AND signature-estimate >= threshold} — verified
    against a from-scratch python model (hashlib signatures, union-find)."""
    tmp = tmp_path_factory.mktemp("rr")
    thr = 0.5
    rows = list(enumerate(texts))
    d = _dedup(spark, tmp)
    d.rerank_threshold = thr
    accepted, _ = d.accepted_of_batch(_df(spark, rows))
    got = {r["doc_id"] for r in accepted.collect()}

    sigs = {i: _py_sig(t) for i, t in rows}
    buckets = {i: _py_bands(s) for i, s in sigs.items()}
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(parent)
    for ix, a in enumerate(ids):
        for b in ids[ix + 1 :]:
            if buckets[a] & buckets[b] and _py_est(sigs[a], sigs[b]) >= thr:
                parent[find(a)] = find(b)
    comps: dict[int, list[int]] = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)
    want = {min(m) for m in comps.values()}
    assert got == want


def test_rerank_spares_weak_band_coincidences_across_batches(spark, tmp_path):
    """Cross-batch: a later doc that shares a band bucket with history but
    with LOW signature agreement survives under rerank (it would be
    dropped by pure bucket-collision semantics), while a true near-dup
    (estimate 1.0) is still dropped."""
    b1 = [(1, "alpha beta gamma delta epsilon zeta")]
    # find a batch-2 doc sharing >=1 band with doc 1 but est < 1.0 —
    # search candidate word swaps with the python model
    base = b1[0][1].split(" ")
    weak = None
    pool = ["one", "two", "three", "four", "five", "six", "seven", "nine"]
    s1 = _py_sig(b1[0][1])
    for w in pool:
        for j in range(len(base)):
            cand = " ".join(base[:j] + [w] + base[j + 1 :])
            sc = _py_sig(cand)
            if (
                _py_bands(s1) & _py_bands(sc)
                and 0.0 < _py_est(s1, sc) < 0.75
            ):
                weak = cand
                break
        if weak:
            break
    assert weak is not None, "no weak band coincidence found in the pool"

    d = _dedup(spark, tmp_path)
    d.rerank_threshold = 0.75
    d.checkpoint_dir = None
    d.process_batch(_df(spark, b1), 0)
    b2 = [(2, weak), (3, b1[0][1])]  # weak coincidence + exact dup
    d.process_batch(_df(spark, b2), 1)
    kept = {r["doc_id"] for r in d.read_corpus().collect()}
    assert kept == {1, 2}


def test_rerank_toggle_on_existing_state_fails_loudly(spark, tmp_path):
    """The rerank flag is part of the persisted state schema: re-opening
    an existing state directory with the flag flipped must fail at
    construction with a clear message, not crash mid-stream."""
    d = _dedup(spark, tmp_path)
    d.process_batch(_df(spark, [(1, "alpha beta gamma")]), 0)
    with pytest.raises(ValueError, match="rerank OFF"):
        StreamingNearDup(  # the real construction path hits the gate
            spark,
            dataset_path=d.dataset_path,
            state_path=d.state_path,
            trigger_seconds=0,
            rerank_threshold=0.5,
        )

    tmp2 = tmp_path / "rr"
    d2 = StreamingNearDup(
        spark,
        dataset_path=str(tmp2 / "corpus"),
        state_path=str(tmp2 / "state"),
        trigger_seconds=0,
        rerank_threshold=0.5,
    )
    d2.process_batch(_df(spark, [(1, "alpha beta gamma")]), 0)
    with pytest.raises(ValueError, match="rerank ON"):
        StreamingNearDup(
            spark,
            dataset_path=str(tmp2 / "corpus"),
            state_path=str(tmp2 / "state"),
            trigger_seconds=0,
        )


def test_expire_witnesses_bounds_state_and_readmits_old_dups(spark, tmp_path):
    """Retention horizon semantics: pruning witnesses below an epoch
    shrinks the state, a doc duplicating only pre-horizon history is
    re-admitted (the documented trade), and recent witnesses still drop
    their duplicates. Witness offsets track the LAST sighting, so a
    bucket refreshed after the horizon survives."""
    d = _dedup(spark, tmp_path)
    old = "alpha beta gamma delta epsilon zeta"
    recent = "one two three four five six"
    d.process_batch(_df(spark, [(1, old)]), 0)
    d.process_batch(_df(spark, [(2, recent)]), 5)
    n_before = d.state.read().count()
    dropped = d.expire_witnesses(min_epoch=3)
    assert dropped > 0
    assert d.state.read().count() == n_before - dropped
    # doc 3 duplicates ONLY the expired doc 1 → re-admitted;
    # doc 4 duplicates the recent doc 2 → still dropped
    d.process_batch(_df(spark, [(3, old), (4, recent)]), 6)
    kept = {r["doc_id"] for r in d.read_corpus().collect()}
    assert kept == {1, 2, 3}
