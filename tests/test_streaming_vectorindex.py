"""Streaming IVF-PQ upserts (streaming/vectorindex.py): the exact
prefix contract vs a batch-built merged index, the encode identity,
replay no-ops, the crash-between-commits interleaving, idle epochs,
dim guards, and a live stream — over the testdata embeddings corpus."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import similarity as S
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.vectorindex import (
    StreamingVectorIndex,
)

K, NPROBE = 3, 4


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """Base corpus (fitted) + three addition batches, disjoint vec_ids."""
    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    base = emb.limit(200).localCheckpoint(eager=True)
    rest = emb.join(base.select("vec_id"), "vec_id", "left_anti").orderBy(
        "vec_id"
    )
    adds = rest.limit(90).localCheckpoint(eager=True)
    return base, adds


@pytest.fixture(scope="module")
def saved_index(spark, corpus, tmp_path_factory):
    base, _ = corpus
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    return path


def _batches(adds):
    ids = [r["vec_id"] for r in adds.select("vec_id").collect()]
    return [ids[:30], ids[30:60], ids[60:90]]


def _queries(spark, emb, vec_ids):
    return (
        emb.filter(F.col("vec_id").isin(vec_ids))
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .localCheckpoint(eager=True)
    )


def _svi(spark, saved_index, tmp_path, **kw):
    return StreamingVectorIndex(
        spark,
        index_path=saved_index,
        adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
        **kw,
    )


def _batch_merged(spark, saved_index, base_index, added_df):
    """The comparison index: base + encode(all added so far), built in
    ONE batch against the same frozen artifacts."""
    q_rows, list_rows = base_index.encode(added_df)
    return S.IvfPqIndex(
        q=base_index.q.select("vec_id", "label", "q").unionByName(q_rows),
        cent=base_index.cent,
        corpus_res=None,
        codebook=base_index.codebook,
        lists=base_index.lists.select(
            "neighbor_id", "list_id", "codes"
        ).unionByName(list_rows),
        dims=base_index.dims,
        m=base_index.m,
    )


def _serve(index_or_svi, queries):
    if isinstance(index_or_svi, StreamingVectorIndex):
        df = index_or_svi.serve_vectors(queries, k=K, nprobe=NPROBE)
    else:
        df = S.ivf_pq_serve_vectors(
            index_or_svi, queries, k=K, nprobe=NPROBE
        )
    return sorted(tuple(r) for r in df.collect())


def test_prefix_contract_every_epoch(spark, sf_dir, corpus, saved_index, tmp_path):
    """After epoch e the streaming serve equals the batch serve against
    an index holding base + every vector added so far — exact integer
    equality, the encode-identity contract."""
    base, adds = corpus
    emb = load_table(spark, sf_dir, "embeddings")
    svi = _svi(spark, saved_index, tmp_path)
    batches = _batches(adds)
    queries = _queries(spark, emb, batches[0][:2] + [0, 1])
    seen: list[int] = []
    for e, ids in enumerate(batches):
        svi.process_batch(adds.filter(F.col("vec_id").isin(ids)), e)
        seen += ids
        want_index = _batch_merged(
            spark, saved_index, svi._base,
            adds.filter(F.col("vec_id").isin(seen)),
        )
        assert _serve(svi, queries) == _serve(want_index, queries), f"epoch {e}"


def test_added_vector_is_its_own_top_hit(spark, sf_dir, corpus, saved_index, tmp_path):
    """The round-trip identity carried into the stream: a vector added
    at epoch 0, served BY VALUE, returns itself rank 1 — tonight's doc
    is searchable now, not after the next refit."""
    base, adds = corpus
    emb = load_table(spark, sf_dir, "embeddings")
    svi = _svi(spark, saved_index, tmp_path)
    ids = _batches(adds)[0]
    svi.process_batch(adds.filter(F.col("vec_id").isin(ids)), 0)
    queries = _queries(spark, emb, ids[:3])
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in svi.serve_vectors(queries, k=1, nprobe=NPROBE).collect()
    }
    assert top1 == {i: i for i in ids[:3]}


def test_replay_noop_and_crash_between_commits(spark, corpus, saved_index, tmp_path, monkeypatch):
    base, adds = corpus
    svi = _svi(spark, saved_index, tmp_path)
    batches = _batches(adds)
    svi.process_batch(adds.filter(F.col("vec_id").isin(batches[0])), 0)
    q_epochs = epochdir.list_epochs(svi._q_path(), svi.batch_col)

    # crash AFTER the q commit, BEFORE the lists commit of epoch 1
    real_commit = epochdir.commit_epoch

    def crash_on_lists(df, path, batch_col, epoch_id, **kw):
        if path == svi._lists_path() and epoch_id == 1:
            raise RuntimeError("simulated crash between the two commits")
        return real_commit(df, path, batch_col, epoch_id, **kw)

    monkeypatch.setattr(
        "db_integration_via_kafka_ksql_spark.streaming.vectorindex."
        "epochdir.commit_epoch",
        crash_on_lists,
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        svi.process_batch(adds.filter(F.col("vec_id").isin(batches[1])), 1)
    monkeypatch.undo()
    # replay converges: q already committed (skipped), lists lands
    svi.process_batch(adds.filter(F.col("vec_id").isin(batches[1])), 1)
    assert epochdir.list_epochs(svi._q_path(), svi.batch_col) == [0, 1]
    assert epochdir.list_epochs(svi._lists_path(), svi.batch_col) == [0, 1]
    # full replay of a committed epoch is a no-op
    before = epochdir.list_epochs(svi._q_path(), svi.batch_col)
    svi.process_batch(adds.filter(F.col("vec_id").isin(batches[1])), 1)
    assert epochdir.list_epochs(svi._q_path(), svi.batch_col) == before
    assert q_epochs == [0]


def test_idle_epoch_commits_nothing(spark, corpus, saved_index, tmp_path):
    base, adds = corpus
    svi = _svi(spark, saved_index, tmp_path)
    svi.process_batch(adds.limit(10), 0)
    svi.process_batch(adds.limit(0), 1)
    assert epochdir.list_epochs(svi._q_path(), svi.batch_col) == [0]
    assert epochdir.list_epochs(svi._lists_path(), svi.batch_col) == [0]


def test_encode_rejects_dim_mismatch(spark, corpus, saved_index):
    base, adds = corpus
    index = S.IvfPqIndex.load(spark, saved_index)
    bad = adds.limit(5).select(
        "vec_id", "label", F.expr("slice(embedding, 1, 32)").alias("embedding")
    )
    with pytest.raises(ValueError, match="dims=64"):
        index.encode(bad).__getitem__(0).count()


def test_start_requires_checkpoint(spark, corpus, saved_index, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    svi = _svi(spark, saved_index, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        svi.start(
            spark.readStream.schema(
                "vec_id long, label int, embedding array<float>"
            ).parquet(src)
        )


def test_live_stream_end_to_end(spark, sf_dir, corpus, saved_index, tmp_path):
    base, adds = corpus
    emb = load_table(spark, sf_dir, "embeddings")
    ids = _batches(adds)[0][:10]
    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    adds.filter(F.col("vec_id").isin(ids)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(feed)
    svi = _svi(
        spark, saved_index, tmp_path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    schema = adds.schema
    q = svi.start(spark.readStream.schema(schema).parquet(feed))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not svi.batches_seen:
            time.sleep(0.5)
        time.sleep(1.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    queries = _queries(spark, emb, ids[:2])
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in svi.serve_vectors(queries, k=1, nprobe=NPROBE).collect()
    }
    assert top1 == {i: i for i in ids[:2]}


def test_distortion_drift_gauge_over_merged_index(spark, corpus, saved_index, tmp_path):
    """ADVICE r13 (medium): distortion() over the loaded/merged index
    must WORK — it used to raise unconditionally (corpus_res=None on
    every loaded index), so the advertised refit-scheduling drift gauge
    was dead on arrival. Residuals now recompute scan-side via the
    encode identity: before any adds the report is bit-equal to the
    freshly fitted index's; after adds it covers base + added vectors."""
    base, adds = corpus
    svi = _svi(spark, saved_index, tmp_path)
    fitted = S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1)
    d0 = sorted(tuple(r) for r in svi.distortion().collect())
    assert d0 == sorted(
        tuple(r) for r in S.ivf_pq_distortion(fitted).collect()
    )
    ids = _batches(adds)[0]
    svi.process_batch(adds.filter(F.col("vec_id").isin(ids)), 0)
    d1 = svi.distortion().collect()
    assert sum(r["n_vectors"] for r in d1) == 200 + 30
    for r in d1:
        assert r["max_err"] >= r["avg_err"] >= 0


def test_adds_partitions_carry_pruning_layout(spark, sf_dir, corpus, saved_index, tmp_path):
    """r13 verdict #1, streaming leg: epoch adds commit subpartitioned by
    list_id (lists) and q_bucket (q), so the merged serve's isin filters
    reach BOTH the base and the adds scans as PartitionFilters — the
    merged index keeps the nprobe/nlists cost contract as adds grow."""
    from db_integration_via_kafka_ksql_spark.plans.audit import audit

    base, adds = corpus
    emb = load_table(spark, sf_dir, "embeddings")
    svi = _svi(spark, saved_index, tmp_path)
    ids = _batches(adds)[0]
    svi.process_batch(adds.filter(F.col("vec_id").isin(ids)), 0)
    # physical layout: one epoch dir, subpartitioned by the pruning cols
    lists_epoch = os.path.join(str(tmp_path / "adds"), "lists", "ingest_batch=0")
    q_epoch = os.path.join(str(tmp_path / "adds"), "q", "ingest_batch=0")
    assert any(d.startswith("list_id=") for d in os.listdir(lists_epoch))
    assert any(d.startswith("q_bucket=") for d in os.listdir(q_epoch))
    # the merged ADC plan prunes base AND adds lists scans
    queries = _queries(spark, emb, ids[:2])
    adc = S.ivf_pq_serve_vectors(
        svi._merged(), queries, k=K, nprobe=NPROBE, refine=None
    )
    rep = audit(adc)
    # audit.scans keys by path basename (both scans are ".../lists"), so
    # count pruned scans on the plan text directly
    import re

    n_pruned = len(
        re.findall(r"PartitionFilters: \[[^\]]*list_id", rep.plan_text)
    )
    assert n_pruned >= 2, rep.plan_text[:3000]


def test_kmeans_coarse_base_streams_identically(spark, sf_dir, corpus, tmp_path):
    """r15: a TRAINED-coarse (coarse="kmeans") saved base is a drop-in
    for the streaming upsert pipeline — the whole stream/merge/serve
    stack is coarse-agnostic (it consumes the saved centroid frame), so
    the prefix contract (stream == one-shot batch encode over the same
    frozen artifacts) and the merged-plan list_id pruning hold
    unchanged."""
    import re

    from db_integration_via_kafka_ksql_spark.plans.audit import audit

    base, adds = corpus
    path = str(tmp_path / "kmeans_index")
    S.ivf_pq_fit(base, ksub=8, iters=1, coarse="kmeans").save(path)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    ids = _batches(adds)[0]
    svi.process_batch(adds.filter(F.col("vec_id").isin(ids)), 0)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _queries(spark, emb, ids[:2])
    got = _serve(svi, queries)
    want = _serve(
        _batch_merged(
            spark, path, svi._base, adds.filter(F.col("vec_id").isin(ids))
        ),
        queries,
    )
    assert got == want and len(got) > 0
    # an added vector served by value is its own exact top hit
    top = {r[0]: (r[1], r[3]) for r in got if r[3] == 1}
    assert top[ids[0]][0] == ids[0]
    # merged ADC plan prunes base AND adds lists scans on list_id
    adc = S.ivf_pq_serve_vectors(
        svi._merged(), queries, k=K, nprobe=NPROBE, refine=None
    )
    rep = audit(adc)
    n_pruned = len(
        re.findall(r"PartitionFilters: \[[^\]]*list_id", rep.plan_text)
    )
    assert n_pruned >= 2, rep.plan_text[:3000]


# -- scheduled refit (r15): the repair the distortion gauge schedules ----


def _refit_twin(spark, corpus_df, tmp_path, tag):
    """The comparison index: a fresh batch fit over the same corpus with
    the same params refit uses, through the same save/load shape."""
    path = str(tmp_path / f"twin{tag}")
    S.ivf_pq_fit(
        corpus_df, dims=64, m=8, ksub=8, iters=1, seed=5,
        coarse="kmeans", nlists="auto",
    ).save(path)
    return S.IvfPqIndex.load(spark, path)


def test_refit_folds_adds_and_matches_fresh_batch_fit(
    spark, sf_dir, corpus, tmp_path
):
    """refit(corpus) == a from-scratch batch fit over the same corpus:
    after the swap the adds are cleared, the consumed marker holds the
    highest folded epoch, and serve answers bit-equal to the twin (both
    fits are deterministic integer Lloyd's)."""
    import os as _os

    from db_integration_via_kafka_ksql_spark.operators.similarity import (
        auto_nlists,
    )

    base, adds = corpus
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    svi.process_batch(added, 0)
    full = base.unionByName(added).localCheckpoint(eager=True)
    report = svi.refit(full, ksub=8, iters=1)
    assert report["consumed_through"] == 0
    assert report["nlists"] == auto_nlists(full.count())
    # adds consumed; intent gone; consumed marker present
    assert not _os.path.isdir(str(tmp_path / "adds" / "q"))
    assert not _os.path.exists(svi._intent_path())
    assert svi._consumed_through() == 0
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _queries(spark, emb, ids[:2])
    got = _serve(svi, queries)
    want = _serve(_refit_twin(spark, full, tmp_path, "a"), queries)
    assert got == want and len(got) > 0
    # checkpoint REPLAY of the folded epoch is a no-op (the guard the
    # consumed marker exists for): nothing reappears in the adds
    svi.process_batch(added, 0)
    assert svi._max_add_epoch() is None
    # and a LATER batch encodes against the NEW codebook, prefix-exact
    ids2 = _batches(adds)[1]
    added2 = adds.filter(F.col("vec_id").isin(ids2))
    svi.process_batch(added2, 1)
    q2 = _queries(spark, emb, ids2[:2])
    got2 = _serve(svi, q2)
    want2 = _serve(_batch_merged(spark, path, svi._base, added2), q2)
    assert got2 == want2


def test_refit_crash_between_publish_and_clear_recovers(
    spark, sf_dir, corpus, tmp_path, monkeypatch
):
    """Crash AFTER the new index published but BEFORE the adds cleared:
    the next construction finishes the swap (consumed marker, adds
    clear, intent removal) and serves from the new base alone."""
    base, adds = corpus
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    svi.process_batch(added, 0)
    full = base.unionByName(added).localCheckpoint(eager=True)

    def boom():
        raise RuntimeError("injected crash after publish")

    monkeypatch.setattr(svi, "_clear_adds", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        svi.refit(full, ksub=8, iters=1)
    # intent survives the crash; a fresh instance completes the swap
    assert os.path.exists(
        os.path.join(str(tmp_path / "adds"), "__refit_intent.json")
    )
    svi2 = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    assert not os.path.exists(svi2._intent_path())
    assert svi2._max_add_epoch() is None
    assert svi2._consumed_through() == 0
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _queries(spark, emb, ids[:2])
    got = _serve(svi2, queries)
    want = _serve(_refit_twin(spark, full, tmp_path, "b"), queries)
    assert got == want and len(got) > 0


def test_refit_crash_before_publish_aborts(
    spark, sf_dir, corpus, tmp_path, monkeypatch
):
    """Crash BEFORE the new index published: the intent aborts on the
    next construction and the old base + adds keep serving unchanged."""
    base, adds = corpus
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    svi.process_batch(added, 0)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _queries(spark, emb, ids[:2])
    before = _serve(svi, queries)
    full = base.unionByName(added).localCheckpoint(eager=True)
    monkeypatch.setattr(
        S.IvfPqIndex,
        "save",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected crash before publish")
        ),
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="before publish"):
        svi.refit(full, ksub=8, iters=1)
    monkeypatch.undo()
    svi2 = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    assert not os.path.exists(svi2._intent_path())
    assert svi2._consumed_through() is None
    assert svi2._max_add_epoch() == 0  # adds intact
    assert _serve(svi2, queries) == before


# -- refit crash-anywhere property (the state-store crash-plan stance) ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    n_batches=st.integers(min_value=1, max_value=2),
    crash=st.sampled_from(
        ["none", "pre_publish", "pre_marker", "pre_clear", "pre_intent_rm"]
    ),
)
def test_refit_crash_anywhere_recovers_to_a_legal_state(
    spark, sf_dir, corpus, tmp_path_factory, n_batches, crash
):
    """For ANY crash site across the two-phase swap, a fresh
    construction recovers to exactly one of the two legal states —
    OLD base + adds intact (crash before publish) or NEW base + adds
    folded (crash at/after publish) — decided solely by whether the
    published meta carries the intent's fit_id. Serve output is
    bit-compared against the corresponding deterministic twin, and the
    folded-epoch replay guard holds in the new-state branch."""
    import pytest as _pytest

    base, adds = corpus
    tmp_path = tmp_path_factory.mktemp("refit_prop")
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    batches = _batches(adds)[:n_batches]
    added_ids = [i for b in batches for i in b]
    added = adds.filter(F.col("vec_id").isin(added_ids)).localCheckpoint(
        eager=True
    )
    for e, ids in enumerate(batches):
        svi.process_batch(adds.filter(F.col("vec_id").isin(ids)), e)
    full = base.unionByName(added).localCheckpoint(eager=True)

    mp = _pytest.MonkeyPatch()
    try:
        if crash == "pre_publish":
            mp.setattr(
                S.IvfPqIndex,
                "save",
                lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
            )
        elif crash == "pre_marker":
            # refit reads the PREVIOUS marker via _consumed_path before
            # publishing (call #1) and writes the new one after (call
            # #2) — only the post-publish call is the crash site
            real_cp = svi._consumed_path
            calls = {"n": 0}

            def cp():
                calls["n"] += 1
                if calls["n"] >= 2:
                    raise RuntimeError("boom")
                return real_cp()

            mp.setattr(svi, "_consumed_path", cp)
        elif crash == "pre_clear":
            mp.setattr(
                svi,
                "_clear_adds",
                lambda: (_ for _ in ()).throw(RuntimeError("boom")),
            )
        elif crash == "pre_intent_rm":
            import os as _os

            real_remove = _os.remove

            def crash_rm(p, *a, **kw):
                if "__refit_intent" in str(p):
                    raise RuntimeError("boom")
                return real_remove(p, *a, **kw)

            mp.setattr(_os, "remove", crash_rm)
        if crash == "none":
            svi.refit(full, ksub=8, iters=1)
        else:
            with _pytest.raises(RuntimeError, match="boom"):
                svi.refit(full, ksub=8, iters=1)
    finally:
        mp.undo()

    # production restart: a fresh instance runs the recovery
    svi2 = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    assert not os.path.exists(svi2._intent_path())
    emb = load_table(spark, sf_dir, "embeddings")
    queries = _queries(spark, emb, added_ids[:2])
    got = _serve(svi2, queries)
    if crash == "pre_publish":  # OLD state: base + adds intact
        assert svi2._max_add_epoch() == len(batches) - 1
        want = _serve(_batch_merged(spark, path, svi2._base, added), queries)
    else:  # NEW state: refit published -> adds folded
        assert svi2._max_add_epoch() is None
        assert svi2._consumed_through() == len(batches) - 1
        want = _serve(_refit_twin(spark, full, tmp_path, "p"), queries)
        # folded-epoch replay guard
        svi2.process_batch(
            adds.filter(F.col("vec_id").isin(batches[0])), 0
        )
        assert svi2._max_add_epoch() is None
    assert got == want and len(got) > 0


# -- r16: refit corpus-coverage gate + checkpoint-identity marker ----


def test_refit_rejects_corpus_missing_committed_adds(
    spark, corpus, tmp_path
):
    """A corpus snapshot taken BEFORE the latest add commit must not
    silently drop those vectors: refit anti-joins the committed adds'
    vec_ids against the corpus and raises by default; on_missing='warn'
    proceeds and reports the count (the intentional-drop path)."""
    base, adds = corpus
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0,
    )
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    svi.process_batch(added, 0)
    # stale snapshot: base only — every committed add is missing
    with pytest.raises(ValueError, match="missing 30 committed add"):
        svi.refit(base, ksub=8, iters=1)
    # nothing was swapped or cleared: old base + adds keep serving
    assert svi._max_add_epoch() == 0
    assert not os.path.exists(svi._intent_path())
    # the intentional-drop path reports instead of raising
    report = svi.refit(base, ksub=8, iters=1, on_missing="warn")
    assert report["missing_from_corpus"] == 30
    assert svi._max_add_epoch() is None  # adds consumed (dropped by choice)
    # a covering corpus passes the gate clean
    svi.process_batch(
        adds.filter(F.col("vec_id").isin(_batches(adds)[1])), 1
    )
    full = base.unionByName(
        adds.filter(F.col("vec_id").isin(_batches(adds)[1]))
    ).localCheckpoint(eager=True)
    report2 = svi.refit(full, ksub=8, iters=1)
    assert report2["missing_from_corpus"] == 0


def test_consumed_marker_ignored_under_fresh_checkpoint(
    spark, corpus, tmp_path
):
    """The consumed marker records the checkpoint identity it was
    written under: a restart with a FRESH checkpoint dir renumbers
    batches from 0, so honoring the old marker would silently drop new
    batches 0..through. Identity mismatch -> marker ignored (commits
    proceed); same identity -> replay skip as before."""
    base, adds = corpus
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    cp1, cp2 = str(tmp_path / "cp1"), str(tmp_path / "cp2")
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=cp1,
    )
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    svi.process_batch(added, 0)
    full = base.unionByName(added).localCheckpoint(eager=True)
    svi.refit(full, ksub=8, iters=1)
    assert svi._consumed_through() == 0

    # same checkpoint identity: folded-epoch replay stays a no-op
    same = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=cp1,
    )
    ids2 = _batches(adds)[1]
    added2 = adds.filter(F.col("vec_id").isin(ids2)).localCheckpoint(
        eager=True
    )
    same.process_batch(added2, 0)  # replay of a folded epoch id
    assert same._max_add_epoch() is None

    # FRESH checkpoint identity: epoch 0 is NEW data, must commit
    fresh = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=cp2,
    )
    assert fresh._consumed_through() is None
    fresh.process_batch(added2, 0)
    assert fresh._max_add_epoch() == 0


def test_refit_under_fresh_checkpoint_keeps_new_batches(
    spark, corpus, tmp_path
):
    """r16 review finding: the consumed marker must carry the identity
    the FOLDED epochs were numbered under (recorded at commit time),
    not the refit runner's current checkpoint. Adds committed under
    cp1, refit run by an instance restarted on fresh cp2: the marker
    records cp1, so cp2's renumbered batches 0..N still COMMIT (no
    silent loss) while a cp1 replay of the folded epoch stays a no-op."""
    base, adds = corpus
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    cp1, cp2 = str(tmp_path / "cp1"), str(tmp_path / "cp2")
    writer = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=cp1,
    )
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    writer.process_batch(added, 0)
    # restart on a FRESH checkpoint, then fold the cp1 adds via refit
    fresh = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=cp2,
    )
    full = base.unionByName(added).localCheckpoint(eager=True)
    fresh.refit(full, ksub=8, iters=1)
    import json

    with open(fresh._consumed_path()) as f:
        marker = json.load(f)
    assert marker["checkpoint"] == cp1  # the adds' identity, not cp2's
    # a cp1 instance on the SAME adds dir replay-skips its folded epoch
    # — exercised for real, against the real marker, BEFORE any cp2
    # commit could mask it behind the epoch-dir existence check
    old = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=cp1,
    )
    assert old._consumed_through() == 0
    old.process_batch(added, 0)  # checkpoint replay of the folded epoch
    assert old._max_add_epoch() is None  # skipped: nothing re-committed
    # cp2's new numbering starts at 0: its batches must COMMIT
    assert fresh._consumed_through() is None
    ids2 = _batches(adds)[1]
    added2 = adds.filter(F.col("vec_id").isin(ids2)).localCheckpoint(
        eager=True
    )
    fresh.process_batch(added2, 0)
    assert fresh._max_add_epoch() == 0


def test_identityless_legacy_marker_is_non_comparable(
    spark, corpus, tmp_path
):
    """ADVICE r16: a pre-r16 consumed marker (no 'checkpoint' field) has
    an unknowable numbering, so (1) process_batch must NOT skip batches
    against its `through` (silent loss after a fresh-checkpoint restart)
    and (2) refit must NOT carry its `through` forward into a
    new-identity marker (which would launder the stale skip into the new
    numbering forever). Dropping it costs at worst duplicate replays —
    the documented loss-vs-duplicates stance."""
    import json

    base, adds = corpus
    path = str(tmp_path / "index")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=str(tmp_path / "cp_new"),
    )
    # simulate the pre-r16 artifact: identity-less marker, through=5
    os.makedirs(svi.adds_path, exist_ok=True)
    with open(svi._consumed_path(), "w") as f:
        json.dump({"through": 5}, f)
    # (1) non-comparable for skipping: renumbered epoch 0 must COMMIT
    assert svi._consumed_through() is None
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    svi.process_batch(added, 0)
    assert svi._max_add_epoch() == 0
    # (2) non-comparable for carry-forward: refit folds epoch 0 and the
    # new marker records through=0 under the adds' identity — NOT the
    # legacy 5, which would skip the next five renumbered epochs
    full = base.unionByName(added).localCheckpoint(eager=True)
    report = svi.refit(full, ksub=8, iters=1)
    assert report["consumed_through"] == 0
    with open(svi._consumed_path()) as f:
        marker = json.load(f)
    assert marker == {"through": 0, "checkpoint": str(tmp_path / "cp_new")}
    # epochs 1..5 of the new numbering still commit afterwards
    ids2 = _batches(adds)[1]
    added2 = adds.filter(F.col("vec_id").isin(ids2)).localCheckpoint(
        eager=True
    )
    svi.process_batch(added2, 3)
    assert svi._max_add_epoch() == 3


def test_refit_recalibrates_and_post_refit_serve_uses_it(
    spark, corpus, tmp_path
):
    """r16 verdict Next #2, the streaming leg: a refit over a CALIBRATED
    base re-runs calibrate_nprobe against its retrain corpus (geometry
    changed, so the old measurement no longer applies), persists the new
    report with the published index, and the post-refit merged serve
    resolves "auto" to the recalibrated values. An UNCALIBRATED base
    inherits nothing (calibrate="inherit" -> skip)."""
    import json

    base, adds = corpus
    path = str(tmp_path / "index")
    idx = S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1)
    base_cal = S.calibrate_nprobe(
        idx, [r["vec_id"] for r in base.select("vec_id").limit(10).collect()],
        k=3, target_recall=0.2,
    )
    idx.save(path, calibration=base_cal)
    svi = StreamingVectorIndex(
        spark, index_path=path, adds_path=str(tmp_path / "adds"),
        trigger_seconds=0, checkpoint_dir=str(tmp_path / "cp"),
    )
    assert svi._base.calibration == base_cal
    # the merged serving view inherits the measured policy
    assert svi._merged().calibration == base_cal
    ids = _batches(adds)[0]
    added = adds.filter(F.col("vec_id").isin(ids)).localCheckpoint(eager=True)
    svi.process_batch(added, 0)
    full = base.unionByName(added).localCheckpoint(eager=True)
    report = svi.refit(full, ksub=8, iters=1)
    # refit recalibrated at the inherited target/k on the retrain corpus
    cal = report["calibration"]
    assert cal is not None
    assert cal["target_recall"] == base_cal["target_recall"]
    assert cal["k"] == base_cal["k"]
    assert cal["nlists"] == report["nlists"]  # the NEW geometry
    # persisted with the published index and live on the reloaded base
    with open(os.path.join(path, "meta.json")) as f:
        assert json.load(f)["calibration"] == cal
    assert svi._base.calibration == cal
    # post-refit "auto" serve resolves to the recalibrated values
    merged = svi._merged()
    queries = _queries(
        spark, base.unionByName(added), [r["vec_id"] for r in added.limit(3).collect()]
    )
    S.ivf_pq_serve_vectors(merged, queries, k=3, nprobe="auto", refine="auto").collect()
    assert merged.last_serve_stats["nprobe"] == cal["nprobe"]
    assert merged.last_serve_stats["refine"] == cal["refine"]
    # uncalibrated base: inherit is a no-op
    path2 = str(tmp_path / "index2")
    S.ivf_pq_fit(base, dims=64, m=8, ksub=8, iters=1).save(path2)
    svi2 = StreamingVectorIndex(
        spark, index_path=path2, adds_path=str(tmp_path / "adds2"),
        trigger_seconds=0, checkpoint_dir=str(tmp_path / "cp2"),
    )
    report2 = svi2.refit(base, ksub=8, iters=1)
    assert report2["calibration"] is None
    assert svi2._base.calibration is None
