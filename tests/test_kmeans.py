"""k-means + SemDeDup operator tests: exact equivalence against a
sequential numpy/python re-implementation of the same integer math,
partitioning-independence, the empty-cluster rule, and the survivor
anti-join invariant. (DuckDB hash-parity runs in test_oracle_parity.py.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import kmeans as KM

K, ITERS, SEED, DIMS = 8, 2, 7, 64


def _py_kmeans(vecs: dict[int, list[int]], k: int, iters: int, seed: int):
    """Sequential reference: identical seeding, assignment, and update
    rules as the distributed operator, in plain python integers."""
    import hashlib

    def h(vid):
        return hashlib.md5(f"km{seed}|{vid}".encode()).hexdigest()

    seeds = sorted(vecs, key=h)[:k]
    cents = [list(vecs[v]) for v in seeds]

    def assign():
        out = {}
        for vid, q in vecs.items():
            best = min(
                (sum((x - y) * (x - y) for x, y in zip(q, c)), cid)
                for cid, c in enumerate(cents)
            )
            out[vid] = best  # (dist2, cid)
        return out

    for _ in range(iters):
        asg = assign()
        groups: dict[int, list[int]] = {}
        for vid, (_, cid) in asg.items():
            groups.setdefault(cid, []).append(vid)
        nxt = [list(c) for c in cents]
        for cid, members in groups.items():
            n = len(members)
            nxt[cid] = [
                sum(vecs[v][i] for v in members) // n for i in range(len(cents[0]))
            ]
        cents = nxt
    return cents, assign()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_fit_matches_sequential_reference(spark, emb):
    q = KM._quantized(emb).collect()
    vecs = {r.vec_id: list(r.q) for r in q}
    ref_cents, ref_asg = _py_kmeans(vecs, K, ITERS, SEED)

    cents = KM.kmeans_fit(emb, k=K, iters=ITERS, seed=SEED, dims=DIMS)
    assert cents == ref_cents

    asg = {
        r.vec_id: (r.dist2, r.cluster)
        for r in KM.assign_clusters(KM._quantized(emb), cents).collect()
    }
    assert asg == ref_asg


def test_fit_is_partitioning_independent(spark, emb):
    a = KM.kmeans_fit(emb.repartition(3), k=K, iters=ITERS, seed=SEED)
    b = KM.kmeans_fit(emb.repartition(17), k=K, iters=ITERS, seed=SEED)
    assert a == b


def test_empty_cluster_keeps_previous_centroid(spark):
    # 5 identical vectors, k=3: every vector lands in the seed cluster
    # whose centroid equals the shared point; the two other clusters
    # capture nothing and must keep their (identical) seed centroids —
    # the update may not crash or drop them.
    rows = [(i, [1.0] * 4) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = KM.kmeans_fit(df, k=3, iters=2, seed=1, dims=4)
    assert len(cents) == 3
    assert all(c == [1024] * 4 for c in cents)


def test_assignment_tie_breaks_to_lowest_cluster_id(spark):
    # two identical centroids -> equidistant; struct ordering must pick
    # the lower cid on every row
    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(6)],
        "vec_id int, embedding array<float>",
    )
    q = KM._quantized(df)
    cents = [[2048] * 4, [2048] * 4]
    got = {r.vec_id: r.cluster for r in KM.assign_clusters(q, cents).collect()}
    assert set(got.values()) == {0}


def test_survivors_are_exactly_nondominated(spark, emb):
    pairs = KM.semdedup_pairs(emb, k=K, iters=ITERS, seed=SEED, threshold_pct=40)
    dropped = {r.vec_b for r in pairs.collect()}
    kept = {r.vec_id for r in
            KM.semdedup_survivors(emb, k=K, iters=ITERS, seed=SEED,
                                  threshold_pct=40).collect()}
    every = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept == every - dropped
    assert dropped, "threshold produced no pairs — the test is vacuous"


def test_pairs_stay_within_cluster_and_meet_threshold(spark, emb):
    asg = KM.kmeans_assignment(emb, k=K, iters=ITERS, seed=SEED)
    cluster_of = {r.vec_id: r.cluster for r in asg.collect()}
    q = {r.vec_id: list(r.q) for r in KM._quantized(emb).collect()}
    rows = KM.semdedup_pairs(
        emb, k=K, iters=ITERS, seed=SEED, threshold_pct=40
    ).collect()
    assert rows
    for r in rows:
        assert r.vec_a < r.vec_b
        assert cluster_of[r.vec_a] == cluster_of[r.vec_b] == r.cluster
        qa, qb = q[r.vec_a], q[r.vec_b]
        dot = sum(x * y for x, y in zip(qa, qb))
        assert dot == r.qdot
        na = math.sqrt(sum(x * x for x in qa))
        nb = math.sqrt(sum(x * x for x in qb))
        assert dot / (na * nb) >= 0.40 - 1e-12


def test_cluster_profile_counts_cover_corpus(spark, emb):
    prof = KM.kmeans_cluster_profile(emb, k=K, iters=ITERS, seed=SEED)
    rows = prof.collect()
    assert sum(r.n_vecs for r in rows) == emb.count()
    assert all(r.inertia >= 0 for r in rows)
    assert {r.cluster for r in rows} <= set(range(K))


def test_fit_on_empty_input_raises_clearly(spark):
    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    with pytest.raises(ValueError, match="empty embeddings"):
        KM.kmeans_fit(empty, k=3, iters=1, seed=1, dims=4)


def test_fit_with_fewer_vectors_than_k(spark):
    # n < k: only n seeds exist; the fit degrades to n centroids and
    # assignment still covers every vector
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id int, embedding array<float>"
    )
    cents = KM.kmeans_fit(df, k=5, iters=1, seed=1, dims=2)
    assert len(cents) == 2
    asg = KM.assign_clusters(KM._quantized(df), cents).collect()
    assert {r.vec_id for r in asg} == {0, 1}


def test_pandas_assignment_equals_expression_assignment(spark, emb):
    cents = KM.kmeans_fit(emb, k=K, iters=ITERS, seed=SEED, dims=DIMS)
    q = KM._quantized(emb)
    expr = {
        r.vec_id: (r.cluster, r.dist2)
        for r in KM.assign_clusters(q, cents).collect()
    }
    arrow = {
        r.vec_id: (r.cluster, r.dist2)
        for r in KM.assign_clusters_pandas(q, cents).collect()
    }
    assert arrow == expr


def test_pandas_assignment_tie_breaks_to_lowest_cid(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(6)],
        "vec_id int, embedding array<float>",
    )
    q = KM._quantized(df)
    cents = [[2048] * 4, [2048] * 4]
    got = {
        r.vec_id: r.cluster
        for r in KM.assign_clusters_pandas(q, cents).collect()
    }
    assert set(got.values()) == {0}


def test_pandas_assignment_preserves_bigint_vec_id(spark):
    # the production embeddings table stores vec_id as bigint; the Arrow
    # twin must not silently downcast ids to int32 (ADVICE r6)
    df = spark.createDataFrame(
        [(2**40, [1.0, 0.0]), (2**40 + 1, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    q = KM._quantized(df)
    out = KM.assign_clusters_pandas(q, [[1024, 0], [0, 1024]])
    assert out.schema["vec_id"].dataType.simpleString() == "bigint"
    assert {r.vec_id for r in out.collect()} == {2**40, 2**40 + 1}


def test_fit_rejects_ragged_embeddings(spark):
    # a later row with the wrong length must fail loudly, not NULL-pad:
    # the check is a whole-frame aggregate, not a first-row peek
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0, 0.5])],
        "vec_id int, embedding array<float>",
    )
    with pytest.raises(ValueError, match="dimensions"):
        KM.kmeans_fit(df, k=2, iters=1, seed=1, dims=2)


def test_auto_semdedup_k_and_large_k_assignment_path(spark, sf_dir):
    """r14 sf1 scale probe: fixed-k SemDeDup is quadratic (within-cluster
    pairs ~ n^2/k; measured 12.5x wall at 10x data). auto_semdedup_k
    scales k with the corpus, and past _PANDAS_K_THRESHOLD the Lloyd
    loop assigns through the Arrow matmul (same integers, k-independent
    codegen)."""
    # the arithmetic: ceil(n/64) clamped to [8, 65536]
    assert KM.auto_semdedup_k(0) == 8
    assert KM.auto_semdedup_k(512) == 8
    assert KM.auto_semdedup_k(2_000) == 32      # ceil(2000/64)
    assert KM.auto_semdedup_k(20_000) == 313
    assert KM.auto_semdedup_k(10**10) == 65536  # cap bounds the fit matmul
    # k="auto" gives the same pairs as the explicit k it resolves to
    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    want_k = KM.auto_semdedup_k(300)
    auto = sorted(
        tuple(r)
        for r in KM.semdedup_pairs(emb, k="auto", threshold_pct=40).collect()
    )
    explicit = sorted(
        tuple(r)
        for r in KM.semdedup_pairs(
            emb, k=want_k, threshold_pct=40
        ).collect()
    )
    assert auto == explicit
    # a k above the threshold routes assignment through the Arrow path
    # and still produces the exact expression-path integers
    big = KM.kmeans_assignment(emb, k=KM._PANDAS_K_THRESHOLD + 8, iters=1)
    cents = KM.kmeans_fit(emb, k=KM._PANDAS_K_THRESHOLD + 8, iters=1)
    q = big.select("vec_id", "q")
    expr_path = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in KM.assign_clusters(q, cents).collect()
    }
    got = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in big.collect()}
    assert got == expr_path and len(got) == 300
