"""Distributed Lloyd's k-means over embeddings + SemDeDup-style semantic
dedup, integer-exact so every stage is DuckDB-oracle-parity-gated.

Extension surface (LLM-training-data build contract — no reference twin;
the reference pipeline stops at relational CDC): semantic deduplication as
described in SemDeDup (Abbas et al., 2023, arXiv:2303.09540): k-means
cluster the embedding space, then drop near-duplicate members inside each
cluster, so the pair space is bounded by cluster occupancy instead of n².

Exactness strategy (same as functions/vector.py): all distances and dot
products are computed on 1024-quantized BIGINT vectors, so assignments,
centroid updates, and dedup scores are bit-identical across engines and
partitionings. Centroid update uses exact integer floor-mean
(``s // n`` on the driver == ``(s - ((s % n) + n) % n) // n`` in SQL —
the numerator is exactly divisible, so truncating and flooring division
agree); no float accumulation ever enters.

Scale design (the part that must survive 100 TB):
- Assignment is SCAN-SIDE: the k centroids are baked into the projection
  as literal arrays (k folds of `dims` each — the lsh_bucket pattern), so
  the corpus is never shuffled, joined, or crossed against a centroid
  table. argmin = array_min over (dist2, cid) structs, ties to the lowest
  cid.
- The per-iteration centroid update is ONE map-side-combined groupBy
  aggregate: each task pre-reduces its partition to <= k rows of
  (count, 64 dim-sums), so the exchange carries k x n_partitions tiny
  rows, never corpus rows.
- Driver state is k x dims BIGINTs per iteration (the same bounded
  footprint Spark MLlib's KMeans broadcasts every Lloyd round) — collect
  is bounded and documented, not a driver-side data loop.
- The SemDeDup candidate join is an equi-join on the cluster id, so the
  pair space is sum(|cluster|^2)/2, controlled by choosing k ~ n / target
  occupancy (the SemDeDup paper's operating point). Pick k so the biggest
  cluster's pair block fits an executor; a skewed cluster is visible
  up-front in kmeans_cluster_profile (n_vecs per cluster) before the
  quadratic stage runs.

Determinism: seeding picks the k vectors with the smallest
md5('km{seed}|' || vec_id) — no RNG state to ship; any engine recomputes
the identical seed set, and every later stage is integer math, so a fixed
(k, iters, seed) fully determines the output on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions import vector as V

Centroids = list[list[int]]  # indexed by cluster id


def _quantized(embeddings: DataFrame) -> DataFrame:
    """(vec_id, q array<bigint>) spread across cores before the heavy
    per-row folds (see dedup._spread rationale)."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    return (
        embeddings.repartition(par)
        .select("vec_id", V.quantize("embedding").alias("q"))
    )


def _seed_hash(seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"km{seed}|"), F.col("vec_id").cast("string")))


def _lit_array(c: list[int]) -> str:
    return V.lit_bigint_array(c)


def _dist2_expr(centroid: list[int]) -> str:
    arr = _lit_array(centroid)
    return (
        f"aggregate(zip_with(q, {arr}, (x, y) -> (x - y) * (x - y)), "
        f"cast(0 as bigint), (acc, v) -> acc + v)"
    )


def assign_clusters(quantized: DataFrame, centroids: Centroids) -> DataFrame:
    """(vec_id, q, cluster, dist2): nearest centroid of each vector, as a
    pure projection over literal centroids — zero shuffles, zero joins.
    Ties break to the lowest cluster id ((dist2, cid) struct ordering)."""
    structs = ", ".join(
        f"struct({_dist2_expr(c)} as d, {cid} as cid)"
        for cid, c in enumerate(centroids)
    )
    best = f"array_min(array({structs}))"
    return quantized.select(
        "vec_id",
        "q",
        F.expr(f"{best}.cid").alias("cluster"),
        F.expr(f"{best}.d").alias("dist2"),
    )


# above this k the literal-centroid expression path stops being the
# right shape (k folds of dims per row, and a k-struct array_min, all in
# one codegen unit) and assignment switches to the Arrow matmul twin —
# identical integer results (equivalence-tested), k-independent codegen
_PANDAS_K_THRESHOLD = 32


def auto_semdedup_k(
    n_rows: int, target_occupancy: int = 64, floor: int = 8, cap: int = 65536
) -> int:
    """Cluster count that keeps expected SemDeDup occupancy bounded:
    ceil(n/target_occupancy), clamped to [floor, cap].

    Why (r14 sf1 scale probe): with a FIXED k the within-cluster pair
    space is ~n²/k — quadratic; semdedup_pairs measured 12.5x wall at
    10x data. k ~ n/occupancy makes expected pairs ~n*occupancy/2,
    linear — the SemDeDup paper's own operating point (k scaled to the
    corpus: 50k clusters for LAION). Past `cap`, occupancy grows again
    (documented, not silent): Lloyd's per-iteration cost is an n x k
    matmul, so cap where the fit budget ends and re-shard above it."""
    if n_rows < 1:
        return floor
    return min(max((n_rows + target_occupancy - 1) // target_occupancy, floor), cap)


def _fit(
    embeddings: DataFrame, k: int, iters: int, seed: int, dims: int
) -> tuple[Centroids, DataFrame]:
    """(final centroids, the eagerly-checkpointed quantized frame) — the
    shared core of kmeans_fit and kmeans_assignment, so callers that need
    the final assignment reuse the checkpoint instead of re-quantizing
    the corpus. Assignment inside the Lloyd loop picks the expression or
    Arrow path by k (see _PANDAS_K_THRESHOLD) — same integers either
    way."""
    q = _quantized(embeddings).localCheckpoint(eager=True)
    return kmeans_fit_on_quantized(q, k, iters, seed, dims), q


def kmeans_fit_on_quantized(
    q: DataFrame, k: int, iters: int, seed: int, dims: int
) -> Centroids:
    """Lloyd's loop over an ALREADY-quantized (vec_id, q array<bigint>)
    frame — the shared core split out (r14 verdict #1) so ivf_pq_fit can
    train its coarse quantizer on the quantized corpus it has already
    checkpointed instead of re-quantizing through kmeans_fit. The caller
    owns materialization: pass a checkpointed/cached frame or the
    ``iters + 1`` passes below each re-plan the upstream chain."""
    # seeds: k vectors with the smallest md5(seed|id); cid = md5 order
    seed_rows = (
        q.select("vec_id", "q", _seed_hash(seed).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids: Centroids = [list(r.q) for r in seed_rows]
    if not centroids:
        raise ValueError(
            "kmeans_fit: no vectors to seed from (empty embeddings input)"
        )
    # a silent mismatch is worse than either symptom it causes: dims too
    # large NULLs the update sums (driver TypeError mid-loop), dims too
    # small truncates round-1 centroids and zip_with then NULL-pads every
    # later distance — garbage clustering, no error. Checking only the
    # seed rows would miss a RAGGED embedding column (later vectors with
    # a different length), so validate min==max==dims over the WHOLE
    # checkpointed frame: one cheap aggregate over stored data, ~free
    # next to the `iters` full assignment passes that follow.
    sz = q.agg(
        F.min(F.size("q")).alias("lo"), F.max(F.size("q")).alias("hi")
    ).first()
    if sz.lo != dims or sz.hi != dims:
        raise ValueError(
            f"kmeans_fit: dims={dims} but the embedding vectors have "
            f"{sz.lo}..{sz.hi} dimensions"
        )
    sums = [
        F.sum(F.element_at("q", i + 1)).cast("bigint").alias(f"s{i}")
        for i in range(dims)
    ]
    assign = (
        assign_clusters_pandas if k > _PANDAS_K_THRESHOLD else assign_clusters
    )
    for _ in range(iters):
        asg = assign(q, centroids)
        stats = (
            asg.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"), *sums)
            .collect()
        )
        nxt = list(centroids)  # empty cluster -> keep previous centroid
        for r in stats:
            # python // is exact integer floor division at any magnitude
            nxt[r.cluster] = [r[f"s{i}"] // r.n for i in range(dims)]
        centroids = nxt
    return centroids


def assign_clusters_pandas(
    quantized: DataFrame, centroids: Centroids
) -> DataFrame:
    """Arrow-vectorized twin of assign_clusters: per Arrow batch, ONE
    numpy distance matrix (||q||² - 2 q·Cᵀ + ||c||², n×k) and an argmin —
    identical integer results (equivalence-tested), the better shape when
    k is large (the expression path generates k folds per row; the
    matmul amortizes them into BLAS). Same (dist2, cid) tie-break: numpy
    argmin returns the FIRST minimum, i.e. the lowest cluster id."""
    import numpy as np
    import pandas as pd

    C = np.array(centroids, dtype=np.int64)  # k x d
    cn2 = (C * C).sum(axis=1)  # k

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            d2 = (M * M).sum(axis=1)[:, None] - 2 * (M @ C.T) + cn2[None, :]
            best = d2.argmin(axis=1)  # first (lowest-cid) minimum on ties
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "q": pdf["q"],
                    "cluster": best.astype(np.int32),
                    "dist2": d2[np.arange(len(best)), best],
                }
            )

    # vec_id's type is taken from the input frame: the production
    # embeddings table stores bigint ids, and hard-coding `int` here
    # would silently downcast them in the Arrow path only, diverging
    # from the expression path this twin is equivalence-tested against
    id_type = quantized.schema["vec_id"].dataType.simpleString()
    return quantized.mapInPandas(
        assign,
        f"vec_id {id_type}, q array<bigint>, cluster int, dist2 bigint",
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    seed: int = 7,
    dims: int = 64,
) -> Centroids:
    """Lloyd's k-means in quantized-integer space; returns the final
    centroids (k lists of dims BIGINTs, indexed by cluster id).

    Per iteration: one scan-side assignment + one map-side-combined
    aggregate collecting k rows to the driver (bounded: k x dims ints —
    the footprint MLlib broadcasts per round). A cluster that captures no
    vectors keeps its previous centroid (the SQL oracle mirrors this with
    a COALESCE against the prior round)."""
    return _fit(embeddings, k, iters, seed, dims)[0]


def kmeans_assignment(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    seed: int = 7,
    dims: int = 64,
) -> DataFrame:
    """Fit + final assignment: (vec_id, q, cluster, dist2). The
    assignment scans the fit's checkpointed quantized frame — the corpus
    is quantized exactly once per fit-and-assign."""
    cents, q = _fit(embeddings, k, iters, seed, dims)
    assign = (
        assign_clusters_pandas if k > _PANDAS_K_THRESHOLD else assign_clusters
    )
    return assign(q, cents)


def kmeans_cluster_profile(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    seed: int = 7,
    dims: int = 64,
) -> DataFrame:
    """(cluster, n_vecs, inertia): occupancy and exact integer inertia of
    each final cluster — the skew pre-check for the quadratic SemDeDup
    stage, and the convergence metric. One map-side-combined shuffle."""
    return (
        kmeans_assignment(embeddings, k=k, iters=iters, seed=seed, dims=dims)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("dist2").cast("bigint").alias("inertia"),
        )
    )


def semdedup_pairs(
    embeddings: DataFrame,
    k: int | str = 8,
    iters: int = 2,
    seed: int = 7,
    dims: int = 64,
    threshold_pct: int = 95,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: quantized cosine >=
    threshold_pct/100 between members of the SAME k-means cluster.

    The cluster id is the blocking key (equi-join, co-partitioned by
    cluster) — the SemDeDup trade: pairs crossing cluster boundaries are
    unseen by construction; recall is bought by k, not by pair count. The
    threshold test reuses the embedding_dup_pairs sqrt comparison
    (correctly-rounded IEEE sqrt of exact integer norms — bit-identical
    across engines).

    k="auto" scales the cluster count with the corpus (one count-star
    job; `auto_semdedup_k`): THE scale setting — any fixed k makes the
    within-cluster pair space ~n²/k, quadratic at some corpus size (the
    r14 sf1 probe measured the fixed-k registry query at 12.5x wall for
    10x data; the auto row scales linearly). The oracle-gated registry
    query pins an explicit k (the cluster chain is part of the replayed
    contract); large/auto k assigns through the Arrow matmul path.

    Returns (vec_a, vec_b, cluster, qdot) with vec_a < vec_b."""
    if k == "auto":
        k = auto_semdedup_k(embeddings.count())
    prep = _prepared_assignment(
        embeddings, k=k, iters=iters, seed=seed, dims=dims
    )
    return _pairs_from_prepared(prep, threshold_pct)


def _prepared_assignment(
    embeddings: DataFrame, k: int, iters: int, seed: int, dims: int
) -> DataFrame:
    """Final assignment + norms, eagerly checkpointed ONCE — every
    downstream consumer (both self-join sides, the survivor keep frame)
    scans this stored frame instead of re-evaluating the k x dims
    literal-distance projection."""
    return (
        kmeans_assignment(embeddings, k=k, iters=iters, seed=seed, dims=dims)
        .select("vec_id", "q", "cluster")
        .withColumn("n2", V.qnorm2("q"))
        .localCheckpoint(eager=True)
    )


def _pairs_from_prepared(asg: DataFrame, threshold_pct: int) -> DataFrame:
    a, b = asg.alias("a"), asg.alias("b")
    t = threshold_pct / 100
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.cluster").alias("cluster"),
            F.expr(
                "aggregate(zip_with(a.q, b.q, (x, y) -> x * y), "
                "cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("qdot"),
            F.col("a.n2").alias("na"),
            F.col("b.n2").alias("nb"),
        )
        .filter(
            (F.col("qdot") > 0)
            & F.expr(
                f"CAST(qdot AS DOUBLE) >= {t} * "
                f"sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))"
            )
        )
        .select("vec_a", "vec_b", "cluster", "qdot")
    )


def semdedup_survivors(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    seed: int = 7,
    dims: int = 64,
    threshold_pct: int = 95,
) -> DataFrame:
    """(vec_id, cluster) of vectors KEPT by semantic dedup.

    Keep rule: drop a vector iff a lower-id member of its cluster is a
    near-duplicate (the dominator rule — one anti-join, deterministic on
    any partitioning). This keeps every near-dup group's minimum id, like
    exact dedup's keep-one; it can drop more than a greedy sequential scan
    would (b dropped by a, c dropped by b even though a~c might fail), a
    strictly-more-aggressive, order-free variant of the paper's
    keep-one-per-eps-ball. k-means is fit ONCE and the checkpointed
    assignment feeds both the pair generation and the keep set."""
    prep = _prepared_assignment(
        embeddings, k=k, iters=iters, seed=seed, dims=dims
    )
    dropped = (
        _pairs_from_prepared(prep, threshold_pct)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        prep.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cluster")
    )
