"""k-means + SemDeDup query surface with DuckDB oracles.

The oracle replays the ENTIRE Lloyd's iteration in SQL — seeding by md5
order, scan-side assignment with (dist2, cid) tie-break, integer
floor-mean centroid update with the empty-cluster COALESCE — as a chain
of CTEs, one assignment + one update per iteration, so the driver's hash
compare proves the distributed fit itself (not just the final projection)
is bit-identical to a sequential re-derivation.

All three queries live in the aux registry: the external driver's 50-slot
window is full, and tests/test_oracle_parity.py applies the identical
hash-parity gate locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from db_integration_via_kafka_ksql_spark.functions.vector import (
    quantize_sql_duckdb,
)
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import kmeans as KM
from db_integration_via_kafka_ksql_spark.registry import query

K = 8
ITERS = 2
SEED = 7
DIMS = 64
# matches dedup_queries.EMB_THRESHOLD_PCT: the synthetic embeddings'
# near-dup band sits around cosine ~0.4-0.5, so 40 yields a non-trivial
# pair set (an empty result would make the parity check vacuous)
THRESHOLD_PCT = 40

_QUANTIZE = quantize_sql_duckdb()


def _dist2(qcol: str, ccol: str) -> str:
    return (
        f"CAST(list_sum([({qcol}[i] - {ccol}[i]) * ({qcol}[i] - {ccol}[i]) "
        f"for i in generate_series(1, {DIMS})]) AS BIGINT)"
    )


def _dot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum([{a}[i] * {b}[i] "
        f"for i in generate_series(1, {DIMS})]) AS BIGINT)"
    )


def _kmeans_chain(k: int = K, iters: int = ITERS, seed: int = SEED) -> str:
    """CTE chain ending in `af` = (vec_id, q, cluster, dist2), the final
    assignment under the converged centroids."""
    ctes = [
        f"q AS (SELECT vec_id, {_QUANTIZE} AS q FROM embeddings)",
        # seeding: the k vectors with the smallest md5('km{seed}|'||id);
        # cluster id = position in that md5 order
        f"""c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS INTEGER) AS cid,
                   q AS c
            FROM (
                SELECT q, md5('km{seed}|' || CAST(vec_id AS VARCHAR)) AS h
                FROM q ORDER BY h LIMIT {k}
            )
        )""",
    ]
    for t in range(1, iters + 1):
        prev = f"c{t - 1}"
        # assignment under the previous round's centroids
        ctes.append(f"""a{t} AS (
            SELECT vec_id, q, cluster, dist2 FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist2, cluster
                ) AS rn
                FROM (
                    SELECT q.vec_id, q.q, c.cid AS cluster,
                           {_dist2("q.q", "c.c")} AS dist2
                    FROM q, {prev} c
                )
            ) WHERE rn = 1
        )""")
        # integer floor-mean update; numerator is made exactly divisible
        # first, so // (truncating or flooring) returns floor(s/n) exactly
        ctes.append(f"""u{t} AS (
            SELECT a.cluster, g.i AS i,
                   CAST(SUM(a.q[g.i]) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM a{t} a, generate_series(1, {DIMS}) g(i)
            GROUP BY a.cluster, g.i
        )""")
        ctes.append(f"""m{t} AS (
            SELECT cluster, list((s - ((s % n) + n) % n) // n ORDER BY i) AS c
            FROM u{t} GROUP BY cluster
        )""")
        # a cluster that captured no vectors keeps its previous centroid
        ctes.append(f"""c{t} AS (
            SELECT p.cid, COALESCE(m.c, p.c) AS c
            FROM {prev} p LEFT JOIN m{t} m ON m.cluster = p.cid
        )""")
    ctes.append(f"""af AS (
        SELECT vec_id, q, cluster, dist2 FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist2, cluster
            ) AS rn
            FROM (
                SELECT q.vec_id, q.q, c.cid AS cluster,
                       {_dist2("q.q", "c.c")} AS dist2
                FROM q, c{iters} c
            )
        ) WHERE rn = 1
    )""")
    return ",\n".join(ctes)


_T = THRESHOLD_PCT / 100

_PAIRS_CTE = f"""p AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cluster AS cluster,
           {_dot("a.q", "b.q")} AS qdot,
           {_dot("a.q", "a.q")} AS na,
           {_dot("b.q", "b.q")} AS nb
    FROM af a JOIN af b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
pf AS (
    SELECT vec_a, vec_b, cluster, qdot FROM p
    WHERE qdot > 0
      AND CAST(qdot AS DOUBLE) >=
          {_T} * sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))
)"""


@query(
    "kmeans_cluster_sizes",
    driver=False,  # round-12 rotation: stable veteran slot ceded to corpus_version_diff
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_kmeans_chain()}
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(dist2) AS BIGINT) AS inertia
    FROM af GROUP BY cluster
    """,
)
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final cluster occupancy + exact integer inertia of the k-means fit
    — proves the full distributed Lloyd iteration bit-matches the oracle's
    sequential SQL replay."""
    return KM.kmeans_cluster_profile(
        load_table(spark, sf_dir, "embeddings"),
        k=K, iters=ITERS, seed=SEED, dims=DIMS,
    )


@query(
    "semdedup_pairs",
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH {_kmeans_chain()},
    {_PAIRS_CTE}
    SELECT vec_a, vec_b, cluster, qdot FROM pf
    """,
)
def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-cluster near-duplicate pairs (quantized cosine >= 0.40):
    the SemDeDup candidate stage, pair space bounded by cluster occupancy."""
    return KM.semdedup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        k=K, iters=ITERS, seed=SEED, dims=DIMS, threshold_pct=THRESHOLD_PCT,
    )


@query(
    "semdedup_survivors",
    driver=False,  # round-12 rotation: stable veteran slot ceded to sample_weighted_per_source
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_kmeans_chain()},
    {_PAIRS_CTE}
    SELECT a.vec_id, a.cluster FROM af a
    WHERE NOT EXISTS (SELECT 1 FROM pf WHERE pf.vec_b = a.vec_id)
    """,
)
def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors kept by semantic dedup (dominator keep-one per near-dup
    neighborhood) with their cluster ids."""
    return KM.semdedup_survivors(
        load_table(spark, sf_dir, "embeddings"),
        k=K, iters=ITERS, seed=SEED, dims=DIMS, threshold_pct=THRESHOLD_PCT,
    )
