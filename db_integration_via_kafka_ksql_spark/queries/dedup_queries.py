"""Deduplication query surface with DuckDB oracles.

The MinHash/SimHash/Jaccard SQL below is generated from the same
parameters (k, bands, thresholds, salts) as the Spark operators — the two
engines compute the same md5-derived integers/strings, so candidate sets
and scores coincide exactly. See operators/dedup.py for the scale design
of each operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from db_integration_via_kafka_ksql_spark.functions.vector import (
    lsh_bucket_sql_duckdb,
    quantize_sql_duckdb,
)
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import dedup as D
from db_integration_via_kafka_ksql_spark.operators import graph as G
from db_integration_via_kafka_ksql_spark.registry import query

_W = "string_split(text, ' ')"

MINHASH_K = 8
MINHASH_BANDS = 4
MINHASH_THRESHOLD = 0.7
NGRAM_N = 3
NGRAM_THRESHOLD = 0.2
SIMHASH_MAX_HAMMING = 3
EMB_THRESHOLD_PCT = 40
EMB_LSH_PLANES = 4
DIMS = 64


@query(
    "dedup_exact",
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_doc,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(load_table(spark, sf_dir, "documents"))


def _minhash_pair_ctes(k: int, bands: int, bucket_cap: int | None = None) -> str:
    """CTE chain ending in `scored(doc_a, doc_b, inter, sz_sum)` — shared
    by the pair oracle, the cluster-retention composite (which embeds it
    inside a larger WITH RECURSIVE), and the bucket-capped variant."""
    rows = k // bands
    sig_cols = ",\n               ".join(
        f"min(md5('s{i}|' || w)) AS h{i}" for i in range(k)
    )
    band_selects = []
    for b in range(bands):
        key = " || ".join(f"h{b * rows + r}" for r in range(rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, {key} AS band_key FROM sig"
        )
    bands_sql = "\n        UNION ALL ".join(band_selects)
    if bucket_cap is None:
        cap_ctes = "\n    bands AS (SELECT * FROM bands0),"
    else:
        cap_ctes = f"""
    hot AS (
        SELECT band_id, band_key FROM bands0
        GROUP BY band_id, band_key HAVING count(*) > {bucket_cap}
    ),
    bands AS (
        SELECT b.* FROM bands0 b
        WHERE NOT EXISTS (
            SELECT 1 FROM hot h
            WHERE h.band_id = b.band_id AND h.band_key = b.band_key
        )
    ),"""
    return f"""sets AS (SELECT doc_id, list_distinct({_W}) AS ws FROM documents),
    w AS (SELECT doc_id, unnest(ws) AS w FROM sets),
    sig AS (
        SELECT doc_id,
               {sig_cols}
        FROM w GROUP BY doc_id
    ),
    bands0 AS (
        {bands_sql}
    ),{cap_ctes}
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(sa.ws, sb.ws)) AS BIGINT) AS inter,
               len(sa.ws) + len(sb.ws) AS sz_sum
        FROM cand
        JOIN sets sa ON sa.doc_id = doc_a
        JOIN sets sb ON sb.doc_id = doc_b
    )"""


def _minhash_oracle(k: int, bands: int, threshold: float) -> str:
    return f"""
    WITH {_minhash_pair_ctes(k, bands)}
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(sz_sum - inter AS DOUBLE) AS jaccard
    FROM scored
    WHERE CAST(inter AS DOUBLE) / CAST(sz_sum - inter AS DOUBLE) >= {threshold}
    """


@query(
    "dedup_minhash_lsh",
    driver=False,  # round-12 rotation: stable veteran slot ceded to dedup_allpairs_jaccard
    oracle=_minhash_oracle(MINHASH_K, MINHASH_BANDS, MINHASH_THRESHOLD),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
    )


_SH3 = (
    f"CASE WHEN len({_W}) < {NGRAM_N} THEN [text] "
    f"ELSE [array_to_string(list_slice({_W}, i, i + {NGRAM_N - 1}), ' ') "
    f"for i in generate_series(1, len({_W}) - {NGRAM_N - 1})] END"
)


@query(
    "dedup_ngram_jaccard",
    driver=False,  # uncapped baseline twin of dedup_ngram_jaccard_capped
    oracle=f"""
    WITH sh AS (SELECT doc_id, list_distinct({_SH3}) AS sh FROM documents),
    inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(sh) AS sz FROM sh)
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
          >= {NGRAM_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=NGRAM_N, threshold=NGRAM_THRESHOLD
    )


def _simhash_sql(words_sql: str) -> str:
    """DuckDB mirror of functions.text.simhash16_expr."""
    h = "('0x' || substr(md5(w), 1, 4))::BIGINT"
    bits = []
    for j in range(16):
        vote = (
            f"list_sum([CASE WHEN ({h} // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END "
            f"for w in {words_sql}])"
        )
        bits.append(f"(CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


_SIMHASH = _simhash_sql(f"list_distinct({_W})")


@query(
    "dedup_simhash_pairs",
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, CAST({_SIMHASH} AS BIGINT) AS simhash FROM documents
    ),
    bands AS (
        SELECT doc_id, simhash, 0 AS band_id, simhash % 256 AS bk FROM fp
        UNION ALL
        SELECT doc_id, simhash, 1 AS band_id, simhash // 256 AS bk FROM fp
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {SIMHASH_MAX_HAMMING}
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=SIMHASH_MAX_HAMMING
    )


_QUANTIZE = quantize_sql_duckdb()
_QDOT = f"CAST(list_sum([a.q[i] * b.q[i] for i in generate_series(1, {DIMS})]) AS BIGINT)"
_EMB_COND = (
    f"CAST(qdot AS DOUBLE) >= {EMB_THRESHOLD_PCT / 100} * "
    f"sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))"
)


@query(
    "dedup_embedding_pairs",
    driver=False,  # brute-force oracle baseline of the LSH variants
    oracle=f"""
    WITH q AS (
        SELECT vec_id, {_QUANTIZE} AS q,
               CAST(list_sum([x * x for x in {_QUANTIZE}]) AS BIGINT) AS n2
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_QDOT} AS qdot, a.n2 AS na, b.n2 AS nb
        FROM q a JOIN q b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, qdot FROM scored WHERE qdot > 0 AND {_EMB_COND}
    """,
)
def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force baseline (exact): every pair scored. The scale path is
    dedup_embedding_pairs_lsh below."""
    return D.embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold_pct=EMB_THRESHOLD_PCT,
        brute_force=True,
    )


@query(
    "dedup_embedding_pairs_lsh",
    driver=False,  # single-probe twin of dedup_embedding_pairs_lsh_mp
    oracle=f"""
    WITH q0 AS (
        SELECT vec_id, {_QUANTIZE} AS q,
               CAST(list_sum([x * x for x in {_QUANTIZE}]) AS BIGINT) AS n2
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, q, n2, {lsh_bucket_sql_duckdb('q', EMB_LSH_PLANES, DIMS)} AS bucket
        FROM q0
    ),
    scored AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_QDOT} AS qdot, a.n2 AS na, b.n2 AS nb
        FROM q a JOIN q b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, qdot FROM scored WHERE qdot > 0 AND {_EMB_COND}
    """,
)
def dedup_embedding_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs: candidates restricted to one
    hyperplane bucket (recall < 1 by design; pair space /2^planes)."""
    return D.embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold_pct=EMB_THRESHOLD_PCT,
        n_planes=EMB_LSH_PLANES,
        dims=DIMS,
        brute_force=False,
    )


_PROBES = "[bucket" + "".join(
    f", xor(bucket, {1 << i})" for i in range(EMB_LSH_PLANES)
) + "]"


@query(
    "dedup_embedding_pairs_lsh_mp",
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
    oracle=f"""
    WITH q0 AS (
        SELECT vec_id, {_QUANTIZE} AS q,
               CAST(list_sum([x * x for x in {_QUANTIZE}]) AS BIGINT) AS n2
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, q, n2,
               {lsh_bucket_sql_duckdb('q', EMB_LSH_PLANES, DIMS)} AS bucket
        FROM q0
    ),
    qp AS (SELECT vec_id, q, n2, unnest({_PROBES}) AS probe FROM q),
    scored AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_QDOT} AS qdot, a.n2 AS na, b.n2 AS nb
        FROM qp a JOIN q b ON a.probe = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, qdot FROM scored WHERE qdot > 0 AND {_EMB_COND}
    """,
)
def dedup_embedding_pairs_lsh_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH near-dup pairs: each vector also probes the
    n_planes buckets one bit-flip away. Candidate space ×(planes+1),
    recall 12→29 of 59 brute pairs at sf0.01 (test_extensions.py floors)."""
    return D.embedding_dup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold_pct=EMB_THRESHOLD_PCT,
        n_planes=EMB_LSH_PLANES,
        dims=DIMS,
        brute_force=False,
        multiprobe=True,
    )


@query(
    "dedup_clusters_embedding",
    driver=False,  # round-15 rotation: veteran slot ceded (allpairs/containment/edit/semdedup keep the dedup family's external slots)
    # the multi-probe pair CTEs verbatim, then connected components via a
    # recursive reachability CTE (UNION = set semantics, so cycles
    # terminate); rep = min vec_id per component — the same deterministic
    # keep-one rule the Spark operator uses.
    oracle=f"""
    WITH RECURSIVE q0 AS (
        SELECT vec_id, {_QUANTIZE} AS q,
               CAST(list_sum([x * x for x in {_QUANTIZE}]) AS BIGINT) AS n2
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, q, n2,
               {{bucket_expr}} AS bucket
        FROM q0
    ),
    qp AS (SELECT vec_id, q, n2, unnest({_PROBES}) AS probe FROM q),
    scored AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_QDOT} AS qdot, a.n2 AS na, b.n2 AS nb
        FROM qp a JOIN q b ON a.probe = b.bucket AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT vec_a, vec_b FROM scored WHERE qdot > 0 AND {_EMB_COND}
    ),
    edges AS (
        SELECT vec_a AS s, vec_b AS t FROM pairs
        UNION ALL
        SELECT vec_b, vec_a FROM pairs
    ),
    reach(src, node) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.src, e.t FROM reach r JOIN edges e ON r.node = e.s
    )
    SELECT CAST(src AS BIGINT) AS vec_id,
           CAST(min(node) AS BIGINT) AS cluster_rep,
           (src = min(node)) AS is_rep
    FROM reach GROUP BY src
    """.replace(
        "{bucket_expr}", lsh_bucket_sql_duckdb("q", EMB_LSH_PLANES, DIMS)
    ),
)
def dedup_clusters_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: multi-probe LSH pairs → connected components
    (min-label propagation + pointer jumping, operators/graph.py) →
    (vec_id, cluster_rep, is_rep). `is_rep` is the keep-one curation mask:
    filtering on it yields the deduplicated corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_dup_pairs(
        emb,
        threshold_pct=EMB_THRESHOLD_PCT,
        n_planes=EMB_LSH_PLANES,
        dims=DIMS,
        multiprobe=True,
    )
    return G.dedup_clusters(emb, pairs, "vec_id", "vec_a", "vec_b")


NGRAM_DF_CAP = 30


@query(
    "dedup_ngram_jaccard_capped",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    oracle=f"""
    WITH sh AS (SELECT doc_id, list_distinct({_SH3}) AS sh FROM documents),
    inv0 AS (SELECT doc_id, unnest(sh) AS g FROM sh),
    hot AS (SELECT g FROM inv0 GROUP BY g HAVING count(*) > {NGRAM_DF_CAP}),
    inv AS (SELECT * FROM inv0 WHERE g NOT IN (SELECT g FROM hot)),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(sh) AS sz FROM sh)
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
          >= {NGRAM_THRESHOLD}
    """,
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path n-gram Jaccard: shingles in more than NGRAM_DF_CAP
    docs are dropped from the inverted index (a df(g)>cap shingle would
    emit >cap²/2 candidate pairs while carrying no dedup signal — the
    standard hot-term cut). Jaccard uses capped intersections over full
    set sizes, i.e. a lower bound; pairs found are real near-dups."""
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        n=NGRAM_N,
        threshold=NGRAM_THRESHOLD,
        df_cap=NGRAM_DF_CAP,
    )


# cluster-retention composite: quality pieces shared with the curation
# oracles (acyclic import — text_queries does not import this module)
from db_integration_via_kafka_ksql_spark.operators import (  # noqa: E402
    text_analysis as TA,
)
from db_integration_via_kafka_ksql_spark.queries.text_queries import (  # noqa: E402
    _DW,
    _QUALITY_EXPR,
    _STOP_SUM,
)


@query(
    "dedup_minhash_keep_best",
    driver=False,  # aux: retention composite over the minhash pair family
    oracle=f"""
    WITH RECURSIVE {_minhash_pair_ctes(MINHASH_K, MINHASH_BANDS)},
    pairs AS (
        SELECT doc_a, doc_b FROM scored
        WHERE CAST(inter AS DOUBLE) / CAST(sz_sum - inter AS DOUBLE)
              >= {MINHASH_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS s, doc_b AS t FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.t FROM reach r JOIN edges e ON r.node = e.s
    ),
    cl AS (
        SELECT src AS doc_id, min(node) AS cluster_rep
        FROM reach GROUP BY src
    ),
    qscored AS (
        SELECT doc_id, {_QUALITY_EXPR} AS quality
        FROM (
            SELECT doc_id,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    ),
    ranked AS (
        SELECT cl.cluster_rep, cl.doc_id, q.quality,
               row_number() OVER (
                   PARTITION BY cl.cluster_rep
                   ORDER BY q.quality DESC, cl.doc_id ASC
               ) AS rn,
               count(*) OVER (PARTITION BY cl.cluster_rep) AS n_members
        FROM cl JOIN qscored q ON q.doc_id = cl.doc_id
    )
    SELECT CAST(cluster_rep AS BIGINT) AS cluster_rep,
           doc_id AS keep_id,
           quality AS best_quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def dedup_minhash_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup curation composite: MinHash/LSH pairs →
    connected-component clusters → quality-aware retention (keep each
    cluster's best-quality member, operators/dedup.keep_best_per_cluster)
    — what a production pipeline runs instead of keep-min-id when
    duplicate copies differ in quality. Singleton docs keep themselves
    (n_members = 1)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, threshold=MINHASH_THRESHOLD
    )
    clusters = G.dedup_clusters(docs, pairs, "doc_id", "doc_a", "doc_b")
    quality = TA.quality_scores(docs, min_tokens=50).select("doc_id", "quality")
    members = clusters.select("doc_id", "cluster_rep").join(quality, "doc_id")
    return D.keep_best_per_cluster(
        members, "cluster_rep", "doc_id", "quality"
    ).withColumnRenamed("best_score", "best_quality")


CONTAINMENT_THRESHOLD = 0.8


@query(
    "dedup_ngram_containment",
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH sh AS (SELECT doc_id, list_distinct({_SH3}) AS sh FROM documents),
    inv0 AS (SELECT doc_id, unnest(sh) AS g FROM sh),
    hot AS (SELECT g FROM inv0 GROUP BY g HAVING count(*) > {NGRAM_DF_CAP}),
    inv AS (SELECT * FROM inv0 WHERE g NOT IN (SELECT g FROM hot)),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(sh) AS sz FROM sh)
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)
               AS containment
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)
          >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs, scale path: the smaller doc's shingles mostly
    inside the other's — quotes/excerpts Jaccard structurally misses.
    Same df-cap hot-shingle guard (and the same lower-bound semantics)
    as the capped Jaccard slot: capped intersections over FULL set
    sizes, so reported containment never exceeds the true value."""
    return D.ngram_containment_pairs(
        load_table(spark, sf_dir, "documents"),
        n=NGRAM_N,
        threshold=CONTAINMENT_THRESHOLD,
        df_cap=NGRAM_DF_CAP,
    )


SPLIT_SALT = "split1"
SPLIT_WEIGHTS = [("train", 80), ("val", 10), ("test", 10)]


@query(
    "split_leakage_free",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    # promoted to the driver window round 9 (rotation)
    oracle=f"""
    WITH RECURSIVE {_minhash_pair_ctes(MINHASH_K, MINHASH_BANDS)},
    pairs AS (
        SELECT doc_a, doc_b FROM scored
        WHERE CAST(inter AS DOUBLE) / CAST(sz_sum - inter AS DOUBLE)
              >= {MINHASH_THRESHOLD}
    ),
    edges AS (
        SELECT doc_a AS s, doc_b AS t FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, node) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.t FROM reach r JOIN edges e ON r.node = e.s
    ),
    cl AS (
        SELECT src AS doc_id, CAST(min(node) AS BIGINT) AS cluster_rep
        FROM reach GROUP BY src
    ),
    b AS (
        SELECT doc_id, cluster_rep,
               ('0x' || substr(md5('{SPLIT_SALT}|'
                    || CAST(cluster_rep AS VARCHAR)), 1, 8))::BIGINT % 100
                   AS bucket
        FROM cl
    )
    SELECT doc_id, cluster_rep,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val/test splits: near-dup (MinHash) cluster
    members always share a split — the train/test contamination guard
    per-doc hash splitting cannot give."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, k=MINHASH_K, bands=MINHASH_BANDS, threshold=MINHASH_THRESHOLD
    )
    return G.leakage_free_splits(
        docs, pairs, "doc_id", "doc_a", "doc_b",
        weights=SPLIT_WEIGHTS, salt=SPLIT_SALT,
    )


MINHASH_BUCKET_CAP = 50


@query(
    "dedup_minhash_lsh_capped",
    driver=False,  # aux: hot-band-bucket guarded twin of dedup_minhash_lsh
    oracle=f"""
    WITH {_minhash_pair_ctes(MINHASH_K, MINHASH_BANDS, MINHASH_BUCKET_CAP)}
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(sz_sum - inter AS DOUBLE) AS jaccard
    FROM scored
    WHERE CAST(inter AS DOUBLE) / CAST(sz_sum - inter AS DOUBLE)
          >= {MINHASH_THRESHOLD}
    """,
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs with the band-bucket occupancy cap: buckets holding
    more than MINHASH_BUCKET_CAP docs are dropped before the self-join —
    the batch path's guard against a boilerplate bucket emitting m²/2
    candidates (documented recall trade; precision unaffected by the
    exact rerank)."""
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        threshold=MINHASH_THRESHOLD,
        bucket_cap=MINHASH_BUCKET_CAP,
    )


EDIT_PREFILTER_JACCARD = 0.5
EDIT_MAX_DIST = 20


@query(
    "dedup_edit_verified",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH {{ctes}}
    SELECT s.doc_a, s.doc_b,
           CAST(s.inter AS DOUBLE) / CAST(s.sz_sum - s.inter AS DOUBLE)
               AS jaccard,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
    FROM scored s
    JOIN documents da ON da.doc_id = s.doc_a
    JOIN documents db ON db.doc_id = s.doc_b
    WHERE CAST(s.inter AS DOUBLE) / CAST(s.sz_sum - s.inter AS DOUBLE)
          >= {EDIT_PREFILTER_JACCARD}
      AND levenshtein(da.text, db.text) <= {EDIT_MAX_DIST}
    """.format(ctes=_minhash_pair_ctes(MINHASH_K, MINHASH_BANDS)),
)
def dedup_edit_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup with exact character-level confirmation
    (operators/dedup.edit_verified_pairs): MinHash-LSH candidates,
    word-set Jaccard prefilter >= {EDIT_PREFILTER_JACCARD}, then
    Levenshtein <= {EDIT_MAX_DIST} over the raw texts — rejecting
    scrambled-order false positives the set-similarity stages cannot
    see. Spark's levenshtein and DuckDB's compute the identical
    unit-cost DP, so the full pipeline is hash-parity-exact."""
    return D.edit_verified_pairs(
        load_table(spark, sf_dir, "documents"),
        k=MINHASH_K,
        bands=MINHASH_BANDS,
        prefilter_jaccard=EDIT_PREFILTER_JACCARD,
        max_dist=EDIT_MAX_DIST,
    )


ALLPAIRS_NUM = 1
ALLPAIRS_DEN = 2


@query(
    "dedup_allpairs_jaccard",
    # round-12 rotation: promoted into the driver window
    oracle=f"""
    WITH sh AS (SELECT doc_id,
                       list_distinct(list_transform({_SH3},
                           g -> ('0x' || substr(md5(g), 1, 15))::BIGINT))
                         AS sh
                FROM documents),
    inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS inter
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS sz FROM sh)
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
             AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter * {ALLPAIRS_DEN} >= {ALLPAIRS_NUM} * (sa.sz + sb.sz - inter)
    """,
)
def dedup_allpairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs prefix-filtered shingle-Jaccard pairs (Bayardo et al. 2007,
    operators/dedup.allpairs_jaccard_pairs). The oracle is the EXHAUSTIVE
    inverted-index join — every pair sharing >= 1 shingle — so a parity
    match proves the prefix filter is lossless at the threshold, not just
    that both sides agree on some pruned subset."""
    return D.allpairs_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        n=NGRAM_N,
        threshold_num=ALLPAIRS_NUM,
        threshold_den=ALLPAIRS_DEN,
    )


@query(
    "quality_neighbor_smoothing",
    driver=False,  # round-15 rotation: veteran slot (r12) ceded; quality family keeps drift + calibrated slots
    # round-12 rotation: promoted into the driver window
    oracle=f"""
    WITH q0 AS (
        SELECT vec_id, {_QUANTIZE} AS q,
               CAST(list_sum([x * x for x in {_QUANTIZE}]) AS BIGINT) AS n2
        FROM embeddings
    ),
    qb AS (
        SELECT vec_id, q, n2,
               {lsh_bucket_sql_duckdb('q', EMB_LSH_PLANES, DIMS)} AS bucket
        FROM q0
    ),
    qp AS (SELECT vec_id, q, n2, unnest({_PROBES}) AS probe FROM qb),
    pairs AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM qp a JOIN qb b ON a.probe = b.bucket AND a.vec_id < b.vec_id
        WHERE {_QDOT} > 0 AND
              CAST({_QDOT} AS DOUBLE) >= {EMB_THRESHOLD_PCT / 100}
                * sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))
    ),
    edges AS (
        SELECT vec_a AS doc_id, vec_b AS nbr FROM pairs
        UNION ALL SELECT vec_b, vec_a FROM pairs
    ),
    qual AS (
        SELECT doc_id,
               CAST(floor(({_QUALITY_EXPR}) * 1000) AS BIGINT) AS qp
        FROM (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    ),
    nbr AS (
        SELECT e.doc_id,
               CAST(count(*) AS BIGINT) AS n_neighbors,
               CAST(sum(nq.qp) AS BIGINT) AS nsum
        FROM edges e JOIN qual nq ON nq.doc_id = e.nbr
        GROUP BY 1
    )
    SELECT nbr.doc_id,
           qual.qp AS q_own_permille,
           n_neighbors,
           nsum // n_neighbors AS q_nbr_mean_permille,
           nsum // n_neighbors - qual.qp AS delta_permille
    FROM nbr JOIN qual ON qual.doc_id = nbr.doc_id
    """,
)
def quality_neighbor_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-quality smoothing over the multi-probe LSH similarity
    graph (text_analysis.quality_neighbor_smoothing): each connected
    doc's own quality vs the integer mean of its semantic neighbors' —
    the label-propagation disagreement signal for curation."""
    return TA.quality_neighbor_smoothing(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        threshold_pct=EMB_THRESHOLD_PCT,
        n_planes=EMB_LSH_PLANES,
        dims=DIMS,
    )
