"""BM25 retrieval query surface with a DuckDB oracle.

The oracle replays the full pipeline — postings, document frequencies,
corpus constants, the det-ln idf, the fixed-order tf normalization, the
per-term micro-unit floor, and the rank prune — so the hash gate proves
the distributed retrieval end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions.detmath import dlit
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import retrieval as R
from db_integration_via_kafka_ksql_spark.registry import query

BM25_QUERIES: list[tuple[int, str]] = [
    (0, "hash join"),
    (1, "stream window agg"),
    (2, "dup scan"),
    (3, "fast vector sort the"),
]
BM25_TOP_K = 10

_QVALUES = ", ".join(f"({qid}, '{t}')" for qid, text in BM25_QUERIES
                     for t in sorted(set(text.split(" "))))



def _bm25_ctes() -> str:
    """The full BM25 replay as a reusable CTE chain ending in
    `ranked(query_id, doc_id, score_micro, rnk)` — shared verbatim by the
    text_bm25_topk oracle and the hybrid-rerank oracle, so the two can
    never drift apart."""
    return f"""terms AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM terms GROUP BY 1, 2
    ),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM terms GROUP BY 1
    ),
    post AS (
        SELECT tf.doc_id, term, tf, dl FROM tf JOIN dl ON tf.doc_id = dl.doc_id
    ),
    dff AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1
    ),
    consts AS (
        SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE)
                 / CAST(count(DISTINCT doc_id) AS DOUBLE) AS avgdl
        FROM post
    ),
    q(query_id, term) AS (VALUES {_QVALUES}),
    scored AS (
        SELECT q.query_id, post.doc_id,
               CAST(floor({dlit(1e6)} * {R.bm25_idf_sql('duckdb')}
                          * {R.bm25_tf_sql()}) AS BIGINT) AS contrib
        FROM post
        JOIN q ON post.term = q.term
        JOIN dff ON post.term = dff.term
        CROSS JOIN consts
    ),
    s2 AS (
        SELECT query_id, doc_id, CAST(sum(contrib) AS BIGINT) AS score_micro
        FROM scored GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC
        ) AS INTEGER) AS rnk
        FROM s2
    )"""


@query(
    "text_bm25_topk",
    driver=False,  # round-13 rotation: stable veteran slot ceded to text_rrf_fusion_topk
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_bm25_ctes()}
    SELECT query_id, doc_id, score_micro, rnk FROM ranked
    WHERE rnk <= {BM25_TOP_K}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed 4-query workload: inverted-index
    postings joined against the broadcast query terms, corpus constants on
    a single-row broadcast, per-term contributions floored to exact
    micro-units before the per-doc sum, rank-pruned per query."""
    docs = load_table(spark, sf_dir, "documents")
    return R.bm25_topk(spark, docs, BM25_QUERIES, top_k=BM25_TOP_K)


HYBRID_CAND_K = 25
HYBRID_TOP_K = 5
_QIDS_SQL = ", ".join(str(qid) for qid, _ in BM25_QUERIES)
_QUANT = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))"
)
_HYBRID_QDOT = (
    "CAST(list_sum([dv.q[i] * qv.q[i] for i in generate_series(1, 64)]) AS BIGINT)"
)


@query(
    "text_hybrid_bm25_cosine_topk",
    # round-12 rotation: promoted into the driver window
    oracle=f"""
    WITH {{ctes}},
    cand AS (
        SELECT query_id, doc_id, score_micro FROM ranked
        WHERE rnk <= {HYBRID_CAND_K}
    ),
    dv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
    qv AS (SELECT vec_id, {_QUANT} AS q FROM embeddings
           WHERE vec_id IN ({_QIDS_SQL})),
    rr AS (
        SELECT c.query_id, c.doc_id, c.score_micro, {_HYBRID_QDOT} AS qdot
        FROM cand c
        JOIN dv ON dv.vec_id = c.doc_id
        JOIN qv ON qv.vec_id = c.query_id
    )
    SELECT query_id, doc_id, score_micro, qdot, rnk FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id
            ORDER BY qdot DESC, score_micro DESC, doc_id ASC
        ) AS INTEGER) AS rnk
        FROM rr
    ) WHERE rnk <= {HYBRID_TOP_K}
    """.replace("{ctes}", _bm25_ctes()),
)
def text_hybrid_bm25_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval (retrieval.hybrid_topk): BM25 generates
    {cand_k} lexical candidates per query, the dense scorer re-ranks ONLY
    those by exact quantized cosine against the query's own embedding
    (query_id == vec_id) — the serving shape where the expensive scorer
    never touches the corpus. Oracle replays the shared BM25 CTE chain
    plus the candidate-pruned qdot rerank."""
    return R.hybrid_topk(
        spark,
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        BM25_QUERIES,
        cand_k=HYBRID_CAND_K,
        top_k=HYBRID_TOP_K,
    )


RRF_R = 25       # each ranker contributes its top-R list
RRF_K = 60       # the near-universal RRF constant
RRF_TOP_K = 5


@query(
    "text_rrf_fusion_topk",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    # replay: both ranked lists (the shared BM25 CTE chain + the brute
    # cosine ranking), then pure-integer fusion — each contribution is
    # 1e9 // (60 + rnk), summed as BIGINT; no score calibration, no
    # doubles, total (rrf_nano DESC, doc_id ASC) order
    oracle=f"""
    WITH {{ctes}},
    lex AS (
        SELECT query_id, doc_id, rnk FROM ranked WHERE rnk <= {RRF_R}
    ),
    qv0 AS (SELECT vec_id, {_QUANT} AS q FROM embeddings),
    ds AS (
        SELECT qs.vec_id AS query_id, c.vec_id AS doc_id,
               CAST(list_sum([c.q[i] * qs.q[i]
                              for i in generate_series(1, 64)]) AS BIGINT)
                   AS qdot
        FROM qv0 qs JOIN qv0 c
          ON qs.vec_id IN ({_QIDS_SQL}) AND c.vec_id <> qs.vec_id
    ),
    dense AS (
        SELECT query_id, doc_id, rnk FROM (
            SELECT query_id, doc_id, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY qdot DESC, doc_id ASC
            ) AS INTEGER) AS rnk
            FROM ds
        ) WHERE rnk <= {RRF_R}
    ),
    u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
    f AS (
        SELECT query_id, doc_id,
               CAST(sum(1000000000 // ({RRF_K} + rnk)) AS BIGINT) AS rrf_nano,
               CAST(count(*) AS BIGINT) AS n_lists
        FROM u GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_nano, n_lists, rnk FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_nano DESC, doc_id ASC
        ) AS INTEGER) AS rnk
        FROM f
    ) WHERE rnk <= {RRF_TOP_K}
    """.replace("{ctes}", _bm25_ctes()),
)
def text_rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the lexical and dense rankers
    (retrieval.rrf_fuse): BM25 top-{R} and brute-cosine top-{R} lists
    fused by integer 1e9//(60+rnk) contributions — the calibration-free
    hybrid (vs text_hybrid_bm25_cosine_topk's cascade, which needs the
    dense score to rerank). The brute cosine list is the oracle-exact
    stand-in for the IVF scale path."""
    from db_integration_via_kafka_ksql_spark.operators import similarity as S

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = R.bm25_topk(spark, docs, BM25_QUERIES, top_k=RRF_R).select(
        "query_id", "doc_id", "rnk"
    )
    qids = [qid for qid, _ in BM25_QUERIES]
    dense = S.brute_topk(emb, qids, k=RRF_R).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rnk"
    )
    return R.rrf_fuse([lex, dense], rrf_k=RRF_K, top_k=RRF_TOP_K)


TFIDF_TOP_K = 5
TFIDF_MIN_DF = 2


def _tfidf_oracle() -> str:
    from db_integration_via_kafka_ksql_spark.functions.detmath import (
        det_ln_sql,
    )

    idf = det_ln_sql(
        "((CAST(n_docs AS DOUBLE) + 1e0) / (CAST(df AS DOUBLE) + 1e0))",
        "duckdb",
    )
    return f"""
    WITH terms AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM terms GROUP BY 1, 2
    ),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM terms GROUP BY 1
    ),
    dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(floor({dlit(1e6)} * (CAST(tf.tf AS DOUBLE)
                 / CAST(dl.dl AS DOUBLE)) * {idf}) AS BIGINT) AS score_micro
        FROM tf
        JOIN dl USING (doc_id)
        JOIN dfreq USING (term), n
        WHERE dfreq.df >= {TFIDF_MIN_DF}
    ),
    ranked AS (
        SELECT doc_id, term, score_micro,
               CAST(row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_micro DESC, term ASC
               ) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT doc_id, term, score_micro, rnk
    FROM ranked WHERE rnk <= {TFIDF_TOP_K}
    """


@query(
    "text_tfidf_keyphrases",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-14 rotation: promoted into the external driver window
    oracle=_tfidf_oracle(),
)
def text_tfidf_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by micro-unit TF-IDF
    (retrieval.tfidf_keyphrases — det-ln idf, tf/dl normalization,
    min_df hapax filter): the corpus-aware 'what is this doc about'
    tagger of a curation pass, replayed end to end by the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return R.tfidf_keyphrases(docs, top_k=TFIDF_TOP_K, min_df=TFIDF_MIN_DF)
