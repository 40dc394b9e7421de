"""BM25 retrieval query surface with a DuckDB oracle.

The oracle replays the full pipeline — postings, document frequencies,
corpus constants, the det-ln idf, the fixed-order tf normalization, the
per-term micro-unit floor, and the rank prune — so the hash gate proves
the distributed retrieval end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


@query(
    "text_bm25_topk",
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
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
    )
    SELECT query_id, doc_id, score_micro, rnk FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC
        ) AS INTEGER) AS rnk
        FROM s2
    ) WHERE rnk <= {BM25_TOP_K}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed 4-query workload: inverted-index
    postings joined against the broadcast query terms, corpus constants on
    a single-row broadcast, per-term contributions floored to exact
    micro-units before the per-doc sum, rank-pruned per query."""
    docs = load_table(spark, sf_dir, "documents")
    return R.bm25_topk(spark, docs, BM25_QUERIES, top_k=BM25_TOP_K)
