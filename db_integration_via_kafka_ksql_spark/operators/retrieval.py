"""Full-text ranked retrieval over the corpus: BM25 via an inverted index.

The search-side companion to the dedup/curation operators: score every
document against a fixed query set with Okapi BM25 and return the top-k
per query. The scale shape is the inverted-index discipline —

- ONE tokenize pass builds the (doc_id, term, tf) postings frame
  (map-side-combined groupBy); doc lengths and document frequencies both
  derive from that frame, never from a second corpus scan;
- the query term list is tiny and broadcasts against the postings —
  retrieval is an equi-join on term, so only postings of query terms
  survive the join (at 100 TB: partition/bucket postings BY TERM and the
  scan prunes to the queried terms);
- corpus constants (N, total token count -> avgdl) ride a single-row
  broadcast, the annotated nested-loop pattern shared with lm_fluency;
- per-query top-k is rank-pruned, and the per-(query, doc) score is an
  exact BIGINT (micro-units), so ties break deterministically.

Determinism: idf uses the basic-ops ln from functions/detmath.py
(JVM/libm ``log`` differ in the last ulp); the tf normalization is a
fixed-order IEEE double sequence on exact integer inputs; each term's
contribution is floored to integer micro-units BEFORE the per-document
sum, so the sum is associative and partitioning-independent. The DuckDB
oracle in queries/retrieval_queries.py replays all of it bit-exactly.

Reference parity: the reference engine has no text-retrieval surface
(reference: deploy-ksql-cli.sh — equality predicates only); this module
belongs to the repo's LLM-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions.detmath import det_ln_sql, dlit

K1 = 1.2
B = 0.75


def bm25_idf_sql(dialect: str) -> str:
    """Okapi idf with the +1 robustness floor: ln((N-df+0.5)/(df+0.5)+1).

    The argument is always >= 1, which is exactly det_ln's domain.
    References columns n_docs (double-castable) and df."""
    arg = (
        f"((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + {dlit(0.5)})"
        f" / (CAST(df AS DOUBLE) + {dlit(0.5)}) + {dlit(1.0)})"
    )
    return det_ln_sql(arg, dialect)


def bm25_tf_sql() -> str:
    """Okapi tf normalization; references columns tf, dl, avgdl.
    Identical text in both dialects (basic ops only)."""
    dl_ratio = "(CAST(dl AS DOUBLE) / avgdl)"
    denom = (
        f"(CAST(tf AS DOUBLE) + {dlit(K1)} * "
        f"({dlit(1.0 - B)} + {dlit(B)} * {dl_ratio}))"
    )
    return f"(CAST(tf AS DOUBLE) * {dlit(K1 + 1.0)} / {denom})"


def postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf, dl): the inverted-index postings frame with the
    document length denormalized onto every posting (one window-free pass:
    tf and dl come out of the same per-doc aggregate)."""
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, "doc_id")


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    top_k: int = 10,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``queries`` is a list of (query_id, text) pairs; each query's
    whitespace terms are deduplicated (standard bag-of-words BM25 over
    the unique query terms). Output: (query_id, doc_id, score_micro,
    rnk), rnk 1..top_k ordered by (score desc, doc_id asc).
    """
    post = postings(docs).localCheckpoint(eager=True)
    return bm25_from_postings(post, queries, top_k=top_k)


def bm25_from_postings(
    post: DataFrame,
    queries: list[tuple[int, str]],
    top_k: int = 10,
) -> DataFrame:
    """BM25 scoring over an EXISTING postings frame (doc_id, term, tf,
    dl) — the serve half of bm25_topk, split out so an incrementally
    maintained index (streaming/retrievalindex.py) serves through the
    exact code path the batch oracle gates. Corpus constants (df, N,
    avgdl) are derived from the postings themselves, so a prefix-exact
    index yields prefix-exact scores."""
    from pyspark.sql.window import Window

    spark = post.sparkSession
    df_frame = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    consts = post.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").cast("long").alias("total_tokens"),
    ).select(
        "n_docs",
        (F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
         ).alias("avgdl"),
    )
    qterms = spark.createDataFrame(
        sorted({(qid, t) for qid, text in queries for t in text.split(" ") if t}),
        "query_id int, term string",
    )
    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_frame), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                f"CAST(floor({dlit(1e6)} * {bm25_idf_sql('spark')}"
                f" * {bm25_tf_sql()}) AS BIGINT)"
            ).alias("contrib"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").cast("long").alias("score_micro"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= top_k)
    )


def tfidf_keyphrases(
    docs: DataFrame, top_k: int = 5, min_df: int = 2
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the topic
    tagger/keyword extractor of a curation pass (what is this document
    ABOUT, cheaply, corpus-aware): score = (tf/dl) * ln((N+1)/(df+1)),
    integer-floored to micro units with the det-ln idf so the whole
    chain replays bit-for-bit in SQL. Terms seen in fewer than `min_df`
    documents are dropped (hapax typos score artificially high);
    corpus-wide terms suppress themselves through the idf.

    The idf argument (N+1)/(df+1) >= 1 always (df <= N) — det_ln's
    domain; micro-flooring before the rank makes ties engine-exact,
    broken by term asc.

    Scale shape: the postings pass is the shared BM25 front half (two
    map-side-combined aggregates, one join), df is one term-keyed
    aggregate, N rides a single-row broadcast (annotated NLJ), and the
    per-doc top-k is a doc_id-partitioned window — no global sort, no
    corpus re-scan. Output: (doc_id, term, score_micro, rnk).
    """
    post = postings(docs).localCheckpoint(eager=True)  # feeds df AND scores
    return tfidf_from_postings(post, top_k=top_k, min_df=min_df)


def tfidf_from_postings(
    post: DataFrame, top_k: int = 5, min_df: int = 2
) -> DataFrame:
    """TF-IDF keyphrases over an EXISTING postings frame (doc_id, term,
    tf, dl) — the serve half of tfidf_keyphrases, split out (the
    bm25_from_postings precedent) so the incrementally maintained index
    (streaming/retrievalindex.py) tags documents through the exact code
    path the batch oracle gates. df and N derive from the postings, so
    a prefix-exact index yields prefix-exact keyphrases."""
    from pyspark.sql.window import Window

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    df_frame = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = post.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    idf = det_ln_sql(
        "((CAST(n_docs AS DOUBLE) + 1e0) / (CAST(df AS DOUBLE) + 1e0))",
        "spark",
    )
    # the df frame is the FULL term dictionary — corpus-sized at scale,
    # so it joins by key (unlike BM25's broadcast of a few QUERY terms)
    scored = (
        post.join(df_frame.filter(F.col("df") >= min_df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.expr(
                f"CAST(floor({dlit(1e6)} * (CAST(tf AS DOUBLE)"
                f" / CAST(dl AS DOUBLE)) * {idf}) AS BIGINT)"
            ).alias("score_micro"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= top_k)
        .select("doc_id", "term", "score_micro", "rnk")
    )


def hybrid_topk(
    spark: SparkSession,
    docs: DataFrame,
    embeddings: DataFrame,
    queries: list[tuple[int, str]],
    cand_k: int = 25,
    top_k: int = 5,
) -> DataFrame:
    """Hybrid lexical->semantic retrieval: BM25 generates cand_k
    candidates per query (cheap, inverted-index), then the candidates —
    and ONLY the candidates — are re-ranked by quantized embedding
    cosine against the query's own vector (query_id == vec_id, the
    repo's aligned id space). The standard two-stage serving shape:
    the expensive dense scorer touches cand_k rows per query instead of
    the corpus.

    Scale shape: the candidate frame is |queries| x cand_k rows — it
    BROADCASTS into the corpus-embedding scan (an equi-join on vec_id
    prunes the embedding table to candidates; nothing corpus-sized
    shuffles), and the query vectors ride a second broadcast. Rerank
    score is the exact integer qdot; final order (qdot desc,
    score_micro desc, doc_id asc) is total, so the cut is deterministic.

    Output: (query_id, doc_id, score_micro, qdot, rnk), rnk 1..top_k.
    """
    from pyspark.sql.window import Window

    from db_integration_via_kafka_ksql_spark.functions import vector as V

    cands = bm25_topk(spark, docs, queries, top_k=cand_k).select(
        "query_id", "doc_id", "score_micro"
    )
    qz = embeddings.select("vec_id", V.quantize("embedding").alias("q"))
    qids = sorted({qid for qid, _ in queries})
    qvec = qz.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    scored = (
        qz.join(F.broadcast(cands), qz["vec_id"] == cands["doc_id"])
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "doc_id",
            "score_micro",
            F.expr(
                "aggregate(zip_with(q, qq, (x, y) -> x * y), "
                "cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("qdot"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= top_k)
    )


def rrf_fuse(
    ranked: list[DataFrame], rrf_k: int = 60, top_k: int = 5
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    fuse any number of per-query ranked lists by summing 1/(rrf_k + rnk)
    across the lists each document appears in — the standard
    score-free alternative to hybrid_topk's weighted rerank (no
    cross-system score calibration needed; rank position is the only
    signal, which is why rrf_k=60 is the near-universal default).

    Exactness: each contribution is the INTEGER 1e9 DIV (rrf_k + rnk) —
    nano-units, no division of doubles — so the fused score is a plain
    BIGINT sum and the DuckDB oracle replays it exactly. Final order
    (rrf_nano DESC, doc_id ASC) is total.

    Inputs are (query_id, doc_id, rnk) frames, rnk 1-based; each ranker
    emits its own bounded top-R list (the fusion operates on
    |queries| x R rows per list, never corpus-sized frames — the
    rankers themselves are the scale paths).

    Output: (query_id, doc_id, rrf_nano, n_lists, rnk), rnk 1..top_k.
    """
    from pyspark.sql.window import Window

    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    unioned = ranked[0].select("query_id", "doc_id", "rnk")
    for r in ranked[1:]:
        unioned = unioned.unionByName(r.select("query_id", "doc_id", "rnk"))
    contrib = unioned.withColumn(
        "_c",
        F.expr(f"CAST(1000000000 AS BIGINT) DIV ({int(rrf_k)} + rnk)"),
    )
    fused = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("_c").cast("bigint").alias("rrf_nano"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("rrf_nano").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rnk", F.row_number().over(win).cast("int"))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "doc_id", "rrf_nano", "n_lists", "rnk")
    )
