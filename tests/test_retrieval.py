"""BM25 semantics beyond oracle parity: agreement with a sequential
python reference (within det-ln tolerance), rare-term dominance, and
bag-of-words query-term dedup."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import retrieval as R

CORPUS = [
    (1, "spark shuffles data across the cluster"),
    (2, "broadcast joins avoid the shuffle entirely"),
    (3, "shuffle shuffle shuffle everywhere shuffle"),
    (4, "catalyst optimizes the logical plan"),
    (5, "adaptive execution replans the shuffle at runtime"),
]


def _python_bm25(corpus, query_terms, k1=R.K1, b=R.B):
    docs = {i: t.split(" ") for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    scores = {}
    for did, words in docs.items():
        s = 0
        for t in sorted(set(query_terms)):
            tf = words.count(t)
            if not tf:
                continue
            df = sum(1 for w in docs.values() if t in w)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
            tfc = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(words) / avgdl))
            s += math.floor(1e6 * idf * tfc)
        scores[did] = s
    return scores


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score_micro"]
        for r in R.bm25_topk(spark, docs, [(0, "shuffle data")], top_k=5).collect()
    }
    want = _python_bm25(CORPUS, ["shuffle", "data"])
    want = {d: s for d, s in want.items() if s > 0}
    assert set(got) == set(want)
    for d, s in want.items():
        # det-ln differs from math.log by < 3e-6 absolute -> after the
        # 1e6 floor each term contribution can shift by a few micro-units
        assert abs(got[d] - s) <= 10, (d, got[d], s)


def test_rare_term_dominates_ranking(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = R.bm25_topk(spark, docs, [(0, "catalyst shuffle")], top_k=5).collect()
    by_rank = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rnk"])]
    # 'catalyst' appears in exactly one doc (4); its idf beats the
    # common 'shuffle' term, so doc 4 must rank first
    assert by_rank[0] == 4


def test_duplicate_query_terms_count_once(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    once = R.bm25_topk(spark, docs, [(0, "shuffle")], top_k=5).collect()
    twice = R.bm25_topk(spark, docs, [(0, "shuffle shuffle")], top_k=5).collect()
    key = lambda rows: sorted((r["doc_id"], r["score_micro"]) for r in rows)
    assert key(once) == key(twice)


def test_query_with_no_matching_terms_returns_empty(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = R.bm25_topk(spark, docs, [(0, "zebra unicorn")], top_k=5).collect()
    assert rows == []
