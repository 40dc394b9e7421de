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


def test_hybrid_is_reranked_subset_of_bm25_candidates(spark, sf_dir):
    """The dense stage may only REORDER lexical candidates, never invent
    documents; ranks are 1..top_k and the order key is total."""
    from db_integration_via_kafka_ksql_spark.io import load_table
    from db_integration_via_kafka_ksql_spark.operators import retrieval as R
    from db_integration_via_kafka_ksql_spark.queries.retrieval_queries import (
        BM25_QUERIES,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cand = {
        (r["query_id"], r["doc_id"])
        for r in R.bm25_topk(spark, docs, BM25_QUERIES, top_k=25).collect()
    }
    hyb = R.hybrid_topk(spark, docs, emb, BM25_QUERIES, cand_k=25, top_k=5).collect()
    assert {(r["query_id"], r["doc_id"]) for r in hyb} <= cand
    by_q: dict[int, list] = {}
    for r in sorted(hyb, key=lambda r: (r["query_id"], r["rnk"])):
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["qdot"], -r["score_micro"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys), qid
    # the dense stage actually reorders: some query's top doc differs
    # from its BM25 top doc (if it never did, the rerank would be inert)
    bm1 = {
        r["query_id"]: r["doc_id"]
        for r in R.bm25_topk(spark, docs, BM25_QUERIES, top_k=1).collect()
    }
    hy1 = {r["query_id"]: r["doc_id"] for r in hyb if r["rnk"] == 1}
    assert any(bm1[q] != hy1[q] for q in hy1)


def test_rrf_fuse_semantics(spark):
    """RRF hand-check: doc B (rank 2 + rank 1) outfuses doc A (rank 1 in
    one list only): 1e9//62 + 1e9//61 > 1e9//61; ties break on doc_id;
    n_lists counts the contributing rankers; empty input refused."""
    import pytest

    from db_integration_via_kafka_ksql_spark.operators.retrieval import (
        rrf_fuse,
    )

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id int, doc_id long, rnk int",
    )
    dense = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2)], "query_id int, doc_id long, rnk int"
    )
    got = {
        r["doc_id"]: (r["rrf_nano"], r["n_lists"], r["rnk"])
        for r in rrf_fuse([lex, dense], rrf_k=60, top_k=4).collect()
    }
    b = 10**9
    assert got[20] == (b // 62 + b // 61, 2, 1)   # fused beats singles
    assert got[10] == (b // 61, 1, 2)
    assert got[40] == (b // 62, 1, 3)
    assert got[30] == (b // 63, 1, 4)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_tfidf_keyphrases_planted(spark):
    """Hand-derivable corpus: a term shared by every doc scores ~0
    (idf ln(1+eps)), a doc-specific repeated term tops its doc, and
    hapax terms (df < min_df) are excluded entirely."""
    docs = spark.createDataFrame(
        [
            (0, "the the cat cat cat sat"),
            (1, "the dog dog sat sat mat unique1"),
            (2, "the cat dog mat mat unique2"),
        ],
        "doc_id long, text string",
    )
    out = R.tfidf_keyphrases(docs, top_k=2, min_df=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["term"]))
    for d in by_doc:
        by_doc[d] = [t for _, t in sorted(by_doc[d])]
    # per-doc winner is the doc's distinctive repeated term
    assert by_doc[0][0] == "cat"
    assert by_doc[1][0] in ("dog", "sat")
    assert by_doc[2][0] == "mat"
    # hapax terms never appear (min_df=2)
    terms = {r["term"] for r in out}
    assert "unique1" not in terms and "unique2" not in terms
    # 'the' (df == N) scores below every doc-specific winner
    the_scores = [r["score_micro"] for r in out if r["term"] == "the"]
    for s in the_scores:
        assert s <= min(
            r["score_micro"] for r in out if r["rnk"] == 1
        )
    import pytest

    with pytest.raises(ValueError, match="top_k"):
        R.tfidf_keyphrases(docs, top_k=0)
