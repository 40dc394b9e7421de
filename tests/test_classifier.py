"""Hashed-bigram averaged-perceptron quality classifier
(operators/classifier.py): equivalence against a sequential python
reference implementing the identical definition — md5-bucketed bigram
counts, curation-composite labels, batch-perceptron epochs with integer
sums, epoch-snapshot averaging — plus determinism across partitionings
and the training-objective sanity check (accuracy on the training
labels improves over the zero model)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from db_integration_via_kafka_ksql_spark.functions import text as T
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import classifier as C

DIM = 64
THRESHOLD = 0.75


def py_bucket(gram: str, dim: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % dim


def py_label(text: str, threshold: float, min_tokens: int = 50) -> int:
    """Mirror of quality_scores >= threshold, same IEEE op order."""
    w = text.split(" ")
    n_tok = float(len(w))
    n_dis = float(len(set(w)))
    stop_hits = float(
        sum(sum(1 for t in w if t in T.STOPWORDS[lang]) for lang in T.STOPWORDS)
    )
    punct = float(len(re.sub("[a-z0-9 ]", "", text))) / float(len(text))
    len_score = min(n_tok / float(min_tokens), 1.0)
    quality = (
        0.4 * len_score
        + 0.3 * (n_dis / n_tok)
        + 0.2 * (1.0 - stop_hits / n_tok)
        + 0.1 * (1.0 - punct)
    )
    return 1 if quality >= threshold else -1


def py_features(docs, dim, threshold, min_tokens=50):
    """{doc_id: (y, Counter{bucket: cnt})} with the bias row at index dim."""
    out = {}
    for doc_id, text in docs:
        w = text.split(" ")
        feats = Counter(
            py_bucket(f"{a} {b}", dim) for a, b in zip(w, w[1:])
        )
        feats[dim] += 1  # bias
        out[doc_id] = (py_label(text, threshold, min_tokens), feats)
    return out


def py_train(docs, dim, epochs, threshold, n_buckets=8):
    feats = py_features(docs, dim, threshold)
    w = [0] * (dim + 1)
    avg = [0] * (dim + 1)
    for _ in range(epochs):
        for mb in range(n_buckets):
            upd = defaultdict(int)
            for doc_id, (y, f) in feats.items():
                if (
                    int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
                    % n_buckets
                    != mb
                ):
                    continue
                margin = sum(cnt * w[b] for b, cnt in f.items())
                if y * margin <= 0:
                    for b, cnt in f.items():
                        upd[b] += y * cnt
            for b, u in upd.items():
                w[b] += u
            for i in range(dim + 1):
                avg[i] += w[i]
    return avg


def py_score(docs, weights, dim, threshold):
    feats = py_features(docs, dim, threshold)
    out = []
    for doc_id, (y, f) in feats.items():
        s = sum(cnt * weights[b] for b, cnt in f.items())
        pred = 1 if s > 0 else -1
        out.append((doc_id, y, s, pred, pred == y))
    return sorted(out)


def _corpus(spark, sf_dir, n=120):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    )
    return [(r["doc_id"], r["text"]) for r in rows]


def test_trained_weights_equal_python_model(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    sub = spark.createDataFrame(docs, "doc_id long, text string")
    got = C.train_quality_perceptron(
        sub, dim=DIM, epochs=3, threshold=THRESHOLD
    )
    want = py_train(docs, DIM, 3, THRESHOLD)
    assert got == want
    # the corpus must exercise BOTH labels or the gate proves little
    labels = {py_label(t, THRESHOLD) for _, t in docs}
    assert labels == {1, -1}


def test_scores_equal_python_model_and_beat_zero_model(spark, sf_dir):
    docs = _corpus(spark, sf_dir)
    sub = spark.createDataFrame(docs, "doc_id long, text string")
    w = C.train_quality_perceptron(sub, dim=DIM, epochs=3, threshold=THRESHOLD)
    got = sorted(
        tuple(r)
        for r in C.score_quality_perceptron(sub, w, threshold=THRESHOLD).collect()
    )
    want = py_score(docs, w, DIM, THRESHOLD)
    assert got == want
    # training objective: accuracy on the training labels beats the
    # all-negative zero model (score 0 -> pred -1 for every doc)
    acc = sum(1 for r in got if r[4]) / len(got)
    zero_acc = sum(1 for r in got if r[1] == -1) / len(got)
    assert acc > zero_acc


def test_holdout_generalization_beats_majority_baseline(spark, sf_dir):
    """Train on even doc_ids, score the UNSEEN odd docs: held-out
    accuracy must beat the majority-class baseline — the classifier
    generalizes the heuristic labels through the hashed features, it
    does not just memorize its training rows."""
    docs = _corpus(spark, sf_dir, n=300)
    train = [(d, t) for d, t in docs if d % 2 == 0]
    test = [(d, t) for d, t in docs if d % 2 == 1]
    w = C.train_quality_perceptron(
        spark.createDataFrame(train, "doc_id long, text string"),
        dim=1024, epochs=3, threshold=THRESHOLD,
    )
    got = sorted(
        tuple(r)
        for r in C.score_quality_perceptron(
            spark.createDataFrame(test, "doc_id long, text string"),
            w,
            threshold=THRESHOLD,
        ).collect()
    )
    assert got == py_score(test, w, 1024, THRESHOLD)
    labels = [r[1] for r in got]
    majority = max(labels.count(1), labels.count(-1)) / len(labels)
    acc = sum(1 for r in got if r[4]) / len(got)
    print(f"holdout acc {acc:.3f} vs majority {majority:.3f}")
    assert acc > majority


def test_training_is_deterministic_across_partitionings(spark, sf_dir):
    docs = _corpus(spark, sf_dir, n=80)
    a = spark.createDataFrame(docs, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(
        list(reversed(docs)), "doc_id long, text string"
    ).repartition(13)
    wa = C.train_quality_perceptron(a, dim=DIM, epochs=2, threshold=THRESHOLD)
    wb = C.train_quality_perceptron(b, dim=DIM, epochs=2, threshold=THRESHOLD)
    assert wa == wb


def test_single_token_docs_score_by_bias_alone(spark):
    # "ab" has no bigram: its only feature is the bias row, and training
    # still sees it (explode_outer keeps the doc; the bias union row)
    docs = [(1, "ab"), (2, "the a of and to in is it the a of and")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    w = C.train_quality_perceptron(df, dim=DIM, epochs=2, threshold=THRESHOLD)
    assert w == py_train(docs, DIM, 2, THRESHOLD)
    got = sorted(
        tuple(r)
        for r in C.score_quality_perceptron(df, w, threshold=THRESHOLD).collect()
    )
    assert got == py_score(docs, w, DIM, THRESHOLD)
