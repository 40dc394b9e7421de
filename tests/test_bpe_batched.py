"""Batched BPE training passes (r15 verdict Next #6): bpe_train with
batch_m > 1 applies up to m merges per pass via the maximal SAFE PREFIX
of the sorted candidates (symbol-disjoint, each member's count strictly
above every earlier member's max adjacent-trigram bound — the tight cap
on any pair a previous merge can create). The contract is SEQUENCE
IDENTITY with the one-merge-per-pass model; these tests prove it by
property over random corpora and measure the pass saving."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
    bpe_train,
)
from tests.test_extensions import _py_bpe_train

_SETTINGS = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)

_word = st.text(alphabet="abcd", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=3, max_size=10).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=4)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@_SETTINGS
@given(texts=_corpus, m=st.sampled_from([2, 4]))
def test_batched_merge_sequence_identical(spark, texts, m):
    """For ANY corpus and batch width, the batched trainer learns the
    EXACT merge sequence of the sequential model (and of the python
    reference), in never more passes."""
    docs = _docs(spark, texts)
    seq_stats: dict = {}
    bat_stats: dict = {}
    want = bpe_train(docs, n_merges=6, stats=seq_stats)
    got = bpe_train(docs, n_merges=6, batch_m=m, stats=bat_stats)
    assert got == want == _py_bpe_train(texts, n_merges=6)
    assert bat_stats["passes"] <= seq_stats["passes"]
    assert sum(bat_stats["batch_sizes"]) == len(got)
    assert all(1 <= s <= m for s in bat_stats["batch_sizes"])


def test_batched_pass_count_measured(spark):
    """The saving is real on the reference corpus: same 12-merge table,
    strictly fewer passes at batch_m=4 (measured, not assumed)."""
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "aaaa aaab abab banana",
        "low newer banana aaaa",
    ]
    docs = _docs(spark, texts)
    seq_stats: dict = {}
    bat_stats: dict = {}
    want = bpe_train(docs, n_merges=12, stats=seq_stats)
    got = bpe_train(docs, n_merges=12, batch_m=4, stats=bat_stats)
    assert got == want == _py_bpe_train(texts, n_merges=12)
    assert seq_stats["passes"] == 12
    assert bat_stats["passes"] < seq_stats["passes"]
    print(
        f"passes: sequential={seq_stats['passes']} "
        f"batched={bat_stats['passes']} sizes={bat_stats['batch_sizes']}"
    )


def test_batched_rejects_bad_width(spark):
    import pytest

    docs = _docs(spark, ["ab ab"])
    with pytest.raises(ValueError, match="batch_m"):
        bpe_train(docs, n_merges=2, batch_m=0)


def test_bpe_train_oracle_matches_python_on_adversarial_corpus():
    """The r16 DuckDB trainer replay (_bpe_train_oracle) against the
    sequential python model on the overlap-heavy corpus ('aaaa' run
    parity, tie-breaks, multi-char merged symbols) — pure DuckDB, no
    Spark: proves the run-parity rewrite IS the fold, independent of
    the registry corpus the parity gate uses."""
    import duckdb

    # registry first: the query modules import each other in the fixed
    # order registry establishes (direct import = circular)
    from db_integration_via_kafka_ksql_spark import registry  # noqa: F401
    from db_integration_via_kafka_ksql_spark.queries.text_queries import (
        _bpe_train_oracle,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "aaaa aaab abab banana",
        "low newer banana aaaa aaaaaa",
        "xyxyxyxy zzzzz",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    for t in texts:
        con.execute("INSERT INTO documents VALUES (?)", [t])
    got = con.execute(_bpe_train_oracle(10)).fetchall()
    want = [
        (i + 1, a, b) for i, (a, b) in enumerate(_py_bpe_train(texts, 10))
    ]
    assert sorted(got) == sorted(want) and len(got) == 10


def test_bpe_encode_oracle_matches_python_on_adversarial_corpus():
    """The train->encode oracle (_bpe_encode_oracle) against the classic
    lowest-rank-first python encoder on the overlap-heavy corpus PLUS
    empty-word shapes (consecutive/leading/trailing spaces, empty text —
    the r16 review's confirmed divergence case): pure DuckDB, no Spark.
    Covers the rank-ascending == lowest-rank-first equivalence argument
    with a localized failure instead of an opaque sf-corpus gate."""
    import duckdb

    from db_integration_via_kafka_ksql_spark import registry  # noqa: F401
    from db_integration_via_kafka_ksql_spark.queries.text_queries import (
        _bpe_encode_oracle,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "aaaa aaab abab banana",
        "ab  ab",            # consecutive spaces -> empty middle word
        " leading and trailing ",
        "",                  # empty text -> one empty word
        "xyxyxyxy zzzzz aaaaaa",
    ]
    n_merges = 8
    merges = _py_bpe_train(texts, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}

    def encode_word(word):
        pieces = list(word)
        while len(pieces) > 1:
            best_rank = best_i = None
            for i in range(len(pieces) - 1):
                r = ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            pieces[best_i : best_i + 2] = [
                pieces[best_i] + pieces[best_i + 1]
            ]
        return pieces

    want = []
    for d, t in enumerate(texts):
        words = t.split(" ")
        enc = [encode_word(w) for w in words]
        want.append(
            (
                d,
                len(words),
                sum(len(e) for e in enc),
                " | ".join(" ".join(e) for e in enc),
            )
        )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for d, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [d, t])
    got = sorted(con.execute(_bpe_encode_oracle(n_merges)).fetchall())
    assert got == sorted(want)
