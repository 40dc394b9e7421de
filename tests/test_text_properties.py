"""Property-based tests (hypothesis) for the training-pipeline text
operators, each differential against a plain-Python reference model —
the operator must agree with the obvious sequential implementation for
EVERY corpus, not just the fixtures.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import text_analysis as TA

# small shared vocabulary → realistic n-gram collisions
_word = st.sampled_from(["a", "b", "c", "dd", "ee", "xyz"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _docs_df(spark, texts, with_source=False):
    if with_source:
        rows = [(i, "s" if i % 2 else "t", t) for i, t in enumerate(texts)]
        return spark.createDataFrame(rows, ["doc_id", "source", "text"])
    return spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])


def _grams(words: list[str], n: int, text: str) -> list[str]:
    if len(words) < n:
        return [text]
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus)
def test_repetition_matches_counter_model(spark, texts):
    out = {r["doc_id"]: r for r in TA.repetition_stats(_docs_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        words = t.split(" ")
        r = out[i]
        assert r["n_tokens"] == len(words)
        for n, label in ((2, "bigram"), (3, "trigram")):
            c = Counter(_grams(words, n, t))
            top = max(c.values())
            dup = sum(v for v in c.values() if v >= 2)
            assert r[f"top_{label}_n"] == top, (t, n)
            assert r[f"dup_{label}_n"] == dup, (t, n)
            if len(words) < n:  # no true n-gram → fraction undefined
                assert r[f"top_{label}_frac"] is None
                assert r[f"dup_{label}_frac"] is None
            else:
                assert r[f"top_{label}_frac"] == n * top / len(words)
                assert r[f"dup_{label}_frac"] == n * dup / len(words)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=8), mod=st.integers(2, 4))
def test_decontaminate_matches_set_model(spark, texts, mod):
    n = 3
    out = {
        r["doc_id"]: r
        for r in TA.decontaminate(_docs_df(spark, texts), bench_mod=mod, n=n).collect()
    }
    bench: set[str] = set()
    for i, t in enumerate(texts):
        if i % mod == 0:
            bench |= set(_grams(t.split(" "), n, t))
    for i, t in enumerate(texts):
        if i % mod == 0:
            assert i not in out  # bench docs never reported
            continue
        grams = set(_grams(t.split(" "), n, t))
        overlap = len(grams & bench)
        assert out[i]["n_grams"] == len(grams)
        assert out[i]["n_overlap"] == overlap
        assert out[i]["contaminated"] == (1 if overlap else 0)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus, capacity=st.integers(2, 16))
def test_pack_sequences_shardwise_running_model(spark, texts, capacity):
    """Offsets are the contiguous running sum per shard in doc_id order;
    spans are the chunk indices the doc's token range covers; per-shard
    token totals are conserved."""
    rows = TA.pack_sequences(
        _docs_df(spark, texts, with_source=True),
        capacity=capacity,
        shard_cols=("source",),
    ).collect()
    by_shard: dict[str, list] = {}
    for r in rows:
        by_shard.setdefault(r["source"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rs:
            assert r["start_offset"] == offset  # contiguous, no gaps
            end = offset + r["n_tokens"]
            assert r["first_seq"] == offset // capacity
            assert r["last_seq"] == (end - 1) // capacity
            assert r["first_seq"] <= r["last_seq"]
            offset = end
        assert offset == sum(r["n_tokens"] for r in rs)  # conservation


_pii_bits = st.lists(
    st.sampled_from(
        [
            "plain",
            "words",
            "go-here",
            "bob.smith+x@corp.example.org",
            "u7@ex.io",
            "25-989-741-2988",
            "555-867-5309",
            "192.168.0.1",
            "10.0.200.7",
        ]
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(bits=_pii_bits)
def test_scrub_pii_removes_everything_and_is_idempotent(spark, bits):
    """After one scrub pass no pattern matches remain (rescrubbing the
    redacted text is the identity and counts drop to zero)."""
    df = _docs_df(spark, [" ".join(bits)])
    once = TA.scrub_pii(df).collect()[0]
    again = TA.scrub_pii(
        spark.createDataFrame([(1, once["redacted"])], ["doc_id", "text"])
    ).collect()[0]
    assert (again["n_email"], again["n_phone"], again["n_ipv4"]) == (0, 0, 0)
    assert again["redacted"] == once["redacted"]
    # counts on the original text match a python re count of the same regexes
    import re

    text = " ".join(bits)
    for cat, pat in TA.PII_PATTERNS.items():
        expected = len(re.findall(pat, text))
        assert once[f"n_{cat}"] == expected, cat


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(n_docs=st.integers(2, 20), seed=st.sampled_from(["a", "b"]),
       epoch=st.integers(0, 3))
def test_epoch_shuffle_matches_python_md5_model(spark, n_docs, seed, epoch):
    """The permutation equals sorting doc ids by
    md5('{seed}|{epoch}|{doc_id}') computed in plain Python."""
    import hashlib

    df = spark.createDataFrame(
        [(i, "w") for i in range(n_docs)], ["doc_id", "text"]
    )
    got = [r["doc_id"] for r in TA.epoch_shuffle(df, seed=seed, epoch=epoch).collect()]
    want = sorted(
        range(n_docs),
        key=lambda i: hashlib.md5(f"{seed}|{epoch}|{i}".encode()).hexdigest(),
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(n_docs=st.integers(1, 20), k=st.integers(1, 6))
def test_sample_k_per_stratum_matches_python_model(spark, n_docs, k):
    """Selected ids per stratum == the k smallest md5('{seed}|{id}') in
    that stratum, computed in plain Python."""
    import hashlib
    from collections import defaultdict

    rows = [(i, "s" if i % 2 else "t") for i in range(n_docs)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = defaultdict(set)
    for r in TA.sample_k_per_stratum(df, k=k, seed="sP").collect():
        got[r["source"]].add(r["doc_id"])
    want = defaultdict(list)
    for i, src in rows:
        want[src].append(i)
    for src, ids in want.items():
        top = sorted(
            ids, key=lambda i: hashlib.md5(f"sP|{i}".encode()).hexdigest()
        )[:k]
        assert got[src] == set(top)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    avails=st.lists(st.integers(1, 10_000), min_size=1, max_size=8),
    budget=st.integers(1, 60_000),
)
def test_token_budget_mixture_waterfill_properties(spark, avails, budget):
    """Water-filling invariants for every supply profile and budget:
    no stratum exceeds its supply; when the budget covers the corpus
    everything is kept; otherwise allocations sum to the budget and
    capped strata all sit at one common level >= every uncapped supply."""
    # build supply directly: one doc per stratum whose token count == avail
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * a), f"src{i:02d}") for i, a in enumerate(avails)],
        ["doc_id", "text", "source"],
    )
    out = {
        r["source"]: r
        for r in TA.token_budget_mixture(docs, budget_tokens=budget).collect()
    }
    assert len(out) == len(avails)
    total = sum(avails)
    got_alloc = {s: r["allocated_tokens"] for s, r in out.items()}
    for s, r in out.items():
        assert r["allocated_tokens"] <= r["available_tokens"] + 1e-9
        assert 0.0 < r["keep_frac"] <= 1.0
    if budget >= total:
        assert all(r["keep_frac"] == 1.0 for r in out.values())
    else:
        assert abs(sum(got_alloc.values()) - budget) < 1e-6
        capped = [r for r in out.values() if r["keep_frac"] < 1.0]
        assert capped, "over-budget corpus must cap at least one stratum"
        levels = {round(r["allocated_tokens"], 6) for r in capped}
        assert len(levels) == 1  # one common water level
        level = levels.pop()
        for r in out.values():
            if r["keep_frac"] == 1.0:
                assert r["available_tokens"] <= level + 1e-6


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=8), mod=st.integers(2, 4))
def test_decontaminate_bloom_superset_property(spark, texts, mod):
    """For ANY corpus: the bloom variant never misses an exact overlap
    (per-doc n_overlap >= the set-model count), and n_grams agree."""
    n = 3
    out = {
        r["doc_id"]: r
        for r in TA.decontaminate_bloom(
            _docs_df(spark, texts), bench_mod=mod, n=n
        ).collect()
    }
    bench: set[str] = set()
    for i, t in enumerate(texts):
        if i % mod == 0:
            bench |= set(_grams(t.split(" "), n, t))
    for i, t in enumerate(texts):
        if i % mod == 0:
            assert i not in out
            continue
        grams = set(_grams(t.split(" "), n, t))
        assert out[i]["n_grams"] == len(grams)
        assert out[i]["n_overlap"] >= len(grams & bench)
        if grams & bench:
            assert out[i]["contaminated"] == 1


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=_corpus,
    window=st.integers(2, 8),
    stride_frac=st.integers(1, 100),
)
def test_chunk_documents_matches_python_model(spark, texts, window, stride_frac):
    """chunk_documents == the obvious sequential splitter for any corpus,
    window, and stride <= window: same starts, same chunk texts, full
    token coverage, no chunk crossing a doc boundary."""
    stride = max(1, (window * stride_frac) // 100)
    got = {}
    rows = TA.chunk_documents(
        _docs_df(spark, texts), window=window, stride=stride
    ).collect()
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_token, r.n_tokens, r.chunk_text)
        )
    for doc_id, text in enumerate(texts):
        words = text.split(" ")
        n = len(words)
        starts = [0]
        while starts[-1] + window < n:
            starts.append(starts[-1] + stride)
        expect = [
            (
                s // stride,
                s,
                min(window, n - s),
                " ".join(words[s : s + window]),
            )
            for s in starts
        ]
        assert sorted(got.get(doc_id, [])) == sorted(expect), (
            doc_id, text, window, stride,
        )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    avails=st.lists(st.integers(1, 40), min_size=1, max_size=5),
    budget=st.integers(1, 400),
)
def test_temperature_mixture_properties(spark, avails, budget):
    """Allocations sum to the budget, follow sqrt proportions, and
    keep_frac == min(1, repeat_factor) for arbitrary supplies."""
    import math

    rows = [
        (100 * s + i, "w " * (tokens - 1) + "w", f"s{s}")
        for s, tokens in enumerate(avails)
        for i, tokens in [(0, tokens)]
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    plan = TA.temperature_mixture(docs, budget_tokens=budget, alpha=0.5).collect()
    assert len(plan) == len(avails)
    total = sum(r.allocated_tokens for r in plan)
    assert abs(total - budget) <= 1e-9 * max(1, budget) * len(avails)
    wsum = sum(math.sqrt(a) for a in avails)
    for r in plan:
        s = int(r.source[1:])
        expect = budget * math.sqrt(avails[s]) / wsum
        assert abs(r.allocated_tokens - expect) < 1e-6
        assert abs(r.keep_frac - min(1.0, r.repeat_factor)) < 1e-12


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=8))
def test_containment_matches_set_model(spark, texts):
    """ngram_containment_pairs == the python set model |A∩B|/min(|A|,|B|)
    for arbitrary corpora (threshold 0 keeps every co-shingled pair)."""
    from db_integration_via_kafka_ksql_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(
            _docs_df(spark, texts), n=2, threshold=0.0
        ).collect()
    }
    sets = {
        i: set(_grams(t.split(" "), 2, t)) for i, t in enumerate(texts)
    }
    expect = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                expect[(a, b)] = len(sets[a] & sets[b]) / min(
                    len(sets[a]), len(sets[b])
                )
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-12


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=8), cap=st.integers(1, 6))
def test_minhash_bucket_cap_is_subset_and_rerank_exact(spark, texts, cap):
    """Capped pairs ⊆ uncapped pairs with identical Jaccard values
    (the cap only removes candidates, never rescores), for arbitrary
    corpora and caps."""
    from db_integration_via_kafka_ksql_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = _docs_df(spark, texts)
    plain = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.1).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.1, bucket_cap=cap).collect()
    }
    assert set(capped) <= set(plain)
    for k, v in capped.items():
        assert v == plain[k]


def test_lm_fluency_hand_computed_exact(spark):
    """Bigram LM fluency on a hand-derivable corpus: cu(a)=3, cu(b)=2,
    V=3 (a, b, z), cb('a b')=2, cb('b a')=1 ->
    doc 1: ppm('a b') = 1e6*3//6 = 500000, ppm('b a') = 1e6*2//5 = 400000;
    doc 2: 500000; doc 3 has no bigram (NULL avg, zero counts)."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "z")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in TA.lm_fluency_scores(docs).collect()}
    assert (got[1]["n_bigrams"], got[1]["sum_ppm"]) == (2, 900000)
    assert got[1]["avg_ppm"] == 450000.0
    assert (got[2]["n_bigrams"], got[2]["sum_ppm"]) == (1, 500000)
    assert got[2]["avg_ppm"] == 500000.0
    assert (got[3]["n_bigrams"], got[3]["sum_ppm"]) == (0, 0)
    assert got[3]["avg_ppm"] is None


def test_lm_fluency_ranks_incoherent_text_below_corpus_like(spark):
    """The signal does its job: a doc made of transitions the corpus has
    never seen scores below docs whose transitions are corpus-frequent."""
    common = [(i, "the cat sat on the mat") for i in range(1, 9)]
    docs = common + [(100, "mat the on cat the sat")]  # same tokens, alien order
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_ppm"] for r in TA.lm_fluency_scores(df).collect()}
    assert got[100] < got[1]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=_corpus,
    tnum=st.sampled_from([(1, 3), (1, 2), (2, 3), (9, 10)]),
)
def test_allpairs_prefix_filter_lossless_model(spark, texts, tnum):
    """AllPairs == python set-Jaccard ground truth for EVERY corpus and
    threshold — the prefix filter, size filter, fingerprinting, and
    integer threshold test may never lose (or invent) a pair."""
    import hashlib

    from db_integration_via_kafka_ksql_spark.operators import dedup as D

    num, den = tnum
    df = _docs_df(spark, texts)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.allpairs_jaccard_pairs(
            df, n=3, threshold_num=num, threshold_den=den
        ).collect()
    }

    def fp(words, text):
        grams = _grams(words, 3, text)
        return {
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        }

    sets = {i: fp(t.split(" "), t) for i, t in enumerate(texts)}
    want = set()
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * den >= num * union:
                    want.add((a, b))
    assert got == want
