"""Exact maximal duplicate-substring extraction (Lee et al. 2022 signal,
operators/text_analysis.duplicate_substring_matches / duplicate_cut_spans):
planted-long-dup tests with EXACT expected boundaries, and a property
gate against a sequential python reference model implementing the same
definition (maximal pairwise verbatim matches >= L tokens == maximal
diagonal runs of matching L-grams — the equivalence the operator's
docstring states)."""

from __future__ import annotations

import random
from collections import defaultdict

from db_integration_via_kafka_ksql_spark.operators import text_analysis as TA


def model_matches(docs, L, occ_cap=64, min_count=2):
    """Sequential reference: all maximal pairwise match runs, both sides."""
    grams = defaultdict(list)
    for d, text in docs:
        w = text.split(" ")
        for i in range(max(len(w) - L + 1, 0)):
            grams[" ".join(w[i : i + L])].append((d, i))
    diag = defaultdict(set)
    for ps in grams.values():
        if not (min_count <= len(ps) <= occ_cap):
            continue
        for x in ps:
            for y in ps:
                if x < y:
                    diag[(x[0], y[0], y[1] - x[1])].add(x[1])
    out = []
    for (da, db, delta), poss in diag.items():
        sp = sorted(poss)
        runs, s, e = [], sp[0], sp[0]
        for p in sp[1:]:
            if p == e + 1:
                e = p
            else:
                runs.append((s, e))
                s = e = p
        runs.append((s, e))
        for s, e in runs:
            out.append((da, s, e + L, db, s + delta))
            out.append((db, s + delta, e + delta + L, da, s))
    return sorted(out)


def model_cut_spans(matches):
    """Per-doc interval union of match spans, n_runs = merged row count."""
    per = defaultdict(list)
    for d, s, e, *_ in matches:
        per[d].append((s, e))
    out = []
    for d, spans in per.items():
        spans.sort()
        cs, ce, n = spans[0][0], spans[0][1], 1
        for s, e in spans[1:]:
            if s > ce:
                out.append((d, cs, ce, n))
                cs, ce, n = s, e, 1
            else:
                ce, n = max(ce, e), n + 1
        out.append((d, cs, ce, n))
    return sorted(out)


def _docs_df(spark, docs):
    return spark.createDataFrame(list(docs), "doc_id long, text string")


def _collect_matches(spark, docs, L, **kw):
    df = TA.duplicate_substring_matches(_docs_df(spark, docs), min_tokens=L, **kw)
    return sorted(tuple(r) for r in df.collect())


def _collect_cuts(spark, docs, L, **kw):
    df = TA.duplicate_cut_spans(_docs_df(spark, docs), min_tokens=L, **kw)
    return sorted(tuple(r) for r in df.collect())


def _tokens(prefix, n):
    return [f"{prefix}{i}" for i in range(n)]


def test_planted_long_dup_boundaries_are_exact(spark):
    """Two docs share an exact 40-token block at different offsets: ONE
    maximal match each side, boundaries exactly the planted offsets."""
    shared = _tokens("s", 40)
    doc_a = _tokens("a", 7) + shared + _tokens("x", 5)    # block at [7, 47)
    doc_b = _tokens("b", 13) + shared + _tokens("y", 9)   # block at [13, 53)
    docs = [(0, " ".join(doc_a)), (1, " ".join(doc_b))]
    got = _collect_matches(spark, docs, L=8)
    assert got == [(0, 7, 47, 1, 13), (1, 13, 53, 0, 7)]
    assert _collect_cuts(spark, docs, L=8) == [(0, 7, 47, 1), (1, 13, 53, 1)]


def test_partial_overlap_third_doc_matches_model(spark):
    """A third doc shares only the middle 20 tokens of the block: its
    match extent must stop exactly at the shared region."""
    shared = _tokens("s", 40)
    docs = [
        (0, " ".join(_tokens("a", 7) + shared + _tokens("x", 5))),
        (1, " ".join(_tokens("b", 13) + shared + _tokens("y", 9))),
        (2, " ".join(_tokens("c", 3) + shared[10:30] + _tokens("z", 4))),
    ]
    got = _collect_matches(spark, docs, L=8)
    assert got == model_matches(docs, L=8)
    # doc 2's region [3, 23) maps to shared[10:30]; its matches with docs
    # 0 and 1 must start/end exactly there
    doc2 = [m for m in got if m[0] == 2]
    assert {(m[1], m[2]) for m in doc2} == {(3, 23)}
    assert _collect_cuts(spark, docs, L=8) == model_cut_spans(got)


def test_within_doc_repeat_is_a_match(spark):
    block = _tokens("r", 12)
    doc = _tokens("u", 4) + block + _tokens("v", 6) + block + _tokens("w", 3)
    docs = [(5, " ".join(doc))]
    got = _collect_matches(spark, docs, L=8)
    # one diagonal (5, 5, delta=18), run covering the block both sides
    assert got == [(5, 4, 16, 5, 22), (5, 22, 34, 5, 4)]
    assert _collect_cuts(spark, docs, L=8) == [(5, 4, 16, 1), (5, 22, 34, 1)]


def test_random_corpus_equals_python_model(spark):
    """Small-vocab random corpus (seeded) forces organic gram collisions;
    the distributed result must equal the sequential model exactly —
    matches AND merged cut spans."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(20, 80))))
        for d in range(12)
    ]
    L = 4
    got = _collect_matches(spark, docs, L=L)
    want = model_matches(docs, L=L)
    assert got == want
    assert _collect_cuts(spark, docs, L=L) == model_cut_spans(want)


def test_occ_cap_drops_ultra_hot_grams(spark):
    """A gram occurring in more docs than occ_cap is dropped before
    pairing (boilerplate cap): with cap below the group size there are
    no spans; raising the cap restores them — and matches the model
    under the same cap either way."""
    boiler = _tokens("h", 8)
    docs = [
        (d, " ".join(_tokens(f"u{d}_", 3) + boiler + _tokens(f"v{d}_", 2)))
        for d in range(6)
    ]
    assert _collect_matches(spark, docs, L=8, occ_cap=5) == []
    assert _collect_cuts(spark, docs, L=8, occ_cap=5) == []
    got = _collect_matches(spark, docs, L=8, occ_cap=64)
    assert got == model_matches(docs, L=8, occ_cap=64)
    # every doc's boilerplate interval found, against all 5 partners
    cuts = _collect_cuts(spark, docs, L=8, occ_cap=64)
    assert cuts == [(d, 3, 11, 5) for d in range(6)]


def test_two_partners_same_span_merges_deterministically(spark):
    """Regression for the round-8 flaky parity: a doc span matching TWO
    different partners emits two IDENTICAL (doc_id, start, end) rows, so
    ORDER BY (start, end) is not total and the pre-fix island windows
    could split one island into duplicate output rows depending on tie
    order. Post-fix (pre-aggregate to unique spans, n_runs = sum(cnt))
    the result is one island with n_runs=2, stable across runs."""
    shared = _tokens("s", 22)
    docs = [
        (50, " ".join(shared + _tokens("q", 3))),   # span [0, 22) both pairs
        (51, " ".join(_tokens("b", 5) + shared)),
        (52, " ".join(_tokens("c", 9) + shared)),
    ]
    want = model_cut_spans(model_matches(docs, L=8))
    assert (50, 0, 22, 2) in want
    for _ in range(5):
        assert _collect_cuts(spark, docs, L=8) == want


def test_short_docs_and_no_dups_yield_empty(spark):
    docs = [(0, "only three words"), (1, "entirely different text here")]
    assert _collect_matches(spark, docs, L=8) == []
    assert _collect_cuts(spark, docs, L=8) == []


def model_removal(docs, cuts):
    """Apply cut intervals: drop tokens inside any interval, rejoin."""
    per = {d: [] for d, _ in docs}
    for d, s, e, _ in cuts:
        per[d].append((s, e))
    out = []
    for d, text in docs:
        w = text.split(" ")
        keep = [
            t for i, t in enumerate(w)
            if not any(s <= i < e for s, e in per[d])
        ]
        out.append((d, " ".join(keep), len(w), len(w) - len(keep), len(keep)))
    return sorted(out)


def test_cut_span_removal_matches_model(spark):
    """The APPLIED dedup step: exact duplicate intervals are cut from the
    text, survivors rejoin in order; untouched docs pass through whole
    and an all-duplicate doc shrinks to the empty string."""
    shared = _tokens("s", 22)
    docs = [
        (0, " ".join(shared)),                      # pure duplicate -> ''
        (1, " ".join(_tokens("b", 5) + shared)),    # prefix survives
        (2, " ".join(_tokens("c", 4))),             # untouched
    ]
    cuts = model_cut_spans(model_matches(docs, L=8))
    want = model_removal(docs, cuts)
    got = sorted(
        tuple(r)
        for r in TA.remove_duplicate_spans(
            _docs_df(spark, docs), min_tokens=8
        ).collect()
    )
    assert got == want
    by_doc = {r[0]: r for r in got}
    assert by_doc[0][1] == "" and by_doc[0][4] == 0
    assert by_doc[1][1] == " ".join(_tokens("b", 5)) and by_doc[1][3] == 22
    assert by_doc[2][3] == 0 and by_doc[2][1] == docs[2][1]


def test_cut_span_removal_random_corpus_matches_model(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(10)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(15, 60))))
        for d in range(10)
    ]
    cuts = model_cut_spans(model_matches(docs, L=4))
    want = model_removal(docs, cuts)
    got = sorted(
        tuple(r)
        for r in TA.remove_duplicate_spans(
            _docs_df(spark, docs), min_tokens=4
        ).collect()
    )
    assert got == want
