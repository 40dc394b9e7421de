"""Property-based tests (hypothesis) for the round-13 hardening surface:

1. ParquetStateStore crash-anywhere recovery: for ANY batch sequence and
   ANY crash plan over the swap's vulnerable windows (between the two
   publish renames; after publish before old-copy cleanup), recovery +
   idempotent replay converge to exactly the dict-replay state — the
   property form of the targeted crash tests in test_streaming.py.
2. Audio energy fingerprint == the sequential python model for ANY byte
   payload (every length class emerges from random bytes).
3. CMS join-size estimates are one-sided (>= exact) for ANY pair of key
   multisets, and exact when the grid is wide enough that live keys
   cannot collide.
"""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_integration_via_kafka_ksql_spark.operators import multimodal as M
from db_integration_via_kafka_ksql_spark.operators import sketches as SK
from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_SCHEMA = "id long, payload string, __deleted string, offset long"

# batches of (key, payload, deleted) over a tiny key space (collisions,
# deletes, delete-all, reinserts all emerge)
_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=9),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)
_crash_plan = st.lists(
    st.sampled_from(["none", "between", "after"]), min_size=4, max_size=4
)


def _apply_with_crash(store, df, mode, monkey_site):
    """Apply one batch, optionally crashing inside the swap at `mode`;
    on crash, replay the same batch (the structured-streaming retry)."""
    import os as _os
    import shutil as _shutil

    if mode == "none":
        store.apply_batch(df)
        return
    if mode == "between":
        real = _os.rename

        def crash(src, dst):
            if src == store.path:
                real(src, dst)
                raise RuntimeError("crash between renames")
            return real(src, dst)

        monkey_site.setattr(_os, "rename", crash)
    else:  # after publish, before old-copy cleanup
        real_rm = _shutil.rmtree

        def crash(path, *a, **kw):
            if "__old_" in str(path):
                raise RuntimeError("crash before old cleanup")
            return real_rm(path, *a, **kw)

        monkey_site.setattr(_shutil, "rmtree", crash)
    try:
        store.apply_batch(df)
    except RuntimeError:
        pass
    monkey_site.undo()
    store.apply_batch(df)  # replay converges (idempotent same-batch)


@_SETTINGS
@given(batches=_batches, plan=_crash_plan)
def test_state_store_recovers_from_any_crash_plan(
    spark, tmp_path_factory, batches, plan
):
    import pytest

    store = ParquetStateStore(
        spark,
        str(tmp_path_factory.mktemp("scp") / "s"),
        key_cols=["id"],
        order_cols=["offset"],
        n_buckets=4,
    )
    model: dict[int, str] = {}
    off = 0
    mp = pytest.MonkeyPatch()
    try:
        for batch, mode in zip(batches, plan):
            rows = []
            for key, payload, deleted in batch:
                off += 1
                rows.append(
                    (key, None if deleted else f"p{payload}",
                     "true" if deleted else "false", off)
                )
                if deleted:
                    model.pop(key, None)
                else:
                    model[key] = f"p{payload}"
            df = spark.createDataFrame(rows, _SCHEMA)
            _apply_with_crash(store, df, mode, mp)
    finally:
        mp.undo()
    got = {r["id"]: r["payload"] for r in store.read().collect()}
    assert got == model
    # no orphan siblings survive the final recovery sweep
    import os

    parent = os.path.dirname(store.path)
    base = os.path.basename(store.path)
    assert not any(
        n.startswith(base + "__") for n in os.listdir(parent)
    )


def _fp_model(b: bytes):
    k = len(b) // 2
    if k == 0:
        return 0, 0, 0
    xs = struct.unpack(f"<{k}h", b[: 2 * k])
    e = [0] * 65
    for j, x in enumerate(xs):
        e[j * 65 // k] += x * x
    bits = [1 if e[t + 1] > e[t] else 0 for t in range(64)]
    lo = sum(bit << i for i, bit in enumerate(bits[:32]))
    hi = sum(bit << i for i, bit in enumerate(bits[32:]))
    return k, lo, hi


@_SETTINGS
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=400), min_size=1, max_size=8
    )
)
def test_audio_fingerprint_matches_model_on_any_bytes(spark, payloads):
    media = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: (r["n_samples"], r["fp_lo"], r["fp_hi"])
        for r in M.audio_energy_fingerprint(media).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == _fp_model(p), (i, len(p))


@_SETTINGS
@given(
    left=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=25),
    right=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=25),
)
def test_cms_join_size_one_sided_for_any_multisets(spark, left, right):
    from collections import Counter

    from pyspark.sql import functions as F

    lf = spark.createDataFrame([(str(k),) for k in left], "k string")
    rf = spark.createDataFrame([(str(k),) for k in right], "k string")
    exact = sum(
        c * Counter(right).get(k, 0) for k, c in Counter(left).items()
    )
    narrow = SK.cms_join_size(
        lf, F.col("k"), rf, F.col("k"), depth=3, width=4
    ).collect()[0]["join_size_est"]
    assert narrow >= exact
    # 10 possible keys in 4096 buckets: no collisions -> exact
    wide = SK.cms_join_size(
        lf, F.col("k"), rf, F.col("k"), depth=3, width=4096
    ).collect()[0]["join_size_est"]
    assert wide == exact


# corpora of tiny documents over a small vocabulary: df collisions,
# hapax terms, repeated terms, and empty-ish docs all emerge
_corpora = st.lists(
    st.lists(
        st.sampled_from(["cat", "dog", "sat", "mat", "the", "zz"]),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=6,
)


@_SETTINGS
@given(docs=_corpora)
def test_tfidf_keyphrases_invariants_on_any_corpus(spark, docs):
    """Structural invariants for ANY corpus: ranks are contiguous from 1
    with scores non-increasing per doc (ties broken by term asc), no
    term below min_df ever appears, and every reported term really
    occurs in its document."""
    from collections import Counter

    from db_integration_via_kafka_ksql_spark.operators.retrieval import (
        tfidf_keyphrases,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    out = tfidf_keyphrases(frame, top_k=3, min_df=2).collect()
    df_counts = Counter(t for words in docs for t in set(words))
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a["score_micro"], ) >= (b["score_micro"], )
            if a["score_micro"] == b["score_micro"]:
                assert a["term"] < b["term"]
        for r in rows:
            assert df_counts[r["term"]] >= 2, r["term"]
            assert r["term"] in docs[d]


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d", "e", "f"]),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_mg_guarantees_on_any_weights(spark, tmp_path_factory, rows):
    """Weighted streaming Misra-Gries for ANY weight assignment: every
    estimate undercounts, the undercount respects the (W-S)/(k+1)
    bound, and every item past the W/(k+1) support threshold is
    retained — the weighted twin of the fixture contract."""
    from collections import Counter

    from db_integration_via_kafka_ksql_spark.streaming.heavyhitters import (
        StreamingHeavyHitters,
    )

    hh = StreamingHeavyHitters(
        spark,
        state_path=str(tmp_path_factory.mktemp("mgw") / "hh"),
        item_col="source",
        weight_col="w",
        k=2,
        trigger_seconds=0,
    )
    # split into two epochs at the midpoint: merges are exercised too
    mid = len(rows) // 2
    true_w: Counter = Counter()
    for e, chunk in enumerate((rows[:mid], rows[mid:])):
        if not chunk:
            continue
        hh.process_batch(
            spark.createDataFrame(chunk, "source string, w long"), e
        )
        for s, w in chunk:
            true_w[s] += w
    total = sum(true_w.values())
    est = {r["item"]: r["est_cnt"] for r in hh.counters().collect()}
    bound = hh.error_bound()
    assert len(est) <= hh.k and bound <= total // (hh.k + 1)
    for item, e in est.items():
        assert e <= true_w.get(item, 0)
        assert true_w.get(item, 0) - e <= bound
    for item, w in true_w.items():
        if w * (hh.k + 1) > total:
            assert item in est, (item, w, total)
