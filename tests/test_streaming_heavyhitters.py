"""Streaming Misra-Gries heavy hitters (streaming/heavyhitters.py):
per-epoch MG guarantees against exact prefix counts (undercount-only
estimates, bounded undercount, support-threshold recall), replay
no-ops, bounded driver collects, and a live stream."""

from __future__ import annotations

import os
import time
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from db_integration_via_kafka_ksql_spark.operators.sketches import (
    heavy_hitters_exact,
)
from db_integration_via_kafka_ksql_spark.streaming.heavyhitters import (
    StreamingHeavyHitters,
)

# skewed stream: 'the' dominates, 'of'/'and' mid-heavy, a long tail of
# singletons that must never displace the real hitters from k counters
BATCHES = [
    ["the"] * 30 + ["of"] * 12 + [f"t{i}" for i in range(25)],
    ["the"] * 25 + ["and"] * 15 + ["of"] * 8 + [f"u{i}" for i in range(30)],
    ["and"] * 10 + ["the"] * 5 + [f"v{i}" for i in range(40)],
]


def _df(spark, items):
    return spark.createDataFrame([(i,) for i in items], "item string")


def _hh(spark, tmp_path, k=4, **kw):
    return StreamingHeavyHitters(
        spark, state_path=str(tmp_path / "hh"), k=k, trigger_seconds=0, **kw
    )


def _check_guarantees(hh, true_counts: Counter):
    n = sum(true_counts.values())
    est = {r["item"]: r["est_cnt"] for r in hh.counters().collect()}
    assert len(est) <= hh.k
    bound = hh.error_bound()
    assert bound <= n // (hh.k + 1)
    for item, e in est.items():
        true = true_counts.get(item, 0)
        assert e <= true, (item, e, true)          # MG never overcounts
        assert true - e <= bound, (item, e, true, bound)
    # support guarantee: every true heavy item IS among the counters
    for item, true in true_counts.items():
        if true * (hh.k + 1) > n:
            assert item in est, (item, true, n)
            # and absent items really are bounded by the same quantity
    for item, true in true_counts.items():
        if item not in est:
            assert true <= bound, (item, true, bound)
    # the PROVEN-heavy view never false-positives
    for r in hh.guaranteed_heavy().collect():
        assert true_counts[r["item"]] * (hh.k + 1) > n


def test_prefix_guarantees_every_epoch(spark, tmp_path):
    hh = _hh(spark, tmp_path, k=4)
    true: Counter = Counter()
    for e, items in enumerate(BATCHES):
        hh.process_batch(_df(spark, items), e)
        true.update(items)
        _check_guarantees(hh, true)
    # the dominant item is provably heavy at the end
    heavy = {r["item"] for r in hh.guaranteed_heavy().collect()}
    assert "the" in heavy


def test_streaming_matches_batch_support_set(spark, tmp_path):
    """Streaming counters must contain the batch operator's guaranteed
    set over the same prefix (same k)."""
    hh = _hh(spark, tmp_path, k=4)
    allitems: list[str] = []
    for e, items in enumerate(BATCHES):
        hh.process_batch(_df(spark, items), e)
        allitems += items
    exact = {
        r["item"]
        for r in heavy_hitters_exact(_df(spark, allitems), "item", k=4).collect()
    }
    est = {r["item"] for r in hh.counters().collect()}
    assert exact <= est


def test_replay_is_noop_and_restart_continues(spark, tmp_path):
    hh = _hh(spark, tmp_path, k=4)
    hh.process_batch(_df(spark, BATCHES[0]), 0)
    hh.process_batch(_df(spark, BATCHES[1]), 1)
    snap = sorted(tuple(r) for r in hh.counters().collect())
    hh.process_batch(_df(spark, BATCHES[1]), 1)  # replay: cursor skips
    assert sorted(tuple(r) for r in hh.counters().collect()) == snap
    # a fresh instance (post-crash restart) reads the same state and
    # continues the sequence
    hh2 = _hh(spark, tmp_path, k=4)
    hh2.process_batch(_df(spark, BATCHES[2]), 2)
    _check_guarantees(hh2, Counter(b for batch in BATCHES for b in batch))


def test_idle_epoch_advances_cursor_only(spark, tmp_path):
    hh = _hh(spark, tmp_path, k=4)
    hh.process_batch(_df(spark, BATCHES[0]), 0)
    before = sorted(tuple(r) for r in hh.counters().collect())
    hh.process_batch(_df(spark, []), 1)
    assert sorted(tuple(r) for r in hh.counters().collect()) == before
    assert hh._read_state()["epoch"] == 1


def test_k1_degenerate_majority(spark, tmp_path):
    # k=1 is the Boyer-Moore majority shape: the majority item always
    # SURVIVES in the single counter; it is PROVEN heavy only when its
    # undercounted estimate still clears n/2 (est = 90 - 8 = 82 > 50)
    hh = _hh(spark, tmp_path, k=1)
    hh.process_batch(_df(spark, ["a"] * 90 + ["b"] * 8 + ["c"] * 2), 0)
    assert [r["item"] for r in hh.counters().collect()] == ["a"]
    assert [r["item"] for r in hh.guaranteed_heavy().collect()] == ["a"]
    # a slimmer majority still survives, even when not provable
    hh2 = _hh(spark, tmp_path / "slim", k=1)
    hh2.process_batch(_df(spark, ["a"] * 60 + ["b"] * 25 + ["c"] * 10), 0)
    assert [r["item"] for r in hh2.counters().collect()] == ["a"]


def test_batch_operator_contract(spark):
    items = _df(spark, ["x"] * 50 + ["y"] * 30 + [f"z{i}" for i in range(20)])
    got = {
        r["item"]: (r["cnt"], r["n_total"])
        for r in heavy_hitters_exact(items, "item", k=3).collect()
    }
    # n=100, threshold n/4=25: exactly x (50) and y (30) qualify
    assert got == {"x": (50, 100), "y": (30, 100)}
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters_exact(items, "item", k=0)


def test_start_requires_checkpoint(spark, tmp_path):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    hh = _hh(spark, tmp_path)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        hh.start(spark.readStream.schema("item string").parquet(src))


def test_live_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    items = BATCHES[0]
    pq.write_table(pa.table({"item": pa.array(items)}), f"{src}/b0.parquet")
    hh = _hh(spark, tmp_path, k=4, checkpoint_dir=str(tmp_path / "ckpt"))
    q = hh.start(spark.readStream.schema("item string").parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not hh.batches_seen:
            time.sleep(0.5)
        time.sleep(1.5)  # let the first batch finish committing
    finally:
        q.stop()
        q.awaitTermination(30)
    _check_guarantees(hh, Counter(items))


def test_numeric_item_column_keeps_bounds(spark, tmp_path):
    """ADVICE r12 (medium): a numeric item column must not split its
    count between the native-typed batch key (int 1) and the reloaded
    json string key ('1') — items group as strings, so the undercount
    bound and support guarantee hold across the state round-trip."""
    hh = StreamingHeavyHitters(
        spark, state_path=str(tmp_path / "hh"), k=3, trigger_seconds=0
    )
    batches = [[1] * 3 + [2], [1] + [3] * 2, [1] * 4]
    true: Counter = Counter()
    for e, items in enumerate(batches):
        df = spark.createDataFrame([(i,) for i in items], "item int")
        hh.process_batch(df, e)
        true.update(str(i) for i in items)
        _check_guarantees(hh, true)
    est = {r["item"]: r["est_cnt"] for r in hh.counters().collect()}
    # true count of '1' is 8 across three epochs; est must be close and
    # NEVER below true - bound (the pre-fix behavior reported 1 with
    # bound 0)
    assert est["1"] <= 8 and 8 - est["1"] <= hh.error_bound()
    assert "1" in {r["item"] for r in hh.guaranteed_heavy().collect()}


WEIGHTED_BATCHES = [
    # (source, tokens): 'web' dominates the token budget, not row count
    [("web", 500), ("wiki", 60), ("code", 40)] + [(f"s{i}", 5) for i in range(20)],
    [("web", 300), ("code", 250), ("wiki", 30)] + [(f"t{i}", 8) for i in range(25)],
    [("books", 400), ("web", 100)] + [(f"u{i}", 3) for i in range(30)],
]


def _check_weighted_guarantees(hh, true_w: Counter):
    n = sum(true_w.values())
    est = {r["item"]: r["est_cnt"] for r in hh.counters().collect()}
    assert len(est) <= hh.k
    bound = hh.error_bound()
    assert bound <= n // (hh.k + 1)
    for item, e in est.items():
        true = true_w.get(item, 0)
        assert e <= true, (item, e, true)
        assert true - e <= bound, (item, e, true, bound)
    for item, true in true_w.items():
        if true * (hh.k + 1) > n:
            assert item in est, (item, true, n)
        if item not in est:
            assert true <= bound, (item, true, bound)
    for r in hh.guaranteed_heavy().collect():
        assert true_w[r["item"]] * (hh.k + 1) > n


def test_weighted_prefix_guarantees_every_epoch(spark, tmp_path):
    """Weighted MG (VERDICT r12 #5): per-epoch undercount/bound/support
    guarantees against the exact WEIGHTED prefix — n_total is total
    weight, so the question answered is which sources dominate the
    token budget, mirroring heavy_hitters_exact(weight_col=...)."""
    hh = StreamingHeavyHitters(
        spark, state_path=str(tmp_path / "hh"), item_col="source",
        weight_col="tokens", k=4, trigger_seconds=0,
    )
    true_w: Counter = Counter()
    for e, rows in enumerate(WEIGHTED_BATCHES):
        df = spark.createDataFrame(rows, "source string, tokens long")
        hh.process_batch(df, e)
        for s, w in rows:
            true_w[s] += w
        _check_weighted_guarantees(hh, true_w)
    heavy = {r["item"] for r in hh.guaranteed_heavy().collect()}
    assert "web" in heavy  # 900 of 2156 tokens: provably over n/5


def test_weighted_streaming_matches_batch_support_set(spark, tmp_path):
    """Streaming weighted counters contain the batch operator's
    guaranteed set over the same prefix (same k, same weights)."""
    hh = StreamingHeavyHitters(
        spark, state_path=str(tmp_path / "hh"), item_col="source",
        weight_col="tokens", k=4, trigger_seconds=0,
    )
    allrows = []
    for e, rows in enumerate(WEIGHTED_BATCHES):
        hh.process_batch(
            spark.createDataFrame(rows, "source string, tokens long"), e
        )
        allrows += rows
    exact = {
        r["item"]
        for r in heavy_hitters_exact(
            spark.createDataFrame(allrows, "source string, tokens long"),
            "source", k=4, weight_col="tokens",
        ).collect()
    }
    est = {r["item"] for r in hh.counters().collect()}
    assert exact <= est


def test_weighted_rejects_null_and_negative_weights(spark, tmp_path):
    """ADVICE r13: NULL weights made a group's sum NULL (TypeError in the
    top-(k+1) collect / silent group loss) and negative weights silently
    broke the est<=true MG bound — both now fail fast, in the stream AND
    in the batch ground truth, BEFORE any state is touched."""
    hh = StreamingHeavyHitters(
        spark, state_path=str(tmp_path / "hh"), item_col="source",
        weight_col="tokens", k=4, trigger_seconds=0,
    )
    null_df = spark.createDataFrame(
        [("web", 5), ("web", None), ("books", 3)],
        "source string, tokens long",
    )
    with pytest.raises(ValueError, match="NULL or negative"):
        hh.process_batch(null_df, 0)
    neg_df = spark.createDataFrame(
        [("web", 5), ("code", -2)], "source string, tokens long"
    )
    with pytest.raises(ValueError, match="NULL or negative"):
        hh.process_batch(neg_df, 0)
    # the refused batches left NO state behind: a clean batch at the same
    # epoch then applies normally
    assert hh._read_state()["epoch"] == -1
    hh.process_batch(
        spark.createDataFrame([("web", 5)], "source string, tokens long"), 0
    )
    assert {r["item"]: r["est_cnt"] for r in hh.counters().collect()} == {
        "web": 5
    }
    # the batch operator refuses the identical inputs
    with pytest.raises(ValueError, match="NULL or negative"):
        heavy_hitters_exact(null_df, "source", k=4, weight_col="tokens")
    with pytest.raises(ValueError, match="NULL or negative"):
        heavy_hitters_exact(neg_df, "source", k=4, weight_col="tokens")
