"""Sketch correctness beyond oracle parity: the deterministic-ln helper's
cross-engine bit-equality, HLL merge losslessness, and the accuracy /
one-sided-error contracts of each estimator (parity alone would accept a
sketch that is bit-identically wrong in both engines)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions.detmath import det_ln_sql, dlit
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import sketches as SK

LN_GRID = [
    1.0, 1.0000001, 1.5, 2.0, 2.5, 3.0, 3.7, 7.77, 10.0, 63.9, 64.0,
    100.0, 1023.0, 1024.0, 123456.789, 9.87e8, 2.0**40, 1.8e15,
]


def test_det_ln_bit_identical_across_engines(spark):
    rows = spark.createDataFrame([(x,) for x in LN_GRID], "x double")
    got = [
        r[0]
        for r in rows.select(F.expr(det_ln_sql("x", "spark"))).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {det_ln_sql(dlit(x), 'duckdb')}").fetchone()[0]
        for x in LN_GRID
    ]
    assert got == want  # exact float equality — the whole point


def test_det_ln_accuracy():
    con = duckdb.connect()
    for x in LN_GRID:
        v = con.execute(f"SELECT {det_ln_sql(dlit(x), 'duckdb')}").fetchone()[0]
        assert v == pytest.approx(math.log(x), abs=3e-6)


def test_det_ln_rejects_unknown_dialect():
    with pytest.raises(ValueError):
        det_ln_sql("x", "postgres")


def test_hll_merge_is_lossless(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    whole = SK.hll_registers(events, ["event_type"], F.col("user_id"))
    merged = SK.hll_merge(
        SK.hll_registers(half_a, ["event_type"], F.col("user_id")),
        SK.hll_registers(half_b, ["event_type"], F.col("user_id")),
    )
    def key(df):
        return sorted(map(tuple, df.collect()))
    assert key(merged) == key(whole)


def test_hll_estimate_accuracy(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    regs = SK.hll_registers(events, ["event_type"], F.col("user_id"))
    est = {
        r["event_type"]: r["hll_estimate"]
        for r in SK.hll_estimate(regs, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        # p=10 -> ~3.25% stderr; linear counting regime is tighter still
        assert abs(est[k] - n) <= max(0.12 * n, 3), (k, est[k], n)


def test_kmv_distinct_estimate_accuracy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    sketch = SK.kmv_sketch(toks, ["source"], F.col("tok"), k=256)
    est = {
        r["source"]: (r["n_hashes"], r["kmv_estimate"])
        for r in SK.kmv_distinct_estimate(sketch, ["source"], k=256).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    for src, n in exact.items():
        n_hashes, e = est[src]
        if n < 256:
            assert e == n  # below k the sketch IS the exact distinct set
        else:
            assert abs(e - n) <= 0.25 * n, (src, e, n)  # ~1/sqrt(255) stderr


def test_kmv_pairwise_jaccard_tracks_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).distinct()
    sketch = SK.kmv_sketch(toks, ["source"], F.col("tok"), k=256)
    got = {
        (r["source_a"], r["source_b"]): r["jaccard_micro"] / 1e6
        for r in SK.kmv_pairwise_overlap(sketch, "source", k=256).collect()
    }
    pairs = list(got)
    assert pairs, "expected at least one source pair"
    sets = {
        src: {r["tok"] for r in toks.filter(F.col("source") == src).collect()}
        for src in {s for p in pairs for s in p}
    }
    for a, b in pairs:
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        true_j = inter / union
        assert abs(got[(a, b)] - true_j) <= 0.12, ((a, b), got[(a, b)], true_j)


def test_cms_error_is_one_sided_and_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    n_total = toks.count()
    counters = SK.cms_build(toks, F.col("tok"), depth=4, width=1024)
    probes = (
        toks.groupBy(F.col("tok").alias("token"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
        .limit(50)
    )
    rows = SK.cms_estimate(counters, probes, "token").collect()
    # the sf0.001 synthetic vocab is smaller than 50 — every distinct
    # token becomes a probe then
    assert len(rows) == probes.count() and len(rows) >= 20
    for r in rows:
        assert r["cms_estimate"] >= r["exact_cnt"]  # one-sided by construction
        # standard CMS bound: overshoot <= e*N/width w.h.p.; allow 3x slack
        assert r["cms_estimate"] - r["exact_cnt"] <= 3 * math.e * n_total / 1024


def test_loghist_accuracy_within_gamma(spark):
    """Reconstructed quantile values (gamma^bucket / scale) land within a
    gamma factor of numpy's exact percentile (plus the 1e-6 fixed-point
    prescale quantization)."""
    import numpy as np

    from db_integration_via_kafka_ksql_spark.operators.sketches import (
        LOGHIST_GAMMA, LOGHIST_SCALE, loghist_quantiles, loghist_sketch,
    )

    vals = [0.01 * (i % 97 + 1) + 0.5 * (i % 13) for i in range(2000)]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    h = loghist_sketch(df, ["event_type"], "value")
    got = {
        r["q_permille"]: r["bucket"]
        for r in loghist_quantiles(h, ["event_type"], (500, 900, 990)).collect()
    }
    for q, b in got.items():
        approx = LOGHIST_GAMMA ** b / LOGHIST_SCALE
        exact = float(np.percentile(np.array(vals), q / 10, method="lower"))
        assert exact / LOGHIST_GAMMA - 2e-6 <= approx <= exact * LOGHIST_GAMMA**2 + 2e-6, (
            q, approx, exact,
        )


def test_loghist_merge_is_additive(spark):
    """The streamability property: sketching two halves and summing the
    counts equals sketching the whole — plain addition, no state beyond
    the bucket counts."""
    from db_integration_via_kafka_ksql_spark.operators.sketches import (
        loghist_sketch,
    )

    rows = [("a", 0.01 * (i + 1)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    whole = {
        (r["event_type"], r["bucket"]): r["cnt"]
        for r in loghist_sketch(df, ["event_type"], "value").collect()
    }
    h1 = loghist_sketch(df.limit(250), ["event_type"], "value").collect()
    h2 = loghist_sketch(
        df.subtract(df.limit(250)), ["event_type"], "value"
    ).collect()
    merged: dict = {}
    for r in list(h1) + list(h2):
        k = (r["event_type"], r["bucket"])
        merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == whole


def test_cms_join_size_is_one_sided_and_tight_when_wide(spark):
    """CMS inner-product join-size estimate (Cormode-Muthukrishnan §4.2):
    always >= the exact equi-join size, exact when the grid is wide
    enough that no two live keys collide in any hash row, and within the
    |L|*|R|/width overshoot bound when collisions are forced."""
    left = spark.createDataFrame(
        [(i % 7,) for i in range(200)], "k long"
    ).select(F.col("k").cast("string").alias("k"))
    right = spark.createDataFrame(
        [(i % 11,) for i in range(150)], "k long"
    ).select(F.col("k").cast("string").alias("k"))
    exact = (
        left.join(right, "k").count()
    )
    wide = SK.cms_join_size(
        left, F.col("k"), right, F.col("k"), depth=4, width=4096
    ).collect()[0]["join_size_est"]
    assert wide >= exact
    # 7 and 11 distinct keys in 4096 buckets: no collisions, so the
    # inner product IS sum f_L(k) f_R(k) exactly
    assert wide == exact
    narrow = SK.cms_join_size(
        left, F.col("k"), right, F.col("k"), depth=4, width=4
    ).collect()[0]["join_size_est"]
    assert narrow >= exact
    assert narrow <= exact + 200 * 150 // 4 * 3  # generous e*|L||R|/w bound


def test_cms_join_size_zero_when_no_possible_match(spark):
    """A hash row with zero colliding buckets forces the estimate to 0
    (0 >= true means the true join size IS 0) — the missing-groupBy-row
    case min() alone would overestimate; and an empty side estimates 0
    rather than NULL."""
    left = spark.createDataFrame([("a",), ("b",)], "k string")
    right = spark.createDataFrame([("zzz",)], "k string")
    est = SK.cms_join_size(
        left, F.col("k"), right, F.col("k"), depth=4, width=65536
    ).collect()[0]["join_size_est"]
    assert est == 0  # disjoint keys, wide grid: some row surely misses
    empty = spark.createDataFrame([], "k string")
    est2 = SK.cms_join_size(
        left, F.col("k"), empty, F.col("k"), depth=4, width=64
    ).collect()[0]["join_size_est"]
    assert est2 == 0
