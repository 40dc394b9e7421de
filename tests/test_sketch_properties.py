"""Property-based tests (hypothesis) for the sketch invariants.

The claims that make sketches safe at 100 TB must hold for EVERY input
and EVERY partitioning, not just the fixtures: HLL merge-losslessness
over arbitrary splits, KMV exactness below k, CMS one-sided error, and
the pure-python equivalence of the register construction (the md5 bit
slicing has off-by-one hazards a fixture won't trip)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import sketches as SK

_values = st.lists(
    st.integers(min_value=0, max_value=200), min_size=1, max_size=60
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, values):
    return spark.createDataFrame(
        [("g", v) for v in values], "grp string, v long"
    )


def _py_registers(values, p=10):
    """Sequential model of hll_registers: 60-bit md5 prefix, top-p bucket,
    rho = leading zeros of the low (60-p)-bit window + 1."""
    w_bits = 60 - p
    regs: dict[int, int] = {}
    for v in set(values):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, w = h >> w_bits, h & ((1 << w_bits) - 1)
        rho = w_bits + 1 if w == 0 else w_bits + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


@given(values=_values)
@_SETTINGS
def test_registers_match_python_model(spark, values):
    got = {
        r["bucket"]: r["rho"]
        for r in SK.hll_registers(
            _df(spark, values), ["grp"], F.col("v")
        ).collect()
    }
    assert got == _py_registers(values)


@given(values=_values, split=st.integers(min_value=0, max_value=60))
@_SETTINGS
def test_hll_merge_lossless_any_split(spark, values, split):
    cut = min(split, len(values))
    whole = SK.hll_registers(_df(spark, values), ["grp"], F.col("v"))
    parts = [values[:cut], values[cut:]]
    frames = [
        SK.hll_registers(_df(spark, p), ["grp"], F.col("v"))
        for p in parts
        if p
    ]
    merged = frames[0] if len(frames) == 1 else SK.hll_merge(*frames)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(merged) == key(whole)


@given(values=_values)
@_SETTINGS
def test_kmv_exact_below_k(spark, values):
    sketch = SK.kmv_sketch(_df(spark, values), ["grp"], F.col("v"), k=256)
    est = SK.kmv_distinct_estimate(sketch, ["grp"], k=256).collect()[0]
    # the whole value space (<= 201 distinct) sits below k: exact answer
    assert est["kmv_estimate"] == len(set(values))


@given(values=_values)
@_SETTINGS
def test_cms_never_underestimates(spark, values):
    df = _df(spark, values).select(F.col("v").cast("string").alias("tok"))
    counters = SK.cms_build(df, F.col("tok"), depth=4, width=64)
    probes = df.groupBy(F.col("tok").alias("token")).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    for r in SK.cms_estimate(
        counters, probes, "token", depth=4, width=64
    ).collect():
        assert r["cms_estimate"] >= r["exact_cnt"]
