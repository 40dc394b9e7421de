

class TestHistogramQuantiles:
    def test_within_one_bucket_of_exact(self, spark, sf_dir):
        import numpy as np

        from db_integration_via_kafka_ksql_spark.io import load_table
        from db_integration_via_kafka_ksql_spark.operators.relational import (
            histogram_quantiles,
        )

        ev = load_table(spark, sf_dir, "events")
        vals = np.array([r["value"] for r in ev.select("value").collect()])
        width = (vals.max() - vals.min()) / 256
        got = {
            r["q_permille"]: r["approx_value"]
            for r in histogram_quantiles(ev, "value").collect()
        }
        for q, v in got.items():
            exact = float(np.quantile(vals, q / 1000))
            assert exact <= v + 1e-9, (q, v, exact)   # upper-edge answer
            assert v - exact <= 2 * width, (q, v, exact)

    def test_degenerate_single_value(self, spark):
        from db_integration_via_kafka_ksql_spark.operators.relational import (
            histogram_quantiles,
        )

        df = spark.createDataFrame([(7.5,)] * 10, "value double")
        rows = histogram_quantiles(df, "value").collect()
        assert {r["approx_value"] for r in rows} == {7.5}
        assert {r["n_total"] for r in rows} == {10}


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    """Every matching fact row survives; most non-matching rows die
    before the join; mismatched key types are refused."""
    import pytest
    from pyspark.sql import functions as F

    from db_integration_via_kafka_ksql_spark.operators import relational as R

    fact = spark.createDataFrame(
        [(i, i % 7) for i in range(2000)], ["fk", "v"]
    )
    dim = spark.createDataFrame(
        [(i,) for i in range(5000, 5050)] + [(3,), (10, ), (17,)], ["pk"]
    )
    pruned = R.bloom_prune(fact, dim, "fk", "pk")
    kept = {r["fk"] for r in pruned.collect()}
    matches = {3, 10, 17}
    assert matches <= kept  # no false negatives, ever
    # ~10 bits/key at 53 keys in 2^20 bits -> false positives ~0:
    # the prune should eliminate essentially all 1997 non-matching rows
    assert len(kept) <= len(matches) + 20
    joined = R.bloom_pruned_join(fact, dim, "fk", "pk")
    plain = fact.join(dim, fact["fk"] == dim["pk"])
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    with pytest.raises(ValueError, match="type"):
        R.bloom_prune(fact, dim.select(F.col("pk").cast("int")), "fk", "pk")
