

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


def test_exact_value_quantiles_matches_sorted_selection(spark):
    """The selection rule (min v with cum*1000 >= q*n) against a plain
    sorted list, with heavy ties, a constant column, and empty input."""
    import math

    import pytest

    from db_integration_via_kafka_ksql_spark.operators.relational import (
        exact_value_quantiles,
    )

    vals = [5.0] * 10 + [1.0, 2.0, 2.0, 3.0, 9.0, 7.5, 7.5, 7.5] + [-2.0]
    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    qs = (1, 250, 500, 750, 900, 1000)
    got = {
        r["q_permille"]: r["value"]
        for r in exact_value_quantiles(df, "value", qs).collect()
    }
    s = sorted(vals)
    want = {q: s[math.ceil(q * len(s) / 1000) - 1] for q in qs}
    assert got == want
    # constant column: every quantile is the constant
    const = spark.createDataFrame([(4.2,)] * 7, ["value"])
    gc = {
        r["q_permille"]: r["value"]
        for r in exact_value_quantiles(const, "value", (500, 1000)).collect()
    }
    assert gc == {500: 4.2, 1000: 4.2}
    # empty input -> no rows; bad q refused
    empty = spark.createDataFrame([], "value double")
    assert exact_value_quantiles(empty, "value", (500,)).count() == 0
    with pytest.raises(ValueError, match="qs_permille"):
        exact_value_quantiles(df, "value", (0,))


def test_grouped_exact_quantiles_match_per_group_sorted_selection(spark):
    import math

    from db_integration_via_kafka_ksql_spark.operators.relational import (
        exact_value_quantiles_by_group,
    )

    data = {
        "a": [5.0, 1.0, 2.0, 2.0, 9.0],
        "b": [7.5] * 4,            # constant group
        "c": [3.0],                # single row
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    rows += [("d", None), (None, 1.0)]  # NULL value / NULL group ignored
    df = spark.createDataFrame(rows, "grp string, value double")
    qs = (250, 500, 1000)
    got = {
        (r["grp"], r["q_permille"]): r["value"]
        for r in exact_value_quantiles_by_group(df, "grp", "value", qs).collect()
    }
    want = {}
    for g, vs in data.items():
        s = sorted(vs)
        for q in qs:
            want[(g, q)] = s[math.ceil(q * len(s) / 1000) - 1]
    assert got == want  # group d (all NULL) and the NULL group are absent


def test_robust_outlier_report_hampel(spark):
    """Hand-derivable: group 'a' = 1..9 plus two gross outliers (med 5,
    deviations 0,1,1,2,2,3,3,4,4,55,95 -> MAD 3, cut 3*1.4826*3 = 13.3:
    exactly the two planted values flag);
    group 'b' constant (mad 0 -> any deviating value flags, the
    documented degenerate); NULLs excluded."""
    import pytest

    from db_integration_via_kafka_ksql_spark.operators import relational as R

    rows = (
        [("a", float(v)) for v in range(1, 10)]
        + [("a", 100.0), ("a", -50.0)]
        + [("b", 7.0)] * 5 + [("b", 7.5)]
        + [("a", None), (None, 3.0)]
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    rep = {
        r["grp"]: r
        for r in R.robust_outlier_report(df, "grp", "v", k_tenths=30).collect()
    }
    a = rep["a"]
    assert (a["n"], a["med"], a["mad"]) == (11, 5.0, 3.0)
    assert a["n_outliers"] == 2
    assert a["outlier_permille"] == 2 * 1000 // 11
    b = rep["b"]
    assert (b["med"], b["mad"]) == (7.0, 0.0)
    assert b["n_outliers"] == 1  # the 7.5 deviates from a zero-MAD group
    with pytest.raises(ValueError, match="k_tenths"):
        R.robust_outlier_report(df, "grp", "v", k_tenths=0)
