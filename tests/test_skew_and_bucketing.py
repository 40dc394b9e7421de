"""Scale-technique tests: salted skew-safe operators (equivalence with the
direct formulation on skewed data) and bucketed co-located joins (the
shuffle really disappears — asserted on the physical plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators.skew import (
    salted_distinct_count,
    salted_topk_per_key,
)
from db_integration_via_kafka_ksql_spark.plans.audit import audit


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds ~90% of rows — the hot-key shape salting exists for
    rows = [(0, i, i * 7 % 1000) for i in range(9000)]
    rows += [(k, 9000 + k * 100 + i, i) for k in range(1, 10) for i in range(100)]
    return spark.createDataFrame(rows, ["key", "seq", "val"])


def test_salted_topk_equals_direct_window(spark, skewed):
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy(F.col("val").desc(), F.col("seq").asc())
    direct = (
        skewed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("key", "seq", "val", "rnk")
    )
    salted = salted_topk_per_key(
        skewed, ["key"], "val", k=5, n_salts=8, tiebreak_col="seq"
    ).select("key", "seq", "val", "rnk")
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_distinct_count_exact(spark, skewed):
    direct = {
        r["key"]: r["n"]
        for r in skewed.groupBy("key")
        .agg(F.countDistinct("val").alias("n"))
        .collect()
    }
    salted = {
        r["key"]: r["n_distinct_val"]
        for r in salted_distinct_count(skewed, ["key"], "val", n_salts=8).collect()
    }
    assert direct == salted


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both join sides on the key removes the per-query
    shuffle entirely — the 100 TB fact-fact join strategy. Asserted on the
    plan: the bucketed join has no shuffle Exchange."""
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", "-1"
    )  # force non-broadcast so the shuffle question is real
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        (
            orders.write.bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("orders_b")
        )
        (
            lineitem.write.bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("lineitem_b")
        )
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_extendedprice"
        )
        r = audit(joined)
        assert r.sort_merge_joins == 1
        assert r.n_shuffle_exchanges == 0, "bucketed join still shuffles"

        # same join on raw parquet shuffles both sides
        raw = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select("o_orderkey", "l_extendedprice")
        assert audit(raw).n_shuffle_exchanges == 2
        # and the results agree
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_skew_key_report_exact_shares(spark):
    from db_integration_via_kafka_ksql_spark.operators.skew import (
        skew_key_report,
    )

    rows = [(1,)] * 50 + [(2,)] * 30 + [(3,)] * 15 + [(4,)] * 3 + [(5,)] * 2
    df = spark.createDataFrame(rows, "user_id long")
    got = {
        r["rank"]: (r["key"], r["cnt"], r["share_permille"], r["cum_share_permille"])
        for r in skew_key_report(df, "user_id", top_k=3).collect()
    }
    assert got == {
        1: ("1", 50, 500, 500),
        2: ("2", 30, 300, 800),
        3: ("3", 15, 150, 950),
    }


def test_skew_key_report_tie_breaks_on_raw_key(spark):
    from db_integration_via_kafka_ksql_spark.operators.skew import (
        skew_key_report,
    )

    # numeric tie-break: 4 before 10 (string order would flip them)
    rows = [(10,)] * 5 + [(4,)] * 5 + [(7,)] * 9
    df = spark.createDataFrame(rows, "user_id long")
    got = [r["key"] for r in skew_key_report(df, "user_id", top_k=3)
           .orderBy("rank").collect()]
    assert got == ["7", "4", "10"]
