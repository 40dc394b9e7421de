"""Relational query surface (SURVEY §2.2-2.4 + star-schema extension).

Every oracle mirrors the Spark decimal-cast discipline exactly (see
operators.relational module docstring): DECIMAL(18,4) money math, the
q1 charge chain kept exact in DECIMAL(9,4)x(15,4) space, sums floored at
4 decimal places (tie-free), final CAST AS DOUBLE.
ms-precision parquet timestamps surface as TIMESTAMP_NTZ in Spark 4 and
pass through as-is (same naive semantics as DuckDB); only the nanosecond
events.ts needs the epoch-micros treatment (see cdc_queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions.detmath import dlit
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import analytics as AN
from db_integration_via_kafka_ksql_spark.operators import relational as R
from db_integration_via_kafka_ksql_spark.registry import query

_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)


def _msum(expr: str, alias: str) -> str:
    """Exact decimal sum → tie-free FLOOR at 4dp → exact double (matches
    operators.relational.dsum; see its docstring for why not a plain cast)."""
    return (
        f"CAST(FLOOR(CAST(sum({expr}) AS DECIMAL(27,12)) * 10000) AS DOUBLE)"
        f" / 10000 AS {alias}"
    )


@query(
    "q1_pricing_summary",
    # round-16 rotation: veteran returns (2 rounds out)
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {_msum("CAST(l_quantity AS DECIMAL(18,4))", "sum_qty")},
           {_msum("CAST(l_extendedprice AS DECIMAL(18,4))", "sum_base_price")},
           {_msum(_REV, "sum_disc_price")},
           {_msum(
               "CAST(l_extendedprice AS DECIMAL(15,4))"
               " * ((CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))"
               " * (CAST(1 AS DECIMAL(9,4)) + CAST(l_tax AS DECIMAL(9,4))))",
               "sum_charge",
           )},
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.pricing_summary(load_table(spark, sf_dir, "lineitem"), "1998-09-02")


@query(
    "q3_shipping_priority",
    # round-16 rotation: veteran returns (3 rounds out)
    oracle=f"""
    SELECT l_orderkey,
           {_msum(_REV, "revenue")},
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        segment="BUILDING",
        cutoff="1998-01-01",
        k=10,
    )


@query(
    "q5_local_supplier_volume",
    driver=False,  # round-16 rotation: longest-tenured relational veteran (r8) cedes to q1/q3's return
    oracle=f"""
    SELECT n_name, {_msum(_REV, "revenue")}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.local_supplier_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        region_name="ASIA",
        date_from="1996-01-01",
        date_to="1999-01-01",
    )


@query(
    "star_sales_by_region_segment",
    driver=False,  # round-13 rotation: stable veteran slot ceded to skew_user_activity_report
    oracle=f"""
    SELECT r_name,
           c_mktsegment,
           {_msum(_REV, "revenue")},
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, c_mktsegment
    """,
)
def star_sales_by_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.sales_by_region_segment(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "window_top_orders_per_customer",
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
           rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_orders_per_customer(load_table(spark, sf_dir, "orders"), k=3)


@query(
    "window_running_customer_spend",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.running_customer_spend(load_table(spark, sf_dir, "orders"))


@query(
    "topk_expensive_orders",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
           o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_expensive_orders(load_table(spark, sf_dir, "orders"), k=20)


@query(
    "union_order_value_extremes",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
           'low' AS bucket
    FROM orders WHERE CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) < 5000
    UNION ALL
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
           'high' AS bucket
    FROM orders WHERE CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) > 400000
    """,
)
def union_order_value_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.order_value_extremes_union(
        load_table(spark, sf_dir, "orders"), low=5000.0, high=400000.0
    )


@query(
    "semi_join_customers_with_open_orders",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
    )
    """,
)
def semi_join_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customers_with_open_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "anti_join_customers_without_orders",
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
    # scoped to *open* orders so the result is non-empty at sf0.01 (every
    # customer has some order there; an all-orders anti-join returns 0 rows
    # and would hash-match trivially) — NOT EXISTS form preserved.
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
    )
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return R.customers_without_orders(
        load_table(spark, sf_dir, "customer"), orders
    )


@query(
    "segment_distinct_stats",
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
    oracle=f"""
    SELECT c_mktsegment,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           count(*) AS n_orders,
           {_msum("CAST(o_totalprice AS DECIMAL(18,4))", "total_value")}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.segment_distinct_stats(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "events_hourly_counts",
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
    oracle=f"""
    SELECT {AN.floor_div_sql("epoch_us(ts)", 3_600_000_000, "duckdb")} AS hour_bucket,
           event_type,
           count(*) AS n_events,
           {_msum('CAST("value" AS DECIMAL(18,4))', "sum_value")}
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg, batch form (streaming twin lives in streaming/)."""
    return R.events_hourly_counts(load_table(spark, sf_dir, "events"))


@query(
    "rollup_sales_by_region_segment",
    driver=False,  # round-16 rotation: veteran (r8) cedes; q1 covers the relational-agg family
    oracle=f"""
    SELECT r_name,
           c_mktsegment,
           {_msum(_REV, "revenue")},
           count(*) AS n_lineitems,
           CAST(GROUPING(r_name, c_mktsegment) AS BIGINT) AS grp
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, c_mktsegment)
    """,
)
def rollup_sales_by_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.rollup_sales_by_region_segment(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "cube_order_stats",
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
    oracle=f"""
    SELECT o_orderstatus,
           o_orderpriority,
           count(*) AS n_orders,
           {_msum("CAST(o_totalprice AS DECIMAL(18,4))", "total_value")},
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grp
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.cube_order_stats(load_table(spark, sf_dir, "orders"))


@query(
    "outer_join_customer_order_counts",
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders,
           coalesce(CAST(val AS DOUBLE), 0.0) AS total_spend
    FROM customer
    LEFT JOIN (
        SELECT o_custkey,
               count(*) AS cnt,
               sum(CAST(o_totalprice AS DECIMAL(18,4))) AS val
        FROM orders GROUP BY o_custkey
    ) ON c_custkey = o_custkey
    """,
)
def outer_join_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customer_order_counts_outer(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "exists_late_shipment_orders",
    driver=False,  # EXISTS form of the semi-join family (semi_join_customers_with_open_orders holds the driver slot)
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def exists_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.late_shipment_orders(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@query(
    "window_moving_avg_spend",
    driver=False,  # bounded-frame twin of window_running_customer_spend
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE) AS avg3_spend
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_moving_avg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.moving_avg_spend(load_table(spark, sf_dir, "orders"))


@query(
    "scalar_subquery_min_price_parts",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
    oracle="""
    SELECT p_brand, p_partkey, p_name,
           CAST(CAST(p_retailprice AS DECIMAL(18,4)) AS DOUBLE) AS p_retailprice
    FROM part
    WHERE p_retailprice = (
        SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand
    )
    """,
)
def scalar_subquery_min_price_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.min_price_parts_per_brand(load_table(spark, sf_dir, "part"))


@query(
    "json_props_stats",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction + rollup."""
    return R.json_props_stats(load_table(spark, sf_dir, "events"))


@query(
    "pivot_status_by_segment",
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
    oracle="""
    SELECT c_mktsegment,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_open,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_finished,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_pending
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (groupBy().pivot()): order-status counts as columns per
    segment. Explicit value list keeps the plan one-pass (no distinct-
    values pre-query) — required practice at scale."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    )
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "c_mktsegment",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


@query(
    "intersect_urgent_open_customers",
    driver=False,  # set-op twin of semi_join_customers_with_open_orders
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def intersect_urgent_open_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics): customers with an open order
    AND an urgent order. Plans as a left-semi join after dedup."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    urgent_c = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return open_c.intersect(urgent_c)


@query(
    "except_no_open_order_customers",
    driver=False,  # set-op twin of anti_join_customers_without_orders
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_no_open_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct anti semantics): ordering customers with no open
    order. Plans as a left-anti join after dedup."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    all_c = orders.select("o_custkey")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return all_c.subtract(open_c)


@query(
    "approx_order_stats",
    driver=False,
    # ORACLE-BACKED since r17 (verdict Next #7). The raw sketch VALUES
    # are engine-specific (Spark HLL++ register layout / GK summary vs
    # DuckDB's HLL / t-digest), so they can never bit-hash across
    # engines — instead the query exports the TOLERANCE CONTRACT itself:
    # the exact distinct count (cross-engine hashable) plus 0/1 in-band
    # flags computed Spark-side against Spark's own exact aggregates.
    # The oracle asserts every flag is 1 and re-derives the exact count
    # in DuckDB, so a sketch drifting outside its published error bound
    # is an external HASH MISMATCH, not just a local pytest failure.
    oracle="""
    SELECT c_mktsegment,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(1 AS BIGINT) AS hll_in_band,
           CAST(1 AS BIGINT) AS p50_in_band,
           CAST(1 AS BIGINT) AS p99_in_band
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def approx_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB workhorses where exact distinct
    counts / percentiles would shuffle the world: HLL++ distinct customers
    (rsd=0.02) and GK percentile_approx (accuracy=10000) of order value
    per segment. Bands: HLL within 3*rsd of exact; each approx quantile
    between the exact interpolated quantiles at p +/- 0.005 (50x the GK
    rank-error guarantee of 1/accuracy, absorbing interpolation-vs-
    element-return differences at small n). The exact aggregates feeding
    the bands run in the same single groupBy pass — at scale the sketch
    columns are the product and the exact columns are the (bench-scale)
    audit; tests/test_extensions.py keeps the direct tolerance pytest."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("ac"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("ap50"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("ap99"),
        F.expr("percentile(o_totalprice, 0.495)").alias("lo50"),
        F.expr("percentile(o_totalprice, 0.505)").alias("hi50"),
        F.expr("percentile(o_totalprice, 0.985)").alias("lo99"),
        F.expr("percentile(o_totalprice, 0.995)").alias("hi99"),
    )
    return agg.select(
        "c_mktsegment",
        F.col("exact_customers").cast("long").alias("exact_customers"),
        (
            F.abs(F.col("ac") - F.col("exact_customers"))
            <= 3 * 0.02 * F.col("exact_customers")
        )
        .cast("long")
        .alias("hll_in_band"),
        ((F.col("ap50") >= F.col("lo50")) & (F.col("ap50") <= F.col("hi50")))
        .cast("long")
        .alias("p50_in_band"),
        ((F.col("ap99") >= F.col("lo99")) & (F.col("ap99") <= F.col("hi99")))
        .cast("long")
        .alias("p99_in_band"),
    )


@query(
    "monthly_order_volume",
    driver=False,  # calendar-rollup twin of events_hourly_counts
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           count(*) AS n_orders,
           {_msum("CAST(o_totalprice AS DECIMAL(18,4))", "revenue")}
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def monthly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-bucket rollup: orders and revenue per month. date_trunc on
    TIMESTAMP_NTZ is timezone-free — identical buckets in both engines."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            R.dsum(R.money("o_totalprice"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Skew-safe operators (operators/skew.py) under the oracle gate: the salted
# two-phase formulations must produce EXACTLY the direct-window / direct
# COUNT(DISTINCT) answers — the oracle runs the direct form.
# ---------------------------------------------------------------------------


@query(
    "skew_salted_topk_orders",
    driver=False,  # round-15 rotation: veteran slot (r9) ceded; skew family keeps skew_user_activity_report
    # promoted to the driver window round 9; oracle-gates the salted top-k
    oracle="""
    SELECT c_mktsegment, o_orderkey, total_price, rnk FROM (
        SELECT c.c_mktsegment, o.o_orderkey,
               o.o_totalprice AS total_price,
               row_number() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
               ) AS rnk
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rnk <= 3
    """,
)
def skew_salted_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 orders per market segment via the SALTED two-phase
    top-k (operators/skew.salted_topk_per_key) — 5 segments over every
    order is exactly the hot-key regime the salt exists for; the oracle
    is the direct window formulation, so the decomposition is proven
    value-exact, not just equivalence-tested."""
    from db_integration_via_kafka_ksql_spark.operators.skew import (
        salted_topk_per_key,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    df = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == cust.c_custkey,
    ).select(
        "c_mktsegment",
        "o_orderkey",
        F.col("o_totalprice").alias("total_price"),
    )
    return salted_topk_per_key(
        df,
        key_cols=["c_mktsegment"],
        order_col="total_price",
        k=3,
        tiebreak_col="o_orderkey",
    ).select("c_mktsegment", "o_orderkey", "total_price", "rnk")


@query(
    "skew_salted_distinct_parts",
    driver=False,  # round-13 rotation: stable veteran slot ceded to text_curriculum_order
    # promoted to the driver window round 9; salted distinct decomposition
    oracle="""
    SELECT l_suppkey,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_l_partkey
    FROM lineitem GROUP BY l_suppkey
    """,
)
def skew_salted_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT part) per supplier via the salted two-phase
    decomposition (operators/skew.salted_distinct_count): per-(key, salt)
    distinct counts partition the value space and add exactly — the
    oracle runs the direct COUNT(DISTINCT)."""
    from db_integration_via_kafka_ksql_spark.operators.skew import (
        salted_distinct_count,
    )

    return salted_distinct_count(
        load_table(spark, sf_dir, "lineitem"),
        key_cols=["l_suppkey"],
        value_col="l_partkey",
    )


_ANOM_VAR = (
    "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) "
    "/ CAST(n_hours AS DOUBLE)) / CAST(n_hours - 1 AS DOUBLE)"
)
_ANOM_Z = (
    f"CASE WHEN n_hours > 1 AND {_ANOM_VAR} > 0 THEN "
    f"(CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE))"
    f" / sqrt({_ANOM_VAR}) ELSE 0.0 END"
)


@query(
    "events_hourly_anomalies",
    driver=False,  # round-13 rotation: stable veteran slot ceded to quality_drift_by_source
    # promoted to the driver window round 9 (hourly-counts family slot)
    oracle=f"""
    WITH hourly AS (
        SELECT {AN.floor_div_sql("epoch_us(ts)", 3_600_000_000, "duckdb")} AS hour_bucket,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(n_events) AS BIGINT) AS s,
               CAST(sum(n_events * n_events) AS BIGINT) AS ss
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hour_bucket, h.n_events,
           {_ANOM_Z} AS zscore,
           abs({_ANOM_Z}) >= 2.0 AS is_anomaly
    FROM hourly h JOIN stats USING (event_type)
    """,
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-anomaly screen: per-type z-score of hourly event counts
    from exact integer sums (operators/relational.events_hourly_anomalies)
    — variance math is a fixed double-op sequence over BIGINT sums, so
    the score is bit-identical in DuckDB (builtin stddev would not be)."""
    return R.events_hourly_anomalies(load_table(spark, sf_dir, "events"))


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM orders"""


@query(
    "profile_orders_columns",
    # round-14 rotation: promoted into the external driver window
    oracle=" UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of `orders` (operators/relational.profile_table,
    exact flavor): nulls, distincts, min/max per column in ONE
    aggregation pass. Timestamp/double columns are excluded from the
    hash-compared set (value-to-string formatting is engine-specific);
    the approx flavor is tolerance-tested in tests/test_extensions.py."""
    return R.profile_table(
        load_table(spark, sf_dir, "orders"), cols=list(_PROFILE_COLS)
    )


@query(
    "events_inter_arrival_stats",
    driver=False,  # round-15 rotation: longest-tenured veteran (r8) ceded to the series family
    # round-8 rotation: promoted into the external driver window
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(sum(gap_us) AS DOUBLE) / CAST(count(gap_us) AS DOUBLE)
               AS avg_gap_us
    FROM g GROUP BY user_id
    HAVING count(gap_us) >= 1
    """,
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user LAG-analytic inter-arrival rollup (gap distribution per
    user) — the empirical input to sessionization gap thresholds."""
    from db_integration_via_kafka_ksql_spark.io import epoch_us_col

    ev = load_table(spark, sf_dir, "events")
    return R.user_inter_arrival_stats(ev, epoch_us_col(ev, "ts"))


PAGERANK_ITERS = 5
PAGERANK_TOP_K = 20


@query(
    "graph_pagerank_topk",
    driver=False,  # round-12 rotation: stable veteran slot ceded to quality_neighbor_smoothing
    # round-10 rotation: promoted into the external driver window
    oracle="""
    WITH pe AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pe
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pe
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               1000000000000 // CAST(count(*) AS BIGINT) AS init
        FROM nodes
    ),
    r0 AS (SELECT node, init AS r FROM nodes, c),
    r1 AS (
        SELECT e.dst AS node,
               (SELECT (15 * init) // 100 FROM c)
                 + 85 * CAST(sum(r.r // d.deg) AS BIGINT) // 100 AS r
        FROM edges e
        JOIN r0 r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    ),
    r2 AS (
        SELECT e.dst AS node,
               (SELECT (15 * init) // 100 FROM c)
                 + 85 * CAST(sum(r.r // d.deg) AS BIGINT) // 100 AS r
        FROM edges e
        JOIN r1 r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    ),
    r3 AS (
        SELECT e.dst AS node,
               (SELECT (15 * init) // 100 FROM c)
                 + 85 * CAST(sum(r.r // d.deg) AS BIGINT) // 100 AS r
        FROM edges e
        JOIN r2 r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    ),
    r4 AS (
        SELECT e.dst AS node,
               (SELECT (15 * init) // 100 FROM c)
                 + 85 * CAST(sum(r.r // d.deg) AS BIGINT) // 100 AS r
        FROM edges e
        JOIN r3 r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    ),
    r5 AS (
        SELECT e.dst AS node,
               (SELECT (15 * init) // 100 FROM c)
                 + 85 * CAST(sum(r.r // d.deg) AS BIGINT) // 100 AS r
        FROM edges e
        JOIN r4 r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           node // 2 AS entity_key,
           r AS rank_scaled
    FROM r5
    ORDER BY rank_scaled DESC, node ASC LIMIT 20
    """,
)
def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the symmetrized customer-supplier
    interaction graph (distinct trade pairs from orders x lineitem,
    customers on even node ids, suppliers on odd): 5 integer fixed-point
    iterations (operators/graph.pagerank — the oracle replays the whole
    chain), then the global top-20 by rank. The iterative-operator
    counterpart of connected components: ranks entities by graph
    centrality instead of labeling reachability."""
    from db_integration_via_kafka_ksql_spark.operators import graph as G

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionByName(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    ranks = G.pagerank(edges, iterations=PAGERANK_ITERS)
    top = ranks.orderBy(
        F.col("rank_scaled").desc(), F.col("node").asc()
    ).limit(PAGERANK_TOP_K)
    return top.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("entity_key"),
        "rank_scaled",
    )


BFS_MAX_HOPS = 3

_BFS_EDGES_CTE = """pe AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pe
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pe
    )"""


def _bfs_oracle(max_hops: int) -> str:
    """Unrolled BFS replay (the pagerank/kmeans discipline for iterative
    operators): v{h} accumulates (node, level<=h); each hop's frontier is
    the distinct neighbors of the previous hop not yet visited."""
    ctes = [
        f"WITH {_BFS_EDGES_CTE}",
        "src0 AS (SELECT CAST(2 * min(c_custkey) AS BIGINT) AS node"
        " FROM customer)",
        "v0 AS (SELECT node, CAST(0 AS BIGINT) AS level FROM src0)",
    ]
    for h in range(1, max_hops + 1):
        ctes.append(
            f"n{h} AS (SELECT DISTINCT e.dst AS node,"
            f" CAST({h} AS BIGINT) AS level"
            f" FROM edges e JOIN v{h - 1} v ON e.src = v.node"
            f" WHERE e.dst NOT IN (SELECT node FROM v{h - 1}))"
        )
        ctes.append(
            f"v{h} AS (SELECT * FROM v{h - 1}"
            f" UNION ALL SELECT * FROM n{h})"
        )
    return (
        ",\n    ".join(ctes)
        + f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           node // 2 AS entity_key,
           level
    FROM v{max_hops}
    """
    )


@query(
    "graph_bfs_levels",
    # round-15 rotation: promoted into the external driver window
    oracle=_bfs_oracle(BFS_MAX_HOPS),
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance levels from the minimum-key customer over the
    symmetrized customer-supplier trade graph (operators/graph.bfs_levels,
    explored to 3 hops): level 1 = the seed's suppliers, level 2 =
    customers sharing any of them, level 3 = the suppliers those reach —
    the bounded-radius seed-expansion primitive, replayed by the oracle
    as an unrolled frontier CTE chain."""
    from db_integration_via_kafka_ksql_spark.operators import graph as G

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        (F.col("c") * 2).alias("src"), (F.col("s") * 2 + 1).alias("dst")
    ).unionByName(
        pairs.select(
            (F.col("s") * 2 + 1).alias("src"), (F.col("c") * 2).alias("dst")
        )
    )
    sources = customer.groupBy().agg(
        (F.min("c_custkey") * 2).cast("long").alias("node")
    )
    levels = G.bfs_levels(edges, sources, max_hops=BFS_MAX_HOPS)
    return levels.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("entity_key"),
        "level",
    )


HIST_NB = 256
HIST_QS = (500, 900, 990)


@query(
    "events_value_quantiles_hist",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH bounds AS (
        SELECT min(value) AS vmin, max(value) AS vmax FROM events
    ),
    bkt AS (
        SELECT CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT)
                    ELSE least(CAST(floor(((value - vmin) * {HIST_NB}.0e0)
                                          / (vmax - vmin)) AS BIGINT),
                               {HIST_NB - 1})
               END AS bucket
        FROM events, bounds
    ),
    counts AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM bkt GROUP BY 1
    ),
    cum AS (
        SELECT bucket,
               CAST(sum(cnt) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS n_total
        FROM counts
    ),
    qs(q_permille) AS (VALUES (500), (900), (990)),
    hit AS (
        SELECT q_permille, min(bucket) AS bucket, max(n_total) AS n_total
        FROM qs JOIN cum ON cum.cum * 1000 >= qs.q_permille * cum.n_total
        GROUP BY 1
    )
    SELECT q_permille, bucket,
           CASE WHEN vmax = vmin THEN vmax
                ELSE vmin + CAST(bucket + 1 AS DOUBLE) * (vmax - vmin)
                     / {HIST_NB}.0e0
           END AS approx_value,
           n_total
    FROM hit, bounds
    """,
)
def events_value_quantiles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantiles of events.value (p50/p90/p99 in
    permille): deterministic and hash-parity-gated, the cross-engine-
    exact counterpart of the tolerance-gated approx_order_stats sketch."""
    ev = load_table(spark, sf_dir, "events")
    return R.histogram_quantiles(
        ev, "value", n_buckets=HIST_NB, quantiles_permille=HIST_QS
    )


KNN_GRAPH_K = 5


@query(
    "graph_supplier_knn_triangles",
    driver=False,  # round-14 rotation: stable veteran slot ceded to events_cohort_retention
    # round-10 rotation: promoted into the external driver window
    # Oracle counts triangles INDEPENDENTLY of the operator's degree-ordered
    # orientation: per-node wedge closure over the symmetric adjacency
    # (a1.nbr < a2.nbr, closing edge present) — a different enumeration
    # that must agree exactly, not a replay of the Spark plan.
    oracle=f"""
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    pairs AS (
      SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS shared
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2
    ),
    dir AS (
      SELECT sa AS s, sb AS nbr, shared FROM pairs
      UNION ALL SELECT sb, sa, shared FROM pairs
    ),
    kept AS (
      SELECT s, nbr FROM (
        SELECT s, nbr, row_number() OVER (
          PARTITION BY s ORDER BY shared DESC, nbr ASC) AS rk
        FROM dir) t WHERE rk <= {KNN_GRAPH_K}
    ),
    adj AS (
      SELECT DISTINCT * FROM (
        SELECT s, nbr FROM kept UNION ALL SELECT nbr, s FROM kept) u
    ),
    tri AS (
      SELECT a1.s AS node, CAST(count(*) AS BIGINT) AS nt
      FROM adj a1
      JOIN adj a2 ON a1.s = a2.s AND a1.nbr < a2.nbr
      JOIN adj e ON e.s = a1.nbr AND e.nbr = a2.nbr
      GROUP BY 1
    ),
    deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS degree FROM adj GROUP BY 1)
    SELECT d.node, d.degree,
           coalesce(t.nt, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN 2 * coalesce(t.nt, 0) * 1000 // (d.degree * (d.degree - 1))
                ELSE CAST(0 AS BIGINT) END AS clustering_permille
    FROM deg d LEFT JOIN tri t USING (node)
    """,
)
def graph_supplier_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-graph construction + triangle census: build the top-k
    strongest-partner graph over suppliers (edge weight = shared distinct
    parts from lineitem — the scale-invariant kNN sparsifier; a fixed
    weight threshold degenerates to a complete graph as SF grows), then
    per-node triangle counts and local clustering coefficients via the
    degree-ordered oriented wedge join (operators/graph.triangle_stats).
    The kNN-graph -> community-structure shape of an embedding-cluster
    QA pass, on relational data so the oracle is exact."""
    from db_integration_via_kafka_ksql_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    # context_cap=None: the UNCAPPED baseline twin (every shared part
    # counts) — the r14 verdict's weak #1: per-context pair space is
    # occupancy², unbounded at 100 TB. The capped query below is the
    # scale path and holds the driver slot + benched row since r15.
    edges = G.cooccurrence_knn_edges(
        li, item_col="l_suppkey", context_col="l_partkey",
        k=KNN_GRAPH_K, context_cap=None,
    )
    return G.triangle_stats(edges)


KNN_CONTEXT_CAP = 32  # binds at sf0.01 (drops 132/2000 part contexts)


@query(
    "graph_knn_triangles_capped",
    # r15 (verdict weak #1 fix): the bounded-occupancy variant IS
    # DuckDB-expressible — the cap is one HAVING on the context
    # grouping — so the scale-safe form gets the oracle slot and the
    # benched headline row; the uncapped form above demotes to the
    # baseline-twin stance (same as dedup's brute-force rows). Same
    # independent-enumeration oracle: symmetric-adjacency wedge
    # closure, NOT a replay of the degree-ordered Spark plan.
    oracle=f"""
    WITH ps0 AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    keepctx AS (
      SELECT p FROM ps0 GROUP BY p HAVING count(*) <= {KNN_CONTEXT_CAP}
    ),
    ps AS (SELECT ps0.p, ps0.s FROM ps0 JOIN keepctx USING (p)),
    pairs AS (
      SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS shared
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2
    ),
    dir AS (
      SELECT sa AS s, sb AS nbr, shared FROM pairs
      UNION ALL SELECT sb, sa, shared FROM pairs
    ),
    kept AS (
      SELECT s, nbr FROM (
        SELECT s, nbr, row_number() OVER (
          PARTITION BY s ORDER BY shared DESC, nbr ASC) AS rk
        FROM dir) t WHERE rk <= {KNN_GRAPH_K}
    ),
    adj AS (
      SELECT DISTINCT * FROM (
        SELECT s, nbr FROM kept UNION ALL SELECT nbr, s FROM kept) u
    ),
    tri AS (
      SELECT a1.s AS node, CAST(count(*) AS BIGINT) AS nt
      FROM adj a1
      JOIN adj a2 ON a1.s = a2.s AND a1.nbr < a2.nbr
      JOIN adj e ON e.s = a1.nbr AND e.nbr = a2.nbr
      GROUP BY 1
    ),
    deg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS degree FROM adj GROUP BY 1)
    SELECT d.node, d.degree,
           coalesce(t.nt, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN 2 * coalesce(t.nt, 0) * 1000 // (d.degree * (d.degree - 1))
                ELSE CAST(0 AS BIGINT) END AS clustering_permille
    FROM deg d LEFT JOIN tri t USING (node)
    """,
)
def graph_knn_triangles_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph triangle census with the bounded-occupancy context cap
    (graph.cooccurrence_knn_edges context_cap): contexts shared by more
    than {cap} items are dropped BEFORE the pair self-join, bounding
    candidates at n_contexts * cap²/2 — the scale knob the r14 sf1 probe
    flagged the uncapped row for (per-context pair space is occupancy²).
    A hot context distinguishes nobody (the stop-word argument), so the
    cap removes noise weight along with the quadratic term. cap=32 BINDS
    on the test data (132 of 2000 part contexts drop at sf0.01), so the
    oracle exercises the filter, not a no-op flag."""
    from db_integration_via_kafka_ksql_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_knn_edges(
        li, item_col="l_suppkey", context_col="l_partkey",
        k=KNN_GRAPH_K, context_cap=KNN_CONTEXT_CAP,
    )
    return G.triangle_stats(edges)


def _z_bucket_sql(col: str, lo: str, hi: str, bits: int = 16) -> str:
    """DuckDB twin of layout._bucket_expr (dlit exponent literals)."""
    from db_integration_via_kafka_ksql_spark.functions.detmath import dlit

    n = 1 << bits
    return (
        f"CASE WHEN {hi} = {lo} THEN CAST(0 AS BIGINT) "
        f"ELSE least(CAST(floor((CAST({col} AS DOUBLE) - {lo}) * {dlit(n)}"
        f" / ({hi} - {lo})) AS BIGINT), {n - 1}) END"
    )


def _z_terms_sql(buckets: tuple[str, ...], bits: int = 16) -> str:
    """DuckDB twin of layout.morton_interleave (`//` for DIV)."""
    ncols = len(buckets)
    return " + ".join(
        f"(({b} // {1 << k}) % 2) * {1 << (k * ncols + j)}"
        for k in range(bits)
        for j, b in enumerate(buckets)
    )


def _zval_ctes(extra_cols: str = "") -> str:
    """Shared CTE chain deriving (event_id[, extras], zb_user_id,
    zb_value, zval) for the events table — the zorder-key replay body
    used by both the key query and the zone-map report oracle."""
    return f"""
    WITH bounds AS (
      SELECT min(CAST(user_id AS DOUBLE)) AS u_min,
             max(CAST(user_id AS DOUBLE)) AS u_max,
             min(CAST(value AS DOUBLE)) AS v_min,
             max(CAST(value AS DOUBLE)) AS v_max
      FROM events
    ), b AS (
      SELECT event_id,{extra_cols}
             {_z_bucket_sql("user_id", "u_min", "u_max")} AS zb_user_id,
             {_z_bucket_sql("value", "v_min", "v_max")} AS zb_value
      FROM events, bounds
    ), z AS (
      SELECT b.*,
             CAST({_z_terms_sql(("zb_user_id", "zb_value"))} AS BIGINT)
               AS zval
      FROM b
    )
    """


def _zorder_oracle() -> str:
    """DuckDB replay of the Morton key derivation (operators/layout.py):
    identical fixed-order bucket math (dlit exponent literals) and the
    same DIV/%/* interleave spelled with DuckDB's `//`."""
    return (
        _zval_ctes()
        + """
    SELECT event_id, zb_user_id, zb_value, zval FROM z
    """
    )


@query(
    "events_zorder_keys",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    # round-10 rotation: promoted into the external driver window
    oracle=_zorder_oracle(),
)
def events_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering keys over (user_id, value): the
    multi-dimensional layout key a 100 TB table writes sorted by so
    parquet min/max stats prune scans on BOTH columns
    (operators/layout.zorder_key — Delta/Iceberg ZORDER BY semantics,
    derived with engine-portable integer bit interleave so the oracle
    replays it exactly)."""
    from db_integration_via_kafka_ksql_spark.operators import layout as L

    ev = load_table(spark, sf_dir, "events")
    return L.zorder_key(ev, ["user_id", "value"]).select(
        "event_id", "zb_user_id", "zb_value", "zval"
    )


ZM_FILES = 64
ZM_PRED = {"user_id": (10.0, 100000.0), "value": (50.0, 120.0)}


def _zone_map_oracle() -> str:
    """DuckDB replay of layout.zone_map_skip_report over events: the
    shared zval CTEs, EQUAL-ROW-COUNT rank file cuts (a plain global
    row_number here — single-node DuckDB; the operator earns the same
    rank with a partitioned window + broadcast prefix offsets), per-file
    min/max zone maps, and the disjoint-range skip rule, for both
    candidate layouts."""
    from db_integration_via_kafka_ksql_spark.functions.detmath import dlit

    u_lo, u_hi = (dlit(v) for v in ZM_PRED["user_id"])
    v_lo, v_hi = (dlit(v) for v in ZM_PRED["value"])
    cuts = {
        "zorder": "zval",
        "single_user_id": "zb_user_id",
    }
    skip = (
        f"(u_max < {u_lo} OR u_min > {u_hi} "
        f"OR vv_max < {v_lo} OR vv_min > {v_hi})"
    )
    zms = ", ".join(
        f"""cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM z), """
        + ", ".join(
            f"""zm_{name} AS (
      SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
             min(CAST(user_id AS DOUBLE)) AS u_min,
             max(CAST(user_id AS DOUBLE)) AS u_max,
             min(CAST(value AS DOUBLE)) AS vv_min,
             max(CAST(value AS DOUBLE)) AS vv_max
      FROM (
        SELECT user_id, value,
               (row_number() OVER (ORDER BY {key}, event_id) - 1)
                 * {ZM_FILES} // cnt.n AS file_id
        FROM z, cnt
      ) GROUP BY 1
    )"""
            for name, key in cuts.items()
        )
        for _ in (0,)
    )
    reps = " UNION ALL ".join(
        f"""
    SELECT '{name}' AS layout,
           CAST(count(*) AS BIGINT) AS n_files_total,
           CAST(sum(CASE WHEN {skip} THEN 1 ELSE 0 END) AS BIGINT)
             AS files_skipped,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN {skip} THEN 0 ELSE n_rows END) AS BIGINT)
             AS rows_scanned,
           CAST(sum(CASE WHEN {skip} THEN 0 ELSE n_rows END) AS BIGINT)
             * 1000 // CAST(sum(n_rows) AS BIGINT) AS scan_permille
    FROM zm_{name}"""
        for name in cuts
    )
    return _zval_ctes(extra_cols=" user_id, value,") + f", {zms} {reps}"


@query(
    "events_zone_map_skip",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-14 rotation: promoted into the external driver window
    oracle=_zone_map_oracle(),
)
def events_zone_map_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the ZORDER rewrite actually buys: per-file zone maps under
    the z-order layout vs a user_id-only sort, and how many of the 64
    equal-key-range files the (user_id, value) range predicate skips in
    each (layout.zone_map_skip_report — the parquet row-group pruning
    rule, measured instead of guessed). The predicate is weakly
    selective on user_id and tight on value — the regime a ZORDER
    rewrite exists for: the user_id-only sort can barely skip (its
    files have unbounded value extent), while z-order files bound BOTH
    columns and prune on whichever the predicate actually bites."""
    from db_integration_via_kafka_ksql_spark.operators import layout as L

    ev = load_table(spark, sf_dir, "events")
    return L.zone_map_skip_report(
        ev, ["user_id", "value"], ZM_PRED, id_col="event_id",
        n_files=ZM_FILES,
    )


@query(
    "events_zone_map_read_pruned",
    # round-14: the read-side consumer of the zorder write path (r13
    # verdict #6) — promoted straight into the driver window
    oracle=f"""
    SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
    FROM events
    WHERE user_id >= {dlit(ZM_PRED["user_id"][0])}
      AND user_id <= {dlit(ZM_PRED["user_id"][1])}
      AND value >= {dlit(ZM_PRED["value"][0])}
      AND value <= {dlit(ZM_PRED["value"][1])}
    """,
)
def events_zone_map_read_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zone-map layout's actual READ path (r13 verdict #6: the skip
    report measured what ZORDER buys, but no reader consumed the zone
    maps): events are written z-ordered on (user_id, value) via
    write_dataset, then read back through sinks.dataset.zone_map_scan —
    per-file footer min/max stats evaluated driver-side (the
    Delta/Iceberg planner-stats shape), non-intersecting files never
    opened, the predicate re-applied row-level on the kept files.

    The oracle is the PLAIN range filter over the source table: min/max
    bounds can never skip a matching row, so hash parity proves the
    file-skip lossless — the same oracle stance as the bloom-pruned
    join. The skip FRACTION (what pruning saved) is asserted in
    tests/test_dataset_sink.py, not here."""
    import os
    import tempfile

    from db_integration_via_kafka_ksql_spark.sinks import dataset as DS

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_zone_read_{os.getpid()}"
    )
    DS.write_dataset(
        ev,
        path,
        partition_cols=["event_type"],
        zorder_cols=["user_id", "value"],
        # ~2000 rows/file keeps dozens of prunable files at sf0.1 without
        # paying a tiny-files write inside the benched row (the skip-
        # fraction test uses its own denser layout)
        max_records_per_file=2000,
    )
    pruned, _stats = DS.zone_map_scan(spark, path, ZM_PRED)
    return pruned.select("event_id", "user_id", "event_type", "value")


SKEW_REPORT_TOP_K = 20


@query(
    "skew_user_activity_report",
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH counts AS (
        SELECT user_id AS k, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
    -- tie-break on the RAW numeric key: the operator sorts before its
    -- string cast ('10' < '4' as strings would reorder ties)
    top AS (
        SELECT k, cnt FROM counts
        ORDER BY cnt DESC, k ASC LIMIT {SKEW_REPORT_TOP_K}
    )
    SELECT CAST(k AS VARCHAR) AS key, cnt,
           cnt * 1000 // total AS share_permille,
           CAST(sum(cnt) OVER (
               ORDER BY cnt DESC, k ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) * 1000 // total AS cum_share_permille,
           CAST(row_number() OVER (ORDER BY cnt DESC, k ASC) AS BIGINT)
             AS rank
    FROM top, t
    """,
)
def skew_user_activity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics over the event stream (operators/skew.
    skew_key_report): the heaviest user_ids with exact integer shares
    and cumulative concentration — the report that decides whether the
    salted twins (skew_salted_*) are worth their second pass."""
    from db_integration_via_kafka_ksql_spark.operators import skew as SKW

    ev = load_table(spark, sf_dir, "events")
    return SKW.skew_key_report(ev, "user_id", top_k=SKEW_REPORT_TOP_K)


@query(
    "validate_orders_constraints",
    # round-12 rotation: promoted into the driver window
    oracle="""
    WITH base AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS b_comp,
               CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                    AS BIGINT) AS b_uni,
               CAST(sum(CASE WHEN NOT coalesce(
                        o_orderstatus IN ('O', 'F', 'P'), false)
                    THEN 1 ELSE 0 END) AS BIGINT) AS b_dom,
               CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, false)
                    THEN 1 ELSE 0 END) AS BIGINT) AS b_pos
        FROM orders
    ),
    refc AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o.o_custkey IS NOT NULL
                             AND c.c_custkey IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS b
        FROM orders o
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o.o_custkey = c.c_custkey
    ),
    rep AS (
        SELECT 'custkey_complete' AS c, n AS n_rows, b_comp AS n_bad FROM base
        UNION ALL SELECT 'status_domain', n, b_dom FROM base
        UNION ALL SELECT 'positive_price', n, b_pos FROM base
        UNION ALL SELECT 'orderkey_unique', n, b_uni FROM base
        UNION ALL SELECT 'custkey_resolves', n, b FROM refc
    )
    SELECT c AS "constraint", n_rows, n_bad,
           CASE WHEN n_rows = 0 THEN 1000
                ELSE (n_rows - n_bad) * 1000 // n_rows END AS metric_permille,
           CASE WHEN (CASE WHEN n_rows = 0 THEN 1000
                      ELSE (n_rows - n_bad) * 1000 // n_rows END) >= 1000
                THEN 'pass' ELSE 'fail' END AS status
    FROM rep
    """,
)
def validate_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative expectation suite over the orders feed
    (operators/validation.check_constraints): completeness, key
    uniqueness, domain conformance, a row predicate, and referential
    integrity against customer — the ingest gate a warehouse runs before
    anything downstream trusts the CDC-landed table."""
    from db_integration_via_kafka_ksql_spark.operators import validation as VAL

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return VAL.check_constraints(
        orders,
        [
            VAL.completeness("custkey_complete", "o_custkey"),
            VAL.in_set("status_domain", "o_orderstatus", ("O", "F", "P")),
            VAL.predicate("positive_price", "o_totalprice > 0"),
            VAL.uniqueness("orderkey_unique", "o_orderkey"),
            VAL.referential(
                "custkey_resolves", "o_custkey", customer, "c_custkey"
            ),
        ],
    )


@query(
    "join_bloom_pruned_urgent_qty",
    # round-12 rotation: promoted into the driver window
    oracle="""
    SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4))
                AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def join_bloom_pruned_urgent_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned big-big join (relational.bloom_pruned_join): lineitem
    against URGENT orders, with a Bloom filter of the selective dim's
    keys dropping non-matching fact rows BEFORE the join shuffle. The
    oracle is the PLAIN join — parity proves the prune loses nothing
    (no false negatives), which is the operator's whole contract."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = R.bloom_pruned_join(lineitem, urgent, "l_orderkey", "o_orderkey")
    return (
        joined.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("ym")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("sum_qty"),
        )
    )


EXACT_QS = (250, 500, 750, 900)


@query(
    "events_value_exact_quantiles",
    driver=False,  # round-15 rotation: veteran slot (r12) ceded; hist + per-type quantile twins stay
    # round-12 rotation: promoted into the driver window
    oracle=f"""
    WITH base AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
    vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
    cum AS (
        SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM vc
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)
    SELECT CAST(qs.q AS BIGINT) AS q_permille, min(cum.v) AS value
    FROM (VALUES {", ".join(f"({q})" for q in EXACT_QS)}) qs(q)
    JOIN nn ON true
    JOIN cum ON cum.cum * 1000 >= qs.q * nn.n
    GROUP BY 1
    """,
)
def events_value_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-statistic quantiles of events.value
    (relational.exact_value_quantiles): the precise-rank twin of the
    equi-width histogram and log-bucket sketches — distinct-value
    counts, bucket-partitioned running sums + broadcast prefix offsets
    (never a one-task global sort), all-integer rank selection, values
    passed through untouched (bit-exact cross-engine)."""
    return R.exact_value_quantiles(
        load_table(spark, sf_dir, "events"), "value", EXACT_QS
    )


GROUPED_QS = (500, 900)


@query(
    "events_type_value_quantiles",
    driver=False,  # round-16 rotation: veteran (r12) cedes; events_value_quantiles_hist keeps the quantile slot
    oracle=f"""
    WITH base AS (
        SELECT event_type AS grp, value AS v FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    vc AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
    cum AS (
        SELECT grp, v,
               CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum
        FROM vc
    ),
    nn AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1)
    SELECT cum.grp AS event_type, CAST(qs.q AS BIGINT) AS q_permille,
           min(cum.v) AS value
    FROM (VALUES {", ".join(f"({q})" for q in GROUPED_QS)}) qs(q)
    JOIN nn ON true
    JOIN cum ON cum.grp = nn.grp AND cum.cum * 1000 >= qs.q * nn.n
    GROUP BY 1, 2
    """,
)
def events_type_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact value quantiles
    (relational.exact_value_quantiles_by_group): the grouped twin of the
    global exact-quantile selection — per-group bounds join, (group,
    bucket)-partitioned running sums, group-partitioned prefix offsets,
    one conditional-min aggregate per group."""
    return R.exact_value_quantiles_by_group(
        load_table(spark, sf_dir, "events"), "event_type", "value", GROUPED_QS
    )


MAD_K_TENTHS = 30


def _robust_outlier_oracle() -> str:
    """DuckDB replay of relational.robust_outlier_report over events:
    both order statistics via the SAME integer rank-selection rule
    (min v with cum*1000 >= 500*n, within-group cumulative counts over
    distinct values), one dlit-folded threshold multiply."""
    from db_integration_via_kafka_ksql_spark.functions.detmath import dlit
    from db_integration_via_kafka_ksql_spark.operators.relational import (
        MAD_CONSISTENCY,
    )

    cut = dlit(MAD_CONSISTENCY * MAD_K_TENTHS / 10.0)

    def rank_median(src: str, col: str) -> str:
        return f"""(
      SELECT grp, min({col}) AS m FROM (
        SELECT grp, {col},
               CAST(sum(c) OVER (
                   PARTITION BY grp ORDER BY {col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum,
               n
        FROM (
          SELECT grp, {col}, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(count(*)) OVER (PARTITION BY grp) AS BIGINT) AS n
          FROM {src} GROUP BY 1, 2
        )
      ) WHERE cum * 1000 >= 500 * n GROUP BY grp
    )"""

    return f"""
    WITH base AS (
      SELECT event_type AS grp, value AS v FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    med AS {rank_median("base", "v")},
    dev AS (
      SELECT b.grp, b.v, m.m AS med, abs(b.v - m.m) AS adev
      FROM base b JOIN med m USING (grp)
    ),
    mad AS {rank_median("dev", "adev")}
    SELECT d.grp AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(d.med) AS med,
           min(a.m) AS mad,
           CAST(sum(CASE WHEN d.adev > {cut} * a.m THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN d.adev > {cut} * a.m THEN 1 ELSE 0 END)
                AS BIGINT) * 1000 // CAST(count(*) AS BIGINT)
             AS outlier_permille
    FROM dev d JOIN mad a USING (grp)
    GROUP BY 1
    """


@query(
    "events_value_robust_outliers",
    # round-14 rotation: promoted into the external driver window
    oracle=_robust_outlier_oracle(),
)
def events_value_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier screen: exact median + exact MAD
    with the Hampel 3-sigma-equivalent cut (k=3.0, consistency 1.4826)
    — the contamination-proof twin of the mean/std hourly anomaly
    screen (relational.robust_outlier_report; both order statistics via
    the integer rank selection of exact_value_quantiles_by_group, so
    the whole report is bit-exact cross-engine)."""
    ev = load_table(spark, sf_dir, "events")
    return R.robust_outlier_report(
        ev, "event_type", "value", k_tenths=MAD_K_TENTHS
    )
