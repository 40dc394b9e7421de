"""Relational operators: projection/filter (SURVEY §2.2 T4/T6), aggregation
(§2.3 A1-A2), joins/windows/sort/set-ops (§2.4 — the star schema the
reference intended via cso.DimProduct/DimCustomer/FactSales,
purge-source-db.sh:20-23, expanded per the build contract).

Scale design notes (100 TB fact tables, small-to-medium dims):
- Dim joins use ``broadcast()`` explicitly for region/nation/supplier-class
  dims — at TPC-H-like ratios these stay tiny relative to the fact table,
  and broadcasting removes the fact-side shuffle entirely. customer/part
  grow with SF, so those joins are left to AQE: at runtime it picks
  broadcast vs shuffled-hash vs sort-merge from observed sizes and splits
  skewed partitions (session.py enables skewJoin).
- Money arithmetic is done in DECIMAL(18,4): decimal sums are associative/
  commutative, so results are independent of partitioning and task order —
  required both for the DuckDB parity gate and for run-to-run stability on
  a cluster. Final outputs cast to DOUBLE for a compact schema.
- Aggregations are plain groupBy → partial + final HashAggregate (map-side
  combine); no windows where an aggregation suffices. Window functions are
  used only where per-row ranks are genuinely needed, with tie-broken
  deterministic orderings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators.analytics import (
    floor_div_sql as _floor_div_sql,
)

from db_integration_via_kafka_ksql_spark.functions.detmath import dlit

DEC = "decimal(18,4)"


def ts_lit(iso: str) -> Column:
    """Timezone-independent timestamp literal.

    Spark 4 infers TIMESTAMP_NTZ for the testdata's non-UTC-adjusted parquet
    timestamps; an NTZ literal keeps comparisons free of the session
    timezone (which the external driver controls) and matches DuckDB's
    naive-timestamp semantics. Still a foldable constant, so parquet
    predicate pushdown applies.
    """
    return F.lit(iso).cast("timestamp_ntz")


def money(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: Column, alias: str) -> Column:
    """Order-independent decimal sum exposed as double.

    The sum itself is exact decimal. The double conversion truncates at 4
    decimal places via FLOOR first: floor is tie-free (Spark narrows
    decimals HALF_UP, DuckDB HALF_EVEN — a rounding cast can disagree on
    exact ties) and the floored value * 1e4 fits in 2^53, where both
    engines' int→double conversion is exact (DuckDB's direct
    decimal(38,12)→double cast is off by an ulp for >2^53 mantissas).
    """
    return (
        F.floor(F.sum(c).cast("decimal(27,12)") * F.lit(10000)).cast("double")
        / F.lit(10000.0)
    ).alias(alias)


def pricing_summary(lineitem: DataFrame, ship_before: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over the fact table (§2.3 extension).

    Pure two-column groupBy with partial aggregation — at 100 TB this scans
    once, combines map-side to ~|flags|x|status| rows per task, and shuffles
    only those. Predicate on l_shipdate is pushed to the parquet scan.
    """
    li = lineitem.filter(F.col("l_shipdate") < ts_lit(ship_before))
    qty = money("l_quantity")
    price = money("l_extendedprice")
    disc = money("l_discount")
    tax = money("l_tax")
    disc_price = price * (F.lit(1).cast(DEC) - disc)
    # charge needs care: every step below is EXACT decimal arithmetic in
    # both Spark and DuckDB. (9,4)-terms multiply to (21,8)/(20,8); times
    # price at (15,4) lands on (37,12)/(35,12) — inside precision 38, so
    # neither engine rounds and the sums agree bit-for-bit. A narrower
    # chain (e.g. casting disc_price to scale 6) rounds, and the two
    # engines' rounding modes differ.
    one4 = F.lit(1).cast("decimal(9,4)")
    factor = (one4 - F.col("l_discount").cast("decimal(9,4)")) * (
        one4 + F.col("l_tax").cast("decimal(9,4)")
    )
    charge = F.col("l_extendedprice").cast("decimal(15,4)") * factor
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty, "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


def revenue(lineitem_cols: DataFrame) -> Column:
    return money("l_extendedprice") * (F.lit(1).cast(DEC) - money("l_discount"))


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str,
    cutoff: str,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-style: top-k unshipped orders by revenue.

    Join order: filtered customer (selective, ~1/5) into orders, then into
    lineitem. customer→orders is AQE-decided (broadcast at small SF,
    shuffled-hash at scale); orders→lineitem co-partitions on orderkey.
    Top-k is a TakeOrderedAndProject — no global sort materialization.
    """
    cut = ts_lit(cutoff)
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    joined = cust.join(ords, cust.c_custkey == ords.o_custkey).join(
        li, ords.o_orderkey == li.l_orderkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(revenue(joined), "revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate"),
            "o_orderpriority",
        )
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str,
    date_from: str,
    date_to: str,
) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier share
    the nation. nation/region are broadcast (tiny at any SF); the
    supplier-nation equality is enforced post-join via column equality.
    """
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("n_nationkey", "n_name")
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= ts_lit(date_from))
        & (F.col("o_orderdate") < ts_lit(date_to))
    ).select("o_orderkey", "o_custkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(dsum(revenue(joined), "revenue"))


def sales_by_region_segment(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Star join: fact → dims rollup (the reference's intended
    FactSales/DimCustomer analysis, purge-source-db.sh:20-23)."""
    joined = (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return joined.groupBy("r_name", "c_mktsegment").agg(
        dsum(revenue(joined), "revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window rank: top-k orders per customer by value (§2.4 extension).

    Deterministic tie-break on o_orderkey. At scale this is the one shuffle-
    sort this module keeps — rank semantics genuinely need the window.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            money("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def running_customer_spend(orders: DataFrame) -> DataFrame:
    """Window running total of spend per customer in order-date order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate"),
        F.sum(money("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


def top_expensive_orders(orders: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — never a full sort at scale)."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "o_orderkey",
            "o_custkey",
            money("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderpriority",
        )
    )


def order_value_extremes_union(orders: DataFrame, low: float, high: float) -> DataFrame:
    """Set op (§2.4 UNION ALL, purge-source-db.sh:77-83): label and union
    the tails of the order-value distribution."""
    base = orders.select(
        "o_orderkey", money("o_totalprice").cast("double").alias("o_totalprice")
    )
    lo = base.filter(F.col("o_totalprice") < low).withColumn(
        "bucket", F.lit("low")
    )
    hi = base.filter(F.col("o_totalprice") > high).withColumn(
        "bucket", F.lit("high")
    )
    return lo.unionByName(hi)


def customers_with_open_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join (EXISTS): customers holding an open order."""
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no order in the given
    orders frame (callers scope the frame, e.g. to open orders)."""
    return customer.join(
        orders.select("o_custkey"),
        customer.c_custkey == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name", "c_nationkey")


def segment_distinct_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Distinct aggregation: per segment, distinct ordering customers and
    order count. count(DISTINCT) expands to a two-phase aggregate — at
    scale prefer approx_count_distinct; the exact form is kept here because
    the oracle gate needs exact values."""
    joined = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(money("o_totalprice"), "total_value"),
    )


def events_hourly_counts(events: DataFrame) -> DataFrame:
    """Tumbling-window aggregation in batch form: events per hour per type.

    The hour bucket is integer arithmetic over epoch-micros (derived
    type-robustly via io.epoch_us_col), so the same groupBy works
    identically in a Structured Streaming window() at the streaming layer.
    """
    from db_integration_via_kafka_ksql_spark.io import epoch_us_col

    return (
        events.withColumn("__ts_us", epoch_us_col(events, "ts"))
        .withColumn(
            "hour_bucket",
            F.expr(_floor_div_sql("__ts_us", 3_600_000_000, "spark")),
        )
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(money("value"), "sum_value"),
        )
    )


def rollup_sales_by_region_segment(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """ROLLUP with subtotal rows (grouping-sets family, §2.3 extension).

    Same star join as sales_by_region_segment; the rollup adds the
    per-region and grand-total rows in the same single shuffle —
    Spark expands grouping sets map-side, so no extra pass over the fact
    table.
    """
    joined = (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return joined.rollup("r_name", "c_mktsegment").agg(
        dsum(revenue(joined), "revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
        F.grouping_id().cast("bigint").alias("grp"),
    )


def cube_order_stats(orders: DataFrame) -> DataFrame:
    """CUBE over status x priority: every subtotal combination in one
    shuffle (map-side grouping-set expansion)."""
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(money("o_totalprice"), "total_value"),
        F.grouping_id().cast("bigint").alias("grp"),
    )


def customer_order_counts_outer(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer join with zero-fill: every customer, ordering or not
    (the reference's count-parity check generalized, §2.4 joins)."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(money("o_totalprice")).alias("val"),
    )
    return (
        customer.select("c_custkey", "c_mktsegment")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.col("val").cast("double"), F.lit(0.0)).alias("total_spend"),
        )
    )


def late_shipment_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-style EXISTS correlated subquery: orders having at least
    one lineitem shipped after the order date, counted by priority.
    Plans as a left-semi join — the fact side never duplicates."""
    late = lineitem.select("l_orderkey", "l_shipdate")
    sel = orders.join(
        late,
        (orders.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def moving_avg_spend(orders: DataFrame) -> DataFrame:
    """Sliding-frame window: 3-order moving average of spend per customer
    (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). The decimal sum keeps the
    frame arithmetic exact; the divide is per-row (frame-size count)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate"),
        (
            F.sum(money("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("avg3_spend"),
    )


def min_price_parts_per_brand(part: DataFrame) -> DataFrame:
    """TPC-H Q2-style correlated scalar subquery: the part(s) at each
    brand's minimum retail price. Expressed as an aggregation self-join —
    Catalyst plans the same shape for the EXISTS/scalar-subquery SQL, and
    the agg side is tiny (one row per brand) so it broadcasts."""
    min_per_brand = part.groupBy(F.col("p_brand").alias("mb_brand")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(min_per_brand),
            (F.col("p_brand") == F.col("mb_brand"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            money("p_retailprice").cast("double").alias("p_retailprice"),
        )
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` column and
    aggregate the extracted field — get_json_object stays JVM-side
    (Jackson) with no Python involvement; at scale, prefer from_json with
    an explicit schema once the shape is known (single parse, typed)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def events_hourly_anomalies(events: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Per-type z-score of each hour's event count against that type's own
    hourly distribution — the standard traffic-anomaly screen over a
    metrics stream.

    The variance is computed from EXACT integer sums (n, Σc, Σc²) with a
    fixed sequence of double ops, never `stddev_samp`: builtin stddev
    accumulates floats in engine/partition-dependent order and would
    break bit-exact DuckDB parity. One extra aggregation over the (tiny)
    hourly frame + a broadcast join back — no window over raw events.

    Output: (event_type, hour_bucket, n_events, zscore, is_anomaly).
    Types with <2 hours or zero variance score 0.0 (no distribution to
    deviate from).
    """
    from db_integration_via_kafka_ksql_spark.io import epoch_us_col

    hourly = (
        events.withColumn("__ts_us", epoch_us_col(events, "ts"))
        .withColumn(
            "hour_bucket",
            F.expr(_floor_div_sql("__ts_us", 3_600_000_000, "spark")),
        )
        .groupBy("hour_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    n_d = F.col("n_hours").cast("double")
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    c_d = F.col("n_events").cast("double")
    mean = s_d / n_d
    var = (ss_d - s_d * s_d / n_d) / (F.col("n_hours") - F.lit(1)).cast("double")
    z = F.when(
        (F.col("n_hours") > 1) & (var > 0), (c_d - mean) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return j.select(
        "event_type",
        "hour_bucket",
        "n_events",
        z.alias("zscore"),
        (F.abs(z) >= F.lit(float(z_threshold))).alias("is_anomaly"),
    )


def profile_table(
    df: DataFrame, cols: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """ANALYZE-style column profile: one output row per column with
    (n_rows, n_null, n_distinct, min/max as strings) — the data-quality
    sweep run before pointing a training pipeline at a new table, and
    the DESCRIBE-with-statistics surface the reference's stack exposes
    through its SQL frontends.

    One aggregation pass computes every column's stats together. With
    ``approx=False`` the distinct counts are exact: Spark plans multiple
    COUNT(DISTINCT) via Expand (input multiplied by #cols) — fine for
    profiling runs, but at 100 TB x wide tables pass ``approx=True``:
    HLL++ sketches (approx_count_distinct) need no Expand, keeping the
    pass at one straight map-side-combined aggregate. min/max are cast
    to string AFTER aggregation (2 values per column, not 2 casts per
    row). Avoid float columns when hash-comparing profiles across
    engines — float-to-string formatting is engine-specific.
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in names:
        nd = (
            F.approx_count_distinct(c)
            if approx
            else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(c).cast("bigint").alias(f"__nn_{c}"),
            nd.cast("bigint").alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in names
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def user_inter_arrival_stats(events: DataFrame, ts_us: Column) -> DataFrame:
    """Per-user inter-arrival statistics over the event stream: the
    LAG-analytic rollup (time since the previous event, per user) that
    feeds rate limiting, bot detection, and session-gap calibration —
    e.g. pick `sessionize`'s gap threshold from the observed gap
    distribution instead of guessing.

    ts_us: the epoch-microsecond Column for the frame (callers pass
    io.epoch_us_col(df) so the parquet TIMESTAMP encoding never leaks in).

    Ordering is (ts_us, event_id) — fully deterministic under same-
    timestamp ties. Users with a single event have no gap and are
    omitted (stated contract; avoids engine-specific NULL/divide-by-zero
    edge semantics in the mean). avg_gap_us is an exact-int / exact-int
    single IEEE division — bit-identical cross-engine.

    Scale shape: ONE window partitioned by user (per-user frames,
    never a global sort) + ONE map-side-combined groupBy on the same
    key — the window's hash partitioning is reusable by the aggregate,
    so the plan carries a single user-keyed exchange.

    Returns (user_id, n_events, n_gaps, min_gap_us, max_gap_us,
    sum_gap_us, avg_gap_us).
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = events.select(
        "user_id", ts_us.alias("ts_us"), "event_id"
    ).withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("gap_us").cast("bigint").alias("n_gaps"),
            F.min("gap_us").cast("bigint").alias("min_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
            F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
        )
        .filter(F.col("n_gaps") >= 1)
        .withColumn(
            "avg_gap_us",
            F.col("sum_gap_us").cast("double") / F.col("n_gaps").cast("double"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 256,
    quantiles_permille: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Approximate quantiles via an equi-width histogram — deterministic
    and cross-engine exact, unlike t-digest/GK summaries whose merge
    order leaks into the result (the reason ``approx_order_stats`` is
    only tolerance-gated; this one is hash-parity-gated).

    One min/max pass fixes the bucket geometry (broadcast single row),
    one partially-aggregated groupBy builds the n_buckets-row histogram,
    and a bucket-ordered running sum picks, per requested permille, the
    first bucket whose cumulative count covers it; the answer is that
    bucket's UPPER edge (so approx_value >= the true quantile, off by at
    most one bucket width — the bound asserted in tests). Bucket math is
    a fixed-order IEEE double sequence on the broadcast bounds.

    At 100 TB: the data crosses the wire once as <= n_buckets rows per
    partition; the window runs over n_buckets rows, never over data.

    Returns (q_permille, bucket, approx_value, n_total).
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    nb = n_buckets
    bounds = df.agg(
        F.min(value_col).alias("vmin"), F.max(value_col).alias("vmax")
    )
    bucket = F.expr(
        f"CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT) "
        f"ELSE least(CAST(floor((({value_col} - vmin) * {dlit(nb)})"
        f" / (vmax - vmin)) AS BIGINT), {nb - 1}) END"
    )
    counts = (
        df.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    win = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "bucket",
        F.sum("cnt").over(win).cast("long").alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n_total"),
    )
    qs = spark.createDataFrame(
        [(q,) for q in quantiles_permille], "q_permille int"
    )
    hit = (
        qs.crossJoin(F.broadcast(cum))
        .filter(F.col("cum") * 1000 >= F.col("q_permille") * F.col("n_total"))
        .groupBy("q_permille")
        .agg(F.min("bucket").alias("bucket"), F.max("n_total").alias("n_total"))
    )
    return hit.crossJoin(F.broadcast(bounds)).select(
        "q_permille",
        "bucket",
        F.expr(
            f"CASE WHEN vmax = vmin THEN vmax ELSE vmin +"
            f" CAST(bucket + 1 AS DOUBLE) * (vmax - vmin) / {dlit(nb)} END"
        ).alias("approx_value"),
        "n_total",
    )


def bloom_prune(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Pre-shuffle semi-filter for a big-big equi-join: build a Bloom
    filter of the dim side's join keys and drop fact rows that cannot
    match BEFORE the join shuffle moves them.

    No false negatives (every matching fact row survives — the join
    result is exactly the plain join's), only false positives (a few
    non-matching rows ride along and die in the join itself). The win is
    the shuffle: at a selective dim, most fact bytes never leave the
    scan stage. This is the explicit, plan-pinned form of what AQE's
    runtime bloom-filter injection does opportunistically — explicit
    because a pipeline author sizing a 100 TB join wants the prune
    guaranteed, not heuristic.

    Sizing: n_bits must track |dim keys| (~10 bits/key for ~1% false
    positives). The bitset is built distributed (map-side bit_or) but
    densified on the DRIVER and shipped as a one-row broadcast frame —
    fine to ~10^8 keys (~120 MB); beyond that, partition the dim and OR
    per-partition filters, or fall back to AQE's injected filter.

    Type-exactness: the probe hashes the RAW column value (xxhash64 is
    type-sensitive) — fact_key and dim_key must be the same type, and the
    guard below refuses mismatches instead of silently pruning everything.
    """
    from db_integration_via_kafka_ksql_spark.functions import bloom as B

    ft = dict(fact.dtypes)[fact_key]
    dt = dict(dim_keys.dtypes)[dim_key]
    if ft != dt:
        raise ValueError(
            f"bloom_prune key types differ: fact.{fact_key} is {ft}, "
            f"dim.{dim_key} is {dt} — xxhash64 is type-sensitive, cast first"
        )
    p = B.BloomParams(n_bits=n_bits, n_hashes=n_hashes)
    words = B.build_bloom(dim_keys.select(F.col(dim_key)), dim_key, p)
    bf = B.bloom_frame(fact.sparkSession, words, p)
    return (
        fact.crossJoin(F.broadcast(bf))
        .filter(B.might_contain(F.col("bf"), F.col(fact_key), p))
        .drop("bf")
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """`bloom_prune` composed with the actual inner equi-join — result
    rows are EXACTLY the plain join's (the oracle states the join with
    no bloom anywhere; parity proves the no-false-negative property)."""
    pruned = bloom_prune(fact, dim.select(dim_key), fact_key, dim_key, n_bits, n_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def exact_value_quantiles(
    df: DataFrame,
    value_col: str,
    qs_permille: Sequence[int] = (250, 500, 750, 900),
    n_buckets: int = 64,
) -> DataFrame:
    """EXACT order-statistic quantiles without a global sort — the exact
    twin of `histogram_quantiles` (one bucket of error) and the
    log-bucket sketch (relative error): when the answer must be a real
    data value at the precise rank, this is the operator.

    Selection rule: quantile q/1000 = the MINIMUM value whose cumulative
    count cum satisfies cum * 1000 >= q * n (all-integer — no float
    rank math), i.e. the lower order statistic at ceil(q*n/1000).

    Scale shape (the curriculum_order discipline — never `row_number()
    OVER (ORDER BY value)` through one task):
    - collapse rows to the DISTINCT-VALUE count frame (map-side
      combined; |values| << |rows| for measurement columns);
    - equi-width value bucket from a single-row broadcast (min, max) —
      the zorder bounds ship, an annotated broadcast-NLJ;
    - cumulative counts = a BUCKET-partitioned running window plus an
      n_buckets-row prefix-sum of bucket totals joined back by
      broadcast;
    - each requested q is one conditional MIN in a single final
      aggregate — adding quantiles adds expressions, not passes.

    Returns (q_permille, value), one row per requested quantile; empty
    input returns no rows. Values pass through unmodified (selection,
    not interpolation), so the output is bit-exact cross-engine.
    """
    if not qs_permille or any(not (0 < q <= 1000) for q in qs_permille):
        raise ValueError("qs_permille must be in (0, 1000]")
    base = df.select(F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    bounds = base.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    vc = (
        base.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "v",
            "c",
            "n",
            F.expr(
                f"CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT) ELSE "
                f"least(CAST(floor((v - vmin) / (vmax - vmin) "
                f"* {float(n_buckets)}) AS BIGINT), {n_buckets - 1}) END"
            ).alias("bucket"),
        )
    )
    wcum = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in = vc.withColumn("cum_in", F.sum("c").over(wcum)).localCheckpoint(
        eager=True
    )  # feeds bucket sizes AND the final selection
    sizes = cum_in.groupBy("bucket").agg(F.sum("c").alias("sz"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = sizes.select(
        "bucket",
        F.coalesce(F.sum("sz").over(woff), F.lit(0)).cast("bigint").alias("off"),
    )
    cum = cum_in.join(F.broadcast(offsets), "bucket").select(
        "v", "n", (F.col("off") + F.col("cum_in")).cast("bigint").alias("cum")
    )
    aggs = [
        F.min(F.when(F.col("cum") * 1000 >= q * F.col("n"), F.col("v"))).alias(
            f"_q{q}"
        )
        for q in qs_permille
    ]
    one = cum.agg(*aggs)
    stack = ", ".join(
        f"CAST({q} AS BIGINT), _q{q}" for q in qs_permille
    )
    return one.selectExpr(
        f"stack({len(qs_permille)}, {stack}) AS (q_permille, value)"
    ).filter(F.col("value").isNotNull())


def exact_value_quantiles_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs_permille: Sequence[int] = (500, 900),
    n_buckets: int = 64,
) -> DataFrame:
    """`exact_value_quantiles`, per group — exact order statistics for
    every group key in one pass (per-type latency percentiles, per-source
    length medians), same selection rule: quantile q/1000 of a group =
    the minimum value whose within-group cumulative count cum satisfies
    cum * 1000 >= q * n_group.

    Scale shape mirrors the global operator with the group key prepended
    everywhere: distinct (group, value) counts; equi-width value bucket
    from the GROUP's own (min, max) — a per-group bounds frame joined
    back on the group key (dimension-sized, no single-row crossJoin
    needed here); cumulative counts = a (group, bucket)-partitioned
    running window plus a group-partitioned prefix-sum over the
    |groups| x n_buckets bucket totals; one final conditional-min
    aggregate PER GROUP. Skew note: a hot group's distinct values spread
    over n_buckets window partitions — the window never sees more than
    one group-bucket at a time.

    Returns (group, q_permille, value); groups with only NULL values
    emit nothing."""
    if not qs_permille or any(not (0 < q <= 1000) for q in qs_permille):
        raise ValueError("qs_permille must be in (0, 1000]")
    base = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).filter(F.col("v").isNotNull() & F.col("grp").isNotNull())
    bounds = base.groupBy("grp").agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    vc = (
        base.groupBy("grp", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .join(bounds, "grp")
        .select(
            "grp",
            "v",
            "c",
            "n",
            F.expr(
                f"CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT) ELSE "
                f"least(CAST(floor((v - vmin) / (vmax - vmin) "
                f"* {float(n_buckets)}) AS BIGINT), {n_buckets - 1}) END"
            ).alias("bucket"),
        )
    )
    wcum = (
        Window.partitionBy("grp", "bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in = vc.withColumn("cum_in", F.sum("c").over(wcum)).localCheckpoint(
        eager=True
    )
    sizes = cum_in.groupBy("grp", "bucket").agg(F.sum("c").alias("sz"))
    woff = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = sizes.select(
        "grp",
        "bucket",
        F.coalesce(F.sum("sz").over(woff), F.lit(0)).cast("bigint").alias("off"),
    )
    cum = cum_in.join(offsets, ["grp", "bucket"]).select(
        "grp", "v", "n", (F.col("off") + F.col("cum_in")).cast("bigint").alias("cum")
    )
    aggs = [
        F.min(F.when(F.col("cum") * 1000 >= q * F.col("n"), F.col("v"))).alias(
            f"_q{q}"
        )
        for q in qs_permille
    ]
    one = cum.groupBy("grp").agg(*aggs)
    stack = ", ".join(f"CAST({q} AS BIGINT), _q{q}" for q in qs_permille)
    return one.selectExpr(
        f"grp AS {group_col}",
        f"stack({len(qs_permille)}, {stack}) AS (q_permille, value)",
    ).filter(F.col("value").isNotNull())


MAD_CONSISTENCY = 1.4826  # normal-consistency constant: sigma ~= 1.4826*MAD


def robust_outlier_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_tenths: int = 30,
) -> DataFrame:
    """Per-group ROBUST outlier screen: exact median + exact MAD (median
    absolute deviation), flagging values whose deviation exceeds
    (k_tenths/10) * 1.4826 * MAD — the robust twin of the mean/std
    z-score screens (events_hourly_anomalies): mean and std are
    themselves dragged by the outliers being hunted, so a 3-sigma gate
    silently widens under contamination; median/MAD have a 50%
    breakdown point (Hampel's rule). k_tenths=30 is the classic 3-sigma
    -equivalent cut.

    Both order statistics come from `exact_value_quantiles_by_group`
    (integer rank selection, never a global sort), so med and mad are
    REAL data values and the whole report replays bit-for-bit in SQL.
    The threshold multiply folds (k_tenths/10) * 1.4826 into ONE python
    -computed dlit constant — a single deterministic IEEE multiply per
    row. A constant group (mad = 0) flags every deviating value, the
    standard MAD degenerate behavior — callers gate on n if needed.

    Scale shape: two grouped exact-quantile passes (each: distinct-value
    counts, per-group bounds join, bucket-partitioned windows) over a
    deviations frame checkpointed once, then one final per-group
    aggregate. Output: (group, n, med, mad, n_outliers,
    outlier_permille) — one row per group.
    """
    if k_tenths < 1:
        raise ValueError(f"k_tenths must be >= 1, got {k_tenths}")
    med = exact_value_quantiles_by_group(
        df, group_col, value_col, (500,)
    ).select(F.col(group_col), F.col("value").alias("med"))
    base = df.select(
        F.col(group_col), F.col(value_col).alias("v")
    ).filter(F.col("v").isNotNull() & F.col(group_col).isNotNull())
    dev = (
        base.join(med, group_col)
        .withColumn("adev", F.abs(F.col("v") - F.col("med")))
        .localCheckpoint(eager=True)  # feeds the MAD pass AND the report
    )
    mad = exact_value_quantiles_by_group(
        dev, group_col, "adev", (500,)
    ).select(F.col(group_col), F.col("value").alias("mad"))
    cut = dlit(MAD_CONSISTENCY * k_tenths / 10.0)
    return (
        dev.join(mad, group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(F.expr(f"adev > {cut} * mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            group_col,
            "n",
            "med",
            "mad",
            "n_outliers",
            F.expr("n_outliers * 1000 DIV n").alias("outlier_permille"),
        )
    )
