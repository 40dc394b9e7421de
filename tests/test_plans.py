"""Plan-shape regression tests: the scale properties (pushdown, pruning,
shuffle budget, join strategy, partial aggregation) asserted on the
physical plans of the headline queries. A change that silently loses a
pushed filter or adds a shuffle fails here, not at 100 TB."""

from __future__ import annotations

import pytest

from db_integration_via_kafka_ksql_spark.plans.audit import audit
from db_integration_via_kafka_ksql_spark.registry import all_queries


@pytest.fixture(scope="module")
def reports(spark, sf_dir):
    queries = all_queries()

    def build(name):
        return audit(queries[name](spark, sf_dir))

    return build


def test_q1_scan_pruned_and_pushed(reports):
    r = reports("q1_pricing_summary")
    scan = r.scans["lineitem"]
    # 7 columns of 17 — projection pruning reached the scan
    assert len(scan.read_columns) == 7
    assert any("l_shipdate" in f for f in scan.pushed_filters)
    # partial agg + exactly one shuffle for the groupBy
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1


def test_q3_topk_never_global_sorts(reports):
    r = reports("q3_shipping_priority")
    assert r.take_ordered  # LIMIT k via TakeOrderedAndProject, no full sort
    for t in ("customer", "orders", "lineitem"):
        assert r.scans[t].pushed_filters, f"{t} scan lost its pushed filter"


def test_q5_small_dims_broadcast(reports):
    r = reports("q5_local_supplier_volume")
    # region+nation are explicitly broadcast; no shuffle for those joins
    assert r.n_broadcast_exchanges >= 1
    assert r.scans["region"].pushed_filters  # r_name = 'ASIA' reached the scan


def test_compact_latest_partial_agg_before_shuffle(reports):
    r = reports("cdc_compact_latest")
    # THE scale property of the CDC core: per-partition combine first,
    # then exactly one key-hash shuffle carrying <=1 row per key/partition
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1


def test_topk_global_is_take_ordered(reports):
    r = reports("topk_expensive_orders")
    assert r.take_ordered
    assert r.n_shuffle_exchanges == 0  # top-k needs no shuffle at all


def test_exact_dedup_single_shuffle(reports):
    r = reports("dedup_exact")
    assert r.has_partial_aggregate
    assert r.n_shuffle_exchanges == 1


def test_text_ops_are_scan_only(reports):
    # narrow maps: zero shuffles, zero joins — corpus-scan speed at any SF
    for name in ("text_token_stats", "text_quality_scores", "text_fingerprints"):
        r = reports(name)
        assert r.n_exchanges == 0, f"{name} gained a shuffle"
        cols = r.scans["documents"].read_columns
        assert "text" in cols and len(cols) <= 3, f"{name} reads too much"


def test_brute_topk_broadcasts_queries(reports):
    r = reports("sim_brute_topk")
    # query set is broadcast; corpus side never shuffles before scoring
    assert r.n_broadcast_exchanges >= 1


def test_ivf_assignment_is_partial_agg_not_window(reports):
    # round-2 verdict's scale-killer: corpus→list assignment must be a
    # map-side-combined aggregate (~n rows to the exchange), never a
    # row_number window over the n x nlists cross product.
    r = reports("sim_centroid_assignment")
    assert r.has_partial_aggregate
    assert r.windows == 0, "centroid assignment regressed to a window argmin"

    r = reports("sim_ivf_topk")
    assert r.has_partial_aggregate
    # only the (|queries| x nlists) probe ranking and the final per-query
    # top-k may use windows — never the corpus assignment
    assert r.windows <= 2, "IVF corpus assignment regressed to a window argmin"
