"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count) on a
fresh action; inputs are re-read per query (no caching) so the number
reflects scan + shuffle cost, which is what scales to 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from db_integration_via_kafka_ksql_spark.registry import QUERIES  # noqa: E402
from db_integration_via_kafka_ksql_spark.session import get_spark  # noqa: E402

# headline set: the CDC core, the heaviest relational queries, and one
# representative per extension family (dedup/similarity/text/multimodal).
HEADLINE = [
    "cdc_compact_latest",
    "cdc_upsert_merge",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "star_sales_by_region_segment",
    "window_top_orders_per_customer",
    "segment_distinct_stats",
    "events_hourly_counts",
    "dedup_exact",
    "dedup_ngram_jaccard_capped",
    "dedup_embedding_pairs",
    "sim_brute_topk",
    "text_fingerprints",
    "mm_byte_features",
    "asof_join_events",
    "range_join_events_sessions",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # derive sf from the dir name (e.g. /root/testdata/sf0.1 -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    names = [n for n in HEADLINE if n in QUERIES]
    extras = sorted(set(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",")) - {""})
    names += [n for n in extras if n in QUERIES and n not in names]

    # warm the JVM/codegen once with the cheapest query so q1 doesn't pay
    # session startup, and spawn the Arrow Python workers once so the
    # Pandas-UDF queries measure steady-state, not first-fork; both
    # excluded from timings.
    QUERIES[names[0]](spark, sf_dir).count()
    spark.range(2).toDF("x").mapInPandas(lambda it: it, "x long").count()

    # best-of-2: the container's host shows multi-x performance variance
    # over time; the minimum is the reproducible cost of the plan (and the
    # second run amortizes whole-stage-codegen compilation)
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
