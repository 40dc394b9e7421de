"""Time one or more registered queries in isolation (bench methodology:
noop sink, fresh plan per rep) and optionally dump .explain("formatted").

    python tools/time_query.py q1_pricing_summary sim_ivf_topk \
        [--sf /root/testdata/sf0.1] [--reps 3] [--explain-dir plans/r17] \
        [--explain-suffix _before]

Used by the optimization rounds to isolate a single row's cost and to
capture the before/after plan artifacts the judge checks. The timing
methodology matches bench.py (same session factory, same noop action);
numbers here are for LOCAL comparison while iterating — the official
cross-round artifact stays BENCH_r*.json.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_integration_via_kafka_ksql_spark.registry import all_queries  # noqa: E402
from db_integration_via_kafka_ksql_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="")
    args = ap.parse_args()

    spark = get_spark()
    qs = all_queries()
    # warm up codegen/JIT with a cheap fixed job (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query: {name}")
            continue
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(
                args.explain_dir, f"{name}{args.explain_suffix}.txt"
            )
            with open(out, "w") as f:
                f.write(plan)
            print(f"   plan -> {out}")
        if args.reps < 1:
            continue
        reps = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"time_query: {name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(reps)} reps={reps}")
    spark.stop()


if __name__ == "__main__":
    main()
