"""Physical-plan audit helpers.

Usage in tests / CI:

    report = audit(df)
    assert report.n_exchanges <= 2
    assert report.scans["lineitem"].pushed_filters
    assert len(report.scans["lineitem"].read_columns) <= 7

and during development: `print(audit(df).summary())` after every operator
change — iterate until the plan is the one you'd want at 1000 executors,
not just the first one that passes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScanInfo:
    location: str
    read_columns: list[str]
    pushed_filters: list[str]
    partition_filters: list[str] = field(default_factory=list)


@dataclass
class PlanReport:
    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    n_shuffle_exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    hash_aggregates: int = 0
    sort_aggregates: int = 0
    has_partial_aggregate: bool = False
    take_ordered: bool = False
    windows: int = 0
    scans: dict[str, ScanInfo] = field(default_factory=dict)
    plan_text: str = ""

    def summary(self) -> str:
        lines = [
            f"exchanges: {self.n_shuffle_exchanges} shuffle"
            f" + {self.n_broadcast_exchanges} broadcast",
            f"joins: {self.broadcast_hash_joins} broadcast-hash,"
            f" {self.sort_merge_joins} sort-merge, {self.nested_loop_joins} nested-loop",
            f"aggregates: {self.hash_aggregates} hash, {self.sort_aggregates} sort,"
            f" partial={self.has_partial_aggregate}",
            f"take_ordered={self.take_ordered}, windows={self.windows}",
        ]
        for name, s in self.scans.items():
            lines.append(
                f"scan {name}: cols={len(s.read_columns)}"
                f" pushed={bool(s.pushed_filters)}"
            )
        return "\n".join(lines)


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()  # noqa: SLF001 — no public plan-string API
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def audit(df: DataFrame) -> PlanReport:
    text = physical_plan(df)
    r = PlanReport(plan_text=text)

    # the formatted plan prints every node twice (tree + detail section);
    # count only the "(N) NodeName" detail headers — one per node.
    def n(op: str) -> int:
        return len(re.findall(rf"(?m)^\(\d+\) {op}\b", text))

    r.n_broadcast_exchanges = n("BroadcastExchange")
    r.n_shuffle_exchanges = n("Exchange")
    r.n_exchanges = r.n_shuffle_exchanges + r.n_broadcast_exchanges
    r.broadcast_hash_joins = n("BroadcastHashJoin")
    r.sort_merge_joins = n("SortMergeJoin")
    r.nested_loop_joins = n("BroadcastNestedLoopJoin") + n("CartesianProduct")
    r.hash_aggregates = n("HashAggregate") + n("ObjectHashAggregate")
    r.sort_aggregates = n("SortAggregate")
    r.has_partial_aggregate = "partial_" in text
    r.take_ordered = n("TakeOrderedAndProject") > 0
    r.windows = n("Window")

    # scans: "(N) Scan parquet" blocks carry Location/ReadSchema/PushedFilters
    for block in re.split(r"\n\(\d+\) ", text):
        if not block.startswith("Scan parquet"):
            continue
        loc = re.search(r"Location:.*?\[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, re.S)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        part = re.search(r"PartitionFilters: \[(.*?)\]", block)
        location = loc.group(1) if loc else "?"
        name = location.rstrip("/").split("/")[-1].replace(".parquet", "")
        cols = (
            [c.split(":")[0].strip() for c in schema.group(1).split(",")]
            if schema and schema.group(1).strip()
            else []
        )
        filters = (
            [f.strip() for f in pushed.group(1).split(",") if f.strip()]
            if pushed
            else []
        )
        part_filters = (
            [f.strip() for f in part.group(1).split(",") if f.strip()]
            if part
            else []
        )
        r.scans[name] = ScanInfo(location, cols, filters, part_filters)
    return r
