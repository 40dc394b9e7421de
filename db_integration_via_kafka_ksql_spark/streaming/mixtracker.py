"""Streaming mixture burn-down: per-source token accounting against a
fixed mixture plan, at arrival.

The batch planners (token_budget_mixture / temperature_mixture) decide
how many tokens each source CONTRIBUTES; this stage watches the feed
actually fill that plan — per trigger it reports each source's
cumulative token fill (integer permille of its budget), whether the
source is done, and the batch's own contribution, so a data-ops run
can stop pulling from exhausted sources and see starved ones long
before the batch realization job would.

Counters are additive per source (the StreamingValidation discipline —
token counts add), so the CONTRACT is sharp: cumulative (n_docs,
n_tokens) per source after epoch e == one groupBy over everything
arrived, asserted per epoch in tests. Token count is the repo's
whitespace convention (functions/text.token_count), the same expression
the planners and the dataset card use — the tracker can never disagree
with the plan about what a token is.

State & exactly-once: |sources| rows of state, outputs-then-state
epochdir commits, committed-epoch guard (additive counters are not
idempotent). Per trigger: one map-side-combined groupBy over the batch
plus a |sources|-row merge. Sources arriving that the plan never
budgeted report with budget 0 and fill 1000 (over-delivered by
definition) — surfaced, not dropped.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.functions import text as T
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)

OUT_SCHEMA = (
    "source string, n_docs long, n_tokens long, cum_docs long, "
    "cum_tokens long, budget_tokens long, fill_permille long, done boolean"
)


@dataclass
class StreamingMixTracker:
    """At-arrival per-source token burn-down against a mixture plan."""

    spark: SparkSession
    plan: dict  # source -> budget tokens (the planner's output)
    output_path: str          # per-epoch burn-down rows
    state_path: str           # per-epoch cumulative (source, docs, tokens)
    source_col: str = "source"
    text_col: str = "text"
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_mix_tracker"
    # scheduled epochdir maintenance (state-epoch pruning / output
    # compaction at the policy's cadence; see streaming/maintenance.py)
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        bad = {k: v for k, v in self.plan.items() if not isinstance(v, int) or v < 0}
        if bad:
            raise ValueError(f"plan budgets must be non-negative ints: {bad}")

    # -- state ------------------------------------------------------------
    def _latest_state_epoch(self, before: int) -> int | None:
        if not os.path.isdir(self.state_path):
            return None
        best = None
        for name in os.listdir(self.state_path):
            if not name.startswith(f"{self.batch_col}="):
                continue
            try:
                e = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if e < before and (best is None or e > best):
                best = e
        return best

    def _prior(self, epoch_id: int) -> DataFrame:
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            return self.spark.createDataFrame(
                [], "source string, cum_docs long, cum_tokens long"
            )
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("source", "cum_docs", "cum_tokens")
        )

    def report(self) -> DataFrame:
        """Everything tracked so far (epoch + OUT_SCHEMA columns)."""
        return self.spark.read.parquet(self.output_path)

    # -- per-batch plan ----------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        done_out = epochdir.epoch_committed(
            self.output_path, self.batch_col, epoch_id
        )
        done_state = epochdir.epoch_committed(
            self.state_path, self.batch_col, epoch_id
        )
        if done_out and done_state:
            return  # fully committed replay
        if batch_df.isEmpty():
            if not done_out:
                epochdir.commit_epoch(
                    self.spark.createDataFrame([], OUT_SCHEMA),
                    self.output_path, self.batch_col, epoch_id,
                )
            return
        counts = (
            batch_df.select(
                F.col(self.source_col).alias("source"),
                T.token_count(self.text_col).cast("long").alias("nt"),
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("nt").cast("long").alias("n_tokens"),
            )
            .localCheckpoint(eager=True)  # feeds the output AND the merge
        )
        prior = self._prior(epoch_id).localCheckpoint(eager=True)
        merged = (
            prior.join(counts, "source", "full_outer")
            .select(
                "source",
                (F.coalesce("cum_docs", F.lit(0)) + F.coalesce("n_docs", F.lit(0)))
                .cast("long").alias("cum_docs"),
                (F.coalesce("cum_tokens", F.lit(0)) + F.coalesce("n_tokens", F.lit(0)))
                .cast("long").alias("cum_tokens"),
            )
        )
        budgets = F.create_map(
            *[x for k, v in sorted(self.plan.items()) for x in (F.lit(k), F.lit(v))]
        )
        out = (
            counts.join(merged, "source")
            .withColumn(
                "budget_tokens",
                F.coalesce(budgets[F.col("source")], F.lit(0)).cast("long"),
            )
            .select(
                "source",
                "n_docs",
                "n_tokens",
                "cum_docs",
                "cum_tokens",
                "budget_tokens",
                F.expr(
                    "CASE WHEN budget_tokens = 0 THEN CAST(1000 AS BIGINT) "
                    "ELSE least(cum_tokens * 1000 DIV budget_tokens, "
                    "CAST(1000 AS BIGINT)) END"
                ).alias("fill_permille"),
                F.expr("cum_tokens >= budget_tokens").alias("done"),
            )
        )
        epochdir.commit_epoch(out, self.output_path, self.batch_col, epoch_id)
        epochdir.commit_epoch(
            merged, self.state_path, self.batch_col, epoch_id
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            state_paths=(self.state_path,),
            output_paths=(self.output_path,),
        )

    # -- runner ------------------------------------------------------------
    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingMixTracker.start() requires checkpoint_dir: the "
                "epoch guard is only sound when batch numbering survives "
                "restarts"
            )
        writer = (
            doc_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
