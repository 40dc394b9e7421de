"""Continuous data-quality gate over a stream: the streaming twin of
operators/validation.check_constraints.

Each micro-batch is scored AT ARRIVAL against the declarative constraint
suite (completeness / in_set / predicate, plus referential checks
against a STATIC dimension frame), and the per-constraint violation
counters accumulate, so the stage reports both "is THIS trigger's slice
healthy" (the alert) and "is the whole landed table healthy" (the
cumulative metric a warehouse gate reads). The per-epoch output is
deterministic given pre-batch state — the epoch-partition discipline.

Constraint support is exactly the ADDITIVE families: a batch's
(n_rows, n_bad) add into the cumulative counters, so the contract
`cumulative state after epoch e == check_constraints over everything
arrived` holds by construction. `uniqueness` is refused at build time:
distinct-ness is not additive over batches — cross-batch duplicates
need keyed state, not a counter: `streaming/keyaudit.py`'s
StreamingKeyAudit is that stage (one witness row per distinct key,
reconciling exactly with this suite's batch `uniqueness` counter).

State & exactly-once: cumulative counters and scored outputs both
publish through `epochdir.commit_epoch`, outputs first (the
anomaly/transitions crash-interleaving contract: a crash between the
two commits replays into an output skip + a state commit of the
identical recomputed merge; each epoch reads the latest committed state
strictly BEFORE itself). Counters are additive — NOT idempotent — which
is exactly why the committed-epoch guard gates the state write.

Scale shape: state is |constraints| rows; per trigger the row-level
checks ride ONE single-scan aggregate over the batch (the batch
operator, reused verbatim) plus one dimension join per referential
check; the merge joins two |constraints|-row frames. Nothing keyed by
data values ever enters state.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import validation as V
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)

OUT_SCHEMA = (
    "constraint string, n_rows long, n_bad long, metric_permille long, "
    "status string, cum_n_rows long, cum_n_bad long, "
    "cum_metric_permille long, cum_status string"
)


@dataclass
class StreamingValidation:
    """At-arrival + cumulative constraint checking for a stream."""

    spark: SparkSession
    checks: list[V.Constraint]
    output_path: str          # per-epoch scored constraint rows
    state_path: str           # per-epoch cumulative (constraint, n, bad)
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_validation"
    # scheduled epochdir maintenance (state-epoch pruning / output
    # compaction at the policy's cadence; see streaming/maintenance.py)
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        bad = [c.name for c in self.checks if c.kind == "uniqueness"]
        if bad:
            raise ValueError(
                "uniqueness is not additive across micro-batches — "
                f"cross-batch distinct-ness needs keyed state, not a "
                f"counter: use streaming.keyaudit.StreamingKeyAudit "
                f"(refused: {bad})"
            )

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
                [], "constraint string, n_rows long, n_bad long"
            )
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("constraint", "n_rows", "n_bad")
        )

    def report(self) -> DataFrame:
        """Everything scored so far (epoch, constraint, batch + cum)."""
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
            return  # idle: state unchanged, latest-before read skips gaps
        rep = (
            V.check_constraints(batch_df, self.checks)
            .localCheckpoint(eager=True)  # feeds the output AND the merge
        )
        prior = self._prior(epoch_id).localCheckpoint(eager=True)
        merged = (
            prior.withColumnRenamed("n_rows", "p_rows")
            .withColumnRenamed("n_bad", "p_bad")
            .join(rep.select("constraint", "n_rows", "n_bad"),
                  "constraint", "full_outer")
            .select(
                "constraint",
                (F.coalesce("p_rows", F.lit(0)) + F.coalesce("n_rows", F.lit(0)))
                .cast("long").alias("n_rows"),
                (F.coalesce("p_bad", F.lit(0)) + F.coalesce("n_bad", F.lit(0)))
                .cast("long").alias("n_bad"),
            )
        )
        bars = F.create_map(
            *[x for c in self.checks for x in (F.lit(c.name), F.lit(c.min_permille))]
        )
        cum = merged.select(
            "constraint",
            F.col("n_rows").alias("cum_n_rows"),
            F.col("n_bad").alias("cum_n_bad"),
            F.expr(
                "CASE WHEN n_rows = 0 THEN 1000 "
                "ELSE (n_rows - n_bad) * 1000 DIV n_rows END"
            ).cast("long").alias("cum_metric_permille"),
        ).withColumn(
            "cum_status",
            F.when(
                F.col("cum_metric_permille") >= bars[F.col("constraint")],
                F.lit("pass"),
            ).otherwise(F.lit("fail")),
        )
        out = rep.join(cum, "constraint").select(
            "constraint", "n_rows", "n_bad", "metric_permille", "status",
            "cum_n_rows", "cum_n_bad", "cum_metric_permille", "cum_status",
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
    def start(self, stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingValidation.start() requires checkpoint_dir: the "
                "epoch guard is only sound when batch numbering survives "
                "restarts"
            )
        writer = (
            stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
