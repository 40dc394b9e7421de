"""Continuous robust (median/MAD) outlier screen over a value stream.

The streaming twin of operators/relational.robust_outlier_report (r13):
the batch op screens every value against its group's FULL-corpus exact
median + MAD; this stage scores each micro-batch's values AT ARRIVAL
against the distribution accumulated BEFORE the batch — the alerting
shape (a wild value is flagged the trigger it lands, not in the nightly
batch), and the robust counterpart of StreamingAnomaly's mean/std
z-screen: mean and std are dragged by the very outliers being hunted,
while median/MAD carry a 50% breakdown point (Hampel's rule).

Semantics per batch: for every distinct (group, value) with batch
arrivals, adev = |value - prior med| and is_outlier = adev >
(k_tenths/10) * 1.4826 * prior mad — prior med/mad are the EXACT order
statistics of everything that arrived in earlier epochs, computed from
the count-table state with the batch op's selection rule (min value
whose cumulative count cum satisfies cum * 2 >= n). Groups with no
prior values score med/mad NULL and is_outlier false — the cold-start
stance: first sightings establish the distribution, they don't deviate
from it. A constant prior group (mad = 0) flags every deviating value,
the standard MAD degenerate behavior (the batch op's documented edge).

State & exactly-once: the per-(group, value) count table and the scored
output both publish through `epochdir.commit_epoch`, outputs first (the
anomaly/transitions crash-interleaving contract: a crash between the
two commits replays into an output skip + a state commit of the
identical recomputed merge; each epoch reads the latest committed state
strictly BEFORE itself). Counts are additive — NOT idempotent — which
is exactly why the committed-epoch guard, not blind remerge, gates the
state write. Idle epochs commit NOTHING (the r13 sweep discipline);
`outliers()` is guarded accordingly.

Scale shape: state is one row per (group, DISTINCT value) — the same
compression the batch op's rank selection rides (dictionary-sized, not
corpus-sized); per trigger one map-side-combined groupBy over the
batch, two window passes over the state-sized count table (the exact
weighted median and the MAD median), and an additive full-outer merge.
No raw-event state anywhere.

Reference parity: none (the reference's aggregates are exact COUNT
tables, deploy-ksql-cli.sh) — monitoring-surface extension, same stance
as StreamingAnomaly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from db_integration_via_kafka_ksql_spark.operators.relational import (
    MAD_CONSISTENCY,
    dlit,
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


def _weighted_median(counts: DataFrame, out_name: str) -> DataFrame:
    """Exact weighted median over a (grp, v, c) count table: the batch
    op's selection rule (min v with cum * 2 >= n) via ONE per-group
    cumulative window — the table is distinct-value-sized, so the window
    partition is a dictionary, never the corpus."""
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        counts.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(Window.partitionBy("grp")))
        .groupBy("grp")
        .agg(
            F.min(
                F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))
            ).alias(out_name),
            F.max("n").cast("bigint").alias(f"_n_{out_name}"),
        )
    )


@dataclass
class StreamingRobustOutlier:
    """Continuous per-group exact-median/MAD Hampel screen."""

    spark: SparkSession
    output_path: str          # per-epoch scored (grp, v) rows
    state_path: str           # per-epoch (grp, v, c) count table
    group_col: str = "event_type"
    value_col: str = "value"
    k_tenths: int = 30        # Hampel cut in tenths (30 = 3-sigma-equiv)
    # Spark SQL type names for the COLD-START empty guards (outliers()
    # before any commit, _prior_counts before any state): the real
    # frames take their types from the data, but an idle-only stream
    # has no data to derive from — a guessed string/double guard would
    # diverge from the post-first-epoch schema for e.g. bigint groups
    # (code review r14)
    group_type: str = "string"
    value_type: str = "double"
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_robust_outlier"
    # scheduled epochdir maintenance (state pruning / output
    # compaction / witness TTL per the policy) — None disables
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.k_tenths < 1:
            raise ValueError(f"k_tenths must be >= 1, got {self.k_tenths}")

    # -- state ------------------------------------------------------------
    def _latest_state_epoch(self, before: int | None) -> int | None:
        best = None
        for e in epochdir.list_epochs(self.state_path, self.batch_col):
            if (before is None or e < before) and (best is None or e > best):
                best = e
        return best

    def _prior_counts(
        self, epoch_id: int | None, like: DataFrame | None = None
    ) -> DataFrame:
        """Latest committed count table strictly before `epoch_id`.
        When no state exists yet, the empty frame is typed from `like`
        (the batch's own count frame) so the cold-start joins/merges
        don't fight a guessed schema."""
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            if like is not None:
                return self.spark.createDataFrame([], like.schema)
            return self.spark.createDataFrame(
                [], f"grp {self.group_type}, v {self.value_type}, c long"
            )
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("grp", "v", "c")
        )

    def _stats_of(self, counts: DataFrame) -> DataFrame:
        """(grp, n, med, mad) — exact order statistics of a count table,
        the batch op's med/MAD recipe over pre-aggregated counts."""
        med = _weighted_median(counts, "med").select(
            "grp", "med", F.col("_n_med").alias("n")
        )
        adev = (
            counts.join(med, "grp")
            .select(
                "grp",
                F.abs(F.col("v") - F.col("med")).alias("v"),
                "c",
            )
            .groupBy("grp", "v")
            .agg(F.sum("c").alias("c"))
        )
        mad = _weighted_median(adev, "mad").select("grp", "mad")
        return med.join(mad, "grp").select("grp", "n", "med", "mad")

    # -- views ---------------------------------------------------------------
    def current_stats(self) -> DataFrame:
        """(grp, n, med, mad) over everything committed so far — the
        frame the prefix contract pins against the batch operator."""
        return self._stats_of(self._prior_counts(None))

    def outliers(self) -> DataFrame:
        """Everything scored so far (epoch, grp, v, n_batch, med, mad,
        is_outlier). Idle-only streams have no output dir (idle epochs
        commit nothing) — return an empty scored-shaped frame."""
        if not epochdir.list_epochs(self.output_path, self.batch_col):
            return self.spark.createDataFrame(
                [],
                f"grp {self.group_type}, v {self.value_type}, "
                f"n_batch long, med {self.value_type}, "
                f"mad {self.value_type}, is_outlier boolean, "
                f"{self.batch_col} int",
            )
        return self.spark.read.parquet(self.output_path)

    # -- per-batch plan -----------------------------------------------------
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
            return  # idle: commit nothing (the r13 sweep discipline)
        bc = (
            batch_df.select(
                F.col(self.group_col).alias("grp"),
                F.col(self.value_col).alias("v"),
            )
            .filter(F.col("grp").isNotNull() & F.col("v").isNotNull())
            .groupBy("grp", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .localCheckpoint(eager=True)  # feeds score AND the state merge
        )
        prior = self._prior_counts(epoch_id, like=bc).localCheckpoint(
            eager=True
        )
        stats = self._stats_of(prior)
        cut = dlit(MAD_CONSISTENCY * self.k_tenths / 10.0)
        scored = bc.join(F.broadcast(stats), "grp", "left")
        out = scored.select(
            "grp",
            "v",
            F.col("c").alias("n_batch"),
            "med",
            "mad",
            F.when(
                F.col("mad").isNotNull(),
                F.expr(f"abs(v - med) > {cut} * mad"),
            )
            .otherwise(F.lit(False))
            .alias("is_outlier"),
        )
        if not done_out:
            epochdir.commit_epoch(
                out, self.output_path, self.batch_col, epoch_id
            )
        merged = (
            prior.withColumnRenamed("c", "c_prior")
            .join(bc.withColumnRenamed("c", "c_batch"), ["grp", "v"], "full_outer")
            .select(
                "grp",
                "v",
                (
                    F.coalesce("c_prior", F.lit(0))
                    + F.coalesce("c_batch", F.lit(0))
                ).cast("long").alias("c"),
            )
        )
        if not done_state:
            epochdir.commit_epoch(
                merged, self.state_path, self.batch_col, epoch_id
            )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            state_paths=(self.state_path,),
            output_paths=(self.output_path,),
        )

    # -- runner ---------------------------------------------------------------
    def start(self, value_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingRobustOutlier.start() requires checkpoint_dir: "
                "the additive count state is only exactly-once when batch "
                "numbering survives restarts"
            )
        writer = (
            value_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
