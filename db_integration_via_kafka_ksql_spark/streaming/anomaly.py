"""Continuous traffic-anomaly screen over an event stream.

The streaming twin of operators/relational.events_hourly_anomalies: the
batch op z-scores every hour against its type's full hourly history;
this stage scores each micro-batch's (event_type, hour_bucket) counts
AT ARRIVAL against the distribution accumulated BEFORE the batch — the
alerting shape (a spike is flagged the trigger it lands, not in the
nightly batch). Per-epoch output is therefore deterministic given
pre-batch state, the epoch-partition discipline's requirement.

Semantics per batch: for every (type, hour) with batch arrivals,
n_total = prior count + batch count, and zscore = (n_total - mean) /
stddev over that type's PRIOR hourly counts (exact integer moments
n_hours / s / ss, the batch op's fixed-order double recipe — builtin
stddev_samp would be partition-order-dependent). Types with <2 prior
hours or zero variance score 0.0 — the cold-start stance: the first
sightings of a type establish the distribution, they don't deviate
from it.

State & exactly-once: the per-(type, hour) count table and the scored
output both publish through `epochdir.commit_epoch`, outputs first
(the substrdedup/transitions crash-interleaving contract: a crash
between the two commits replays into an output skip + a state commit
of the identical recomputed merge; each epoch reads the latest
committed state strictly BEFORE itself, so half-committed replays
never see their own writes). Counts are additive — NOT idempotent —
which is exactly why the committed-epoch guard, not blind remerge,
gates the state write.

Scale shape: state is one row per (type, hour) — wall-clock bounded,
and `retention_hours` prunes it to a sliding window when the stream is
unbounded; per trigger one map-side-combined groupBy over the batch,
a broadcast-sized join against the type stats (|types| rows), and the
state merge over the pruned count table. No raw-event state anywhere.

Reference parity: the reference's continuous aggregates stop at exact
COUNT tables (deploy-ksql-cli.sh); the screen is the extension layer
a monitoring pass adds on top of them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators.analytics import (
    floor_div_sql,
    HOUR_US,  # shared with hourly_gapfill: the hourly_series prefix
    # contract depends on both sides bucketing with the SAME constant
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


@dataclass
class StreamingAnomaly:
    """Continuous per-type hourly-count z-score screen."""

    spark: SparkSession
    output_path: str          # per-epoch scored (type, hour) rows
    state_path: str           # per-epoch (type, hour, n) count table
    ts_col: str = "us"        # epoch-micros long column in the stream
    type_col: str = "event_type"
    z_threshold: float = 2.0
    retention_hours: int | None = None
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_anomaly"
    # scheduled epochdir maintenance (state pruning / output
    # compaction / witness TTL per the policy) — None disables
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    # -- state ------------------------------------------------------------
    def _latest_state_epoch(self, before: int | None) -> int | None:
        """Latest committed state epoch strictly before `before`
        (None = no bound: the latest overall, for the derived views)."""
        best = None
        for e in epochdir.list_epochs(self.state_path, self.batch_col):
            if (before is None or e < before) and (best is None or e > best):
                best = e
        return best

    def _prior_counts(self, epoch_id: int | None) -> DataFrame:
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            return self.spark.createDataFrame(
                [], "event_type string, hour_bucket long, n long"
            )
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("event_type", "hour_bucket", "n")
        )

    def hourly_series(self, trailing_hours: int = 3) -> DataFrame:
        """Dense zero-filled hourly series + trailing moving window over
        the accumulated (type, hour) count state — the streaming
        gap-fill, served through the batch operator's own serve half
        (analytics.gapfill_from_counts), so with ``retention_hours``
        None it is BIT-EQUAL to analytics.hourly_gapfill over the
        arrived prefix (the prefix contract); with retention set it is
        the sliding-window series over the retained horizon."""
        from db_integration_via_kafka_ksql_spark.operators.analytics import (
            gapfill_from_counts,
        )

        counts = self._prior_counts(None).select(
            "event_type",
            F.col("hour_bucket").alias("hour"),
            F.col("n").alias("n_events"),
        )
        return gapfill_from_counts(counts, trailing_hours=trailing_hours)

    def discords(
        self,
        window_hours: int = 6,
        recent_windows: int = 24,
        top_k: int = 3,
    ) -> DataFrame:
        """Matrix-profile discord screen over the accumulated state —
        the shape-anomaly view (nearest-neighbor window distance)
        complementing the per-trigger z-score level screen, served
        through the batch operator (analytics.series_discords) over
        hourly_series()'s dense grid: with ``retention_hours`` None it
        is BIT-EQUAL to the batch chain over the arrived prefix."""
        from db_integration_via_kafka_ksql_spark.operators.analytics import (
            series_discords,
        )

        series = self.hourly_series().select(
            "event_type", "hour", "n_events"
        )
        return series_discords(
            series,
            window_hours=window_hours,
            recent_windows=recent_windows,
            top_k=top_k,
        )

    def similar_past_windows(
        self, window_hours: int = 6, top_k: int = 3
    ) -> DataFrame:
        """Time-series similarity view over the accumulated state — for
        each type's most recent window, the top-k most similar earlier
        non-overlapping windows (analytics.series_similarity_topk over
        hourly_series()'s dense grid): "which past period looked like
        right now", answered from the live stream's own count table.
        With ``retention_hours`` None it is BIT-EQUAL to the batch
        gap-fill -> similarity chain over the arrived prefix."""
        from db_integration_via_kafka_ksql_spark.operators.analytics import (
            series_similarity_topk,
        )

        series = self.hourly_series().select(
            "event_type", "hour", "n_events"
        )
        return series_similarity_topk(
            series, window_hours=window_hours, top_k=top_k
        )

    def anomalies(self) -> DataFrame:
        """Everything scored so far (epoch, type, hour, counts, z).
        Idle-only streams have no output dir (idle epochs commit
        nothing) — return an empty scored-shaped frame (the
        chunkdedup.ledger guard)."""
        if not epochdir.list_epochs(self.output_path, self.batch_col):
            return self.spark.createDataFrame(
                [],
                "event_type string, hour_bucket long, n_batch long, "
                "n_total long, zscore double, is_anomaly boolean, "
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
            # idle: commit NOTHING on either side (the repo-wide r13
            # sweep discipline this stage had missed — a quiet stream
            # was still growing one empty output dir per 2 s trigger);
            # replaying an idle epoch is free, the latest-before state
            # read skips gaps, and anomalies() is guarded below
            return
        hc = (
            batch_df.select(
                F.col(self.type_col).alias("event_type"),
                F.expr(
                    floor_div_sql(
                        f"CAST({self.ts_col} AS BIGINT)", HOUR_US, "spark"
                    )
                ).alias("hour_bucket"),
            )
            .groupBy("event_type", "hour_bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_batch"))
            .localCheckpoint(eager=True)  # feeds score AND the state merge
        )
        prior = self._prior_counts(epoch_id).localCheckpoint(eager=True)
        stats = prior.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("n").alias("s"),
            F.sum(F.col("n") * F.col("n")).alias("ss"),
        )
        scored = (
            hc.join(
                prior.withColumnRenamed("n", "n_prior"),
                ["event_type", "hour_bucket"],
                "left",
            )
            .withColumn(
                "n_total",
                (F.coalesce("n_prior", F.lit(0)) + F.col("n_batch")).cast("long"),
            )
            .join(F.broadcast(stats), "event_type", "left")
        )
        n_d = F.col("n_hours").cast("double")
        s_d = F.col("s").cast("double")
        ss_d = F.col("ss").cast("double")
        c_d = F.col("n_total").cast("double")
        mean = s_d / n_d
        var = (ss_d - s_d * s_d / n_d) / (F.col("n_hours") - F.lit(1)).cast(
            "double"
        )
        z = F.when(
            F.col("n_hours").isNotNull()
            & (F.col("n_hours") > 1)
            & (var > 0),
            (c_d - mean) / F.sqrt(var),
        ).otherwise(F.lit(0.0))
        out = scored.select(
            "event_type",
            "hour_bucket",
            "n_batch",
            "n_total",
            z.alias("zscore"),
            (F.abs(z) >= F.lit(float(self.z_threshold))).alias("is_anomaly"),
        )
        epochdir.commit_epoch(out, self.output_path, self.batch_col, epoch_id)
        merged = (
            prior.withColumnRenamed("n", "n_prior")
            .join(hc, ["event_type", "hour_bucket"], "full_outer")
            .select(
                "event_type",
                "hour_bucket",
                (
                    F.coalesce("n_prior", F.lit(0))
                    + F.coalesce("n_batch", F.lit(0))
                ).cast("long").alias("n"),
            )
        )
        if self.retention_hours is not None:
            horizon = (
                merged.agg(F.max("hour_bucket").alias("mx"))
                .collect()[0]["mx"]  # bounded: one scalar
            )
            merged = merged.filter(
                F.col("hour_bucket") > horizon - self.retention_hours
            )
        epochdir.commit_epoch(
            merged, self.state_path, self.batch_col, epoch_id
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            state_paths=(self.state_path,),
            output_paths=(self.output_path,),
        )

    # -- runner ---------------------------------------------------------------
    def start(self, event_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingAnomaly.start() requires checkpoint_dir: the "
                "epoch guard is only sound when batch numbering survives "
                "restarts"
            )
        writer = (
            event_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
