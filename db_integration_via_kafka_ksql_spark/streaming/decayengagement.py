"""Continuously maintained recency-decayed engagement scores.

The streaming twin of operators/analytics.decay_engagement: the batch op
scores every user's events against the corpus max day; this stage
accumulates a per-(user, day) event-count table across micro-batches and
derives the IDENTICAL score from it on demand — ``scores()`` after epoch
e is bit-equal to the batch operator over the arrived prefix (the
prefix contract every stateful twin in this package carries). The
as-of horizon is the max day IN STATE, exactly the batch op's corpus
max day over the same prefix.

Why counts-by-day is the right state: the decay weight depends only on
(horizon - day) DIV half_life, and the horizon moves with every arrival
— so per-user SCORES are not additive (yesterday's 1,000,000-ppm event
is worth 500,000 after a half-life passes), but per-(user, day) COUNTS
are, and the score is a pure scan-side expression over them. State is
user x active-day-sized (never event-sized), and days beyond
62 half-lives contribute exactly 0 ppm by the shift cap.

Per-epoch output: the batch's per-user arrival ticks (user_id, n_batch,
last_day_batch) — the activity feed a downstream mixture/sampling pass
tails, while ``scores()`` is the point-in-time gauge.

State & exactly-once: outputs-then-state epochdir commits; counts are
additive — NOT idempotent — so the committed-epoch guard (not blind
remerge) gates the state write, and both crash interleavings converge
on replay (the anomaly/robust-outlier contract). Idle epochs commit
NOTHING; ``ticks()`` is guarded accordingly.

Reference parity: none (the reference's aggregates are exact COUNT
tables, deploy-ksql-cli.sh) — LLM-pipeline extension, same stance as
StreamingAnomaly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators.analytics import (
    DAY_US,
    floor_div_sql,
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


@dataclass
class StreamingDecayEngagement:
    """Continuous per-user recency-decayed engagement gauge."""

    spark: SparkSession
    output_path: str          # per-epoch per-user arrival ticks
    state_path: str           # per-epoch (u, day, c) count table
    user_col: str = "user_id"
    ts_us_col: str = "us"     # epoch-micros LONG column on the stream
    half_life_days: int = 7
    # Spark SQL type name for the cold-start empty guards (an idle-only
    # stream has no data to derive the user id type from)
    user_type: str = "bigint"
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_decay_engagement"
    # scheduled epochdir maintenance (state-epoch pruning / output
    # compaction per the policy) — None disables
    maintenance: MaintenancePolicy | None = None
    # LOSSLESS day-archive fold: days older than this many half-lives
    # are merged into one row per user (sum counts, keep max day) during
    # the state merge. 10^6 DIV 2^20 == 0, so any age >= 20 half-lives
    # weighs exactly 0 ppm — and the horizon only moves forward — so the
    # fold changes NO output bit (n_events sums, last_seen_day is the
    # fold-max, score contribution was and stays 0) while state shrinks
    # from (user x all active days) to (user x ~20*half_life days + 1).
    # None disables; values < 20 are refused (they would fold live ppm).
    archive_after_half_lives: int | None = None
    batches_seen: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.half_life_days < 1:
            raise ValueError(
                f"half_life_days must be >= 1, got {self.half_life_days}"
            )
        if (
            self.archive_after_half_lives is not None
            and self.archive_after_half_lives < 20
        ):
            raise ValueError(
                "archive_after_half_lives must be >= 20 (ages below 20 "
                "half-lives still carry nonzero ppm — folding them would "
                f"change scores), got {self.archive_after_half_lives}"
            )

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
        """Latest committed (u, day, c) table strictly before `epoch_id`;
        cold start is typed from `like` (the batch's own count frame) or
        the configured user type."""
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            if like is not None:
                return self.spark.createDataFrame([], like.schema)
            return self.spark.createDataFrame(
                [], f"u {self.user_type}, day long, c long"
            )
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("u", "day", "c")
        )

    def _scores_of(self, counts: DataFrame) -> DataFrame:
        """(user_id, n_events, last_seen_day, score_ppm) — the batch
        operator's exact math over a pre-aggregated count table: the
        horizon is the max day in state (== the prefix's corpus max day)
        on a single-row broadcast, the weight is the same capped-shift
        BIGINT expression, multiplied by the day's count."""
        from db_integration_via_kafka_ksql_spark.operators.analytics import (
            decay_weight_ppm_sql,
        )

        horizon = counts.groupBy().agg(F.max("day").alias("asof_day"))
        weighted = (
            f"c * ({decay_weight_ppm_sql(self.half_life_days, 'spark')})"
        )
        return (
            counts.crossJoin(F.broadcast(horizon))
            .select("u", "day", "c", F.expr(weighted).alias("w"))
            .groupBy("u")
            .agg(
                F.sum("c").cast("long").alias("n_events"),
                F.max("day").cast("long").alias("last_seen_day"),
                F.sum("w").cast("long").alias("score_ppm"),
            )
            .select(
                F.col("u").alias("user_id"),
                "n_events",
                "last_seen_day",
                "score_ppm",
            )
        )

    # -- views ------------------------------------------------------------
    def scores(self) -> DataFrame:
        """(user_id, n_events, last_seen_day, score_ppm) over everything
        committed so far — bit-equal to analytics.decay_engagement over
        the arrived prefix (the prefix contract)."""
        return self._scores_of(self._prior_counts(None))

    def ticks(self) -> DataFrame:
        """Per-epoch per-user arrival feed (user_id, n_batch,
        last_day_batch, epoch). Idle-only streams have no output dir —
        return an empty tick-shaped frame."""
        if not epochdir.list_epochs(self.output_path, self.batch_col):
            return self.spark.createDataFrame(
                [],
                f"user_id {self.user_type}, n_batch long, "
                f"last_day_batch long, {self.batch_col} int",
            )
        return self.spark.read.parquet(self.output_path)

    def _fold_ancient_days(self, counts: DataFrame) -> DataFrame:
        """Merge days older than ``archive_after_half_lives`` into one
        (u, max folded day, summed c) row per user — lossless for every
        output (see the field comment), deterministic (so crash replays
        recompute the identical state commit), and run inside the merge
        so each state epoch is already compacted. The horizon rides a
        single-row broadcast; the fold itself touches state-sized rows
        only."""
        horizon = counts.groupBy().agg(F.max("day").alias("asof_day"))
        cut = counts.crossJoin(F.broadcast(horizon)).select(
            "u",
            "day",
            "c",
            (
                F.col("day")
                <= F.col("asof_day")
                - self.archive_after_half_lives * self.half_life_days
            ).alias("_ancient"),
        ).localCheckpoint(eager=True)  # feeds both branches of the split
        young = cut.filter(~F.col("_ancient")).select("u", "day", "c")
        folded = (
            cut.filter(F.col("_ancient"))
            .groupBy("u")
            .agg(
                F.max("day").cast("long").alias("day"),
                F.sum("c").cast("long").alias("c"),
            )
            .select("u", "day", "c")
        )
        return young.unionByName(folded)

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
            return  # idle: commit nothing
        bc = (
            batch_df.select(
                F.col(self.user_col).alias("u"),
                F.expr(
                    floor_div_sql(self.ts_us_col, DAY_US, "spark")
                ).alias("day"),
            )
            .filter(F.col("u").isNotNull() & F.col("day").isNotNull())
            .groupBy("u", "day")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .localCheckpoint(eager=True)  # feeds ticks AND the state merge
        )
        out = bc.groupBy("u").agg(
            F.sum("c").cast("long").alias("n_batch"),
            F.max("day").cast("long").alias("last_day_batch"),
        ).select(
            F.col("u").alias("user_id"), "n_batch", "last_day_batch"
        )
        if not done_out:
            epochdir.commit_epoch(
                out, self.output_path, self.batch_col, epoch_id
            )
        prior = self._prior_counts(epoch_id, like=bc)
        merged = (
            prior.withColumnRenamed("c", "c_prior")
            .join(
                bc.withColumnRenamed("c", "c_batch"), ["u", "day"],
                "full_outer",
            )
            .select(
                "u",
                "day",
                (
                    F.coalesce("c_prior", F.lit(0))
                    + F.coalesce("c_batch", F.lit(0))
                ).cast("long").alias("c"),
            )
        )
        if self.archive_after_half_lives is not None:
            merged = self._fold_ancient_days(merged)
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
    def start(self, event_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingDecayEngagement.start() requires checkpoint_dir: "
                "the additive count state is only exactly-once when batch "
                "numbering survives restarts"
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
