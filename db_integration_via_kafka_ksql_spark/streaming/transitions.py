"""Continuous Markov transition counts over a per-user event stream.

The streaming twin of operators/analytics.event_transition_matrix, and
the repo's demonstration of CROSS-BATCH SEQUENCE STITCHING: a
transition can span a micro-batch boundary (last event of batch e-1 ->
first event of batch e for the same user), so per-batch LAG alone
undercounts. The stage keeps a per-user last-event snapshot and seeds
each batch's window with it: the snapshot rows participate in the LAG
ordering but only pairs whose LATER element is a batch row emit —
exactly the transitions the batch operator would produce over the
prefix.

Contract (asserted per epoch in tests): with each user's events
arriving in time order across batches (within-batch order is free —
the window sorts), the union of per-epoch outputs over epochs 0..e
equals the batch transition pairs over everything that arrived. A
late event older than its user's snapshot violates the stitch (the
streaming-neardup stance: history is immutable; out-of-order arrivals
are the feed's contract, not silently reordered).

State & exactly-once: per-epoch transition counts AND the per-user
last-event snapshot both publish through `epochdir.commit_epoch`
(outputs first, then state — a crash between the two replays into an
output-commit skip plus a state commit of the identical recomputed
snapshot, the substrdedup discipline). Each epoch reads the LATEST
committed snapshot strictly before itself, so half-committed replays
never see their own writes.

Scale shape: per trigger, one user-keyed window over batch + snapshot
rows (the snapshot join side is partition-pruned to one epoch), one
map-side-combined |types|^2 aggregate, and a struct-max per-user
aggregate for the new snapshot. Snapshot size is one row per user ever
seen — the same footprint class as ParquetStateStore keys.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


@dataclass
class StreamingTransitions:
    """Continuous (from_type, to_type) counts with boundary stitching."""

    spark: SparkSession
    output_path: str              # per-epoch (from_type, to_type, n)
    state_path: str               # per-epoch per-user last-event snapshot
    ts_col: str = "us"            # epoch-micros long column in the stream
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_transitions"
    # scheduled epochdir maintenance (state pruning / output
    # compaction / witness TTL per the policy) — None disables
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

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

    def _prior_snapshot(self, epoch_id: int) -> DataFrame | None:
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            return None
        df = self.spark.read.parquet(self.state_path)
        return df.filter(F.col(self.batch_col) == e).select(
            "user_id", "event_id", "event_type", "t"
        )

    def transitions(self) -> DataFrame:
        """Everything counted so far: (epoch, from_type, to_type, n)."""
        return self.spark.read.parquet(self.output_path)

    def matrix(self) -> DataFrame:
        """Epochs rolled up to the cumulative (from_type, to_type, n)."""
        return (
            self.transitions()
            .groupBy("from_type", "to_type")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    # -- per-batch plan ------------------------------------------------------
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
                empty = self.spark.createDataFrame(
                    [], "from_type string, to_type string, n long"
                )
                epochdir.commit_epoch(
                    empty, self.output_path, self.batch_col, epoch_id
                )
            return  # idle: snapshot unchanged, latest-before read skips gaps
        ev = batch_df.select(
            "user_id",
            "event_id",
            "event_type",
            F.col(self.ts_col).cast("long").alias("t"),
        ).withColumn("_state", F.lit(False))
        prior = self._prior_snapshot(epoch_id)
        combined = ev if prior is None else ev.unionByName(
            prior.withColumn("_state", F.lit(True))
        )
        # counts AND the new snapshot both derive from combined:
        # materialize once (the per-branch re-plan trap)
        combined = combined.localCheckpoint(eager=True)
        from pyspark.sql.window import Window

        win = Window.partitionBy("user_id").orderBy("t", "event_id")
        lagged = (
            combined.withColumn("from_type", F.lag("event_type").over(win))
            # a pair emits only when its LATER element arrived in THIS
            # batch; the snapshot row only seeds the first batch pair
            .filter(F.col("from_type").isNotNull() & ~F.col("_state"))
            .groupBy("from_type", F.col("event_type").alias("to_type"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        epochdir.commit_epoch(
            lagged, self.output_path, self.batch_col, epoch_id
        )
        new_last = (
            combined.groupBy("user_id")
            .agg(F.max(F.struct("t", "event_id", "event_type")).alias("m"))
            .select(
                "user_id",
                F.col("m.event_id").alias("event_id"),
                F.col("m.event_type").alias("event_type"),
                F.col("m.t").alias("t"),
            )
        )
        epochdir.commit_epoch(
            new_last, self.state_path, self.batch_col, epoch_id
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            state_paths=(self.state_path,),
            output_paths=(self.output_path,),
        )

    # -- runner ----------------------------------------------------------------
    def start(self, event_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingTransitions.start() requires checkpoint_dir: the "
                "epochdir replay guards are only sound when batch numbering "
                "survives restarts"
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
