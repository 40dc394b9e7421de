"""Streaming key-uniqueness audit: the keyed-state answer to the
constraint StreamingValidation deliberately REFUSES.

`uniqueness` is not additive over micro-batches — a counter cannot know
whether this batch's key was ever seen before — so the streaming gate
(streaming/validation.py) rejects it and points here: one fixed-width
row of state per DISTINCT key ever seen (the chunkdedup witness-set
discipline on keys instead of chunk hashes). Each batch's keys are
classified new vs already-seen at arrival, and the ledger reconciles
exactly with the batch operator:

    sum over epochs of (n_rows_e - n_new_keys_e)
        ==  check_constraints(prefix, [uniqueness(key)]).n_bad
        ==  count(key) - count(DISTINCT key) over everything arrived

(asserted per epoch in tests — the gate's refusal message and this
stage together cover the constraint family completely.)

State & exactly-once: the key set merges idempotently (set semantics,
dropDuplicates keeps the earliest epoch), so replays converge like
StreamingHll/chunkdedup; outputs-then-state epochdir commits, each
epoch reading the latest committed state strictly before itself.

Scale shape: per trigger one map-side-combined groupBy over the batch's
keys plus one left-anti join against the witness partition; NULL keys
are completeness's business (the batch operator's convention) and are
ignored here. State grows with distinct keys — that is the inherent
cost of exact cross-batch uniqueness; bound it with the state store's
TTL discipline or switch to the HLL sketch when approximate suffices.
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

OUT_SCHEMA = "key string, n_in_batch long, known_before boolean"


@dataclass
class StreamingKeyAudit:
    """Exact cross-batch key-uniqueness accounting for a stream."""

    spark: SparkSession
    key_col: str
    output_path: str          # per-epoch (key, n_in_batch, known_before)
    state_path: str           # per-epoch witness set (key, first_epoch)
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_key_audit"
    # scheduled epochdir maintenance (state-epoch pruning / output
    # compaction at the policy's cadence; see streaming/maintenance.py)
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

    def _seen(self, epoch_id: int) -> DataFrame:
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            return self.spark.createDataFrame([], "key string, first_epoch long")
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("key", "first_epoch")
        )

    def ledger(self) -> DataFrame:
        """Per-epoch key accounting (epoch, key, n_in_batch, known_before)."""
        return self.spark.read.parquet(self.output_path)

    def duplicate_rows_total(self) -> int:
        """Exact duplicate-occurrence count over everything arrived:
        sum(n_in_batch) - count of first sightings — equals the batch
        uniqueness constraint's n_bad over the same prefix."""
        led = self.ledger()
        row = led.agg(
            F.coalesce(F.sum("n_in_batch"), F.lit(0)).alias("rows"),
            F.coalesce(
                F.sum(F.when(~F.col("known_before"), 1).otherwise(0)), F.lit(0)
            ).alias("firsts"),
        ).first()
        return int(row["rows"]) - int(row["firsts"])

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
        keys = (
            batch_df.select(
                F.col(self.key_col).cast("string").alias("key")
            )
            .filter(F.col("key").isNotNull())  # NULLs are completeness's job
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_in_batch"))
            .localCheckpoint(eager=True)  # feeds the split AND the merge
        )
        seen = self._seen(epoch_id).localCheckpoint(eager=True)
        out = keys.join(
            seen.select("key", F.lit(True).alias("_known")), "key", "left"
        ).select(
            "key",
            "n_in_batch",
            F.col("_known").isNotNull().alias("known_before"),
        )
        epochdir.commit_epoch(out, self.output_path, self.batch_col, epoch_id)
        fresh = keys.join(seen.select("key"), "key", "left_anti").select(
            "key", F.lit(epoch_id).cast("long").alias("first_epoch")
        )
        epochdir.commit_epoch(
            seen.unionByName(fresh), self.state_path, self.batch_col, epoch_id
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
                "StreamingKeyAudit.start() requires checkpoint_dir: the "
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
