"""Continuous SCD type-2 dimension history over a CDC changelog stream.

The streaming twin of operators/cdc.scd2_history — the one stateful
family that still lacked an incremental counterpart (r10 VERDICT #8):
the warehouse-side consumer that keeps EVERY version of each key, not
just the latest row the reference's upsert sinks hold
(start-sink-connector.sh:61-81 keeps latest-only; SCD2 is the standard
extension).

Incremental shape — a version row is immutable once CLOSED, so the
output is append-only per epoch and only OPEN versions are state:

- per micro-batch, each key's prior open version (from the snapshot)
  is unioned with the batch's rows and a (key, version)-ordered LEAD
  assigns every interval end, exactly the batch operator's window but
  over |batch keys| rows instead of the whole history;
- versions whose end became known this batch (superseded by an update,
  or closed by a delete's timestamp) are emitted ONCE into the epoch's
  output partition — they never change again;
- the new open versions (each key's last non-delete row; a key whose
  last row is a delete has none) become the epoch's state snapshot.

`history()` = union of all committed closed-version epochs (is_current
false) + the latest open snapshot (valid_to_us NULL, is_current true),
which the contract test pins against `cdc.scd2_history` over the full
arrived prefix after every epoch.

Feed contract (the CDC log order the reference's connector guarantees):
`order_col` is monotone per key across batches — a late event older
than its key's open version would claim an interval already closed
(the streaming-neardup stance: history is immutable, out-of-order
arrival is the feed's bug).

State & exactly-once: closed rows and the open snapshot both publish
through `epochdir.commit_epoch` (outputs FIRST, then state — a crash
between the two replays into an output-commit skip plus a state commit
of the identical recomputed snapshot, the substrdedup discipline).
Each epoch reads the LATEST committed snapshot strictly before itself,
so half-committed replays never observe their own writes.

Scale shape: per trigger, one key-hash shuffle for the LEAD window
over batch + touched-snapshot rows; the snapshot read is one
partition-pruned epoch. Snapshot size is one row per LIVE key — the
ParquetStateStore footprint class. Closed history accumulates as
immutable epoch partitions: no compaction rewrite ever touches an
emitted version (epochdir.compact_epochs applies if epoch-dir count
itself becomes the problem).
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

_DEFAULT_ATTRS = ["event_type", "value", "props"]


@dataclass
class StreamingScd2:
    """Incremental SCD2: append-only closed versions + open-version state."""

    spark: SparkSession
    output_path: str              # per-epoch CLOSED version rows
    state_path: str               # per-epoch open-version snapshot
    key_col: str = "key_id"
    order_col: str = "offset"
    ts_col: str = "us"            # epoch-micros long column in the stream
    attrs: list[str] | None = None
    deleted_col: str = "__deleted"
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_scd2"
    # scheduled epochdir maintenance (state pruning / output
    # compaction / witness TTL per the policy) — None disables
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    def _attrs(self) -> list[str]:
        return self.attrs if self.attrs is not None else list(_DEFAULT_ATTRS)

    # -- state ------------------------------------------------------------
    def _latest_state_epoch(self, before: int | None) -> int | None:
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
            if (before is None or e < before) and (best is None or e > best):
                best = e
        return best

    def _open_snapshot(self, before: int | None) -> DataFrame | None:
        e = self._latest_state_epoch(before=before)
        if e is None:
            return None
        df = self.spark.read.parquet(self.state_path)
        return df.filter(F.col(self.batch_col) == e).select(
            self.key_col, "version", "valid_from_us", *self._attrs()
        )

    # -- read surface -----------------------------------------------------
    def history(self) -> DataFrame:
        """The full SCD2 history so far: closed epochs + open snapshot —
        column-compatible with operators/cdc.scd2_history."""
        cols = [
            self.key_col,
            "version",
            "valid_from_us",
            "valid_to_us",
            "is_current",
            *self._attrs(),
        ]
        closed = None
        if epochdir.list_epochs(self.output_path, self.batch_col):
            closed = (
                self.spark.read.parquet(self.output_path)
                .withColumn("is_current", F.lit(False))
                .select(*cols)
            )
        open_df = self._open_snapshot(before=None)
        if open_df is not None:
            open_df = (
                open_df.withColumn("valid_to_us", F.lit(None).cast("long"))
                .withColumn("is_current", F.lit(True))
                .select(*cols)
            )
        if closed is None and open_df is None:
            return self.spark.createDataFrame([], self._history_schema())
        if closed is None:
            return open_df
        if open_df is None:
            return closed
        return closed.unionByName(open_df)

    def _history_schema(self) -> str:
        attr_part = ", ".join(f"{a} string" for a in self._attrs())
        return (
            f"{self.key_col} long, version long, valid_from_us long, "
            f"valid_to_us long, is_current boolean"
            + (f", {attr_part}" if attr_part else "")
        )

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
        attrs = self._attrs()
        if batch_df.isEmpty():
            # idle: commit NOTHING on either side. A quiet stream fires
            # a trigger every 2 s, so committing an empty output epoch
            # per idle trigger would grow unbounded epoch=N dirs (and
            # degrade partition discovery over days of idleness);
            # replaying an idle epoch is free and deterministic, and
            # both the latest-before state read and the closed-history
            # union already skip gaps in the epoch sequence.
            return
        ev = batch_df.select(
            self.key_col,
            F.col(self.order_col).cast("long").alias("version"),
            F.col(self.ts_col).cast("long").alias("valid_from_us"),
            F.col(self.deleted_col).cast("string").alias("__del"),
            *attrs,
        )
        prior = self._open_snapshot(before=epoch_id)
        if prior is not None:
            prior = prior.withColumn("__del", F.lit("false")).select(
                *ev.columns
            )
            combined = ev.unionByName(prior)
        else:
            combined = ev
        # closed rows AND the new snapshot both derive from combined:
        # materialize once (the per-branch re-plan trap)
        combined = combined.localCheckpoint(eager=True)
        from pyspark.sql.window import Window

        win = Window.partitionBy(self.key_col).orderBy("version")
        led = combined.withColumn(
            "valid_to_us", F.lead("valid_from_us").over(win)
        )
        closed = led.filter(
            F.col("valid_to_us").isNotNull() & (F.col("__del") == "false")
        ).select(
            self.key_col, "version", "valid_from_us", "valid_to_us", *attrs
        )
        epochdir.commit_epoch(
            closed, self.output_path, self.batch_col, epoch_id
        )
        new_open = led.filter(
            F.col("valid_to_us").isNull() & (F.col("__del") == "false")
        ).select(self.key_col, "version", "valid_from_us", *attrs)
        epochdir.commit_epoch(
            new_open, self.state_path, self.batch_col, epoch_id
        )
        # NOTE for compact_outputs: closed-epoch part files are
        # name-immutable BY CONTRACT (downstream file-stream sources);
        # enable output compaction only on datasets no file-tracking
        # source consumes — snapshot pruning is always safe
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            state_paths=(self.state_path,),
            output_paths=(self.output_path,),
        )

    def _closed_schema(self) -> str:
        attr_part = ", ".join(f"{a} string" for a in self._attrs())
        return (
            f"{self.key_col} long, version long, valid_from_us long, "
            f"valid_to_us long" + (f", {attr_part}" if attr_part else "")
        )

    # -- runner ------------------------------------------------------------
    def start(self, changelog_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingScd2.start() requires checkpoint_dir: the epochdir "
                "replay guards are only sound when batch numbering survives "
                "restarts"
            )
        writer = (
            changelog_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
