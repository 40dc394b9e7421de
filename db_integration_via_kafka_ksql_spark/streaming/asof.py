"""Streaming as-of join: continuous point-in-time enrichment of a fact
stream against a dimension-update stream (Flink's "temporal table join",
the feature-store online-lookup shape) — each fact row gets the latest
dimension version at or before its event time.

One unified stream carries both sides (a `side` tag column — the
standard union trick for multi-source foreachBatch); per micro-batch,
facts join against every dimension version from batches <= e PLUS this
batch's own updates (arrival defines visibility; a same-batch update
at-or-before the fact's event time IS visible — deterministic and
asserted in tests). The join itself IS the batch operator
(operators/asof.asof_join — one key-partitioned window, no range-join
explosion), so the streaming answer inherits its oracle-gated
semantics.

State: the per-key version history, epochdir-committed after the output
(the transitions crash-interleaving discipline: outputs first, each
epoch reads the latest committed state strictly before itself, so
half-committed replays recompute identical outputs and re-commit the
same state). With `horizon_us=None` history is complete and the prefix
contract is EXACT: epoch-e output == batch as-of of the batch's facts
against ALL dimension updates arrived so far. With a horizon, versions
older than (newest dim time - horizon) compact to one ANCHOR version
per key — state stays bounded by keys x horizon-churn. Facts within
the horizon stay exact; a fact OLDER than the horizon sees only the
anchor and yields the anchor value when its event time is at or after
the anchor's, else NULL — never a version from the fact's FUTURE (the
point-in-time-correctness stance a feature store requires: under
training/serving skew a NULL beats silently leaking a later version).

Reference parity: the reference's stream-table join enriches against
the LATEST state only (ksql-statements.sql's stream-table joins);
at-or-before EVENT-time versioning is the extension a feature pipeline
needs for training/serving skew control.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators.asof import asof_join
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


@dataclass
class StreamingAsof:
    """Continuous as-of enrichment with versioned dimension state."""

    spark: SparkSession
    output_path: str            # per-epoch enriched fact rows
    state_path: str             # per-epoch (key, t, value...) version table
    key_col: str = "key"
    ts_col: str = "t"
    value_cols: tuple[str, ...] = ("value",)
    fact_cols: tuple[str, ...] = ("fact_id",)
    side_col: str = "side"      # 'dim' | 'fact'
    horizon_us: int | None = None
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_asof"
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

    def _version_schema(self) -> str:
        vals = ", ".join(f"{c} long" for c in self.value_cols)
        return f"{self.key_col} long, {self.ts_col} long, {vals}"

    def _prior_versions(self, epoch_id: int) -> DataFrame:
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            return self.spark.createDataFrame([], self._version_schema())
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select(self.key_col, self.ts_col, *self.value_cols)
        )

    def enriched(self) -> DataFrame:
        """Everything joined so far (epoch, fact cols, value_asof...)."""
        return self.spark.read.parquet(self.output_path)

    def _prune(self, versions: DataFrame) -> DataFrame:
        """Compact versions older than the horizon to one anchor per key."""
        if self.horizon_us is None:
            return versions
        from pyspark.sql.window import Window

        wm = versions.agg(
            F.max(self.ts_col).alias("mx")
        ).collect()[0]["mx"]  # bounded scalar: the newest dim time
        if wm is None:
            return versions
        cutoff = wm - self.horizon_us
        recent = versions.filter(F.col(self.ts_col) > cutoff)
        w = Window.partitionBy(self.key_col).orderBy(
            F.col(self.ts_col).desc()
        )
        anchor = (
            versions.filter(F.col(self.ts_col) <= cutoff)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
        return recent.unionByName(anchor)

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
        vals = ", ".join(f"{c}_asof long" for c in self.value_cols)
        facts_schema = ", ".join(
            [f"{c} long" for c in self.fact_cols]
            + [f"{self.key_col} long", f"{self.ts_col} long"]
        )
        out_schema = f"{facts_schema}, {vals}"
        if batch_df.isEmpty():
            if not done_out:
                epochdir.commit_epoch(
                    self.spark.createDataFrame([], out_schema),
                    self.output_path, self.batch_col, epoch_id,
                )
            return  # idle: versions unchanged
        dims_new = batch_df.filter(
            F.col(self.side_col) == "dim"
        ).select(self.key_col, self.ts_col, *self.value_cols)
        facts = batch_df.filter(F.col(self.side_col) == "fact").select(
            *self.fact_cols, self.key_col, self.ts_col
        )
        # visible = committed history + this batch's updates; feeds the
        # join AND the new state — materialize once
        visible = (
            self._prior_versions(epoch_id)
            .unionByName(dims_new)
            .localCheckpoint(eager=True)
        )
        out = asof_join(
            facts,
            visible,
            [self.key_col],
            self.ts_col,
            list(self.value_cols),
        )
        epochdir.commit_epoch(
            out.select(
                *self.fact_cols, self.key_col, self.ts_col,
                *[f"{c}_asof" for c in self.value_cols],
            ),
            self.output_path, self.batch_col, epoch_id,
        )
        epochdir.commit_epoch(
            self._prune(visible), self.state_path, self.batch_col, epoch_id
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            state_paths=(self.state_path,),
            output_paths=(self.output_path,),
        )

    # -- runner ---------------------------------------------------------------
    def start(self, tagged_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingAsof.start() requires checkpoint_dir: the epoch "
                "guard is only sound when batch numbering survives restarts"
            )
        writer = (
            tagged_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
