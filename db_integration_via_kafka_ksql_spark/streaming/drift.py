"""Streaming quality-drift monitor: at-arrival feed-health screening of
a document stream.

The streaming twin of operators/text_analysis.quality_drift_by_source:
each micro-batch's per-source quality-decile histogram is compared —
integer L1 in permille — against the CORPUS distribution accumulated
BEFORE the batch, so a crawler regression in one feed fires the trigger
it lands instead of the nightly batch report. Scoring against pre-batch
state keeps per-epoch output deterministic (the epoch-partition
requirement); the cold start scores 0 (the first batches DEFINE the
distribution, they don't deviate from it — the anomaly screen's
stance).

State: accumulated (source, bucket) counts — additive, NOT idempotent,
so exactly-once rides the outputs-then-state epochdir commits with the
committed-epoch guard (the anomaly/histsketch discipline). Footprint is
|sources| x n_buckets rows forever.

Reference parity: none (the reference monitors nothing); this is the
curation-pipeline monitoring extension, composing with StreamingCurator
— run the drift screen on the same tagged stream and gate a source out
of the mix when its drift crosses policy.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import text_analysis as TA
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


@dataclass
class StreamingQualityDrift:
    """Continuous per-source quality-distribution drift."""

    spark: SparkSession
    output_path: str            # per-epoch (source, n_docs, drift_permille)
    state_path: str             # per-epoch accumulated (source, bucket, cnt)
    n_buckets: int = 10
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_quality_drift"
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

    def _prior_counts(self, epoch_id: int) -> DataFrame:
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            return self.spark.createDataFrame(
                [], "source string, bucket long, cnt long"
            )
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("source", "bucket", "cnt")
        )

    def drift(self) -> DataFrame:
        """Everything scored so far (epoch, source, n_docs, drift)."""
        return self.spark.read.parquet(self.output_path)

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
        out_schema = "source string, n_docs long, drift_permille long"
        if batch_df.isEmpty():
            if not done_out:
                epochdir.commit_epoch(
                    self.spark.createDataFrame([], out_schema),
                    self.output_path, self.batch_col, epoch_id,
                )
            return  # idle: state unchanged
        sb = (
            TA.quality_bucket_counts(batch_df, self.n_buckets)
            .withColumn("cnt", F.col("cnt").cast("long"))
            .localCheckpoint(eager=True)  # feeds scoring AND the merge
        )
        prior = self._prior_counts(epoch_id).localCheckpoint(eager=True)
        ghist = prior.groupBy("bucket").agg(F.sum("cnt").alias("gcnt"))
        gtotal = ghist.agg(F.sum("gcnt").alias("gtotal"))
        totals = sb.groupBy("source").agg(F.sum("cnt").alias("n_docs"))
        # grid over the union of buckets seen in the batch OR the corpus:
        # a batch concentrating mass where the corpus has none (and vice
        # versa) must both count toward the distance
        buckets = (
            ghist.select("bucket")
            .unionByName(sb.select("bucket"))
            .distinct()
        )
        grid = (
            totals.crossJoin(F.broadcast(buckets))
            .crossJoin(F.broadcast(gtotal))
            .join(F.broadcast(ghist), "bucket", "left")
            .join(sb, ["source", "bucket"], "left")
            .select(
                "source",
                "n_docs",
                F.expr(
                    # cold start (no accumulated corpus yet): distance 0 —
                    # the first batches DEFINE the distribution
                    "CASE WHEN gtotal IS NULL OR gtotal = 0 THEN 0"
                    " ELSE abs(coalesce(cnt, 0) * 1000 DIV n_docs"
                    " - coalesce(gcnt, 0) * 1000 DIV gtotal) END"
                ).alias("d"),
            )
        )
        out = grid.groupBy("source").agg(
            F.max("n_docs").cast("long").alias("n_docs"),
            F.sum("d").cast("long").alias("drift_permille"),
        )
        epochdir.commit_epoch(out, self.output_path, self.batch_col, epoch_id)
        merged = (
            prior.withColumnRenamed("cnt", "c0")
            .join(
                sb.withColumnRenamed("cnt", "c1"),
                ["source", "bucket"],
                "full_outer",
            )
            .select(
                "source",
                "bucket",
                (
                    F.coalesce("c0", F.lit(0)) + F.coalesce("c1", F.lit(0))
                ).cast("long").alias("cnt"),
            )
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
    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingQualityDrift.start() requires checkpoint_dir: "
                "additive state is only exactly-once when batch numbering "
                "survives restarts"
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
