"""Online k-means over an embedding stream.

The batch fitter (operators/kmeans.kmeans_fit) runs synchronized Lloyd
iterations over a static corpus; this module is the sequential
mini-batch variant (the Bottou-Bengio shape with count-weighted
updates): each micro-batch is assigned to the CURRENT centroids, the
per-cluster integer (sum, count) accumulators absorb the batch, and
every centroid moves to the cumulative mean of all points ever assigned
to it. Assignments are made with the centroid at arrival time and are
immutable history — the same stance as the other streaming twins
(neardup/substrdedup): later drift re-clusters later points, never the
past.

Determinism & exactly-once (the trainer-module discipline applied to
CENTROID state): every per-batch quantity is an integer sum (assignment
is the kmeans integer argmin with literal centroids; updates are
per-dimension bigint sums), so any partitioning of a batch produces the
same accumulators. Cluster state lives in one small json (sums, counts,
centroids, last applied epoch) published by atomic rename; per-epoch
assignments publish through `epochdir.commit_epoch` BEFORE the state
update, so both crash interleavings converge on replay: a replay with
stale state recomputes identical assignments (deterministic given
pre-batch centroids) and skips the committed partition; a replay with
advanced state returns early because the assignments partition is
already present.

Scale shape: per trigger, one scan of the batch (scan-side
literal-centroid assignment — zero joins, the kmeans discipline), one
k-row map-side-combined aggregate, and a k x dims driver update.
Driver state is k x (dims + 1) integers; nothing corpus-sized.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import kmeans as KM
from db_integration_via_kafka_ksql_spark.streaming import epochdir


@dataclass
class StreamingKMeans:
    """Continuous k-means with durable integer cluster state."""

    spark: SparkSession
    state_path: str                    # directory holding clusters.json
    initial_centroids: list[list[int]]  # quantized ints (e.g. a batch fit)
    assignments_path: str | None = None  # epoch-partitioned (vec_id, cluster)
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_kmeans"
    batches_seen: list[int] = field(default_factory=list)

    # -- durable state ----------------------------------------------------
    def _state_file(self) -> str:
        return os.path.join(self.state_path, "clusters.json")

    def _read_state(self) -> dict:
        try:
            with open(self._state_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            k = len(self.initial_centroids)
            dims = len(self.initial_centroids[0])
            return {
                "epoch": -1,
                "sums": [[0] * dims for _ in range(k)],
                "counts": [0] * k,
                "centroids": [list(c) for c in self.initial_centroids],
            }

    def _write_state(self, state: dict) -> None:
        os.makedirs(self.state_path, exist_ok=True)
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_file())  # atomic publish

    def centroids(self) -> list[list[int]]:
        """The current centroids (cumulative integer means)."""
        return [list(c) for c in self._read_state()["centroids"]]

    def assignments(self) -> DataFrame:
        """Everything assigned so far: (epoch, vec_id, cluster)."""
        return self.spark.read.parquet(self.assignments_path)

    # -- per-batch update -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        state = self._read_state()
        if epoch_id <= state["epoch"]:
            return  # replay after a completed epoch: assignments committed
        if batch_df.isEmpty():
            state["epoch"] = epoch_id
            self._write_state(state)
            return
        centroids = state["centroids"]
        dims = len(centroids[0])
        q = KM._quantized(batch_df).localCheckpoint(eager=True)
        sz = q.agg(
            F.min(F.size("q")).alias("lo"), F.max(F.size("q")).alias("hi")
        ).first()
        if sz.lo != dims or sz.hi != dims:
            raise ValueError(
                f"StreamingKMeans: centroids have {dims} dims but batch "
                f"vectors have {sz.lo}..{sz.hi}"
            )
        asg = KM.assign_clusters(q, centroids).localCheckpoint(eager=True)
        if self.assignments_path is not None:
            epochdir.commit_epoch(
                asg.select("vec_id", "cluster"),
                self.assignments_path,
                self.batch_col,
                epoch_id,
            )
        sums = [
            F.sum(F.element_at("q", i + 1)).cast("bigint").alias(f"s{i}")
            for i in range(dims)
        ]
        stats = (
            asg.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"), *sums)
            .collect()
        )
        for r in stats:
            c = r["cluster"]
            state["counts"][c] += int(r["n"])
            for i in range(dims):
                state["sums"][c][i] += int(r[f"s{i}"])
            # cumulative integer mean; a cluster nothing was ever assigned
            # to keeps its initial centroid (counts stays 0 elsewhere)
            state["centroids"][c] = [
                state["sums"][c][i] // state["counts"][c] for i in range(dims)
            ]
        state["epoch"] = epoch_id
        self._write_state(state)

    # -- runner -----------------------------------------------------------
    def start(self, embedding_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            # same stance as every epochdir stage: the replay guards are
            # only sound when batch numbering survives restarts
            raise ValueError(
                "StreamingKMeans.start() requires checkpoint_dir: the "
                "epoch-cursor and committed-partition replay guards are "
                "only sound when batch numbering survives restarts"
            )
        writer = (
            embedding_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        return writer.start()
