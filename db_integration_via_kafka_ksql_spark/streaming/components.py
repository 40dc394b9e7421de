"""Streaming connected components: incremental min-label clustering over
an edge stream.

The graph family's streaming twin (batch: operators/graph.
connected_components, the labeler behind embedding-dedup clusters).
The streaming near-dup stages emit PAIR edges continuously
(streaming/neardup.py, semdedup.py); this stage folds those edges into
a continuously-correct component labeling, so "which cluster is this
doc in" is a state read instead of a full recluster.

Contraction invariant that makes the increment cheap: the per-epoch
snapshot stores each seen node's component label (label = MIN node id
of its component so far). A label row IS an edge to the component
representative, so epoch e recomputes components over
|snapshot rows| + |batch edges| edges — the accumulated raw edge
history is never revisited, and merging two old components through one
new edge relabels both to the global min through their representatives.
Per-epoch output == batch connected_components over EVERY edge arrived
(the prefix contract, asserted in tests).

State & exactly-once: the label snapshot publishes through
`epochdir.commit_epoch` (atomic partition rename; replayed epochs skip
— labels are deterministic given the prior snapshot, the epochdir
contract); each epoch reads the LATEST committed snapshot strictly
before itself. Snapshot size is one row per node ever seen — the
ParquetStateStore footprint class, same as the CDC snapshots.

Feed contract: edges are additions only (near-dup evidence is
append-only — the batch operator has no edge deletion either; deleting
an edge can SPLIT a component, which no min-label scheme can undo
incrementally).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import graph as G
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


@dataclass
class StreamingComponents:
    """Continuous (node, label) component state over an edge stream."""

    spark: SparkSession
    state_path: str               # per-epoch (id, label) snapshot
    src_col: str = "src"
    dst_col: str = "dst"
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_components"
    cc_strategy: str = "auto"
    # scheduled epochdir maintenance (state-epoch pruning / output
    # compaction at the policy's cadence; see streaming/maintenance.py)
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    # -- state ------------------------------------------------------------
    def _latest_epoch(self, before: int | None) -> int | None:
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

    def _snapshot(self, before: int | None) -> DataFrame | None:
        e = self._latest_epoch(before=before)
        if e is None:
            return None
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("id", "label")
        )

    # -- read surface -----------------------------------------------------
    def labels(self) -> DataFrame:
        """The current labeling: (id, label), label = min id of the
        node's component over every edge that ever arrived."""
        snap = self._snapshot(before=None)
        if snap is None:
            return self.spark.createDataFrame([], "id long, label long")
        return snap

    # -- per-batch plan ----------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        if epochdir.epoch_committed(self.state_path, self.batch_col, epoch_id):
            return  # replay of a committed epoch
        if batch_df.isEmpty():
            return  # idle: snapshot unchanged, latest-before read skips gaps
        batch_edges = batch_df.select(
            F.col(self.src_col).cast("bigint").alias("src"),
            F.col(self.dst_col).cast("bigint").alias("dst"),
        )
        prior = self._snapshot(before=epoch_id)
        if prior is not None:
            # a label row IS an edge to the representative: the contracted
            # history replaces the raw accumulated edge list
            edges = batch_edges.unionByName(
                prior.select(
                    F.col("id").alias("src"), F.col("label").alias("dst")
                )
            )
        else:
            edges = batch_edges
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        labels = G.connected_components(
            nodes, edges, strategy=self.cc_strategy
        )
        epochdir.commit_epoch(
            labels.select("id", "label"),
            self.state_path,
            self.batch_col,
            epoch_id,
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            state_paths=(self.state_path,),
        )

    # -- runner ------------------------------------------------------------
    def start(self, edge_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingComponents.start() requires checkpoint_dir: the "
                "epochdir replay guards are only sound when batch numbering "
                "survives restarts"
            )
        writer = (
            edge_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
