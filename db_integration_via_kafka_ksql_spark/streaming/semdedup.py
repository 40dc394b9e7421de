"""Streaming semantic dedup: SemDeDup with a FROZEN k-means codebook and
cross-batch per-cluster witness state — the embedding-space companion of
`StreamingNearDup`'s MinHash pass (same dataset/state/replay contract).

Per micro-batch:

1. scan-side assignment of every incoming vector to its nearest frozen
   centroid (`operators/kmeans.assign_clusters` — literal centroids, no
   join, no shuffle);
2. within-batch near-dup pairs: cluster-equi self-join with the exact
   integer-cosine threshold → connected components → min-vec_id reps;
3. cross-batch filter: any vector whose quantized cosine against ANY
   previously-seen vector IN ITS CLUSTER reaches the threshold is
   dropped (the cluster id is the blocking key, so the probe only
   compares against that cluster's history, never the full state);
4. idempotent append of the survivors (atomic name-stable publish of the
   batch's own `ingest_batch` partition via `streaming/epochdir`);
5. state grows by ALL batch vectors — accepted or dropped — so later
   arrivals resembling an already-dropped vector are still caught
   (witnesses persist, exactly like the MinHash pass).

**Codebook discipline.** The centroids are fit ONCE (typically
`kmeans_fit` over a bootstrap corpus) and then frozen: a drifting
codebook would re-assign history and silently change which pairs are
comparable. Freezing makes assignment deterministic forever; the
documented trade is that genuinely novel regions of embedding space all
land in their nearest old cluster (over-full clusters are visible in the
state's per-cluster counts — refit offline and rebuild state to re-block).

**Replay idempotence** (same mechanism as StreamingNearDup, relied on by
the tests): a replayed epoch finds its partition already committed and
`epochdir.commit_epoch` skips the write — part-file names never change
once visible, so chained downstream stages are exactly-once too. The
witness self-collision property still holds independently (on a replay
AFTER the state update every batch vector — zero-norm included, see
`_cos_cond` — collides with its own witness, so the recomputed accepted
frame is empty anyway). Both interleavings converge.

Scale shape: assignment is a projection (zero shuffle); the within-batch
pair join is cluster-keyed over a micro-batch; the history probe
broadcasts the BATCH against the scan-side state filtered to the batch's
clusters — at any history size the state is never shuffled; state size
is one row per seen vector (q + n2, fixed width).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.functions import vector as V
from db_integration_via_kafka_ksql_spark.operators.graph import dedup_clusters
from db_integration_via_kafka_ksql_spark.operators.kmeans import (
    Centroids,
    assign_clusters,
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)
from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore


@dataclass
class StreamingSemDedup:
    """Continuous semantic dedup into a partitioned dataset."""

    spark: SparkSession
    dataset_path: str
    state_path: str
    centroids: Centroids  # frozen codebook (see module docstring)
    threshold_pct: int = 40
    batch_col: str = "ingest_batch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_semdedup"
    # scheduled maintenance: witness_ttl_epochs drives expire_witnesses
    # at the cadence. output compaction is deliberately NOT wired: the
    # accepted-vectors dataset is tailed by file-stream consumers, for whom
    # compaction's part-file rewrite means re-ingestion (maintenance.py's
    # documented exclusion)
    maintenance: MaintenancePolicy | None = None
    state: ParquetStateStore = field(init=False)

    def __post_init__(self) -> None:
        if not self.centroids:
            raise ValueError("centroids must be a non-empty frozen codebook")
        dims = {len(c) for c in self.centroids}
        if len(dims) != 1:
            # zip_with NULL-pads a shorter side, which would silently turn
            # every distance involving the odd centroid into NULL
            raise ValueError(
                f"codebook centroids have inconsistent dimensions: {sorted(dims)}"
            )
        self.state = ParquetStateStore(
            self.spark,
            self.state_path,
            key_cols=["vec_id"],
            order_cols=["offset"],
        )

    def _assigned(self, vecs: DataFrame) -> DataFrame:
        """(vec_id, q, cluster, n2) under the frozen codebook."""
        quantized = vecs.select("vec_id", V.quantize("embedding").alias("q"))
        return assign_clusters(quantized, self.centroids).select(
            "vec_id", "q", "cluster", V.qnorm2("q").alias("n2")
        )

    def _cos_cond(self, qa, qb, na, nb):
        """qdot(a,b) >= t * |a| * |b|, exact integer dot + IEEE sqrt.

        Zero-norm vectors (all-zero quantized embedding) are degenerate:
        cosine is undefined, and `qdot > 0` alone would make them match
        NOTHING — including themselves. Two zero-norm vectors are
        therefore DEFINED as duplicates of each other: within a batch
        all zero vectors of a cluster collapse to the min-id
        representative, and the witness self-collision invariant the
        tests assert (every vector collides with its own witness, so a
        replay-after-state-update recomputes an EMPTY accepted frame)
        holds for every vector, zero-norm included. Dataset integrity on
        replays no longer depends on that invariant — the epochdir
        committed-partition skip is the primary guard — but the
        invariant keeps the accepted-set semantics consistent: a
        replayed or re-sent zero vector must not be "new" twice. (The
        batch `semdedup_pairs` operator keeps the stricter `qdot > 0`
        rule — it has no cross-batch contract and its DuckDB oracle
        mirrors that filter.)"""
        t = self.threshold_pct / 100
        qdot = V.qdot(qa, qb)
        na_d = F.col(na).cast("double")
        nb_d = F.col(nb).cast("double")
        return ((F.col(na) == 0) & (F.col(nb) == 0)) | (
            (qdot > 0)
            & (qdot.cast("double") >= F.lit(t) * F.sqrt(na_d) * F.sqrt(nb_d))
        )

    def accepted_of_batch(self, vecs: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(accepted vectors, full assignment frame) for one batch."""
        asg = self._assigned(vecs).localCheckpoint()
        par = vecs.sparkSession.sparkContext.defaultParallelism
        # within-batch: cluster-blocked pairs → components → min-id reps
        a = asg.repartition(par).alias("a")
        b = asg.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col("a.vec_id") < F.col("b.vec_id"))
                & self._cos_cond("a.q", "b.q", "a.n2", "b.n2"),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
            .distinct()
        )
        reps = dedup_clusters(
            vecs.select("vec_id"), pairs, "vec_id", "vec_a", "vec_b"
        ).filter("is_rep")
        survivors = vecs.join(reps.select("vec_id"), "vec_id", "left_semi")
        if self.state.exists():
            # history probe: broadcast the BATCH against the scan-side
            # state (same join-side reasoning as StreamingNearDup — the
            # state must never shuffle). The state scan is additionally
            # pre-filtered to the batch's clusters, so only the touched
            # blocks are read. Self-matches are NOT excluded: a replayed
            # batch collides with its own witnesses and produces an empty
            # (partition-untouching) write — the idempotence mechanism.
            clusters = [r.cluster for r in asg.select("cluster").distinct().collect()]
            hist = (
                self.state.read()
                .filter(F.col("cluster").isin(clusters))
                .select(
                    "cluster",
                    F.col("q").alias("hq"),
                    F.col("n2").alias("hn2"),
                )
            )
            hits = (
                hist.join(
                    F.broadcast(asg.select("vec_id", "cluster", "q", "n2")),
                    "cluster",
                )
                .filter(self._cos_cond("hq", "q", "hn2", "n2"))
                .select("vec_id")
                .distinct()
            )
            survivors = survivors.join(hits, "vec_id", "left_anti")
        return survivors, asg

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        accepted, asg = self.accepted_of_batch(batch_df)
        accepted = accepted.localCheckpoint()
        # atomic, name-stable partition publish (streaming/epochdir):
        # replays find the partition committed and skip the write, so
        # downstream file-stream consumers never see an epoch twice
        epochdir.commit_epoch(
            accepted, self.dataset_path, self.batch_col, epoch_id
        )
        # witnesses persist for every incoming vector; replays upsert the
        # same keys — idempotent
        self.state.apply_batch(
            asg.select(
                "vec_id",
                "cluster",
                "q",
                "n2",
                F.lit(epoch_id).cast("bigint").alias("offset"),
                F.lit("false").alias("__deleted"),
            )
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            expire=self.expire_witnesses,
        )

    def expire_witnesses(self, min_epoch: int) -> int:
        """Drop witness vectors last seen before `min_epoch` (bounded
        state at the documented re-admission trade — see
        StreamingNearDup.expire_witnesses)."""
        return self.state.prune_below(min_epoch)

    def read_corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.dataset_path)

    def start(self, vec_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            # see StreamingCurator.start: without a durable checkpoint a
            # restarted query renumbers epochs from 0 and the epoch-
            # committed-partition guard silently drops the new batches
            # while the witness state advances. Refuse.
            raise ValueError(
                "StreamingSemDedup.start() requires checkpoint_dir: the "
                "epoch-committed-partition replay guard is only sound when "
                "Spark's batch numbering survives restarts"
            )
        writer = (
            vec_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        return writer.start()
