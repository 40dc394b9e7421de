"""Streaming vector-index upserts: keep a served IVF-PQ index FRESH as
new embeddings arrive, without rebuilding it.

The freshness leg of the ANN family's fit/serve split
(operators/similarity.py): `ivf_pq_fit` is the expensive offline job,
`IvfPqIndex.save/load` the operational artifact — and this stream is
how tonight's documents become searchable before the next refit. Each
micro-batch is encoded against the FROZEN fit artifacts
(`IvfPqIndex.encode`: scan-side quantize, argmin over broadcast
centroids, PQ projection over literal codewords — zero corpus
shuffles) and appended as one epoch partition per serving frame
(q rows + inverted-list rows) via `epochdir`.

Prefix contract (tested, exact): because `encode` runs the IDENTICAL
integer exprs the fit used, a vector added at epoch e encodes
bit-for-bit as it would have at fit time — so `serve_vectors()` after
epoch e equals the batch serve against an index whose q/lists hold
base + every vector ever added, same codebook. Late arrivals lean on
the codebook staying representative; `distortion()` exposes the drift
measure and a scheduled refit (new `ivf_pq_fit` + swap) is the repair,
exactly the rescale_buckets maintenance stance.

Crash/replay: the two epoch datasets (q, lists) derive
deterministically from the batch, and each `epochdir.commit_epoch` is
individually replay-skipped — a crash between the two commits leaves
one partition committed; the structured-streaming replay of the epoch
re-commits only the missing one and serving state converges (tested).

Feed contract: vec_ids are unique across base + stream (append-only
corpus, the StreamingComponents stance); deletes/updates are a refit
concern, not an append concern.

Reference parity: none (vector serving is a training/retrieval
extension; the reference moves payloads opaquely) — same stance as the
batch ANN operators this twins.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import similarity as S
from db_integration_via_kafka_ksql_spark.streaming import epochdir


@dataclass
class StreamingVectorIndex:
    """Continuous IVF-PQ upserts over a saved (frozen) index."""

    spark: SparkSession
    index_path: str           # a saved IvfPqIndex (IvfPqIndex.save)
    adds_path: str            # epoch-partitioned additions (q/ + lists/)
    batch_col: str = "ingest_batch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_vector_index"
    batches_seen: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        self._base = S.IvfPqIndex.load(self.spark, self.index_path)

    def _q_path(self) -> str:
        return os.path.join(self.adds_path, "q")

    def _lists_path(self) -> str:
        return os.path.join(self.adds_path, "lists")

    # -- serving view --------------------------------------------------------
    def _merged(self) -> "S.IvfPqIndex":
        """The serving index: base frames + every committed addition.
        Base and added rows are interchangeable by the encode identity,
        so the union IS the index a batch build over base+adds would
        produce (same codebook).

        The base layout's pruning columns SURVIVE the merge: epoch adds
        are committed subpartitioned by `list_id` (lists) and `q_bucket`
        (q, same pmod as IvfPqIndex.save), so serve's probed-list /
        shortlist isin filters push through the union into BOTH scans as
        PartitionFilters — a merged index keeps the nprobe/nlists cost
        contract instead of degrading to a corpus scan as adds grow."""
        q, lists = self._base.q, self._base.lists
        q_cols = ["vec_id", "label", "q"]
        if self._base.n_q_buckets and "q_bucket" in q.columns:
            q_cols.append("q_bucket")
        if epochdir.list_epochs(self._q_path(), self.batch_col):
            adds_q = self.spark.read.parquet(self._q_path()).select(*q_cols)
            q = q.select(*q_cols).unionByName(adds_q)
        if epochdir.list_epochs(self._lists_path(), self.batch_col):
            adds_l = self.spark.read.parquet(self._lists_path()).select(
                "neighbor_id", "list_id", "codes"
            )
            lists = lists.select(
                "neighbor_id", "list_id", "codes"
            ).unionByName(adds_l)
        return S.IvfPqIndex(
            q=q,
            cent=self._base.cent,
            corpus_res=None,
            codebook=self._base.codebook,
            lists=lists,
            dims=self._base.dims,
            m=self._base.m,
            n_q_buckets=self._base.n_q_buckets,
        )

    def serve_vectors(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
        refine: int | None = 4,
    ) -> DataFrame:
        """Serve arbitrary query vectors against base + all committed
        additions — the exact batch serve path over the merged view."""
        return S.ivf_pq_serve_vectors(
            self._merged(), queries, k=k, nprobe=nprobe, refine=refine
        )

    def distortion(self) -> DataFrame:
        """Reconstruction-error report over the merged index — the
        drift gauge that schedules the next refit."""
        return S.ivf_pq_distortion(self._merged())

    # -- per-batch plan --------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Encode the batch against the frozen artifacts and commit one
        epoch partition per serving frame. Each commit is individually
        replay-skipped, so a crash between the two converges on replay."""
        self.batches_seen.append(epoch_id)
        done_q = epochdir.epoch_committed(
            self._q_path(), self.batch_col, epoch_id
        )
        done_l = epochdir.epoch_committed(
            self._lists_path(), self.batch_col, epoch_id
        )
        if done_q and done_l:
            return  # fully committed replay
        if batch_df.isEmpty():
            return  # idle: commit nothing (the SCD2 idle discipline)
        q_rows, list_rows = self._base.encode(batch_df)
        q_parts: tuple[str, ...] = ()
        if self._base.n_q_buckets:
            # carry the saved layout's q_bucket subpartitioning into the
            # adds (same pmod as IvfPqIndex.save) so the merged serve's
            # bucket filters prune epoch partitions too
            from pyspark.sql import functions as F

            q_rows = q_rows.withColumn(
                "q_bucket",
                F.pmod(F.col("vec_id"), F.lit(int(self._base.n_q_buckets))),
            )
            q_parts = ("q_bucket",)
        q_rows = q_rows.localCheckpoint(eager=True)
        list_rows = list_rows.localCheckpoint(eager=True)
        if not done_q:
            epochdir.commit_epoch(
                q_rows, self._q_path(), self.batch_col, epoch_id,
                partition_cols=q_parts,
            )
        if not done_l:
            epochdir.commit_epoch(
                list_rows, self._lists_path(), self.batch_col, epoch_id,
                partition_cols=("list_id",),
            )

    # -- runner ------------------------------------------------------------------
    def start(self, embedding_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingVectorIndex.start() requires checkpoint_dir: "
                "append-only epoch numbering must survive restarts"
            )
        writer = (
            embedding_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
