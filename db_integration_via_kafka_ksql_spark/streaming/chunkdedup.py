"""Continuous content-addressed chunk ingest: the streaming twin of
operators/multimodal.content_defined_chunks + cdc_chunk_dedup_report.

Each micro-batch of binary payloads is gear-chunked AT ARRIVAL (the
batch operator, reused verbatim), and every chunk is classified new vs
duplicate against everything already ingested — the front end of a
content-addressed store: `is_new = false` chunks would not be written
twice. Within a batch the deterministic first occurrence wins
(min (doc_id, chunk_idx) per chunk hash); across batches the witness
state (one row per distinct chunk content ever seen) decides.

State & exactly-once: the witness table is a SET keyed by the chunk
hash — merging new witnesses is IDEMPOTENT (dropDuplicates keeps the
earliest epoch), so like StreamingHll the replay story is trivial: a
half-committed epoch recomputes the identical output from the same
pre-batch state, and re-merging the same witnesses is a no-op. Both
frames publish through `epochdir.commit_epoch`, outputs first; each
epoch reads the latest committed witness partition strictly before
itself.

Contract (asserted per epoch in tests): the cumulative witness set
after epoch e == the distinct chunk hashes of the BATCH operator run
over everything arrived, and each epoch's `is_new` bytes are exactly
the storage a content-addressed store would admit.

Scale shape: chunking is mapInPandas scan-side (payload bytes never
shuffle); the new/dup split is one groupBy on the uniform chunk hash
plus one left-anti join against the witness partition pre-filtered by
nothing (witnesses are fixed-width hash rows — the heavy side, the
payloads, are long gone). Witness state grows with DISTINCT content
only — the whole point of chunk-level dedup — and an unbounded stream
of novel bytes needs an external compaction/TTL policy, documented,
not hidden.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import multimodal as M
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)

OUT_SCHEMA = (
    "doc_id long, chunk_idx long, offset long, length long, "
    "chunk_md5 string, is_new boolean"
)


@dataclass
class StreamingChunkDedup:
    """Incremental chunk-level dedup over a binary payload stream."""

    spark: SparkSession
    output_path: str          # per-epoch chunk ledger (is_new flags)
    state_path: str           # per-epoch witness set (chunk_md5, length, first_epoch)
    min_size: int = 48
    mask_bits: int = 6
    max_size: int = 512
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_chunk_dedup"
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

    def _witnesses(self, epoch_id: int) -> DataFrame:
        e = self._latest_state_epoch(before=epoch_id)
        if e is None:
            return self.spark.createDataFrame(
                [], "chunk_md5 string, length long, first_epoch long"
            )
        return (
            self.spark.read.parquet(self.state_path)
            .filter(F.col(self.batch_col) == e)
            .select("chunk_md5", "length", "first_epoch")
        )

    def ledger(self) -> DataFrame:
        """Every chunk ingested so far (epoch, doc, span, hash, is_new).

        Guarded like scd2.history()/fingerprintpairs.pairs(): since the
        idle-epoch discipline commits NOTHING on quiet triggers, a
        stream that has only seen idle batches has no output dir at all
        — return an empty ledger-shaped frame instead of leaking
        PATH_NOT_FOUND to the caller."""
        if not epochdir.list_epochs(self.output_path, self.batch_col):
            return self.spark.createDataFrame(
                [],
                "doc_id long, chunk_idx long, offset long, length long, "
                f"chunk_md5 string, is_new boolean, {self.batch_col} int",
            )
        return self.spark.read.parquet(self.output_path)

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
            # idle: commit NOTHING on either side (the SCD2 ADVICE
            # discipline — a quiet stream must not grow one empty epoch
            # dir per 2 s trigger); replaying an idle epoch is free, and
            # both the latest-before state read and the ledger union
            # skip gaps in the epoch sequence
            return
        chunks = M.content_defined_chunks(
            batch_df,
            min_size=self.min_size,
            mask_bits=self.mask_bits,
            max_size=self.max_size,
        ).localCheckpoint(eager=True)  # feeds the split AND the merge
        seen = self._witnesses(epoch_id).localCheckpoint(eager=True)
        # within-batch winner per chunk content: min (doc_id, chunk_idx)
        winner = chunks.groupBy("chunk_md5").agg(
            F.min(F.struct("doc_id", "chunk_idx")).alias("w")
        )
        out = (
            chunks.join(winner, "chunk_md5")
            .join(
                seen.select("chunk_md5", F.lit(True).alias("_known")),
                "chunk_md5",
                "left",
            )
            .select(
                "doc_id",
                "chunk_idx",
                "offset",
                "length",
                "chunk_md5",
                (
                    F.col("_known").isNull()
                    & (F.col("doc_id") == F.col("w.doc_id"))
                    & (F.col("chunk_idx") == F.col("w.chunk_idx"))
                ).alias("is_new"),
            )
        )
        epochdir.commit_epoch(out, self.output_path, self.batch_col, epoch_id)
        fresh = (
            chunks.join(seen.select("chunk_md5"), "chunk_md5", "left_anti")
            .groupBy("chunk_md5")
            .agg(F.first("length").alias("length"))
            .select(
                "chunk_md5", "length", F.lit(epoch_id).cast("long").alias("first_epoch")
            )
        )
        merged = seen.unionByName(fresh)
        epochdir.commit_epoch(
            merged, self.state_path, self.batch_col, epoch_id
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
                "StreamingChunkDedup.start() requires checkpoint_dir: the "
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
