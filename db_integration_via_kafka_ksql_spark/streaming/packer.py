"""Streaming sequence packing: the concat-then-chunk packer
(`operators/text_analysis.pack_sequences`) as a continuous pipeline —
per-shard token offsets carried across micro-batches in swap-atomic
state, so a document feed packs into fixed-capacity training sequences
as it arrives instead of in one batch pass.

Per micro-batch:

1. per-doc token counts; within each shard the batch's docs are ordered
   by doc_id and given RELATIVE offsets by a shard-keyed running-sum
   window (the batch twin's exact shape, batch-local);
2. the per-shard BASE offset (one tiny row per shard, everything packed
   so far) joins in broadcast — absolute offset = base + relative;
   sequence spans derive from absolute offsets exactly as in the batch
   twin (`first_seq = start div capacity`, `last_seq = (end-1) div
   capacity` — docs may straddle batch boundaries mid-sequence);
3. idempotent append of the assignment rows (atomic name-stable
   publish of the batch's own `ingest_batch` partition via
   `streaming/epochdir`);
4. the state advances by each shard's batch token total, written with
   the aggview atomic-swap + `_epoch.json` marker.

**Ordering semantics (documented honestly).** A one-pass stream packs in
ARRIVAL order: (ingest_batch, doc_id), not the global doc_id order of
the batch twin. Feeding batches in ascending doc_id order reproduces the
batch result exactly (equivalence-tested); out-of-order arrival gives a
different — still gapless and deterministic-per-arrival-order — packing.

**Replay.** The dataset partition publish PRECEDES the state swap. A
crash before the swap replays the batch against the unchanged base —
same rows; the committed partition (name-stable, `epochdir`) is found
and the write skipped, the state swap then lands. After the swap, the
replayed epoch is detected (`epoch <= last_epoch`) and skipped entirely:
re-running it against the advanced base would double-advance every
offset. Same discipline as `IncrementalAggView`.

Scale: state is one row per shard; the only corpus-touching work per
batch is one shard-keyed window over the BATCH. Parallelism = number of
shards, the same deliberate contract as the batch twin (shard by
(source, hash-bucket) so no shard outgrows an executor).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.functions import text as T
from db_integration_via_kafka_ksql_spark.streaming import epochdir, swapdir


@dataclass
class StreamingPacker:
    """Continuous concat-then-chunk packing into a partitioned dataset."""

    spark: SparkSession
    dataset_path: str
    state_path: str
    capacity: int = 256
    shard_cols: tuple[str, ...] = ("source",)
    batch_col: str = "ingest_batch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_packer"

    def __post_init__(self) -> None:
        if self.capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {self.capacity}")

    # ----------------------------------------------- state (swapdir shared)
    def state_exists(self) -> bool:
        return swapdir.dir_exists(self.state_path)

    def read_state(self) -> DataFrame:
        """(shard_cols..., base_offset): tokens packed so far per shard."""
        return self.spark.read.parquet(self.state_path)

    def last_epoch(self) -> int | None:
        return swapdir.read_epoch(self.state_path)

    def _swap_state(self, df: DataFrame, epoch_id: int) -> None:
        swapdir.swap_write(df, self.state_path, epoch_id)

    # ------------------------------------------------------------- batch
    def _assigned(self, docs: DataFrame) -> DataFrame:
        shard = list(self.shard_cols)
        w = (
            Window.partitionBy(*shard)
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = docs.select(
            *shard, "doc_id", T.token_count("text").cast("bigint").alias("n_tokens")
        ).withColumn("rel_end", F.sum("n_tokens").over(w))
        if self.state_exists():
            # null-SAFE key equality: the batch twin's Window.partitionBy
            # groups NULL shard values together, so the state lookup (and
            # the merge below) must match NULL keys too — a plain equi-join
            # would reset a NULL shard's base to 0 every batch
            base = F.broadcast(self.read_state()).alias("s")
            cond = None
            for c in shard:
                e = cum[c].eqNullSafe(F.col(f"s.{c}"))
                cond = e if cond is None else (cond & e)
            cum = (
                cum.join(base, cond, "left")
                .select(cum["*"], F.col("s.base_offset"))
                .withColumn(
                    "base_offset",
                    F.coalesce("base_offset", F.lit(0).cast("bigint")),
                )
            )
        else:
            cum = cum.withColumn("base_offset", F.lit(0).cast("bigint"))
        cap = self.capacity
        return cum.select(
            *shard,
            "doc_id",
            "n_tokens",
            (F.col("base_offset") + F.col("rel_end") - F.col("n_tokens")).alias(
                "start_offset"
            ),
            F.expr(f"(base_offset + rel_end - n_tokens) div {cap}")
            .cast("bigint")
            .alias("first_seq"),
            F.expr(f"(base_offset + rel_end - 1) div {cap}")
            .cast("bigint")
            .alias("last_seq"),
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = self.last_epoch()
        if last is not None and epoch_id <= last:
            # replayed epoch AFTER its state swap: the partition is on
            # disk; recomputing against the advanced base would
            # double-advance offsets — skip wholesale
            return
        assigned = self._assigned(batch_df).localCheckpoint()
        # atomic, name-stable partition publish (streaming/epochdir): a
        # replay that crashed AFTER this write but BEFORE the state swap
        # finds the partition committed and skips it — file names never
        # change once visible, so a downstream stage streaming the packed
        # dataset by file name cannot re-ingest this epoch
        epochdir.commit_epoch(
            assigned, self.dataset_path, self.batch_col, epoch_id
        )
        shard = list(self.shard_cols)
        delta = assigned.groupBy(*shard).agg(
            F.sum("n_tokens").cast("bigint").alias("d")
        )
        if self.state_exists():
            base = self.read_state().alias("b")
            dl = delta.alias("d")
            cond = None
            for c in shard:  # null-safe: one row per shard incl. NULL keys
                e = F.col(f"b.{c}").eqNullSafe(F.col(f"d.{c}"))
                cond = e if cond is None else (cond & e)
            merged = (
                base.join(dl, cond, "full")
                .select(
                    *[
                        F.coalesce(F.col(f"b.{c}"), F.col(f"d.{c}")).alias(c)
                        for c in shard
                    ],
                    (
                        F.coalesce("b.base_offset", F.lit(0).cast("bigint"))
                        + F.coalesce("d.d", F.lit(0).cast("bigint"))
                    ).alias("base_offset"),
                )
                # the swap replaces the dir this plan reads — cut lineage
                .localCheckpoint()
            )
        else:
            merged = delta.select(
                *shard, F.col("d").alias("base_offset")
            ).localCheckpoint()
        self._swap_state(merged, epoch_id)

    def read_packed(self) -> DataFrame:
        return self.spark.read.parquet(self.dataset_path)

    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            # the replay guard compares Spark's epoch ids against
            # _epoch.json; without a durable checkpoint a RESTARTED query
            # renumbers from 0 and live batches would be skipped as
            # "replays" (no data written, no error) until the counter
            # passes the old high-water mark. Refuse rather than lose data.
            # (process_batch remains directly callable for tests/tools.)
            raise ValueError(
                "StreamingPacker.start() requires checkpoint_dir: the "
                "epoch-based replay guard is only sound when Spark's batch "
                "numbering survives restarts"
            )
        writer = (
            doc_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
        )
        writer = writer.option("checkpointLocation", self.checkpoint_dir)
        if self.trigger_seconds:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        return writer.start()
