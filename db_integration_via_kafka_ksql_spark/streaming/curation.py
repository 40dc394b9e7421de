"""Incremental corpus curation: streaming ingest → dedup → partitioned append.

The batch pass (`operators/text_analysis.curate_corpus`) answers "what
survives curation today?"; this module runs the same column math
continuously: documents stream in (file source standing in for a topic,
as in the CDC tests), each micro-batch is quality-filtered, deduped
within the batch AND against everything already accepted, and appended to
the hive-partitioned dataset trainers read (`sinks/dataset.py` layout).

Design mirrors the CDC pipeline's external-state stance:

- **cross-batch dedup state** is a hash-keyed `ParquetStateStore` (the
  same store the CDC TABLE uses) — size ∝ unique accepted docs, one
  md5-key shuffle per batch;
- **exactly-once append without a transactional table format**: each
  micro-batch publishes ONLY its own `ingest_batch=<epoch_id>` partition,
  atomically and with FINAL part-file names (`streaming/epochdir` —
  staging dir + one rename). A replayed batch finds its partition already
  committed and skips the write entirely (the accepted set is
  deterministic given the pre-batch state, so the on-disk rows are
  already exactly what the replay would produce); if the failure happened
  after the state update, the replay additionally computes an empty
  accepted set. Either way replays converge — and because part-file
  names never change once visible, a DOWNSTREAM stage streaming this
  dataset by file name never re-ingests an epoch (the composition is
  exactly-once, not just each stage in isolation).
- **the dataset is the recovery log**: `rebuild_state()` derives the
  dedup state from the dataset itself (distinct hashes), so losing the
  state directory costs one scan, not correctness — the same
  "log is the source of truth" rebuild as `ParquetStateStore.rebuild`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
    quality_scores,
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore


@dataclass
class StreamingCurator:
    """Continuous curation into a partitioned training dataset."""

    spark: SparkSession
    dataset_path: str
    state_path: str
    min_quality: float = 0.75
    min_tokens: int = 50
    batch_col: str = "ingest_batch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_curation"
    # optional LEARNED quality gate: averaged-perceptron weights from
    # operators/classifier.train_quality_perceptron (the text-side
    # fit/serve split — train once offline, score every batch in-stream).
    # When set, a doc must also score strictly positive under the model
    # to be accepted. Weights are a fixed (dim+1)-int vector inlined as
    # a literal, so the accepted set stays deterministic given pre-batch
    # state — the property the epoch-partition replay guard requires.
    classifier_weights: list[int] | None = None

    def __post_init__(self) -> None:
        self.state = ParquetStateStore(
            self.spark, self.state_path, key_cols=["h"], order_cols=["offset"]
        )

    # -- per-batch plan ---------------------------------------------------
    def curate_batch(self, docs: DataFrame) -> DataFrame:
        """Quality filter (+ optional learned-model gate) + within-batch
        keep-one: the batch pass's exact shape (one scan, keep-one riding
        a min(struct) aggregate)."""
        if self.classifier_weights is not None:
            from db_integration_via_kafka_ksql_spark.operators import (
                classifier as C,
            )

            positive = (
                C.score_quality_perceptron(
                    docs.select("doc_id", "text"),
                    self.classifier_weights,
                    min_tokens=self.min_tokens,
                )
                .filter(F.col("pred") == 1)
                .select("doc_id")
            )
            docs = docs.join(positive, "doc_id", "left_semi")
        f = quality_scores(
            docs, min_tokens=self.min_tokens, keep_cols=("source", "text")
        ).filter(F.col("quality") >= self.min_quality)
        return (
            f.groupBy(F.md5("text").alias("h"))
            .agg(
                F.min(
                    F.struct("doc_id", "source", "text", "n_tokens", "quality")
                ).alias("r")
            )
            .select("h", "r.*")
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """One micro-batch: curate, drop already-accepted hashes, publish
        this batch's partition (atomic, name-stable, skipped on replay),
        then record the new hashes in the dedup state."""
        if batch_df.isEmpty():
            # same guard as neardup/semdedup/packer: a long-idle stream
            # must not run the full curate plan nor accumulate one empty
            # epoch-marker dir per trigger (an un-committed empty epoch
            # replays to the same empty result, so skipping is sound)
            return
        kept = self.curate_batch(batch_df)
        if self.state.exists():
            kept = kept.join(self.state.read().select("h"), on="h", how="left_anti")
        accepted = kept.localCheckpoint()  # once: dataset write + state
        epochdir.commit_epoch(
            accepted.repartition(F.col("source")).sortWithinPartitions(
                "source", "doc_id"
            ),
            self.dataset_path,
            self.batch_col,
            epoch_id,
            partition_cols=("source",),
        )
        self.state.apply_batch(
            accepted.select(
                "h",
                F.lit(epoch_id).cast("bigint").alias("offset"),
                F.lit("false").alias("__deleted"),
            )
        )

    # -- surfaces ---------------------------------------------------------
    def read_corpus(self) -> DataFrame:
        """The accepted corpus as trainers read it (partition-pruned on
        ingest_batch/source filters)."""
        return self.spark.read.parquet(self.dataset_path)

    def rebuild_state(self) -> None:
        """Recover the dedup state from the dataset itself (one scan)."""
        self.state.rebuild(
            self.read_corpus().select(
                "h",
                F.col(self.batch_col).cast("bigint").alias("offset"),
                F.lit("false").alias("__deleted"),
            )
        )

    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            # epochdir's skip-if-committed replay guard is only sound when
            # Spark's batch numbering survives restarts: a restarted query
            # without a checkpoint renumbers epochs from 0, commit_epoch
            # silently skips the "already committed" partitions while the
            # state still advances — permanent data loss AND a dedup state
            # rejecting rows that never reached the dataset. Refuse, like
            # StreamingPacker.start. (process_batch stays directly
            # callable for tests/tools.)
            raise ValueError(
                "StreamingCurator.start() requires checkpoint_dir: the "
                "epoch-committed-partition replay guard is only sound when "
                "Spark's batch numbering survives restarts"
            )
        writer = (
            doc_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(processingTime=f"{self.trigger_seconds} seconds")
        return writer.start()
