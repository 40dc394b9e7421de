"""Incremental EXACT substring dedup over a document stream.

The batch pipeline (operators/text_analysis.duplicate_cut_spans) finds
every corpus location covered by a verbatim >= L-token duplicate and
merges them into per-doc cut intervals. This module is its streaming
twin: documents arrive in micro-batches, and each NEW doc's cut
intervals are computed at arrival against EVERYTHING seen so far —
the accumulated gram index plus the doc's own batch. Accepted docs are
never re-cut retroactively (the streaming-neardup stance: history is
immutable; a later duplicate cuts the LATER doc).

Semantics, precisely: the epoch-e output for a doc d arriving in batch
e equals `duplicate_cut_spans(all docs of batches 0..e)` restricted to
d — the batch operator over the prefix corpus. That identity is the
test gate (tests/test_streaming_substrdedup.py asserts it per batch,
n_runs included); it holds because d's intervals depend only on which
of ITS positions match ANY other seen location, and the maintained
index holds exactly the (doc_id, pos, h) gram rows of every prior
batch. Eligibility (occurrence count in [min_count, occ_cap]) is
evaluated over prefix ∪ batch, so a gram that goes boilerplate-hot
over time stops generating pairs for NEW docs exactly when the batch
operator would drop it.

State & exactly-once: both the gram index and the cut-spans output are
epoch-partitioned datasets published through `epochdir.commit_epoch`
(staging + one atomic rename, replay skips committed partitions). The
per-epoch computation reads only index partitions with epoch < current
(partition-pruned), so a replay after a crash between the two commits
recomputes the identical result: output commit skips, index commit
lands, and the composition converges. The per-epoch output is
deterministic given pre-batch state — pure hashing/counting — which is
the epochdir contract.

Scale shape: the index grows as one 16-byte-ish row per corpus gram —
the honest cost of EXACT substring dedup (a suffix-array build pays the
same corpus-sized index). Per batch: one gram scan of the batch, one
map-side-combined count over prefix ∪ batch restricted by a semi-join
to the BATCH's gram hashes (a hash-bucketed index layout would prune
this to touched buckets at 100 TB — the layout knob is `spark.read`'s
partition pruning on the epoch column today), the capped pair
equi-join (batch side × eligible locations, fan-out <= occ_cap per
gram), diagonal-run windows bounded by doc length, and the shared
interval merge. Nothing all-pairs; the batch's own frame, not the
corpus, drives every join's probe side.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import text_analysis as TA
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)


@dataclass
class StreamingSubstringDedup:
    """Continuous exact substring dedup with a persistent gram index."""

    spark: SparkSession
    index_path: str                 # accumulated (doc_id, pos, h) gram rows
    output_path: str                # per-epoch (doc_id, start, end, n_runs)
    min_tokens: int = 8
    min_count: int = 2
    occ_cap: int = 64
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_substring_dedup"
    # scheduled epochdir maintenance — compact_outputs merges old
    # index/ledger epochs (reads are compaction-transparent: the
    # strictly-before gram filter sees compacted provenance `upto`
    # which is still < every future epoch, and the newest epoch is
    # never compacted so crash replays are unaffected)
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    # -- state ------------------------------------------------------------
    def _prior_grams(self, epoch_id: int) -> DataFrame | None:
        """Gram rows of every epoch STRICTLY BEFORE epoch_id (partition-
        pruned read). A replayed epoch whose index partition already
        landed must not see its own grams — counts would double."""
        if not os.path.isdir(self.index_path):
            return None
        df = self.spark.read.parquet(self.index_path)
        return df.filter(F.col(self.batch_col) < epoch_id).select(
            "doc_id", "pos", "h"
        )

    def cut_spans(self) -> DataFrame:
        """Everything emitted so far: (epoch, doc_id, start, end, n_runs)."""
        return self.spark.read.parquet(self.output_path)

    # -- per-batch plan ---------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        done_out = epochdir.epoch_committed(
            self.output_path, self.batch_col, epoch_id
        )
        done_idx = epochdir.epoch_committed(
            self.index_path, self.batch_col, epoch_id
        )
        if done_out and done_idx:
            return  # fully committed replay: skip the recompute entirely
        if batch_df.isEmpty():
            return  # idle trigger: nothing to index, nothing to cut
        L = int(self.min_tokens)
        grams_b = TA.gram_positions(
            batch_df.select("doc_id", "text"), min_tokens=L
        ).localCheckpoint(eager=True)  # one scan feeds union, sides, index
        prior = self._prior_grams(epoch_id)
        union = (
            grams_b if prior is None else grams_b.unionByName(prior)
        )
        # only grams PRESENT IN THE BATCH can produce new matches: prune
        # the prefix index to the batch's hash set before counting, so
        # per-batch work scales with the batch, not the corpus
        batch_h = grams_b.select("h").distinct()
        touched = union.join(batch_h, "h", "left_semi").localCheckpoint(
            eager=True
        )  # feeds the count AND the partner side
        elig = (
            touched.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(
                (F.col("c") >= self.min_count) & (F.col("c") <= self.occ_cap)
            )
            .select("h")
        )
        sides = grams_b.join(elig, "h", "left_semi").select(
            F.col("h").alias("hs"),
            F.col("doc_id").alias("doc_s"),
            F.col("pos").alias("pos_s"),
        )
        partners = touched.join(elig, "h", "left_semi").select(
            F.col("h").alias("hp"),
            F.col("doc_id").alias("doc_p"),
            F.col("pos").alias("pos_p"),
        )
        pairs = sides.join(
            partners,
            (F.col("hs") == F.col("hp"))
            & ~(
                (F.col("doc_s") == F.col("doc_p"))
                & (F.col("pos_s") == F.col("pos_p"))
            ),
        ).select(
            "doc_s", "pos_s", "doc_p",
            (F.col("pos_p") - F.col("pos_s")).alias("delta"),
        )
        wdiag = Window.partitionBy("doc_s", "doc_p", "delta").orderBy("pos_s")
        spans = (
            pairs.withColumn("grp", F.col("pos_s") - F.row_number().over(wdiag))
            .groupBy("doc_s", "doc_p", "delta", "grp")
            .agg(F.min("pos_s").alias("s"), F.max("pos_s").alias("e"))
            .select(
                F.col("doc_s").alias("doc_id"),
                F.col("s").cast("bigint").alias("start"),
                (F.col("e") + L).cast("bigint").alias("end"),
            )
        )
        cuts = TA.merge_spans(spans)
        epochdir.commit_epoch(cuts, self.output_path, self.batch_col, epoch_id)
        epochdir.commit_epoch(
            grams_b, self.index_path, self.batch_col, epoch_id
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            output_paths=(self.output_path, self.index_path),
        )

    # -- runner -----------------------------------------------------------
    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            # the epochdir skip-if-committed guard is only sound when
            # Spark's batch numbering survives restarts (same stance as
            # StreamingCurator/StreamingPacker)
            raise ValueError(
                "StreamingSubstringDedup.start() requires checkpoint_dir: "
                "the epoch-committed-partition replay guard is only sound "
                "when batch numbering survives restarts"
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
