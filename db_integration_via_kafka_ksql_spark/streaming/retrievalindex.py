"""Incrementally maintained inverted index: the streaming half of the
BM25 retrieval family.

Documents arrive on a stream (append-only corpus — each doc_id once, the
JSONL-ingest shape); every micro-batch's postings (doc_id, term, tf, dl)
are computed by the BATCH `postings` operator and committed as that
epoch's partition. Because a document's postings are immutable and
doc-disjoint across batches, the cumulative index IS the union of the
committed epoch partitions — there is no separate state table, no merge
job, and replay safety is just the committed-epoch guard (a replayed
epoch's partition already exists and is skipped wholesale).

Serving goes through `operators/retrieval.bm25_from_postings` — the
exact code path the batch oracle gates — so the contract is sharp:

    serve(queries) after epoch e  ==  bm25_topk over every document
                                      arrived in epochs <= e

(df, N, avgdl are derived from the postings themselves, so a
prefix-exact index yields prefix-exact scores; asserted per epoch in
tests, not just at the end.)

Scale shape: per trigger one explode + two map-side-combined groupBys
over the BATCH only (the already-indexed corpus is never rescanned);
the index grows by the batch's postings — at 100 TB you'd partition the
committed files BY TERM-HASH (the bucketed-postings note in
operators/retrieval.py) so query-time scans prune to the queried terms;
here each epoch is one partition, the scan-prune axis the epochdir
discipline already provides.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import retrieval as R
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)

POSTINGS_SCHEMA = "doc_id long, term string, tf long, dl long"


@dataclass
class StreamingPostings:
    """Continuous inverted-index maintenance + BM25 serve."""

    spark: SparkSession
    index_path: str           # per-epoch postings partitions == the index
    batch_col: str = "epoch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_postings"
    # scheduled epochdir maintenance — for this accumulated-index
    # stage the relevant knob is compact_outputs (merge old epoch
    # partitions into one scan-friendly file set; the cumulative and
    # strictly-before reads are compaction-transparent, and the
    # newest epoch is never compacted so crash replays are unaffected)
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    def index(self) -> DataFrame:
        """The cumulative postings frame (all committed epochs)."""
        if not os.path.isdir(self.index_path):
            return self.spark.createDataFrame([], POSTINGS_SCHEMA)
        return self.spark.read.parquet(self.index_path).select(
            "doc_id", "term", "tf", "dl"
        )

    def serve(
        self, queries: list[tuple[int, str]], top_k: int = 10
    ) -> DataFrame:
        """BM25 top-k over everything indexed so far — the batch scoring
        path verbatim (bm25_from_postings)."""
        return R.bm25_from_postings(self.index(), queries, top_k=top_k)

    def serve_keyphrases(self, top_k: int = 5, min_df: int = 2) -> DataFrame:
        """TF-IDF keyphrases for every document indexed so far — the
        batch tagging path verbatim (tfidf_from_postings); df/N derive
        from the cumulative index, so epoch-e tags == the batch operator
        over the arrived prefix (a late near-duplicate RE-tags earlier
        docs' terms downward through the shared df — corpus-aware by
        construction, which a per-batch tagger cannot be)."""
        return R.tfidf_from_postings(self.index(), top_k=top_k, min_df=min_df)

    # -- per-batch plan ----------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        if epochdir.epoch_committed(self.index_path, self.batch_col, epoch_id):
            return  # committed replay: the partition already holds these postings
        if batch_df.isEmpty():
            # idle: commit NOTHING — one empty epoch dir per 2 s trigger
            # grows unbounded on a quiet stream (the SCD2 ADVICE fix);
            # replaying an idle epoch is free and the cumulative-union
            # read never cared about gaps in the epoch sequence
            return
        epochdir.commit_epoch(
            R.postings(batch_df),
            self.index_path, self.batch_col, epoch_id,
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            output_paths=(self.index_path,),
        )

    # -- runner ------------------------------------------------------------
    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingPostings.start() requires checkpoint_dir: the "
                "epoch guard is only sound when batch numbering survives "
                "restarts"
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
