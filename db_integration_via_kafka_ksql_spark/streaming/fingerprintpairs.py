"""Streaming fingerprint near-dup PAIR emitter: every hamming-<=h pair
of 64-bit perceptual fingerprints (image aHash, audio energy-delta) is
emitted EXACTLY ONCE — in the epoch its later member arrives.

The stateful twin of the banded hamming join
(`operators/multimodal._hamming64_neardup_pairs`), and strictly
stronger-contracted than the MinHash stream (`streaming/neardup.py`):
LSH banding there is probabilistic, so the stream documents weaker
one-pass guarantees; the equal-split fingerprint banding here is
pigeonhole-EXACT at the radius, so the stream supports a full prefix
contract (tested):

    union of epoch outputs 0..e  ==  batch pairs over every doc that
    ever arrived, each pair exactly once,

because a pair's bands collide deterministically, and the pair is
generated precisely when its later member joins against the witness
state (cross-batch) or its batch-mate (within-batch).

Per micro-batch (outputs FIRST, then state — the SCD2 crash ordering:
a replay after a crash between the two commits skips the committed
output partition and re-applies the idempotent state upsert):

1. fingerprint the batch (caller-supplied batch transform, e.g.
   `multimodal.audio_energy_fingerprint`), drop empty payloads;
2. cross-batch pairs: batch band keys equi-join the witness state on
   (band_id, bk) — the BATCH side broadcasts (at 100 TB of history the
   state is the big side, never shuffled beyond its bucket layout) —
   then exact hamming verify on the carried fingerprints;
3. within-batch pairs: the batch operator itself over the batch frame;
4. `epochdir.commit_epoch` the distinct union (replay-skipped);
5. upsert the batch's band rows into the witness ParquetStateStore
   (idempotent for replays; keyed (band_id, bk, doc_id) so only the
   touched hash buckets rewrite — the incremental apply_batch path).

Feed contract: doc_ids are unique across the stream (append-only corpus
— the StreamingComponents stance; a re-sent doc_id would pair with its
own earlier witness). State ∝ seen docs x bands; `expire_witnesses`
trades re-admitting old duplicates for bounded state, exactly the
neardup.py TTL semantics.

Reference parity: none (media dedup is a training-pipeline extension;
the reference moves payloads opaquely) — same stance as the image/audio
batch ops it twins.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators.multimodal import (
    _hamming64_neardup_pairs,
    fingerprint_band_frame,
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)
from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore


@dataclass
class StreamingFingerprintPairs:
    """Continuous exact-once near-dup pair emission over a fingerprint
    stream, with a banded witness state."""

    spark: SparkSession
    output_path: str          # epoch-partitioned (doc_a, doc_b, hamming)
    state_path: str           # witness ParquetStateStore
    fingerprint: Callable[[DataFrame], DataFrame]
    lo_col: str = "fp_lo"
    hi_col: str = "fp_hi"
    max_hamming: int = 3
    n_state_buckets: int = 16
    batch_col: str = "ingest_batch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_fingerprint_pairs"
    # scheduled maintenance: witness_ttl_epochs drives expire_witnesses
    # on the cadence (the documented re-admission trade); None disables
    maintenance: MaintenancePolicy | None = None
    batches_seen: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.max_hamming < 0 or self.max_hamming >= 16:
            raise ValueError(
                f"max_hamming must be in [0, 15], got {self.max_hamming}"
            )
        self._store = ParquetStateStore(
            self.spark,
            self.state_path,
            key_cols=["band_id", "bk", "doc_id"],
            order_cols=["epoch"],
            n_buckets=self.n_state_buckets,
        )

    # -- read surface -------------------------------------------------------
    def pairs(self) -> DataFrame:
        """Every pair emitted so far (union of committed epochs)."""
        if not epochdir.list_epochs(self.output_path, self.batch_col):
            return self.spark.createDataFrame(
                [], "doc_a long, doc_b long, hamming long"
            )
        return self.spark.read.parquet(self.output_path).select(
            "doc_a", "doc_b", "hamming"
        )

    # -- per-batch plan -------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        if epochdir.epoch_committed(self.output_path, self.batch_col, epoch_id):
            # output already published: re-apply only the (idempotent)
            # state upsert — the crash-between-commits replay
            self._apply_state(batch_df, epoch_id)
            return
        if batch_df.isEmpty():
            return  # idle: commit nothing (the SCD2 idle discipline)
        # `fingerprint` owns degenerate-row exclusion (e.g. the audio
        # path filters n_samples > 0 — an empty payload's (0,0) print
        # would pair with every other empty at hamming 0), exactly as
        # the batch pair operators do before their joins
        fp = (
            self.fingerprint(batch_df)
            .select("doc_id", self.lo_col, self.hi_col)
            .localCheckpoint(eager=True)  # feeds bands AND the batch join
        )
        bands = fingerprint_band_frame(
            fp, self.lo_col, self.hi_col, self.max_hamming + 1
        )
        within = _hamming64_neardup_pairs(
            fp, self.lo_col, self.hi_col, self.max_hamming
        )
        if self._store.exists():
            state = self.spark.read.parquet(self._store.path)
            cross = (
                state.alias("s")
                .join(
                    F.broadcast(bands.alias("n")),
                    (F.col("s.band_id") == F.col("n.band_id"))
                    & (F.col("s.bk") == F.col("n.bk")),
                )
                .select(
                    F.least(F.col("s.doc_id"), F.col("n.doc_id")).alias("doc_a"),
                    F.greatest(F.col("s.doc_id"), F.col("n.doc_id")).alias("doc_b"),
                    F.expr(
                        f"cast(bit_count(s.{self.lo_col} ^ n.{self.lo_col})"
                        f" + bit_count(s.{self.hi_col} ^ n.{self.hi_col})"
                        " as bigint)"
                    ).alias("hamming"),
                )
                .filter(F.col("doc_a") < F.col("doc_b"))
                .distinct()
                .filter(F.col("hamming") <= self.max_hamming)
            )
            out = within.unionByName(cross).distinct()
        else:
            out = within
        epochdir.commit_epoch(
            out, self.output_path, self.batch_col, epoch_id
        )
        self._apply_state(batch_df, epoch_id, fp=fp)
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            output_paths=(self.output_path,),
            expire=self.expire_witnesses,
        )

    def _apply_state(
        self, batch_df: DataFrame, epoch_id: int, fp: DataFrame | None = None
    ) -> None:
        if batch_df.isEmpty():
            return
        if fp is None:
            fp = self.fingerprint(batch_df).select(
                "doc_id", self.lo_col, self.hi_col
            )
        rows = fingerprint_band_frame(
            fp, self.lo_col, self.hi_col, self.max_hamming + 1
        ).select(
            "band_id",
            "bk",
            "doc_id",
            F.col(self.lo_col),
            F.col(self.hi_col),
            F.lit(epoch_id).cast("long").alias("epoch"),
            F.lit("false").alias("__deleted"),
        )
        self._store.apply_batch(rows)

    def expire_witnesses(self, min_epoch: int) -> int:
        """Drop witness rows older than `min_epoch` — bounded state for
        re-admitting duplicates of long-gone docs (neardup.py TTL
        semantics; do NOT call if full-history exactness matters)."""
        return self._store.prune_below(min_epoch, order_col="epoch")

    # -- runner ----------------------------------------------------------------
    def start(self, media_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingFingerprintPairs.start() requires checkpoint_dir: "
                "exact-once pair emission needs batch numbering to survive "
                "restarts"
            )
        writer = (
            media_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
