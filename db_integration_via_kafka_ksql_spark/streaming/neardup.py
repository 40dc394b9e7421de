"""Streaming near-duplicate dedup: MinHash/LSH with cross-batch bucket
state — fuzzy dedup of a continuous document feed, the companion of
`StreamingCurator`'s exact-hash pass.

Per micro-batch:

1. band keys for EVERY incoming doc (`operators/dedup.minhash_band_keys`
   — the same primitive the batch pair generator uses);
2. within-batch transitive closure: band-collision pairs → connected
   components (`operators/graph.dedup_clusters`) → min-doc_id reps;
3. cross-batch filter: any doc sharing a (band_id, band_key) bucket with
   ANY previously-seen doc is dropped;
4. idempotent append of the survivors (atomic name-stable publish of
   the batch's own `ingest_batch` partition via `streaming/epochdir` —
   the `StreamingCurator` replay story; replays skip the committed
   partition, so chained downstream stages never re-ingest an epoch);
5. state grows by the batch's band keys — for ALL docs, accepted or
   dropped, so later docs that resemble an already-dropped doc are still
   caught (collision witnesses must persist).

**Semantics (documented honestly).** One-pass streaming cannot retract:
if a "bridge" doc arrives after two mutually-distant docs were already
emitted, both stay in the output even though a batch pass over the union
would keep only one. The guarantees that DO hold for every arrival order
(property-tested in tests/test_streaming_neardup.py):

- accepted docs are pairwise bucket-disjoint — no two docs in the output
  are LSH-candidates of each other;
- every dropped doc has a witness: a bucket shared with an earlier-seen
  doc (previous batch) or with a same-batch cluster-mate;
- a single-batch run is EXACTLY the batch keep-one (component minima);
- replays of either crash interleaving converge (same as the curator).

Scale shape: band keys are uniform md5-derived strings (no hot buckets);
the state is bucket-partitioned parquet keyed by (band_id, band_key,
doc_id) with size ∝ seen docs × bands; the per-batch probe is one
shuffle join of batch keys against the state — batch-sized left side, so
at 100 TB of history the join broadcasts the BATCH, never the state.
Edges default to raw band collisions; `rerank_threshold` upgrades them
to estimated-Jaccard-reranked collisions using the k-component minhash
signature (stored in state — fixed width, unlike word sets, so the
rerank the batch path does exactly is done here in expectation; the
estimate is quantized to multiples of 1/k).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.functions import text as T
from db_integration_via_kafka_ksql_spark.operators.dedup import (
    _word_sets,
    minhash_band_keys,
    sig_band_structs,
)
from db_integration_via_kafka_ksql_spark.operators.graph import dedup_clusters
from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
    maintain,
)
from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore


@dataclass
class StreamingNearDup:
    """Continuous LSH near-dup filtering into a partitioned dataset."""

    spark: SparkSession
    dataset_path: str
    state_path: str
    k: int = 8
    bands: int = 4
    # >1 salts the within-batch band self-join: a pathological micro-batch
    # where most docs share one (band_id, band_key) bucket then spreads its
    # quadratic pair output over salt_bands partitions even under a
    # shuffled (non-broadcast) join. 1 = plain join (broadcast-size
    # batches, the normal regime).
    salt_bands: int = 1
    # When set, band-collision candidates are reranked by ESTIMATED
    # Jaccard — the fraction of agreeing minhash components — and only
    # candidates with estimate >= rerank_threshold count as collisions
    # (within batch AND against history). This is the streaming
    # counterpart of the batch path's exact-Jaccard rerank without
    # persisting word sets: the state stores each doc's k-component
    # signature (k hex strings — fixed width) instead. E[estimate] is the
    # true Jaccard; with k components the estimate is quantized to
    # multiples of 1/k, so thresholds should be chosen on that grid.
    # None = pure bucket-collision semantics (the prior behavior).
    rerank_threshold: float | None = None
    batch_col: str = "ingest_batch"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_neardup"
    # scheduled maintenance: witness_ttl_epochs drives expire_witnesses
    # at the cadence. output compaction is deliberately NOT wired: the
    # accepted-docs dataset is tailed by file-stream consumers, for whom
    # compaction's part-file rewrite means re-ingestion (maintenance.py's
    # documented exclusion)
    maintenance: MaintenancePolicy | None = None

    def __post_init__(self) -> None:
        self.state = ParquetStateStore(
            self.spark,
            self.state_path,
            key_cols=["band_id", "band_key", "doc_id"],
            order_cols=["offset"],
        )
        self._check_state_mode()

    def _check_state_mode(self) -> None:
        """The rerank flag is fixed for a state directory's lifetime: the
        state schema carries `sig` iff rerank is on, and a silent toggle
        would crash mid-stream (missing column / changelog-state schema
        mismatch) on the first non-empty batch. Fail at construction with
        a clear message instead."""
        if not self.state.exists():
            return
        has_sig = "sig" in self.state.read().columns
        wants_sig = self.rerank_threshold is not None
        if has_sig != wants_sig:
            raise ValueError(
                f"state at {self.state_path!r} was built with "
                f"rerank {'ON' if has_sig else 'OFF'} but this instance sets "
                f"rerank_threshold={self.rerank_threshold!r}; the signature "
                "column is part of the persisted state schema — keep the "
                "flag stable for a state directory, or rebuild the state "
                "(destroy + replay the corpus) to switch modes"
            )

    def _band_frame(self, docs: DataFrame) -> DataFrame:
        """(doc_id, band_id, band_key[, sig]) for one batch.

        With rerank enabled the k-component signature is computed ONCE
        (checkpointed — doc_id + k hex strings, tiny) and both the band
        keys and the pipe-joined `sig` column derive from it."""
        if self.rerank_threshold is None:
            return minhash_band_keys(docs, k=self.k, bands=self.bands)
        sets = _word_sets(docs)
        sig = (
            sets.select("doc_id", F.explode("ws").alias("w"))
            .groupBy("doc_id")
            .agg(*T.minhash_signature(F.col("w"), self.k))
            .localCheckpoint(eager=True)
        )
        return sig.select(
            "doc_id",
            F.concat_ws("|", *[F.col(f"h{i}") for i in range(self.k)]).alias(
                "sig"
            ),
            F.explode(sig_band_structs(self.k, self.bands)).alias("bb"),
        ).select(
            "doc_id",
            "sig",
            F.col("bb.band_id").alias("band_id"),
            F.col("bb.band_key").alias("band_key"),
        )

    def _sig_estimate(self, a, b):
        """Estimated Jaccard: fraction of agreeing signature components."""
        matches = F.size(
            F.filter(
                F.zip_with(
                    F.split(a, "\\|"), F.split(b, "\\|"), lambda x, y: x == y
                ),
                lambda v: v,
            )
        )
        return matches / F.lit(float(self.k))

    def _batch_pairs(self, bk: DataFrame, par: int) -> DataFrame:
        """Within-batch band-collision pairs (doc_a < doc_b), deduped.

        salt_bands == 1: plain self-join on (band_id, band_key).
        salt_bands == s > 1: the salted-replicated self-join — side a
        carries salt = pmod(hash(doc_id), s) and is hash-partitioned on
        (band_id, band_key, salt); side b is replicated to every salt.
        Each pair (x, y) with x < y appears exactly once (at y replicated
        into x's salt), and a bucket holding m docs does m·m/s work per
        partition instead of m² in one — deterministic (hash salt, not
        random), so replays see identical pair sets.
        """
        if self.salt_bands <= 1:
            a = bk.repartition(par).alias("a")
            b = bk.alias("b")
            cond = (
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
            )
        else:
            s = self.salt_bands
            a = (
                bk.withColumn(
                    "__salt", F.pmod(F.xxhash64("doc_id"), F.lit(s)).cast("int")
                )
                .repartition(par, "band_id", "band_key", "__salt")
                .alias("a")
            )
            b = bk.withColumn(
                "__salt", F.explode(F.array(*[F.lit(i) for i in range(s)]))
            ).alias("b")
            cond = (
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.__salt") == F.col("b.__salt"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
            )
        if self.rerank_threshold is not None:
            cond = cond & (
                self._sig_estimate(F.col("a.sig"), F.col("b.sig"))
                >= F.lit(self.rerank_threshold)
            )
        return (
            a.join(b, cond)
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )

    def accepted_of_batch(self, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(accepted docs, full band-key frame) for one batch."""
        bk = self._band_frame(docs).localCheckpoint()
        par = docs.sparkSession.sparkContext.defaultParallelism
        # within-batch transitive closure → min-doc_id representative.
        # The band self-join's OUTPUT is quadratic in bucket occupancy, so
        # one side is spread round-robin (the same AQE single-task pitfall
        # minhash_lsh_pairs pins against in operators/dedup.py): a skewed
        # micro-batch must not run the quadratic join in one task. This
        # relies on the planner broadcasting side b (micro-batches are
        # small), which preserves the probe side's partitioning; under a
        # shuffled join both sides re-shuffle by band key and a single hot
        # bucket would still land in one partition — salt_bands > 1 covers
        # that regime (see _batch_pairs).
        pairs = self._batch_pairs(bk, par)
        reps = dedup_clusters(
            docs.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b"
        ).filter("is_rep")
        # cross-batch: drop docs colliding with ANY previously-seen bucket
        survivors = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
        if self.state.exists():
            # history probe: the BATCH's band keys are the small side, so
            # they must be the broadcast BUILD side. A `bk.join(hist, ...,
            # "left_semi")` would put the batch on the stream side — Spark
            # can only build a broadcast hash join on the right for LEFT
            # SEMI, which at large state degrades to shuffling the full
            # bucket history every micro-batch. Inner join with the batch
            # broadcast keeps the state scan-side and shuffle-free.
            # Assumes micro-batches stay broadcast-sized (bands × batch
            # rows ≪ the 8 GB broadcast cap) — true at the 2 s trigger
            # cadence this pipeline targets. A bulk catch-up replay should
            # come through the batch dedup path instead; if huge batches
            # ever must stream, drop this hint and let
            # autoBroadcastJoinThreshold pick the join side.
            if self.rerank_threshold is None:
                hist = self.state.read().select("band_id", "band_key")
                hits = (
                    hist.join(
                        F.broadcast(bk.select("band_id", "band_key", "doc_id")),
                        ["band_id", "band_key"],
                    )
                    .select("doc_id")
                    .distinct()
                )
            else:
                # rerank the history collisions too: the state carries each
                # historical doc's signature, so a bucket coincidence with
                # low signature agreement no longer counts as a duplicate
                hist = self.state.read().select(
                    "band_id", "band_key", F.col("sig").alias("hist_sig")
                )
                hits = (
                    hist.join(
                        F.broadcast(
                            bk.select("band_id", "band_key", "doc_id", "sig")
                        ),
                        ["band_id", "band_key"],
                    )
                    .filter(
                        self._sig_estimate(F.col("hist_sig"), F.col("sig"))
                        >= F.lit(self.rerank_threshold)
                    )
                    .select("doc_id")
                    .distinct()
                )
            survivors = survivors.join(hits, "doc_id", "left_anti")
        return survivors, bk

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():  # idle trigger — nothing to dedup or record
            return
        accepted, bk = self.accepted_of_batch(batch_df)
        accepted = accepted.localCheckpoint()
        # atomic, name-stable partition publish (streaming/epochdir):
        # replays find the partition committed and skip the write, so
        # downstream file-stream consumers never see an epoch twice
        epochdir.commit_epoch(
            accepted, self.dataset_path, self.batch_col, epoch_id
        )
        # state grows by every incoming doc's buckets (witnesses persist);
        # replays upsert the same composite keys — idempotent. With rerank
        # enabled the signature rides along (fixed-width payload, k hex
        # strings per doc duplicated across its bands).
        state_cols = ["band_id", "band_key", "doc_id"] + (
            ["sig"] if self.rerank_threshold is not None else []
        )
        self.state.apply_batch(
            bk.select(
                *state_cols,
                F.lit(epoch_id).cast("bigint").alias("offset"),
                F.lit("false").alias("__deleted"),
            )
        )
        maintain(
            self.spark, self.maintenance, epoch_id, self.batch_col,
            expire=self.expire_witnesses,
        )

    def expire_witnesses(self, min_epoch: int) -> int:
        """Retention horizon for the bucket state: drop witness rows from
        epochs before `min_epoch`; returns rows dropped.

        The state otherwise grows ∝ seen docs × bands forever. Expiring
        old witnesses bounds it at the documented cost: a new doc that
        near-duplicates ONLY docs older than the horizon is re-admitted
        (their collision evidence is gone) — the same trade Kafka log
        retention makes for the reference's topics. Witness offsets are
        the epoch of each doc's LAST sighting (apply_batch upserts), so
        a bucket seen recently survives even if first seen long ago."""
        return self.state.prune_below(min_epoch)

    def read_corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.dataset_path)

    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            # see StreamingCurator.start: without a durable checkpoint a
            # restarted query renumbers epochs from 0 and the epoch-
            # committed-partition guard silently drops the new batches
            # while the witness state advances. Refuse.
            raise ValueError(
                "StreamingNearDup.start() requires checkpoint_dir: the "
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
