"""Online perceptron training over a document stream.

The batch trainer (operators/classifier.train_quality_perceptron) walks
deterministic hash-bucket mini-batches of a static corpus; this module
is its streaming twin: each micro-batch IS the mini-batch. Every trigger
applies ONE synchronized integer update (the sum of y*x over the batch's
misclassified docs under the current weights) and accumulates the
averaged model — the classic online averaged perceptron, batch-at-a-time.
The continuously-refreshed weights are exactly what
StreamingCurator(classifier_weights=...) serves, closing the loop:
ingest -> label by the heuristic composite -> update the model ->
gate future batches with it.

Replay/exactly-once (the repo's epoch discipline, applied to MODEL
state): the weight state is a tiny json (current w, averaged sum, and
the last applied epoch id) published by atomic rename. A replayed
micro-batch (epoch <= last applied) is a NO-OP — without that guard a
crash between the state write and the checkpoint commit would
double-apply the batch's update on restart. Within one epoch the update
itself is an integer sum (associative partial aggregates), so any
partitioning of the batch produces identical weights.

Scale shape: per trigger, one scan of the batch (features + margins,
scan-side literal weights, map-side combined) and one <=dim+1-row
collect; driver state is the (dim+1)-int vector pair. Nothing
corpus-sized ever accumulates — state size is the model, not the data.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import classifier as C


@dataclass
class StreamingPerceptronTrainer:
    """Continuous averaged-perceptron training with durable weights."""

    spark: SparkSession
    weights_path: str                # directory holding weights.json
    dim: int = C.DEFAULT_DIM
    threshold: float = 0.75
    min_tokens: int = 50
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_perceptron"
    batches_seen: list[int] = field(default_factory=list)

    # -- durable state ----------------------------------------------------
    def _state_file(self) -> str:
        return os.path.join(self.weights_path, "weights.json")

    def _read_state(self) -> dict:
        try:
            with open(self._state_file()) as f:
                s = json.load(f)
            if len(s["w"]) != self.dim + 1:
                raise ValueError(
                    f"stored weights have dim {len(s['w']) - 1}, "
                    f"trainer configured dim {self.dim}"
                )
            return s
        except FileNotFoundError:
            return {
                "epoch": -1,
                "w": [0] * (self.dim + 1),
                "avg": [0] * (self.dim + 1),
                "n_updates": 0,
            }

    def _write_state(self, state: dict) -> None:
        os.makedirs(self.weights_path, exist_ok=True)
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_file())  # atomic publish

    def weights(self) -> list[int]:
        """The current AVERAGED model (the vector to serve — feed it to
        StreamingCurator.classifier_weights or score_quality_perceptron)."""
        return list(self._read_state()["avg"])

    # -- per-batch update -------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """One online update. Idempotent under replay: an epoch at or
        below the last applied one is skipped, so crash-replays converge
        instead of double-applying."""
        self.batches_seen.append(epoch_id)
        state = self._read_state()
        if epoch_id <= state["epoch"]:
            return  # replayed batch: update already folded in
        if batch_df.isEmpty():
            # advance the cursor WITHOUT counting an update: an idle
            # trigger must not dilute the average (sum of w snapshots)
            state["epoch"] = epoch_id
            self._write_state(state)
            return
        w = state["w"]
        feats = C.hashed_bigram_features(
            batch_df.select("doc_id", "text"),
            dim=self.dim,
            threshold=self.threshold,
            min_tokens=self.min_tokens,
        ).localCheckpoint(eager=True)  # one scan feeds margins AND update
        mis = (
            feats.groupBy("doc_id", "y")
            .agg(C._margin_col(w).alias("margin"))
            .filter(F.col("y") * F.col("margin") <= 0)
            .select("doc_id")
        )
        upd = (
            feats.join(mis, "doc_id", "left_semi")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).cast("bigint").alias("u"))
            .collect()
        )
        for r in upd:
            w[r["bucket"]] += int(r["u"])
        avg = state["avg"]
        for i in range(self.dim + 1):
            avg[i] += w[i]
        self._write_state(
            {
                "epoch": epoch_id,
                "w": w,
                "avg": avg,
                "n_updates": state["n_updates"] + 1,
            }
        )

    # -- runner -----------------------------------------------------------
    def start(self, doc_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            # same stance as StreamingCurator.start: the epoch-cursor
            # replay guard is only sound when Spark's batch numbering
            # survives restarts
            raise ValueError(
                "StreamingPerceptronTrainer.start() requires "
                "checkpoint_dir: the epoch-cursor replay guard is only "
                "sound when batch numbering survives restarts"
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
