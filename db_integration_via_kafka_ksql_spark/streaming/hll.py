"""Streaming HyperLogLog: continuous distinct-count state over a stream.

The streaming twin of operators/sketches.py's HLL: each micro-batch's
register frame (<= 2^p rows per group, computed distributed) merges into
a durable per-group register table by per-bucket max. Two properties do
all the exactly-once work:

- the merge is LOSSLESS (registers of a union == max-merge of the parts,
  proven in tests/test_sketches.py), so the state after epoch e equals
  the batch registers over everything that ever arrived — the same
  prefix contract as streaming/substrdedup.py, asserted per epoch in
  tests; and
- the merge is IDEMPOTENT (max(a, a) == a), so a crash-replayed batch
  merging into already-updated state changes nothing — no committed-
  partition guard is even needed, only the epoch cursor that keeps the
  `batches_seen` bookkeeping honest.

State is one json of {group: {bucket: rho}} published by atomic rename
with the last-applied-epoch cursor (the trainer/kmeans discipline for
MODEL-sized state): bounded by groups x 2^p integers no matter how many
billions of events flow through — THE reason to run a sketch instead of
streaming COUNT(DISTINCT) state at 100 TB.

Reference parity: the reference's continuous aggregates are exact
COUNT/latest-value tables (reference: deploy-ksql-cli.sh); the sketch
state is the extension for unbounded-cardinality distinct counts.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import sketches as SK


@dataclass
class StreamingHll:
    """Continuous per-group distinct-count sketch with durable registers."""

    spark: SparkSession
    state_path: str          # directory holding registers.json
    group_col: str = "event_type"
    value_col: str = "user_id"
    p: int = 10
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_hll"
    batches_seen: list[int] = field(default_factory=list)

    # -- durable state ----------------------------------------------------
    def _state_file(self) -> str:
        return os.path.join(self.state_path, "registers.json")

    def _read_state(self) -> dict:
        try:
            with open(self._state_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"epoch": -1, "registers": {}}

    def _write_state(self, state: dict) -> None:
        os.makedirs(self.state_path, exist_ok=True)
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_file())  # atomic publish

    # -- views over the state ----------------------------------------------
    def registers(self) -> DataFrame:
        """The merged register state as a (group, bucket, rho) frame."""
        state = self._read_state()
        rows = [
            (g, int(b), int(r))
            for g, regs in state["registers"].items()
            for b, r in regs.items()
        ]
        return self.spark.createDataFrame(
            rows, f"{self.group_col} string, bucket long, rho int"
        )

    def estimates(self) -> DataFrame:
        """Cardinality estimates from the current state — identical math
        to the batch operator (same oracle-gated estimate path)."""
        return SK.hll_estimate(self.registers(), [self.group_col], p=self.p)

    # -- per-batch update ---------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        state = self._read_state()
        if epoch_id <= state["epoch"]:
            return  # replay of a fully-applied epoch: merge already in
        if not batch_df.isEmpty():
            batch_regs = SK.hll_registers(
                batch_df, [self.group_col], F.col(self.value_col), p=self.p
            ).collect()  # bounded: <= groups x 2^p rows (sketch-sized)
            regs = state["registers"]
            for r in batch_regs:
                g = regs.setdefault(str(r[self.group_col]), {})
                b = str(r["bucket"])
                if r["rho"] > g.get(b, 0):
                    g[b] = r["rho"]
        state["epoch"] = epoch_id
        self._write_state(state)

    # -- runner --------------------------------------------------------------
    def start(self, event_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingHll.start() requires checkpoint_dir: the epoch "
                "cursor is only sound when batch numbering survives restarts"
            )
        writer = (
            event_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
