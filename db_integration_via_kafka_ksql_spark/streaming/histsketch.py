"""Streaming log-bucketed quantile histogram: continuous per-group value
quantiles over a stream.

The streaming twin of operators/sketches.loghist_sketch — and the reason
that sketch exists at all: bucket geometry is fixed A PRIORI (powers of
gamma over a fixed-point prescale), so unlike the equi-width histogram
(whose bounds pass needs the whole dataset) the state merges by plain
count ADDITION. Additive state is NOT idempotent, so exactly-once comes
from the last-applied-epoch cursor (the hll.py discipline; hll's
max-merge happened to be idempotent, counts are not — the cursor, not
blind remerge, is what makes crash replays no-ops).

State is one json of {group: {bucket: cnt}} published by atomic rename
with the epoch cursor — bounded by groups x O(log(range)/log(gamma))
integers regardless of how many billions of values flow through, THE
footprint argument for running a sketch instead of exact per-group
percentile state at 100 TB. `quantiles()` replays the batch operator's
integer coverage probe over the state, so the streaming answer after
epoch e equals the batch sketch over everything that ever arrived (the
prefix contract, asserted in tests).

Reference parity: the reference's continuous aggregates are exact
COUNT/latest tables (deploy-ksql-cli.sh); the quantile sketch is the
monitoring-surface extension.
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
class StreamingHistogram:
    """Continuous per-group log-bucket histogram with durable counts."""

    spark: SparkSession
    state_path: str           # directory holding buckets.json
    group_col: str = "event_type"
    value_col: str = "value"
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_histogram"
    batches_seen: list[int] = field(default_factory=list)

    # -- durable state ----------------------------------------------------
    def _state_file(self) -> str:
        return os.path.join(self.state_path, "buckets.json")

    def _read_state(self) -> dict:
        try:
            with open(self._state_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"epoch": -1, "counts": {}}

    def _write_state(self, state: dict) -> None:
        os.makedirs(self.state_path, exist_ok=True)
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_file())  # atomic publish

    # -- views over the state ----------------------------------------------
    def buckets(self) -> DataFrame:
        """The accumulated histogram as a (group, bucket, cnt) frame."""
        state = self._read_state()
        rows = [
            (g, int(b), int(n))
            for g, bs in state["counts"].items()
            for b, n in bs.items()
        ]
        return self.spark.createDataFrame(
            rows, f"{self.group_col} string, bucket long, cnt long"
        )

    def quantiles(
        self, quantiles_permille: tuple[int, ...] = (500, 900, 990)
    ) -> DataFrame:
        """Quantile probe over the current state — identical integer math
        to the batch operator (same oracle-gated coverage picker)."""
        return SK.loghist_quantiles(
            self.buckets(), [self.group_col], quantiles_permille
        )

    # -- per-batch update ---------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        state = self._read_state()
        if epoch_id <= state["epoch"]:
            return  # replay of an applied epoch: counts already added
        if not batch_df.isEmpty():
            batch_buckets = SK.loghist_sketch(
                batch_df, [self.group_col], self.value_col
            ).collect()  # bounded: sketch-sized (groups x log-range buckets)
            counts = state["counts"]
            for r in batch_buckets:
                g = counts.setdefault(str(r[self.group_col]), {})
                b = str(r["bucket"])
                g[b] = g.get(b, 0) + int(r["cnt"])
        state["epoch"] = epoch_id
        self._write_state(state)

    # -- runner --------------------------------------------------------------
    def start(self, event_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingHistogram.start() requires checkpoint_dir: the "
                "additive state is only exactly-once when batch numbering "
                "survives restarts"
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
