"""Streaming join-cardinality tracker: continuous CMS grids over two
keyed changelog streams, answering "how big is L JOIN R right now"
every epoch without ever running the join.

The streaming twin of operators/sketches.cms_join_size — and the same
reason the loghist stream exists: the grid geometry (depth x width,
md5-derived bucket hash) is fixed A PRIORI, so per-batch grids merge
into the state by plain count ADDITION. Additive state is not
idempotent, so exactly-once rides the last-applied-epoch cursor + one
atomic json rename (the histsketch.py discipline). State is two
depth*width integer grids — bytes, at any stream volume; the exact
answer would need both full key multisets.

Feed: one union-tagged stream — each row carries ``side_col`` ('left' /
'right') and ``key_col`` (the CdcPipeline/StreamingAsof tagging
pattern, so one foreachBatch owns both grids and the estimate is
consistent at every epoch boundary). Keys are grouped AS STRINGS before
hashing: grid json keys and the batch operator's string-cast keys must
agree (the MG heavy-hitters round-trip lesson).

Prefix contract (tested): after epoch e, ``estimate()`` equals the
batch cms_join_size over every left/right row that ever arrived — same
depth/width, same integer algebra.

Reference parity: none (the reference's continuous aggregates are exact
COUNT tables, deploy-ksql-cli.sh) — planner/monitoring-surface
extension, same stance as the HLL/histogram/heavy-hitter streams:
at the reference's 100M-row regime this is the live gate deciding
whether a downstream join stays broadcast-able.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from db_integration_via_kafka_ksql_spark.operators import sketches as SK

_SIDES = ("left", "right")


@dataclass
class StreamingJoinSize:
    """Continuous two-grid CMS join-size estimate with durable counts."""

    spark: SparkSession
    state_path: str           # directory holding grids.json
    side_col: str = "side"
    key_col: str = "k"
    depth: int = 4
    width: int = 1024
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_join_size"
    batches_seen: list[int] = field(default_factory=list)

    # -- durable state ----------------------------------------------------
    def _state_file(self) -> str:
        return os.path.join(self.state_path, "grids.json")

    def _read_state(self) -> dict:
        try:
            with open(self._state_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"epoch": -1, "grids": {s: {} for s in _SIDES}}

    def _write_state(self, state: dict) -> None:
        os.makedirs(self.state_path, exist_ok=True)
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_file())  # atomic publish

    # -- views over the state ----------------------------------------------
    def estimate(self) -> int:
        """min over hash rows of the grid inner product — identical
        integer algebra to the batch operator (a hash row with no
        colliding buckets zeroes the whole estimate; see
        sketches.cms_join_size)."""
        grids = self._read_state()["grids"]
        left, right = grids["left"], grids["right"]
        best = None
        for i in range(self.depth):
            prefix = f"{i}:"
            s = sum(
                cnt * right.get(key, 0)
                for key, cnt in left.items()
                if key.startswith(prefix)
            )
            best = s if best is None else min(best, s)
        return int(best or 0)

    def grid_sizes(self) -> dict:
        """Occupied-cell counts per side (monitoring: bounded by
        depth*width however much data has flowed)."""
        grids = self._read_state()["grids"]
        return {s: len(grids[s]) for s in _SIDES}

    # -- per-batch update ---------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        state = self._read_state()
        if epoch_id <= state["epoch"]:
            return  # replay of an applied epoch: counts already added
        if not batch_df.isEmpty():
            for side in _SIDES:
                rows = SK.cms_build(
                    batch_df.filter(F.col(self.side_col) == side),
                    F.col(self.key_col).cast("string"),
                    depth=self.depth,
                    width=self.width,
                ).collect()  # bounded: <= depth*width grid cells
                grid = state["grids"][side]
                for r in rows:
                    key = f"{int(r['i'])}:{int(r['bucket'])}"
                    grid[key] = grid.get(key, 0) + int(r["cnt"])
        state["epoch"] = epoch_id
        self._write_state(state)

    # -- runner --------------------------------------------------------------
    def start(self, tagged_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingJoinSize.start() requires checkpoint_dir: the "
                "additive state is only exactly-once when batch numbering "
                "survives restarts"
            )
        writer = (
            tagged_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
