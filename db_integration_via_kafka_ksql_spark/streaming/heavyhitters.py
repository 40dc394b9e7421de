"""Streaming Misra-Gries heavy hitters: continuous frequent-item
tracking in k counters of state, whatever the stream's cardinality.

The bounded-state twin of operators/sketches.heavy_hitters_exact, and
the sketch family's frequent-ITEMS member (HLL counts distinct, CMS
estimates a GIVEN item, the log-histogram ranks values — none can NAME
the frequent items without a corpus-sized state; MG does, in k
counters, deterministically — no hashing, no randomness).

Per epoch (the mergeable-summaries discipline, Agarwal et al. PODS'12):

1. the batch's exact counts are reduced DISTRIBUTED to an MG summary:
   d = the (k+1)-th largest batch count (0 if fewer distinct items),
   keep ``cnt - d`` for items with cnt > d — at most k counters cross
   the driver (a (k+1)-row TakeOrdered collect, never the dictionary);
2. the summary merges into the k-counter state by addition, then the
   same prune: subtract the (k+1)-th largest combined value, keep
   positives — still <= k counters;
3. epoch cursor + atomic json rename make the additive state
   exactly-once under replay (the histsketch.py discipline).

Guarantees carried through arbitrary merges (tested per epoch against
the exact prefix): every estimate UNDERCOUNTS (est <= true), the
undercount is at most (n_total - sum_counters)/(k+1) <= n_total/(k+1),
and therefore every item whose true prefix count exceeds
n_total/(k+1) is present in the counters — the MG support guarantee.

State: k (item, cnt) pairs + two longs — bytes, not gigabytes, at any
corpus size; the footprint argument for a sketch over exact counts at
100 TB (the exact dictionary is itself corpus-sized for web text).

Reference parity: none (the reference's aggregates are exact COUNT
tables, deploy-ksql-cli.sh) — monitoring-surface extension, same
stance as the HLL/histogram streams.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


@dataclass
class StreamingHeavyHitters:
    """Continuous k-counter Misra-Gries frequent-item state."""

    spark: SparkSession
    state_path: str           # directory holding counters.json
    item_col: str = "item"
    k: int = 20
    # weight_col generalizes to WEIGHTED heavy hitters (Agarwal et al.
    # PODS'12 §3 — a weight-w arrival is w collapsed unit arrivals, so
    # every MG bound carries over with n_total = total weight): e.g.
    # which sources dominate a TOKEN budget rather than a row count.
    # Weights must be non-negative integers (the exactness convention),
    # mirroring operators/sketches.heavy_hitters_exact.
    weight_col: str | None = None
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "streaming_heavy_hitters"
    batches_seen: list[int] = field(default_factory=list)

    # -- durable state ----------------------------------------------------
    def _state_file(self) -> str:
        return os.path.join(self.state_path, "counters.json")

    def _read_state(self) -> dict:
        try:
            with open(self._state_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"epoch": -1, "n_total": 0, "counters": {}}

    def _write_state(self, state: dict) -> None:
        os.makedirs(self.state_path, exist_ok=True)
        tmp = self._state_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_file())  # atomic publish

    # -- views over the state ----------------------------------------------
    def counters(self) -> DataFrame:
        """Current MG counters as (item, est_cnt, n_total, max_undercount):
        true count is in [est_cnt, est_cnt + max_undercount]."""
        state = self._read_state()
        bound = self.error_bound()
        rows = [
            (i, int(c), int(state["n_total"]), bound)
            for i, c in state["counters"].items()
        ]
        return self.spark.createDataFrame(
            rows, "item string, est_cnt long, n_total long, max_undercount long"
        )

    def error_bound(self) -> int:
        """(n_total - sum of counters) / (k+1): the worst-case undercount
        of ANY item's estimate (items absent from the counters estimate 0
        and are bounded by the same quantity)."""
        state = self._read_state()
        spent = sum(int(c) for c in state["counters"].values())
        return (int(state["n_total"]) - spent) // (self.k + 1)

    def guaranteed_heavy(self) -> DataFrame:
        """Counters PROVEN to exceed the n/(k+1) support threshold even
        under maximal undercount: est_cnt * (k+1) > n_total never
        false-positives on the MG support question."""
        return self.counters().filter(
            F.col("est_cnt") * (self.k + 1) > F.col("n_total")
        )

    # -- per-batch update ---------------------------------------------------
    @staticmethod
    def _prune(counters: dict[str, int], k: int) -> dict[str, int]:
        """Subtract the (k+1)-th largest value, keep positives (<= k
        counters survive). Deterministic: value ties need no break —
        every tied counter lands on the same side of the strict >."""
        if len(counters) <= k:
            return counters
        d = sorted(counters.values(), reverse=True)[k]
        return {i: c - d for i, c in counters.items() if c > d}

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen.append(epoch_id)
        state = self._read_state()
        if epoch_id <= state["epoch"]:
            return  # replay of an applied epoch: counts already merged
        if not batch_df.isEmpty():
            # the item is grouped AS STRING: state keys round-trip
            # through json (which stringifies every dict key), so a
            # numeric item column would otherwise split its count
            # between the native-typed batch key (int 1) and the
            # reloaded string key ('1') — and json.dump would then emit
            # duplicate '1' keys whose last-wins reload DROPS counts,
            # breaking the est<=true undercount bound
            if self.weight_col is None:
                measure = F.count(F.lit(1))
                bad = F.lit(0)
            else:
                # fail fast on NULL/negative weights (mirrors
                # operators/sketches.heavy_hitters_exact): a NULL makes a
                # group's sum NULL (TypeError downstream / group silently
                # vanishing), a negative silently breaks the est<=true
                # MG undercount bound — neither may reach the state.
                w = F.col(self.weight_col)
                measure = F.sum(w)
                bad = F.max(
                    F.when(w.isNull() | (w < 0), F.lit(1)).otherwise(F.lit(0))
                )
            counts = batch_df.groupBy(
                F.col(self.item_col).cast("string").alias("item")
            ).agg(measure.cast("bigint").alias("cnt"), bad.alias("bad"))
            counts = counts.localCheckpoint(eager=True)  # total + top share it
            tot = counts.agg(
                F.sum("cnt").alias("n"), F.max("bad").alias("bad")
            ).collect()[0]
            if tot["bad"]:
                raise ValueError(
                    f"StreamingHeavyHitters: weight column "
                    f"{self.weight_col!r} contains NULL or negative values "
                    "— weights must be non-negative integers (the MG "
                    "est<=true bound does not survive either)"
                )
            n_batch = tot["n"] or 0
            # bounded collect: k+1 rows, never the batch dictionary
            top = counts.orderBy(
                F.col("cnt").desc(), F.col("item").asc()
            ).limit(self.k + 1).collect()
            d = int(top[self.k]["cnt"]) if len(top) > self.k else 0
            batch_summary = {
                r["item"]: int(r["cnt"]) - d for r in top if int(r["cnt"]) > d
            }
            merged = dict(state["counters"])
            for item, c in batch_summary.items():
                merged[item] = merged.get(item, 0) + c
            state["counters"] = self._prune(merged, self.k)
            state["n_total"] = int(state["n_total"]) + int(n_batch)
        state["epoch"] = epoch_id
        self._write_state(state)

    # -- runner --------------------------------------------------------------
    def start(self, item_stream: DataFrame) -> StreamingQuery:
        if not self.checkpoint_dir:
            raise ValueError(
                "StreamingHeavyHitters.start() requires checkpoint_dir: the "
                "additive state is only exactly-once when batch numbering "
                "survives restarts"
            )
        writer = (
            item_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()
