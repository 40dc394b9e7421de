"""Incremental aggregate view: per-group COUNT/SUM maintained under a
keyed CDC changelog — the ksqlDB aggregate-TABLE analogue
(`CREATE TABLE agg AS SELECT g, count(*), sum(v) FROM t GROUP BY g`;
the reference's §2.3 surface stops at COUNT(*) over state, this extends
it to the continuous GROUP BY form ksqlDB users run on such topics).

Semantics per micro-batch, with old/new images resolved against the
latest-state row store:

  delta(group) = Σ_new (+1, +v)  −  Σ_old (−1, −v)

where *old* is each touched key's previous live row (looked up in the
row state before the batch is applied) and *new* is the batch's live
compacted row. An UPDATE that moves a key between groups therefore
subtracts from the old group and adds to the new one; a DELETE only
subtracts; groups whose count reaches 0 leave the view.

Cost shape at scale: the per-batch work is bounded by the batch's
touched keys (one semi-join into the bucketed row state + two
group-sized aggregates) plus an outer merge with the aggregate state —
NEVER a recompute over all rows. The aggregate state is one row per
group; the merge is a broadcast-sized join for realistic cardinalities.

MIN/MAX (``minmax_cols``) are NOT invertible — a deleted maximum must
fall back to the runner-up, which subtraction cannot produce. The view
maintains them by the standard differential strategy for
non-invertible aggregates: re-aggregate ONLY the groups the batch
touches, from the touched groups' post-batch rows (state rows of those
groups minus the batch's keys, union the batch's live rows — derived
BEFORE the row store is updated, so replay ordering is unchanged).
Untouched groups keep their stored extremes. Per-batch cost is bounded
by the ROWS OF TOUCHED GROUPS, not the full table — the known lower
bound for exact non-invertible maintenance; a batch touching one key
of a billion-row group re-scans that group only.

Exactly-once across replays: the aggregate swap embeds the epoch id in
the state directory (`_epoch.json`, underscore-prefixed so parquet
readers ignore it) atomically with the data. A replayed epoch is
detected and skipped — the delta is NOT applied twice — while the row
store's own apply remains idempotent (keyed upsert).

SUMs accumulate in DECIMAL(18,4) (one exact add per batch; within-batch
partial sums are decimal too), so results are independent of partition
order and bit-comparable with a recompute.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import cdc
from db_integration_via_kafka_ksql_spark.streaming import swapdir
from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore


@dataclass
class IncrementalAggView:
    """count(*) + sum(value_col) per group_col, maintained incrementally."""

    spark: SparkSession
    path: str                       # aggregate state dir (atomic-swap parquet)
    row_state: ParquetStateStore    # latest-row-per-key store (shared/owned)
    key_cols: Sequence[str]
    group_col: str
    value_col: str
    minmax_cols: Sequence[str] = field(default_factory=tuple)
    deleted_col: str = "__deleted"
    order_cols: Sequence[str] = field(default_factory=lambda: ["offset"])
    checkpoint_dir: str | None = None
    trigger_seconds: float = 2.0
    query_name: str = "aggview"

    # ---------------------------------------------------------------- state
    def exists(self) -> bool:
        return swapdir.dir_exists(self.path)

    def read(self) -> DataFrame:
        """The current view: (group_col, n_rows, sum_value)."""
        return self.spark.read.parquet(self.path)

    def last_epoch(self) -> int | None:
        return swapdir.read_epoch(self.path)

    def _write_atomic(self, df: DataFrame, epoch_id: int) -> None:
        # epoch marker lands inside the staged dir, so data + marker swap
        # in as one rename — see streaming/swapdir.py (shared with the
        # packer)
        swapdir.swap_write(df, self.path, epoch_id)

    # ---------------------------------------------------------------- apply
    def _contrib(self, rows: DataFrame, sign: int) -> DataFrame:
        """(group, ±1 per row, ±value) contributions, decimal-summed."""
        return rows.groupBy(F.col(self.group_col).alias("g")).agg(
            F.sum(F.lit(sign)).cast("bigint").alias("dn"),
            F.sum(
                F.lit(sign) * F.coalesce(F.col(self.value_col), F.lit(0)).cast(
                    "decimal(18,4)"
                )
            ).cast("decimal(18,4)").alias("dv"),
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch hook: update the view, then the row state."""
        if batch_df.isEmpty():
            return
        replay = self.last_epoch() is not None and epoch_id <= self.last_epoch()
        if not replay:
            self._apply_delta(batch_df, epoch_id)
        # row-state apply is a keyed upsert — idempotent either way
        self.row_state.apply_batch(batch_df)

    def _apply_delta(self, batch_df: DataFrame, epoch_id: int) -> None:
        key_cols = list(self.key_cols)
        compacted = cdc.compact_latest(
            batch_df, key_cols=key_cols, order_cols=list(self.order_cols)
        ).localCheckpoint()
        # old images: previous live rows of the touched keys only —
        # a semi-join into the bucketed row store, batch-bounded
        if self.row_state.exists():
            old = self.row_state.read().join(
                compacted.select(*key_cols), key_cols, "left_semi"
            )
        else:
            old = None
        new = cdc.soft_delete_filter(compacted, deleted_col=self.deleted_col)
        delta = self._contrib(new, +1)
        if old is not None:
            delta = delta.unionByName(self._contrib(old, -1))
        delta = delta.groupBy("g").agg(
            F.sum("dn").cast("bigint").alias("dn"),
            F.sum("dv").cast("decimal(18,4)").alias("dv"),
        )
        mm = self._minmax_of_touched(compacted, old, new)
        mm_cols = [
            alias
            for c in self.minmax_cols
            for alias in (f"min_{c}", f"max_{c}")
        ]
        if self.exists():
            cur = self.read().select(
                F.col(self.group_col).alias("g"), "n_rows", "sum_value", *mm_cols
            )
            merged = (
                cur.join(delta, "g", "full_outer")
                .select(
                    F.col("g"),
                    (
                        F.coalesce("n_rows", F.lit(0))
                        + F.coalesce("dn", F.lit(0))
                    ).cast("bigint").alias("n_rows"),
                    (
                        F.coalesce(
                            F.col("sum_value").cast("decimal(18,4)"),
                            F.lit(0).cast("decimal(18,4)"),
                        )
                        + F.coalesce("dv", F.lit(0).cast("decimal(18,4)"))
                    ).cast("decimal(18,4)").alias("sum_value"),
                    *mm_cols,
                )
            )
            if mm is not None:
                # touched groups take the freshly re-aggregated extremes
                # (mm_touched marks presence — NULL-safe, so an all-NULL
                # recomputed min is still taken over the stale stored one);
                # untouched groups keep their stored values
                merged = merged.join(mm, "g", "left_outer").select(
                    "g",
                    "n_rows",
                    "sum_value",
                    *[
                        F.when(
                            F.col("mm_touched"), F.col(f"mm_{alias}")
                        ).otherwise(F.col(alias)).alias(alias)
                        for alias in mm_cols
                    ],
                )
        else:
            merged = delta.select(
                "g",
                F.col("dn").cast("bigint").alias("n_rows"),
                F.col("dv").cast("decimal(18,4)").alias("sum_value"),
            )
            if mm is not None:
                # first batch: every live group is a touched group
                merged = merged.join(mm, "g", "left_outer").select(
                    "g",
                    "n_rows",
                    "sum_value",
                    *[F.col(f"mm_{alias}").alias(alias) for alias in mm_cols],
                )
        merged = (
            merged.filter(F.col("n_rows") > 0)
            .select(
                F.col("g").alias(self.group_col),
                "n_rows",
                F.col("sum_value").cast("decimal(18,4)"),
                *mm_cols,
            )
            .localCheckpoint()
        )
        self._write_atomic(merged, epoch_id)

    def _minmax_of_touched(
        self, compacted: DataFrame, old: DataFrame | None, new: DataFrame
    ) -> DataFrame | None:
        """Re-aggregate min/max for the groups this batch touches, over
        their post-batch rows: (state rows of touched groups − batch
        keys) ∪ (batch's live rows). Runs against the PRE-apply row
        store, so the agg write still precedes the row-state apply and
        replay detection stays correct. Returns None when minmax_cols is
        empty (schema and plan then match the sum/count-only view)."""
        if not self.minmax_cols:
            return None
        key_cols = list(self.key_cols)
        mcols = list(self.minmax_cols)
        touched = new.select(F.col(self.group_col).alias("g"))
        if old is not None:
            touched = touched.unionByName(
                old.select(F.col(self.group_col).alias("g"))
            )
        touched = touched.distinct()
        post = new.select(self.group_col, *mcols)
        if old is not None:  # row store exists
            survivors = (
                self.row_state.read()
                .join(
                    touched.select(F.col("g").alias(self.group_col)),
                    [self.group_col],
                    "left_semi",
                )
                .join(compacted.select(*key_cols), key_cols, "left_anti")
            )
            post = post.unionByName(survivors.select(self.group_col, *mcols))
        return (
            post.groupBy(F.col(self.group_col).alias("g"))
            .agg(
                *[
                    agg
                    for c in mcols
                    for agg in (
                        F.min(c).alias(f"mm_min_{c}"),
                        F.max(c).alias(f"mm_max_{c}"),
                    )
                ]
            )
            .withColumn("mm_touched", F.lit(True))
        )

    def start(self, changelog_stream: DataFrame):
        """Run continuously over a streaming changelog (foreachBatch),
        same lifecycle surface as the other streaming components — usable
        with Engine.deploy."""
        if not self.checkpoint_dir:
            # same restart hazard as StreamingPacker.start: the epoch
            # replay guard needs Spark's batch numbering to survive a
            # restart, or renumbered-from-0 live batches are silently
            # skipped as replays until the old high-water mark passes
            raise ValueError(
                "IncrementalAggView.start() requires checkpoint_dir: the "
                "epoch-based replay guard is only sound when Spark's batch "
                "numbering survives restarts"
            )
        writer = (
            changelog_stream.writeStream.queryName(self.query_name)
            .foreachBatch(self.process_batch)
            .outputMode("update")
        )
        writer = writer.option("checkpointLocation", self.checkpoint_dir)
        if self.trigger_seconds:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()

    # ------------------------------------------------------------- verify
    def recompute(self) -> DataFrame:
        """Full recompute from the row state — the equivalence oracle the
        incremental path must match exactly (tests use this)."""
        live = self.row_state.read()
        return live.groupBy(self.group_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            # coalesce mirrors the incremental contributions (NULL value
            # contributes 0, not SQL-NULL-skipping) so all-NULL groups
            # compare equal too
            F.sum(
                F.coalesce(F.col(self.value_col), F.lit(0)).cast("decimal(18,4)")
            )
            .cast("decimal(18,4)")
            .alias("sum_value"),
            # min/max use plain SQL NULL-skip semantics on both paths
            *[
                agg
                for c in self.minmax_cols
                for agg in (
                    F.min(c).alias(f"min_{c}"),
                    F.max(c).alias(f"max_{c}"),
                )
            ],
        )
