"""Materialized TABLE state: latest-value-per-key, external-state design.

The reference's queryable abstraction is the ksqlDB TABLE — RocksDB state
rebuilt by topic replay (TOMBSTONE_HANDLING_GUIDE.md:77-113). We keep the
same "log is the source of truth" stance (SURVEY §7.1) but materialize to
parquet, so pull queries are plain DataFrame reads and rebuild = batch
compaction from offset 0.

Scale: state size ~ unique keys (reference documents 1-2 KB/key). The
parquet state is written partitioned-by-key-hash-bucket so the per-batch
merge (apply_changelog) shuffles only on the key, and a 100M-key state is
split across buckets instead of one file. Atomic swap via staged directory
+ rename keeps readers consistent (micro-batch boundaries are the only
commit points, mirroring ksqlDB's 2s commit interval).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from db_integration_via_kafka_ksql_spark.operators import cdc


class ParquetStateStore:
    """Keyed latest-state table backed by a parquet directory."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        order_cols: list[str],
        deleted_col: str = "__deleted",
        n_buckets: int = 16,
        evolve: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.order_cols = order_cols
        self.deleted_col = deleted_col
        self.n_buckets = n_buckets
        # evolve=True lets a batch carrying NEW columns (upstream ALTER
        # TABLE ADD COLUMN) merge into existing state: old rows read NULL
        # for the added columns (operators/cdc.align_columns)
        self.evolve = evolve

    def exists(self) -> bool:
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def read(self) -> DataFrame:
        """Pull-query surface: the current materialized state."""
        return self.spark.read.parquet(self.path)

    def _write_atomic(self, df: DataFrame) -> None:
        tmp = f"{self.path}__staging_{uuid.uuid4().hex[:8]}"
        df.repartition(self.n_buckets, *self.key_cols).write.mode(
            "overwrite"
        ).parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    def apply_batch(self, changelog_batch: DataFrame) -> None:
        """Merge one (possibly multi-version-per-key) changelog batch:
        compact the batch, then upsert/delete against current state —
        ST1 semantics; idempotent for replays of the same batch."""
        compacted = cdc.compact_latest(
            changelog_batch, key_cols=self.key_cols, order_cols=self.order_cols
        )
        if self.exists():
            merged = cdc.apply_changelog(
                self.read(),
                compacted,
                key_cols=self.key_cols,
                order_cols=self.order_cols,
                deleted_col=self.deleted_col,
                evolve=self.evolve,
            )
        else:
            merged = cdc.soft_delete_filter(compacted, deleted_col=self.deleted_col)
        # localCheckpoint cuts the lineage (and detaches from the old files
        # so the atomic swap can delete them safely)
        self._write_atomic(merged.localCheckpoint())

    def rebuild(self, full_changelog: DataFrame) -> None:
        """State recovery by full replay (ST5): one batch compaction over
        the whole log — the reference's 'reset to offset 0' procedure
        (TOMBSTONE_HANDLING_GUIDE.md:103-113)."""
        state = cdc.soft_delete_filter(
            cdc.compact_latest(
                full_changelog, key_cols=self.key_cols, order_cols=self.order_cols
            ),
            deleted_col=self.deleted_col,
        )
        self._write_atomic(state)

    def prune_below(self, min_order: int, order_col: str | None = None) -> int:
        """Drop state rows whose order column is below `min_order`; returns
        the number of rows dropped. The retention/TTL primitive (the
        log-retention analogue for stores whose rows are EVIDENCE rather
        than authoritative state — e.g. the streaming near-dup witness
        buckets, where pruning trades bounded state size for re-admitting
        duplicates older than the horizon).

        Do NOT call this on a CDC latest-state store: there every live key
        is authoritative regardless of age, and pruning would delete
        current values. Callers own that distinction (see
        StreamingNearDup.expire_witnesses)."""
        if not self.exists():
            return 0
        col = order_col or self.order_cols[0]
        current = self.read()
        kept = current.filter(f"`{col}` >= {int(min_order)}")
        dropped = current.count() - kept.count()
        if dropped:
            self._write_atomic(kept.localCheckpoint())
        return dropped

    def destroy(self) -> None:
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
