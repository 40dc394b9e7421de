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
import warnings

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.operators import cdc
from db_integration_via_kafka_ksql_spark.streaming import swapdir

# key-cast safety: a batch key may be CAST UP to the stored type within
# its numeric family (int batch -> long state is lossless); the reverse
# is a silent wrap (long 2^33 -> int collides with 2^33-2^32) and is a
# schema change the store refuses (COVERAGE.md S5: type changes stay
# hard errors)
_INT_WIDTH = {"byte": 1, "short": 2, "integer": 3, "long": 4}
_FLOAT_WIDTH = {"float": 1, "double": 2}


def _safe_key_upcast(batch_type, state_type) -> bool:
    b, s = batch_type.typeName(), state_type.typeName()
    for family in (_INT_WIDTH, _FLOAT_WIDTH):
        if b in family and s in family:
            return family[b] <= family[s]
    return False


class ParquetStateStore:
    """Keyed latest-state table backed by a parquet directory.

    Crash safety: every publish is the swapdir two-rename swap (stage,
    rename live -> __old_*, rename staged -> live, drop __old_*), and
    every entry point (`exists`/`read`/`lookup`, hence `apply_batch`)
    first runs swapdir recovery — if a crash struck inside the rename
    window and left nothing at `path`, the newest `__old_*` survivor IS
    the last published version and is restored before anything else
    looks at the directory; stale `__old_*` (crash after publish,
    before cleanup) and `__staging_*`/`__next_*` scratch dirs are swept.
    Without the restore, `exists()` would return False after such a
    crash and the next apply_batch would silently reinitialize the
    entire state from one micro-batch.

    Growth rule: per-trigger write volume is |touched buckets| x mean
    bucket size, so a growing state keeps bucket size roughly constant
    by growing n_buckets (`rescale_buckets`, a deliberate full-rewrite
    maintenance job). `apply_batch` emits a RuntimeWarning when the
    mean bucket size exceeds `target_bucket_bytes` so the rescale runs
    before write amplification creeps back up.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        order_cols: list[str],
        deleted_col: str = "__deleted",
        n_buckets: int = 16,
        evolve: bool = False,
        target_bucket_bytes: int = 128 << 20,
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
        self.target_bucket_bytes = target_bucket_bytes
        self._rescale_advised = False

    _BUCKET = "__bucket"

    def _recover(self) -> None:
        """Restore-then-sweep crash recovery (see class docstring);
        idempotent and O(listdir parent) when there is nothing to do."""
        swapdir.recover(self.path, extra_prefixes=("__next_",))

    def exists(self) -> bool:
        self._recover()
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def read(self) -> DataFrame:
        """Pull-query surface: the current materialized state (the
        physical bucket column stays internal)."""
        self._recover()
        return self.spark.read.parquet(self.path).drop(self._BUCKET)

    def _bucket_of(self, *key_exprs) -> Column:
        return F.pmod(F.hash(*key_exprs), F.lit(self.n_buckets))

    def lookup(self, **key_values) -> DataFrame:
        """Keyed point lookup that opens 1/n_buckets of the state.

        The state directory is hive-partitioned by key-hash bucket, and
        the lookup filters on ``__bucket == pmod(hash(<literal key>), n)``
        — Catalyst constant-folds the hash of literals, so the predicate
        becomes a PartitionFilter and every other bucket directory is
        skipped without opening a file (plan-asserted in
        tests/test_streaming.py). This is the ksqlDB pull-query path
        (`SELECT * FROM table WHERE key = ...`), which RocksDB serves
        from its own key index; columnar state earns the same sublinear
        read via directory pruning. n_buckets is part of the store's
        on-disk identity — change it only with a rebuild."""
        missing = [k for k in self.key_cols if k not in key_values]
        if missing:
            raise ValueError(f"lookup requires all key cols; missing {missing}")
        self._recover()
        df = self.spark.read.parquet(self.path)
        # murmur3 is TYPE-sensitive: hash(42 as int) != hash(42 as long),
        # so each literal must probe as exactly the stored column's type
        types = {f.name: f.dataType for f in df.schema.fields}
        lits = {
            k: F.lit(key_values[k]).cast(types[k]) for k in self.key_cols
        }
        cond = F.col(self._BUCKET) == self._bucket_of(
            *[lits[k] for k in self.key_cols]
        )
        for k in self.key_cols:
            cond = cond & (F.col(k) == lits[k])
        return df.filter(cond).drop(self._BUCKET)

    @staticmethod
    def _carry(src: str, dst: str) -> None:
        """Carry an untouched file into the next state version: hard link
        (O(1) bytes) where the filesystem supports it, byte copy where it
        doesn't (object-store-backed mounts) — still correct, just loses
        the O(1) carry-over."""
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)

    def _swap_buckets(self, merged: DataFrame, touched: list[int]) -> None:
        """Publish a new state version that differs from the current one
        only in ``touched`` bucket dirs, writing O(touched) bytes.

        The merged frame (which must contain only rows hashing into
        ``touched``) is written partitioned-by-bucket to a staging dir;
        a next-version top dir is then assembled from hard links to the
        untouched bucket files (O(1) bytes each) plus the freshly staged
        touched dirs, and published with the same two-rename swap as
        `_write_atomic` — readers still only ever see a complete state
        version. A touched bucket whose keys were all deleted simply has
        no staged dir and is dropped from the next version."""
        with_bucket = merged.withColumn(
            self._BUCKET, self._bucket_of(*[F.col(c) for c in self.key_cols])
        )
        staging = f"{self.path}__staging_{uuid.uuid4().hex[:8]}"
        with_bucket.repartition(
            max(len(touched), 1), F.col(self._BUCKET)
        ).write.mode("overwrite").partitionBy(self._BUCKET).parquet(staging)
        tmp = f"{self.path}__next_{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        touched_dirs = {f"{self._BUCKET}={b}" for b in touched}
        for entry in os.listdir(self.path):
            src = os.path.join(self.path, entry)
            if entry in touched_dirs:
                continue  # superseded by the staged version (or emptied)
            if os.path.isdir(src):
                dst = os.path.join(tmp, entry)
                os.makedirs(dst)
                for name in os.listdir(src):
                    self._carry(os.path.join(src, name), os.path.join(dst, name))
            else:
                self._carry(src, os.path.join(tmp, entry))  # _SUCCESS etc.
        staged_any = False
        for entry in os.listdir(staging):
            if entry.startswith(f"{self._BUCKET}="):
                os.rename(os.path.join(staging, entry), os.path.join(tmp, entry))
                staged_any = True
        shutil.rmtree(staging)
        has_data = staged_any or any(
            e.startswith(f"{self._BUCKET}=") for e in os.listdir(tmp)
        )
        if not has_data:
            # every bucket emptied: a partition-dir-less tree would lose
            # its schema — fall back to the flat empty-write path
            shutil.rmtree(tmp)
            self._write_atomic(merged)
            return
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)

    def _write_atomic(self, df: DataFrame) -> None:
        tmp = f"{self.path}__staging_{uuid.uuid4().hex[:8]}"
        # one directory per key-hash bucket (a 100M-key state splits into
        # n_buckets prunable pieces); repartition on the bucket puts each
        # in one task -> one file per bucket dir
        with_bucket = df.withColumn(
            self._BUCKET, self._bucket_of(*[F.col(c) for c in self.key_cols])
        )
        if with_bucket.isEmpty():
            # zero rows under partitionBy writes NO parquet files and the
            # directory loses its schema; a flat empty write keeps the
            # footer (bucket rides as an ordinary — empty — column)
            with_bucket.coalesce(1).write.mode("overwrite").parquet(tmp)
        else:
            with_bucket.repartition(
                self.n_buckets, F.col(self._BUCKET)
            ).write.mode("overwrite").partitionBy(self._BUCKET).parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    def apply_batch(self, changelog_batch: DataFrame) -> None:
        """Merge one (possibly multi-version-per-key) changelog batch:
        compact the batch, then upsert/delete against current state —
        ST1 semantics; idempotent for replays of the same batch.

        Incremental at scale: only the bucket dirs the batch's keys hash
        into are read, merged, and rewritten (`_swap_buckets`); untouched
        bucket files carry over as hard links, byte-identical. Per-trigger
        cost is O(|touched buckets|), not O(|state|) — at the reference's
        100M-key regime (TOMBSTONE_HANDLING_GUIDE.md:96-101,315-326) a
        3k-row micro-batch rewrites at most 3k/100M of the state, where a
        full rewrite would move 100-200 GB every 2 s trigger. The touched
        bucket-id collect is bounded by n_buckets (ints, not keys). A
        batch that widens the schema (evolve=True additive DDL, or a type
        promotion through the union) must retouch every file footer, so
        those rare batches fall back to the full rewrite."""
        compacted = cdc.compact_latest(
            changelog_batch, key_cols=self.key_cols, order_cols=self.order_cols
        )
        if not self.exists():
            merged = cdc.soft_delete_filter(compacted, deleted_col=self.deleted_col)
            self._write_atomic(merged.localCheckpoint())
            return
        state_df = self.spark.read.parquet(self.path)
        state_types = {
            f.name: f.dataType
            for f in state_df.schema.fields
            if f.name != self._BUCKET
        }
        # murmur3 is TYPE-sensitive (hash(42 int) != hash(42 long)), so a
        # batch whose key arrived narrower than the stored column would
        # compute the WRONG touched-bucket set and miss the state row's
        # bucket entirely — cast batch keys UP to the stored key types
        # (the same rule `lookup` applies to its literals). The opposite
        # direction — batch key WIDER than stored — is refused: casting
        # down silently wraps overflowing key values into the wrong
        # key/bucket; a widened key is a schema change and needs a
        # rebuild (the store's type-change stance, COVERAGE.md S5).
        batch_types = {f.name: f.dataType for f in compacted.schema.fields}
        for k in self.key_cols:
            if k in state_types and batch_types[k] != state_types[k]:
                if not _safe_key_upcast(batch_types[k], state_types[k]):
                    raise ValueError(
                        f"apply_batch: key column {k!r} arrived as "
                        f"{batch_types[k].simpleString()} but the state "
                        f"stores {state_types[k].simpleString()}; a "
                        "widening/type-changing key is a schema change — "
                        "rebuild the store instead of merging"
                    )
                compacted = compacted.withColumn(
                    k, F.col(k).cast(state_types[k])
                )
        if not self._has_bucket_dirs():
            # a delete-all left the state as one flat empty file (no
            # __bucket= partition dirs — see _write_atomic's empty-write
            # branch); _swap_buckets would hard-link that root data file
            # into every future version next to real partition dirs,
            # breaking the hive-partitioned layout contract forever —
            # full rewrite restores the partitioned layout
            merged = cdc.apply_changelog(
                self.read(),
                compacted,
                key_cols=self.key_cols,
                order_cols=self.order_cols,
                deleted_col=self.deleted_col,
                evolve=self.evolve,
            )
            self._write_atomic(merged.localCheckpoint())
            return
        # bounded collect: <= n_buckets distinct small ints
        touched = sorted(
            r[0]
            for r in compacted.select(
                self._bucket_of(*[F.col(c) for c in self.key_cols]).alias("b")
            )
            .distinct()
            .collect()
        )
        if not touched:
            return  # empty batch: state version unchanged
        if self.evolve and not set(compacted.columns) <= set(state_types):
            # additive schema change: every existing file needs the new
            # column in its footer — full rewrite (rare: one DDL event)
            merged = cdc.apply_changelog(
                self.read(),
                compacted,
                key_cols=self.key_cols,
                order_cols=self.order_cols,
                deleted_col=self.deleted_col,
                evolve=True,
            )
            self._write_atomic(merged.localCheckpoint())
            return
        affected = state_df.filter(
            F.col(self._BUCKET).isin([int(b) for b in touched])
        ).drop(self._BUCKET)
        merged = cdc.apply_changelog(
            affected,
            compacted,
            key_cols=self.key_cols,
            order_cols=self.order_cols,
            deleted_col=self.deleted_col,
            evolve=self.evolve,
        )
        merged_types = {f.name: f.dataType for f in merged.schema.fields}
        if merged_types != state_types:
            # the union widened a type: mixed footers across bucket files
            # would make reads schema-ambiguous — full rewrite
            merged = cdc.apply_changelog(
                self.read(),
                compacted,
                key_cols=self.key_cols,
                order_cols=self.order_cols,
                deleted_col=self.deleted_col,
                evolve=self.evolve,
            )
            self._write_atomic(merged.localCheckpoint())
            return
        self._swap_buckets(merged, touched)
        self._advise_rescale()

    def _has_bucket_dirs(self) -> bool:
        return any(
            e.startswith(f"{self._BUCKET}=") for e in os.listdir(self.path)
        )

    def mean_bucket_bytes(self) -> int:
        """Mean on-disk bytes per bucket dir (local stat walk, no Spark
        job) — the quantity the growth rule holds constant."""
        total = 0
        for root, _dirs, files in os.walk(self.path):
            for name in files:
                if name.endswith(".parquet"):
                    total += os.stat(os.path.join(root, name)).st_size
        return total // max(self.n_buckets, 1)

    def _advise_rescale(self) -> None:
        """Warn (once per instance) when mean bucket size exceeds the
        target: per-trigger write volume is |touched| x bucket size, so
        oversized buckets silently re-grow the write amplification the
        incremental apply_batch exists to avoid. The operator responds
        with `rescale_buckets(recommended_buckets())` in a maintenance
        window."""
        if self._rescale_advised:
            return
        mean = self.mean_bucket_bytes()
        if mean > self.target_bucket_bytes:
            self._rescale_advised = True
            warnings.warn(
                f"ParquetStateStore at {self.path}: mean bucket size "
                f"{mean} bytes exceeds target {self.target_bucket_bytes}; "
                f"schedule rescale_buckets({self.recommended_buckets()}) "
                "to keep per-trigger write volume bounded",
                RuntimeWarning,
                stacklevel=3,
            )

    def recommended_buckets(self) -> int:
        """Smallest power-of-two bucket count that brings the mean
        bucket back under target (power of two keeps pmod rebucketing
        splits even)."""
        n = self.n_buckets
        total = self.mean_bucket_bytes() * max(self.n_buckets, 1)
        while total > n * self.target_bucket_bytes:
            n *= 2
        return n

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

    def rescale_buckets(self, new_n_buckets: int) -> None:
        """Maintenance rebuild to a new bucket count — the operational
        knob behind the incremental apply_batch: per-trigger write volume
        is |touched buckets| x bucket size, so a growing state keeps its
        buckets at a constant target size by rescaling (the deployment
        rule the bench's state_write_amplification section demonstrates:
        100k keys / 64 buckets and 1m / 640 write the same bytes per
        trigger). n_buckets is part of the on-disk identity (lookup
        constant-folds pmod(hash, n)), so this is BY DESIGN a full
        rewrite — one range of maintenance downtime per decade of
        growth, published with the same atomic swap as every write.
        Safe against a crash at any point: the old layout stays live
        until the single publish rename."""
        if new_n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {new_n_buckets}")
        if not self.exists():
            self.n_buckets = new_n_buckets
            return
        current = self.read().localCheckpoint()
        self.n_buckets = new_n_buckets
        self._write_atomic(current)

    def destroy(self) -> None:
        # restore-then-remove: sweeping orphans FIRST means a stranded
        # __old_* can't resurrect a destroyed store at the next recover
        self._recover()
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
