"""Atomic, NAME-STABLE per-epoch partition commits — the composition-safe
handoff between chained streaming stages.

Round-6 state of the world: every foreachBatch stage wrote its epoch's
rows with dynamic partition overwrite. Each stage alone was
replay-idempotent, but the COMPOSITION (e.g. curator → packer, where the
upstream dataset is simultaneously the downstream's file-stream source)
was at-least-once across one crash window: a stage that died between its
dataset write and its state update would, on replay, rewrite the same
partition with FRESH part-file names — and a file-name-tracking
downstream source re-ingested those rows as new.

The fix is to make the partition itself the commit record:

1. the epoch's rows are written to a STAGING sibling
   (`{dataset}__epoch_staging_<uuid>`) with Spark's normal writer — the
   job commits entirely inside staging, so a mid-job crash never touches
   the dataset;
2. one `os.rename` publishes staging as `{dataset}/{batch_col}=<epoch>` —
   the partition appears atomically, files and names final;
3. a replayed epoch finds the partition dir already present and SKIPS the
   write entirely (`commit_epoch` returns False). Part-file names are
   therefore immutable once visible: a downstream file-stream source can
   never observe a second copy of an epoch's rows, closing the
   composition window without any out-of-band manifest — the renamed
   partition dir IS the manifest entry.

Soundness of the skip relies on a two-part contract, ENFORCED at every
caller: a stage's per-epoch output is DETERMINISTIC given its pre-batch
state (pure column math / deterministic hashing, state read-only until
after the write), and epoch ids never repeat across different batches —
Spark's checkpointed batch numbering guarantees the latter, which is why
every stage's `start()` (curator, near-dup, semdedup, packer) REFUSES to
run without a checkpoint_dir: a restarted checkpoint-less query would
renumber from 0 and this module would silently skip the "already
committed" partitions while the stage's state kept advancing — data loss
plus a state that rejects rows the dataset never received.

Crash matrix (stage order: commit_epoch → state update):
- during staging write → orphan staging dir, dataset untouched; swept on
  the next commit, replay restages. Exactly-once.
- between rename and state update → partition visible (downstream may
  ingest it), state stale; replay recomputes the identical rows, SKIPS
  the write (names unchanged — downstream sees nothing new), applies the
  state. Exactly-once end-to-end.
- after state update → replay skips the write and re-applies an
  idempotent (or empty) state batch. Exactly-once.

Filesystem scope: the atomic-publish protocol is implemented with
driver-local `os.rename`/`os.path.isdir`, so dataset paths must live on
a POSIX filesystem reachable from the driver (the repo-wide
ParquetStateStore/swapdir convention — on a cluster that means a shared
mount like NFS). Scheme-qualified URIs (`hdfs://`, `s3a://`, ...) are
REJECTED early rather than failing after the staging write: porting to
an object store needs the same single-rename publish expressed through
that store's committer (HDFS rename / S3 atomic-visibility manifest),
not a silent fallback.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

_STAGING_MARK = "__epoch_staging_"


def _require_local_path(dataset_path: str) -> None:
    """Reject scheme-qualified URIs up front: the publish/skip protocol
    below is driver-local os.rename/isdir, which on `hdfs://`/`s3a://`
    paths would report epoch_committed=False forever and crash after the
    staging write — see the module docstring's filesystem-scope note."""
    if "://" in dataset_path:
        raise ValueError(
            f"epochdir requires a driver-local POSIX path, got URI "
            f"{dataset_path!r}; port the single-rename publish through "
            "that filesystem's own committer instead"
        )


def partition_dir(dataset_path: str, batch_col: str, epoch_id: int) -> str:
    return os.path.join(dataset_path, f"{batch_col}={epoch_id}")


def epoch_committed(dataset_path: str, batch_col: str, epoch_id: int) -> bool:
    """True iff this epoch's partition has been atomically published."""
    _require_local_path(dataset_path)
    return os.path.isdir(partition_dir(dataset_path, batch_col, epoch_id))


def sweep_orphans(dataset_path: str) -> None:
    """Remove staging siblings stranded by a crash mid-write. Inert until
    swept (fresh uuid suffixes, outside the dataset dir), same discipline
    as swapdir._sweep_orphans."""
    parent = os.path.dirname(dataset_path) or "."
    base = os.path.basename(dataset_path)
    if not os.path.isdir(parent):
        return
    for name in os.listdir(parent):
        if name.startswith(f"{base}{_STAGING_MARK}"):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def commit_epoch(
    df: DataFrame,
    dataset_path: str,
    batch_col: str,
    epoch_id: int,
    partition_cols: tuple[str, ...] = (),
) -> bool:
    """Publish `df` (WITHOUT the batch column — it becomes the partition
    dir name) as `{dataset}/{batch_col}={epoch}` via staging + one atomic
    rename. Returns False without touching anything if the partition is
    already committed (a replayed epoch); True after a fresh commit.

    An empty frame still commits (a dir holding only `_SUCCESS`): parquet
    readers ignore file-less partition dirs, and the dir doubles as the
    replay marker so an empty epoch is not recomputed forever."""
    _require_local_path(dataset_path)
    dest = partition_dir(dataset_path, batch_col, epoch_id)
    if os.path.isdir(dest):
        return False
    sweep_orphans(dataset_path)
    os.makedirs(dataset_path, exist_ok=True)
    staging = f"{dataset_path}{_STAGING_MARK}{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    os.rename(staging, dest)
    return True
