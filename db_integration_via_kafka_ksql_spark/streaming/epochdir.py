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


_COMPACT_INTENT = "_compact_intent.json"
_COMPACT_STAGING = "__compact_staging_"
_COMPACT_TRASH = "__compact_trash_"


def list_epochs(dataset_path: str, batch_col: str) -> list[int]:
    """Committed epoch ids, ascending."""
    _require_local_path(dataset_path)
    if not os.path.isdir(dataset_path):
        return []
    out = []
    for name in os.listdir(dataset_path):
        if name.startswith(f"{batch_col}="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def _epoch_has_data(dataset_path: str, batch_col: str, e: int) -> bool:
    """True iff the epoch partition holds any parquet file ANYWHERE under
    it — a recursive walk, not a top-level listing: epochs committed with
    commit_epoch(partition_cols=...) (e.g. the vector index's list_id /
    q_bucket subpartitions) keep their data in subdirectories and a
    top-level check would misclassify them as data-less, silently
    no-op'ing maintenance on exactly the dirs that grow."""
    d = partition_dir(dataset_path, batch_col, e)
    for _dirpath, _dirnames, filenames in os.walk(d):
        if any(n.endswith(".parquet") for n in filenames):
            return True
    return False


def compact_epochs(spark, dataset_path: str, batch_col: str, upto: int) -> dict:
    """Merge the DATA of every committed epoch <= `upto` into the single
    newest data-bearing partition at or below it, leaving each older epoch as an EMPTY
    committed partition — the epochdir analogue of Kafka log compaction
    (reference: TOMBSTONE_HANDLING_GUIDE.md's compaction story), and the
    small-files maintenance a long-running stream needs: thousands of
    per-trigger partitions become one scan-friendly file set while BOTH
    epochdir contracts survive:

    - replay safety: the old epoch dirs (and their `{batch_col}=e` names)
      remain, so `epoch_committed` still answers True and a checkpoint
      replay of a compacted epoch stays a no-op;
    - reader identity: parquet readers ignore the now-file-less old
      partitions, and the merged partition holds exactly the union of
      the compacted rows (epoch provenance collapses to `upto` — compact
      only datasets whose consumers treat epochs as provenance, e.g.
      fact outputs, NOT latest-before state dirs).

    Maintenance-window contract: run while no reader is scanning the
    dataset (between the staging publish and the old-epoch stripping a
    concurrent reader could double-count). Crash-RESUMABLE, not atomic:
    an intent file records the staged merge; re-running compact_epochs
    (any `upto`) first completes an interrupted one — every step below
    is idempotent.

    Returns {"compacted_epochs": n, "rows": m}.
    """
    import json

    _require_local_path(dataset_path)
    intent_path = os.path.join(dataset_path, _COMPACT_INTENT)

    def _has_data(e: int) -> bool:
        return _epoch_has_data(dataset_path, batch_col, e)

    def _strip(e: int) -> None:
        # drop the data files; keep the dir (the commit marker) and the
        # _SUCCESS convention so the partition still reads as committed
        d = partition_dir(dataset_path, batch_col, e)
        if not os.path.isdir(d):
            return
        for name in os.listdir(d):
            if name != "_SUCCESS":
                p = os.path.join(d, name)
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)

    def _finish(intent: dict) -> None:
        staging = intent["staging"]
        dest = partition_dir(dataset_path, batch_col, intent["upto"])
        trash = intent["trash"]
        if os.path.isdir(staging):
            if os.path.isdir(dest):
                os.rename(dest, trash)
            os.rename(staging, dest)
        for e in intent["strip"]:
            _strip(e)
        if os.path.isdir(trash):
            shutil.rmtree(trash)
        os.remove(intent_path)

    if os.path.isfile(intent_path):
        with open(intent_path) as f:
            _finish(json.load(f))  # complete the interrupted run first

    epochs = [e for e in list_epochs(dataset_path, batch_col) if e <= upto]
    with_data = [e for e in epochs if _has_data(e)]
    if len(with_data) <= 1:
        return {"compacted_epochs": 0, "rows": 0}
    # merge INTO the newest data-bearing committed epoch — never fabricate
    # a partition for an epoch that was never committed (that would turn
    # a genuine replay of it into a skip)
    target = max(with_data)
    combined = spark.read.parquet(
        *[partition_dir(dataset_path, batch_col, e) for e in with_data]
    )
    tag = uuid.uuid4().hex[:8]
    staging = f"{dataset_path}{_COMPACT_STAGING}{tag}"
    combined.write.mode("overwrite").parquet(staging)
    rows = spark.read.parquet(staging).count()
    intent = {
        "upto": target,
        "staging": staging,
        "trash": f"{dataset_path}{_COMPACT_TRASH}{tag}",
        "strip": [e for e in with_data if e != target],
    }
    tmp = intent_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(intent, f)
    os.replace(tmp, intent_path)  # the point of no return: intent is durable
    _finish(intent)
    return {"compacted_epochs": len(with_data), "rows": rows}


def prune_state_epochs(
    dataset_path: str, batch_col: str, keep_last: int = 2
) -> dict:
    """Strip the DATA of superseded latest-before STATE epochs, keeping
    the newest `keep_last` data-bearing ones intact — the maintenance
    pass for state dirs where every epoch holds the FULL current table
    (scd2 snapshots, anomaly/robust-outlier count tables, chunk-dedup
    witness sets): only the latest matters to readers, yet each 2-second
    trigger leaves another complete copy on disk forever.

    Both epochdir contracts survive, the compact_epochs way:
    - replay safety: every pruned epoch KEEPS its `{batch_col}=e` dir
      (and `_SUCCESS`), so `epoch_committed` still answers True and a
      checkpoint replay stays a no-op;
    - reader identity: `_latest_state_epoch`-style readers pick the
      newest epoch with or without this pass — pruned epochs were
      already superseded, and at least `keep_last` full copies remain
      (keep_last >= 2 tolerates a reader mid-scan of the previous
      state version during the pass).

    Unlike compact_epochs there is nothing to merge — superseded state
    is garbage by construction — so the pass is pure deletes and every
    step is idempotent/crash-safe without an intent file.

    Returns {"pruned_epochs": n}.
    """
    _require_local_path(dataset_path)
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")

    with_data = [
        e
        for e in list_epochs(dataset_path, batch_col)
        if _epoch_has_data(dataset_path, batch_col, e)
    ]
    doomed = with_data[:-keep_last] if len(with_data) > keep_last else []
    for e in doomed:
        d = partition_dir(dataset_path, batch_col, e)
        for name in os.listdir(d):
            if name != "_SUCCESS":
                p = os.path.join(d, name)
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
    return {"pruned_epochs": len(doomed)}
