"""Epoch-marked atomic-swap parquet directory — the shared persistence
primitive of the epoch-guarded streaming components (IncrementalAggView,
StreamingPacker).

Contract: `swap_write` stages the frame into a sibling directory, drops
the `_epoch.json` marker INSIDE the staged dir (underscore prefix:
parquet readers ignore it), and swaps it in with one rename — data and
marker become visible atomically, so `read_epoch` can never observe a
directory whose marker disagrees with its contents. A crash between the
two renames leaves either the old dir or the new dir, never a mix; dirs
orphaned by a crash (`{path}__old_*` / `{path}__staging_*`) are inert
(fresh uuid suffixes keep them out of every later swap's way) and are
swept at the START of the next `swap_write` of the same path — before
new staging begins, so a second crash can strand at most one generation
of orphans, never an accumulating pile.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame

_EPOCH_FILE = "_epoch.json"


def dir_exists(path: str) -> bool:
    return os.path.isdir(path) and bool(os.listdir(path))


def read_epoch(path: str) -> int | None:
    """The epoch recorded by the last successful swap, or None."""
    meta = os.path.join(path, _EPOCH_FILE)
    if not os.path.isfile(meta):
        return None
    with open(meta) as f:
        return json.load(f)["epoch"]


def _sweep_orphans(path: str) -> None:
    """Remove `{path}__old_*` / `{path}__staging_*` siblings stranded by
    a crash between swap_write's renames. Safe at any point: the live dir
    is exactly `path`, never a suffixed sibling, and a concurrent writer
    is excluded by the callers' contract (one foreachBatch owner per
    state path)."""
    parent = os.path.dirname(path) or "."
    base = os.path.basename(path)
    if not os.path.isdir(parent):
        return
    for name in os.listdir(parent):
        if name.startswith(f"{base}__old_") or name.startswith(
            f"{base}__staging_"
        ):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def swap_write(df: DataFrame, path: str, epoch_id: int) -> None:
    """Atomically replace `path` with `df` + the epoch marker.

    The frame is coalesced to one file: every caller's state is a tiny
    per-group/per-shard summary, and a single file keeps the swap a
    single rename on every filesystem.
    """
    _sweep_orphans(path)
    tmp = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _EPOCH_FILE), "w") as f:
        json.dump({"epoch": epoch_id}, f)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
