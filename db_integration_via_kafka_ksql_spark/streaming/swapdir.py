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
handled at the START of the next `swap_write` (or `recover`) of the same
path: if the crash struck inside the rename window — leaving nothing at
`path` — the newest `__old_*` is RESTORED as the live dir, the rest are
swept. A second crash strands at most one generation of orphans and no
committed version is ever lost.
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


def _sweep_orphans(path: str, extra_prefixes: tuple[str, ...] = ()) -> None:
    """Clean up siblings stranded by a crash between swap_write's two
    renames, RESTORING before sweeping: if `path` itself is missing, the
    crash struck inside the rename window and the newest `{path}__old_*`
    is the last published version — rename it back first (deleting it
    would destroy the only surviving copy). `__staging_*` dirs are always
    either incomplete or published-superseded, so they just go; callers
    with additional scratch-sibling naming schemes (ParquetStateStore's
    assembled `__next_*` version dirs) pass those via ``extra_prefixes``
    and they are swept the same way — a `__next_*` is by construction
    never the live version (it only becomes live by being renamed TO
    `path`), so after a crash it is always safe to drop: the restored
    `__old_*` plus an idempotent batch replay reproduce it. Safe at
    any point: the live dir is exactly `path`, never a suffixed sibling,
    and a concurrent writer is excluded by the callers' contract (one
    foreachBatch owner per state path)."""
    parent = os.path.dirname(path) or "."
    base = os.path.basename(path)
    if not os.path.isdir(parent):
        return
    sweep_prefixes = tuple(
        f"{base}{suffix}" for suffix in ("__staging_",) + extra_prefixes
    )
    olds = []
    for name in os.listdir(parent):
        full = os.path.join(parent, name)
        if name.startswith(sweep_prefixes):
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith(f"{base}__old_"):
            olds.append(full)
    if olds and not os.path.isdir(path):
        newest = max(olds, key=lambda p: os.stat(p).st_mtime)
        os.rename(newest, path)
        olds.remove(newest)
    for full in olds:
        shutil.rmtree(full, ignore_errors=True)


def recover(path: str, extra_prefixes: tuple[str, ...] = ()) -> None:
    """Public recovery hook for read paths (e.g. reopening a saved index
    after a crash): restores `path` from a stranded `__old_*` survivor if
    the last swap crashed between its renames, and sweeps the rest."""
    _sweep_orphans(path, extra_prefixes)


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
