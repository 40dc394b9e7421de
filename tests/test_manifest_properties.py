"""Property-based tests (hypothesis) for the r14 maintenance surface:

1. refresh_zone_manifest: for ANY interleaving of file adds, file
   removals (compaction), and refreshes with varying column sets, the
   manifest-derived stats equal a fresh footer walk — and a refresh
   over an unchanged tree walks ZERO files (the cache actually caches).
   A crash before the atomic publish leaves the OLD manifest intact and
   the next refresh converges.
2. epochdir.prune_state_epochs: for ANY committed epoch sequence and a
   crash at ANY point inside the delete sweep, re-running the prune
   converges to exactly the newest keep_last data-bearing epochs, with
   every epoch dir still answering epoch_committed=True.

Both run WITHOUT a SparkSession — the manifest walk is pyarrow-only and
the prune is pure filesystem — so the whole file is seconds, not
minutes.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_integration_via_kafka_ksql_spark.sinks.dataset import (
    load_zone_manifest,
    refresh_zone_manifest,
    zone_map_stats,
)
from db_integration_via_kafka_ksql_spark.streaming import epochdir

_SETTINGS = settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)

# an op is ("add", file_idx, rows) | ("rm", file_idx) | ("refresh", cols_mask)
_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("add"),
            st.integers(min_value=0, max_value=9),
            st.lists(
                st.integers(min_value=-100, max_value=100),
                min_size=1,
                max_size=5,
            ),
        ),
        st.tuples(st.just("rm"), st.integers(min_value=0, max_value=9)),
        st.tuples(st.just("refresh"), st.integers(min_value=1, max_value=3)),
    ),
    min_size=1,
    max_size=12,
)

_COLS = ["a", "b"]


def _write_file(root: str, idx: int, vals: list[int]) -> None:
    os.makedirs(os.path.join(root, f"leaf={idx % 3}"), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "a": pa.array(vals, pa.int64()),
                "b": pa.array([v * 2 for v in vals], pa.int64()),
            }
        ),
        os.path.join(root, f"leaf={idx % 3}", f"f{idx}.parquet"),
    )


def _mask_cols(mask: int) -> list[str]:
    return [c for i, c in enumerate(_COLS) if mask & (1 << i)] or ["a"]


@_SETTINGS
@given(ops=_ops)
def test_manifest_always_equals_fresh_walk(tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("ds"))
    mf = os.path.join(root, "_manifest.json")
    live: dict[int, bool] = {}
    for op in ops:
        if op[0] == "add":
            _, idx, vals = op
            # part files are write-once with unique names by contract
            # (Spark UUID part names) — an idx is never reused, even
            # after removal, or path-keyed caching would serve stale
            # stats by design
            if idx not in live:
                _write_file(root, idx, vals)
                live[idx] = True
        elif op[0] == "rm":
            _, idx = op
            if live.get(idx):
                os.remove(
                    os.path.join(root, f"leaf={idx % 3}", f"f{idx}.parquet")
                )
                live[idx] = False
        else:
            _, mask = op
            refresh_zone_manifest(root, mf, _mask_cols(mask))
    # final invariant: refresh with the full column set, then the
    # manifest must be entry-for-entry a fresh footer walk
    refresh_zone_manifest(root, mf, _COLS)
    entries = load_zone_manifest(mf)
    walk = {
        r["file"]: r
        for r in zone_map_stats(root, _COLS)
        if "_manifest" not in r["file"]
    }
    assert set(entries) == set(walk)
    for fpath, ent in entries.items():
        w = walk[fpath]
        assert ent["rows"] == w["rows"]
        for c in _COLS:
            lo, hi = ent["cols"][c] or (None, None)
            assert (lo, hi) == (w[f"{c}__min"], w[f"{c}__max"]), (fpath, c)
    # and an unchanged tree refreshes for free
    again = refresh_zone_manifest(root, mf, _COLS)
    assert again["files_walked"] == 0


def test_manifest_crash_before_publish_converges(tmp_path, monkeypatch):
    root = str(tmp_path / "ds")
    mf = str(tmp_path / "manifest.json")
    _write_file(root, 0, [1, 2, 3])
    refresh_zone_manifest(root, mf, _COLS)
    with open(mf) as f:
        before = f.read()
    _write_file(root, 1, [7])
    real_replace = os.replace

    def boom(a, b):
        raise OSError("crash before publish")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError, match="crash before publish"):
        refresh_zone_manifest(root, mf, _COLS)
    monkeypatch.setattr(os, "replace", real_replace)
    # the old manifest is byte-intact (atomic publish never half-writes)
    with open(mf) as f:
        assert f.read() == before
    # the next refresh walks exactly the missing file and converges
    r = refresh_zone_manifest(root, mf, _COLS)
    assert r["files_walked"] == 1 and r["files_total"] == 2


_epoch_rows = st.lists(
    st.integers(min_value=0, max_value=3), min_size=1, max_size=6
)
_crash_after = st.integers(min_value=0, max_value=20)


@_SETTINGS
@given(rows_per_epoch=_epoch_rows, keep=st.integers(1, 3), crash_after=_crash_after)
def test_prune_state_epochs_converges_under_delete_crashes(
    tmp_path_factory, rows_per_epoch, keep, crash_after
):
    """Crash at ANY point in the delete sweep, then re-run: the final
    tree holds exactly the newest `keep` data-bearing epochs, every
    epoch dir still reads as committed, and the pass is idempotent."""
    root = str(tmp_path_factory.mktemp("state") / "st")
    data_bearing = []
    for e, n in enumerate(rows_per_epoch):
        d = epochdir.partition_dir(root, "epoch", e)
        os.makedirs(d)
        open(os.path.join(d, "_SUCCESS"), "w").close()
        if n:
            pq.write_table(
                pa.table({"v": pa.array(list(range(n)), pa.int64())}),
                os.path.join(d, "part-0.parquet"),
            )
            data_bearing.append(e)
    want_kept = data_bearing[-keep:] if data_bearing else []
    calls = {"n": 0}
    real_remove = os.remove

    def flaky_remove(p):
        calls["n"] += 1
        if calls["n"] == crash_after:
            raise OSError("simulated crash mid-sweep")
        real_remove(p)

    import db_integration_via_kafka_ksql_spark.streaming.epochdir as ed

    orig = ed.os.remove
    ed.os.remove = flaky_remove
    try:
        try:
            epochdir.prune_state_epochs(root, "epoch", keep_last=keep)
        except OSError:
            pass  # the crash; rerun below converges
    finally:
        ed.os.remove = orig
    epochdir.prune_state_epochs(root, "epoch", keep_last=keep)

    def _data(e):
        d = epochdir.partition_dir(root, "epoch", e)
        return any(x.endswith(".parquet") for x in os.listdir(d))

    got_kept = [e for e in range(len(rows_per_epoch)) if _data(e)]
    assert got_kept == want_kept
    for e in range(len(rows_per_epoch)):
        assert epochdir.epoch_committed(root, "epoch", e)
    # idempotent
    assert epochdir.prune_state_epochs(root, "epoch", keep_last=keep) == {
        "pruned_epochs": 0
    }
