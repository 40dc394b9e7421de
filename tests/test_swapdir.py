"""swapdir: atomic-swap contract + crash-orphan sweeping (ADVICE r6 —
orphaned `__old_*` / `__staging_*` siblings must not accumulate)."""

from __future__ import annotations

import os

from db_integration_via_kafka_ksql_spark.streaming import swapdir


def _df(spark, n):
    return spark.range(n).selectExpr("id", "id * 2 as v")


def test_swap_write_round_trips_epoch_and_data(spark, tmp_path):
    path = str(tmp_path / "state")
    swapdir.swap_write(_df(spark, 3), path, epoch_id=5)
    assert swapdir.read_epoch(path) == 5
    assert spark.read.parquet(path).count() == 3
    swapdir.swap_write(_df(spark, 7), path, epoch_id=6)
    assert swapdir.read_epoch(path) == 6
    assert spark.read.parquet(path).count() == 7


def test_swap_write_sweeps_crash_orphans(spark, tmp_path):
    path = str(tmp_path / "state")
    swapdir.swap_write(_df(spark, 2), path, epoch_id=1)
    # emulate crashes: a stranded staging dir (crash mid-write) and a
    # stranded old dir (crash between the two renames)
    os.makedirs(f"{path}__staging_deadbeef")
    os.makedirs(f"{path}__old_cafebabe")
    # a sibling state path sharing the prefix must NOT be swept
    other = str(tmp_path / "state2")
    swapdir.swap_write(_df(spark, 1), other, epoch_id=1)

    swapdir.swap_write(_df(spark, 4), path, epoch_id=2)

    siblings = sorted(os.listdir(tmp_path))
    assert "state__staging_deadbeef" not in siblings
    assert "state__old_cafebabe" not in siblings
    assert "state2" in siblings
    assert swapdir.read_epoch(path) == 2
    assert spark.read.parquet(path).count() == 4
    assert spark.read.parquet(other).count() == 1


def test_recover_restores_newest_old_after_rename_window_crash(
    spark, tmp_path
):
    """A crash BETWEEN swap_write's two renames leaves the committed dir
    under `__old_*` and nothing at `path`. recover() must rename the
    newest survivor back instead of sweeping it (sweeping destroyed the
    only copy — ADVICE r10)."""
    path = str(tmp_path / "state")
    swapdir.swap_write(_df(spark, 3), path, epoch_id=9)
    # emulate the mid-window crash: live dir moved aside, publish lost
    os.rename(path, f"{path}__old_deadbeef")
    os.makedirs(f"{path}__staging_feedface")
    # an OLDER stale orphan that must NOT win the restore
    stale = f"{path}__old_00000000"
    os.makedirs(stale)
    os.utime(stale, (0, 0))

    swapdir.recover(path)

    assert swapdir.read_epoch(path) == 9
    assert spark.read.parquet(path).count() == 3
    siblings = sorted(os.listdir(tmp_path))
    assert not any("__old_" in s or "__staging_" in s for s in siblings)


def test_swap_write_after_rename_window_crash_keeps_going(spark, tmp_path):
    path = str(tmp_path / "state")
    swapdir.swap_write(_df(spark, 2), path, epoch_id=1)
    os.rename(path, f"{path}__old_deadbeef")  # mid-window crash
    swapdir.swap_write(_df(spark, 5), path, epoch_id=2)
    assert swapdir.read_epoch(path) == 2
    assert spark.read.parquet(path).count() == 5
    assert not any(
        "__old_" in s or "__staging_" in s for s in os.listdir(tmp_path)
    )
