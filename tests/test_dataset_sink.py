"""Partitioned training-dataset sink: layout, file-count bound, pruning.

The write side is `sinks/dataset.write_dataset` (hive partitioning with
one shuffle routing each partition value to one task); the read side must
prune directories on partition-column filters BEFORE opening files —
asserted on the physical plan's PartitionFilters, not trusted.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators.text_analysis import epoch_split
from db_integration_via_kafka_ksql_spark.plans.audit import audit
from db_integration_via_kafka_ksql_spark.sinks.dataset import (
    read_dataset,
    write_dataset,
)


def _leaf_files(root: str) -> dict[str, list[str]]:
    """Map each hive leaf directory (relative) to its parquet files."""
    out: dict[str, list[str]] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        parts = [f for f in filenames if f.endswith(".parquet")]
        if parts:
            out[os.path.relpath(dirpath, root)] = sorted(parts)
    return out


def test_write_dataset_layout_and_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    ds = epoch_split(docs, n_epochs=2)
    path = str(tmp_path / "corpus")
    write_dataset(ds, path, partition_cols=("epoch", "source"), sort_cols=("doc_id",))

    leaves = _leaf_files(path)
    # hive layout epoch=*/source=*, and the repartition-on-partition-cols
    # bounds output to exactly ONE file per leaf directory
    assert leaves, "no partition directories written"
    for leaf, files in leaves.items():
        assert leaf.startswith("epoch="), leaf
        assert "source=" in leaf, leaf
        assert len(files) == 1, f"{leaf}: small-files explosion ({len(files)})"

    # round trip: same rows (partition cols come back typed by inference)
    back = read_dataset(spark, path).select(
        F.col("doc_id"),
        F.col("source").cast("string"),
        F.col("text"),
        F.col("epoch").cast("int"),
    )
    assert back.count() == ds.count()
    assert back.exceptAll(ds.select(*back.columns)).count() == 0


def test_read_dataset_prunes_partitions_not_rows(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    ds = epoch_split(docs, n_epochs=2)
    path = str(tmp_path / "corpus")
    write_dataset(ds, path, partition_cols=("epoch", "source"))

    one_source = ds.filter("epoch = 0").select("source").first()["source"]
    filtered = read_dataset(spark, path).filter(
        (F.col("epoch") == 0) & (F.col("source") == one_source)
    )
    r = audit(filtered)
    scan = next(iter(r.scans.values()))
    # the epoch/source predicates became directory pruning...
    assert any("epoch" in f for f in scan.partition_filters)
    assert any("source" in f for f in scan.partition_filters)
    # ...and NOT data filters (they never reach row-level evaluation)
    assert not any("epoch" in f for f in scan.pushed_filters)
    # values are intact under pruning
    expect = ds.filter(
        (F.col("epoch") == 0) & (F.col("source") == one_source)
    ).count()
    assert filtered.count() == expect


def test_max_records_per_file_resplits_hot_partition(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    path = str(tmp_path / "corpus")
    write_dataset(
        docs, path, partition_cols=("source",), max_records_per_file=25
    )
    leaves = _leaf_files(path)
    counts = {
        leaf: read_dataset(spark, os.path.join(path, leaf)).count()
        for leaf in leaves
    }
    for leaf, files in leaves.items():
        expected = -(-counts[leaf] // 25)  # ceil
        assert len(files) == expected, (leaf, len(files), counts[leaf])


def _file_spans(root: str, cols: tuple[str, ...]) -> list[dict[str, tuple]]:
    """Per parquet file: (min, max) of each column, from actual data."""
    import pyarrow.parquet as pq

    spans = []
    for dirpath, _d, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(dirpath, f), columns=list(cols))
            spans.append(
                {
                    c: (
                        min(t.column(c).to_pylist()),
                        max(t.column(c).to_pylist()),
                    )
                    for c in cols
                }
            )
    return spans


def _avg_span_frac(spans, col, lo, hi) -> float:
    width = hi - lo
    return sum((s[col][1] - s[col][0]) / width for s in spans) / len(spans)


def test_zorder_narrows_file_stats_on_every_dimension(spark, tmp_path):
    """Two independent uniform columns; 100k rows split into ~10 files.
    Sorted by x alone, each file spans ~10% of x but ~100% of y — reads
    filtering on y skip nothing. Z-ordered, BOTH dimensions narrow to a
    rectangle (~sqrt(1/10) per side), so either predicate skips files."""
    df = (
        spark.range(100_000)
        .select(
            F.lit(0).alias("part"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(10_000)).alias("x"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(10_000)).alias("y"),
        )
        .localCheckpoint()
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    write_dataset(
        df, plain, ["part"], sort_cols=["x"], max_records_per_file=10_000
    )
    write_dataset(
        df, zed, ["part"], zorder_cols=["x", "y"], max_records_per_file=10_000
    )
    # layout change must not change content
    assert read_dataset(spark, zed).count() == 100_000
    assert (
        read_dataset(spark, zed).agg(F.sum("x"), F.sum("y")).collect()
        == read_dataset(spark, plain).agg(F.sum("x"), F.sum("y")).collect()
    )
    ps = _file_spans(plain, ("x", "y"))
    zs = _file_spans(zed, ("x", "y"))
    assert len(ps) >= 8 and len(zs) >= 8  # maxRecordsPerFile actually split
    # control: single-column sort leaves the OTHER column unclustered
    assert _avg_span_frac(ps, "x", 0, 9999) < 0.2
    assert _avg_span_frac(ps, "y", 0, 9999) > 0.9
    # z-order: both dimensions clustered (rectangles, not stripes)
    assert _avg_span_frac(zs, "x", 0, 9999) < 0.7
    assert _avg_span_frac(zs, "y", 0, 9999) < 0.7


def test_zorder_hashes_string_dims_for_equality_skipping(spark, tmp_path):
    """String dimensions hash-bin: rows of one value concentrate in few
    files instead of appearing in all of them."""
    df = (
        spark.range(40_000)
        .select(
            F.lit(0).alias("part"),
            F.concat(F.lit("src-"), F.pmod(F.col("id"), F.lit(16))).alias("s"),
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("x"),
        )
        .localCheckpoint()
    )
    out = str(tmp_path / "zs")
    write_dataset(
        df, out, ["part"], zorder_cols=["s", "x"], max_records_per_file=5_000
    )
    import pyarrow.parquet as pq

    hit, total = 0, 0
    for dirpath, _d, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                total += 1
                vals = set(
                    pq.read_table(
                        os.path.join(dirpath, f), columns=["s"]
                    ).column("s").to_pylist()
                )
                hit += "src-3" in vals
    assert total >= 6
    # value present in well under half the files => equality reads skip
    assert hit <= total // 2, (hit, total)


def test_compact_dataset_rewrites_only_fragmented_leaves(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        compact_dataset,
    )

    root = str(tmp_path / "ds")
    # 6 micro-batch appends -> 6 files in every leaf (2 sources)
    for b in range(6):
        df = spark.range(b * 100, (b + 1) * 100).select(
            (F.col("id") % 2).cast("string").alias("source"),
            F.col("id").alias("doc_id"),
        )
        write_dataset(df, root, ["source"], mode="append")
    before = _leaf_files(root)
    assert all(len(fs) == 6 for fs in before.values())
    total_before = read_dataset(spark, root).count()

    stats = compact_dataset(spark, root, max_files_per_leaf=3)
    assert stats["leaves_seen"] == 2 and stats["leaves_compacted"] == 2
    assert stats["files_before"] == 12 and stats["files_after"] == 2
    after = _leaf_files(root)
    assert all(len(fs) == 1 for fs in after.values())
    out = read_dataset(spark, root)
    assert out.count() == total_before == 600
    # partition-column values survive the rewrite (they live in dirnames)
    assert out.filter(F.col("source") == "1").count() == 300
    # content identical, not just counts
    assert out.agg(F.sum("doc_id")).collect()[0][0] == sum(range(600))

    # idempotent: a second pass finds nothing to do
    stats2 = compact_dataset(spark, root, max_files_per_leaf=3)
    assert stats2["leaves_compacted"] == 0
    assert stats2["files_after"] == stats2["files_before"] == 2


def test_compact_dataset_honors_target_records_and_sort(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        compact_dataset,
    )

    root = str(tmp_path / "ds2")
    for b in range(5):
        df = spark.range(b * 1000, (b + 1) * 1000).select(
            F.lit("a").alias("source"),
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("doc_id"),
        )
        write_dataset(df, root, ["source"], mode="append")
    stats = compact_dataset(
        spark, root, max_files_per_leaf=2,
        target_records_per_file=2000, sort_cols=["doc_id"],
    )
    assert stats["leaves_compacted"] == 1
    assert stats["files_after"] == 3  # ceil(5000 / 2000)
    # repartitionByRange on the sort key -> files cover disjoint ranges
    spans = _file_spans(root, ("doc_id",))
    spans.sort(key=lambda s: s["doc_id"][0])
    for a, b in zip(spans, spans[1:]):
        assert a["doc_id"][1] <= b["doc_id"][0]


def test_zone_map_scan_prunes_files_and_keeps_row_parity(spark, sf_dir, tmp_path):
    """r13 verdict #6: the zorder layout finally has a READ-side
    consumer. zone_map_scan evaluates the range predicate against the
    per-file footer stats and opens only intersecting files; parity vs
    the full scan + filter is exact (min/max bounds cannot skip a
    matching row) and the skip fraction is real, not zero."""
    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        zone_map_scan,
        zone_map_stats,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = str(tmp_path / "zm_ds")
    write_dataset(
        ev, root, partition_cols=["event_type"],
        zorder_cols=["user_id", "value"], max_records_per_file=200,
    )
    pred = {"value": (50.0, 60.0)}
    pruned, stats = zone_map_scan(spark, root, pred)
    assert stats["files_total"] > 4
    assert stats["files_skipped"] > 0, stats  # the layout buys real skips
    assert stats["files_kept"] + stats["files_skipped"] == stats["files_total"]
    # row parity with the unpruned filter — bit-exact, order-insensitive
    want = sorted(
        tuple(r)
        for r in ev.filter("value >= 50.0 AND value <= 60.0").collect()
    )
    got = sorted(
        tuple(r)
        for r in pruned.select(
            "event_id", "user_id", "event_type", "value"
        ).collect()
    )
    assert got == want and len(got) > 0
    # an impossible range skips EVERY file and still returns a typed
    # empty frame (schema parity with the real read)
    none_df, none_stats = zone_map_scan(spark, root, {"value": (1e9, 2e9)})
    assert none_stats["files_kept"] == 0
    assert none_df.count() == 0
    assert set(none_df.columns) >= {"event_id", "user_id", "value"}
    # a column absent from the footers yields None stats (never skipped
    # on it — correctness before pruning) and the scan itself fails fast
    # instead of silently answering a predicate the rows can't evaluate
    import pytest

    zm = zone_map_stats(root, ["no_such_col"])
    assert zm and all(r["no_such_col__min"] is None for r in zm)
    with pytest.raises(ValueError, match="absent from dataset"):
        zone_map_scan(spark, root, {"no_such_col": (0.0, 1.0)})


def test_zone_manifest_incremental_refresh_and_scan_parity(spark, sf_dir, tmp_path):
    """The table-format stats story: refresh_zone_manifest walks each
    footer ONCE (new files only on later refreshes, entries dropped when
    compaction rewrites a leaf), and a manifest-backed zone_map_scan is
    row- and stats-identical to the footer-walk scan."""
    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        compact_dataset,
        refresh_zone_manifest,
        zone_map_scan,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = str(tmp_path / "zm_mf")
    mf = str(tmp_path / "manifest.json")
    write_dataset(
        ev.filter("event_id % 2 = 0"), root,
        partition_cols=["event_type"], zorder_cols=["user_id", "value"],
        max_records_per_file=50,
    )
    r1 = refresh_zone_manifest(root, mf, ["value"])
    assert r1["files_walked"] == r1["files_total"] > 0
    # second refresh: everything cached
    r2 = refresh_zone_manifest(root, mf, ["value"])
    assert r2["files_walked"] == 0
    assert r2["files_cached"] == r1["files_total"]
    # a new column extends entries without losing the cached one
    r3 = refresh_zone_manifest(root, mf, ["user_id"])
    assert r3["files_walked"] == r1["files_total"]
    assert refresh_zone_manifest(root, mf, ["user_id", "value"])[
        "files_walked"
    ] == 0
    # append more files: only they are walked
    write_dataset(
        ev.filter("event_id % 2 = 1"), root,
        partition_cols=["event_type"], zorder_cols=["user_id", "value"],
        max_records_per_file=50, mode="append",
    )
    r4 = refresh_zone_manifest(root, mf, ["user_id", "value"])
    assert 0 < r4["files_walked"] < r4["files_total"]
    # manifest-backed scan == footer-walk scan, rows and stats
    pred = {"value": (50.0, 60.0)}
    via_mf, s_mf = zone_map_scan(spark, root, pred, manifest_path=mf)
    via_walk, s_walk = zone_map_scan(spark, root, pred)
    assert s_mf == s_walk
    want_rows = sorted(map(tuple, via_walk.collect()))  # pre-compaction
    assert sorted(map(tuple, via_mf.collect())) == want_rows
    # compaction rewrites leaves -> old entries dropped, new files walked
    compact_dataset(spark, root, max_files_per_leaf=2,
                    target_records_per_file=100_000)
    r5 = refresh_zone_manifest(root, mf, ["user_id", "value"])
    assert r5["files_dropped"] > 0 and r5["files_walked"] > 0
    via_mf2, s2 = zone_map_scan(spark, root, pred, manifest_path=mf)
    assert sorted(map(tuple, via_mf2.collect())) == want_rows


def test_zone_manifest_legacy_format_converts_and_spark_prune_matches(
    spark, sf_dir, tmp_path
):
    """r15 verdict Next #4 follow-through: (1) a legacy single-object
    {"files": {...}} manifest is read transparently and the next refresh
    rewrites it as JSONL (one entry per line — the layout the Spark
    prune scans distributed); (2) the DataFrame-evaluated prune keeps
    exactly the files the Python walk rule keeps, including the
    keep-all shape (no driver path list at all: kept is None)."""
    import json

    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        _prune_manifest_spark,
        load_zone_manifest,
        refresh_zone_manifest,
        zone_map_scan,
        zone_map_stats,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = str(tmp_path / "zm_legacy")
    write_dataset(
        ev, root, partition_cols=["event_type"], zorder_cols=["value"],
        max_records_per_file=150,
    )
    mf = str(tmp_path / "manifest.json")
    refresh_zone_manifest(root, mf, ["value"])
    entries = load_zone_manifest(mf)
    assert len(entries) > 4
    # rewrite as the LEGACY layout; the loader must read it identically
    with open(mf, "w") as f:
        json.dump({"files": entries}, f)
    assert load_zone_manifest(mf) == entries
    # a refresh converts in place to JSONL (walks nothing)
    r = refresh_zone_manifest(root, mf, ["value"])
    assert r["files_walked"] == 0
    with open(mf) as f:
        first_line = f.readline()
    assert "\"file\"" in first_line and "files" != list(
        json.loads(first_line)
    )[0]
    # Spark prune == Python walk rule, selective predicate
    pred = {"value": (50.0, 60.0)}
    total, kept = _prune_manifest_spark(spark, mf, pred)
    walk = zone_map_stats(root, ["value"])
    want_kept = sorted(
        rec["file"]
        for rec in walk
        if not (
            rec["value__min"] is not None
            and rec["value__max"] is not None
            and (rec["value__max"] < 50.0 or rec["value__min"] > 60.0)
        )
    )
    assert total == len(walk) and kept == want_kept
    assert 0 < len(kept) < total
    # keep-all predicate: no path list materializes (kept is None) and
    # the scan reads the dataset root directly, rows bit-equal
    lo = min(r["value__min"] for r in walk)
    hi = max(r["value__max"] for r in walk)
    total2, kept2 = _prune_manifest_spark(spark, mf, {"value": (lo, hi)})
    assert total2 == total and kept2 is None
    all_df, all_stats = zone_map_scan(
        spark, root, {"value": (lo, hi)}, manifest_path=mf
    )
    assert all_stats["files_skipped"] == 0
    assert all_df.count() == ev.filter(
        (F.col("value") >= lo) & (F.col("value") <= hi)
    ).count()


def test_zone_map_scan_refresh_false_guards(spark, sf_dir, tmp_path):
    """ADVICE r16: the refresh=False opt-out path must fail LOUDLY on a
    missing/empty manifest (a keep-nothing prune would silently return an
    empty scan over real data) and on a manifest Spark can't infer a
    'file' column from (legacy single-object / corrupt JSONL) — never
    meaningless stats or a null-path collect crash."""
    import json

    import pytest

    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        refresh_zone_manifest,
        zone_map_scan,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    root = str(tmp_path / "zm_guard")
    write_dataset(
        ev, root, partition_cols=["event_type"], zorder_cols=["value"],
        max_records_per_file=200,
    )
    pred = {"value": (50.0, 60.0)}

    # missing manifest + refresh=False -> loud, named error
    missing = str(tmp_path / "never_written.json")
    with pytest.raises(FileNotFoundError, match="refresh=False"):
        zone_map_scan(spark, root, pred, manifest_path=missing, refresh=False)
    assert not os.path.exists(missing)  # the guard didn't create one

    # empty manifest file + refresh=False -> same loud error
    empty = str(tmp_path / "empty.json")
    open(empty, "w").close()
    with pytest.raises(FileNotFoundError, match="missing or empty"):
        zone_map_scan(spark, root, pred, manifest_path=empty, refresh=False)

    # a real manifest serves refresh=False identically to refresh=True
    mf = str(tmp_path / "manifest.json")
    refresh_zone_manifest(root, mf, ["value"])
    df_true, st_true = zone_map_scan(spark, root, pred, manifest_path=mf)
    df_false, st_false = zone_map_scan(
        spark, root, pred, manifest_path=mf, refresh=False
    )
    assert st_true == st_false
    assert df_false.count() == df_true.count() == ev.filter(
        (F.col("value") >= 50.0) & (F.col("value") <= 60.0)
    ).count()

    # legacy single-object manifest (no 'file' column per line): loud
    # ValueError naming the rebuild path, not garbage stats
    legacy = str(tmp_path / "legacy.json")
    with open(legacy, "w") as f:
        json.dump({"files": {"a.parquet": {"rows": 1, "cols": {}}}}, f)
    with pytest.raises(ValueError, match="legacy format"):
        zone_map_scan(spark, root, pred, manifest_path=legacy, refresh=False)

    # corrupt JSONL (unparseable lines -> _corrupt_record schema): same
    corrupt = str(tmp_path / "corrupt.json")
    with open(corrupt, "w") as f:
        f.write('{"file": "a.parquet", "rows": 1, "cols": {}}\n')
        f.write("not json at all\n")
    with pytest.raises(ValueError, match="corrupt"):
        zone_map_scan(spark, root, pred, manifest_path=corrupt, refresh=False)


def test_sharded_manifest_parity_and_incremental_shard_writes(
    spark, sf_dir, tmp_path
):
    """The 10^6-file manifest escape hatch: `shards=K` makes the manifest
    a DIRECTORY of K JSONL shards keyed by md5(file). A commit-cadence
    refresh then rewrites ONLY the shards whose membership changed and
    hardlinks the rest into the new version (O(changed) write cost, not
    O(total) — the single-file layout rewrites everything every call),
    published via a crash-safe two-phase directory swap. The prune side
    is layout-transparent: spark.read.json scans the shard dir exactly
    like the single file (`_meta.json` is underscore-hidden)."""
    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        load_zone_manifest,
        refresh_zone_manifest,
        zone_map_scan,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    root = str(tmp_path / "zm_shard")
    write_dataset(
        ev.filter("event_id % 2 = 0"), root,
        partition_cols=["event_type"], zorder_cols=["value"],
        max_records_per_file=50,
    )
    single = str(tmp_path / "manifest.json")
    shard_dir = str(tmp_path / "manifest.d")
    r_single = refresh_zone_manifest(root, single, ["value"])
    r_shard = refresh_zone_manifest(root, shard_dir, ["value"], shards=16)
    assert os.path.isdir(shard_dir)
    assert r_shard["shards_total"] == 16
    assert r_shard["files_walked"] == r_single["files_total"] > 0
    # both layouts load to the identical entry map
    assert load_zone_manifest(shard_dir) == load_zone_manifest(single)

    # prune parity across: footer walk, single-file manifest, sharded
    pred = {"value": (50.0, 60.0)}
    df_walk, s_walk = zone_map_scan(spark, root, pred)
    df_single, s_single = zone_map_scan(spark, root, pred, manifest_path=single)
    df_shard, s_shard = zone_map_scan(spark, root, pred, manifest_path=shard_dir)
    assert s_shard == s_single == s_walk
    want = sorted(map(tuple, df_walk.collect()))
    assert sorted(map(tuple, df_shard.collect())) == want
    assert s_shard["files_skipped"] > 0  # the zorder layout is selective

    # no-op refresh: every shard byte-identical -> zero shards written,
    # carried forward as hardlinks (same inode)
    inodes0 = {
        os.path.basename(p): os.stat(p).st_ino
        for p in sorted(
            os.path.join(shard_dir, n)
            for n in os.listdir(shard_dir)
            if n.endswith(".jsonl")
        )
    }
    r_noop = refresh_zone_manifest(root, shard_dir, ["value"])
    assert r_noop["files_walked"] == 0
    assert r_noop["shards_written"] == 0
    inodes1 = {
        os.path.basename(p): os.stat(p).st_ino
        for p in sorted(
            os.path.join(shard_dir, n)
            for n in os.listdir(shard_dir)
            if n.endswith(".jsonl")
        )
    }
    assert inodes1 == inodes0  # hardlink carry-forward, zero data written

    # append: only the shards holding NEW entries are rewritten; every
    # untouched shard keeps its inode
    write_dataset(
        ev.filter("event_id % 2 = 1"), root,
        partition_cols=["event_type"], zorder_cols=["value"],
        max_records_per_file=50, mode="append",
    )
    r_inc = refresh_zone_manifest(root, shard_dir, ["value"])
    assert 0 < r_inc["files_walked"] < r_inc["files_total"]
    assert 0 < r_inc["shards_written"] <= r_inc["shards_total"]
    inodes2 = {
        os.path.basename(p): os.stat(p).st_ino
        for p in sorted(
            os.path.join(shard_dir, n)
            for n in os.listdir(shard_dir)
            if n.endswith(".jsonl")
        )
    }
    unchanged = sum(
        1 for n, ino in inodes2.items() if inodes1.get(n) == ino
    )
    assert unchanged == r_inc["shards_total"] - r_inc["shards_written"]

    # post-append parity again (vs a fresh footer walk)
    df_walk2, s_walk2 = zone_map_scan(spark, root, pred)
    df_shard2, s_shard2 = zone_map_scan(spark, root, pred, manifest_path=shard_dir)
    assert s_shard2 == s_walk2
    assert sorted(map(tuple, df_shard2.collect())) == sorted(
        map(tuple, df_walk2.collect())
    )

    # refresh=False serves the sharded dir; missing/empty dirs are loud
    import pytest

    df_nf, s_nf = zone_map_scan(
        spark, root, pred, manifest_path=shard_dir, refresh=False
    )
    assert s_nf == s_shard2
    with pytest.raises(FileNotFoundError, match="missing or empty"):
        zone_map_scan(
            spark, root, pred,
            manifest_path=str(tmp_path / "never.d"), refresh=False,
        )
    hollow = tmp_path / "hollow.d"
    hollow.mkdir()
    (hollow / "shard-00000.jsonl").write_text("")
    with pytest.raises(FileNotFoundError, match="missing or empty"):
        zone_map_scan(
            spark, root, pred, manifest_path=str(hollow), refresh=False
        )


def test_sharded_manifest_conversion_and_crash_recovery(
    spark, sf_dir, tmp_path
):
    """(1) A single-file manifest CONVERTS in place when a refresh asks
    for shards — entries carry over, nothing rewalks. (2) A crash
    between the two swap renames leaves either the old or the staged
    version recoverable: the next refresh restores the newest __old_*
    when the live dir is gone and sweeps stranded __staging_* dirs."""
    import shutil

    from db_integration_via_kafka_ksql_spark.sinks.dataset import (
        load_zone_manifest,
        refresh_zone_manifest,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    root = str(tmp_path / "zm_conv")
    write_dataset(
        ev, root, partition_cols=["event_type"], zorder_cols=["value"],
        max_records_per_file=200,
    )
    mf = str(tmp_path / "manifest.json")
    refresh_zone_manifest(root, mf, ["value"])
    before = load_zone_manifest(mf)
    r_conv = refresh_zone_manifest(root, mf, ["value"], shards=8)
    assert os.path.isdir(mf)
    assert r_conv["files_walked"] == 0  # all entries carried over
    assert load_zone_manifest(mf) == before

    # crash inside the rename window: live dir gone, __old_* holds the
    # last published version, a half-built __staging_* is stranded
    old_sib = f"{mf}__old_deadbeef"
    os.rename(mf, old_sib)
    stag_sib = f"{mf}__staging_feedface"
    os.makedirs(stag_sib)
    with open(os.path.join(stag_sib, "shard-00000.jsonl"), "w") as f:
        f.write("half-written garbage\n")
    r_rec = refresh_zone_manifest(root, mf, ["value"])
    assert os.path.isdir(mf)
    assert not os.path.exists(old_sib)
    assert not os.path.exists(stag_sib)
    assert r_rec["files_walked"] == 0  # restored, nothing rewalked
    assert load_zone_manifest(mf) == before
    shutil.rmtree(root)
