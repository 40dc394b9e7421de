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
