"""SparkSession factory tuned for this engine.

Defaults are written for a large cluster (100 TB inputs) but degrade
gracefully on local[N]:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switch replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces down using ``advisoryPartitionSizeInBytes`` (64 MiB), so the
  same config works at sf0.001 and at 100 TB (where initial partitions
  should be set ~ 2-3x total cluster cores by the deployer).
- Arrow enabled for the few Pandas-UDF paths (multimodal, optional ANN).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "db-integration-via-kafka-ksql-spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # host-independent timestamp semantics: NTZ casts and unix_micros
        # must not depend on the machine's local timezone
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # parquet scan batching: wide scans at 100 TB want large vectorized batches
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # min/max/count over plain parquet columns answer from footer stats
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "256m")
        # local[N] runs everything in the driver JVM: size it like the sum
        # of the executors it stands in for, or checkpoint/cache blocks
        # from concurrent queries evict each other (observed as 2x bench
        # inflation at 8g with a 27-query run on a 128 GiB host)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
