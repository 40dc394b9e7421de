"""Stream-stream interval join (streaming/joins.py): the watermarked
streaming plan must equal the batch twin on in-order data, and rows
arriving after the watermark passed their match window must be DROPPED —
the state-bound guarantee that makes the operator runnable forever.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from db_integration_via_kafka_ksql_spark.streaming.joins import interval_join

L_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("pid", LongType()),
     StructField("pt", TimestampType())]
)
R_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("cid", LongType()),
     StructField("ct", TimestampType())]
)

T0 = 1_700_000_000  # seconds


def _write(directory, name, schema, rows):
    os.makedirs(directory, exist_ok=True)
    cols = list(zip(*rows))
    names = [f.name for f in schema.fields]
    pq.write_table(
        pa.table(
            {
                names[0]: pa.array(cols[0], pa.int64()),
                names[1]: pa.array(cols[1], pa.int64()),
                names[2]: pa.array(
                    [(T0 + s) * 1_000_000 for s in cols[2]],
                    pa.timestamp("us"),
                ),
            }
        ),
        f"{directory}/{name}",
    )


def _streams(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc, exist_ok=True)
    os.makedirs(rsrc, exist_ok=True)
    ls = (
        spark.readStream.schema(L_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc)
    )
    rs = (
        spark.readStream.schema(R_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc)
    )
    return lsrc, rsrc, ls, rs


def _run(spark, joined, name):
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {
        (r["pid"], r["cid"])
        for r in spark.sql(f"select * from {name}").collect()
    }


def test_streaming_join_equals_batch_twin_on_in_order_data(spark, tmp_path):
    lsrc, rsrc, ls, rs = _streams(spark, tmp_path)
    lrows = [(1, 10, 100), (1, 11, 500), (2, 20, 200), (3, 30, 300)]
    rrows = [
        (1, 50, 70),    # 30s before pid=10 → matches (before=60)
        (1, 51, 130),   # 30s after pid=10 → matches (after=60)
        (1, 52, 480),   # matches pid=11 only
        (2, 53, 199),   # matches pid=20
        (3, 54, 400),   # 100s after pid=30 → outside window
        (4, 55, 100),   # no such user on the left
    ]
    _write(lsrc, "l1.parquet", L_SCHEMA, lrows)
    _write(rsrc, "r1.parquet", R_SCHEMA, rrows)

    got = _run(
        spark,
        interval_join(
            ls, rs, on=["user_id"], left_ts="pt", right_ts="ct",
            before_seconds=60, after_seconds=60, watermark_seconds=30,
        ),
        "sj_inner",
    )
    want = {(10, 50), (10, 51), (11, 52), (20, 53)}
    assert got == want

    # the batch twin on the same frames produces the identical pair set
    lb = spark.createDataFrame(
        [(u, p, _ts(s)) for u, p, s in lrows], L_SCHEMA
    )
    rb = spark.createDataFrame(
        [(u, c, _ts(s)) for u, c, s in rrows], R_SCHEMA
    )
    batch = interval_join(
        lb, rb, on=["user_id"], left_ts="pt", right_ts="ct",
        before_seconds=60, after_seconds=60,
    )
    assert {(r["pid"], r["cid"]) for r in batch.collect()} == want


def _ts(seconds):
    import datetime

    return datetime.datetime.utcfromtimestamp(T0 + seconds)


def test_rows_later_than_watermark_are_dropped(spark, tmp_path):
    """Batch 1 advances the watermark far past t=100; batch 2 then
    delivers a click at t=80 whose purchase (t=100) it WOULD match —
    the streaming join must not emit it, while the batch twin does:
    that's watermark state eviction working as designed."""
    lsrc, rsrc, ls, rs = _streams(spark, tmp_path)
    _write(lsrc, "l1.parquet", L_SCHEMA, [(2, 20, 100), (1, 10, 1000)])
    _write(rsrc, "r1.parquet", R_SCHEMA, [(1, 50, 1005)])

    joined = interval_join(
        ls, rs, on=["user_id"], left_ts="pt", right_ts="ct",
        before_seconds=60, after_seconds=60, watermark_seconds=30,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_late")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark -> ~970
        _write(lsrc, "l2.parquet", L_SCHEMA, [(9, 90, 1100)])
        _write(rsrc, "r2.parquet", R_SCHEMA, [(2, 53, 80)])  # late!
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["pid"], r["cid"])
        for r in spark.sql("select * from sj_late").collect()
    }
    assert got == {(10, 50)}  # the late (20, 53) pair never appears

    # while the batch twin (no watermark, full data) does pair them
    lb = spark.createDataFrame(
        [(2, 20, _ts(100)), (1, 10, _ts(1000)), (9, 90, _ts(1100))], L_SCHEMA
    )
    rb = spark.createDataFrame(
        [(1, 50, _ts(1005)), (2, 53, _ts(80))], R_SCHEMA
    )
    batch = interval_join(
        lb, rb, on=["user_id"], left_ts="pt", right_ts="ct",
        before_seconds=60, after_seconds=60,
    )
    assert {(r["pid"], r["cid"]) for r in batch.collect()} == {
        (10, 50),
        (20, 53),
    }


def test_left_outer_emits_unmatched_after_watermark_closes(spark, tmp_path):
    """Outer semantics: a left row with no partner emits (with NULL right
    columns) once the watermark passes its window — not before, not
    never."""
    lsrc, rsrc, ls, rs = _streams(spark, tmp_path)
    _write(lsrc, "l1.parquet", L_SCHEMA, [(1, 10, 100)])
    _write(rsrc, "r1.parquet", R_SCHEMA, [(8, 80, 100)])  # different key

    joined = interval_join(
        ls, rs, on=["user_id"], left_ts="pt", right_ts="ct",
        before_seconds=10, after_seconds=10, watermark_seconds=10,
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_outer")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark way past pid=10's window on BOTH sources
        _write(lsrc, "l2.parquet", L_SCHEMA, [(7, 70, 5000)])
        _write(rsrc, "r2.parquet", R_SCHEMA, [(7, 71, 5000)])
        q.processAllAvailable()
        # one more batch so the new watermark takes effect on state
        _write(lsrc, "l3.parquet", L_SCHEMA, [(6, 60, 6000)])
        _write(rsrc, "r3.parquet", R_SCHEMA, [(6, 61, 6000)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["pid"], r["cid"])
        for r in spark.sql("select * from sj_outer").collect()
    }
    assert (10, None) in rows  # unmatched left row surfaced with NULLs
