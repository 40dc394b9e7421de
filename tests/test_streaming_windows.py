"""Event-time streaming tests: watermarked tumbling windows (append mode
emits finalized windows once) and stateful gap sessionization, fed through
the file changelog source with one file per micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from db_integration_via_kafka_ksql_spark.streaming.windows import (
    sessionize_batch,
    sessionize_events,
    windowed_event_counts,
)

EV_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

T0 = 1_700_000_000_000  # ms, on an hour-ish boundary for readability


def _write_events(directory, rows, name):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(directory, exist_ok=True)
    ts, users, types, vals = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([t * 1000 for t in ts], pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        f"{directory}/{name}",
    )


def _run_stream(spark, src, build, out_name, n_expected_batches=None):
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .start()
    )
    return q


HOUR = 3_600_000


def test_windowed_counts_append_emits_after_watermark(spark, tmp_path):
    src = str(tmp_path / "ev")
    # batch 1: three events in hour-window W0 (watermark 2h behind)
    _write_events(
        src,
        [(T0, 1, "click", 1.0), (T0 + 60_000, 2, "click", 2.0), (T0 + 120_000, 1, "buy", 3.0)],
        "f1.parquet",
    )
    q = _run_stream(
        spark, src, lambda s: windowed_event_counts(s, "1 hour", "2 hours"), "win_out"
    )
    try:
        q.processAllAvailable()
        # watermark still at 0 → nothing finalized
        assert spark.table("win_out").count() == 0

        # batch 2 advances max event time to T0+4h → wm = T0+2h after it;
        # batch 3 lets the new watermark take effect and finalize W0
        _write_events(src, [(T0 + 4 * HOUR, 3, "click", 1.0)], "f2.parquet")
        q.processAllAvailable()
        _write_events(src, [(T0 + 4 * HOUR + 1, 3, "click", 1.0)], "f3.parquet")
        q.processAllAvailable()
        out = {
            (r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.table("win_out").collect()
        }
        assert out["click"] == (2, 3.0)
        assert out["buy"] == (1, 3.0)
    finally:
        q.stop()


def test_sessionize_gap_and_timeout(spark, tmp_path):
    src = str(tmp_path / "sess")
    # user 1: two events 5 min apart (one session), then 40 min gap → new
    # session; user 2: single event
    _write_events(
        src,
        [
            (T0, 1, "a", 1.0),
            (T0 + 5 * 60_000, 1, "a", 2.0),
            (T0 + 45 * 60_000, 1, "a", 4.0),
            (T0, 2, "a", 8.0),
        ],
        "f1.parquet",
    )
    q = _run_stream(
        spark,
        src,
        lambda s: sessionize_events(s, gap_minutes=30, watermark="0 seconds"),
        "sess_out",
    )
    try:
        q.processAllAvailable()
        # user 1's first session closed in-batch by the 40-min gap; user
        # 2's idle session closed by event-time timeout (watermark delay 0
        # → wm = T0+45min > T0+30min timeout after the no-data batch)
        rows = {(r["user_id"], r["n_events"], r["sum_value"])
                for r in spark.table("sess_out").collect()}
        assert (1, 2, 3.0) in rows
        assert len(rows) <= 2

        # late batch pushes the watermark far ahead → event-time timeout
        # closes the remaining open sessions
        _write_events(src, [(T0 + 10 * HOUR, 9, "a", 0.0)], "f2.parquet")
        q.processAllAvailable()
        _write_events(src, [(T0 + 10 * HOUR + 1, 9, "a", 0.0)], "f3.parquet")
        q.processAllAvailable()
        by_user = {}
        for r in spark.table("sess_out").collect():
            by_user.setdefault(r["user_id"], []).append(r)
        assert len(by_user[1]) == 2          # both user-1 sessions closed
        assert by_user[2][0]["n_events"] == 1
    finally:
        q.stop()


def test_sessionize_batch_twin_agrees(spark, sf_dir):
    """The stateful stream's session definition == the batch window
    formulation, checked on the driver's events table (closed input)."""
    from db_integration_via_kafka_ksql_spark.io import epoch_us_col, load_table

    raw = load_table(spark, sf_dir, "events")
    ev = raw.select("user_id", epoch_us_col(raw, "ts").alias("ts_us"), "value")
    sessions = sessionize_batch(ev, gap_minutes=30)
    agg = sessions.agg(
        F.sum("n_events").alias("total_events"),
        F.count(F.lit(1)).alias("n_sessions"),
    ).first()
    # every event lands in exactly one session
    assert agg["total_events"] == ev.count()
    assert agg["n_sessions"] >= ev.select("user_id").distinct().count()


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: enrich a streaming event feed with a broadcast
    dimension (user → segment) — the standard pipeline enrichment shape.
    The static side re-resolves per micro-batch; no state store needed."""
    src = str(tmp_path / "enrich")
    _write_events(
        src,
        [(T0, 1, "click", 1.0), (T0 + 1000, 2, "click", 2.0), (T0 + 2000, 3, "buy", 4.0)],
        "f1.parquet",
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "segment"]
    )
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = stream.join(F.broadcast(dim), "user_id", "left").select(
        "user_id", "event_type", F.coalesce("segment", F.lit("unknown")).alias("segment")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r["user_id"], r["segment"]) for r in spark.table("enrich_out").collect()}
        assert got == {(1, "gold"), (2, "silver"), (3, "unknown")}
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """First arrival per user_id wins; in-watermark duplicates are dropped
    across micro-batches; state is watermark-bounded."""
    from db_integration_via_kafka_ksql_spark.streaming.windows import (
        streaming_dedup,
    )

    src = str(tmp_path / "ev_dedup")
    _write_events(
        src,
        [
            (T0, 1, "click", 1.0),
            (T0 + 1000, 1, "click", 2.0),        # same key, same batch → dropped
            (T0 + 2000, 2, "view", 3.0),
        ],
        "b1.parquet",
    )
    q = _run_stream(
        spark,
        src,
        lambda s: streaming_dedup(s, ["user_id"], watermark="2 hours"),
        "dedup_out",
    )
    try:
        q.processAllAvailable()
        # cross-batch duplicate of user 1, still inside the watermark
        _write_events(src, [(T0 + 5000, 1, "click", 9.0)], "b2.parquet")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_out").collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        assert len(by_user[1]) == 1 and by_user[1][0]["value"] == 1.0
        assert len(by_user[2]) == 1
    finally:
        q.stop()


def test_chunk_documents_is_streaming_compatible(spark, tmp_path):
    """chunk_documents is pure scan-side projection/explode, so the SAME
    operator code must run unmodified on a readStream (append mode, no
    state) — the streaming ingest path for RAG chunking."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from db_integration_via_kafka_ksql_spark.operators.text_analysis import (
        chunk_documents,
    )

    schema = StructType(
        [StructField("doc_id", IntegerType()), StructField("text", StringType())]
    )
    src = str(tmp_path / "in")
    os.makedirs(src)
    words = " ".join(f"w{i}" for i in range(11))
    pq.write_table(
        pa.table({"doc_id": pa.array([1], pa.int32()), "text": pa.array([words])}),
        f"{src}/f1.parquet",
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        chunk_documents(stream, window=4, stride=3)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    rows = sorted(
        (r.chunk_id, r.start_token, r.n_tokens)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [(0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 2)]
