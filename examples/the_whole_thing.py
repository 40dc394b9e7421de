"""The reference's `the-whole-thing.sh` (its main(): bring up 10
containers, deploy connectors, populate, verify) collapsed into one Spark
process.

Steps mirror the-whole-thing.sh:1-104:
 1. bring-up            → one SparkSession (no container zoo)
 2. schema registration → explicit schema (engine-carried, SURVEY §1.4)
 3. deploy transform    → Engine.deploy(CdcPipeline)  [M3]
 4. delete-first test   → dummy row insert + delete (tombstone path first)
 5. populate            → 8 movies via the changelog
 6. verify RUNNING      → Engine.show_queries()        [M2]
 7. deploy sink         → same pipeline (sink attached)
 8. verify counts       → source keys == sink rows == state rows

Run: python examples/the_whole_thing.py   (takes ~30 s on local[8])
"""

from __future__ import annotations

import os
import sqlite3
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_integration_via_kafka_ksql_spark.engine import Engine
from db_integration_via_kafka_ksql_spark.session import get_spark
from db_integration_via_kafka_ksql_spark.sinks.dbapi import DbApiSink
from db_integration_via_kafka_ksql_spark.sources.changelog import (
    file_changelog_stream,
)
from db_integration_via_kafka_ksql_spark.streaming.pipeline import CdcPipeline
from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore
from tests.fixtures_movies import CHANGELOG_SCHEMA, movies_changelog_rows


def write_batch_file(spark, directory: str, rows, name: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(directory, exist_ok=True)
    cols = list(zip(*rows))
    names = [f.name for f in CHANGELOG_SCHEMA.fields]
    arrays = []
    for field, vals in zip(CHANGELOG_SCHEMA.fields, cols):
        t = {
            "IntegerType": pa.int32(),
            "LongType": pa.int64(),
            "StringType": pa.string(),
            "BooleanType": pa.bool_(),
            "TimestampType": pa.timestamp("us"),
        }.get(type(field.dataType).__name__, None)
        if t is None:  # DecimalType(3,1)
            t = pa.decimal128(3, 1)
        arrays.append(pa.array(list(vals), t))
    pq.write_table(pa.table(dict(zip(names, arrays))), f"{directory}/{name}")


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="the_whole_thing_")
    chlog_dir = f"{tmp}/changelog"
    db = f"{tmp}/movies_sink.db"
    from decimal import Decimal

    sqlite3.register_adapter(Decimal, str)

    print("[1/8] bring-up: one SparkSession (reference: 10 containers, ~5 min)")
    spark = get_spark(app_name="the-whole-thing", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)

    # mirror the reference's "schema must exist before DDL" ordering
    # (the-whole-thing.sh:23-40) against the in-memory registry contract:
    # register the value schema, prove an incompatible change is refused
    print("[2/8] schema: registered (BACKWARD-gated) + engine-carried")
    import json

    from db_integration_via_kafka_ksql_spark.sources.schema_registry import (
        InMemorySchemaRegistry,
    )

    registry = InMemorySchemaRegistry()
    movie_v1 = json.dumps(
        {
            "type": "record",
            "name": "movie",
            "fields": [
                {"name": "key_id", "type": "long"},
                {"name": "title", "type": ["null", "string"]},
            ],
        }
    )
    sid = registry.register("movies-value", movie_v1)
    try:
        registry.register(
            "movies-value",
            json.dumps(
                {
                    "type": "record",
                    "name": "movie",
                    "fields": [
                        {"name": "key_id", "type": "long"},
                        {"name": "title", "type": ["null", "string"]},
                        {"name": "rating", "type": "double"},  # no default!
                    ],
                }
            ),
        )
        raise AssertionError("BACKWARD gate should have refused this")
    except ValueError:
        pass
    print(f"      schema id {sid} registered; incompatible ALTER refused")
    rows = movies_changelog_rows()

    print("[3/8+7/8] deploy transform + sink as one pipeline")
    state = ParquetStateStore(
        spark, f"{tmp}/state", key_cols=["key_id"], order_cols=["offset"]
    )
    sink = DbApiSink(
        connect=lambda: sqlite3.connect(db),
        table="movies_sink",
        key_cols=["key_id"],
        dialect="sqlite",
    )
    # dummy-row batch first: the delete/tombstone path is exercised before
    # any real data, exactly like the-whole-thing.sh:23-50
    print("[4/8] delete-first: dummy insert + delete + tombstone")
    write_batch_file(spark, chlog_dir, rows[:1], "b0.parquet")
    pipeline = CdcPipeline(
        source=file_changelog_stream(spark, chlog_dir, CHANGELOG_SCHEMA),
        key_cols=["key_id"],
        order_cols=["offset"],
        sink=sink,
        state=state,
        checkpoint_dir=f"{tmp}/ckpt",
        trigger_seconds=0,
        query_name="movies_transform",
    )
    handle = eng.deploy(pipeline)
    handle.await_idle()

    print("[5/8] populate: full changelog (8 movies, deletes, re-inserts)")
    write_batch_file(spark, chlog_dir, rows[1:], "b1.parquet")
    handle.await_idle()

    print("[6/8] verify RUNNING (SHOW QUERIES)")
    queries = eng.show_queries()
    assert any(q["name"] == "movies_transform" and q["active"] for q in queries), queries
    print("      queries:", queries)

    print("[8/8] verify counts: state == sink == expected")
    n_state = state.read().count()
    con = sqlite3.connect(db)
    n_sink = con.execute("SELECT count(*) FROM movies_sink").fetchone()[0]
    sample = con.execute(
        "SELECT key_id, title, rating FROM movies_sink ORDER BY key_id LIMIT 3"
    ).fetchall()
    con.close()
    handle.stop()
    print(f"      state rows={n_state}, sink rows={n_sink}, sample={sample}")
    assert n_state == n_sink == 6, (n_state, n_sink)

    print("OK — full CDC pipeline verified end-to-end in one process")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
