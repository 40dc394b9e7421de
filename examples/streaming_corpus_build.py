"""Streaming corpus build, composed from the engine's streaming stages:

    raw JSONL-ish doc feed (file stream)
        → StreamingCurator   (quality filter + exact dedup vs state)
        → curated dataset    (hive-partitioned parquet)
        → StreamingPacker    (readStream ON the curated dataset —
                              pipeline-of-pipelines, the Spark-idiomatic
                              way to chain stateful stages)
        → packed dataset     (per-shard sequence offsets, cross-batch)

Each stage is its own StreamingQuery with its own checkpoint and
replay-idempotent state; the curated dataset is simultaneously the first
stage's sink and the second stage's streaming source — no custom glue,
just parquet + Structured Streaming file semantics.

Exactly-once ACROSS the composition, not just per stage: every stage
publishes its epoch partition atomically with FINAL part-file names
(`streaming/epochdir` — staging dir + one rename; a replayed epoch finds
the partition committed and skips the write). The round-6 at-least-once
window — stage 1 dying between its dataset write and its state update,
then replaying fresh part-file names that a file-name-tracking
downstream source re-ingested — is closed by construction: file names
never change once visible, so the committed partition dir doubles as the
commit-log entry. Crash-replay coverage for exactly that window lives in
tests/test_streaming_composition.py. Run:

    python examples/streaming_corpus_build.py   (~40 s, local)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from db_integration_via_kafka_ksql_spark.session import get_spark
from db_integration_via_kafka_ksql_spark.streaming.curation import StreamingCurator
from db_integration_via_kafka_ksql_spark.streaming.packer import StreamingPacker

SCHEMA = StructType(
    [
        StructField("doc_id", IntegerType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ]
)


def main() -> None:
    spark = get_spark(app_name="streaming_corpus_build")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_corpus_")
    src = os.path.join(root, "in")
    os.makedirs(src)

    def drop(name, rows):
        ids, srcs, txts = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int32()),
                    "source": pa.array(srcs),
                    "text": pa.array(txts),
                }
            ),
            os.path.join(src, name),
        )

    def doc(i, source, n):
        words = " ".join(
            f"w{(i * 13 + j * 7) % 97}" for j in range(n)
        )
        return (i, source, words)

    curator = StreamingCurator(
        spark,
        dataset_path=os.path.join(root, "curated"),
        state_path=os.path.join(root, "curation_state"),
        min_quality=0.2,
        min_tokens=8,
        checkpoint_dir=os.path.join(root, "ckpt_curate"),
        trigger_seconds=0,
        query_name="corpus_curate",
    )
    packer = StreamingPacker(
        spark,
        dataset_path=os.path.join(root, "packed"),
        state_path=os.path.join(root, "packing_state"),
        capacity=64,
        checkpoint_dir=os.path.join(root, "ckpt_pack"),
        trigger_seconds=0,
        query_name="corpus_pack",
    )

    # stage 1: raw feed → curated dataset
    raw = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q1 = curator.start(raw)

    drop("f1.parquet", [doc(1, "web", 40), doc(2, "web", 40), doc(3, "books", 55)])
    q1.processAllAvailable()
    drop("f2.parquet", [doc(2, "web", 40), doc(4, "web", 30), doc(5, "books", 25)])
    q1.processAllAvailable()

    curated = spark.readStream.schema(
        curator.read_corpus().schema
    ).parquet(curator.dataset_path)
    q2 = packer.start(curated.select("doc_id", "source", "text"))
    q2.processAllAvailable()
    q1.stop()
    q2.stop()

    kept = curator.read_corpus()
    packed = packer.read_packed()
    n_curated = kept.count()
    print(f"curated: {n_curated} docs (doc 2's replay copy deduped)")
    for r in sorted(
        packed.collect(), key=lambda r: (r.source, r.start_offset)
    ):
        print(
            f"  packed {r.source:>5} doc {r.doc_id}: tokens {r.n_tokens:>3}"
            f" @ offset {r.start_offset:>3} -> seqs {r.first_seq}..{r.last_seq}"
        )
    st = {r.source: r.base_offset for r in packer.read_state().collect()}
    print(f"packing state (tokens per shard): {st}")
    spark.stop()


if __name__ == "__main__":
    main()
