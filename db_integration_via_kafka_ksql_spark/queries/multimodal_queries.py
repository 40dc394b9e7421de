"""Multimodal query surface: binary payload + typed metadata plumbing.

`mm_payload_meta` is fully oracle-checked (the payload is the UTF-8 byte
string of the text, so octet_length/md5 agree across engines).
`mm_byte_features` exercises the real Arrow/mapInPandas path — its math is
numpy-side, so it gets the driver's rows-only check (no oracle entry), plus
a unit test asserting exact values on known payloads (tests/test_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import multimodal as M
from db_integration_via_kafka_ksql_spark.registry import query


@query(
    "mm_payload_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
           CAST(octet_length(text::BLOB) AS BIGINT) % 64 + 1 AS width,
           CAST(octet_length(text::BLOB) AS BIGINT)
             // (CAST(octet_length(text::BLOB) AS BIGINT) % 64 + 1) AS height,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.payload_meta(load_table(spark, sf_dir, "documents"))


@query("mm_byte_features")  # no oracle: numpy-side math, rows-only check
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.extract_features(media)


@query(
    "mm_frame_sample_counts",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(text::BLOB) // 100 // 10 + 1 AS BIGINT) AS n_sampled
    FROM documents
    """,
)
def mm_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing rollup: sampled frame count per doc
    (sequence(0, n_frames, 10) has floor(n_frames/10)+1 elements)."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return (
        M.frame_sample_plan(media, every_n=10)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
