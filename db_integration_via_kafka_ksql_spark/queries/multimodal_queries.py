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
    driver=False,  # metadata-projection basic twin of mm_byte_features / mm_frame_sample_counts
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


@query(
    "mm_byte_features",
    # DuckDB recomputation of the numpy byte math: expand the UTF-8 blob
    # byte-by-byte via hex() (2 hex chars per byte), then aggregate. The
    # mean is an exact-int sum divided in float64 on both sides (IEEE
    # division of exactly-representable ints — bit-identical), and the
    # 16-bin histogram is flattened to CSV because the driver's value-hash
    # reprs arrays differently across engines (numpy array vs python list).
    oracle="""
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(hex(text::BLOB), 2*i.idx - 1, 2))::BIGINT AS byte
      FROM documents,
           LATERAL unnest(range(1, octet_length(text::BLOB)::BIGINT + 1)) AS i(idx)
    ), agg AS (
      SELECT doc_id,
             sum(byte)::DOUBLE / count(*) AS mean_byte,
             concat_ws(',',
               count(*) FILTER (byte // 16 = 0),  count(*) FILTER (byte // 16 = 1),
               count(*) FILTER (byte // 16 = 2),  count(*) FILTER (byte // 16 = 3),
               count(*) FILTER (byte // 16 = 4),  count(*) FILTER (byte // 16 = 5),
               count(*) FILTER (byte // 16 = 6),  count(*) FILTER (byte // 16 = 7),
               count(*) FILTER (byte // 16 = 8),  count(*) FILTER (byte // 16 = 9),
               count(*) FILTER (byte // 16 = 10), count(*) FILTER (byte // 16 = 11),
               count(*) FILTER (byte // 16 = 12), count(*) FILTER (byte // 16 = 13),
               count(*) FILTER (byte // 16 = 14), count(*) FILTER (byte // 16 = 15)
             ) AS hist_csv
      FROM b GROUP BY doc_id
    )
    SELECT d.doc_id,
           octet_length(d.text::BLOB)::BIGINT AS byte_len,
           coalesce(a.mean_byte, 0.0) AS mean_byte,
           coalesce(a.hist_csv, '0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0') AS hist_csv
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/mapInPandas feature extraction, flattened for the driver's
    value-hash compare (histogram array -> CSV string)."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    feats = M.extract_features(media)
    return feats.select(
        "doc_id",
        "byte_len",
        "mean_byte",
        F.array_join(
            F.transform("byte_histogram", lambda x: x.cast("string")), ","
        ).alias("hist_csv"),
    )


@query(
    "mm_resize_nn",
    driver=False,  # driver window is full; locally parity-gated like driver slots
    # DuckDB recomputes the nearest-neighbor gather byte-for-byte: for each
    # target pixel (y,x) of the 8x8 grid, the source byte is
    # raster[(y*h//8)*w + (x*w//8)] (raster = first w*h payload bytes,
    # row-major), pulled out of hex(payload) two chars at a pixel. h can be
    # 0 for sub-64-byte docs (w = len%64+1 > len) — those resize to an
    # all-zero raster on both sides.
    oracle="""
    WITH g AS (
      SELECT doc_id,
             octet_length(text::BLOB)::BIGINT % 64 + 1 AS w,
             octet_length(text::BLOB)::BIGINT
               // (octet_length(text::BLOB)::BIGINT % 64 + 1) AS h,
             hex(text::BLOB) AS payload_hex
      FROM documents
    ), px AS (
      SELECT doc_id,
             i.y AS y, j.x AS x,
             substr(payload_hex, 2*((y*h//8)*w + (x*w//8)) + 1, 2) AS hx
      FROM g, LATERAL unnest(range(0, 8)) AS i(y),
              LATERAL unnest(range(0, 8)) AS j(x)
      WHERE h > 0
    ), agg AS (
      SELECT doc_id, string_agg(hx, '' ORDER BY y, x) AS resized_hex
      FROM px GROUP BY doc_id
    )
    SELECT g.doc_id, g.w AS src_width, g.h AS src_height,
           coalesce(a.resized_hex, repeat('00', 64)) AS resized_hex
    FROM g LEFT JOIN agg a USING (doc_id)
    """,
)
def mm_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize to a fixed 8x8 raster, hex-exposed so the
    oracle compares the resized bytes bit-for-bit."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    out = M.resize_images(media, dst_width=8, dst_height=8)
    return out.select(
        "doc_id",
        "src_width",
        "src_height",
        F.hex("resized").alias("resized_hex"),
    )


@query(
    "mm_frame_sample_counts",
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
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
