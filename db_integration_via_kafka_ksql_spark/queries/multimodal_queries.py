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
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
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


# Shared CTE chain replaying the integer aHash from the payload bytes:
# geometry (w = L%64+1, h = L//w — the _fake_decode contract), per-block
# integer means over hex-expanded bytes, mean-of-means threshold, bits
# packed into two 32-bit halves (bit k = gy*8+gx, lo = k<32). `hv` holds
# one row per h>0 doc. Matches operators/multimodal.image_ahash bit for
# bit — empty blocks (raster narrower than the 8x8 grid) mean 0, strict >
# against the floor threshold.
_AHASH_CTES = """
    WITH g AS (
      SELECT doc_id,
             octet_length(text::BLOB)::BIGINT % 64 + 1 AS w,
             octet_length(text::BLOB)::BIGINT
               // (octet_length(text::BLOB)::BIGINT % 64 + 1) AS h,
             hex(text::BLOB) AS ph
      FROM documents
    ), blk AS (
      SELECT doc_id, w, h, ph, i.gy AS gy, j.gx AS gx,
             (gy*h)//8 AS y0, ((gy+1)*h)//8 AS y1,
             (gx*w)//8 AS x0, ((gx+1)*w)//8 AS x1
      FROM g, LATERAL unnest(range(0,8)) AS i(gy),
              LATERAL unnest(range(0,8)) AS j(gx)
      WHERE h > 0
    ), bm AS (
      SELECT doc_id, gy, gx,
             CASE WHEN y1 > y0 AND x1 > x0 THEN
               (SELECT CAST(sum(('0x' || substr(ph, 2*(yy.y*w + xx.x) + 1, 2))::BIGINT)
                       AS BIGINT)
                FROM unnest(range(y0, y1)) AS yy(y),
                     unnest(range(x0, x1)) AS xx(x))
               // ((y1 - y0) * (x1 - x0))
             ELSE CAST(0 AS BIGINT) END AS bmean
      FROM blk
    ), thr AS (
      SELECT doc_id, sum(bmean) // 64 AS thr FROM bm GROUP BY 1
    ), hv AS (
      SELECT b.doc_id,
             CAST(sum(CASE WHEN b.gy*8 + b.gx < 32 AND b.bmean > t.thr
                           THEN (CAST(1 AS BIGINT) << (b.gy*8 + b.gx))
                           ELSE 0 END) AS BIGINT) AS ahash_lo,
             CAST(sum(CASE WHEN b.gy*8 + b.gx >= 32 AND b.bmean > t.thr
                           THEN (CAST(1 AS BIGINT) << (b.gy*8 + b.gx - 32))
                           ELSE 0 END) AS BIGINT) AS ahash_hi
      FROM bm b JOIN thr t USING (doc_id) GROUP BY 1
    )
"""


@query(
    "mm_image_ahash",
    # round-16 rotation: veteran returns (2 rounds out)
    # round-10 rotation: promoted into the external driver window
    oracle=_AHASH_CTES
    + """
    SELECT g.doc_id, CAST(g.w AS BIGINT) AS width, CAST(g.h AS BIGINT) AS height,
           coalesce(hv.ahash_lo, CAST(0 AS BIGINT)) AS ahash_lo,
           coalesce(hv.ahash_hi, CAST(0 AS BIGINT)) AS ahash_hi
    FROM g LEFT JOIN hv USING (doc_id)
    """,
)
def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash per payload: the full mapInPandas decode ->
    block-mean -> threshold -> bit-pack chain, value-checked bit for bit
    against a pure-SQL replay of the same integer math (the payload bytes
    are ASCII text, so DuckDB reaches them via hex())."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.image_ahash(media)


@query(
    "mm_image_neardup_pairs",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    # Oracle verifies RESULTS, not the candidate strategy: brute-force
    # all-pairs hamming over the replayed hashes. The Spark side's 4x16-bit
    # banding has EXACT recall at hamming<=3 (pigeonhole), so the two
    # enumerations must agree row-for-row.
    oracle=_AHASH_CTES
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.ahash_lo, b.ahash_lo))
                + bit_count(xor(a.ahash_hi, b.ahash_hi)) AS BIGINT) AS hamming
    FROM hv a JOIN hv b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash_lo, b.ahash_lo))
          + bit_count(xor(a.ahash_hi, b.ahash_hi)) <= 3
    """,
)
def mm_image_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image pairs (hamming <= 3 on the 64-bit
    aHash) via exact-recall 16-bit banding — the multimodal counterpart
    of simhash_pairs, oracle-checked against brute force."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.image_neardup_pairs(media, max_hamming=3)


@query(
    "mm_audio_pcm_stats",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    # round-12 rotation: promoted into the driver window
    # DuckDB replays the s16le interpretation from hex-expanded bytes:
    # sample k = byte(2k) + 256*byte(2k+1), signed via the 32768 fold —
    # identical integer math to the numpy int16 view.
    oracle="""
    WITH g AS (
      SELECT doc_id, hex(text::BLOB) AS ph,
             octet_length(text::BLOB)::BIGINT // 2 AS n_samples
      FROM documents
    ), s AS (
      SELECT doc_id,
             ('0x' || substr(ph, 4*i.k + 1, 2))::BIGINT
             + 256 * ('0x' || substr(ph, 4*i.k + 3, 2))::BIGINT AS u
      FROM g, LATERAL unnest(range(0, n_samples)) AS i(k)
    ), v AS (
      SELECT doc_id, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS x FROM s
    ), agg AS (
      SELECT doc_id,
             CAST(sum(abs(x)) AS BIGINT) AS sum_abs,
             CAST(max(abs(x)) AS BIGINT) AS peak,
             CAST(sum(x * x) AS BIGINT) AS sum_sq,
             CAST(count(*) FILTER (abs(x) < 512) AS BIGINT) AS n_silent
      FROM v GROUP BY 1
    )
    SELECT g.doc_id, g.n_samples,
           coalesce(a.sum_abs, 0) AS sum_abs,
           coalesce(a.peak, 0) AS peak,
           coalesce(a.sum_sq, 0) AS sum_sq,
           CASE WHEN g.n_samples > 0
                THEN coalesce(a.n_silent, 0) * 1000 // g.n_samples
                ELSE CAST(0 AS BIGINT) END AS silence_permille
    FROM g LEFT JOIN agg a USING (doc_id)
    """,
)
def mm_audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality waveform screen: payloads as raw s16le PCM ->
    integer energy / peak / silence-permille stats via mapInPandas,
    value-checked bit for bit against the pure-SQL replay (the audio
    counterpart of mm_image_ahash)."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.audio_pcm_stats(media)


def _cdc_oracle(min_size: int = 48, mask_bits: int = 6, max_size: int = 512) -> str:
    """Full SQL replay of the gear-hash CDC chunker (r15 verdict Next
    #5 — closing the 'sequential byte recurrence, not SQL-expressible'
    adjudication, which turned out to be wrong on both counts):

    - the rolling hash h_i = (h_{i-1} << 1 + gear[b_i]) mod 2^64 has a
      CLOSED FORM — the left shift decays every byte's influence to
      zero after 64 positions, so h_i = sum over the trailing 64 bytes
      of gear[b_j] << (i-j), a windowed sum (each term reduced mod 2^64
      in HUGEINT, 64 contribution rows per byte);
    - the cut chain (first candidate >= prev+min, force-cut at
      prev+max, remainder at n) IS sequential, but over ~n/2^mask_bits
      candidates, and walks as a RECURSIVE CTE whose step is a pure
      join: next = LEAST(next_candidate(prev+min), prev+max, n), with
      next_candidate precomputed for every position as a running min
      from the right (branch-order equivalence with the python model's
      if/elif proved by case analysis; differentially tested on
      force-cut / remainder / sub-min / resynchronization corpora in
      tests/test_content_chunking.py).

    Slicing note: chunk_md5 slices the payload as VARCHAR characters,
    which equals byte slicing because the corpus is pure ASCII — this
    DuckDB build has no BLOB substring/md5. The precondition is
    ENFORCED by tests/test_testdata_schema.py::
    test_documents_text_is_pure_ascii (octet_length == length at every
    sf), so a driver regeneration that ships non-ASCII text fails there
    with a named cause instead of an opaque hash mismatch here. The
    Spark side is byte-exact regardless.
    """
    import hashlib

    gear = [
        int(hashlib.md5(f"gear{b}".encode()).hexdigest()[:16], 16)
        for b in range(256)
    ]
    gear_sql = "[" + ", ".join(f"'{v}'::UBIGINT" for v in gear) + "]"
    m64 = str(1 << 64)
    big = str((1 << 63) - 1)
    return f"""
    WITH pay AS MATERIALIZED (
      SELECT doc_id, text, hex(text::BLOB) AS ph,
             octet_length(text::BLOB)::BIGINT AS n
      FROM documents WHERE text IS NOT NULL AND octet_length(text::BLOB) > 0
    ),
    byt AS MATERIALIZED (
      SELECT doc_id, n,
             unnest(generate_series(1, n)) AS j,
             unnest([{gear_sql}[('0x' || ph[2*i-1:2*i])::INT + 1]
                     for i in generate_series(1, n)]) AS g
      FROM pay
    ),
    contrib AS (
      SELECT doc_id, n, j + d AS i,
             (g::HUGEINT * (1::HUGEINT << d)) % {m64} AS c
      FROM byt, (SELECT unnest(generate_series(0, 63)) AS d)
      WHERE j + d <= n
    ),
    h AS MATERIALIZED (
      SELECT doc_id, i, (SUM(c) % {m64})::UBIGINT AS h
      FROM contrib GROUP BY doc_id, i
    ),
    cand AS MATERIALIZED (
      SELECT doc_id, i FROM h WHERE h % {1 << mask_bits} = 0
    ),
    posn AS (
      SELECT doc_id, n, unnest(generate_series(1, n)) AS p FROM pay
    ),
    nextc AS MATERIALIZED (
      SELECT doc_id, p,
             MIN(ci) OVER (
                 PARTITION BY doc_id ORDER BY p DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS nxt
      FROM (
          SELECT posn.doc_id, posn.p, c.i AS ci
          FROM posn LEFT JOIN cand c
            ON c.doc_id = posn.doc_id AND c.i = posn.p
      )
    ),
    cuts AS (
      WITH RECURSIVE walk(doc_id, cut) AS (
          SELECT doc_id, 0::BIGINT FROM pay
          UNION ALL
          SELECT w.doc_id,
                 LEAST(COALESCE(nx.nxt, {big}), w.cut + {max_size}, p.n)
          FROM walk w
          JOIN pay p USING (doc_id)
          LEFT JOIN nextc nx
            ON nx.doc_id = w.doc_id AND nx.p = w.cut + {min_size}
          WHERE w.cut < p.n
      )
      SELECT * FROM walk
    ),
    chunks AS (
      SELECT c.doc_id,
             cut - COALESCE(
                 LAG(cut) OVER (PARTITION BY c.doc_id ORDER BY cut), 0
             ) AS length,
             md5(p.text[(COALESCE(
                 LAG(cut) OVER (PARTITION BY c.doc_id ORDER BY cut), 0
             ) + 1) : cut]) AS chunk_md5
      FROM cuts c JOIN pay p USING (doc_id)
      WHERE cut > 0
    )
    SELECT chunk_md5,
           CAST(MIN(length) AS BIGINT) AS chunk_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST((COUNT(*) - 1) * MIN(length) AS BIGINT) AS saved_bytes
    FROM chunks
    GROUP BY chunk_md5
    HAVING COUNT(*) > 1
    """


@query(
    "mm_cdc_chunk_dedup",
    # r17 rotation: promoted into the driver window
    # ORACLE-BACKED since r16 (verdict Next #5): the gear hash has a
    # windowed closed form and the cut chain walks as a recursive CTE —
    # see _cdc_oracle. The sequential python model + resynchronization
    # property (tests/test_content_chunking.py) stay as cross-checks.
    oracle=_cdc_oracle(),
)
def mm_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup accounting over the corpus payloads
    (multimodal.content_defined_chunks -> cdc_chunk_dedup_report): the
    bytes a content-addressed store saves when near-identical binary
    payloads share gear-boundary chunks. Output: (chunk_md5, chunk_bytes,
    n_copies, saved_bytes), duplicated chunks only."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.cdc_chunk_dedup_report(M.content_defined_chunks(media))


# shared CTE chain: hex-expanded s16le fold -> 65 equal-segment energies
# -> 64 energy-delta bits -> two 32-bit halves (the exact integer chain
# of multimodal.audio_energy_fingerprint; segment of sample k is
# k*65 DIV n_samples, matching the operator's ceil-boundary reduceat)
_AUDIO_FP_CTES = """
    WITH g AS (
      SELECT doc_id, hex(text::BLOB) AS ph,
             octet_length(text::BLOB)::BIGINT // 2 AS n_samples
      FROM documents
    ), s AS (
      SELECT doc_id, n_samples, i.k AS k,
             ('0x' || substr(ph, 4*i.k + 1, 2))::BIGINT
             + 256 * ('0x' || substr(ph, 4*i.k + 3, 2))::BIGINT AS u
      FROM g, LATERAL unnest(range(0, n_samples)) AS i(k)
    ), v AS (
      SELECT doc_id, k * 65 // n_samples AS f,
             CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS x
      FROM s
    ), e0 AS (
      SELECT doc_id, f, CAST(sum(x * x) AS BIGINT) AS e FROM v GROUP BY 1, 2
    ), fr AS (
      SELECT g.doc_id, tt.t FROM g, LATERAL unnest(range(0, 65)) AS tt(t)
      WHERE g.n_samples > 0
    ), e AS (
      SELECT fr.doc_id, fr.t, coalesce(e0.e, 0) AS e
      FROM fr LEFT JOIN e0 ON e0.doc_id = fr.doc_id AND e0.f = fr.t
    ), bits AS (
      SELECT c.doc_id, p.t AS bit,
             CASE WHEN c.e > p.e THEN 1 ELSE 0 END AS b
      FROM e c JOIN e p ON c.doc_id = p.doc_id AND c.t = p.t + 1
    ), fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN bit < 32
                           THEN b * (CAST(1 AS BIGINT) << bit)
                           ELSE 0 END) AS BIGINT) AS fp_lo,
             CAST(sum(CASE WHEN bit >= 32
                           THEN b * (CAST(1 AS BIGINT) << (bit - 32))
                           ELSE 0 END) AS BIGINT) AS fp_hi
      FROM bits GROUP BY 1
    ), fpv AS (
      SELECT g.doc_id, g.n_samples,
             coalesce(fp.fp_lo, 0) AS fp_lo, coalesce(fp.fp_hi, 0) AS fp_hi
      FROM g LEFT JOIN fp USING (doc_id)
    )
"""


@query(
    "mm_audio_fingerprint",
    driver=False,  # round-16 rotation: slot ceded to mm_image_ahash's return (audio keeps mm_audio_neardup_pairs)
    oracle=_AUDIO_FP_CTES
    + """
    SELECT doc_id, n_samples, fp_lo, fp_hi FROM fpv
    """,
)
def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit time-normalized energy-delta audio fingerprint per payload
    (Haitsma-Kalker ISMIR'02 family, temporal bits): 65 equal waveform
    segments -> integer energies -> sign-of-delta bits, packed into two
    32-bit halves. All integer, so the oracle replays the whole chain
    from hex-expanded payload bytes — the strongest check of the
    mapInPandas segmentation math."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.audio_energy_fingerprint(media)


@query(
    "mm_audio_neardup_pairs",
    # round-14 rotation: promoted into the external driver window
    # Oracle verifies RESULTS, not the candidate strategy: brute-force
    # all-pairs hamming over the replayed fingerprints; the Spark side's
    # banding has EXACT recall at the radius (pigeonhole), so the two
    # enumerations must agree row-for-row.
    oracle=_AUDIO_FP_CTES
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp_lo, b.fp_lo))
                + bit_count(xor(a.fp_hi, b.fp_hi)) AS BIGINT) AS hamming
    FROM fpv a JOIN fpv b ON a.doc_id < b.doc_id
    WHERE a.n_samples > 0 AND b.n_samples > 0
      AND bit_count(xor(a.fp_lo, b.fp_lo))
          + bit_count(xor(a.fp_hi, b.fp_hi)) <= 3
    """,
)
def mm_audio_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs at hamming <= 3 over the energy-delta
    fingerprint — the audio member of the near-dup family, sharing the
    image path's banded candidate engine (pigeonhole-exact recall at the
    radius, candidates by equi-join, never all-pairs)."""
    media = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.audio_neardup_pairs(media, max_hamming=3)
