"""Sketch query surface (HLL / KMV / Count-Min) with DuckDB oracles.

Each oracle replays the sketch construction hash-for-hash: md5-derived
60-bit hashes, integer register/counter math, and fixed-order IEEE double
estimates (the HLL linear-counting ln comes from functions/detmath.py's
basic-ops series, identical text in both dialects), so values are
bit-identical across engines. Estimates sit next to the exact answer in
the same row — the accuracy contract is asserted in
tests/test_sketches.py, the cross-engine equality here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions.detmath import det_ln_sql, dlit
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import sketches as SK
from db_integration_via_kafka_ksql_spark.registry import query

HLL_P = 10
_M = 1 << HLL_P
_W_BITS = SK.HASH_BITS - HLL_P
_FULL = 1 << (_W_BITS + 1)
_ALPHA = dlit(SK.hll_alpha(HLL_P))
_H60 = "('0x' || substr(md5({v}), 1, 15))::BIGINT"
_LC = det_ln_sql(
    f"(CAST({_M} AS DOUBLE) / CAST(greatest(zero_registers, 1) AS DOUBLE))",
    "duckdb",
)

KMV_K = 256
_POW60 = dlit(1 << SK.HASH_BITS)

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_PROBES = 20


@query(
    "sketch_hll_distinct_users",
    # round-16 rotation: veteran returns (3 rounds out)
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
    WITH h AS (
        SELECT event_type,
               {_H60.format(v="CAST(user_id AS VARCHAR)")} AS h
        FROM events
    ),
    reg AS (
        SELECT event_type, h // {1 << _W_BITS} AS bucket,
               max(CASE WHEN h % {1 << _W_BITS} = 0 THEN {_W_BITS + 1}
                        ELSE {_W_BITS + 1} - length(bin(h % {1 << _W_BITS}))
                   END) AS rho
        FROM h GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type, count(*) AS n_regs,
               CAST(sum(CAST(1 AS BIGINT) << ({_W_BITS + 1} - rho)) AS BIGINT)
                 AS s_present
        FROM reg GROUP BY 1
    ),
    base AS (
        SELECT event_type,
               {_M} - n_regs AS zero_registers,
               s_present + ({_M} - n_regs) * {_FULL} AS register_sum
        FROM agg
    ),
    est AS (
        SELECT event_type, zero_registers, register_sum,
               CASE WHEN zero_registers > 0
                         AND ({_ALPHA} * {dlit(_M * _M)} * {dlit(_FULL)}
                              / CAST(register_sum AS DOUBLE)) <= {dlit(2.5 * _M)}
                    THEN {dlit(_M)} * {_LC}
                    ELSE ({_ALPHA} * {dlit(_M * _M)} * {dlit(_FULL)}
                          / CAST(register_sum AS DOUBLE))
               END AS e
        FROM base
    ),
    ex AS (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
                 AS exact_distinct
        FROM events GROUP BY 1
    )
    SELECT est.event_type, {_M} AS m, zero_registers, register_sum,
           CAST(floor(e) AS BIGINT) AS hll_estimate, exact_distinct
    FROM est JOIN ex ON est.event_type = ex.event_type
    """,
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event type, exact count alongside.

    Scale path: the register frame is <=1024 rows per event type however
    many billions of events feed it, and merges across days/partitions by
    per-bucket max (proven lossless in tests/test_sketches.py). The exact
    column exists to expose the error; at 100 TB you keep only the
    register frame."""
    events = load_table(spark, sf_dir, "events")
    regs = SK.hll_registers(events, ["event_type"], F.col("user_id"), p=HLL_P)
    est = SK.hll_estimate(regs, ["event_type"], p=HLL_P)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(F.broadcast(exact), "event_type")


@query(
    "sketch_kmv_source_token_overlap",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT source, {_H60.format(v="tok")} AS h
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents)
    ),
    sk AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM toks
        ) WHERE rn <= {KMV_K}
    ),
    g AS (SELECT DISTINCT source FROM sk),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b
        FROM g a JOIN g b ON a.source < b.source
    ),
    u0 AS (
        SELECT p.source_a, p.source_b, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.source_a
        UNION ALL
        SELECT p.source_a, p.source_b, s.h, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.source_b
    ),
    u1 AS (
        SELECT source_a, source_b, h, max(in_a) AS in_a, max(in_b) AS in_b
        FROM u0 GROUP BY 1, 2, 3
    ),
    us AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source_a, source_b ORDER BY h) AS rn
            FROM u1
        ) WHERE rn <= {KMV_K}
    ),
    agg AS (
        SELECT source_a, source_b,
               CAST(count(*) AS BIGINT) AS ku,
               CAST(sum(in_a * in_b) AS BIGINT) AS x_common,
               max(h) AS max_h
        FROM us GROUP BY 1, 2
    )
    SELECT source_a, source_b, ku, x_common,
           x_common * 1000000 // ku AS jaccard_micro,
           CASE WHEN ku < {KMV_K} THEN ku
                ELSE CAST(floor({dlit(KMV_K - 1)} * {_POW60}
                                / CAST(max_h AS DOUBLE)) AS BIGINT)
           END AS union_est,
           (x_common * 1000000 // ku)
             * (CASE WHEN ku < {KMV_K} THEN ku
                     ELSE CAST(floor({dlit(KMV_K - 1)} * {_POW60}
                                     / CAST(max_h AS DOUBLE)) AS BIGINT)
                END) // 1000000 AS inter_est
    FROM agg
    """,
)
def sketch_kmv_source_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra between sources' token vocabularies.

    Scale path: each source's raw token stream collapses to k=256 hashes;
    every pairwise union/intersection/Jaccard estimate then costs
    O(pairs*k) — no cross-corpus join ever touches raw tokens."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    sketch = SK.kmv_sketch(toks, ["source"], F.col("tok"), k=KMV_K)
    return SK.kmv_pairwise_overlap(sketch, "source", k=KMV_K)


@query(
    "sketch_cms_token_counts",
    driver=False,  # round-12 rotation: stable veteran slot ceded to events_value_exact_quantiles
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    exact AS (
        SELECT tok AS token, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM toks GROUP BY 1
    ),
    probes AS (
        SELECT token, exact_cnt FROM exact
        ORDER BY exact_cnt DESC, token ASC LIMIT {CMS_PROBES}
    ),
    ii AS (SELECT unnest([{", ".join(str(i) for i in range(CMS_DEPTH))}]) AS i),
    counters AS (
        SELECT i, {_H60.format(v="CAST(i AS VARCHAR) || ':' || tok")}
                     % {CMS_WIDTH} AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM toks, ii GROUP BY 1, 2
    ),
    pb AS (
        SELECT p.token, p.exact_cnt, ii.i,
               {_H60.format(v="CAST(ii.i AS VARCHAR) || ':' || p.token")}
                 % {CMS_WIDTH} AS bucket
        FROM probes p, ii
    )
    SELECT pb.token, pb.exact_cnt,
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_estimate
    FROM pb LEFT JOIN counters c ON c.i = pb.i AND c.bucket = pb.bucket
    GROUP BY 1, 2
    """,
)
def sketch_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the corpus's top heavy hitters.

    Scale path: the counter grid is depth*width = 4096 rows total, built
    with one partially-aggregated groupBy over the token stream; the
    probe join is a broadcast of that fixed-size grid. The exact counts
    ride along to expose the (one-sided) error."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    counters = SK.cms_build(toks, F.col("tok"), depth=CMS_DEPTH, width=CMS_WIDTH)
    probes = (
        toks.groupBy(F.col("tok").alias("token"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
        .limit(CMS_PROBES)
    )
    return SK.cms_estimate(
        counters, probes, "token", depth=CMS_DEPTH, width=CMS_WIDTH
    )


LOGHIST_QS = (500, 900, 990)


def _loghist_oracle() -> str:
    from db_integration_via_kafka_ksql_spark.operators.sketches import (
        _loghist_bucket_sql,
    )

    bucket = _loghist_bucket_sql("value", "duckdb")
    qs = ", ".join(str(q) for q in LOGHIST_QS)
    return f"""
    WITH b AS (
        SELECT event_type, {bucket} AS bucket FROM events
    ),
    h AS (
        SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM b GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_total
        FROM h GROUP BY 1
    ),
    c AS (
        SELECT event_type, bucket,
               CAST(sum(cnt) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum
        FROM h
    ),
    q AS (SELECT unnest([{qs}]) AS q_permille),
    covered AS (
        SELECT c.event_type, q.q_permille, c.bucket, c.cum, t.n_total,
               row_number() OVER (
                   PARTITION BY c.event_type, q.q_permille ORDER BY c.bucket
               ) AS rn
        FROM c JOIN t USING (event_type) CROSS JOIN q
        WHERE c.cum * 1000 >= q.q_permille * t.n_total
    )
    SELECT event_type, CAST(q_permille AS BIGINT) AS q_permille,
           bucket, cum, n_total
    FROM covered WHERE rn = 1
    """


@query(
    "sketch_loghist_value_quantiles",
    # round-13 rotation: promoted into the driver window
    oracle=_loghist_oracle(),
)
def sketch_loghist_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value quantiles from a log-bucketed (DDSketch-shape)
    histogram (operators/sketches.loghist_sketch): fixed a-priori bucket
    geometry — no bounds pass, state O(log range) per group, counts
    merge by addition (the streamable property) — with the bucket index
    built on the deterministic arctanh-series ln so the oracle replays
    it bit for bit. The mergeable twin of the equi-width
    events_value_quantiles_hist."""
    from db_integration_via_kafka_ksql_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    h = SK.loghist_sketch(ev, ["event_type"], "value")
    return SK.loghist_quantiles(h, ["event_type"], LOGHIST_QS)


MG_K = 20


@query(
    "sketch_mg_heavy_tokens",
    driver=False,  # round-16 rotation: slot ceded to sketch_hll_distinct_users' return (mg keeps heavy_sources)
    # exact integer replay: counts, single-row total, and the Misra-Gries
    # support threshold as a cross-multiplication (cnt*(k+1) > n) — no
    # division anywhere
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS item FROM documents
    ),
    c AS (
        SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY item
    ),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c)
    SELECT item, cnt, n_total
    FROM c, n
    WHERE cnt * {MG_K + 1} > n_total
    """,
)
def sketch_mg_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guaranteed heavy hitters over the document token stream
    (operators/sketches.heavy_hitters_exact): every token whose count
    clears the Misra-Gries n/(k+1) support threshold — the batch ground
    truth for the k-counter streaming MG state
    (streaming/heavyhitters.py)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("item")
    )
    return SK.heavy_hitters_exact(toks, "item", k=MG_K)


MG_SRC_K = 18


@query(
    "sketch_mg_heavy_sources",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    # weighted MG support: the measure is an integer weight SUM
    # (n_chars), threshold total_weight/(k+1) as a cross-multiplication
    oracle=f"""
    WITH c AS (
        SELECT source AS item, CAST(sum(n_chars) AS BIGINT) AS cnt
        FROM documents GROUP BY source
    ),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c)
    SELECT item, cnt, n_total
    FROM c, n
    WHERE cnt * {MG_SRC_K + 1} > n_total
    """,
)
def sketch_mg_heavy_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED heavy hitters: which sources dominate the corpus by
    character mass (weight_col form of heavy_hitters_exact) — the
    mixture-planning question 'is any source past its fair share',
    answered by the same MG support threshold over weight sums."""
    docs = load_table(spark, sf_dir, "documents")
    return SK.heavy_hitters_exact(
        docs.select(F.col("source"), F.col("n_chars")),
        "source",
        k=MG_SRC_K,
        weight_col="n_chars",
    )


CMSJ_DEPTH = 4
CMSJ_WIDTH = 256

_CMSJ_II = ", ".join(str(i) for i in range(CMSJ_DEPTH))


@query(
    "sketch_cms_join_size",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-14 rotation: promoted into the external driver window
    oracle=f"""
    WITH ii AS (SELECT unnest([{_CMSJ_II}]) AS i),
    la AS (
        SELECT ii.i,
               {_H60.format(v="CAST(ii.i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")}
                 % {CMSJ_WIDTH} AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events, ii GROUP BY 1, 2
    ),
    rb AS (
        SELECT ii.i,
               {_H60.format(v="CAST(ii.i AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)")}
                 % {CMSJ_WIDTH} AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders, ii GROUP BY 1, 2
    ),
    est AS (
        SELECT la.i, CAST(sum(la.cnt * rb.cnt) AS BIGINT) AS est
        FROM la JOIN rb ON la.i = rb.i AND la.bucket = rb.bucket
        GROUP BY 1
    ),
    ex AS (
        SELECT CAST(count(*) AS BIGINT) AS join_size_exact
        FROM events e JOIN orders o ON e.user_id = o.o_custkey
    )
    SELECT ex.join_size_exact,
           (SELECT CAST(CASE WHEN count(*) = {CMSJ_DEPTH} THEN min(est)
                             ELSE 0 END AS BIGINT)
            FROM est) AS join_size_est
    FROM ex
    """,
)
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from CMS inner products (Cormode &
    Muthukrishnan 2005 §4.2): how big would events JOIN orders on
    user_id = o_custkey be, WITHOUT running the join — each side
    reduces to a depth x width counter grid in one partially-aggregated
    pass and the estimate is integer algebra over the two grids
    (one-sided: always >= the exact size, which sits beside it in the
    same row; the accuracy contract lives in tests/test_sketches.py).
    The planner's broadcast-vs-shuffle/skew gate at 100 TB: the exact
    count here is the oracle's ground truth, not part of the sketch."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("k")
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k")
    )
    exact = ev.join(od, "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("join_size_exact")
    )
    est = SK.cms_join_size(
        ev,
        F.col("k").cast("string"),
        od,
        F.col("k").cast("string"),
        depth=CMSJ_DEPTH,
        width=CMSJ_WIDTH,
    )
    return exact.crossJoin(est)
