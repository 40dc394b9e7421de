"""Mergeable probabilistic sketches: HyperLogLog, KMV (theta), Count-Min.

At 100 TB, exact ``COUNT(DISTINCT x)`` / set-overlap / per-term frequency
all force a shuffle of the full distinct domain; sketches replace that
with fixed-size state that partially aggregates map-side and merges
associatively, so the shuffle carries O(sketch) bytes per group no matter
how many rows feed it:

- **HyperLogLog** registers: <= 2^p rows per group (p=10 -> 1024), built
  with one hash + max-aggregate; ~3.25% stderr at p=10. Mergeable via
  per-bucket ``max`` (``hll_merge``), so per-partition / per-day register
  frames roll up without touching raw data again.
- **KMV / theta sketch**: the k smallest distinct hash values per group;
  supports distinct-count AND set algebra (union/intersection/Jaccard
  between groups) — the scale path for "how much does corpus A overlap
  corpus B" without a full anti-join.
- **Count-Min**: depth*width counter grid; point frequency estimates with
  one-sided error. The grid (4*1024 rows here) is the whole shuffle
  output regardless of corpus size.

Every formula is integer math or a fixed-order IEEE double sequence
(incl. the HLL linear-counting ``ln`` via functions/detmath.py), so the
DuckDB oracles in queries/sketch_queries.py match bit-for-bit.

Reference parity: the reference engine exposes no sketch surface
(reference: deploy-ksql-cli.sh — plain COUNT aggregates only); this
module is part of the repo's LLM-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions import text as T
from db_integration_via_kafka_ksql_spark.functions.detmath import det_ln_sql

HASH_NIBBLES = 15  # 60-bit non-negative hashes (functions/text.hex_hash_int)
HASH_BITS = 4 * HASH_NIBBLES


def _hash60(value: Column) -> Column:
    return T.hex_hash_int(value.cast("string"), HASH_NIBBLES)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_alpha(p: int) -> float:
    """Bias-correction constant for m = 2^p registers (Flajolet et al.)."""
    m = 1 << p
    if m < 128:
        raise ValueError("p < 7 needs small-m alpha constants; use p >= 7")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, group_cols: list[str], value: Column, p: int = 10
) -> DataFrame:
    """(group, bucket, rho) register frame: <= 2^p rows per group.

    bucket = top p bits of the 60-bit hash; rho = 1 + leading zeros of
    the remaining (60-p)-bit window.  groupBy(max) partially aggregates
    map-side, so each input partition emits at most 2^p rows per group.
    """
    w_bits = HASH_BITS - p
    h = _hash60(value)
    w = h.bitwiseAND(F.lit((1 << w_bits) - 1))
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            F.shiftright(h, w_bits).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge register frames built over disjoint (or overlapping) slices:
    per-bucket max. The HLL merge is lossless — merged registers equal
    the registers of the unioned raw data."""
    out = register_frames[0]
    for other in register_frames[1:]:
        out = out.unionByName(other)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Cardinality estimate per group from a register frame.

    Emits (group, m, zero_registers, register_sum, hll_estimate).
    register_sum is the exact integer S = sum over all m buckets of
    2^(w_bits+1-rho) (absent buckets contribute rho=0); the raw estimate
    alpha*m^2*2^(w_bits+1)/S and the small-range linear-counting branch
    m*ln(m/V) are fixed-order double math (det ln), bit-identical to the
    DuckDB oracle.
    """
    m = 1 << p
    w_bits = HASH_BITS - p
    full = 1 << (w_bits + 1)
    alpha = hll_alpha(p)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {w_bits + 1} - rho)")
        ).alias("s_present"),
    )
    v = (F.lit(m).cast("long") - F.col("n_regs")).alias("zero_registers")
    s = (F.col("s_present") + (F.lit(m) - F.col("n_regs")) * F.lit(full)).alias(
        "register_sum"
    )
    base = agg.select(*group_cols, v, s)
    raw = (
        F.lit(alpha)
        * F.lit(float(m * m))
        * F.lit(float(full))
        / F.col("register_sum").cast("double")
    )
    lc = F.lit(float(m)) * F.expr(
        det_ln_sql(
            f"(CAST({m} AS DOUBLE) / CAST(greatest(zero_registers, 1) AS DOUBLE))",
            "spark",
        )
    )
    est = F.when(
        (F.col("zero_registers") > 0) & (raw <= F.lit(2.5 * m)), lc
    ).otherwise(raw)
    return base.select(
        *group_cols,
        F.lit(m).alias("m"),
        "zero_registers",
        "register_sum",
        F.floor(est).cast("long").alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch
# ---------------------------------------------------------------------------

def kmv_sketch(
    df: DataFrame, group_cols: list[str], value: Column, k: int = 256
) -> DataFrame:
    """k minimum distinct 60-bit hash values per group: (group, h).

    Distinct-by-hash first (partial-aggregating groupBy), then a per-group
    rank prune. The per-group sort touches only distinct hashes; at scale
    a per-partition top-k pre-prune (bounded k rows per partition per
    group) would feed the final rank — the rank input here is already
    the distinct frame, never raw rows.
    """
    from pyspark.sql.window import Window

    hashed = (
        df.select(*group_cols, _hash60(value).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    win = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_distinct_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """(group, n_hashes, kmv_estimate): (k-1)*2^60/kth_min, exact below k."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("kth")
    )
    est = F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << HASH_BITS)) / F.col("kth").cast("double")
    )
    return agg.select(
        *group_cols,
        "n_hashes",
        F.floor(est).cast("long").alias("kmv_estimate"),
    )


def kmv_pairwise_overlap(
    sketch: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """Jaccard / union / intersection estimates for every group pair.

    Theta-sketch set algebra: the union sketch is the k smallest hashes of
    the union of the two sketches; within it, the fraction also present in
    both input sketches estimates Jaccard. Work is O(pairs * k) — never
    touches raw data, which is the point at 100 TB.

    Emits (source_a, source_b, ku, x_common, jaccard_micro, union_est,
    inter_est); jaccard_micro = X*1e6 DIV ku (integer), union_est via the
    same (k-1)*2^60/max_h double path as kmv_distinct_estimate.

    The sketch frame feeds three plan branches (group list + both pair
    sides); it is eagerly localCheckpoint-ed first so the distinct+rank
    subtree over the raw token stream is executed once, not once per
    branch (the unionAll double-compute trap — simhash precedent).
    """
    from pyspark.sql.window import Window

    sketch = sketch.localCheckpoint(eager=True)
    groups = sketch.select(F.col(group_col).alias("g")).distinct()
    pairs = (
        groups.alias("a")
        .join(groups.withColumnRenamed("g", "g2").alias("b"), F.col("g") < F.col("g2"))
        .select(F.col("g").alias("source_a"), F.col("g2").alias("source_b"))
    )
    side_a = pairs.join(
        sketch.select(F.col(group_col).alias("source_a"), "h"), "source_a"
    ).select("source_a", "source_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    side_b = pairs.join(
        sketch.select(F.col(group_col).alias("source_b"), "h"), "source_b"
    ).select("source_a", "source_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    both = (
        side_a.unionByName(side_b)
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    win = Window.partitionBy("source_a", "source_b").orderBy("h")
    union_sketch = (
        both.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") <= k)
    )
    agg = union_sketch.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("ku"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("x_common"),
        F.max("h").alias("max_h"),
    )
    jac = F.expr("x_common * 1000000 DIV ku")
    union_est = F.when(F.col("ku") < k, F.col("ku")).otherwise(
        F.floor(
            F.lit(float(k - 1))
            * F.lit(float(1 << HASH_BITS))
            / F.col("max_h").cast("double")
        ).cast("long")
    )
    return agg.select(
        "source_a",
        "source_b",
        "ku",
        "x_common",
        jac.alias("jaccard_micro"),
        union_est.alias("union_est"),
        (jac * union_est).alias("_num"),
    ).select(
        "source_a",
        "source_b",
        "ku",
        "x_common",
        "jaccard_micro",
        "union_est",
        F.expr("_num DIV 1000000").alias("inter_est"),
    )


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def _cms_bucket(term: Column, i: int, width: int) -> Column:
    return T.hex_hash_int(
        F.concat(F.lit(str(i)), F.lit(":"), term), HASH_NIBBLES
    ) % width


def cms_build(
    df: DataFrame, term: Column, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min counter grid (i, bucket, cnt): depth*width rows total.

    Each input row contributes one increment per of the ``depth`` hash
    rows; the groupBy partially aggregates, so the shuffle moves at most
    depth*width rows per input partition no matter the corpus size.
    """
    rows = df.select(
        F.posexplode(
            F.array(*[_cms_bucket(term, i, width) for i in range(depth)])
        ).alias("i", "bucket")
    )
    return rows.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    counters: DataFrame, probes: DataFrame, term_col: str,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point frequency estimates (min over depth counters) for probe terms.

    ``probes`` is small (a term list) — broadcast against the counter
    grid; output keeps every probe column and adds ``cms_estimate``.
    One-sided error: estimate >= true count always.
    """
    probe_cols = probes.columns
    pb = probes.select(
        "*",
        F.posexplode(
            F.array(*[_cms_bucket(F.col(term_col), i, width) for i in range(depth)])
        ).alias("i", "bucket"),
    )
    joined = pb.join(F.broadcast(counters), ["i", "bucket"], "left")
    return joined.groupBy(*probe_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_estimate")
    )


def cms_join_size(
    left: DataFrame,
    left_key: Column,
    right: DataFrame,
    right_key: Column,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Equi-join cardinality estimate from Count-Min inner products
    (Cormode & Muthukrishnan, "An improved data stream summary: the
    count-min sketch and its applications", J. Algorithms 2005 §4.2):
    |L JOIN R on k| = sum_k fL(k)*fR(k), and per hash row i the grid
    inner product est_i = sum_b cntL[i,b]*cntR[i,b] OVERcounts that sum
    by exactly the colliding cross terms — so min_i est_i is a
    one-sided estimate (est >= true, overshoot ~ |L|*|R|/width per row,
    best-of-depth independent rows).

    This is the planner's question — "how big would this join be?" —
    answered WITHOUT running the join: each side reduces to a
    depth*width counter grid in one partially-aggregated pass (the
    shuffle moves at most depth*width rows per input partition
    regardless of corpus size), and the estimate is integer sketch
    algebra over two tiny grids. At 100 TB the join itself might
    shuffle terabytes; the sketches answer first whether it should run
    at all (skew detection, broadcast-vs-shuffle choice, cost gates).

    All-integer math — estimates are bit-identical across engines.
    Output: one row (join_size_est bigint).
    """
    ca = cms_build(left, left_key, depth=depth, width=width)
    cb = cms_build(right, right_key, depth=depth, width=width)
    per_row = (
        ca.alias("a")
        .join(cb.alias("b"), ["i", "bucket"])  # absent buckets are 0 terms
        .groupBy("i")
        .agg(
            F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("est")
        )
    )
    # a hash row with NO colliding buckets has inner product 0 — and 0 is
    # then the whole estimate (0 >= true join size forces true = 0); the
    # groupBy only yields rows for i values WITH matches, so min() alone
    # would overestimate — any missing row (count < depth) means 0
    return per_row.agg(
        F.coalesce(
            F.when(F.count(F.lit(1)) == depth, F.min("est")), F.lit(0)
        )
        .cast("bigint")
        .alias("join_size_est")
    )


# --- log-bucketed quantile histogram (DDSketch shape; Masson et al.,
# "DDSketch: a fast and fully-mergeable quantile sketch", VLDB 2019) ----

LOGHIST_GAMMA = 1.02          # relative accuracy ~1% (alpha = (g-1)/(g+1))
LOGHIST_SCALE = 1_000_000     # fixed-point prescale: det_ln needs x >= 1


def _loghist_bucket_sql(value_sql: str, dialect: str) -> str:
    """Bucket index of a positive value: ceil(ln(w) / ln(gamma)) over the
    fixed-point prescale w = floor(v * 1e6) (det_ln's domain is x >= 1;
    the prescale shifts every bucket boundary identically, preserving
    the relative-accuracy guarantee down to 1e-6 absolute). ln(gamma) is
    ONE python-computed literal embedded in both dialects, and ln(w) is
    the deterministic arctanh-series ln — the whole index is therefore
    bit-identical across engines. Non-positive values clamp to w = 1
    (bucket 0): this corpus has none; a signed variant mirrors the
    buckets."""
    import math

    from db_integration_via_kafka_ksql_spark.functions.detmath import (
        det_ln_sql, dlit,
    )

    lng = dlit(math.log(LOGHIST_GAMMA))
    w = (
        f"greatest(CAST(floor(CAST({value_sql} AS DOUBLE)"
        f" * {dlit(LOGHIST_SCALE)}) AS BIGINT), CAST(1 AS BIGINT))"
    )
    return f"CAST(ceil({det_ln_sql(w, dialect)} / {lng}) AS BIGINT)"


def loghist_sketch(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Mergeable log-bucketed histogram: (group..., bucket, cnt).

    THE production histogram shape (DDSketch/HDR): bucket boundaries are
    powers of gamma, so state is O(log(range)/log(gamma)) rows per group
    no matter how many events flow through, merge is plain count
    addition (the streaming twin exploits this), and any quantile
    reconstructs within a gamma factor. Unlike the equi-width
    `histogram_quantiles` (relational.py), no bounds pass is needed —
    the geometry is fixed a priori, which is what makes it streamable.

    One map-side-combined groupBy; bucket math is scan-side."""
    b = F.expr(_loghist_bucket_sql(value_col, "spark"))
    return (
        df.select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def loghist_quantiles(
    buckets: DataFrame,
    group_cols: list[str],
    quantiles_permille: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Quantile probe over a (group..., bucket, cnt) histogram frame:
    for each requested permille, the first bucket whose running count
    covers it. All-integer output (group, q_permille, bucket, cum,
    n_total) — hash-exact; the value reconstruction gamma^bucket / scale
    is engine-transcendental and lives in tests as a tolerance check.

    The window runs over bucket rows (sketch-sized), never raw data."""
    from pyspark.sql.window import Window

    spark = buckets.sparkSession
    totals = buckets.groupBy(*group_cols).agg(
        F.sum("cnt").cast("long").alias("n_total")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = buckets.withColumn("cum", F.sum("cnt").over(w).cast("long"))
    qs = spark.createDataFrame(
        [(int(q),) for q in quantiles_permille], "q_permille long"
    )
    j = (
        cum.join(F.broadcast(totals), list(group_cols))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") * 1000 >= F.col("q_permille") * F.col("n_total"))
    )
    pick = Window.partitionBy(*group_cols, "q_permille").orderBy("bucket")
    return (
        j.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(*group_cols, "q_permille", "bucket", "cum", "n_total")
    )


# ---------------------------------------------------------------------------
# guaranteed heavy hitters (the Misra-Gries support threshold)
# ---------------------------------------------------------------------------

def heavy_hitters_exact(
    items: DataFrame,
    item_col: str = "item",
    k: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """Items GUARANTEED to clear the Misra-Gries support threshold:
    every item whose exact count exceeds n/(k+1) — by pigeonhole at most
    k items qualify, which is precisely the set a k-counter MG/
    SpaceSaving summary is guaranteed to retain (Misra & Gries 1982;
    Agarwal et al., Mergeable Summaries, PODS'12). This is the BATCH
    ground truth the streaming bounded-state twin
    (streaming/heavyhitters.py) is contract-tested against.

    The threshold compare is the integer cross-multiplication
    ``cnt * (k+1) > n_total`` — no division, engine-exact.

    ``weight_col`` generalizes to WEIGHTED heavy hitters (Agarwal et
    al.'s weighted MG): `cnt` becomes the integer weight sum and the
    threshold is total_weight/(k+1) — e.g. which sources dominate a
    token budget, not just a row count. Weights must be non-negative
    integers (the exactness convention).

    Scale shape: one map-side-combined count shuffle reduces the corpus
    to its dictionary; the grand total rides a single-row broadcast
    (annotated NLJ) and the filter leaves <= k rows. No window, no sort
    (callers order the k-row result if they care).

    Output: (item, cnt, n_total).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if weight_col is None:
        measure = F.count(F.lit(1))
        bad = F.lit(0)
    else:
        # ENFORCE the non-negative-integer weight convention (it was
        # previously only documented): a NULL weight nulls its group's
        # sum and a negative breaks every weighted-MG bound downstream
        # (the streaming twin's est<=true contract) — fail fast here so
        # the batch ground truth and the stream refuse identical inputs.
        w = F.col(weight_col)
        measure = F.sum(w)
        bad = F.max(F.when(w.isNull() | (w < 0), F.lit(1)).otherwise(F.lit(0)))
    counts = (
        items.groupBy(F.col(item_col).alias("item"))
        .agg(measure.cast("bigint").alias("cnt"), bad.alias("bad"))
        .localCheckpoint(eager=True)  # feeds the total AND the filter
    )
    if weight_col is not None:
        if counts.agg(F.max("bad")).first()[0]:
            raise ValueError(
                f"heavy_hitters_exact: weight column {weight_col!r} "
                "contains NULL or negative values — weights must be "
                "non-negative integers"
            )
    counts = counts.select("item", "cnt")
    total = counts.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("n_total"))
        .select("item", "cnt", "n_total")
    )
