"""Product-analytics operators over the event stream: cohort retention
and ordered funnel conversion.

The classic ksql-style continuous-analytics workloads, expressed batch-
side as pure DataFrame plans (their streaming twins are the windowed
aggregates in streaming/windows.py):

- **Cohort retention**: users bucket into weekly cohorts by their first
  event; each later week they appear in becomes a (cohort, offset) cell.
  One user-keyed aggregate finds the cohort, one user-keyed join tags
  every event, and the cell counts partially aggregate — at 100 TB the
  only wide state is user-sized, never event-sized, and the retention
  matrix itself is O(weeks^2).
- **Ordered funnel**: how many users performed step1 < step2 < step3 in
  time order. Each step is a per-user conditional-min aggregate chained
  through a user-keyed join with the previous step's frame — 3 scans
  with the step's event_type predicate PUSHED DOWN (never one unfiltered
  scan fanned out), and per-user frames are node-sized.

All math is integer (epoch micros, week indexes, permille ratios), so
the DuckDB oracles match bit-exactly.

Reference parity: the reference engine's continuous queries aggregate
the movies/sales CDC streams (reference: deploy-ksql-cli.sh); retention
and funnels are the event-analytics extension of the same GROUP BY
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEEK_US = 7 * 86_400 * 1_000_000
DAY_US = 86_400 * 1_000_000
HOUR_US = 3_600 * 1_000_000


def floor_div_sql(expr: str, divisor: int, dialect: str = "spark") -> str:
    """Exact integer FLOOR division of ``expr`` by a positive literal
    divisor, as SQL text — THE time-bucketing primitive of the series
    family (hour/day indexes). Spark's DIV and DuckDB's // both truncate
    toward zero, so a pre-1970 timestamp in (-1 unit, 0) would collapse
    into bucket 0 instead of bucket -1 (ADVICE r14); subtracting the
    nonnegative modulus first makes the division exact and the quotient
    the true floor, in pure BIGINT (no doubles — float floor() loses
    exactness past 2^53 µs). One definition rendered per dialect (the
    decay_weight_ppm_sql stance) so the batch operators, the streaming
    twins, and the DuckDB oracles cannot drift on bucket edges."""
    if divisor <= 0:
        raise ValueError(f"divisor must be positive, got {divisor}")
    if dialect == "spark":
        return f"(({expr}) - pmod({expr}, {divisor})) DIV {divisor}"
    if dialect == "duckdb":
        return (
            f"(({expr}) - ((({expr}) % {divisor} + {divisor}) % {divisor}))"
            f" // {divisor}"
        )
    raise ValueError(f"unknown dialect: {dialect}")


def split_permille_sql(num: str, den: str, scale: int = 1000) -> str:
    """``scale * num DIV den`` in the overflow-safe split form:
    ``scale*(n DIV d) + (scale*(n % d)) DIV d`` — identical for
    nonnegative ``num`` and positive ``den`` but never materializes
    ``scale*num``, so the ratio survives sums near BIGINT range instead
    of raising under ANSI mode at num > ~9.2e15 (ADVICE r14: the series
    family had the split form in one operator and the plain form in two
    others). Dialect-neutral: DIV is Spark; callers render DuckDB by
    .replace(' DIV ', ' // ')."""
    return (
        f"{scale} * (({num}) DIV ({den}))"
        f" + ({scale} * (({num}) % ({den}))) DIV ({den})"
    )


def cohort_retention(events: DataFrame, ts_us: Column) -> DataFrame:
    """Weekly cohort retention matrix.

    Returns (cohort_week, week_offset, n_users, cohort_size,
    retained_permille): users whose FIRST event fell in cohort_week and
    who were active again week_offset weeks later. Offset 0 is the
    cohort itself (retained_permille = 1000 by construction).
    """
    ev = events.select(
        "user_id", ts_us.cast("long").alias("_us")
    ).select(
        "user_id",
        F.expr(floor_div_sql("_us", WEEK_US, "spark")).alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        ev.join(first, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .distinct()
    )
    counts = cells.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    sizes = counts.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        "cohort_size",
        F.expr("n_users * 1000 DIV cohort_size").alias("retained_permille"),
    )


def funnel_conversion(
    events: DataFrame, ts_us: Column, steps: list[str]
) -> DataFrame:
    """Ordered funnel: per step, how many users reached it in sequence.

    A user counts for step k iff they have events of types
    steps[0..k] at strictly increasing times (each step's earliest
    occurrence after the previous step's committed time — the standard
    "windowless" funnel). Returns (step_idx, step, n_users,
    conversion_permille) with conversion relative to step 1.

    The per-step frames are per-user (node-sized) and eagerly
    checkpointed: each feeds the next step's join AND its own count —
    without materialization the chain re-plans every upstream step per
    branch (the unionAll double-compute trap).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(
        "user_id", "event_type", ts_us.cast("long").alias("t")
    )
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for step in steps:
        cur = base.filter(F.col("event_type") == step)
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(F.col("t") > F.col("_pt"))
        frame = (
            cur.groupBy("user_id")
            .agg(F.min("t").alias("_pt"))
            .localCheckpoint(eager=True)
        )
        reached.append(frame)
        prev = frame
    rows = None
    for i, (step, frame) in enumerate(zip(steps, reached), start=1):
        row = frame.groupBy().agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_users"
        )
        rows = row if rows is None else rows.unionByName(row)
    first_n = reached[0].groupBy().agg(F.count(F.lit(1)).alias("first_n"))
    # Guard the ratio: with zero users at step 1 every step is empty and
    # the permille is 0 — under Spark 4's default ANSI mode an unguarded
    # DIV would raise DIVIDE_BY_ZERO instead.
    return rows.crossJoin(F.broadcast(first_n)).select(
        "step_idx",
        "step",
        "n_users",
        F.when(
            F.col("first_n") > 0, F.expr("n_users * 1000 DIV first_n")
        ).otherwise(F.lit(0).cast("long")).alias("conversion_permille"),
    )


GAPFILL_MAX_SPAN_HOURS = 1_000_000  # ~114 years of hourly spine


def hourly_gapfill(
    events: DataFrame,
    ts_us: Column,
    trailing_hours: int = 3,
    max_span_hours: int = GAPFILL_MAX_SPAN_HOURS,
) -> DataFrame:
    """Dense hourly resample of the event stream with zero-filled gaps
    and a trailing moving window — the gap-fill/resample primitive every
    time-series consumer needs before charting, anomaly screens, or
    rate-limit checks (a groupBy alone silently DROPS empty hours, so a
    moving average computed over it skips gaps instead of spanning them).

    Output one row per (event_type, hour) over the GLOBAL observed hour
    range [min, max] — shared across types, so a type quiet at the edges
    still gets explicit zeros: (event_type, hour, n_events, mov_sum,
    mov_hours, mov_avg_milli) where mov_* aggregate the trailing
    ``trailing_hours``-row window (ROWS semantics over the dense grid ==
    RANGE semantics over time, which is the point of filling first) and
    mov_avg_milli = 1000 * mov_sum DIV mov_hours exactly, computed in
    the overflow-safe split form (split_permille_sql).

    Scale shape: events reduce to (type, hour) counts map-side; the
    dense grid is |types| x |hours| (dimension-sized — a decade of hours
    is 87k rows), built from a single-row bounds aggregate exploded via
    ``sequence`` and a broadcast type dimension; the moving window
    partitions by type over GRID rows only. Event rows cross the wire
    once, pre-aggregated.

    ``max_span_hours`` guards the spine: ONE corrupted timestamp (a
    stray year-9999 row) would otherwise silently inflate the "dense"
    grid to billions of rows — the guard raises at execution instead
    (``raise_error`` inside the bounds row, so no extra driver action).
    """
    return gapfill_from_counts(
        hourly_counts(events, ts_us),
        trailing_hours=trailing_hours,
        max_span_hours=max_span_hours,
    )


def hourly_counts(events: DataFrame, ts_us: Column) -> DataFrame:
    """(event_type, hour, n_events): the map-side-combined hourly count
    table — hourly_gapfill's front half, split out for callers that
    maintain the count table themselves (the streaming state shape)."""
    return (
        events.select("event_type", ts_us.cast("long").alias("_us"))
        .select(
            "event_type",
            F.expr(floor_div_sql("_us", HOUR_US, "spark")).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def gapfill_from_counts(
    counts: DataFrame,
    trailing_hours: int = 3,
    max_span_hours: int = GAPFILL_MAX_SPAN_HOURS,
) -> DataFrame:
    """Dense resample over an EXISTING (event_type, hour, n_events)
    count table — the serve half of hourly_gapfill, split out (the
    bm25_from_postings precedent) so an incrementally maintained count
    table (streaming/anomaly.py's state) serves the zero-filled series
    through the exact code path the batch oracle gates: a prefix-exact
    count table yields a prefix-exact series.

    The count table is keyed by (event_type, hour); duplicate keys are
    defensively pre-aggregated (summed) rather than trusted — a caller
    handing in an un-compacted count log would otherwise fan out the
    grid's left join AND double-count every moving window (ADVICE r14).
    For unique-keyed input the extra aggregate reuses the upstream
    hash partitioning (no new exchange) over a grid-sized frame."""
    from pyspark.sql.window import Window

    if trailing_hours < 1:
        raise ValueError(f"trailing_hours must be >= 1, got {trailing_hours}")
    if max_span_hours < 1:
        raise ValueError(f"max_span_hours must be >= 1, got {max_span_hours}")
    counts = counts.groupBy("event_type", "hour").agg(
        F.sum("n_events").cast("long").alias("n_events")
    )
    bounds = counts.groupBy().agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    hours = bounds.select(
        F.explode(
            F.expr(
                # NULL bounds (empty input) explode to zero rows — an
                # empty count table yields an empty series, not an error
                "CASE WHEN h0 IS NULL THEN CAST(NULL AS ARRAY<BIGINT>) "
                f"WHEN h1 - h0 + 1 <= {max_span_hours} "
                "THEN sequence(h0, h1) ELSE "
                "raise_error(concat('hourly_gapfill: observed hour span ',"
                " CAST(h1 - h0 + 1 AS STRING),"
                f" ' exceeds max_span_hours={max_span_hours}"
                " — corrupted timestamps?')) END"
            )
        ).alias("hour")
    )
    types = counts.select("event_type").distinct()
    # single-row-bounds explode x broadcast type dim: the annotated tiny
    # crossJoin pattern (grid is dimension-sized, never event-sized)
    grid = hours.crossJoin(F.broadcast(types))
    filled = grid.join(counts, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-(trailing_hours - 1), 0)
    )
    return (
        filled.withColumn(
            "mov_sum", F.sum("n_events").over(win).cast("long")
        )
        .withColumn("mov_hours", F.count(F.lit(1)).over(win).cast("long"))
        .select(
            "event_type",
            "hour",
            "n_events",
            "mov_sum",
            "mov_hours",
            F.expr(split_permille_sql("mov_sum", "mov_hours")).alias(
                "mov_avg_milli"
            ),
        )
    )


def decay_weight_ppm_sql(half_life_days: int, dialect: str) -> str:
    """The decay weight as SQL text: ``1_000_000 DIV 2^min((asof_day -
    day) DIV half_life_days, 62)`` — references columns ``day`` and
    ``asof_day``. THE single definition of the weight (the det_ln_sql
    dialect pattern): the batch operator, the streaming twin's derived
    view, and the DuckDB oracle all render from here, so the prefix
    contract cannot drift on a hand-copied constant. The shift exponent
    caps at 62 (2^62 fits BIGINT; the weight is 0 ppm long before)."""
    if half_life_days < 1:
        raise ValueError(f"half_life_days must be >= 1, got {half_life_days}")
    exp = f"least((asof_day - day) DIV {half_life_days}, 62)"
    if dialect == "spark":
        return (
            "1000000 DIV shiftleft(CAST(1 AS BIGINT), "
            f"CAST({exp} AS INT))"
        )
    if dialect == "duckdb":
        exp_dd = f"least((asof_day - day) // {half_life_days}, 62)"
        return (
            f"1000000 // (CAST(1 AS BIGINT) << CAST({exp_dd} AS INTEGER))"
        )
    raise ValueError(f"unknown dialect: {dialect}")


def decay_engagement(
    events: DataFrame, ts_us: Column, half_life_days: int = 7
) -> DataFrame:
    """Per-user recency-decayed engagement score — the freshness-weighted
    activity signal a sampling/mixture pass uses to up-weight currently
    active users (a plain count treats a user who churned last year as
    equal to one active today).

    Each event contributes ``1_000_000 DIV 2^(age_days DIV
    half_life_days)`` parts-per-million of a fresh event's weight
    (decay_weight_ppm_sql — shared verbatim with the streaming twin and
    the oracle), where age is measured against the corpus max day (the
    as-of horizon) — stepwise integer halving per elapsed half-life, so
    the score is a PURE BIGINT sum: order-free,
    partitioning-independent, and bit-replayable in SQL (no pow/exp
    whose last ulp could differ across engines).

    NULL stance: rows with a NULL user or NULL timestamp are EXCLUDED —
    from the horizon as well as the scores — matching the streaming
    twin's at-ingest filter (an unattributable or untimed event can't
    carry engagement).

    Returns (user_id, n_events, last_seen_day, score_ppm).

    Scale shape: one events scan; the as-of horizon rides a single-row
    broadcast (annotated tiny crossJoin); the per-user rollup is one
    map-side-combined user-keyed aggregate — state is user-sized.
    """
    weight = decay_weight_ppm_sql(half_life_days, "spark")
    ev = (
        events.select("user_id", ts_us.cast("long").alias("_us"))
        .filter(F.col("user_id").isNotNull() & F.col("_us").isNotNull())
        .select(
            "user_id",
            F.expr(floor_div_sql("_us", DAY_US, "spark")).alias("day"),
        )
    )
    asof = ev.groupBy().agg(F.max("day").alias("asof_day"))
    return (
        ev.crossJoin(F.broadcast(asof))
        .select("user_id", "day", F.expr(weight).alias("w"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("day").cast("long").alias("last_seen_day"),
            F.sum("w").cast("long").alias("score_ppm"),
        )
    )


def event_transition_matrix(events: DataFrame, ts_us: Column) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences.

    For every user, consecutive events (ordered by time, event_id
    tie-break — a total order, the repo's two-pass-window discipline)
    form (from_type, to_type) transitions; the matrix reports counts and
    integer permille of each source type's outgoing mass. The behavioral
    fingerprint a session-analysis pass derives before anomaly screens.

    Scale shape: one user-keyed window (the LAG) whose hash partitioning
    the transition groupBy cannot reuse (different keys) — two shuffles
    total, both map-side combined; the from-type totals re-aggregate the
    |types|^2-sized matrix, never the events.

    Returns (from_type, to_type, n_transitions, from_total, permille).
    """
    from pyspark.sql.window import Window

    ev = events.select(
        "user_id", "event_id", "event_type", ts_us.cast("long").alias("t")
    )
    win = Window.partitionBy("user_id").orderBy("t", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(win))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        # |types|^2 rows feeding two branches (totals + join): materialize
        # once or the LAG window plans once per branch
        .localCheckpoint(eager=True)
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("from_total")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "from_total",
        F.expr("n_transitions * 1000 DIV from_total").alias("permille"),
    )


def _series_windows(series: DataFrame, window_hours: int) -> DataFrame:
    """(event_type, start, vec): every full ``window_hours``-length
    window of the dense series as a BIGINT vector — one per-type ordered
    collect_list pass, dimension-sized output. Shared by the similarity
    search and the discord screen."""
    from pyspark.sql.window import Window

    if window_hours < 1:
        raise ValueError(f"window_hours must be >= 1, got {window_hours}")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(0, window_hours - 1)
    )
    return (
        series.select(
            "event_type",
            F.col("hour").alias("start"),
            F.collect_list(F.col("n_events").cast("long")).over(w)
            .alias("vec"),
        )
        .filter(F.size("vec") == window_hours)
    )


def _sqdist_sql(left_vec: str, right_vec: str) -> str:
    """Exact BIGINT squared Euclidean distance between two array<long>
    columns — THE single distance definition of the series family."""
    return (
        f"aggregate(zip_with({left_vec}, {right_vec}, "
        "(a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def series_similarity_topk(
    series: DataFrame, window_hours: int = 6, top_k: int = 3
) -> DataFrame:
    """Time-series similarity search over a DENSE hourly count series
    (the hourly_gapfill / StreamingAnomaly.hourly_series output shape:
    one row per (event_type, hour) with zero-filled gaps): for each
    type's most recent ``window_hours``-hour window (the query), the
    top-k most similar EARLIER non-overlapping windows across ALL types
    by squared Euclidean distance — "which past period looked like right
    now" (distributed subsequence similarity search, the
    EDBT'19-streaming / REPOSE-top-k family, re-expressed as window
    collection + broadcast-query scoring).

    Determinism: distances are exact BIGINT sums of squared integer
    count differences — no normalization doubles — so ties break
    engine-identically on (dist, match_type, match_start). Density is
    REQUIRED (the gap-fill property): on a sparse series a window
    silently spans non-adjacent hours and the distance compares
    misaligned time.

    Scale shape: one per-type ordered window pass builds the
    |types| x |hours| window-vector frame (collect_list over a
    ``window_hours``-row frame — dimension-sized, never event-sized);
    the |types| query windows broadcast against it (annotated tiny NLJ:
    the non-overlap predicate is a theta join, but the broadcast side is
    |types| rows); per-query top-k is a rank-pruned window.

    Returns (query_type, match_type, match_start, dist, rnk).
    """
    from pyspark.sql.window import Window

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # feeds the query max, the query join, and the candidate scan
    wins = _series_windows(series, window_hours).localCheckpoint(eager=True)
    qstart = wins.groupBy().agg(F.max("start").alias("qs"))
    queries = (
        wins.join(F.broadcast(qstart), wins["start"] == qstart["qs"])
        .select(
            F.col("event_type").alias("query_type"),
            F.col("start").alias("query_start"),
            F.col("vec").alias("qvec"),
        )
    )
    dist = _sqdist_sql("qvec", "vec")
    scored = (
        wins.join(
            F.broadcast(queries),
            wins["start"] + window_hours <= queries["query_start"],
        )
        .select(
            "query_type",
            F.col("event_type").alias("match_type"),
            F.col("start").alias("match_start"),
            F.expr(dist).alias("dist"),
        )
    )
    rw = Window.partitionBy("query_type").orderBy(
        F.col("dist").asc(), F.col("match_type").asc(),
        F.col("match_start").asc(),
    )
    return (
        scored.withColumn("rnk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rnk") <= top_k)
    )


def series_discords(
    series: DataFrame,
    window_hours: int = 6,
    recent_windows: int = 24,
    top_k: int = 3,
) -> DataFrame:
    """Discord screen over a DENSE hourly count series (matrix-profile
    family, Yeh et al. ICDM'16 re-expressed for exact integers): for
    each of the ``recent_windows`` most recent full windows per type,
    the squared-Euclidean distance to its NEAREST same-type window
    outside the overlap exclusion zone (|start delta| >= window_hours,
    the standard trivial-match exclusion) — a window whose nearest
    neighbor is FAR is a discord: traffic shaped like nothing else in
    the type's history. The nearest-neighbor-distance anomaly primitive,
    complementary to the z-score screen (which flags level, not shape).

    Determinism: exact BIGINT distances (_sqdist_sql, shared with the
    similarity search); the nearest neighbor is min(struct(dist,
    nn_start)) so ties resolve engine-identically; discord rank orders
    (nn_dist DESC, start ASC) within each type. Density is REQUIRED
    (the gap-fill property).

    Scale shape: ``recent_windows`` is THE cost knob — the probe side is
    |types| x recent_windows rows and BROADCASTS into a same-type
    equi-join against the full window frame, so cost is
    |probes| x |hours| x window_hours, never |hours|^2 (the full
    self-join matrix profile is calendar-quadratic at 100 TB; profiling
    the recent edge against all history is the streaming-monitoring
    shape). The window frame is checkpointed once.

    Returns (event_type, start, nn_start, nn_dist, rnk), rnk 1..top_k
    per type by discord order.
    """
    from pyspark.sql.window import Window

    if recent_windows < 1:
        raise ValueError(f"recent_windows must be >= 1, got {recent_windows}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    wins = _series_windows(series, window_hours).localCheckpoint(eager=True)
    qmax = wins.groupBy().agg(F.max("start").alias("qmax"))
    probes = (
        wins.crossJoin(F.broadcast(qmax))
        .filter(F.col("start") > F.col("qmax") - recent_windows)
        .select(
            F.col("event_type").alias("p_type"),
            F.col("start").alias("p_start"),
            F.col("vec").alias("pvec"),
        )
    )
    nn = (
        wins.join(
            F.broadcast(probes),
            (wins["event_type"] == probes["p_type"])
            & (
                F.abs(wins["start"] - probes["p_start"]) >= window_hours
            ),
        )
        .select(
            "p_type",
            "p_start",
            F.struct(
                F.expr(_sqdist_sql("pvec", "vec")).alias("d"),
                F.col("start").alias("s"),
            ).alias("cand"),
        )
        .groupBy("p_type", "p_start")
        .agg(F.min("cand").alias("nn"))
        .select(
            F.col("p_type").alias("event_type"),
            F.col("p_start").alias("start"),
            F.col("nn.s").alias("nn_start"),
            F.col("nn.d").alias("nn_dist"),
        )
    )
    rw = Window.partitionBy("event_type").orderBy(
        F.col("nn_dist").desc(), F.col("start").asc()
    )
    return (
        nn.withColumn("rnk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rnk") <= top_k)
    )


def series_lag_correlation(
    series: DataFrame, max_lag_hours: int = 12, top_k: int = 1
) -> DataFrame:
    """Lead-lag scan over the dense hourly series: for every ORDERED
    type pair (src, dst) — self-pairs included — and every lag in
    [1, max_lag_hours], the average hourly product of src's series
    against dst's series shifted ``lag`` hours later, in integer milli
    units: avg_prod_milli = 1000 * sum(src[h] * dst[h+lag]) DIV
    n_overlap_hours. The top-k lags per pair answer "does dst follow src
    by k hours?" (cross-type: funnel latency at the traffic level;
    self-pair: the dominant period — the discrete autocorrelation peak).

    Per-hour normalization (DIV by the overlap length) keeps lags
    comparable — a raw sum biases toward small lags because longer
    overlaps have more terms. Lag 0 is excluded (for self-pairs it is a
    degenerate maximum; for cross pairs "simultaneous" is the anomaly
    screen's job, not the lead-lag scan's).

    Determinism: products, sums, and the DIV are exact BIGINT; ties
    break (avg desc, lag asc). Density is REQUIRED (gap-fill property):
    missing hours must be explicit zeros or the shift misaligns time.

    Scale shape: ONE hour-shifted self-join of the series against
    itself — the join key is the hour (dst.hour = src.hour + lag via a
    broadcast lag spine), so the pair frame is |types|^2 x |lags| x
    |hours| rows streamed through a map-side-combined aggregate; state
    after the shuffle is |types|^2 x |lags| (dimension-sized). Hours are
    calendar-bounded, so the whole op is INVARIANT to event volume —
    100 TB of events and 10 GB of events cost the same past the count
    aggregation.

    Returns (src_type, dst_type, lag_hours, n_hours, avg_prod_milli,
    rnk).
    """
    from pyspark.sql.window import Window

    if max_lag_hours < 1:
        raise ValueError(f"max_lag_hours must be >= 1, got {max_lag_hours}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # the series feeds BOTH sides of the shifted self-join — materialize
    # once or the upstream chain (gap-fill + events scan) plans twice
    series = series.select(
        "event_type", "hour", "n_events"
    ).localCheckpoint(eager=True)
    lags = series.sparkSession.range(1, max_lag_hours + 1).select(
        F.col("id").cast("long").alias("lag_hours")
    )
    src = series.select(
        F.col("event_type").alias("src_type"),
        F.col("hour").alias("h"),
        F.col("n_events").cast("long").alias("a"),
    ).crossJoin(F.broadcast(lags))
    dst = series.select(
        F.col("event_type").alias("dst_type"),
        F.col("hour").alias("dh"),
        F.col("n_events").cast("long").alias("b"),
    )
    paired = src.join(dst, src["h"] + src["lag_hours"] == dst["dh"]).select(
        "src_type", "dst_type", "lag_hours", F.expr("a * b").alias("p")
    )
    # 1000*s DIV n == 1000*(s DIV n) + (1000*(s % n)) DIV n exactly for
    # non-negative s — the split form never materializes 1000*s, so the
    # op survives decade-span million-events/hour sums (s up to ~9.2e18)
    # instead of overflowing BIGINT at s > 9.2e15 under ANSI mode
    avg_milli = (
        "1000 * (CAST(sum(p) AS BIGINT) DIV count(1))"
        " + (1000 * (CAST(sum(p) AS BIGINT) % count(1))) DIV count(1)"
    )
    agg = paired.groupBy("src_type", "dst_type", "lag_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.expr(avg_milli).alias("avg_prod_milli"),
    )
    rw = Window.partitionBy("src_type", "dst_type").orderBy(
        F.col("avg_prod_milli").desc(), F.col("lag_hours").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rnk") <= top_k)
    )


def hour_of_day_profile(series: DataFrame) -> DataFrame:
    """Seasonality profile over the dense hourly series: per (type,
    hour-of-day 0..23), total events and the integer permille share of
    the type's overall traffic — the "typical day shape" a monitoring
    pass divides out before screening (a nightly batch spike is an
    anomaly at 2pm and baseline at 2am), and the calibration input for
    traffic-aware rate limits.

    The dense grid buys EXPLICIT zero rows: shares are insensitive to
    missing hours (absent rows add nothing to either sum), but a
    consumer dividing traffic by its profile needs every (type, slot)
    key present — quiet slots must exist with share 0, not be absent.

    Determinism: share_permille = slot_total * 1000 DIV type_total, the
    repo's exact permille recipe; zero-traffic types report share 0 for
    every slot (ANSI-safe guarded DIV). hour-of-day = pmod(hour, 24) on
    the epoch-hour index (epoch 0 is midnight UTC — the profile is a
    UTC day shape; shift upstream for local-time profiles; pmod keeps
    pre-1970 hours inside the 0..23 contract where % would go negative).

    Scale shape: one map-side-combined (type, hod) aggregate over the
    dimension-sized grid, type totals re-aggregated from the 24-row
    slots and broadcast back — nothing event-sized past the gap-fill's
    count aggregation.

    Returns (event_type, hour_of_day, n_events, type_total,
    share_permille).
    """
    slots = (
        series.select(
            "event_type",
            F.expr("pmod(hour, 24)").cast("long").alias("hour_of_day"),
            F.col("n_events").cast("long").alias("n"),
        )
        .groupBy("event_type", "hour_of_day")
        .agg(F.sum("n").cast("long").alias("n_events"))
        # feeds the totals AND the share join
        .localCheckpoint(eager=True)
    )
    totals = slots.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("type_total")
    )
    return slots.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "hour_of_day",
        "n_events",
        "type_total",
        F.when(
            F.col("type_total") > 0,
            F.expr(split_permille_sql("n_events", "type_total")),
        ).otherwise(F.lit(0).cast("long")).alias("share_permille"),
    )
