"""Text-analysis operators over the documents table: token statistics,
quality scoring, language-ID, fingerprinting.

All pure Column expressions (functions/text.py) — zero Python UDFs, zero
extra shuffles beyond the terminal groupBy where one exists. Each operator
is a narrow map over the corpus scan: at 100 TB these run at parquet scan
speed with full column pruning (only `doc_id`/`text`/`lang` are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions import text as T


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token accounting: whitespace tokens, BPE-ish sub-word
    pieces, distinct words, char length, avg token length."""
    return docs.select(
        "doc_id",
        T.token_count("text").cast("bigint").alias("n_tokens"),
        T.token_piece_count("text").alias("n_pieces"),
        F.size(T.distinct_words("text")).cast("bigint").alias("n_distinct"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        (
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
            / T.token_count("text").cast("double")
        ).alias("avg_token_len"),
    )


def quality_scores(
    docs: DataFrame, min_tokens: int = 50, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Heuristic quality score in [0,1]: length, lexical diversity,
    stopword and punctuation ratios — the standard pre-training filters.

    Double math is a fixed sequence of exact-operand IEEE ops (divisions
    of exact ints, scaled adds) — bit-identical in DuckDB.

    keep_cols: extra source columns carried through (lets composers avoid
    a join-back — one scan instead of two).
    """
    n_tok = T.token_count("text").cast("double")
    n_dis = F.size(T.distinct_words("text")).cast("double")
    stop_hits = sum(
        (T.stopword_hits("text", lang) for lang in T.STOPWORDS),
        F.lit(0),
    ).cast("double")
    punct = (
        F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", "")).cast("double")
        / F.length("text").cast("double")
    )
    len_score = F.least(n_tok / F.lit(float(min_tokens)), F.lit(1.0))
    diversity = n_dis / n_tok
    stop_ratio = stop_hits / n_tok
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * diversity
        + F.lit(0.2) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.1) * (F.lit(1.0) - punct)
    )
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        diversity.alias("diversity"),
        stop_ratio.alias("stop_ratio"),
        punct.alias("punct_ratio"),
        score.alias("quality"),
        *keep_cols,
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language-ID: per-language distinct-stopword hit counts,
    argmax with deterministic tie-break (functions/text.LANG_PRIORITY).

    On the driver's synthetic corpus (shared vocabulary across langs) the
    measured accuracy is low by construction — the confusion query reports
    it honestly; the operator itself is the real n-gram/stopword scheme.
    """
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            T.stopword_hits("text", lang).alias(f"sc_{lang}")
            for lang in T.LANG_PRIORITY
        ],
    )
    pred = T.predicted_lang({l: f"sc_{l}" for l in T.LANG_PRIORITY})
    return scored.withColumn("pred_lang", pred)


def language_confusion(docs: DataFrame) -> DataFrame:
    """(actual, predicted) → count — the lang-ID evaluation rollup."""
    return (
        language_id(docs)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per doc + content hash.

    rolling_fp collides for docs sharing the exact word sequence;
    md5 is the exact-content check. Both deterministic & portable.
    """
    return docs.select(
        "doc_id",
        T.rolling_fingerprint("text").alias("rolling_fp"),
        F.md5("text").alias("content_md5"),
        (T.rolling_fingerprint("text") % 1024).alias("fp_bucket"),
    )


def top_terms_per_source(docs: DataFrame, k: int = 5) -> DataFrame:
    """Term-frequency rollup: top-k terms per source by document frequency
    (explode → two-stage count → rank). The tf computation is a single
    shuffle keyed by (source, word) with map-side combine; the rank
    window runs over |sources| x |vocab| rows — tiny after aggregation.

    Ranking is by count desc / term asc (deterministic; no float idf —
    log() ulp differences across engines would break the parity gate)."""
    from pyspark.sql import Window

    tf = (
        docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("source").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("source", "term", "tf", "rnk")
    )


def curate_corpus(
    docs: DataFrame, min_quality: float = 0.75, min_tokens: int = 50
) -> DataFrame:
    """End-to-end curation pass: quality filter → exact-dedup keep-one →
    per-source token accounting. The standard shape of a pre-training
    data refresh ("how many tokens survive curation, per source?").

    Scale shape: quality scoring is scan-side column math (ONE scan, no
    join-back — keep_cols threads source/text through); the keep-one dedup
    is ONE md5-keyed shuffle using min(struct(...)) — the winning row
    rides the aggregate, no join-back; the final rollup shuffles the
    (already tiny) kept set by source. Two shuffles total, uniform keys.
    """
    f = quality_scores(
        docs, min_tokens=min_tokens, keep_cols=("source", "text")
    ).filter(F.col("quality") >= min_quality)
    kept = (
        f.groupBy(F.md5("text").alias("h"))
        .agg(F.min(F.struct("doc_id", "source", "n_tokens")).alias("r"))
        .select("r.*")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


def stratified_sample(
    docs: DataFrame,
    rates_pct: dict[str, int],
    default_pct: int = 100,
    salt: str = "mix1",
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Deterministic stratified sampling — the training-mix construction
    step ("keep 30% of crawl, 100% of reference sources").

    Selection is hash-Bernoulli: keep a row iff
    md5(salt|id) mod 100 < rate_pct(stratum). Deterministic (same mix on
    every run / engine — no RNG state), scan-side (no shuffle at all: the
    filter pushes into the scan stage), and composable with downstream
    curation. Changing the salt draws an independent sample.
    """
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    bucket = (
        T.hex_hash_int(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
        % 100
    )
    return docs.filter(bucket < rate)


def quality_percentile_cutoffs(
    docs: DataFrame,
    ps: tuple[float, ...] = (0.5, 0.9),
    strata_col: str = "source",
) -> DataFrame:
    """Per-stratum discrete-percentile quality cutoffs — the adaptive
    thresholding step ('drop each source's bottom decile') that replaces
    one global magic number with data-derived per-source values.

    percentile_disc semantics: cutoff(p) = the quality value at sorted
    position ceil(p*n) within the stratum — an actual data value, exactly
    reproducible in any engine (no interpolation float math). One window
    pass per stratum (rank + count share the single partition shuffle);
    the explode over ps is |strata| x |ps| rows, negligible. At scale the
    cost profile is any per-source window: parallel across strata,
    bounded by the largest one — and the cutoffs output is tiny, made to
    be broadcast back against the corpus for the actual filter.
    """
    scored = quality_scores(docs, keep_cols=(strata_col,)).select(
        "doc_id", strata_col, "quality"
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("quality").asc(), F.col("doc_id").asc()
    )
    wn = Window.partitionBy(strata_col)
    ranked = scored.withColumn("rnk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    p_rows = F.explode(
        F.array(*[F.lit(float(p)) for p in sorted(ps)])
    ).alias("p")
    return (
        ranked.select(strata_col, "quality", "rnk", "n", p_rows)
        .filter(F.col("rnk") == F.ceil(F.col("p") * F.col("n")))
        .select(
            strata_col,
            "p",
            F.col("quality").alias("cutoff"),
            F.col("n").cast("bigint").alias("n_docs"),
        )
    )


def epoch_shuffle(
    docs: DataFrame,
    seed: str = "s0",
    epoch: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle: every (seed, epoch) draws an
    independent pseudo-random permutation of the corpus via a hash sort
    key — no RNG state, so any engine/run reproduces the same order.

    Scale design: the permutation is the SORT, not a rank column. Spark
    executes orderBy as a range-partitioned sort (sampled boundaries →
    parallel sort, output files in global order) — a global
    row_number() window here would funnel 100 TB through ONE partition,
    the classic shuffle-order scale-killer. Training readers consume the
    written file order; the emitted shuffle_key doubles as the
    verifiable permutation (equal keys impossible: md5 of distinct ids).
    """
    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.lit(str(epoch)), F.col(id_col).cast("string"))
    ).alias("shuffle_key")
    return docs.select(F.col(id_col), key).orderBy("shuffle_key")


def sample_k_per_stratum(
    docs: DataFrame,
    k: int,
    seed: str = "s0",
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Exact-k-per-group sampling (the 'K examples from every source'
    eval-set / ablation builder): rank rows inside each stratum by a
    seeded hash and keep the first k — a deterministic reservoir sample
    without RNG state.

    The window partitions by stratum, so the sort is per-group and
    parallel across groups (nothing global); skew follows the biggest
    stratum, the same bound as any per-source operation here.
    """
    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(key.asc())
    return (
        docs.select(F.col(id_col), F.col(strata_col), key.alias("sample_key"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, strata_col, "sample_key", F.col("rnk").cast("bigint").alias("rnk"))
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1), adapted to
    the corpus's single-line documents: per-doc fraction of tokens covered
    by (a) the most frequent word n-gram and (b) all duplicated word
    n-grams, for n in {2, 3}. High values mark boilerplate / degenerate
    repetition — the standard pre-training repetition cut.

    Scale shape: ONE explode over per-doc n-gram arrays (built scan-side
    from a single split), ONE (doc_id, n, gram)-keyed count with map-side
    combine (keys are uniform — no doc dominates beyond its own length),
    then a (doc_id)-keyed rollup of the already-collapsed counts. No
    windows, no joins; both shuffles are proportional to corpus tokens,
    not pairs.
    """
    # the explode multiplies rows ~2×tokens while the input is KBs — AQE
    # would run it in one task (the output-expanding pitfall documented in
    # operators/dedup.py); pin the map-side parallelism explicitly.
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = (
        docs.select("doc_id", "text")
        .repartition(par)
        .select("doc_id", "text", T.words("text").alias("w"))
        .select(
            "doc_id",
            "text",
            F.size("w").cast("bigint").alias("n_tokens"),
            "w",
        )
    )
    tagged = [
        F.expr(
            f"transform({T.shingles_of_words_sql('w', 'text', n)}, "
            f"g -> struct({n} as n, g as gram))"
        )
        for n in (2, 3)
    ]
    grams = base.select(
        "doc_id",
        "n_tokens",
        F.explode(F.flatten(F.array(*tagged))).alias("g"),
    ).select("doc_id", "n_tokens", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counts = grams.groupBy("doc_id", "n_tokens", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )

    def _top(n: int):  # occurrences of the most frequent n-gram
        return F.max(F.when(F.col("n") == n, F.col("c"))).cast("bigint")

    def _dup(n: int):  # total occurrences of n-grams seen more than once
        return F.sum(
            F.when((F.col("n") == n) & (F.col("c") >= 2), F.col("c")).otherwise(
                F.lit(0)
            )
        ).cast("bigint")

    def _frac(cnt, n: int):  # token coverage of those occurrences
        # Sub-n-gram docs (n_tokens < n) have no true n-grams — the
        # shingle builder falls back to one whole-text gram, which would
        # make the fraction exceed 1.0 (a 1-token doc gets
        # top_bigram_frac = 2.0) and read as "maximally repetitive" to a
        # Gopher-style threshold consumer. The fraction is undefined
        # there: emit NULL. The *_n count columns still report the
        # fallback gram's occurrences.
        return F.when(
            F.col("n_tokens") >= n,
            (F.lit(float(n)) * cnt.cast("double"))
            / F.col("n_tokens").cast("double"),
        )

    agg = counts.groupBy("doc_id", "n_tokens").agg(
        _top(2).alias("top_bigram_n"),
        _dup(2).alias("dup_bigram_n"),
        _top(3).alias("top_trigram_n"),
        _dup(3).alias("dup_trigram_n"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "top_bigram_n",
        "dup_bigram_n",
        "top_trigram_n",
        "dup_trigram_n",
        _frac(F.col("top_bigram_n"), 2).alias("top_bigram_frac"),
        _frac(F.col("dup_bigram_n"), 2).alias("dup_bigram_frac"),
        _frac(F.col("top_trigram_n"), 3).alias("top_trigram_frac"),
        _frac(F.col("dup_trigram_n"), 3).alias("dup_trigram_frac"),
    )


def _decontam_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, grams array, n_grams) — the shared front half of both
    decontamination variants. Grams feed multiple consumers (bench set,
    corpus explode, final projection): compute the compact per-doc array
    form once and pin it (the localCheckpoint trade-off documented in
    operators/dedup.py); repartition first for the same output-expansion
    reason as repetition_stats."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(par)
        .select("doc_id", "text", T.words("text").alias("w"))
        .select(
            "doc_id",
            F.array_distinct(T.shingles_of_words("w", "text", n)).alias("grams"),
        )
        .select("doc_id", "grams", F.size("grams").cast("bigint").alias("n_grams"))
        .localCheckpoint(eager=True)
    )


def decontaminate(
    docs: DataFrame, bench_mod: int = 11, n: int = 5
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its distinct
    word n-grams also occur in the held-out benchmark set (docs with
    doc_id % bench_mod == 0 stand in for an eval suite), plus the
    contamination flag. Training sets are scrubbed of eval overlap this
    way before every run (n-gram collision decontamination).

    Scale shape: the benchmark n-gram set is tiny relative to the corpus
    (eval suites are fixed-size) — distinct it and BROADCAST; the corpus
    side is scan-side n-gram construction + array_distinct, one explode,
    a broadcast left-semi join (no shuffle of corpus grams), and a
    doc_id-keyed count with map-side combine. Corpus rows are never
    shuffled by gram, so hot n-grams cannot skew the plan.
    """
    grams = _decontam_grams(docs, n)
    is_bench = (F.col("doc_id") % bench_mod) == 0
    bench_grams = (
        grams.filter(is_bench)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corpus = grams.filter(~is_bench)
    overlap = (
        corpus.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    return (
        corpus.select("doc_id", "n_grams")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias(
                "n_overlap"
            ),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def decontaminate_bloom(
    docs: DataFrame,
    bench_mod: int = 11,
    n: int = 5,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bloom-filter variant of :func:`decontaminate` for benchmark sets
    too large to broadcast as strings.

    The exact path broadcasts the distinct benchmark n-GRAM STRINGS —
    fine for fixed-size eval suites, but a wall once the held-out set
    reaches hundreds of millions of grams (several GB of strings). This
    variant folds the benchmark grams into an m-bit Bloom filter
    (functions/bloom.py: deterministic xxhash64 positions, bit array as
    array<bigint> words) and broadcasts THAT — ~9.6 bits/gram at 1% fpp,
    so 100M grams ride in ~120 MB. The corpus side stays identical:
    scan-side gram construction, one explode, and the membership probe is
    k getbit expressions per gram — no join against the gram set at all,
    so the corpus is never shuffled and hot grams cannot skew anything.

    Contract vs the exact op (tests/test_text_properties.py): zero false
    negatives — every doc `decontaminate` flags is flagged here, and
    per-doc ``n_overlap`` is >= the exact count — while false positives
    admit a small overcount governed by (n_bits, n_hashes). Use the exact
    op when the set broadcasts comfortably; this one when it doesn't.
    """
    from db_integration_via_kafka_ksql_spark.functions import bloom as B

    p = B.BloomParams(n_bits=n_bits, n_hashes=n_hashes, hash=hash_fn)
    grams = _decontam_grams(docs, n)
    is_bench = (F.col("doc_id") % bench_mod) == 0
    # NO distinct before the build (r17, guide §2.3): duplicate grams OR
    # the same bit positions into the same words, so the filter is
    # identical — and dropping the distinct removes a full shuffle of
    # the benchmark GRAM STRINGS; the only cost is re-hashing cross-doc
    # duplicates scan-side, cycles instead of network. (The exact
    # decontaminate keeps its distinct: there the gram strings ARE the
    # broadcast payload.)
    bench_grams = grams.filter(is_bench).select(
        F.explode("grams").alias("gram")
    )
    words = B.build_bloom(bench_grams, "gram", p)
    bf = B.bloom_frame(docs.sparkSession, words, p)
    corpus = grams.filter(~is_bench)
    overlap = (
        corpus.select("doc_id", F.explode("grams").alias("gram"))
        .crossJoin(F.broadcast(bf))
        .filter(B.might_contain(F.col("bf"), F.col("gram"), p))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    return (
        corpus.select("doc_id", "n_grams")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias(
                "n_overlap"
            ),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def duplicate_spans(
    docs: DataFrame, window_tokens: int = 8, min_count: int = 2
) -> DataFrame:
    """Substring-level exact-duplicate detection: every ``window_tokens``-
    word window of every doc is fingerprinted; windows whose fingerprint
    occurs >= ``min_count`` times anywhere in the corpus (across OR
    within docs) are duplicate spans. Per doc, overlapping duplicate
    windows are merged into covered-token counts — the substring-dedup
    signal ("this doc is 40% boilerplate shared with others") that
    doc-level MinHash/SimHash cannot see, e.g. license headers and
    navigation chrome embedded in otherwise-unique pages.

    Columns: doc_id, n_tokens, n_windows, n_dup_windows, dup_tokens
    (merged-interval token coverage), dup_frac.

    Scale shape: windows shuffle ONCE keyed by a 64-bit xxhash64 of the
    window text (8 bytes moved per window, not the string); the
    occurrence count is a map-side-combined aggregate, so a
    billion-duplicate boilerplate window costs one partial per task —
    hot fingerprints cannot pile a partition. The duplicate-fingerprint
    set is corpus-dependent (unbounded), so flagging is a shuffle
    semi-join on the hash, NOT a broadcast; the interval merge is one
    doc_id-keyed window over duplicate windows only. Grouping by hash
    instead of text trades a ~2^-64 per-pair collision risk for the
    smaller shuffle — at 1e12 windows the expected number of colliding
    pairs is ~0.03 (birthday bound), each inflating one doc's coverage
    slightly; acceptable for a filtering signal.
    """
    L = int(window_tokens)
    par = docs.sparkSession.sparkContext.defaultParallelism
    grams_sql = (
        f"CASE WHEN size(w) < {L} THEN CAST(array() AS array<string>) "
        f"ELSE transform(sequence(1, size(w) - {L - 1}), "
        f"i -> concat_ws(' ', slice(w, i, {L}))) END"
    )
    base = (
        docs.select("doc_id", "text")
        .repartition(par)
        .select("doc_id", T.words("text").alias("w"))
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_tokens"),
            F.expr(grams_sql).alias("grams"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("grams").cast("bigint").alias("n_windows"),
            "grams",
        )
        .localCheckpoint(eager=True)  # feeds the window explode AND the
        # final projection — never re-split/re-window the corpus
    )
    win = base.select(
        "doc_id", F.posexplode("grams").alias("pos", "gram")
    ).select("doc_id", "pos", F.xxhash64("gram").alias("h"))
    dup_h = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    dwin = win.join(dup_h, "h", "left_semi")
    wspec = Window.partitionBy("doc_id").orderBy("pos")
    covered = F.least(
        F.lit(L),
        F.col("pos") - F.coalesce(F.lag("pos").over(wspec), F.col("pos") - L),
    )
    cov = (
        dwin.select("doc_id", "pos")
        .withColumn("covered", covered)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_windows"),
            F.sum("covered").cast("bigint").alias("dup_tokens"),
        )
    )
    return (
        base.select("doc_id", "n_tokens", "n_windows")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias(
                "n_dup_windows"
            ),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias(
                "dup_tokens"
            ),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("dup_frac"),
        )
    )


def gram_positions(docs: DataFrame, min_tokens: int = 8) -> DataFrame:
    """(doc_id, pos, h): every overlapping min_tokens-word window of
    every doc as an 8-byte xxhash64 — the gram index frame shared by the
    batch substring-dedup pipeline and its streaming twin
    (streaming/substrdedup.py, which persists exactly these rows as its
    accumulated index). Grams shuffle as hashes, never strings."""
    L = int(min_tokens)
    par = docs.sparkSession.sparkContext.defaultParallelism
    grams_sql = (
        f"CASE WHEN size(w) < {L} THEN CAST(array() AS array<string>) "
        f"ELSE transform(sequence(1, size(w) - {L - 1}), "
        f"i -> concat_ws(' ', slice(w, i, {L}))) END"
    )
    return (
        docs.select("doc_id", "text")
        .repartition(par)
        .select("doc_id", T.words("text").alias("w"))
        .select("doc_id", F.posexplode(F.expr(grams_sql)).alias("pos", "gram"))
        .select("doc_id", "pos", F.xxhash64("gram").alias("h"))
    )


def duplicate_substring_matches(
    docs: DataFrame,
    min_tokens: int = 8,
    min_count: int = 2,
    occ_cap: int = 64,
) -> DataFrame:
    """EXACT maximal duplicate-substring extraction (the suffix-array
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better", 2022 — reimplemented as sorted-k-gram diagonal runs,
    which are equivalent: a substring match of M >= L tokens between two
    locations is exactly a maximal run of M-L+1 consecutive matching
    L-grams along the (doc_a, doc_b, pos_b-pos_a) diagonal).

    Emits one row per (maximal pairwise match, side): doc_id, start, end
    (token offsets, end exclusive, end-start >= min_tokens), partner_doc,
    partner_start — the span tokens[start:end] occurs VERBATIM at the
    partner location. Within-doc repeats (doc_a == doc_b, delta > 0) are
    matches too, including overlapping ones from period-<L repetition.

    Exactness: boundaries are exact maximal extents for every substring
    all of whose L-grams occur in [min_count, occ_cap] locations. Grams
    hotter than occ_cap are dropped before pairing (the df_cap/bucket_cap
    discipline used repo-wide): ultra-hot boilerplate would otherwise
    explode the pair space quadratically, and it is already caught by the
    doc-level scorers (duplicate_spans, novelty). The property gate in
    tests compares against a sequential python model under the same cap.

    Scale shape: one groupBy(h) count (map-side combined) + a semi-join
    keeps only eligible gram positions; the pair join is an equi-join on
    h whose per-key fan-out is capped at occ_cap^2/2; diagonal runs are
    one window per (doc_a, doc_b, delta) whose partition size is bounded
    by doc length. Grams shuffle as 8-byte xxhash64 values, never
    strings (~2^-64 per-pair collision odds, the duplicate_spans
    trade)."""
    L = int(min_tokens)
    win = gram_positions(docs, min_tokens=L)
    eligible_h = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter((F.col("c") >= min_count) & (F.col("c") <= occ_cap))
        .select("h")
    )
    elig = win.join(eligible_h, "h", "left_semi")
    a = elig.select(
        F.col("h").alias("ha"),
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = elig.select(
        F.col("h").alias("hb"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    pairs = a.join(
        b,
        (F.col("ha") == F.col("hb"))
        & (
            F.struct(F.col("doc_a"), F.col("pos_a"))
            < F.struct(F.col("doc_b"), F.col("pos_b"))
        ),
    ).select(
        "doc_a", "pos_a", "doc_b",
        (F.col("pos_b") - F.col("pos_a")).alias("delta"),
    )
    wdiag = Window.partitionBy("doc_a", "doc_b", "delta").orderBy("pos_a")
    # Materialize the expensive subtree (gram explode -> eligibility
    # semi-join -> pair equi-join -> diagonal-run window) ONCE: without
    # this, the side_a/side_b union re-plans the whole chain per branch
    # (the simhash-bands precedent, operators/dedup.py).
    runs = (
        pairs.withColumn("grp", F.col("pos_a") - F.row_number().over(wdiag))
        .groupBy("doc_a", "doc_b", "delta", "grp")
        .agg(F.min("pos_a").alias("s"), F.max("pos_a").alias("e"))
        .localCheckpoint(eager=True)
    )
    side_a = runs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("s").cast("bigint").alias("start"),
        (F.col("e") + L).cast("bigint").alias("end"),
        F.col("doc_b").alias("partner_doc"),
        (F.col("s") + F.col("delta")).cast("bigint").alias("partner_start"),
    )
    side_b = runs.select(
        F.col("doc_b").alias("doc_id"),
        (F.col("s") + F.col("delta")).cast("bigint").alias("start"),
        (F.col("e") + F.col("delta") + L).cast("bigint").alias("end"),
        F.col("doc_a").alias("partner_doc"),
        F.col("s").cast("bigint").alias("partner_start"),
    )
    return side_a.unionAll(side_b)


def duplicate_cut_spans(
    docs: DataFrame,
    min_tokens: int = 8,
    min_count: int = 2,
    occ_cap: int = 64,
) -> DataFrame:
    """Span-level CUTTING intervals: the per-doc union of all exact
    maximal duplicate-substring matches (duplicate_substring_matches),
    merged into maximal disjoint (doc_id, start, end) intervals with
    n_runs = how many pairwise match spans merged into the interval.
    Every token inside an interval is covered by a verbatim >=min_tokens
    duplicate of some other location — the safe removal set for
    substring-level dedup (cut these, keep the rest of the doc), as
    opposed to duplicate_spans' doc-level coverage SCORE.

    One extra doc_id-keyed window pass over the (small) match-span frame
    does the interval union — gaps-and-islands on running max(end).

    Determinism: a doc span matching two different partners emits two
    IDENTICAL (doc_id, start, end) rows, so ORDER BY (start, end) alone
    is not a total order and the two window passes (running max(end) +
    running sum) could order the tie differently, splitting one island.
    Matches are therefore pre-aggregated to UNIQUE spans (cnt = how many
    pairwise matches collapsed) before the island windows — the ORDER BY
    is then total per doc — and n_runs = sum(cnt) per island."""
    return merge_spans(
        duplicate_substring_matches(
            docs, min_tokens=min_tokens, min_count=min_count, occ_cap=occ_cap
        ).select("doc_id", "start", "end")
    )


def merge_spans(m: DataFrame) -> DataFrame:
    """Interval union of (doc_id, start, end) rows (duplicates allowed)
    into maximal disjoint per-doc intervals with n_runs = rows merged —
    the gaps-and-islands pass shared by duplicate_cut_spans and the
    streaming twin. Duplicate rows are pre-aggregated to unique spans
    first so the island ORDER BY is total per doc (the round-9
    determinism fix)."""
    spans = m.groupBy("doc_id", "start", "end").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spans.withColumn("prev_end", F.max("end").over(wprev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull()
                | (F.col("start") > F.col("prev_end")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(wrun))
        .groupBy("doc_id", "island")
        .agg(
            F.min("start").cast("bigint").alias("start"),
            F.max("end").cast("bigint").alias("end"),
            F.sum("cnt").cast("bigint").alias("n_runs"),
        )
        .select("doc_id", "start", "end", "n_runs")
    )


def lm_fluency_scores(docs: DataFrame) -> DataFrame:
    """Corpus-self-trained bigram-LM fluency scoring — the CCNet-style
    "does this read like the corpus" quality signal (Wenzek et al. 2020
    score docs with an n-gram LM; here the LM is the corpus's own MLE
    bigram model, the standard bootstrap when no external LM ships).

    Per doc: n_bigrams, sum_ppm, avg_ppm where each bigram (w1, w2)
    contributes the Laplace-smoothed conditional probability in parts
    per million as PURE INTEGER math:

        ppm = (1_000_000 * (c(w1 w2) + 1)) div (c(w1) + V)

    c(w1 w2) = corpus bigram occurrences, c(w1) = corpus token
    occurrences of w1, V = corpus distinct-token count. Integer div is
    exact in both engines and the per-doc SUM is order-free, so the
    whole score is bit-identical in DuckDB — no floating log/ln calls
    whose last ulp could differ across libm builds. avg_ppm is one
    exact-int/exact-int IEEE division (the repo-safe pattern).
    Low-probability (rare/incoherent) word transitions pull avg_ppm
    down; repetitive high-frequency text scores high — complementary to
    the length/diversity heuristics and the repetition filters.

    Scale shape: two map-side-combined count aggregates build the model
    (bigram + unigram frames, gram-sized); V rides a broadcast 1-row
    frame (no driver action); each doc's bigrams equi-join the two
    count frames (gram-keyed shuffles, never a corpus self-join) and
    fold back with one doc-keyed partial-aggregated sum."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    bigrams_sql = (
        "CASE WHEN size(w) < 2 THEN CAST(array() AS array<string>) "
        "ELSE transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) END"
    )
    base = docs.select("doc_id", T.words("text").alias("w")).repartition(par)
    toks = base.select("doc_id", F.explode("w").alias("w1"))
    doc_bi = base.select(
        "doc_id", F.explode(F.expr(bigrams_sql)).alias("g")
    ).select(
        "doc_id",
        F.substring_index("g", " ", 1).alias("w1"),
        F.col("g"),
    )
    cb = doc_bi.groupBy("g").agg(F.count(F.lit(1)).alias("cb"))
    cu = toks.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    v = cu.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    scored = (
        doc_bi.join(cb, "g")
        .join(cu, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.expr(
                "CAST(1000000 * (cb + 1) AS BIGINT) div (cu + v)"
            ).alias("ppm"),
        )
    )
    return (
        docs.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.sum("ppm").cast("bigint").alias("sum_ppm"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("sum_ppm", F.lit(0)).cast("bigint").alias("sum_ppm"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.col("sum_ppm").cast("double")
                / F.col("n_bigrams").cast("double"),
            ).alias("avg_ppm"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    min_tokens: int = 8,
    min_count: int = 2,
    occ_cap: int = 64,
) -> DataFrame:
    """APPLY the substring-dedup cut intervals (duplicate_cut_spans) to
    the corpus: every token inside a cut interval is removed and the
    survivors are rejoined — the actual Lee et al. 2022 dedup step
    (compute duplicate spans, then CUT them from the training text),
    completing the compute-spans -> cut-spans -> cleaned-corpus chain.

    Output: (doc_id, clean_text, n_tokens, n_removed, n_kept) with
    n_tokens = pre-cut count and clean_text = '' when everything was cut
    (the doc was pure duplicate).

    Scale shape: the interval frame aggregates to ONE row per affected
    doc (sort_array(collect_list) — intervals are disjoint by
    construction, so the array is doc-length-bounded and the sort is
    total), then a doc_id-keyed LEFT join back to the corpus; the cut
    itself is a scan-side array filter (positions x intervals per doc,
    both doc-length-bounded) — no explode of corpus tokens, no
    token-level shuffle."""
    spans = (
        duplicate_cut_spans(
            docs, min_tokens=min_tokens, min_count=min_count, occ_cap=occ_cap
        )
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("start", "end"))
            ).alias("iv")
        )
    )
    keep_sql = (
        "CASE WHEN iv IS NULL THEN sequence(0, size(w) - 1) "
        "ELSE filter(sequence(0, size(w) - 1), "
        "i -> NOT exists(iv, s -> i >= s.start AND i < s.end)) END"
    )
    return (
        docs.select("doc_id", T.words("text").alias("w"))
        .join(spans, "doc_id", "left")
        .select("doc_id", "w", F.expr(keep_sql).alias("keep"))
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.expr("transform(keep, i -> element_at(w, i + 1))")
            ).alias("clean_text"),
            F.size("w").cast("bigint").alias("n_tokens"),
            (F.size("w") - F.size("keep")).cast("bigint").alias("n_removed"),
            F.size("keep").cast("bigint").alias("n_kept"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    shard_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each shard, documents
    are concatenated in doc_id order and cut into fixed `capacity`-token
    training sequences; each doc is mapped to its token offset and the
    sequence span [first_seq, last_seq] it lands in. This is the standard
    GPT-style packing (concatenate, then chunk) — no padding waste, docs
    may straddle a boundary.

    Scale shape: ONE shuffle keyed by the shard columns with a per-shard
    sort (running-sum window). Parallelism = number of shards: real
    pipelines shard by (source, hash-bucket) exactly like `epoch_split`
    so no shard outgrows an executor; a single global pack order is
    inherently sequential and deliberately not offered.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*shard_cols)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = T.token_count("text").cast("bigint")
    cum = docs.select(
        *shard_cols, "doc_id", n_tok.alias("n_tokens")
    ).withColumn("end_offset", F.sum("n_tokens").over(w))
    return cum.select(
        *shard_cols,
        "doc_id",
        "n_tokens",
        (F.col("end_offset") - F.col("n_tokens")).alias("start_offset"),
        F.expr(f"(end_offset - n_tokens) div {capacity}")
        .cast("bigint")
        .alias("first_seq"),
        F.expr(f"(end_offset - 1) div {capacity}").cast("bigint").alias("last_seq"),
    )


def dataset_card(docs: DataFrame, strata_col: str = "source") -> DataFrame:
    """Per-source dataset-card row: the summary a data team publishes
    next to a corpus — doc/token volume, language spread, distinct-text
    count (n_docs - n_unique_texts = exact duplicates), token-length
    range, and mean quality.

    Two shuffles: the multi-distinct aggregate plans as Expand + partial
    count-distinct + final merge (both stages map-side combined — the
    exchanges carry per-(stratum, distinct-value) partials, never raw
    docs). avg_quality routes the per-doc doubles through DECIMAL(18,6)
    so the sum is order-independent (the registry parity convention) and
    divides once at the end.

    Returns (strata_col, n_docs, total_tokens, n_langs, n_unique_texts,
    min_tokens, max_tokens, avg_quality).
    """
    scored = quality_scores(docs, keep_cols=(strata_col, "lang", "text"))
    per_doc = scored.select(
        strata_col,
        "lang",
        F.md5("text").alias("_h"),
        F.col("n_tokens").cast("bigint").alias("_t"),
        F.col("quality").cast("decimal(18,6)").alias("_q"),
    )
    return per_doc.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_t").cast("bigint").alias("total_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("_h").cast("bigint").alias("n_unique_texts"),
        F.min("_t").cast("bigint").alias("min_tokens"),
        F.max("_t").cast("bigint").alias("max_tokens"),
        (
            F.sum("_q").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_quality"),
    )


def source_overlap_matrix(
    docs: DataFrame,
    n: int = 5,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources, how
    many distinct n-grams they share — the mirrored-content /
    cross-source-duplication signal a curation team checks before
    treating sources as independent.

    Scale design: there is NO gram-keyed self-join. Each gram's distinct
    source list is aggregated first (bounded by #sources — dozens, not
    corpus-sized), pairs explode from those tiny sorted lists, and a
    final count groups by the pair. Shuffled bytes: one (gram, source)
    distinct pass + one gram-keyed list aggregation + one #sources²-key
    count — every stage map-side combined, nothing quadratic in corpus
    size. A gram shared by s sources emits s·(s-1)/2 pair rows, bounded
    by the source count, not by document frequency.

    Returns (source_a, source_b, shared_grams) with source_a < source_b,
    only pairs sharing >= 1 gram.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    gs = (
        docs.select(strata_col, text_col)
        .repartition(par)
        # project the words array ONCE: shingles_of_words inlines its
        # words argument into every per-shingle lambda, so passing a raw
        # split() would re-split the text O(n_words) times per doc
        .select(strata_col, F.col(text_col), T.words(text_col).alias("_w"))
        .select(
            strata_col,
            F.explode(
                F.array_distinct(T.shingles_of_words("_w", text_col, n))
            ).alias("gram"),
        )
        .distinct()
    )
    per_gram = gs.groupBy("gram").agg(
        F.array_sort(F.collect_set(strata_col)).alias("srcs")
    )
    pairs = per_gram.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (a, i) -> "
                "transform(slice(srcs, i + 2, size(srcs)), "
                "b -> struct(a as source_a, b as source_b))))"
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("shared_grams")
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking: cut each doc into `window`-token
    chunks starting every `stride` tokens (overlap = window - stride), the
    standard RAG-ingest / long-context-training splitter. Unlike
    pack_sequences (concat-then-chunk across docs), chunks never cross a
    document boundary, and the tail is always covered: the last start is
    the smallest multiple of `stride` reaching the final token, so the
    last chunk may be shorter than `window` but no token is dropped.

    Scale shape: scan-side split + sequence/explode — zero shuffles, zero
    joins; output size = sum(ceil(max(n-window,0)/stride)+1) rows. All
    arithmetic is integer (truncating div on non-negative operands ==
    floor), so chunk boundaries are bit-identical in any engine.

    Returns (doc_id, chunk_id, start_token, n_tokens, chunk_text).
    """
    if not (0 < stride <= window):
        raise ValueError("need 0 < stride <= window")
    words = F.split(F.col(text_col), " ")
    # number of stride steps after the first chunk that still uncover
    # new tokens: ceil((n - window)/stride) for n > window, else 0
    steps = (
        f"CASE WHEN size(_w) <= {window} THEN 0 "
        f"ELSE (size(_w) - {window} + {stride} - 1) div {stride} END"
    )
    return (
        docs.select("doc_id", words.alias("_w"))
        .select(
            "doc_id",
            "_w",
            F.explode(
                F.expr(f"sequence(0, ({steps}) * {stride}, {stride})")
            ).alias("start_token"),
        )
        .select(
            "doc_id",
            F.expr(f"start_token div {stride}").cast("int").alias("chunk_id"),
            F.col("start_token").cast("int"),
            F.expr(f"size(slice(_w, start_token + 1, {window}))")
            .cast("int")
            .alias("n_tokens"),
            F.expr(f"array_join(slice(_w, start_token + 1, {window}), ' ')").alias(
                "chunk_text"
            ),
        )
    )


# PII patterns restricted to the RE2 ∩ Java-regex common subset (no
# backreferences, no lookaround) so the identical strings run in Spark
# (JVM) and DuckDB (RE2). Longer alternation branches first: both engines
# scan leftmost and try branches in order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\b(?:\d{2}-\d{3}-\d{3}-\d{4}|\d{3}[-.]\d{3}[-.]\d{4})\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """PII scan + redaction: per-row counts of email / phone / IPv4
    matches in the ORIGINAL text, plus the redacted text with each
    category replaced by its [TAG] (applied in the fixed PII_PATTERNS
    order — email first, so a phone-shaped local part is already gone
    before the phone pass).

    Pure JVM regex column math — scan-side, zero shuffle, pushes the
    projection into the scan like every other text filter. At 100 TB this
    runs at parquet read speed; there is no per-row Python anywhere.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return df.select(*id_cols, *counts, red.alias("redacted"))


def epoch_split(
    docs: DataFrame,
    n_epochs: int,
    salt: str = "epoch1",
    id_col: str = "doc_id",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic replacement-free epoch assignment: every doc lands in
    EXACTLY one of n_epochs partitions (epoch = md5(salt|id) mod n), so
    multi-epoch training sees each document once per salt — the
    without-replacement guarantee `stratified_sample`'s independent
    Bernoulli draws cannot give. Rotating the salt reshuffles membership
    for the next pass. Scan-side column math, zero shuffle; filtering one
    epoch prunes at the scan exactly like the sampler."""
    if n_epochs < 1:
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    assigned = (
        T.hex_hash_int(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
        % n_epochs
    )
    return docs.withColumn(epoch_col, assigned.cast("int"))


def token_budget_mixture(
    docs: DataFrame,
    budget_tokens: int,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Water-filling token allocation: split a total token budget across
    strata as evenly as possible without exceeding any stratum's supply —
    the "data mixing under a budget" planner that turns a target corpus
    size into per-source sampling fractions for `stratified_sample`.

    Equal-share water-filling: find the level L with
    sum(min(available_s, L)) = budget; strata below L keep everything,
    strata above are capped at L. Closed form over the per-stratum totals
    sorted ascending — the first stratum whose supply exceeds its
    equal share of the remaining budget sets the level (every following
    stratum is larger, so it qualifies too and its candidate is smaller:
    the boundary's candidate is the MAX among qualifying rows).

    Output: (strata_col, available_tokens, allocated_tokens, keep_frac).
    When the budget covers the whole corpus, every keep_frac is 1.0.

    All arithmetic is a fixed sequence of exact-int-operand IEEE double
    ops — bit-identical in DuckDB (the oracle recomputes it).

    Scale shape: one partial-aggregated shuffle over the corpus reduces
    it to #strata rows; the single-partition windows after that operate
    on that tiny frame only (sources number in the dozens), which is the
    deliberate and documented exception to the no-global-window rule.
    """
    avail = docs.groupBy(strata_col).agg(
        F.sum(T.token_count(text_col)).cast("bigint").alias("available_tokens")
    )
    order = [F.col("available_tokens"), F.col(strata_col)]
    w_cum = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    lv = avail.select(
        strata_col,
        "available_tokens",
        (
            F.sum("available_tokens").over(w_cum) - F.col("available_tokens")
        ).alias("_prefix"),
        F.row_number().over(Window.orderBy(*order)).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    ).withColumn(
        "_cand",
        (F.lit(float(budget_tokens)) - F.col("_prefix"))
        / (F.col("_n") - F.col("_rn") + 1),
    )
    level = F.max(
        F.when(F.col("available_tokens") > F.col("_cand"), F.col("_cand"))
    ).over(w_all)
    return (
        lv.withColumn("_level", level)
        .withColumn(
            "allocated_tokens",
            F.when(
                F.col("_level").isNull(), F.col("available_tokens").cast("double")
            ).otherwise(
                F.least(F.col("available_tokens").cast("double"), F.col("_level"))
            ),
        )
        .withColumn(
            "keep_frac",
            F.least(
                F.lit(1.0),
                F.col("allocated_tokens")
                / F.col("available_tokens").cast("double"),
            ),
        )
        .select(strata_col, "available_tokens", "allocated_tokens", "keep_frac")
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """One BPE-training counting step: corpus-wide frequencies of adjacent
    symbol pairs (here: character bigrams inside words, weighted by word
    frequency) — the statistic whose argmax is the next merge in
    byte-pair-encoding vocabulary induction (Sennrich et al. 2016).

    Scale shape — the part that matters at 100 TB: the corpus is first
    reduced to the DISTINCT-WORD frame with exact frequencies (one
    map-side-combined shuffle; vocabulary grows ~O(sqrt(corpus)) by
    Heaps' law, so this frame is tiny relative to the scan), and the
    per-character explode runs over that frame — never over the corpus.
    A second uniform-key shuffle aggregates pair counts, and the top-k is
    a TakeOrdered, not a global sort. The full BPE loop composes by
    rewriting the distinct-word frame with the chosen merge and running
    the same count again — each iteration touches only the vocabulary.

    Returns (pair, n, rnk): the top_k pairs, count-desc then pair-asc
    (fully deterministic).
    """
    wf = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        # single-char words carry no adjacent pair; drop BEFORE sequence()
        # (Spark's sequence(1, 0) counts DOWN rather than yielding empty)
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    counted = pairs.groupBy("pair").agg(F.sum("freq").cast("bigint").alias("n"))
    return (
        counted.orderBy(F.col("n").desc(), F.col("pair"))
        .limit(top_k)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("pair")))
            .cast("int"),
        )
    )


def _bpe_sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bpe_merge_expr(a: str, b: str, inner: str = "syms") -> str:
    """Rewrite a symbol array by greedily merging leftmost non-overlapping
    adjacent (a, b) occurrences into a||b — one aggregate fold with a
    (emitted, held) accumulator, entirely JVM-side. The held symbol is
    flushed by the finish lambda; a freshly merged symbol is NOT held, so
    it cannot left-participate in another (a, b) merge this pass (e.g.
    merge (a,a) on 'aaaa' yields ['aa','aa'] — the Sennrich et al. 2016
    single-pass replacement semantics). `inner` lets a BATCHED pass nest
    several folds in one projection (bpe_train batch_m)."""
    qa, qb = _bpe_sql_quote(a), _bpe_sql_quote(b)
    qab = _bpe_sql_quote(a + b)
    return f"""aggregate(
        {inner},
        named_struct('out', cast(array() as array<string>),
                     'prev', cast(null as string)),
        (acc, s) -> CASE
            WHEN acc.prev IS NULL
                THEN named_struct('out', acc.out, 'prev', s)
            WHEN acc.prev = {qa} AND s = {qb}
                THEN named_struct('out', array_append(acc.out, {qab}),
                                  'prev', cast(null as string))
            ELSE named_struct('out', array_append(acc.out, acc.prev),
                              'prev', s)
        END,
        acc -> CASE WHEN acc.prev IS NULL THEN acc.out
                    ELSE array_append(acc.out, acc.prev) END
    )"""


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    batch_m: int = 1,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table (Sennrich et al. 2016): alternate
    count-adjacent-pairs → take the argmax as the next merge → rewrite
    the vocabulary with that merge — the composed loop whose single
    counting step is `bpe_pair_counts` and whose inference twin is
    `bpe_encode` (greedy rank-order application round-trips this table:
    equivalence-tested against a sequential python trainer).

    Cost model, the 100 TB part: the CORPUS is touched exactly once — one
    explode + map-side-combined groupBy reducing it to the distinct-word
    frame (vocabulary-sized: ~O(sqrt(corpus tokens)) by Heaps' law),
    checkpointed. Every one of the n_merges iterations then runs two
    vocabulary-frame jobs (a pair-count TakeOrdered(1) and a fold-rewrite
    checkpoint) — iteration cost is n_merges x O(vocabulary), independent
    of corpus size, the same discipline as the verdict-reviewed
    `bpe_pair_counts`. Driver state is the merge list itself.

    Determinism: argmax ties break (count desc, a asc, b asc); the
    rewrite fold is order-exact per word; words reduced to one symbol are
    dropped from the frame (they can never pair again). Single-character
    words never enter (no adjacent pair — and `sequence(1, 0)` would
    count DOWN, the known trap).

    Batched passes (r15 verdict Next #6): ``batch_m > 1`` applies up to
    m merges per pass — SEQUENCE-IDENTICAL to batch_m=1 by construction
    (property-tested), cutting the driver-paced pass count up to m-fold.
    The batch is the maximal SAFE PREFIX of the (count desc, a, b)-sorted
    candidates: selection stops at the first candidate that (a) shares a
    symbol with an earlier selection — its count could have changed — or
    (b) whose count does not strictly exceed every earlier selection's
    max ADJACENT-TRIGRAM count, the tight upper bound on any pair a
    previous merge can CREATE (a new pair (X, c) needs an "a b c"
    occurrence, so count(X, c) <= count(trigram a b c)). Within such a
    prefix the sequential argmax is provably each member in order:
    disjoint symbols keep members' counts unchanged, old pairs only lose
    count, and created pairs are strictly out-counted. Cost per pass
    gains one trigram aggregation over the vocabulary frame (same shape
    as the pair count); `stats` (optional dict) receives
    {"passes", "batch_sizes"} so the pass saving is measurable.

    Returns the learned merges in order — feed directly to `bpe_encode`.
    """
    wf = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(F.split("w", "").alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    if batch_m < 1:
        raise ValueError(f"batch_m must be >= 1, got {batch_m}")
    merges: list[tuple[str, str]] = []
    batch_sizes: list[int] = []
    pair_structs = F.explode(
        F.expr(
            "transform(sequence(1, size(syms) - 1), "
            "i -> named_struct('a', element_at(syms, i), "
            "'b', element_at(syms, i + 1)))"
        )
    ).alias("p")
    tri_structs = F.explode(
        F.expr(
            "transform(sequence(1, size(syms) - 2), "
            "i -> named_struct('a', element_at(syms, i), "
            "'b', element_at(syms, i + 1), "
            "'c', element_at(syms, i + 2)))"
        )
    ).alias("t")
    while len(merges) < n_merges:
        remaining = n_merges - len(merges)
        m = min(batch_m, remaining)
        pairs = (
            wf.select("freq", pair_structs)
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("bigint").alias("n"))
        )
        if m > 1:
            # the new-pair bound: max adjacent-trigram count per pair,
            # as prefix (a b ?) and as suffix (? a b)
            tri = (
                wf.filter(F.size("syms") >= 3)
                .select("freq", tri_structs)
                .groupBy("t.a", "t.b", "t.c")
                .agg(F.sum("freq").cast("bigint").alias("n3"))
                .localCheckpoint(eager=True)
            )
            pre = tri.groupBy("a", "b").agg(F.max("n3").alias("mpre"))
            suf = (
                tri.groupBy("b", "c")
                .agg(F.max("n3").alias("msuf"))
                .select(
                    F.col("b").alias("a"), F.col("c").alias("b"), "msuf"
                )
            )
            pairs = pairs.join(pre, ["a", "b"], "left").join(
                suf, ["a", "b"], "left"
            )
        else:
            pairs = pairs.withColumn("mpre", F.lit(None)).withColumn(
                "msuf", F.lit(None)
            )
        top = (
            pairs.orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(max(4 * m, m))
            .collect()
        )
        if not top:
            break  # vocabulary fully merged — nothing left to pair
        batch: list[tuple[str, str]] = []
        used: set[str] = set()
        guard = 0  # max created-pair bound over selected merges so far
        for r in top:
            if batch and (r["a"] in used or r["b"] in used):
                break  # count may have changed: the prefix ends here
            if batch and not (int(r["n"]) > guard):
                break  # a created pair could outrank it in the sequence
            batch.append((r["a"], r["b"]))
            used.update((r["a"], r["b"]))
            guard = max(guard, int(r["mpre"] or 0), int(r["msuf"] or 0))
            if len(batch) >= m:
                break
        merges.extend(batch)
        batch_sizes.append(len(batch))
        expr = "syms"
        for a, b in batch:
            expr = _bpe_merge_expr(a, b, inner=expr)
        wf = (
            wf.select(F.expr(expr).alias("syms"), "freq")
            .filter(F.size("syms") >= 2)
            .localCheckpoint(eager=True)
        )
    if stats is not None:
        stats["passes"] = len(batch_sizes)
        stats["batch_sizes"] = batch_sizes
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge table: each word starts as characters
    and adjacent pairs merge in MERGE-RANK order (lowest rank first,
    leftmost occurrence first on rank ties) — the exact greedy procedure
    of Sennrich et al. 2016 at inference time. Complements
    bpe_pair_counts (which produces the next merge candidate during
    training: alternate count → append argmax to `merges` → re-encode).

    Execution shape: mapInPandas with a PER-BATCH DISTINCT-WORD memo —
    Zipf's law means a batch's rows repeat a small word set, so each
    distinct word is encoded once per batch, not once per occurrence;
    the merge table ships in the task closure (vocabularies are
    10k-100k pairs — broadcast-sized by construction). No shuffle; the
    output is a scan-side projection.

    Returns (doc_id, n_tokens, n_pieces, pieces) — pieces joined by
    spaces within a word and ' | ' between words (both separators are
    outside any piece alphabet produced from space-split words).
    """
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        pieces = list(word)
        while len(pieces) > 1:
            best_rank, best_i = None, None
            for i in range(len(pieces) - 1):
                r = ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            pieces[best_i : best_i + 2] = [
                pieces[best_i] + pieces[best_i + 1]
            ]
        memo[word] = pieces
        return pieces

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            memo: dict = {}
            n_tok, n_pc, joined = [], [], []
            for text in pdf["text"]:
                words = text.split(" ")
                enc = [encode_word(w, memo) for w in words]
                n_tok.append(len(words))
                n_pc.append(sum(len(e) for e in enc))
                joined.append(" | ".join(" ".join(e) for e in enc))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pd.Series(n_tok, dtype="int64"),
                    "n_pieces": pd.Series(n_pc, dtype="int64"),
                    "pieces": joined,
                }
            )

    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        run, "doc_id long, n_tokens long, n_pieces long, pieces string"
    )


def temperature_mixture(
    docs: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture allocation: stratum i gets budget share
    proportional to available_i^alpha — the standard multilingual /
    multi-source reweighting (alpha < 1 upsamples low-resource strata,
    alpha = 1 is proportional, alpha = 0 is uniform). Complements
    `token_budget_mixture`'s water-filling: temperature SHIFTS mass
    toward small strata instead of capping large ones.

    Because a small stratum's allocation can exceed its supply, the plan
    reports both `keep_frac` (capped at 1 — feed it straight to
    `stratified_sample_by_plan`) and `repeat_factor`
    (allocated/available; > 1 means the stratum must repeat across
    epochs — pair with `epoch_split` — which is how temperature sampling
    upsamples in practice).

    Exactness: alpha=0.5 (the default) uses IEEE sqrt — correctly
    rounded, so bit-identical in any conforming engine; the weight total
    is a LEFT-TO-RIGHT running sum in strata order (a window running
    frame, not an unordered SUM), so double rounding is order-fixed and
    the DuckDB oracle reproduces it exactly. Other alphas go through
    pow(), which carries no cross-engine rounding guarantee — supported,
    but not oracle-gated.

    Scale shape: one partial-aggregated shuffle reduces the corpus to
    #strata rows; the windows after that run on that tiny frame only
    (the same documented exception as token_budget_mixture).
    """
    avail = docs.groupBy(strata_col).agg(
        F.sum(T.token_count(text_col)).cast("bigint").alias("available_tokens")
    )
    w = (
        F.sqrt(F.col("available_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("available_tokens").cast("double"), F.lit(alpha))
    )
    w_run = (
        Window.orderBy(strata_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    plan = (
        avail.withColumn("weight", w)
        .withColumn("_cum", F.sum("weight").over(w_run))
        # weights are >= 0 so the running sum is monotone: its max IS the
        # left-to-right total, with a deterministic addition order
        .withColumn("_wsum", F.max("_cum").over(w_all))
        .withColumn(
            "allocated_tokens",
            F.lit(float(budget_tokens)) * F.col("weight") / F.col("_wsum"),
        )
        .withColumn(
            "repeat_factor",
            F.col("allocated_tokens") / F.col("available_tokens").cast("double"),
        )
        .withColumn("keep_frac", F.least(F.lit(1.0), F.col("repeat_factor")))
    )
    return plan.select(
        strata_col,
        "available_tokens",
        "weight",
        "allocated_tokens",
        "keep_frac",
        "repeat_factor",
    )


def stratified_sample_by_plan(
    docs: DataFrame,
    plan: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix1",
    precision: int = 10_000,
) -> DataFrame:
    """Realize a mixture plan: keep each doc iff
    md5(salt|id) mod precision < floor(keep_frac(stratum) · precision).

    The fractional-rate generalization of `stratified_sample` (int
    percents) — its `keep_frac` column comes straight from
    `token_budget_mixture`. Deterministic hash-Bernoulli (same corpus on
    every run/engine), and the plan side is explicitly broadcast: strata
    number in the dozens, so the join adds no shuffle and the filter
    stays scan-side."""
    rate = F.floor(F.col("keep_frac") * precision).cast("bigint")
    bucket = (
        T.hex_hash_int(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
        % precision
    )
    return (
        docs.join(
            F.broadcast(plan.select(strata_col, "keep_frac")), strata_col
        )
        .filter(bucket < rate)
        .drop("keep_frac")
    )


def ngram_novelty_scores(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc n-gram novelty: what fraction of a doc's DISTINCT word
    n-grams FIRST occur (corpus-wide minimum doc id) in this doc.

    The signal curation pipelines read it for: a doc whose novelty is
    near 0 is assembled almost entirely from n-grams some earlier doc
    already carries — boilerplate, quotes, templated spam, shuffled
    near-duplicates — even when no single pairwise Jaccard crosses a
    dedup threshold (cf. the duplicated-span pressure C4/RefinedWeb
    prune on). Near 1 means fresh content. "First" = minimum doc id,
    the same deterministic keep-one convention as exact dedup.

    Plan shape at 100 TB: ONE explode to the distinct (doc, gram)
    inverted index (the same frame every n-gram dedup op here builds);
    per-gram first-occurrence is a map-side-combined MIN; both per-doc
    counts are map-side-combined COUNTs; the final assembly joins two
    DOC-sized frames (one row per doc) — the gram-sized frame is never
    joined against itself, so there is no pair blow-up anywhere and no
    df_cap is needed. novelty = exact-int / exact-int in one IEEE
    division (correctly rounded — bit-identical cross-engine).

    Returns (doc_id, n_grams, n_novel, novelty).
    """
    grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("ws"),
            F.col(text_col).alias("text"),
        )
        .select(
            "doc_id",
            F.explode(T.shingles_of_words("ws", "text", n)).alias("gram"),
        )
        .distinct()
    )
    per_doc = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    novel = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    return (
        per_doc.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0).cast("bigint")).alias("n_novel"),
            (
                F.coalesce("n_novel", F.lit(0).cast("bigint")).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS scheme): hash every word k-gram, slide a
    window of w consecutive hashes, and select each window's MINIMUM
    (ties → the RIGHTMOST minimal position, the paper's robust-winnowing
    rule). The selected set is position-stable under unrelated edits —
    the guarantee plagiarism/overlap detectors rely on: every w
    consecutive k-grams contribute at least one selected fingerprint, so
    any shared run of w + k - 1 words between two docs is caught by at
    least one shared fingerprint.

    Complements the existing fingerprint family: `fingerprints` hashes
    the WHOLE doc (exact-sequence identity), `duplicate_span_counts`
    counts window-hash multiplicity corpus-wide; winnowing gives the
    per-doc compact sketch (≈ 2/(w+1) of grams selected) that overlap
    joins can run on instead of full gram sets.

    Docs with fewer than w k-grams select their single global minimum
    (the frame at the last position covers every gram), so every doc
    emits at least one fingerprint.

    Scale shape: one scan-side shingle projection + posexplode, then ONE
    window partitioned BY DOC (per-doc partitions are document-sized —
    never a corpus-wide sort), a min(struct) per frame (no second pass:
    the rightmost-tie position rides the struct as a negated field), and
    a distinct over the selected (doc, pos, fp) rows. Hashes are
    md5-derived bigints (portable — DuckDB-oracle hash-parity-gated).

    Returns (doc_id, fp_pos, fp): 1-based gram position + fingerprint.
    """
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("ws"),
            F.col(text_col).alias("text"),
        )
        # shingle array projected ONCE per row (the functions/text.py
        # projection-boundary discipline) — posexplode and size then read
        # the same column instead of re-building the grams twice
        .select("doc_id", T.shingles_of_words("ws", "text", k).alias("sh"))
        .select(
            "doc_id",
            F.posexplode("sh").alias("p0", "gram"),
            F.size("sh").alias("n_grams"),
        )
    )
    hashed = base.select(
        "doc_id",
        (F.col("p0") + 1).alias("pos"),
        "n_grams",
        T.hex_hash_int(F.col("gram")).alias("h"),
    )
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    sel = F.min(F.struct(F.col("h"), (-F.col("pos")).alias("negpos"))).over(
        frame
    )
    return (
        hashed.withColumn("sel", sel)
        .filter(F.col("pos") >= F.least(F.lit(w), F.col("n_grams")))
        .select(
            "doc_id",
            (-F.col("sel.negpos")).cast("bigint").alias("fp_pos"),
            F.col("sel.h").alias("fp"),
        )
        .distinct()
    )


def winnowing_overlap_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    fp_cap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-overlap candidate pairs from winnowing sketches: pairs of
    docs sharing >= min_shared selected fingerprints — the MOSS overlap
    join. The winnowing guarantee makes the candidate set meaningful:
    any shared run of w + k - 1 words forces at least one shared
    fingerprint, so long verbatim overlaps cannot hide, while the join
    runs on the ≈ 2/(w+1)-density sketch instead of full gram sets
    (the compact-sketch counterpart of `ngram_jaccard_pairs`).

    Scale shape: the inverted index is (fp → docs) over SKETCH rows;
    `fp_cap` drops fingerprints selected by more than fp_cap docs before
    the self-join (the df_cap discipline — a boilerplate fingerprint
    shared by thousands of docs would otherwise blow the pair space
    quadratically; dropping it only loses pairs whose overlap evidence
    was that one ubiquitous — i.e. least discriminative — fingerprint).
    One equi-join on fp, map-side-combined pair counts.

    Returns (doc_a, doc_b, shared_fps) with doc_a < doc_b.
    """
    fps = (
        winnowing_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=True)  # feeds the cap count AND both join sides
    )
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dfc"))
        .filter(F.col("dfc") > fp_cap)
        .select("fp")
    )
    kept = fps.join(hot, "fp", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Positive-PMI adjacent-bigram collocations, ranked corpus-wide.

    The corpus-analysis classic (Church & Hanks 1990): for every adjacent
    token pair, PMI = ln(N * c_xy / (c_x * c_y)) against the bigram
    marginals. Pairs with lift < 1 (negative PMI — anti-collocations) and
    pairs rarer than ``min_count`` are dropped; the survivors rank by
    ``pmi_micro`` (PMI in integer micro-nats via the deterministic ln of
    functions/detmath.py, so the DuckDB oracle is bit-identical).

    Scale shape (100 TB): ONE pass explodes bigrams into a map-side-
    combined (w1, w2) count frame; marginals derive from that frame by
    re-aggregation (never a second corpus scan), N rides a single-row
    broadcast (the lm_fluency pattern), and the global top-k is
    TakeOrdered — no full sort. The pair-count frame feeds four branches
    (join input, both marginals, N) so it is localCheckpoint-ed once.

    Columns: (w1, w2, c_xy, c_x, c_y, pmi_micro).
    """
    from db_integration_via_kafka_ksql_spark.functions.detmath import det_ln_sql

    toks = docs.select(F.split(F.col("text"), " ").alias("w"))
    bigrams = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, F.size("w") - 1).alias("w1"),
                F.slice(F.col("w"), 2, F.size("w") - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    pairs = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .localCheckpoint(eager=True)
    )
    cx = pairs.groupBy("w1").agg(F.sum("c_xy").cast("long").alias("c_x"))
    cy = pairs.groupBy("w2").agg(F.sum("c_xy").cast("long").alias("c_y"))
    n = pairs.agg(F.sum("c_xy").cast("long").alias("n_total"))
    lift = (
        "(CAST(n_total AS DOUBLE) * CAST(c_xy AS DOUBLE)"
        " / CAST(c_x AS DOUBLE) / CAST(c_y AS DOUBLE))"
    )
    scored = (
        pairs.join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .filter(F.col("c_xy") >= min_count)
        .filter(F.expr(f"{lift} >= 1.0e0"))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                f"CAST(floor(1.0e6 * {det_ln_sql(lift, 'spark')}) AS BIGINT)"
            ).alias("pmi_micro"),
        )
    )
    return scored.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_k)


def weighted_sample_per_stratum(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    seed: str = "w0",
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """Weighted sampling without replacement, k per stratum
    (Efraimidis & Spirakis 2006, the exponential-race / A-ES scheme).

    Each row draws a deterministic uniform u = (h+1)/2^60 from a salted
    md5 hash and competes with priority -ln(u)/w — the k SMALLEST
    priorities per stratum are an exact weight-proportional sample
    without replacement. The ln comes from functions/detmath.py (basic
    IEEE ops), the priority is floored to integer nano-units, and rank
    order is (priority_nano, doc_id) — fully deterministic, so the
    DuckDB oracle replays the draw bit-for-bit. Re-salting ``seed``
    yields fresh independent samples (the statistical bias property is
    asserted across many salts in tests).

    Scale shape: identical to sample_k_per_stratum — scan-side hash +
    priority, one per-stratum rank window, nothing global. The sampler a
    token-budget mixture realizes when strata need length- or
    quality-proportional draws rather than uniform ones.

    Returns (id, stratum, weight, priority_nano, rnk).
    """
    from db_integration_via_kafka_ksql_spark.functions.detmath import det_ln_sql

    h = T.hex_hash_int(
        F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")), 15
    )
    base = docs.select(
        F.col(id_col),
        F.col(strata_col),
        F.col(weight_col).cast("long").alias("weight"),
        h.alias("_h"),
    )
    ln_inv_u = det_ln_sql(
        f"(CAST({1 << 60} AS DOUBLE) / CAST(_h + 1 AS DOUBLE))", "spark"
    )
    pri = base.withColumn(
        "priority_nano",
        F.expr(
            f"CAST(floor(1.0e9 * {ln_inv_u} / CAST(greatest(weight, 1) AS DOUBLE))"
            " AS BIGINT)"
        ),
    ).drop("_h")
    w = Window.partitionBy(strata_col).orderBy(
        F.col("priority_nano").asc(), F.col(id_col).asc()
    )
    return (
        pri.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col, strata_col, "weight", "priority_nano",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


CURRICULUM_BUCKETS = 10


def curriculum_order(
    docs: DataFrame,
    salt: str = "curriculum-v1",
    n_buckets: int = CURRICULUM_BUCKETS,
) -> DataFrame:
    """Curriculum training order: quality-decile buckets consumed
    easy-first (highest decile = bucket 0), deterministically shuffled
    WITHIN each bucket (salted md5 over doc_id — re-salting draws an
    independent shuffle, the weighted-sampling convention).

    The global position is NOT a global sort: positions are computed
    per-bucket (a partitioned row_number window), and each bucket's
    offset is the prefix-sum of bucket sizes — an n_buckets-row frame
    joined back by broadcast. At 100 TB that is one partitioned window
    over the corpus plus 10 rows of driver-free bookkeeping, where the
    naive `row_number() OVER (ORDER BY ...)` ships every row through a
    single task. The oracle replays the decile/shuffle/offset math
    exactly (the quality expression is the fixed-order IEEE recipe of
    quality_scores).

    Returns (doc_id, bucket, pos_in_bucket, global_pos).
    """
    from pyspark.sql.window import Window

    scored = quality_scores(docs).select("doc_id", "quality")
    # decile from the [0,1] score; easy-first: high quality -> bucket 0
    bucket = F.least(
        F.floor(F.col("quality") * F.lit(float(n_buckets))).cast("bigint"),
        F.lit(n_buckets - 1),
    )
    shuffled = scored.select(
        "doc_id",
        (F.lit(n_buckets - 1) - bucket).cast("bigint").alias("bucket"),
        T.hex_hash_int(
            F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    wpos = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    positioned = shuffled.withColumn(
        "pos_in_bucket", (F.row_number().over(wpos) - 1).cast("bigint")
    ).localCheckpoint(eager=True)  # feeds sizes AND the final join
    sizes = positioned.groupBy("bucket").agg(F.count(F.lit(1)).alias("sz"))
    woff = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    offsets = sizes.select(
        "bucket",
        F.coalesce(F.sum("sz").over(woff), F.lit(0)).cast("bigint").alias("off"),
    )
    return (
        positioned.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "bucket",
            "pos_in_bucket",
            (F.col("off") + F.col("pos_in_bucket")).cast("bigint")
            .alias("global_pos"),
        )
    )


def quality_bucket_counts(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Per-(source, quality-decile) doc counts — the shared first stage of
    the batch drift monitor below and the streaming at-arrival twin
    (streaming/drift.py): one corpus scan, map-side-combined."""
    return (
        quality_scores(docs, keep_cols=("source",))
        .select(
            "source",
            F.least(
                F.floor(F.col("quality") * F.lit(float(n_buckets))).cast("bigint"),
                F.lit(n_buckets - 1),
            ).alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quality_drift_by_source(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Per-source quality-distribution drift: L1 distance (in permille,
    0..2000) between each source's quality-decile histogram and the
    corpus-wide one — the data-quality monitor that catches a feed going
    bad (a crawler regression shifts its quality mass) BEFORE the mixture
    planner happily samples from it. All-integer shares so the report is
    engine-exact.

    Scale shape: one corpus scan -> (source, bucket) counts (map-side
    combined); everything after operates on |sources| x n_buckets rows —
    the global histogram re-aggregates the per-source counts (no second
    scan) and rides a broadcast onto the sources-x-buckets grid.

    Returns (source, n_docs, drift_permille).
    """
    sb = quality_bucket_counts(docs, n_buckets).localCheckpoint(
        eager=True
    )  # feeds totals, the global hist, and the grid
    totals = sb.groupBy("source").agg(F.sum("cnt").alias("n_docs"))
    ghist = sb.groupBy("bucket").agg(F.sum("cnt").alias("gcnt"))
    gtotal = ghist.agg(F.sum("gcnt").alias("gtotal"))
    grid = (
        totals.crossJoin(F.broadcast(ghist))
        .crossJoin(F.broadcast(gtotal))
        .join(sb, ["source", "bucket"], "left")
        .select(
            "source",
            "n_docs",
            F.expr(
                "abs(coalesce(cnt, 0) * 1000 DIV n_docs"
                " - gcnt * 1000 DIV gtotal)"
            ).alias("d"),
        )
    )
    return grid.groupBy("source").agg(
        F.max("n_docs").cast("bigint").alias("n_docs"),
        F.sum("d").cast("bigint").alias("drift_permille"),
    )


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned BPE merge table as a single JSON artifact —
    the tokenizer is a training ARTIFACT (fit once on a corpus snapshot,
    served everywhere), so it gets the same crash-safe publish as
    IvfPqIndex.save: write to a staging sibling, then one os.rename —
    a reader never observes a half-written vocabulary, and a crash
    mid-save leaves any existing artifact untouched.

    Format: {"format": "bpe-merges-v1", "n_merges": N,
    "merges": [[a, b], ...]} — rank IS the list position, exactly what
    bpe_encode consumes."""
    import json
    import os
    import uuid

    tmp = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(
            {
                "format": "bpe-merges-v1",
                "n_merges": len(merges),
                "merges": [[a, b] for a, b in merges],
            },
            f,
        )
    os.replace(tmp, path)  # atomic; overwrites a previous artifact


def load_bpe(path: str) -> list[tuple[str, str]]:
    """Load a merge table saved by save_bpe; the round trip is
    bit-identical (list order is rank order). Refuses unknown formats
    loudly instead of mis-tokenizing quietly."""
    import json

    with open(path, encoding="utf-8") as f:
        meta = json.load(f)
    if meta.get("format") != "bpe-merges-v1":
        raise ValueError(f"not a bpe-merges-v1 artifact: {path}")
    merges = [(a, b) for a, b in meta["merges"]]
    if len(merges) != meta.get("n_merges"):
        raise ValueError(f"truncated merge table in {path}")
    return merges


def quality_calibrated(docs: DataFrame) -> DataFrame:
    """Per-source quality calibration: map each doc's raw quality score
    to its PERCENTILE WITHIN ITS SOURCE (integer permille). Sources are
    systematically miscalibrated — a mediocre doc from a clean source
    outscores a good doc from a noisy one on the raw scale — so any
    cross-source cut or mixture built on raw quality silently reweights
    sources. Calibrated, "top 20%" means top 20% OF EACH SOURCE.

    cal = (rownum - 1) * 1000 DIV (n_src - 1) over (quality ASC, doc_id
    ASC) — all-integer, ties ordered by doc_id (deterministic, not
    midranked; documented contract), single-doc sources sit at 500.

    Scale shape: one corpus scan -> ONE source-partitioned window
    (row_number) sharing its exchange with the per-source count (the
    inter-arrival-stats discipline); no joins, no global ordering.

    Returns (doc_id, source, q_raw_permille, q_cal_permille).
    """
    from pyspark.sql.window import Window

    scored = quality_scores(docs, keep_cols=("source",)).select(
        "doc_id", "source", "quality"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), F.col("doc_id").asc()
    )
    wn = Window.partitionBy("source")
    return scored.withColumn(
        "rn", F.row_number().over(w).cast("bigint")
    ).withColumn(
        "n_src", F.count(F.lit(1)).over(wn).cast("bigint")
    ).select(
        "doc_id",
        "source",
        F.floor(F.col("quality") * 1000).cast("bigint").alias("q_raw_permille"),
        F.expr(
            "CASE WHEN n_src <= 1 THEN CAST(500 AS BIGINT) "
            "ELSE (rn - 1) * 1000 DIV (n_src - 1) END"
        ).alias("q_cal_permille"),
    )


def quality_neighbor_smoothing(
    docs: DataFrame,
    embeddings: DataFrame,
    threshold_pct: int = 40,
    n_planes: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Neighbor-quality smoothing over the similarity graph: for every
    doc with at least one embedding near-neighbor (multi-probe LSH pairs
    at the cosine threshold, doc_id == vec_id), report its own quality
    next to the integer mean of its neighbors' — the label-propagation
    signal curation uses to catch docs whose OWN score is unreliable
    (spam that reads clean, good docs with odd surface stats): a large
    |delta| says the doc disagrees with its semantic neighborhood.

    Scale shape: neighbors come from the LSH-bucketed pair generator
    (embedding_dup_pairs multiprobe — never all-pairs), symmetrized with
    one unionByName; quality is the one-scan fixed-order recipe; the
    rollup is a map-side-combined groupBy on doc_id plus one join back
    to the doc-sized quality frame. All-integer permille means
    (sum DIV n), so the report is engine-exact.

    Returns (doc_id, q_own_permille, n_neighbors, q_nbr_mean_permille,
    delta_permille); docs with no neighbor under the threshold emit no
    row (no neighborhood, no signal — deliberately not 0-filled).
    """
    from db_integration_via_kafka_ksql_spark.operators import dedup as DD

    pairs = DD.embedding_dup_pairs(
        embeddings,
        threshold_pct=threshold_pct,
        n_planes=n_planes,
        dims=dims,
        brute_force=False,
        multiprobe=True,
    )
    edges = pairs.select(
        F.col("vec_a").alias("doc_id"), F.col("vec_b").alias("nbr")
    ).unionByName(
        pairs.select(F.col("vec_b").alias("doc_id"), F.col("vec_a").alias("nbr"))
    )
    q = quality_scores(docs).select(
        "doc_id", F.floor(F.col("quality") * 1000).cast("bigint").alias("qp")
    )
    nbr = (
        edges.join(
            q.select(F.col("doc_id").alias("nbr"), F.col("qp").alias("nq")),
            "nbr",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
            F.sum("nq").cast("bigint").alias("nsum"),
        )
    )
    return nbr.join(q, "doc_id").select(
        "doc_id",
        F.col("qp").alias("q_own_permille"),
        "n_neighbors",
        F.expr("nsum DIV n_neighbors").cast("bigint").alias("q_nbr_mean_permille"),
        F.expr("nsum DIV n_neighbors - qp").cast("bigint").alias("delta_permille"),
    )
