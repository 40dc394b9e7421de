"""Text-analysis operators over the documents table: token statistics,
quality scoring, language-ID, fingerprinting.

All pure Column expressions (functions/text.py) — zero Python UDFs, zero
extra shuffles beyond the terminal groupBy where one exists. Each operator
is a narrow map over the corpus scan: at 100 TB these run at parquet scan
speed with full column pruning (only `doc_id`/`text`/`lang` are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return docs.filter(bucket < rate)


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
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % n_epochs
    )
    return docs.withColumn(epoch_col, assigned.cast("int"))
