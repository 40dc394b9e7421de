"""Text-analysis query surface with DuckDB oracles.

Oracle mirroring discipline: every formula is either integer/string math
(md5 hashing, counts) or a fixed-order sequence of IEEE double ops on
exact operands — bit-identical across engines. DuckDB syntax differences
(list comprehensions vs transform(), `//` vs `div`, 'g' regex flag) are
purely syntactic; the computed values coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.functions import text as T
from db_integration_via_kafka_ksql_spark.io import load_table
from db_integration_via_kafka_ksql_spark.operators import text_analysis as TA
from db_integration_via_kafka_ksql_spark.registry import query

_W = "string_split(text, ' ')"
_DW = f"list_distinct({_W})"


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + "]"


def _sw_hits(lang: str) -> str:
    return f"len(list_filter({_W}, w -> list_contains({_sw_list(lang)}, w)))"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_W}) AS BIGINT) AS n_tokens,
           CAST(list_sum([(length(w) + 3) // 4 for w in {_W}]) AS BIGINT) AS n_pieces,
           CAST(len({_DW}) AS BIGINT) AS n_distinct,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(len({_W}) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.token_stats(load_table(spark, sf_dir, "documents"))


_STOP_SUM = " + ".join(_sw_hits(lang) for lang in T.STOPWORDS)


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(n_dis AS DOUBLE) / CAST(n_tok AS DOUBLE) AS diversity,
           CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stop_ratio,
           CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
           0.4 * least(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
             + 0.3 * (CAST(n_dis AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + 0.2 * (1.0 - CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + 0.1 * (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE))
             AS quality
    FROM (
        SELECT doc_id,
               len({_W}) AS n_tok,
               len({_DW}) AS n_dis,
               {_STOP_SUM} AS stop_hits,
               length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
               length(text) AS n_chars
        FROM documents
    )
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.quality_scores(load_table(spark, sf_dir, "documents"), min_tokens=50)


_LANG_SCORES = ",\n           ".join(
    f"{_sw_hits(lang)} AS sc_{lang}" for lang in T.LANG_PRIORITY
)
_PRED_CASE = T.predicted_lang_case({l: f"sc_{l}" for l in T.LANG_PRIORITY})


@query(
    "text_language_confusion",
    oracle=f"""
    SELECT lang, pred_lang, count(*) AS n_docs
    FROM (
        SELECT lang, {_PRED_CASE} AS pred_lang
        FROM (
            SELECT lang,
           {_LANG_SCORES}
            FROM documents
        )
    )
    GROUP BY lang, pred_lang
    """,
)
def text_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.language_confusion(load_table(spark, sf_dir, "documents"))


_FP = (
    f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"[('0x' || substr(md5(w), 1, 8))::BIGINT for w in {_W}]), "
    f"(acc, x) -> (acc * 31 + x) % {T.HASH_MOD})"
)


@query(
    "text_fingerprints",
    oracle=f"""
    SELECT doc_id,
           {_FP} AS rolling_fp,
           md5(text) AS content_md5,
           {_FP} % 1024 AS fp_bucket
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.fingerprints(load_table(spark, sf_dir, "documents"))


@query(
    "text_top_terms_per_source",
    oracle="""
    SELECT source, term, tf, rnk
    FROM (
        SELECT source, term, tf,
               row_number() OVER (
                   PARTITION BY source ORDER BY tf DESC, term ASC
               ) AS rnk
        FROM (
            SELECT source, term, count(*) AS tf
            FROM (
                SELECT source, unnest(string_split(text, ' ')) AS term
                FROM documents
            )
            GROUP BY source, term
        )
    )
    WHERE rnk <= 5
    """,
)
def text_top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.top_terms_per_source(load_table(spark, sf_dir, "documents"), k=5)


@query(
    "text_clean_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                ' +', ' ', 'g')) AS clean_text,
           CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT)
             AS n_clean_tokens
    FROM documents
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning/normalization: lowercase, strip non-alnum, collapse
    whitespace — the standard pre-tokenization scrub, all JVM-side regex
    (patterns restricted to the RE2∩Java common subset for the oracle)."""
    from pyspark.sql import functions as F

    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.split(clean, " ")).cast("bigint").alias("n_clean_tokens"),
    )


_QUALITY_EXPR = """0.4 * least(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
             + 0.3 * (CAST(n_dis AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + 0.2 * (1.0 - CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + 0.1 * (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE))"""

CURATION_MIN_QUALITY = 0.75


@query(
    "corpus_curation_stats",
    # the full curation pass in SQL: same quality expression as
    # text_quality_scores, threshold filter, keep-one per md5(text)
    # (min doc_id wins), then per-source token accounting.
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, text,
               CAST(n_tok AS BIGINT) AS n_tokens,
               {_QUALITY_EXPR} AS quality
        FROM (
            SELECT doc_id, source, text,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    ),
    f AS (SELECT * FROM scored WHERE quality >= {CURATION_MIN_QUALITY}),
    kept AS (
        SELECT min(doc_id) AS doc_id,
               arg_min(source, doc_id) AS source,
               arg_min(n_tokens, doc_id) AS n_tokens
        FROM f GROUP BY md5(text)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY source
    """,
)
def corpus_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation report: quality filter → exact-dedup keep-one →
    tokens surviving per source (operators/text_analysis.curate_corpus)."""
    return TA.curate_corpus(
        load_table(spark, sf_dir, "documents"),
        min_quality=CURATION_MIN_QUALITY,
        min_tokens=50,
    )


SAMPLE_RATES = {"src0": 25, "src1": 50}
SAMPLE_DEFAULT = 75
SAMPLE_SALT = "mix1"


@query(
    "sample_stratified_sources",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM documents
    WHERE ('0x' || substr(md5('{SAMPLE_SALT}|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE source WHEN 'src0' THEN {SAMPLE_RATES["src0"]}
                        WHEN 'src1' THEN {SAMPLE_RATES["src1"]}
                        ELSE {SAMPLE_DEFAULT} END
    GROUP BY source
    """,
)
def sample_stratified_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-Bernoulli training-mix sampling, rolled up per
    source (operators/text_analysis.stratified_sample). min/max doc ids in
    the output pin the exact membership, not just the counts."""
    sampled = TA.stratified_sample(
        load_table(spark, sf_dir, "documents"),
        rates_pct=SAMPLE_RATES,
        default_pct=SAMPLE_DEFAULT,
        salt=SAMPLE_SALT,
    )
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_SAMPLE_PRED = f"""('0x' || substr(md5('{SAMPLE_SALT}|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE source WHEN 'src0' THEN {SAMPLE_RATES["src0"]}
                        WHEN 'src1' THEN {SAMPLE_RATES["src1"]}
                        ELSE {SAMPLE_DEFAULT} END"""


@query(
    "training_mix_curated",
    # the real training-mix build: hash-Bernoulli stratified sample, THEN
    # the full curation pass (quality filter → keep-one exact dedup →
    # per-source token accounting) over the sampled subset only.
    oracle=f"""
    WITH sampled AS (
        SELECT doc_id, source, text FROM documents
        WHERE {_SAMPLE_PRED}
    ),
    scored AS (
        SELECT doc_id, source, text,
               CAST(n_tok AS BIGINT) AS n_tokens,
               {_QUALITY_EXPR} AS quality
        FROM (
            SELECT doc_id, source, text,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM sampled
        )
    ),
    f AS (SELECT * FROM scored WHERE quality >= {CURATION_MIN_QUALITY}),
    kept AS (
        SELECT min(doc_id) AS doc_id,
               arg_min(source, doc_id) AS source,
               arg_min(n_tokens, doc_id) AS n_tokens
        FROM f GROUP BY md5(text)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY source
    """,
)
def training_mix_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-mix construction: stratified_sample →
    curate_corpus chained (sample first, so curation's quality scan only
    touches the kept fraction — at 100 TB the sample predicate is
    scan-side column math and the whole pipeline still has exactly the
    curation pass's two uniform-key shuffles)."""
    sampled = TA.stratified_sample(
        load_table(spark, sf_dir, "documents"),
        rates_pct=SAMPLE_RATES,
        default_pct=SAMPLE_DEFAULT,
        salt=SAMPLE_SALT,
    )
    return TA.curate_corpus(
        sampled, min_quality=CURATION_MIN_QUALITY, min_tokens=50
    )
