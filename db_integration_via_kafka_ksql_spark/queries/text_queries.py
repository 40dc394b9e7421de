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
from db_integration_via_kafka_ksql_spark.operators import dedup as D
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
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
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
    driver=False,  # round-12 rotation: stable veteran slot ceded to text_quality_calibrated
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
    # round-14 rotation: promoted into the external driver window
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
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
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
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
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
    driver=False,  # round-8 rotation: 3-rounds-stable slot ceded to a newer op
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
    driver=False,  # round-10 rotation: stable slot ceded; family keeps a driver twin
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


@query(
    "dedup_keep_best_quality",
    driver=False,  # round-13 rotation: stable veteran slot ceded to dedup_edit_verified
    # promoted to the driver window round 9 (retention policy)
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, md5(text) AS text_hash,
               {_QUALITY_EXPR} AS quality
        FROM (
            SELECT doc_id, text,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    ),
    ranked AS (
        SELECT text_hash, doc_id, quality,
               row_number() OVER (
                   PARTITION BY text_hash ORDER BY quality DESC, doc_id ASC
               ) AS rn,
               count(*) OVER (PARTITION BY text_hash) AS n_members
        FROM scored
    )
    SELECT text_hash,
           doc_id AS keep_id,
           quality AS best_quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware retention: exact-dup clusters (md5 groups) keep their
    highest-quality member instead of the min-id one — the curation
    refinement for corpora where duplicate copies differ in id order but
    not merit order. One scan + one partial-aggregated shuffle
    (operators/dedup.keep_best_per_cluster); the quality math is the
    bit-identical expression text_quality_scores pins against DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    scored = TA.quality_scores(docs, min_tokens=50, keep_cols=("text",))
    members = scored.select(
        "doc_id", F.md5("text").alias("text_hash"), "quality"
    )
    return D.keep_best_per_cluster(
        members, "text_hash", "doc_id", "quality"
    ).withColumnRenamed("best_score", "best_quality")


def _sh(n: int, words: str = "w", text: str = "text") -> str:
    """DuckDB mirror of functions/text.shingles_of_words for word n-grams."""
    return (
        f"CASE WHEN len({words}) < {n} THEN [{text}] "
        f"ELSE [array_to_string(list_slice({words}, i, i + {n - 1}), ' ') "
        f"for i in generate_series(1, len({words}) - {n - 1})] END"
    )


def _rep_cnt(n: int, dup: bool) -> str:
    if dup:
        return f"sum(CASE WHEN n = {n} AND c >= 2 THEN c ELSE 0 END)"
    return f"max(CASE WHEN n = {n} THEN c END)"


def _rep_cols() -> str:
    parts = []
    for n, label in ((2, "bigram"), (3, "trigram")):
        for dup, kind in ((False, "top"), (True, "dup")):
            parts.append(
                f"CAST({_rep_cnt(n, dup)} AS BIGINT) AS {kind}_{label}_n"
            )
    for n, label in ((2, "bigram"), (3, "trigram")):
        for dup, kind in ((False, "top"), (True, "dup")):
            # NULL for sub-n-gram docs — mirrors repetition_stats: the
            # fraction is undefined when no true n-gram exists.
            parts.append(
                f"CASE WHEN n_tokens >= {n} THEN "
                f"CAST({n} AS DOUBLE) * CAST({_rep_cnt(n, dup)} AS DOUBLE)"
                f" / CAST(n_tokens AS DOUBLE) END AS {kind}_{label}_frac"
            )
    return ",\n           ".join(parts)


@query(
    "text_repetition_scores",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-14 rotation: promoted into the external driver window
    oracle=f"""
    WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id, len(w) AS n_tokens, 2 AS n, unnest({_sh(2)}) AS gram FROM ws
        UNION ALL
        SELECT doc_id, len(w) AS n_tokens, 3 AS n, unnest({_sh(3)}) AS gram FROM ws
    ),
    c AS (
        SELECT doc_id, n_tokens, n, gram, count(*) AS c
        FROM g GROUP BY doc_id, n_tokens, n, gram
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {_rep_cols()}
    FROM c GROUP BY doc_id, n_tokens
    """,
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition cut inputs: per-doc token coverage of the
    most frequent and of all duplicated word {{2,3}}-grams
    (operators/text_analysis.repetition_stats)."""
    return TA.repetition_stats(load_table(spark, sf_dir, "documents"))


DECONTAM_BENCH_MOD = 11
DECONTAM_N = 5


@query(
    "decontam_ngram_overlap",
    driver=False,  # round-12 rotation: stable veteran slot ceded to decontam_semantic_cosine
    oracle=f"""
    WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    d AS (SELECT doc_id, list_distinct({_sh(DECONTAM_N)}) AS grams FROM ws),
    g AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM d),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
    ov AS (
        SELECT doc_id, count(*) AS n_overlap
        FROM g
        WHERE doc_id % {DECONTAM_BENCH_MOD} != 0
          AND gram IN (SELECT gram FROM bench)
        GROUP BY doc_id
    )
    SELECT corpus.doc_id,
           CAST(corpus.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN COALESCE(ov.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS INT)
             AS contaminated
    FROM (
        SELECT doc_id, len(grams) AS n_grams FROM d
        WHERE doc_id % {DECONTAM_BENCH_MOD} != 0
    ) corpus
    LEFT JOIN ov ON ov.doc_id = corpus.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: distinct {DECONTAM_N}-gram overlap of
    each corpus doc against the held-out benchmark subset
    (operators/text_analysis.decontaminate)."""
    return TA.decontaminate(
        load_table(spark, sf_dir, "documents"),
        bench_mod=DECONTAM_BENCH_MOD,
        n=DECONTAM_N,
    )


def _bloom_oracle() -> str:
    """Full DuckDB replay of the Bloom decontamination (r15 verdict
    Next #5): build (bench grams -> distinct set bit positions) and
    probe (a corpus gram is a member iff ALL k of its positions are
    set) — set-of-positions semantics, which is exactly what the packed
    bit array encodes, so the replay needs no word packing. Positions
    come from functions/bloom.positions_sql_duckdb, the bit-identical
    mirror of the Spark md5 position stream."""
    from db_integration_via_kafka_ksql_spark.functions.bloom import (
        BloomParams,
        positions_sql_duckdb,
    )

    p = BloomParams(hash="md5")
    pos = positions_sql_duckdb("gram", p)
    bench_pos = "\n        UNION ALL ".join(
        f"SELECT {frag} AS pos FROM bench" for frag in pos
    )
    return f"""
    WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    d AS (SELECT doc_id, list_distinct({_sh(DECONTAM_N)}) AS grams FROM ws),
    g AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram FROM d),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
    bits AS (
        SELECT DISTINCT pos FROM ({bench_pos})
    ),
    probe AS (
        SELECT doc_id, gram, unnest([{", ".join(pos)}]) AS pos
        FROM g WHERE doc_id % {DECONTAM_BENCH_MOD} != 0
    ),
    hits AS (
        SELECT doc_id, gram
        FROM probe JOIN bits USING (pos)
        GROUP BY doc_id, gram
        HAVING count(*) = {p.n_hashes}
    ),
    ov AS (SELECT doc_id, count(*) AS n_overlap FROM hits GROUP BY doc_id)
    SELECT corpus.doc_id,
           CAST(corpus.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN COALESCE(ov.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS INT)
             AS contaminated
    FROM (
        SELECT doc_id, n_grams FROM (
            SELECT doc_id, len(grams) AS n_grams FROM d
        ) WHERE doc_id % {DECONTAM_BENCH_MOD} != 0
    ) corpus
    LEFT JOIN ov ON ov.doc_id = corpus.doc_id
    """


@query(
    "decontam_bloom_overlap",
    # r17 rotation: promoted into the driver window
    oracle=_bloom_oracle(),
)
def decontam_bloom_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination twin: same columns as
    `decontam_ngram_overlap`, benchmark grams folded into a broadcast
    bit array instead of a broadcast string set — the scale path once
    the held-out gram set outgrows string broadcast. ORACLE-BACKED
    since r16 (verdict Next #5) via the md5 position stream
    (functions/bloom.BloomParams(hash="md5") — the repo's cross-engine
    hash discipline), whose build+probe DuckDB replay is _bloom_oracle;
    the xxhash64 production default stays gated by the zero-false-
    negative superset property vs the exact op plus the measured-fp
    bound (tests/test_text_properties.py)."""
    return TA.decontaminate_bloom(
        load_table(spark, sf_dir, "documents"),
        bench_mod=DECONTAM_BENCH_MOD,
        n=DECONTAM_N,
        hash_fn="md5",
    )


DUPSPAN_L = 6


@query(
    "text_duplicate_spans",
    driver=False,
    oracle=f"""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    base AS (
        SELECT doc_id, len(w) AS n_tokens,
               greatest(len(w) - {DUPSPAN_L} + 1, 0) AS n_windows, w
        FROM ws
    ),
    pos AS (
        SELECT doc_id, unnest(range(0, n_windows)) AS pos, w
        FROM base WHERE n_windows > 0
    ),
    win AS (
        SELECT doc_id, pos,
               array_to_string(w[pos + 1 : pos + {DUPSPAN_L}], ' ') AS gram
        FROM pos
    ),
    dups AS (SELECT gram FROM win GROUP BY gram HAVING count(*) >= 2),
    dwin AS (
        SELECT doc_id, pos FROM win
        WHERE gram IN (SELECT gram FROM dups)
    ),
    dcov AS (
        SELECT doc_id, pos,
               least({DUPSPAN_L},
                     pos - coalesce(
                         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                         pos - {DUPSPAN_L})) AS covered
        FROM dwin
    ),
    cov AS (
        SELECT doc_id, count(*) AS n_dup_windows, sum(covered) AS dup_tokens
        FROM dcov GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_windows AS BIGINT) AS n_windows,
           CAST(COALESCE(cov.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(cov.dup_tokens, 0) AS DOUBLE) / b.n_tokens AS dup_frac
    FROM base b LEFT JOIN cov USING (doc_id)
    """,
)
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate spans: merged token coverage of every
    {DUPSPAN_L}-word window occurring >=2 times in the corpus
    (operators/text_analysis.duplicate_spans — the Lee-et-al-style
    substring dedup signal doc-level fingerprints miss). The oracle
    groups windows by STRING while the operator groups by xxhash64; they
    agree unless 64-bit xxhash64 collides (odds ~2^-64 per pair)."""
    return TA.duplicate_spans(
        load_table(spark, sf_dir, "documents"), window_tokens=DUPSPAN_L
    )


DUPSUB_L = 6
DUPSUB_OCC_CAP = 64

# shared CTE chain replaying the FULL substring-dedup pipeline (used by
# the cut-spans oracle and the cleaned-corpus oracle): eligible grams
# (count in [2, occ_cap]), all pairwise matches, diagonal runs, both
# sides, unique-span pre-aggregation, gaps-and-islands interval union
_DUPSUB_CTES = f"""ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    base AS (
        SELECT doc_id, greatest(len(w) - {DUPSUB_L} + 1, 0) AS n_windows, w
        FROM ws
    ),
    pos AS (
        SELECT doc_id, unnest(range(0, n_windows)) AS pos, w
        FROM base WHERE n_windows > 0
    ),
    win AS (
        SELECT doc_id, pos,
               array_to_string(w[pos + 1 : pos + {DUPSUB_L}], ' ') AS gram
        FROM pos
    ),
    elig_g AS (
        SELECT gram FROM win GROUP BY gram
        HAVING count(*) BETWEEN 2 AND {DUPSUB_OCC_CAP}
    ),
    elig AS (
        SELECT doc_id, pos, gram FROM win
        WHERE gram IN (SELECT gram FROM elig_g)
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, a.pos AS pos_a,
               b.doc_id AS doc_b, b.pos - a.pos AS delta
        FROM elig a JOIN elig b ON a.gram = b.gram
         AND (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.pos < b.pos))
    ),
    runs AS (
        SELECT doc_a, doc_b, delta, grp,
               min(pos_a) AS s, max(pos_a) AS e
        FROM (
            SELECT *, pos_a - row_number() OVER (
                PARTITION BY doc_a, doc_b, delta ORDER BY pos_a
            ) AS grp FROM pairs
        ) GROUP BY doc_a, doc_b, delta, grp
    ),
    sides AS (
        SELECT doc_a AS doc_id, s AS st, e + {DUPSUB_L} AS en FROM runs
        UNION ALL
        SELECT doc_b, s + delta, e + delta + {DUPSUB_L} FROM runs
    ),
    spans AS (
        -- pre-aggregate duplicate (doc_id, st, en) rows so the island
        -- ORDER BY (st, en) is a TOTAL order per doc (a span matching
        -- two partners would otherwise emit tied rows the two window
        -- passes may order differently, splitting an island)
        SELECT doc_id, st, en, count(*) AS cnt
        FROM sides GROUP BY doc_id, st, en
    ),
    isl AS (
        SELECT doc_id, st, en, cnt,
               CASE WHEN prev_en IS NULL OR st > prev_en THEN 1 ELSE 0 END
                   AS new_island
        FROM (
            SELECT *, max(en) OVER (
                PARTITION BY doc_id ORDER BY st, en
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ) AS prev_en FROM spans
        )
    ),
    cuts AS (
        SELECT doc_id, min(st) AS st, max(en) AS en, sum(cnt) AS n_runs
        FROM (
            SELECT *, sum(new_island) OVER (
                PARTITION BY doc_id ORDER BY st, en
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS island FROM isl
        )
        GROUP BY doc_id, island
    )"""


@query(
    "text_duplicate_cut_spans",
    # promoted to the driver window round 9 (fixed determinism this round)
    oracle=f"""
    WITH {_DUPSUB_CTES}
    SELECT doc_id,
           CAST(st AS BIGINT) AS start,
           CAST(en AS BIGINT) AS "end",
           CAST(n_runs AS BIGINT) AS n_runs
    FROM cuts
    """,
)
def text_duplicate_cut_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring-dedup spans for span-level CUTTING (Lee et al.
    2022): per-doc maximal disjoint intervals covered by verbatim
    >= {DUPSUB_L}-token duplicates of other corpus locations, with exact
    boundaries from diagonal-run merging of matching grams
    (operators/text_analysis.duplicate_substring_matches +
    duplicate_cut_spans). The oracle replays the ENTIRE pipeline —
    eligible grams (count in [2, occ_cap]), all pairwise matches,
    diagonal runs, both sides, interval union — grouping by gram STRING
    while the operator groups by xxhash64 (the duplicate_spans collision
    trade, ~2^-64 per pair)."""
    return TA.duplicate_cut_spans(
        load_table(spark, sf_dir, "documents"),
        min_tokens=DUPSUB_L,
        occ_cap=DUPSUB_OCC_CAP,
    )


@query(
    "text_cut_span_removal",
    driver=False,  # round-15 rotation: veteran slot (r12) ceded; text_duplicate_cut_spans keeps the cut-span external slot
    # round-12 rotation: promoted into the driver window
    oracle=f"""
    WITH {_DUPSUB_CTES},
    tok AS (
        SELECT doc_id, p, w[p + 1] AS t
        FROM (
            SELECT doc_id, w, unnest(range(0, len(w))) AS p FROM ws
        )
    ),
    keptagg AS (
        SELECT doc_id,
               string_agg(t, ' ' ORDER BY p) AS clean_text,
               count(*) AS n_kept
        FROM tok
        WHERE NOT EXISTS (
            SELECT 1 FROM cuts c
            WHERE c.doc_id = tok.doc_id AND tok.p >= c.st AND tok.p < c.en
        )
        GROUP BY doc_id
    )
    SELECT ws.doc_id,
           coalesce(k.clean_text, '') AS clean_text,
           CAST(len(ws.w) AS BIGINT) AS n_tokens,
           CAST(len(ws.w) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM ws LEFT JOIN keptagg k USING (doc_id)
    """,
)
def text_cut_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLIED Lee-et-al dedup step: cut every duplicate-substring
    interval (text_duplicate_cut_spans) out of the corpus and rejoin the
    surviving tokens (operators/text_analysis.remove_duplicate_spans) —
    compute-spans -> cut -> cleaned training text, with per-doc removed/
    kept token accounting. The oracle replays the whole span pipeline by
    gram STRING, then reconstructs each cleaned doc positionally."""
    return TA.remove_duplicate_spans(
        load_table(spark, sf_dir, "documents"),
        min_tokens=DUPSUB_L,
        occ_cap=DUPSUB_OCC_CAP,
    )


@query(
    "text_lm_fluency",
    driver=False,  # round-15 rotation: veteran slot (r13) ceded; text family keeps 10 external slots
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    toks AS (SELECT doc_id, unnest(w) AS w1 FROM base),
    doc_bi AS (
        SELECT doc_id,
               unnest(CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
                      ELSE [w[i] || ' ' || w[i + 1] for i in range(1, len(w))]
                      END) AS g
        FROM base
    ),
    split_bi AS (
        SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM doc_bi
    ),
    cb AS (SELECT g, count(*) AS cb FROM doc_bi GROUP BY g),
    cu AS (SELECT w1, count(*) AS cu FROM toks GROUP BY w1),
    v AS (SELECT count(*) AS v FROM cu),
    scored AS (
        SELECT s.doc_id,
               CAST(1000000 * (cb.cb + 1) AS BIGINT) // (cu.cu + v.v) AS ppm
        FROM split_bi s
        JOIN cb USING (g) JOIN cu USING (w1) CROSS JOIN v
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(ppm) AS BIGINT) AS sum_ppm
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(a.sum_ppm, 0) AS BIGINT) AS sum_ppm,
           CASE WHEN COALESCE(a.n_bigrams, 0) > 0
                THEN CAST(a.sum_ppm AS DOUBLE) / CAST(a.n_bigrams AS DOUBLE)
           END AS avg_ppm
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def text_lm_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency scoring (CCNet-style, Wenzek et al. 2020): each
    doc's average Laplace-smoothed conditional bigram probability under
    the corpus's own MLE model, in integer parts-per-million — no
    floating log whose last ulp could differ across libm builds
    (operators/text_analysis.lm_fluency_scores). The oracle replays the
    model build AND the scoring; avg_ppm is the one exact-int/exact-int
    IEEE division."""
    return TA.lm_fluency_scores(load_table(spark, sf_dir, "documents"))


PACK_CAPACITY = 256


@query(
    "seq_packing_offsets",
    driver=False,  # round-13 rotation: stable veteran slot ceded to text_lm_fluency
    oracle=f"""
    SELECT source, doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(end_offset - n_tokens AS BIGINT) AS start_offset,
           CAST((end_offset - n_tokens) // {PACK_CAPACITY} AS BIGINT) AS first_seq,
           CAST((end_offset - 1) // {PACK_CAPACITY} AS BIGINT) AS last_seq
    FROM (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               sum(len(string_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS end_offset
        FROM documents
    )
    """,
)
def seq_packing_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-then-chunk sequence packing: per-doc token offset
    and [first_seq, last_seq] span at {PACK_CAPACITY}-token capacity,
    sharded by source (operators/text_analysis.pack_sequences)."""
    return TA.pack_sequences(
        load_table(spark, sf_dir, "documents"),
        capacity=PACK_CAPACITY,
        shard_cols=("source",),
    )


_PII_E = TA.PII_PATTERNS["email"]
_PII_P = TA.PII_PATTERNS["phone"]
_PII_I = TA.PII_PATTERNS["ipv4"]


@query(
    "pii_scrub_contacts",
    driver=False,  # round-12 rotation: stable veteran slot ceded to mm_audio_pcm_stats
    # the contact blob is built deterministically FROM the driver's own
    # customer table (the testdata contains no literal PII), so the driver
    # row exercises real match+redact work with per-row-varying content.
    oracle=f"""
    WITH t AS (
        SELECT c_custkey,
               'contact ' || c_name
               || CASE WHEN c_custkey % 2 = 0
                       THEN ' at ' || CAST(10 + c_custkey % 90 AS VARCHAR)
                            || '-' || CAST(100 + c_custkey % 900 AS VARCHAR)
                            || '-' || CAST(100 + (c_custkey * 7) % 900 AS VARCHAR)
                            || '-' || CAST(1000 + (c_custkey * 13) % 9000 AS VARCHAR)
                       ELSE '' END
               || CASE WHEN c_custkey % 3 > 0
                       THEN ' mail user' || CAST(c_custkey AS VARCHAR)
                            || '@example.com' ELSE '' END
               || CASE WHEN c_custkey % 5 > 0
                       THEN ' ip 10.' || CAST(c_custkey % 200 AS VARCHAR)
                            || '.' || CAST(c_nationkey AS VARCHAR) || '.7'
                       ELSE '' END AS text
        FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(text, '{_PII_E}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_P}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{_PII_I}')) AS BIGINT) AS n_ipv4,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_E}', '[EMAIL]', 'g'),
               '{_PII_P}', '[PHONE]', 'g'),
               '{_PII_I}', '[IPV4]', 'g') AS redacted
    FROM t
    """,
)
def pii_scrub_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction (operators/text_analysis.scrub_pii) over a
    contact blob derived from the customer table — emails, TPC-H-format
    phones (dd-ddd-ddd-dddd, synthesized from the keys: the driver's
    customer table carries no phone column), and synthetic IPv4s, each
    present on a different per-row-varying subset."""
    c = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    phone = F.concat(
        (F.lit(10) + ck % 90).cast("string"),
        F.lit("-"),
        (F.lit(100) + ck % 900).cast("string"),
        F.lit("-"),
        (F.lit(100) + (ck * 7) % 900).cast("string"),
        F.lit("-"),
        (F.lit(1000) + (ck * 13) % 9000).cast("string"),
    )
    blob = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(F.lit(" at "), phone),
        ).otherwise(F.lit("")),
        F.when(
            F.col("c_custkey") % 3 > 0,
            F.concat(
                F.lit(" mail user"),
                F.col("c_custkey").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("c_custkey") % 5 > 0,
            F.concat(
                F.lit(" ip 10."),
                (F.col("c_custkey") % 200).cast("string"),
                F.lit("."),
                F.col("c_nationkey").cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.lit("")),
    )
    return TA.scrub_pii(
        c.select("c_custkey", blob.alias("text")),
        text_col="text",
        id_cols=("c_custkey",),
    )


SAMPLE_RATES = {"src0": 25, "src1": 50}
SAMPLE_DEFAULT = 75
SAMPLE_SALT = "mix1"


@query(
    "sample_stratified_sources",
    driver=False,  # round-9 rotation: stable slot ceded to a newer op
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


@query(
    "shuffle_epoch_order",
    driver=False,  # driver window full; locally parity-gated
    oracle="""
    SELECT doc_id, md5('s7|2|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    """,
)
def shuffle_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (operators/text_analysis.epoch_shuffle):
    the permutation IS the range-partitioned sort by the seeded hash key;
    the driver's order-insensitive hash verifies the key assignment (the
    permutation), which fixes the order exactly."""
    return TA.epoch_shuffle(
        load_table(spark, sf_dir, "documents"), seed="s7", epoch=2
    )


@query(
    "sample_k_per_source",
    driver=False,  # driver window full; locally parity-gated
    oracle="""
    SELECT doc_id, source, sample_key, rnk
    FROM (
        SELECT doc_id, source,
               md5('s3|' || CAST(doc_id AS VARCHAR)) AS sample_key,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('s3|' || CAST(doc_id AS VARCHAR))
               ) AS BIGINT) AS rnk
        FROM documents
    )
    WHERE rnk <= 7
    """,
)
def sample_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum deterministic sample
    (operators/text_analysis.sample_k_per_stratum): seeded-hash rank
    inside each source, first 7 kept."""
    return TA.sample_k_per_stratum(
        load_table(spark, sf_dir, "documents"), k=7, seed="s3"
    )


_QUALITY_BY_SOURCE = f"""
    SELECT doc_id, source,
           0.4 * least(CAST(n_tok AS DOUBLE) / 50.0, 1.0)
             + 0.3 * (CAST(n_dis AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + 0.2 * (1.0 - CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + 0.1 * (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE))
             AS quality
    FROM (
        SELECT doc_id, source,
               len({_W}) AS n_tok,
               len({_DW}) AS n_dis,
               {_STOP_SUM} AS stop_hits,
               length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
               length(text) AS n_chars
        FROM documents
    )
"""


@query(
    "quality_cutoffs_per_source",
    driver=False,  # round-13 rotation: stable veteran slot ceded to sketch_loghist_value_quantiles
    # promoted to the driver window round 9
    oracle=f"""
    WITH q AS ({_QUALITY_BY_SOURCE}),
    ranked AS (
        SELECT source, quality,
               row_number() OVER (PARTITION BY source
                                  ORDER BY quality, doc_id) AS rnk,
               count(*) OVER (PARTITION BY source) AS n
        FROM q
    )
    SELECT source, p, quality AS cutoff, CAST(n AS BIGINT) AS n_docs
    FROM ranked, LATERAL unnest([0.5, 0.9]) AS t(p)
    WHERE rnk = ceil(p * n)
    """,
)
def quality_cutoffs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-source quality thresholds at the median and 90th
    percentile (operators/text_analysis.quality_percentile_cutoffs) —
    discrete-percentile semantics, exactly reproducible cross-engine."""
    return TA.quality_percentile_cutoffs(
        load_table(spark, sf_dir, "documents"), ps=(0.5, 0.9)
    )


@query(
    "curation_adaptive_threshold",
    driver=False,  # driver window full; locally parity-gated
    # the designed composition: per-source median cutoff, broadcast back
    # against the corpus, keep docs at-or-above their OWN source's bar
    oracle=f"""
    WITH q AS ({_QUALITY_BY_SOURCE}),
    ranked AS (
        SELECT source, quality,
               row_number() OVER (PARTITION BY source
                                  ORDER BY quality, doc_id) AS rnk,
               count(*) OVER (PARTITION BY source) AS n
        FROM q
    ),
    cut AS (
        SELECT source, quality AS cutoff
        FROM ranked WHERE rnk = ceil(0.5 * n)
    )
    SELECT q.source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(min(q.doc_id) AS BIGINT) AS first_doc,
           CAST(max(q.doc_id) AS BIGINT) AS last_doc
    FROM q JOIN cut ON q.source = cut.source
    WHERE q.quality >= cut.cutoff
    GROUP BY q.source
    """,
)
def curation_adaptive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive curation: drop every doc below its source's median quality.
    The cutoffs frame is tiny (|sources| x |ps|) and broadcast back against
    the corpus — the scan-side filter pattern quality_percentile_cutoffs
    was designed for; min/max doc ids pin exact membership."""
    docs = load_table(spark, sf_dir, "documents")
    cuts = TA.quality_percentile_cutoffs(docs, ps=(0.5,)).select(
        "source", "cutoff"
    )
    scored = TA.quality_scores(docs, keep_cols=("source",)).select(
        "doc_id", "source", "quality"
    )
    kept = scored.join(F.broadcast(cuts), "source").filter(
        F.col("quality") >= F.col("cutoff")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


MIX_BUDGET_TOKENS = 15_000


@query(
    "mixture_token_budget",
    driver=False,  # round-12 rotation: stable veteran slot ceded to join_bloom_pruned_urgent_qty
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH avail AS (
        SELECT source,
               CAST(sum(len({_W})) AS BIGINT) AS available_tokens
        FROM documents GROUP BY source
    ),
    lv AS (
        SELECT source, available_tokens,
               sum(available_tokens) OVER (
                   ORDER BY available_tokens, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - available_tokens AS pfx,
               row_number() OVER (ORDER BY available_tokens, source) AS rn,
               count(*) OVER () AS n
        FROM avail
    ),
    c AS (
        SELECT *,
               ({float(MIX_BUDGET_TOKENS)} - pfx) / (n - rn + 1) AS cand
        FROM lv
    ),
    lvl AS (
        SELECT max(CASE WHEN available_tokens > cand THEN cand END) AS level
        FROM c
    ),
    alloc AS (
        SELECT source, available_tokens,
               CASE WHEN level IS NULL THEN CAST(available_tokens AS DOUBLE)
                    ELSE least(CAST(available_tokens AS DOUBLE), level)
               END AS allocated_tokens
        FROM c, lvl
    )
    SELECT source, available_tokens, allocated_tokens,
           least(1.0, allocated_tokens / CAST(available_tokens AS DOUBLE))
               AS keep_frac
    FROM alloc
    """,
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling mixture planner: split MIX_BUDGET_TOKENS across
    sources as evenly as supply allows (operators/text_analysis.
    token_budget_mixture) — the planning step whose keep_frac column
    feeds stratified_sample to realize the mix."""
    return TA.token_budget_mixture(
        load_table(spark, sf_dir, "documents"), budget_tokens=MIX_BUDGET_TOKENS
    )


MIX_SALT = "mix1"
MIX_PRECISION = 10_000
_MIX_BUCKET = (
    f"('0x' || substr(md5('{MIX_SALT}|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    f" % {MIX_PRECISION}"
)


@query(
    "mixture_realized_tokens",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH avail AS (
        SELECT source,
               CAST(sum(len({_W})) AS BIGINT) AS available_tokens
        FROM documents GROUP BY source
    ),
    lv AS (
        SELECT source, available_tokens,
               sum(available_tokens) OVER (
                   ORDER BY available_tokens, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - available_tokens AS pfx,
               row_number() OVER (ORDER BY available_tokens, source) AS rn,
               count(*) OVER () AS n
        FROM avail
    ),
    c AS (
        SELECT *,
               ({float(MIX_BUDGET_TOKENS)} - pfx) / (n - rn + 1) AS cand
        FROM lv
    ),
    lvl AS (
        SELECT max(CASE WHEN available_tokens > cand THEN cand END) AS level
        FROM c
    ),
    alloc AS (
        SELECT source, available_tokens,
               CASE WHEN level IS NULL THEN CAST(available_tokens AS DOUBLE)
                    ELSE least(CAST(available_tokens AS DOUBLE), level)
               END AS allocated_tokens
        FROM c, lvl
    ),
    plan AS (
        SELECT source, available_tokens, allocated_tokens,
               least(1.0, allocated_tokens / CAST(available_tokens AS DOUBLE))
                   AS keep_frac
        FROM alloc
    ),
    kept AS (
        SELECT d.source,
               CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS kept_tokens,
               CAST(count(*) AS BIGINT) AS n_docs_kept
        FROM documents d JOIN plan p ON d.source = p.source
        WHERE {_MIX_BUCKET}
              < CAST(floor(p.keep_frac * {MIX_PRECISION}) AS BIGINT)
        GROUP BY d.source
    )
    SELECT p.source, p.available_tokens, p.allocated_tokens,
           coalesce(k.kept_tokens, 0) AS kept_tokens,
           coalesce(k.n_docs_kept, 0) AS n_docs_kept
    FROM plan p LEFT JOIN kept k ON k.source = p.source
    """,
)
def mixture_realized_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan → realization, end to end: water-fill the token budget
    (token_budget_mixture), apply the resulting per-source fractions as a
    deterministic hash-Bernoulli sampler (stratified_sample_by_plan), and
    account the kept tokens per source next to the allocation — the
    realized mix tracks the plan up to Bernoulli variance."""
    docs = load_table(spark, sf_dir, "documents")
    # the plan frame is #sources rows but its lineage holds a corpus
    # aggregate; it feeds BOTH the sampler join and the output join, so
    # one eager checkpoint halves the corpus planning passes
    plan = TA.token_budget_mixture(
        docs, budget_tokens=MIX_BUDGET_TOKENS
    ).localCheckpoint(eager=True)
    sampled = TA.stratified_sample_by_plan(
        docs, plan, salt=MIX_SALT, precision=MIX_PRECISION
    )
    kept = sampled.groupBy("source").agg(
        F.sum(T.token_count("text")).cast("bigint").alias("kept_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
    )
    # both sides are #sources rows; broadcast the aggregated side so the
    # accounting join never plans a sort-merge
    return plan.join(F.broadcast(kept), "source", "left").select(
        "source",
        "available_tokens",
        "allocated_tokens",
        F.coalesce("kept_tokens", F.lit(0).cast("bigint")).alias("kept_tokens"),
        F.coalesce("n_docs_kept", F.lit(0).cast("bigint")).alias("n_docs_kept"),
    )


CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


@query(
    "text_chunk_windows",
    driver=False,  # driver window full; parity-gated in test_oracle_parity
    oracle=f"""
    WITH w AS (SELECT doc_id, {_W} AS _w FROM documents),
    s AS (
        SELECT doc_id, _w,
               unnest(generate_series(
                   0,
                   (CASE WHEN len(_w) <= {CHUNK_WINDOW} THEN 0
                         ELSE (len(_w) - {CHUNK_WINDOW} + {CHUNK_STRIDE} - 1)
                              // {CHUNK_STRIDE} END) * {CHUNK_STRIDE},
                   {CHUNK_STRIDE})) AS start_token
        FROM w
    )
    SELECT doc_id,
           CAST(start_token // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           CAST(start_token AS INTEGER) AS start_token,
           CAST(len(list_slice(_w, start_token + 1,
                               start_token + {CHUNK_WINDOW})) AS INTEGER)
               AS n_tokens,
           array_to_string(list_slice(_w, start_token + 1,
                                      start_token + {CHUNK_WINDOW}), ' ')
               AS chunk_text
    FROM s
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, 48-token stride): every
    doc split into overlapping chunks that never cross a doc boundary and
    never drop a tail token — the RAG-ingest splitter, scan-side only."""
    return TA.chunk_documents(
        load_table(spark, sf_dir, "documents"),
        window=CHUNK_WINDOW,
        stride=CHUNK_STRIDE,
    )


TEMP_BUDGET_TOKENS = 20_000


@query(
    "mixture_temperature_tokens",
    driver=False,  # aux: the alpha=0.5 temperature reweighting planner
    oracle=f"""
    WITH avail AS (
        SELECT source,
               CAST(sum(len({_W})) AS BIGINT) AS available_tokens
        FROM documents GROUP BY source
    ),
    wts AS (
        SELECT source, available_tokens,
               sqrt(CAST(available_tokens AS DOUBLE)) AS weight
        FROM avail
    ),
    run AS (
        SELECT *,
               sum(weight) OVER (
                   ORDER BY source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM wts
    ),
    tot AS (SELECT *, max(cum) OVER () AS wsum FROM run),
    alloc AS (
        SELECT source, available_tokens, weight,
               {float(TEMP_BUDGET_TOKENS)} * weight / wsum AS allocated_tokens
        FROM tot
    )
    SELECT source, available_tokens, weight, allocated_tokens,
           least(1.0, allocated_tokens / CAST(available_tokens AS DOUBLE))
               AS keep_frac,
           allocated_tokens / CAST(available_tokens AS DOUBLE)
               AS repeat_factor
    FROM alloc
    """,
)
def mixture_temperature_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) mixture planner: per-source budget share
    proportional to sqrt(available tokens) — upsamples low-resource
    sources; repeat_factor > 1 flags strata that must repeat across
    epochs to meet their allocation."""
    return TA.temperature_mixture(
        load_table(spark, sf_dir, "documents"),
        budget_tokens=TEMP_BUDGET_TOKENS,
        alpha=0.5,
    )


BPE_TOP_K = 20


@query(
    "vocab_top_merge_pairs",
    driver=False,  # round-13 rotation: stable veteran slot ceded to sketch_mg_heavy_tokens
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
        FROM w WHERE length(w) >= 2 GROUP BY w
    ),
    p AS (
        SELECT freq,
               unnest([substr(w, i, 2)
                       for i in generate_series(1, length(w) - 1)]) AS pair
        FROM wf
    ),
    pc AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM p GROUP BY pair)
    SELECT pair, n, rnk FROM (
        SELECT *, CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER)
            AS rnk
        FROM pc
    ) WHERE rnk <= {BPE_TOP_K}
    """,
)
def vocab_top_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top BPE merge candidates: adjacent character-pair counts inside
    words, weighted by exact word frequency — computed over the
    distinct-word frame, never the raw corpus."""
    return TA.bpe_pair_counts(
        load_table(spark, sf_dir, "documents"), top_k=BPE_TOP_K
    )


OVERLAP_N = 5


@query(
    "source_overlap_shared_grams",
    driver=False,  # round-13 rotation: stable veteran slot ceded to dedup_ngram_containment
    # promoted to the driver window round 9 (contamination matrix)
    oracle=f"""
    WITH w AS (
        SELECT source, string_split(text, ' ') AS w, text FROM documents
    ),
    gs AS (
        SELECT DISTINCT source,
               unnest(list_distinct({_sh(OVERLAP_N)})) AS gram
        FROM w
    ),
    per_gram AS (
        SELECT gram, list_sort(list(source)) AS srcs
        FROM gs GROUP BY gram
    ),
    pairs AS (
        SELECT unnest(flatten([[{{'source_a': srcs[i], 'source_b': srcs[j]}}
                   for j in generate_series(i + 1, len(srcs))]
                   for i in generate_series(1, len(srcs))]),
               recursive := true)
        FROM per_gram
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS shared_grams
    FROM pairs GROUP BY source_a, source_b
    """,
)
def source_overlap_shared_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination: distinct shared 5-grams per source
    pair — computed from each gram's bounded source list, never a
    gram-keyed self-join."""
    return TA.source_overlap_matrix(
        load_table(spark, sf_dir, "documents"), n=OVERLAP_N
    )


@query(
    "corpus_dataset_card",
    # round-14 rotation: promoted into the external driver window
    oracle=f"""
    WITH scored AS (
        SELECT source, lang, text,
               CAST(n_tok AS BIGINT) AS n_tokens,
               {_QUALITY_EXPR} AS quality
        FROM (
            SELECT source, lang, text,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_quality
    FROM scored GROUP BY source
    """,
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card summary: volumes, language spread,
    exact-duplicate rate, token range, decimal-routed mean quality."""
    return TA.dataset_card(load_table(spark, sf_dir, "documents"))


def _bpe_rewrite_ctes(
    k: int, src: str, out: str, prefix: str, freq_col: str, min_len: int
) -> list[str]:
    """ONE run-parity rewrite step (pos/sel/out CTEs for merge rank k,
    shared by the trainer and encoder oracles so the subtle parity
    logic exists once — r16 review finding): match starts against the
    rank-k pair (scalar subqueries on t{k}), greedy leftmost selection
    as odd ranks within runs of consecutive matches, and the rebuild
    where a position is consumed iff its predecessor merged. `src` is
    the incoming symbol frame; `freq_col` carries an extra column
    through ('' for the encoder); `min_len` filters the output frame
    (the trainer drops fully-merged words, the encoder keeps all)."""
    fsel = f", {freq_col}" if freq_col else ""
    fgrp = f", p.{freq_col}" if freq_col else ""
    lenf = f" WHERE len(syms) >= {min_len}" if min_len else ""
    return [
        f"""{prefix}pos{k} AS MATERIALIZED (
            SELECT w{fsel},
                   unnest(generate_series(1, len(syms))) AS i,
                   unnest(syms) AS s
            FROM {src}
        )""",
        f"""{prefix}sel{k} AS MATERIALIZED (
            SELECT w, i FROM (
                SELECT w, i,
                       row_number() OVER (
                           PARTITION BY w, i - rk ORDER BY i
                       ) AS rn
                FROM (
                    SELECT p1.w, p1.i,
                           row_number() OVER (
                               PARTITION BY p1.w ORDER BY p1.i
                           ) AS rk
                    FROM {prefix}pos{k} p1
                    JOIN {prefix}pos{k} p2 ON p2.w = p1.w AND p2.i = p1.i + 1
                    WHERE p1.s = (SELECT a FROM t{k})
                      AND p2.s = (SELECT b FROM t{k})
                )
            ) WHERE rn % 2 = 1
        )""",
        f"""{out} AS MATERIALIZED (
            SELECT * FROM (
                SELECT p.w{fgrp},
                       list(
                           CASE WHEN m.i IS NOT NULL
                                THEN (SELECT ab FROM t{k}) ELSE p.s END
                           ORDER BY p.i
                       ) AS syms
                FROM {prefix}pos{k} p
                LEFT JOIN {prefix}sel{k} m ON m.w = p.w AND m.i = p.i
                LEFT JOIN {prefix}sel{k} c ON c.w = p.w AND c.i = p.i - 1
                WHERE c.i IS NULL
                GROUP BY p.w{fgrp}
            ){lenf}
        )"""
    ]


def _bpe_trainer_ctes(n_merges: int) -> list[str]:
    """Pinned-iteration unroll of the FULL BPE trainer (r15 verdict
    Next #5, closing the straggler it named): each of the n_merges
    passes is [argmax pair -> greedy leftmost rewrite], where the
    argmax rides SCALAR SUBQUERIES (so nothing is pinned but the pass
    count) and the rewrite — the one piece previously adjudicated
    non-SQL — is expressed as RUN PARITY over match positions: within
    each maximal run of consecutive matching positions, the fold's
    (emitted, held) accumulator merges exactly the odd-ranked starts
    ('aaaa' -> matches at 1,2,3 -> merge 1 and 3 -> ['aa','aa'], the
    Sennrich single-pass semantics), and a position is consumed iff its
    predecessor merged. The batched Spark trainer is sequence-identical
    to the sequential model (tests/test_bpe_batched.py), so this
    sequential replay oracles the batch_m=4 registry row too."""
    ctes = [
        """v0 AS MATERIALIZED (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
                   [w[i] for i in generate_series(1, length(w))] AS syms
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE length(w) >= 2 GROUP BY w
        )"""
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        ctes.append(
            f"""t{k} AS MATERIALIZED (
            SELECT a, b, a || b AS ab FROM (
                SELECT pr.a AS a, pr.b AS b, CAST(SUM(freq) AS BIGINT) AS n
                FROM (
                    SELECT freq, unnest(
                        [{{'a': syms[i], 'b': syms[i + 1]}}
                         for i in generate_series(1, len(syms) - 1)]) AS pr
                    FROM v{p}
                )
                GROUP BY pr.a, pr.b
                ORDER BY n DESC, a ASC, b ASC LIMIT 1
            )
        )"""
        )
        ctes += _bpe_rewrite_ctes(
            k, src=f"v{p}", out=f"v{k}", prefix="", freq_col="freq",
            min_len=2,
        )
    return ctes


def _bpe_train_oracle(n_merges: int) -> str:
    """The merge-table oracle: the trainer CTE chain + one UNION of the
    n_merges argmax rows (rnk, a, b)."""
    ctes = _bpe_trainer_ctes(n_merges)
    finals = "\n    UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS rnk, a, b FROM t{k}"
        for k in range(1, n_merges + 1)
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    {finals}
    """


def _bpe_encode_oracle(n_merges: int) -> str:
    """Full train→encode replay (the bpe_encode_pieces twin): the
    trainer CTE chain above re-derives the merge table, then every
    CORPUS word (all of them — single-char and fully-merged words the
    trainer frame drops still encode) is rewritten through the same
    run-parity pass PER RANK in ascending order. Rank-ascending
    single-pass application equals the classic lowest-rank-first
    one-occurrence-at-a-time encode because a merge's components always
    predate it: no pass can create a pair of an EARLIER rank (its token
    didn't exist yet when that rank was learned), and a pass cannot
    create its own pair (the merged token is strictly longer than
    either component) — the round-trip test pins the same identity on
    the Spark side. Known corner (documented, not hit): if two learned
    merges' RESULT strings collide ((a,bc) and (ab,c) both yielding
    'abc'), a later pass could create a pair an earlier rank already
    processed and the classic loop would diverge from pass-per-rank —
    but such a collision also breaks Spark's own encode==trainer-replay
    round-trip contract, so the repo's tests would flag it on both
    engines; the adversarial differential in tests/test_bpe_batched.py
    localizes any such failure."""
    ctes = list(_bpe_trainer_ctes(n_merges))
    ctes += [
        """docw AS MATERIALIZED (
            SELECT doc_id, unnest(generate_series(1, len(ws))) AS wi,
                   unnest(ws) AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        )""",
        """e0 AS MATERIALIZED (
            SELECT w, [w[i] for i in generate_series(1, length(w))] AS syms
            FROM (SELECT DISTINCT w FROM docw)
        )""",
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        ctes += _bpe_rewrite_ctes(
            k, src=f"e{p}", out=f"e{k}", prefix="e", freq_col="",
            min_len=0,
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(len(e.syms)), 0) AS BIGINT) AS n_pieces,
           string_agg(
               COALESCE(array_to_string(e.syms, ' '), ''),
               ' | ' ORDER BY d.wi
           ) AS pieces
    FROM docw d LEFT JOIN e{n_merges} e ON e.w = d.w
    GROUP BY d.doc_id
    """


@query(
    "bpe_train_merges",
    # r17 rotation: promoted into the driver window
    # ORACLE-BACKED since r16 (verdict Next #5): the full trainer
    # replays as a pinned-pass unroll (argmax via scalar subqueries,
    # greedy rewrite via run parity — see _bpe_train_oracle); the
    # python sequential-model equivalence test and the batched-pass
    # property test remain the unpinned-geometry cross-checks.
    oracle=_bpe_train_oracle(6),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table over the documents corpus: rank +
    merge pair, from the composed count→argmax→rewrite loop (corpus
    touched once; each of the n_merges iterations costs O(vocabulary))."""
    merges = TA.bpe_train(
        # batch_m=4: the r16 safe-prefix batched passes — proven
        # sequence-identical to batch_m=1 (tests/test_bpe_batched.py),
        # so the registry row exercises the production pass shape
        load_table(spark, sf_dir, "documents"), n_merges=6, batch_m=4
    )
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rnk int, a string, b string",
    )


@query(
    "bpe_encode_pieces",
    # r17 rotation: promoted into the driver window
    # ORACLE-BACKED since r16 (verdict Next #5): train->encode replays
    # end to end — the trainer CTE chain re-derives the merge table,
    # then every corpus word rewrites through the run-parity pass per
    # rank ascending (== the classic lowest-rank-first encode; see
    # _bpe_encode_oracle's docstring for why). The python-reference
    # equivalence tests stay as the unpinned cross-checks.
    oracle=_bpe_encode_oracle(6),
)
def bpe_encode_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full train→encode composition on the documents corpus: learn a
    small merge table with bpe_train, then encode every document with the
    memoized mapInPandas greedy encoder. Returns per-doc token/piece
    counts plus the piece string (deterministic for a fixed corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = TA.bpe_train(docs, n_merges=6)
    return TA.bpe_encode(docs, merges)


NOVELTY_N = 3


@query(
    "text_ngram_novelty",
    driver=False,  # round-12 rotation: stable veteran slot ceded to text_cut_span_removal
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, list_distinct({_sh(NOVELTY_N, _W, "text")}) AS sh
        FROM documents
    ),
    inv AS (SELECT doc_id, unnest(sh) AS g FROM sh),
    firstg AS (SELECT g, min(doc_id) AS doc_id FROM inv GROUP BY g),
    per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM inv GROUP BY doc_id
    ),
    novel AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_novel
        FROM firstg GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_grams,
           COALESCE(n.n_novel, 0) AS n_novel,
           CAST(COALESCE(n.n_novel, 0) AS DOUBLE)
               / CAST(p.n_grams AS DOUBLE) AS novelty
    FROM per_doc p LEFT JOIN novel n ON n.doc_id = p.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty (fraction of the doc's distinct 3-grams
    whose corpus-wide first occurrence is this doc) — the duplicated-
    content pressure signal curation prunes on, with no pairwise join
    anywhere (inverted-index MIN + two doc-sized counts)."""
    return TA.ngram_novelty_scores(
        load_table(spark, sf_dir, "documents"), n=NOVELTY_N
    )


WINNOW_K = 3
WINNOW_W = 4
WINNOW_MIN_SHARED = 2
WINNOW_FP_CAP = 50

# Winnowing selection as a reusable CTE body ending in `sel` =
# (doc_id, fp, fp_pos) — shared by the fingerprint query and the
# overlap-pair query so the two oracles cannot drift apart.
_WINNOW_CTES = f"""sh AS (
        SELECT doc_id, {_sh(WINNOW_K, _W, "text")} AS sh FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(generate_series(1, len(sh))) AS pos,
               unnest([('0x' || substr(md5(x), 1, 8))::BIGINT for x in sh])
                   AS h,
               len(sh) AS n_grams
        FROM sh
    ),
    wmin AS (
        SELECT doc_id, pos, n_grams, h,
               min(h) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW
               ) AS mh
        FROM g
    ),
    ends AS (
        SELECT doc_id, pos AS end_pos, mh FROM wmin
        WHERE pos >= least({WINNOW_W}, n_grams)
    ),
    sel AS (
        SELECT e.doc_id, e.mh AS fp, CAST(max(g2.pos) AS BIGINT) AS fp_pos
        FROM ends e JOIN wmin g2
          ON g2.doc_id = e.doc_id
         AND g2.pos BETWEEN e.end_pos - {WINNOW_W - 1} AND e.end_pos
         AND g2.h = e.mh
        GROUP BY e.doc_id, e.end_pos, e.mh
    )"""


@query(
    "text_winnowing_fingerprints",
    driver=False,  # round-13 rotation: stable veteran slot ceded to semdedup_pairs
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_WINNOW_CTES}
    SELECT DISTINCT doc_id, fp_pos, fp FROM sel
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection over the documents corpus:
    per-window minimum k-gram hash, rightmost-minimal tie-break — the
    position-stable compact overlap sketch. The oracle replays the
    selection with an explicit rightmost-argmax join; Spark carries the
    tie position inside one min(struct) window."""
    return TA.winnowing_fingerprints(
        load_table(spark, sf_dir, "documents"), k=WINNOW_K, w=WINNOW_W
    )


@query(
    "text_winnowing_overlap_pairs",
    driver=False,  # round-12 rotation: stable veteran slot ceded to validate_orders_constraints
    # round-8 rotation: promoted into the external driver window
    oracle=f"""
    WITH {_WINNOW_CTES},
    fps AS (SELECT DISTINCT doc_id, fp FROM sel),
    freq AS (SELECT fp, count(*) AS dfc FROM fps GROUP BY fp),
    kept AS (
        SELECT f.doc_id, f.fp FROM fps f
        JOIN freq ON freq.fp = f.fp
        WHERE freq.dfc <= {WINNOW_FP_CAP}
    ),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS shared_fps
        FROM kept a JOIN kept b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared_fps FROM p
    WHERE shared_fps >= {WINNOW_MIN_SHARED}
    """,
)
def text_winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap candidates: doc pairs sharing >= 2 winnowing
    fingerprints, hot (boilerplate) fingerprints capped before the
    self-join. The compact-sketch counterpart of the n-gram Jaccard pair
    generator — the join runs on ~2/(w+1) of the gram mass."""
    return TA.winnowing_overlap_pairs(
        load_table(spark, sf_dir, "documents"),
        k=WINNOW_K,
        w=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED,
        fp_cap=WINNOW_FP_CAP,
    )


PERC_DIM = 512
PERC_EPOCHS = 3
PERC_THRESHOLD = 0.75
PERC_BUCKETS = 8  # train_quality_perceptron's n_buckets default


def _perceptron_oracle(
    dim: int, epochs: int, n_buckets: int, threshold: float
) -> str:
    """Pinned-iteration unroll of the averaged mini-batch perceptron
    (r15 verdict Next #5 — the sim_ivf_kmeans_topk_pinned trick applied
    to the trainer): every one of the epochs*n_buckets synchronized
    weight updates is one CTE triple — weights-so-far (sum of prior
    updates), per-doc integer margins in the step's hash bucket,
    misclassified-doc update vector — and the AVERAGED weights fold
    closed-form as avg = sum_k w_k = sum_j (K-j+1)*u_j, so the final
    scoring joins ONE aggregated weight table. All integer math (md5
    bucket hashing, exact count sums), so the driver hash-compare is
    bit-exact."""
    h8 = "('0x' || substr(md5({v}), 1, 8))::BIGINT"
    steps = epochs * n_buckets
    ctes = [
        f"""base AS (
            SELECT doc_id, text,
                   len({_W}) AS n_tok, len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )""",
        f"""lab AS MATERIALIZED (
            SELECT doc_id, text,
                   CASE WHEN {_QUALITY_EXPR} >= {threshold} THEN 1 ELSE -1 END AS y
            FROM base
        )""",
        f"""bg AS (
            SELECT doc_id, y, unnest(
                CASE WHEN len(w) < 2 THEN CAST([] AS VARCHAR[])
                     ELSE [w[i] || ' ' || w[i + 1]
                           for i in generate_series(1, len(w) - 1)]
                END) AS g
            FROM (SELECT doc_id, y, {_W} AS w FROM lab)
        )""",
        f"""cnt AS (
            SELECT doc_id, y,
                   CAST({h8.format(v="g")} % {dim} AS INT) AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM bg GROUP BY doc_id, y, bucket
        )""",
        f"""feats AS MATERIALIZED (
            SELECT doc_id, y, bucket, cnt,
                   CAST({h8.format(v="CAST(doc_id AS VARCHAR)")}
                        % {n_buckets} AS INT) AS mb
            FROM (
                SELECT * FROM cnt
                UNION ALL
                SELECT doc_id, y, {dim} AS bucket, CAST(1 AS BIGINT) AS cnt
                FROM lab
            )
        )""",
    ]
    for k in range(1, steps + 1):
        b = (k - 1) % n_buckets
        if k == 1:
            ctes.append(
                "wp1 AS (SELECT CAST(NULL AS INT) AS bucket, "
                "CAST(NULL AS BIGINT) AS w WHERE 1 = 0)"
            )
        else:
            prior = "\n                UNION ALL ".join(
                f"SELECT bucket, u FROM u{j}" for j in range(1, k)
            )
            ctes.append(
                f"""wp{k} AS (
                SELECT bucket, CAST(SUM(u) AS BIGINT) AS w
                FROM ({prior}) GROUP BY bucket
            )"""
            )
        ctes.append(
            f"""m{k} AS (
            SELECT f.doc_id, f.y,
                   CAST(SUM(f.cnt * COALESCE(w.w, 0)) AS BIGINT) AS margin
            FROM feats f LEFT JOIN wp{k} w USING (bucket)
            WHERE f.mb = {b}
            GROUP BY f.doc_id, f.y
        )"""
        )
        ctes.append(
            f"""u{k} AS MATERIALIZED (
            SELECT f.bucket, CAST(SUM(f.y * f.cnt) AS BIGINT) AS u
            FROM feats f JOIN m{k} m ON m.doc_id = f.doc_id
            WHERE f.mb = {b} AND m.y * m.margin <= 0
            GROUP BY f.bucket
        )"""
        )
    allu = "\n            UNION ALL ".join(
        f"SELECT bucket, u, {steps - j + 1} AS mult FROM u{j}"
        for j in range(1, steps + 1)
    )
    ctes.append(
        f"""avg AS (
            SELECT bucket, CAST(SUM(mult * u) AS BIGINT) AS w
            FROM ({allu}) GROUP BY bucket
        )"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT doc_id, y, score,
           CAST(CASE WHEN score > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
           (CASE WHEN score > 0 THEN 1 ELSE -1 END) = y AS correct
    FROM (
        SELECT f.doc_id, CAST(f.y AS BIGINT) AS y,
               CAST(SUM(f.cnt * COALESCE(a.w, 0)) AS BIGINT) AS score
        FROM feats f LEFT JOIN avg a USING (bucket)
        GROUP BY f.doc_id, f.y
    )
    """


@query(
    "text_quality_perceptron",
    # r17 rotation: promoted into the driver window
    # ORACLE-BACKED since r16 (verdict Next #5): the trainer's
    # epochs*n_buckets synchronized integer weight updates replay as a
    # pinned-iteration CTE unroll (_perceptron_oracle — the
    # sim_ivf_kmeans_topk_pinned stance applied to the perceptron), so
    # training AND scoring are hash-parity-gated end to end; the python
    # sequential-model equivalence test (tests/test_classifier.py) stays
    # as the cross-check on unpinned geometries.
    oracle=_perceptron_oracle(
        PERC_DIM, PERC_EPOCHS, PERC_BUCKETS, PERC_THRESHOLD
    ),
)
def text_quality_perceptron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram linear quality classifier (averaged batch
    perceptron, operators/classifier.py): trains on the curation
    composite's own labels (quality >= {PERC_THRESHOLD}) and scores
    every doc with the integer-exact averaged weights — the cheap linear
    surrogate a 100 TB curation pass would apply to unseen text. Output:
    (doc_id, y, score, pred, correct)."""
    from db_integration_via_kafka_ksql_spark.operators import classifier as C

    docs = load_table(spark, sf_dir, "documents")
    w = C.train_quality_perceptron(
        docs, dim=PERC_DIM, epochs=PERC_EPOCHS, threshold=PERC_THRESHOLD
    )
    return C.score_quality_perceptron(docs, w, threshold=PERC_THRESHOLD)


PMI_MIN_COUNT = 5
PMI_TOP_K = 50
_PMI_LIFT = (
    "(CAST(n_total AS DOUBLE) * CAST(c_xy AS DOUBLE)"
    " / CAST(c_x AS DOUBLE) / CAST(c_y AS DOUBLE))"
)

from db_integration_via_kafka_ksql_spark.functions.detmath import (  # noqa: E402
    det_ln_sql as _det_ln_sql,
)

_PMI_LN = _det_ln_sql(_PMI_LIFT, "duckdb")


@query(
    "text_pmi_collocations",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-14 rotation: promoted into the external driver window
    # round-10 rotation: promoted into the external driver window
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        FROM toks
    ),
    pairs AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM bg GROUP BY 1, 2
    ),
    cx AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x FROM pairs GROUP BY 1),
    cy AS (SELECT w2, CAST(sum(c_xy) AS BIGINT) AS c_y FROM pairs GROUP BY 1),
    n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_total FROM pairs),
    s AS (
        SELECT pairs.w1, pairs.w2, c_xy, c_x, c_y,
               CAST(floor(1.0e6 * {_PMI_LN}) AS BIGINT) AS pmi_micro
        FROM pairs
        JOIN cx ON pairs.w1 = cx.w1
        JOIN cy ON pairs.w2 = cy.w2, n
        WHERE c_xy >= {PMI_MIN_COUNT} AND {_PMI_LIFT} >= 1.0e0
    )
    SELECT * FROM s ORDER BY pmi_micro DESC, w1 ASC, w2 ASC LIMIT {PMI_TOP_K}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide positive-PMI collocations (Church & Hanks): the top
    adjacent-token pairs by micro-nat PMI against bigram marginals —
    one bigram-count pass, marginals re-aggregated from the pair frame,
    N broadcast, global top-k TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    return TA.pmi_collocations(
        docs, min_count=PMI_MIN_COUNT, top_k=PMI_TOP_K
    )


WSAMPLE_K = 10
WSAMPLE_SEED = "w0"
_WS_LN = _det_ln_sql(
    f"(CAST({1 << 60} AS DOUBLE) / CAST(_h + 1 AS DOUBLE))", "duckdb"
)


@query(
    "sample_weighted_per_source",
    # round-12 rotation: promoted into the driver window
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
               ('0x' || substr(md5('{WSAMPLE_SEED}|'
                   || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS _h
        FROM documents
    ),
    p AS (
        SELECT doc_id, source, weight,
               CAST(floor(1.0e9 * {_WS_LN}
                          / CAST(greatest(weight, 1) AS DOUBLE))
                    AS BIGINT) AS priority_nano
        FROM h
    )
    SELECT doc_id, source, weight, priority_nano, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY priority_nano ASC, doc_id ASC
        ) AS rnk
        FROM p
    ) WHERE rnk <= {WSAMPLE_K}
    """,
)
def sample_weighted_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without replacement (Efraimidis-
    Spirakis exponential race), k=10 per source with n_chars weights:
    deterministic salted-hash uniforms, det-ln priorities in integer
    nano-units, per-stratum rank window."""
    docs = load_table(spark, sf_dir, "documents")
    return TA.weighted_sample_per_stratum(
        docs, k=WSAMPLE_K, seed=WSAMPLE_SEED
    )


@query(
    "corpus_version_diff",
    # r17 rotation: promoted back into the driver window (r14-demoted veteran)
    # round-12 rotation: promoted into the driver window
    # deterministic crawl-refresh simulation (same derivation both sides):
    # %7 docs dropped, %5 docs re-crawled with edited text, %11 docs
    # re-appear under new ids — every change leg exercised on real text.
    oracle="""
    WITH old AS (SELECT doc_id, text FROM documents),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 7 != 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
    ),
    o AS (SELECT doc_id AS k, md5('1' || text) AS old_fp FROM old),
    n AS (SELECT doc_id AS k, md5('1' || text) AS new_fp FROM new)
    SELECT coalesce(o.k, n.k) AS doc_id,
           CASE WHEN o.k IS NULL THEN 'added'
                WHEN n.k IS NULL THEN 'removed'
                WHEN old_fp != new_fp THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           old_fp, new_fp
    FROM o FULL OUTER JOIN n ON o.k = n.k
    """,
)
def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash snapshot diff between a corpus and its next crawl
    refresh (operators/versioning.snapshot_diff): added / removed /
    changed / unchanged per doc — the incremental-reprocessing work list
    (only added+changed re-enter curation/embedding at 100 TB). The
    refresh is derived deterministically from the corpus so the oracle
    replays both snapshots exactly."""
    from db_integration_via_kafka_ksql_spark.operators import versioning as V

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return V.snapshot_diff(docs, new)


CURRICULUM_SALT = "curriculum-v1"


@query(
    "text_curriculum_order",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    # replay: quality deciles (fixed-order IEEE recipe), easy-first bucket
    # flip, salted-md5 within-bucket shuffle, prefix-sum bucket offsets —
    # the oracle uses a partitioned row_number + the same 10-row offset
    # frame, NOT a global sort, mirroring the operator's scale shape.
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, {_QUALITY_EXPR} AS quality
        FROM (
            SELECT doc_id,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    ),
    b AS (
        SELECT doc_id,
               9 - least(CAST(floor(quality * 10.0e0) AS BIGINT), 9) AS bucket,
               ('0x' || substr(md5('{CURRICULUM_SALT}|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 AS shuffle_key
        FROM scored
    ),
    p AS (
        SELECT doc_id, bucket,
               CAST(row_number() OVER (
                   PARTITION BY bucket ORDER BY shuffle_key, doc_id
               ) - 1 AS BIGINT) AS pos_in_bucket
        FROM b
    ),
    sizes AS (SELECT bucket, count(*) AS sz FROM p GROUP BY 1),
    offsets AS (
        SELECT bucket,
               CAST(coalesce(sum(sz) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS off
        FROM sizes
    )
    SELECT p.doc_id, p.bucket, p.pos_in_bucket,
           o.off + p.pos_in_bucket AS global_pos
    FROM p JOIN offsets o USING (bucket)
    """,
)
def text_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order (text_analysis.curriculum_order):
    quality-decile buckets consumed easy-first, salted-md5 shuffle within
    each bucket, global positions from broadcast prefix-sum offsets —
    never a global sort."""
    return TA.curriculum_order(
        load_table(spark, sf_dir, "documents"), salt=CURRICULUM_SALT
    )


@query(
    "quality_drift_by_source",
    driver=False,  # r17 rotation: demoted to aux (still hash-parity-gated in tests)
    # round-13 rotation: promoted into the driver window
    oracle=f"""
    WITH scored AS (
        SELECT source,
               least(CAST(floor(({_QUALITY_EXPR}) * 10.0e0) AS BIGINT), 9)
                 AS bucket
        FROM (
            SELECT doc_id, source,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    ),
    sb AS (
        SELECT source, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM scored GROUP BY 1, 2
    ),
    totals AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs FROM sb GROUP BY 1),
    ghist AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS gcnt FROM sb GROUP BY 1),
    gt AS (SELECT CAST(sum(gcnt) AS BIGINT) AS gtotal FROM ghist),
    grid AS (
        SELECT t.source, t.n_docs,
               abs(coalesce(s.cnt, 0) * 1000 // t.n_docs
                   - g.gcnt * 1000 // gt.gtotal) AS d
        FROM totals t CROSS JOIN ghist g CROSS JOIN gt
        LEFT JOIN sb s ON s.source = t.source AND s.bucket = g.bucket
    )
    SELECT source, max(n_docs) AS n_docs,
           CAST(sum(d) AS BIGINT) AS drift_permille
    FROM grid GROUP BY 1
    """,
)
def quality_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-distribution drift per source vs the corpus (L1 on decile
    histograms, integer permille) — the feed-health monitor that runs
    before mixture planning (text_analysis.quality_drift_by_source)."""
    return TA.quality_drift_by_source(load_table(spark, sf_dir, "documents"))


@query(
    "text_quality_calibrated",
    # round-12 rotation: promoted into the driver window
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, ({_QUALITY_EXPR}) AS quality
        FROM (
            SELECT doc_id, source,
                   len({_W}) AS n_tok,
                   len({_DW}) AS n_dis,
                   {_STOP_SUM} AS stop_hits,
                   length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                   length(text) AS n_chars
            FROM documents
        )
    ),
    r AS (
        SELECT doc_id, source, quality,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY quality ASC, doc_id ASC
               ) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
        FROM scored
    )
    SELECT doc_id, source,
           CAST(floor(quality * 1000) AS BIGINT) AS q_raw_permille,
           CAST(CASE WHEN n_src <= 1 THEN 500
                ELSE (rn - 1) * 1000 // (n_src - 1) END AS BIGINT)
             AS q_cal_permille
    FROM r
    """,
)
def text_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality percentile calibration
    (text_analysis.quality_calibrated): raw quality mapped to its
    within-source permille rank, so cross-source cuts and mixture
    planning stop inheriting each source's score miscalibration. One
    source-partitioned window, deterministic doc_id tie order."""
    return TA.quality_calibrated(load_table(spark, sf_dir, "documents"))

