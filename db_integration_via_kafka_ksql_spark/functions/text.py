"""Text-analysis expression builders: tokenization, shingles, MinHash,
SimHash, quality metrics, language-ID scoring, rolling-hash fingerprints.

Design notes (100 TB corpora):
- All hashing is md5-based (`F.md5`) — a JVM intrinsic, engine-portable
  (DuckDB computes the identical hex string), and uniformly distributed,
  so groupBy/join keys derived from it don't skew.
- Everything is a Column expression: tokenize→shingle→hash pipelines run
  inside whole-stage codegen with zero Python involvement. The only
  shuffles are the explicit groupBy/join in the operators that use these.
- MinHash uses k salted hashes of *distinct* word shingles. Distinctness
  bounds per-doc work by vocabulary, not document length.

Citation: the reference has no text operators (SURVEY §2.4 "none") — this
module is the BASELINE.json LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword lists for the heuristic language scorer.
# Deliberately tiny and hard-coded: the scorer is a deterministic,
# SQL-expressible heuristic (score = #distinct stopword hits), not a model.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}
# deterministic tie-break priority (first wins on equal score)
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "es", "fr", "zh")

HASH_MOD = 2147483647  # 2^31 - 1, keeps rolling hash in int range


def words(text: str | Column = "text") -> Column:
    """Whitespace tokenization (the BPE-ish regex variant is token_pieces)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def distinct_words(text: str | Column = "text") -> Column:
    return F.array_distinct(words(text))


def token_count(text: str | Column = "text") -> Column:
    return F.size(words(text))


def token_piece_count(text_col: str = "text") -> Column:
    """BPE-ish sub-word piece count: each word contributes ceil(len/4)
    pieces — a deterministic stand-in for a real BPE vocab (no tokenizer
    libs in this container). Exact integer math, portable to DuckDB as
    list_sum([(length(w)+3)//4 for w in string_split(text,' ')])."""
    return F.expr(
        f"aggregate(split({text_col}, ' '), cast(0 as bigint), "
        f"(acc, w) -> acc + (length(w) + 3) div 4)"
    )


def shingles(text: str | Column = "text", n: int = 3) -> Column:
    """Word n-gram shingles; docs shorter than n words shingle to the whole
    text. Expression form so it inlines into codegen.

    NOTE: `split` appears inside the transform lambda, so Spark re-splits
    the text per shingle — O(len²) per doc. Hot paths should project the
    words array first and use `shingles_of_words` (measured 5.1 s → 1.6 s
    for the sf0.1 shingle pass)."""
    col = text if isinstance(text, str) else "text"
    w = f"split({col}, ' ')"
    return F.expr(
        f"CASE WHEN size({w}) < {n} THEN array({col}) "
        f"ELSE transform(sequence(1, size({w}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({w}, i, {n}))) END"
    )


def shingles_of_words_sql(words_col: str, text_col: str, n: int = 3) -> str:
    """Raw Spark-SQL fragment of `shingles_of_words` — for callers that
    must compose it inside a larger lambda expression (nesting a
    python-side F.transform over an expr-built lambda array mis-resolves
    the inner lambda variable; keep the whole nest in one SQL string)."""
    return (
        f"CASE WHEN size({words_col}) < {n} THEN array({text_col}) "
        f"ELSE transform(sequence(1, size({words_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words_col}, i, {n}))) END"
    )


def shingles_of_words(words_col: str, text_col: str, n: int = 3) -> Column:
    """`shingles` over a pre-projected words array (computed ONCE per row
    at the projection boundary — no per-shingle re-split). Same output."""
    return F.expr(shingles_of_words_sql(words_col, text_col, n))


def salted_hash(value: Column, salt: int) -> Column:
    """Portable salted hash: md5 hex of 's{salt}|' || value. String min/max
    over these == numeric min/max over a uniform 128-bit hash."""
    return F.md5(F.concat(F.lit(f"s{salt}|"), value))


def hex_hash_int(value: Column, nibbles: int = 8) -> Column:
    """First `nibbles` hex chars of md5 as a non-negative bigint.
    DuckDB mirror: ('0x' || substr(md5(v), 1, nibbles))::BIGINT."""
    return F.conv(F.substring(F.md5(value), 1, nibbles), 16, 10).cast("bigint")


def minhash_signature(word_col: Column, k: int) -> list[Column]:
    """k aggregate expressions producing the MinHash signature of the
    grouped set: min over salted md5 hex strings. Use under groupBy(doc)."""
    return [F.min(salted_hash(word_col, i)).alias(f"h{i}") for i in range(k)]


def simhash16_expr(words_sql: str) -> Column:
    """16-bit SimHash of the word array given as a SQL fragment.

    bit j of the fingerprint = majority vote over words of bit j of the
    word's 16-bit md5-derived hash (+1/-1 votes, strict-positive → 1).
    Pure integer expression; mirrors bit-for-bit in DuckDB SQL.
    """
    h = "cast(conv(substring(md5(w), 1, 4), 16, 10) as bigint)"
    bits = []
    for j in range(16):
        vote = (
            f"aggregate({words_sql}, cast(0 as bigint), "
            f"(acc, w) -> acc + (CASE WHEN ({h} div {1 << j}) % 2 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bits.append(f"(CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def rolling_fingerprint(text_col: str = "text") -> Column:
    """Order-sensitive rolling hash over the word sequence:
    fold(acc*31 + hash32(word)) mod (2^31-1). Two docs with the same word
    multiset but different order fingerprint differently (unlike MinHash)."""
    h = "cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)"
    return F.expr(
        f"aggregate(split({text_col}, ' '), cast(0 as bigint), "
        f"(acc, w) -> (acc * 31 + {h}) % {HASH_MOD})"
    )


def stopword_hits(text: str | Column, lang: str) -> Column:
    """Number of tokens (with repeats) that are stopwords of `lang`."""
    sw = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    col = text if isinstance(text, str) else "text"
    return F.expr(
        f"size(filter(split({col}, ' '), w -> array_contains(array({sw}), w)))"
    )


def predicted_lang_case(score_cols: dict[str, str]) -> str:
    """Argmax over per-language score columns with deterministic
    LANG_PRIORITY tie-break, as a chained-CASE SQL string. The identical
    string is valid Spark SQL and DuckDB SQL — both sides of the parity
    gate use this one builder."""
    branches = []
    langs = [l for l in LANG_PRIORITY if l in score_cols]
    for i, lang in enumerate(langs):
        others = [score_cols[o] for o in langs if o != lang]
        cond = " AND ".join(f"{score_cols[lang]} >= {o}" for o in others)
        if i < len(langs) - 1:
            branches.append(f"WHEN {cond} THEN '{lang}'")
        else:
            branches.append(f"ELSE '{lang}'")
    return "CASE " + " ".join(branches) + " END"


def predicted_lang(score_cols: dict[str, str]) -> Column:
    return F.expr(predicted_lang_case(score_cols))
