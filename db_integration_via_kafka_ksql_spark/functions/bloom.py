"""Deterministic Bloom filter, built and probed entirely with JVM-side
column expressions.

Spark's own runtime bloom machinery (`bloom_filter_agg` /
`might_contain`) is internal-only — not resolvable from SQL in this
build — so this module derives the same structure from public
primitives: k positions per item via ``xxhash64(seed_i, item) mod m``,
the bit array packed into ``array<bigint>`` words, membership as k
``getbit`` probes ANDed together. Everything is deterministic (xxhash64
is a fixed-seed stable hash), so filters are reproducible across runs
and sessions — a property the training-pipeline ops rely on for
idempotent re-runs.

Scale contract: the filter costs m bits regardless of item count or
string length. Sized at the information-theoretic optimum
(m ≈ 1.44·k·n ≈ 9.6·n bits for 1% fpp), 100M benchmark n-grams fit in
~120 MB — broadcastable to every executor — where broadcasting the
distinct gram STRINGS (the exact path in
operators/text_analysis.decontaminate) would be several GB. The build
never materializes per-item state on the driver: positions fold into at
most m/64 (word, bits) rows via a map-side-combined bit_or aggregate,
and only that word list (== the filter's own size) is collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomParams:
    """Shared between build and probe — a probe with different params
    than the build is meaningless, so they travel as one value.

    hash: "xxhash64" (default — cheapest per item, Spark-internal) or
    "md5" (the repo's cross-engine hash discipline: first 15 md5
    nibbles as a 60-bit bigint, bit-replayable in DuckDB — see
    functions/text.hex_hash_int), chosen so the bloom decontamination
    query can carry a full build+probe oracle (r15 verdict Next #5).
    Position streams differ between the two, so build and probe agree
    through the shared params value as always."""

    n_bits: int = 1 << 20
    n_hashes: int = 5
    hash: str = "xxhash64"

    @property
    def n_words(self) -> int:
        return (self.n_bits + 63) // 64


def _positions(item: Column, p: BloomParams) -> list[Column]:
    """k bit positions for an item, seeded by the probe index (a
    leading "i:" salt == distinct hash per k)."""
    if p.hash == "md5":
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), item)), 1, 15
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(p.n_bits),
            )
            for i in range(p.n_hashes)
        ]
    if p.hash != "xxhash64":
        raise ValueError(f'hash must be "xxhash64"|"md5", got {p.hash!r}')
    return [
        F.pmod(F.xxhash64(F.lit(i), item), F.lit(p.n_bits))
        for i in range(p.n_hashes)
    ]


def positions_sql_duckdb(item_sql: str, p: BloomParams) -> list[str]:
    """The DuckDB replay of _positions for hash="md5" — one fragment per
    probe index, bit-identical to the Spark expressions (same salt, same
    15-nibble md5 window, same modulus)."""
    if p.hash != "md5":
        raise ValueError("only the md5 position stream is SQL-replayable")
    return [
        f"(('0x' || substr(md5('{i}:' || {item_sql}), 1, 15))::BIGINT "
        f"% {p.n_bits})"
        for i in range(p.n_hashes)
    ]


def build_bloom(items: DataFrame, item_col: str, p: BloomParams) -> list[int]:
    """Aggregate a column of items into the filter's word list.

    Distributed shape: explode to k positions per item, fold to
    (word_index, bit_or(mask)) with map-side combine — at most m/64
    result rows — then densify driver-side. The returned list of
    ``n_words`` Python ints IS the filter; hand it to
    :func:`bloom_frame` / :func:`might_contain` for probing.
    """
    item = F.col(item_col)
    pos = items.select(
        F.explode(F.array(*_positions(item, p))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("bigint").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                F.pmod(F.col("pos"), F.lit(64)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * p.n_words
    for r in words:
        dense[int(r["w"])] = int(r["bits"])
    return dense


def bloom_frame(spark, filter_words: list[int], p: BloomParams) -> DataFrame:
    """The filter as a one-row broadcastable frame (bf array<bigint>).

    Literal-array expressions of this size blow up the plan tree; a
    one-row frame cross-joined with ``F.broadcast`` ships the words once
    per executor instead, exactly like the dimension tables in the star
    joins.
    """
    assert len(filter_words) == p.n_words
    return spark.createDataFrame([(filter_words,)], "bf array<bigint>")


def might_contain(bf: Column, item: Column, p: BloomParams) -> Column:
    """Membership probe: k getbit probes ANDed. No false negatives by
    construction; false-positive odds ~(1 - e^{-kn/m})^k."""
    probes = []
    for pos in _positions(item, p):
        word = F.element_at(bf, (pos / 64).cast("int") + F.lit(1))
        probes.append(
            F.call_function(
                "getbit", word, F.pmod(pos, F.lit(64)).cast("int")
            )
            == F.lit(1)
        )
    out = probes[0]
    for c in probes[1:]:
        out = out & c
    return out
