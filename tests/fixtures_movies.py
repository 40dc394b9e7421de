"""F1/F2 fixtures (FIXTURES.md): the reference's movies table and its
unwrapped CDC changelog, with true NULL-payload tombstone rows and
DECIMAL(3,1) ratings.

The changelog recipe mirrors the-whole-thing.sh + TOMBSTONE_HANDLING_GUIDE:
per key 1 insert, 0-3 updates, for some keys a delete (= __deleted='true'
rewrite row followed by a tombstone row at the next offset), re-inserts
after tombstones, and one key whose delete and re-insert land in the same
micro-batch. Fully scripted — no RNG — so every test run and both engines
see identical data.
"""

from __future__ import annotations

from datetime import datetime, timezone
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TS = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

MOVIES_FIELDS = [
    # nullable: in the changelog shape every payload column (incl. id) is
    # NULL on tombstone rows; only the key/offset are NOT NULL
    StructField("id", IntegerType(), True),
    StructField("title", StringType()),
    StructField("director", StringType()),
    StructField("release_year", IntegerType()),
    StructField("genre", StringType()),
    StructField("rating", DecimalType(3, 1)),
    StructField("duration_minutes", IntegerType()),
    StructField("budget", LongType()),
    StructField("box_office", LongType()),
    StructField("description", StringType()),
    StructField("created_at", TimestampType()),
    StructField("updated_at", TimestampType()),
]

CHANGELOG_SCHEMA = StructType(
    [
        StructField("key_id", IntegerType(), False),
        StructField("offset", LongType(), False),
        *MOVIES_FIELDS,
        StructField("__deleted", StringType()),
        StructField("is_tombstone", BooleanType()),
    ]
)


def _movie(i: int, title: str, director: str, year: int, rating: str):
    return (
        i,
        title,
        director,
        year,
        "Drama" if i % 3 else "Sci-Fi",
        Decimal(rating),
        90 + i * 7 % 60,
        350_000 + i * 1_000_000,
        1_000_000 + i * 5_000_000,
        f"description of {title}",
        _TS,
        _TS,
    )


MOVIES = [
    _movie(1, "Inception", "Nolan", 2010, "8.8"),
    _movie(2, "Interstellar", "Nolan", 2014, "8.7"),
    _movie(3, "The Prestige", "Nolan", 2006, "8.5"),
    _movie(4, "Fight Club", "Fincher", 1999, "8.8"),
    _movie(5, "Seven", "Fincher", 1995, "8.6"),
    _movie(6, "Casablanca", "Curtiz", 1942, "8.5"),
    _movie(7, "Parasite", "Bong", 2019, "8.5"),
    _movie(8, "Whiplash", "Chazelle", 2014, "8.5"),
]


def _ins(key: int, off: int, movie, deleted: str = "false"):
    return (key, off, *movie, deleted, False)


def _update(key: int, off: int, movie, new_rating: str):
    m = list(movie)
    m[5] = Decimal(new_rating)
    m[11] = _TS.replace(hour=off % 24)
    return (key, off, *m, "false", False)


def _delete_rewrite(key: int, off: int, movie):
    # final state + __deleted='true' (delete.handling.mode=rewrite)
    return (key, off, *movie, "true", False)


def _tombstone(key: int, off: int):
    # whole value NULL: every payload column (incl. __deleted) is NULL
    nulls = (None,) * len(MOVIES_FIELDS)
    return (key, off, *nulls, None, True)


def movies_changelog_rows() -> list[tuple]:
    """offsets are globally monotone; per-key order is total."""
    m = {r[0]: r for r in MOVIES}
    rows = [
        _ins(1, 1, m[1]),
        _ins(2, 2, m[2]),
        _ins(3, 3, m[3]),
        _update(1, 4, m[1], "9.0"),
        _ins(4, 5, m[4]),
        _update(1, 6, m[1], "9.1"),          # 2nd update of key 1
        _delete_rewrite(2, 7, m[2]),          # delete key 2 ...
        _tombstone(2, 8),                     # ... with tombstone
        _ins(5, 9, m[5]),
        _update(4, 10, m[4], "8.9"),
        _ins(6, 11, m[6]),
        _delete_rewrite(6, 12, m[6]),         # delete key 6
        _tombstone(6, 13),
        _ins(2, 14, m[2]),                    # insert-AFTER-delete (key 2)
        _ins(7, 15, m[7]),
        # same-batch delete + re-insert of key 7 (SURVEY §7.3.2)
        _delete_rewrite(7, 16, m[7]),
        _tombstone(7, 17),
        _ins(7, 18, _movie(7, "Parasite (4K)", "Bong", 2019, "8.6")),
        _ins(8, 19, m[8]),
        _delete_rewrite(8, 20, m[8]),         # key 8 ends deleted
        _tombstone(8, 21),
    ]
    return rows


def movies_changelog_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(movies_changelog_rows(), CHANGELOG_SCHEMA)


# expected latest state (key -> (title, rating)) after full compaction
EXPECTED_STATE = {
    1: ("Inception", Decimal("9.1")),
    2: ("Interstellar", Decimal("8.7")),   # re-inserted after delete
    3: ("The Prestige", Decimal("8.5")),
    4: ("Fight Club", Decimal("8.9")),
    5: ("Seven", Decimal("8.6")),
    7: ("Parasite (4K)", Decimal("8.6")),  # same-batch delete+re-insert
    # 6 and 8: deleted
}
