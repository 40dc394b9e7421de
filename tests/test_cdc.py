"""Unit tests for CDC operators against the reference's scenario specs
(FIXTURES.md F4 / SURVEY.md §5): count parity, delete propagation,
tombstone shape, insert-after-delete, replay-rebuild, compaction invariant.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from db_integration_via_kafka_ksql_spark.operators import cdc

SCHEMA = StructType(
    [
        StructField("key_id", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("title", StringType(), True),
        StructField("__deleted", StringType(), True),
        StructField("is_tombstone", BooleanType(), False),
    ]
)

# mirrors the-whole-thing.sh / TOMBSTONE_HANDLING_GUIDE.md scenarios:
# key 1: insert + 2 updates                       -> survives as v3
# key 2: insert, delete rewrite + tombstone       -> gone
# key 3: insert, delete, re-insert                -> survives as v2 (insert-after-delete)
# key 4: insert + delete + re-insert SAME BATCH   -> survives (SURVEY §7.3.2)
ROWS = [
    (1, 1, "v1", "false", False),
    (1, 5, "v2", "false", False),
    (1, 9, "v3", "false", False),
    (2, 2, "x1", "false", False),
    (2, 6, "x1-final", "true", False),
    (2, 7, None, None, True),  # tombstone: whole value NULL
    (3, 3, "y1", "false", False),
    (3, 8, "y1-final", "true", False),
    (3, 10, None, None, True),
    (3, 11, "y2", "false", False),  # re-insert after tombstone
    (4, 12, "z1", "false", False),
    (4, 13, "z1-final", "true", False),
    (4, 14, None, None, True),
    (4, 15, "z2", "false", False),
]


def changelog(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def state_of(spark, df=None):
    log = df if df is not None else changelog(spark)
    compacted = cdc.compact_latest(log, key_cols=["key_id"], order_cols=["offset"])
    return cdc.soft_delete_filter(
        compacted, deleted_col="__deleted", tombstone_col="is_tombstone"
    )


def test_compact_latest_one_row_per_key(spark):
    compacted = cdc.compact_latest(
        changelog(spark), key_cols=["key_id"], order_cols=["offset"]
    )
    rows = {r.key_id: r for r in compacted.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].offset == 9 and rows[1].title == "v3"
    assert rows[2].is_tombstone is True  # latest record for 2 is the tombstone


def test_delete_propagation_and_insert_after_delete(spark):
    rows = {r.key_id: r for r in state_of(spark).collect()}
    assert 2 not in rows, "deleted key must leave the state (F4.2)"
    assert rows[3].title == "y2", "insert-after-delete reappears (F4.4)"
    assert rows[4].title == "z2", "same-batch delete+reinsert survives (§7.3.2)"
    assert rows[1].title == "v3"


def test_count_parity_no_deletes(spark):
    log = changelog(spark).filter(F.col("key_id") == 1)
    assert state_of(spark, log).count() == 1  # distinct keys == sink count (F4.1)


def test_tombstone_shape_preserved_in_changelog(spark):
    """F4.3: the output changelog for a deleted key ends with the
    __deleted='true' rewrite row followed by a null-value tombstone."""
    log = changelog(spark).filter(F.col("key_id") == 2).orderBy("offset")
    tail = log.collect()[-2:]
    assert tail[0]["__deleted"] == "true" and tail[0]["title"] == "x1-final"
    assert tail[1].is_tombstone and tail[1].title is None
    assert tail[1].key_id == 2, "tombstone keeps its key"


def test_replay_rebuild_invariant(spark):
    """F4.5: apply_changelog(compact(log[:n]), log[n:]) == compact(log)
    for every split point."""
    full = state_of(spark)
    # apply_changelog uses __deleted only; fold tombstones into it first
    log = changelog(spark).withColumn(
        "__deleted",
        F.when(F.col("is_tombstone"), F.lit("true")).otherwise(F.col("__deleted")),
    )
    expected = sorted(
        (r.key_id, r.offset, r.title) for r in full.collect()
    )
    for split in (0, 5, 9, 16):
        head = log.filter(F.col("offset") <= split)
        tail = log.filter(F.col("offset") > split)
        state = cdc.soft_delete_filter(
            cdc.compact_latest(head, key_cols=["key_id"], order_cols=["offset"])
        )
        merged = cdc.apply_changelog(
            state, tail, key_cols=["key_id"], order_cols=["offset"]
        )
        got = sorted((r.key_id, r.offset, r.title) for r in merged.collect())
        assert got == expected, f"split={split}"


def test_compaction_invariant(spark):
    """F4.6: last-record-per-key of the changelog == materialized state
    (log-compaction compatibility)."""
    compacted = cdc.compact_latest(
        changelog(spark), key_cols=["key_id"], order_cols=["offset"]
    )
    live = cdc.soft_delete_filter(
        compacted, deleted_col="__deleted", tombstone_col="is_tombstone"
    )
    state = state_of(spark)
    assert sorted(map(tuple, live.collect())) == sorted(map(tuple, state.collect()))


def test_compact_plan_is_partial_hash_aggregate(spark):
    """Scale guard: compaction must plan as HashAggregate with a partial
    (map-side) phase, not a Window sort — the partial combine is what keeps
    the shuffle proportional to distinct keys at 100 TB."""
    compacted = cdc.compact_latest(
        changelog(spark), key_cols=["key_id"], order_cols=["offset"]
    )
    plan = compacted._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_apply_changelog_evolve_admits_added_column(spark):
    """Mid-log ALTER TABLE ADD COLUMN: the evolved batch merges, old keys
    read NULL for the new column, updated keys carry its value, deletes
    still delete — and without evolve=True the mismatch stays a hard
    error (silent drift would corrupt state)."""
    import pytest as _pytest

    state = spark.createDataFrame(
        [(1, "a", "false", 1), (2, "b", "false", 2), (3, "c", "false", 3)],
        "key_id long, payload string, __deleted string, offset long",
    )
    batch = spark.createDataFrame(
        [
            (2, "b2", 20.0, "false", 10),   # update, carries new col w
            (3, None, None, "true", 11),    # delete still works
            (4, "d", 40.0, "false", 12),    # insert with new col
        ],
        "key_id long, payload string, w double, __deleted string, offset long",
    )
    with _pytest.raises(ValueError, match="mismatch"):
        cdc.apply_changelog(
            state, batch, key_cols=["key_id"], order_cols=["offset"]
        )
    out = {
        r["key_id"]: (r["payload"], r["w"])
        for r in cdc.apply_changelog(
            state, batch, key_cols=["key_id"], order_cols=["offset"],
            evolve=True,
        ).collect()
    }
    assert out == {1: ("a", None), 2: ("b2", 20.0), 4: ("d", 40.0)}


def test_apply_changelog_evolve_rejects_type_change(spark):
    import pytest as _pytest

    state = spark.createDataFrame(
        [(1, 5, "false", 1)], "key_id long, v int, __deleted string, offset long"
    )
    batch = spark.createDataFrame(
        [(1, "five", "false", 2)],
        "key_id long, v string, __deleted string, offset long",
    )
    with _pytest.raises(ValueError, match="type changed"):
        cdc.apply_changelog(
            state, batch, key_cols=["key_id"], order_cols=["offset"],
            evolve=True,
        )


def test_evolve_replay_rebuild_invariant(spark):
    """The replay invariant survives a schema change at the split point:
    incremental apply of the evolved tail == one-shot compaction over the
    column-aligned full log."""
    log1 = spark.createDataFrame(
        [(1, "a", "false", 1), (2, "b", "false", 2)],
        "key_id long, payload string, __deleted string, offset long",
    )
    log2 = spark.createDataFrame(
        [(1, "a2", 7.0, "false", 3), (5, "e", 9.0, "false", 4)],
        "key_id long, payload string, w double, __deleted string, offset long",
    )
    incremental = cdc.apply_changelog(
        cdc.soft_delete_filter(
            cdc.compact_latest(log1, key_cols=["key_id"], order_cols=["offset"])
        ),
        cdc.compact_latest(log2, key_cols=["key_id"], order_cols=["offset"]),
        key_cols=["key_id"],
        order_cols=["offset"],
        evolve=True,
    )
    a, b = cdc.align_columns(log1, log2)
    oneshot = cdc.soft_delete_filter(
        cdc.compact_latest(
            a.unionByName(b), key_cols=["key_id"], order_cols=["offset"]
        )
    )
    key = lambda df: {  # noqa: E731
        r["key_id"]: (r["payload"], r["w"]) for r in df.collect()
    }
    assert key(incremental) == key(oneshot)
    assert key(incremental) == {1: ("a2", 7.0), 2: ("b", None), 5: ("e", 9.0)}


class TestScd2History:
    def _log(self, spark, rows):
        # rows: (key, offset, ts_us, event_type, deleted)
        return spark.createDataFrame(
            [(k, o, t, e, "true" if d else "false") for k, o, t, e, d in rows],
            "key_id long, offset long, us long, event_type string,"
            " __deleted string",
        )

    def test_update_delete_reinsert_intervals(self, spark):
        from pyspark.sql import functions as F

        from db_integration_via_kafka_ksql_spark.operators.cdc import (
            scd2_history,
        )

        log = self._log(
            spark,
            [
                (1, 10, 100, "a", False),   # v1: [100, 200)
                (1, 11, 200, "b", False),   # v2: [200, 300) closed by delete
                (1, 12, 300, "del", True),  # closes v2, emits nothing
                (1, 13, 400, "c", False),   # v3: [400, None) current
                (2, 20, 150, "x", False),   # single version, current
            ],
        )
        got = {
            (r["key_id"], r["version"]): (
                r["valid_from_us"], r["valid_to_us"], r["is_current"],
                r["event_type"],
            )
            for r in scd2_history(
                log, F.col("us"), attrs=["event_type"]
            ).collect()
        }
        assert got == {
            (1, 10): (100, 200, False, "a"),
            (1, 11): (200, 300, False, "b"),
            (1, 13): (400, None, True, "c"),
            (2, 20): (150, None, True, "x"),
        }

    def test_delete_only_key_emits_nothing(self, spark):
        from pyspark.sql import functions as F

        from db_integration_via_kafka_ksql_spark.operators.cdc import (
            scd2_history,
        )

        log = self._log(spark, [(3, 30, 100, "gone", True)])
        assert scd2_history(log, F.col("us"), attrs=["event_type"]).count() == 0


def test_scd2_point_in_time_one_row_per_purchase(spark, sf_dir):
    from db_integration_via_kafka_ksql_spark.io import load_table
    from db_integration_via_kafka_ksql_spark.registry import all_queries

    df = all_queries()["cdc_scd2_point_in_time"](spark, sf_dir)
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .count()
    )
    rows = df.collect()
    assert len(rows) == n_purchases  # a purchase is itself a live version
    at_self = sum(r["version"] == r["purchase_id"] for r in rows)
    assert at_self == n_purchases  # purchase is the newest version at its t
