"""Incremental aggregate view (streaming/aggview.py): after EVERY batch
the incrementally-maintained (group, count, sum) must equal a full
recompute from the row state — inserts, updates, cross-group moves,
deletes, group extinction, and replays all covered."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_integration_via_kafka_ksql_spark.streaming.aggview import (
    IncrementalAggView,
)
from db_integration_via_kafka_ksql_spark.streaming.state import (
    ParquetStateStore,
)


def _view(spark, tmp_path) -> IncrementalAggView:
    return IncrementalAggView(
        spark,
        path=str(tmp_path / "agg"),
        row_state=ParquetStateStore(
            spark,
            str(tmp_path / "rows"),
            key_cols=["id"],
            order_cols=["offset"],
        ),
        key_cols=["id"],
        group_col="grp",
        value_col="v",
    )


def _viewmm(spark, tmp_path) -> IncrementalAggView:
    """Same view plus non-invertible MIN/MAX maintenance on v."""
    v = _view(spark, tmp_path)
    v.minmax_cols = ["v"]
    return v


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id long, grp string, v double, __deleted string, offset long"
    )


def _snap(df):
    return {
        r["grp"]: (r["n_rows"], float(r["sum_value"])) for r in df.collect()
    }


def _snapall(df):
    """Schema-generic snapshot: grp -> sorted (col, repr) pairs, so the
    same helper compares count/sum-only and min/max-extended views."""
    cols = sorted(c for c in df.columns if c != "grp")
    return {
        r["grp"]: tuple((c, repr(r[c])) for c in cols) for r in df.collect()
    }


def _check(view):
    assert _snapall(view.read()) == _snapall(view.recompute())


def test_incremental_equals_recompute_through_cdc_lifecycle(spark, tmp_path):
    v = _view(spark, tmp_path)
    # batch 0: inserts across two groups
    v.process_batch(
        _batch(
            spark,
            [
                (1, "a", 10.0, "false", 1),
                (2, "a", 5.0, "false", 2),
                (3, "b", 7.5, "false", 3),
            ],
        ),
        0,
    )
    _check(v)
    assert _snap(v.read()) == {"a": (2, 15.0), "b": (1, 7.5)}

    # batch 1: value update + CROSS-GROUP move (key 3 b->a) + new key
    v.process_batch(
        _batch(
            spark,
            [
                (1, "a", 12.0, "false", 4),   # update in place
                (3, "a", 7.5, "false", 5),    # moves b -> a
                (4, "c", 1.25, "false", 6),   # new group appears
            ],
        ),
        1,
    )
    _check(v)
    snap = _snap(v.read())
    assert snap["a"] == (3, 24.5) and "b" not in snap  # b went extinct
    assert snap["c"] == (1, 1.25)

    # batch 2: delete one key of a multi-key group + delete the only key
    # of group c (extinction) + multi-version churn within one batch
    v.process_batch(
        _batch(
            spark,
            [
                (2, "a", 5.0, "true", 7),     # delete
                (4, "c", 1.25, "true", 8),    # group c extinct
                (5, "b", 100.0, "false", 9),  # insert...
                (5, "b", 50.0, "false", 10),  # ...then update, same batch
            ],
        ),
        2,
    )
    _check(v)
    snap = _snap(v.read())
    assert snap == {"a": (2, 19.5), "b": (1, 50.0)}


def test_minmax_falls_back_when_extreme_leaves(spark, tmp_path):
    """The non-invertible cases: deleting a group's max must surface the
    runner-up; moving the extreme key to another group must update BOTH
    groups' extremes; untouched groups keep theirs."""
    v = _viewmm(spark, tmp_path)
    v.process_batch(
        _batch(
            spark,
            [
                (1, "a", 10.0, "false", 1),
                (2, "a", 5.0, "false", 2),
                (3, "a", 7.0, "false", 3),
                (9, "z", 99.0, "false", 4),   # bystander group
            ],
        ),
        0,
    )
    _check(v)
    got = {r["grp"]: (r["min_v"], r["max_v"]) for r in v.read().collect()}
    assert got["a"] == (5.0, 10.0) and got["z"] == (99.0, 99.0)

    # delete the max of a → falls back to 7.0 (subtraction can't do this)
    v.process_batch(_batch(spark, [(1, "a", 10.0, "true", 5)]), 1)
    _check(v)
    got = {r["grp"]: (r["min_v"], r["max_v"]) for r in v.read().collect()}
    assert got["a"] == (5.0, 7.0) and got["z"] == (99.0, 99.0)

    # move a's min into b: a tightens to (7,7), b adopts (5,5)
    v.process_batch(_batch(spark, [(2, "b", 5.0, "false", 6)]), 2)
    _check(v)
    got = {r["grp"]: (r["min_v"], r["max_v"]) for r in v.read().collect()}
    assert got["a"] == (7.0, 7.0) and got["b"] == (5.0, 5.0)
    assert got["z"] == (99.0, 99.0)

    # replay must not disturb the extremes either
    v.process_batch(_batch(spark, [(2, "b", 5.0, "false", 6)]), 2)
    _check(v)


def test_replayed_epoch_applies_delta_exactly_once(spark, tmp_path):
    v = _view(spark, tmp_path)
    b0 = _batch(spark, [(1, "a", 10.0, "false", 1)])
    b1 = _batch(spark, [(2, "a", 4.0, "false", 2)])
    v.process_batch(b0, 0)
    v.process_batch(b1, 1)
    want = _snap(v.read())
    v.process_batch(b1, 1)  # replay after crash: delta must NOT double
    assert _snap(v.read()) == want
    _check(v)
    assert v.last_epoch() == 1


def test_aggview_through_live_stream(spark, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("grp", StringType()),
            StructField("v", DoubleType()),
            StructField("__deleted", StringType()),
            StructField("offset", LongType()),
        ]
    )
    src = str(tmp_path / "in")
    os.makedirs(src)

    def drop(name, rows):
        ids, grps, vs, dels, offs = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "grp": pa.array(grps),
                    "v": pa.array(vs, pa.float64()),
                    "__deleted": pa.array(dels),
                    "offset": pa.array(offs, pa.int64()),
                }
            ),
            f"{src}/{name}",
        )

    v = _view(spark, tmp_path)
    v.checkpoint_dir = str(tmp_path / "ckpt")
    v.trigger_seconds = 0  # as-fast-as-possible in tests
    drop("f1.parquet", [(1, "a", 2.0, "false", 1), (2, "b", 3.0, "false", 2)])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = v.start(stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _check(v)
    assert _snap(v.read()) == {"a": (1, 2.0), "b": (1, 3.0)}


_op = st.tuples(
    st.integers(1, 6),                        # key
    st.sampled_from(["a", "b", "c"]),         # group
    st.floats(0, 100, allow_nan=False).map(lambda x: round(x, 2)),
    st.booleans(),                            # deleted
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=st.lists(_op, min_size=1, max_size=12), data=st.data())
def test_aggview_equals_recompute_for_any_changelog(
    spark, tmp_path_factory, ops, data
):
    """For ANY changelog sequence (repeated keys, cross-group moves,
    deletes of live/unseen keys, multi-version churn) and ANY batch
    split, the incremental view equals the recompute after every batch."""
    rows = [
        (key, grp, v, "true" if deleted else "false", off)
        for off, (key, grp, v, deleted) in enumerate(ops, start=1)
    ]
    n_batches = data.draw(st.integers(1, min(4, len(rows))), label="n_batches")
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, len(rows) - 1),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
                unique=True,
            ),
            label="cuts",
        )
        if len(rows) > 1
        else []
    )
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        if rows[prev:c]:
            batches.append(rows[prev:c])
        prev = c

    # the minmax view strictly extends the plain one (count/sum logic is
    # shared), so the property runs on it and covers all four aggregates
    v = _viewmm(spark, tmp_path_factory.mktemp("agg_prop"))
    for i, b in enumerate(batches):
        v.process_batch(_batch(spark, b), i)
        _check(v)


def test_start_requires_checkpoint_dir(spark, tmp_path):
    v = _view(spark, tmp_path)
    stream = spark.readStream.format("rate").load()
    import pytest

    with pytest.raises(ValueError, match="checkpoint_dir"):
        v.start(stream)
