"""Streaming constraint gate (streaming/validation.py): prefix contract
vs the batch operator, both crash interleavings, idle epochs, the
uniqueness refusal, and a live stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from db_integration_via_kafka_ksql_spark.operators import validation as V
from db_integration_via_kafka_ksql_spark.streaming.validation import StreamingValidation

SCHEMA = StructType(
    [
        StructField("fk", LongType()),
        StructField("status", StringType()),
        StructField("amount", DoubleType()),
    ]
)

# batch 0 clean; batch 1 introduces a domain violation + an orphan;
# batch 2 a NULL fk + a negative amount
BATCHES = [
    [(10, "O", 1.0), (11, "F", 2.0)],
    [(10, "X", 3.0), (99, "O", 4.0)],
    [(None, "O", -1.0)],
]


def _checks(ref):
    return [
        V.completeness("fk_complete", "fk"),
        V.in_set("status_domain", "status", ("O", "F")),
        V.predicate("amount_positive", "amount > 0"),
        V.referential("fk_resolves", "fk", ref, "pk"),
    ]


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame([(10,), (11,)], ["pk"])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _st(spark, tmp_path, ref, **kw):
    return StreamingValidation(
        spark,
        checks=_checks(ref),
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
        **kw,
    )


def _epoch_out(st, e):
    return {
        r["constraint"]: r
        for r in st.report().filter(f"epoch = {e}").collect()
    }


def _batch_report(spark, rows, ref):
    return {
        r["constraint"]: r
        for r in V.check_constraints(_df(spark, rows), _checks(ref)).collect()
    }


def test_prefix_contract_and_at_arrival_split(spark, tmp_path, ref):
    """After epoch e: cumulative columns == the batch operator over the
    concatenated prefix, and batch columns == the batch operator over
    the slice alone."""
    st = _st(spark, tmp_path, ref)
    prefix: list = []
    for e, rows in enumerate(BATCHES):
        st.process_batch(_df(spark, rows), e)
        prefix += rows
        want_cum = _batch_report(spark, prefix, ref)
        want_batch = _batch_report(spark, rows, ref)
        got = _epoch_out(st, e)
        assert set(got) == set(want_cum)
        for name, w in want_cum.items():
            g = got[name]
            assert (g["cum_n_rows"], g["cum_n_bad"]) == (w["n_rows"], w["n_bad"]), (e, name)
            assert g["cum_metric_permille"] == w["metric_permille"], (e, name)
            assert g["cum_status"] == w["status"], (e, name)
        for name, w in want_batch.items():
            g = got[name]
            assert (g["n_rows"], g["n_bad"], g["status"]) == (
                w["n_rows"], w["n_bad"], w["status"]
            ), (e, name)
    # the at-arrival alert fired on the dirty slices, clean slice passed
    assert _epoch_out(st, 0)["status_domain"]["status"] == "pass"
    assert _epoch_out(st, 1)["status_domain"]["status"] == "fail"
    assert _epoch_out(st, 1)["fk_resolves"]["status"] == "fail"
    assert _epoch_out(st, 2)["fk_complete"]["status"] == "fail"


def test_replay_both_interleavings(spark, tmp_path, ref):
    st = _st(spark, tmp_path, ref)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    # crash AFTER output commit, BEFORE state commit
    state1 = str(tmp_path / "state" / "epoch=1")
    shutil.rmtree(state1)
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert os.path.isdir(state1)
    # full replay: additive counters must NOT double
    before = {k: dict(v.asDict()) for k, v in _epoch_out(st, 1).items()}
    st.process_batch(_df(spark, BATCHES[1]), 1)
    assert {k: dict(v.asDict()) for k, v in _epoch_out(st, 1).items()} == before
    assert before["fk_resolves"]["cum_n_rows"] == 4
    # fresh instance continues the prefix
    st2 = _st(spark, tmp_path, ref)
    st2.process_batch(_df(spark, BATCHES[2]), 2)
    got = _epoch_out(st2, 2)
    want = _batch_report(spark, BATCHES[0] + BATCHES[1] + BATCHES[2], ref)
    for name, w in want.items():
        assert got[name]["cum_n_bad"] == w["n_bad"], name


def test_idle_epoch_keeps_state(spark, tmp_path, ref):
    st = _st(spark, tmp_path, ref)
    st.process_batch(_df(spark, BATCHES[0]), 0)
    st.process_batch(_df(spark, []), 1)
    assert os.path.isdir(str(tmp_path / "out" / "epoch=1"))
    assert _epoch_out(st, 1) == {}
    st.process_batch(_df(spark, BATCHES[1]), 2)
    assert _epoch_out(st, 2)["fk_complete"]["cum_n_rows"] == 4


def test_uniqueness_refused(spark, tmp_path, ref):
    with pytest.raises(ValueError, match="uniqueness"):
        StreamingValidation(
            spark,
            checks=[V.uniqueness("u", "fk")],
            output_path=str(tmp_path / "o"),
            state_path=str(tmp_path / "s"),
        )


def test_start_requires_checkpoint(spark, tmp_path, ref):
    src = str(tmp_path / "x")
    os.makedirs(src, exist_ok=True)
    st = _st(spark, tmp_path, ref)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        st.start(spark.readStream.schema(SCHEMA).parquet(src))


def test_live_stream_end_to_end(spark, tmp_path, ref):
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    rows = BATCHES[1]
    pq.write_table(
        pa.table(
            {
                "fk": pa.array([r[0] for r in rows], pa.int64()),
                "status": pa.array([r[1] for r in rows]),
                "amount": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        f"{src}/b0.parquet",
    )
    st = _st(spark, tmp_path, ref, checkpoint_dir=str(tmp_path / "ckpt"))
    q = st.start(spark.readStream.schema(SCHEMA).parquet(src))
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if os.path.isdir(str(tmp_path / "out" / "epoch=0")):
                break
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    got = _epoch_out(st, 0)
    assert got["status_domain"]["n_bad"] == 1
    assert got["fk_resolves"]["status"] == "fail"


def test_referential_against_live_cdc_dim_state(spark, tmp_path):
    """Composition: the referential check reads a CDC-maintained dimension
    LIVE (callable ref -> ParquetStateStore.read() re-resolved per epoch).
    An orphan fact in epoch 0 stops being an orphan once the dim row
    arrives; a dim DELETE re-orphans subsequent facts — validation as a
    continuous consumer of the CDC state, not a frozen snapshot."""
    from db_integration_via_kafka_ksql_spark.streaming.state import ParquetStateStore

    store = ParquetStateStore(
        spark,
        str(tmp_path / "dim"),
        key_cols=["pk"],
        order_cols=["off"],
        n_buckets=2,
    )

    def dim_batch(rows):
        return spark.createDataFrame(rows, "pk long, off long, __deleted string")

    store.apply_batch(dim_batch([(10, 0, "false"), (11, 1, "false")]))

    st = StreamingValidation(
        spark,
        checks=[
            V.completeness("fk_complete", "fk"),
            V.referential("fk_resolves", "fk", store.read, "pk"),
        ],
        output_path=str(tmp_path / "out"),
        state_path=str(tmp_path / "state"),
        trigger_seconds=0,
    )
    # epoch 0: fk 99 not yet a dim key -> orphan
    st.process_batch(_df(spark, [(10, "O", 1.0), (99, "O", 2.0)]), 0)
    assert _epoch_out(st, 0)["fk_resolves"]["n_bad"] == 1
    # dim catches up: pk 99 INSERTed; same fact values now resolve
    store.apply_batch(dim_batch([(99, 2, "false")]))
    st.process_batch(_df(spark, [(99, "O", 3.0)]), 1)
    got1 = _epoch_out(st, 1)["fk_resolves"]
    assert got1["n_bad"] == 0
    assert got1["cum_n_bad"] == 1  # epoch-0 orphan stays in the ledger
    # dim DELETE for pk 10 -> new facts against 10 are orphans again
    store.apply_batch(dim_batch([(10, 3, "true")]))
    st.process_batch(_df(spark, [(10, "O", 4.0)]), 2)
    got2 = _epoch_out(st, 2)["fk_resolves"]
    assert got2["n_bad"] == 1
    assert got2["cum_n_bad"] == 2
