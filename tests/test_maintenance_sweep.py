"""Round-15 maintenance sweep (r14 verdict Next #6 carried through the
whole stream surface): every epochdir-backed stateful stream now takes
`maintenance=MaintenancePolicy(...)` — this suite drives each newly
wired stream through a long busy+idle run and pins the two contract
halves:

1. BOUNDED LISTINGS: data-bearing state epochs stay O(keep_last) +
   cadence slack instead of one per trigger;
2. READER EQUIVALENCE: a maintained stream's public readers return the
   bit-identical rows a maintenance-free twin returns on the same input
   (maintenance never changes reader-visible ROWS — the module
   contract). The witness-TTL streams (neardup/semdedup) are the
   documented exception: expiry deliberately trades re-admission for
   bounded state, so they pin the expiry effect instead.

StreamingRobustOutlier / decay / anomaly / vectorindex and friends were
wired in r13/r14 and carry their own tests (test_maintenance.py,
test_streaming_decay.py); this file covers the r15 stragglers: drift,
mixtracker, validation, keyaudit, asof, components, neardup, semdedup.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from db_integration_via_kafka_ksql_spark.streaming import epochdir
from db_integration_via_kafka_ksql_spark.streaming.maintenance import (
    MaintenancePolicy,
)

POLICY = MaintenancePolicy(every_n_epochs=4, state_keep_last=2)
N_EPOCHS = 13


def _data_epochs(path, batch_col="epoch"):
    if not os.path.isdir(path):
        return []
    return [
        e
        for e in epochdir.list_epochs(path, batch_col)
        if any(
            n.endswith(".parquet")
            for n in os.listdir(epochdir.partition_dir(path, batch_col, e))
        )
    ]


def _drive_twins(spark, maintained, plain, mk_df, batches):
    """Feed both streams the same epochs (idle every 3rd)."""
    for e in range(N_EPOCHS):
        rows = [] if e % 3 == 2 else batches[e % len(batches)]
        df = mk_df(spark, rows)
        maintained.process_batch(df, e)
        plain.process_batch(mk_df(spark, rows), e)


def _same(a, b):
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and len(ra) > 0
    return len(ra)


def _assert_bounded(state_path):
    data = _data_epochs(state_path)
    # keep_last=2 full copies + up-to-a-cadence-gap of fresh epochs
    # (ticks can land on idle epochs, which skip maintenance)
    assert 0 < len(data) <= 2 + POLICY.every_n_epochs, data


# -- drift --------------------------------------------------------------


def test_drift_maintained_twin_equivalence(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.streaming.drift import (
        StreamingQualityDrift,
    )

    good = " ".join(f"w{i}" for i in range(60))
    batches = [
        [(1, good, "a"), (2, good, "b")],
        [(3, "the the the the", "a")],
    ]

    def mk(spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def st(tag, **kw):
        return StreamingQualityDrift(
            spark,
            output_path=str(tmp_path / f"out{tag}"),
            state_path=str(tmp_path / f"state{tag}"),
            trigger_seconds=0,
            **kw,
        )

    m, p = st("m", maintenance=POLICY), st("p")
    _drive_twins(spark, m, p, mk, batches)
    _assert_bounded(str(tmp_path / "statem"))
    _same(m.drift(), p.drift())
    _same(m._prior_counts(10**9), p._prior_counts(10**9))


# -- mixtracker ----------------------------------------------------------


def test_mixtracker_maintained_twin_equivalence(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.streaming.mixtracker import (
        StreamingMixTracker,
    )

    batches = [
        [("web", "a b c d"), ("code", "x y z")],
        [("web", "g h i j k")],
    ]

    def mk(spark, rows):
        return spark.createDataFrame(rows, "source string, text string")

    def st(tag, **kw):
        return StreamingMixTracker(
            spark,
            plan={"web": 12, "code": 6},
            output_path=str(tmp_path / f"out{tag}"),
            state_path=str(tmp_path / f"state{tag}"),
            trigger_seconds=0,
            **kw,
        )

    m, p = st("m", maintenance=POLICY), st("p")
    _drive_twins(spark, m, p, mk, batches)
    _assert_bounded(str(tmp_path / "statem"))
    _same(m.report(), p.report())
    _same(m._prior(10**9), p._prior(10**9))


# -- validation ----------------------------------------------------------


def test_validation_maintained_twin_equivalence(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.operators import validation as V
    from db_integration_via_kafka_ksql_spark.streaming.validation import (
        StreamingValidation,
    )

    ref = spark.createDataFrame([(10,), (11,)], ["pk"])
    checks = [
        V.completeness("fk_complete", "fk"),
        V.in_set("status_domain", "status", ("O", "F")),
        V.predicate("amount_positive", "amount > 0"),
        V.referential("fk_resolves", "fk", ref, "pk"),
    ]
    batches = [
        [(10, "O", 1.0), (11, "F", 2.0)],
        [(10, "X", 3.0), (99, "O", 4.0), (None, "O", -1.0)],
    ]

    def mk(spark, rows):
        return spark.createDataFrame(
            rows, "fk long, status string, amount double"
        )

    def st(tag, **kw):
        return StreamingValidation(
            spark,
            checks=checks,
            output_path=str(tmp_path / f"out{tag}"),
            state_path=str(tmp_path / f"state{tag}"),
            trigger_seconds=0,
            **kw,
        )

    m, p = st("m", maintenance=POLICY), st("p")
    _drive_twins(spark, m, p, mk, batches)
    _assert_bounded(str(tmp_path / "statem"))
    _same(m.report(), p.report())
    _same(m._prior(10**9), p._prior(10**9))


# -- keyaudit ------------------------------------------------------------


def test_keyaudit_maintained_twin_equivalence(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.streaming.keyaudit import (
        StreamingKeyAudit,
    )

    batches = [
        [(1, "a"), (2, "b"), (2, "c")],
        [(2, "d"), (3, "e"), (None, "i")],
        [(1, "f"), (4, "h")],
    ]

    def mk(spark, rows):
        return spark.createDataFrame(rows, "id long, v string")

    def st(tag, **kw):
        return StreamingKeyAudit(
            spark,
            key_col="id",
            output_path=str(tmp_path / f"out{tag}"),
            state_path=str(tmp_path / f"state{tag}"),
            trigger_seconds=0,
            **kw,
        )

    m, p = st("m", maintenance=POLICY), st("p")
    _drive_twins(spark, m, p, mk, batches)
    _assert_bounded(str(tmp_path / "statem"))
    _same(m.ledger(), p.ledger())
    _same(m._seen(10**9), p._seen(10**9))
    assert m.duplicate_rows_total() == p.duplicate_rows_total()


# -- asof ----------------------------------------------------------------


def test_asof_maintained_twin_equivalence(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.streaming.asof import (
        StreamingAsof,
    )

    batches = [
        [("dim", None, 1, 10, 100), ("fact", 1, 1, 15, None)],
        [("dim", None, 1, 20, 111), ("fact", 4, 1, 25, None)],
        [("fact", 6, 2, 50, None)],
    ]

    def mk(spark, rows):
        return spark.createDataFrame(
            rows,
            "side string, fact_id long, key long, t long, value long",
        )

    def st(tag, **kw):
        return StreamingAsof(
            spark,
            output_path=str(tmp_path / f"out{tag}"),
            state_path=str(tmp_path / f"state{tag}"),
            trigger_seconds=0,
            **kw,
        )

    m, p = st("m", maintenance=POLICY), st("p")
    _drive_twins(spark, m, p, mk, batches)
    _assert_bounded(str(tmp_path / "statem"))
    _same(m.enriched(), p.enriched())
    _same(m._prior_versions(10**9), p._prior_versions(10**9))


# -- components (state-only stream) ---------------------------------------


def test_components_maintained_twin_equivalence(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.streaming.components import (
        StreamingComponents,
    )

    batches = [
        [(1, 2), (10, 11)],
        [(2, 3)],
        [(20, 21)],
    ]

    def mk(spark, rows):
        return spark.createDataFrame(rows, "src long, dst long")

    def st(tag, **kw):
        return StreamingComponents(
            spark,
            state_path=str(tmp_path / f"cc{tag}"),
            trigger_seconds=0,
            **kw,
        )

    m, p = st("m", maintenance=POLICY), st("p")
    _drive_twins(spark, m, p, mk, batches)
    _assert_bounded(str(tmp_path / "ccm"))
    _same(m.labels(), p.labels())


# -- witness-TTL streams: expiry at the cadence is the DOCUMENTED trade ---


def test_neardup_policy_ttl_expires_witnesses_at_cadence(spark, tmp_path):
    """Distinct docs each epoch: without TTL the witness state grows by
    every doc's bands forever; with witness_ttl_epochs=2 on a 2-epoch
    cadence the maintained state stays bounded and old witnesses are
    gone (re-admission is the documented trade — module docstring)."""
    from db_integration_via_kafka_ksql_spark.streaming.neardup import (
        StreamingNearDup,
    )

    def mk(spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def st(tag, **kw):
        return StreamingNearDup(
            spark,
            dataset_path=str(tmp_path / f"corpus{tag}"),
            state_path=str(tmp_path / f"state{tag}"),
            trigger_seconds=0,
            **kw,
        )

    m = st("m", maintenance=MaintenancePolicy(
        every_n_epochs=2, witness_ttl_epochs=2))
    p = st("p")
    for e in range(8):
        rows = [(100 * e + i, f"u{e} v{e} w{e} x{e} doc{i}") for i in range(3)]
        m.process_batch(mk(spark, rows), e)
        p.process_batch(mk(spark, rows), e)
    m_state = m.state.read().count()
    p_state = p.state.read().count()
    assert 0 < m_state < p_state
    # accepted corpora agree: expiry only re-admits FUTURE near-dups of
    # expired docs; these batches are cross-epoch distinct so none arise
    assert sorted(r["doc_id"] for r in m.read_corpus().collect()) == sorted(
        r["doc_id"] for r in p.read_corpus().collect()
    )


def test_semdedup_policy_ttl_expires_witnesses_at_cadence(spark, tmp_path):
    from db_integration_via_kafka_ksql_spark.streaming.semdedup import (
        StreamingSemDedup,
    )

    codebook = [[1024, 0, 0, 0], [0, 1024, 0, 0]]

    def mk(spark, rows):
        return spark.createDataFrame(
            rows, "vec_id int, embedding array<float>"
        )

    def st(tag, **kw):
        return StreamingSemDedup(
            spark,
            dataset_path=str(tmp_path / f"corpus{tag}"),
            state_path=str(tmp_path / f"state{tag}"),
            centroids=codebook,
            threshold_pct=95,
            trigger_seconds=0,
            **kw,
        )

    m = st("m", maintenance=MaintenancePolicy(
        every_n_epochs=2, witness_ttl_epochs=2))
    p = st("p")
    for e in range(8):
        # one orthogonal-ish fresh vector per epoch: never a near-dup
        rows = [
            (10 * e + i, [1.0, float(e + 1) * 0.1 + i, 0.0, 0.0])
            for i in range(2)
        ]
        m.process_batch(mk(spark, rows), e)
        p.process_batch(mk(spark, rows), e)
    m_state = m.state.read().count()
    p_state = p.state.read().count()
    assert 0 < m_state < p_state
