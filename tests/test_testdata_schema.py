"""Schema-drift guard for the driver-generated testdata.

Round 4 post-mortem: the driver regenerated events.parquet with `ts` as
timestamp[us] (previously TIMESTAMP(NANOS)), and the engine's hard-coded
nanos assumption broke 10 driver queries, 15 tests, and the whole bench
at once. This test makes the NEXT regeneration fail as exactly one clear
assertion naming the drifted column, instead of 25 scattered analysis
errors.

Columns with more than one historically-observed on-disk encoding (the
`ts` family) list every encoding the engine supports; everything else is
pinned exactly.
"""

from __future__ import annotations

import os

import pytest

from db_integration_via_kafka_ksql_spark.io import TABLES, epoch_us_col, load_table

# spark dtype strings as reported by DataFrame.dtypes
EXPECTED = {
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "nation": {
        "n_nationkey": {"int"},
        "n_name": {"string"},
        "n_regionkey": {"int"},
    },
    "customer": {
        "c_custkey": {"bigint"},
        "c_name": {"string"},
        "c_nationkey": {"int"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint"},
        "s_name": {"string"},
        "s_nationkey": {"int"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        # date columns have shipped as either NTZ or tz'd micros
        "o_orderdate": {"timestamp_ntz", "timestamp"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_partkey": {"bigint"},
        "l_suppkey": {"bigint"},
        "l_linenumber": {"int"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp_ntz", "timestamp"},
    },
    "events": {
        "event_id": {"bigint"},
        # both encodings the engine supports (io.epoch_us_col):
        # TIMESTAMP(NANOS) read as epoch-nanos bigint, or timestamp[us]
        "ts": {"bigint", "timestamp_ntz", "timestamp"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int"},
    },
}


_SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("table", TABLES)
def test_table_schema_matches_expected(spark, table):
    # all SF dirs: the driver regenerates them independently, so drift can
    # hit one scale factor and not another (correctness runs at sf0.01,
    # bench at sf0.1, most tests at sf0.001 — all three must agree)
    for sf_dir in _SF_DIRS:
        actual = dict(load_table(spark, sf_dir, table).dtypes)
        expected = EXPECTED[table]
        assert set(actual) == set(expected), (
            f"testdata drift in {sf_dir}: {table} columns changed — "
            f"got {sorted(actual)}, expected {sorted(expected)}"
        )
        for col, allowed in expected.items():
            assert actual[col] in allowed, (
                f"testdata drift in {sf_dir}: {table}.{col} is "
                f"{actual[col]!r}, engine supports {sorted(allowed)}; audit "
                f"every consumer (io.epoch_us_col for ts-family columns) "
                f"before widening"
            )


def test_epoch_us_col_handles_both_encodings(spark):
    """Both historical encodings must produce identical epoch-micros:
    a nanos BIGINT (the pre-round-4 read) and a timestamp column."""
    nanos = 1_704_067_798_778_549_123  # 2024-01-01 00:09:58.778549123 UTC
    df_long = spark.createDataFrame([(nanos,)], "ts long")
    got_long = df_long.select(epoch_us_col(df_long, "ts").alias("us")).first()["us"]
    assert got_long == nanos // 1000

    df_ts = spark.sql(
        "SELECT timestamp_ntz'2024-01-01 00:09:58.778549' AS ts"
    )
    got_ts = df_ts.select(epoch_us_col(df_ts, "ts").alias("us")).first()["us"]
    assert got_ts == nanos // 1000 == 1_704_067_798_778_549

    df_bad = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported timestamp encoding"):
        epoch_us_col(df_bad, "ts")


def test_epoch_us_col_ntz_is_session_timezone_independent(spark):
    """epoch_us_col must be self-contained: the NTZ branch's wall-time
    arithmetic cannot shift with spark.sql.session.timeZone, so a
    DataFrame obtained OUTSIDE load_table (createDataFrame, external
    parquet) in a non-UTC session still yields UTC-naive epoch micros."""
    df_ts = spark.sql("SELECT timestamp_ntz'2024-01-01 00:09:58.778549' AS ts")
    want = 1_704_067_798_778_549
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Tokyo", "UTC"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = df_ts.select(epoch_us_col(df_ts, "ts").alias("us")).first()["us"]
            assert got == want, f"shifted under session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_events_ts_epoch_us_matches_duckdb(spark, sf_dir):
    """epoch_us_col must agree with DuckDB's epoch_us(ts) — the oracle's
    view of the same column — on the live data, whatever the encoding."""
    import os

    import duckdb

    raw = load_table(spark, sf_dir, "events")
    got = {
        r["event_id"]: r["ts_us"]
        for r in raw.select("event_id", epoch_us_col(raw, "ts").alias("ts_us"))
        .orderBy("event_id")
        .limit(100)
        .collect()
    }
    path = os.path.join(sf_dir, "events.parquet")
    want = dict(
        duckdb.sql(
            f"SELECT event_id, epoch_us(ts) FROM '{path}' ORDER BY event_id LIMIT 100"
        ).fetchall()
    )
    assert got == want


def test_documents_text_is_pure_ascii():
    """The _cdc_oracle ASCII precondition, made real (r16 review
    finding): chunk_md5 slices the payload as VARCHAR characters, which
    equals byte slicing only while octet_length == length for every
    document. A driver regeneration that ships non-ASCII text must fail
    HERE with a named cause, not as an opaque mm_cdc_chunk_dedup
    hash mismatch."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        bad = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE text IS NULL OR octet_length(text::BLOB) <> length(text)"
        ).fetchall()[0][0]
        assert bad == 0, (
            f"sf{sf}: {bad} non-ASCII/null documents — the CDC oracle's "
            "VARCHAR-slice md5 no longer equals byte slicing; see "
            "queries/multimodal_queries._cdc_oracle"
        )
