"""Multi-table CDC orchestration (streaming/multitable.py): the
reference's intended star schema — DimProduct / DimCustomer / FactSales
(purge-source-db.sh:20-23,77-83) — as N tables over ONE unified
changelog stream, with Debezium-style transaction metadata spanning
tables.

Covers: 3-table count parity end-to-end through a real checkpointed
streaming query; cross-table txn atomicity under a crash BETWEEN the dim
apply and the fact apply of one txn (replay converges, no partial txn in
the end state); global txn commit ordering across tables; NULL-txn
snapshot rows."""

from __future__ import annotations

import os
import sqlite3

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from db_integration_via_kafka_ksql_spark.sinks.dbapi import DbApiSink
from db_integration_via_kafka_ksql_spark.sources.changelog import (
    file_changelog_stream,
)
from db_integration_via_kafka_ksql_spark.streaming.multitable import (
    MultiTableCdcPipeline,
    TableSpec,
)

# unified envelope: superset of the three tables' columns + discriminator
# + shared txn metadata (the Debezium JSON-envelope union shape)
SCHEMA = StructType(
    [
        StructField("__table", StringType()),
        StructField("txn_id", LongType()),
        StructField("offset", LongType()),
        StructField("__deleted", StringType()),
        StructField("id", LongType()),          # every table's PK
        StructField("name", StringType()),      # dims' payload
        StructField("product_id", LongType()),  # fact FKs + measure
        StructField("customer_id", LongType()),
        StructField("amount", DoubleType()),
    ]
)

DIM_PRODUCT = TableSpec(
    name="dim_product",
    key_cols=["id"],
    order_cols=["offset"],
    columns=["id", "name"],
)
DIM_CUSTOMER = TableSpec(
    name="dim_customer",
    key_cols=["id"],
    order_cols=["offset"],
    columns=["id", "name"],
)
FACT_SALES = TableSpec(
    name="fact_sales",
    key_cols=["id"],
    order_cols=["offset"],
    columns=["id", "product_id", "customer_id", "amount"],
)


def _row(table, txn, offset, deleted="false", **payload):
    base = {
        "__table": table, "txn_id": txn, "offset": offset,
        "__deleted": deleted, "id": None, "name": None,
        "product_id": None, "customer_id": None, "amount": None,
    }
    base.update(payload)
    return base


def _write_feed(directory: str, rows: list[dict], name: str) -> None:
    os.makedirs(directory, exist_ok=True)
    arrays = {
        "__table": pa.array([r["__table"] for r in rows], pa.string()),
        "txn_id": pa.array([r["txn_id"] for r in rows], pa.int64()),
        "offset": pa.array([r["offset"] for r in rows], pa.int64()),
        "__deleted": pa.array([r["__deleted"] for r in rows], pa.string()),
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "name": pa.array([r["name"] for r in rows], pa.string()),
        "product_id": pa.array([r["product_id"] for r in rows], pa.int64()),
        "customer_id": pa.array([r["customer_id"] for r in rows], pa.int64()),
        "amount": pa.array([r["amount"] for r in rows], pa.float64()),
    }
    pq.write_table(pa.table(arrays), f"{directory}/{name}")


class RecordingSink:
    """In-memory keyed sink double: idempotent upsert/delete by key (the
    DbApiSink contract) + an apply log for ordering/atomicity assertions
    + an optional crash fuse (fail the Nth write_batch call). Rows are
    stored as column dicts — the upsert frame carries the table's payload
    columns plus the key/order/deleted columns the pipeline appends."""

    def __init__(self, fail_on_call: int | None = None):
        self.rows: dict[int, dict] = {}
        self.applies: list[list[dict]] = []
        self.calls = 0
        self.fail_on_call = fail_on_call

    def write_batch(self, upserts, delete_keys) -> None:
        self.calls += 1
        if self.fail_on_call is not None and self.calls == self.fail_on_call:
            raise RuntimeError("injected crash between table applies")
        up = [r.asDict() for r in upserts.collect()]
        self.applies.append(up)
        for r in up:
            self.rows[r["id"]] = r
        for r in delete_keys.collect():
            self.rows.pop(r["id"], None)


def _star_pipeline(spark, src_dir, ckpt, sinks):
    specs = []
    for spec, sink in zip((DIM_PRODUCT, DIM_CUSTOMER, FACT_SALES), sinks):
        specs.append(
            TableSpec(
                name=spec.name, key_cols=spec.key_cols,
                order_cols=spec.order_cols, columns=spec.columns, sink=sink,
            )
        )
    return MultiTableCdcPipeline(
        source=file_changelog_stream(spark, src_dir, SCHEMA),
        tables=specs,
        checkpoint_dir=ckpt,
        trigger_seconds=0,
        query_name="test_multitable",
    )


SEED_ROWS = [
    # txn 1: seed both dims
    _row("dim_product", 1, 1, id=1, name="widget"),
    _row("dim_product", 1, 2, id=2, name="gadget"),
    _row("dim_customer", 1, 3, id=10, name="acme"),
    # txn 2: one sale
    _row("fact_sales", 2, 4, id=100, product_id=1, customer_id=10, amount=9.5),
    # txn 3: new product + a sale of it — the cross-table txn
    _row("dim_product", 3, 5, id=3, name="doohickey"),
    _row("fact_sales", 3, 6, id=101, product_id=3, customer_id=10, amount=4.25),
    # txn 4: update then delete product 2 (compacts to a delete)
    _row("dim_product", 4, 7, id=2, name="gadget v2"),
    _row("dim_product", 4, 8, id=2, deleted="true"),
]


def test_three_table_count_parity_through_streaming_query(spark, tmp_path):
    sinks = [RecordingSink(), RecordingSink(), RecordingSink()]
    src = str(tmp_path / "changelog")
    _write_feed(src, SEED_ROWS, "batch0.parquet")
    pipe = _star_pipeline(spark, src, str(tmp_path / "ckpt"), sinks)
    q = pipe.start()
    try:
        q.processAllAvailable()
        # second feed: txn 5 touches customer + fact together
        _write_feed(
            src,
            [
                _row("dim_customer", 5, 9, id=11, name="globex"),
                _row("fact_sales", 5, 10, id=102, product_id=1,
                     customer_id=11, amount=1.0),
            ],
            "batch1.parquet",
        )
        q.processAllAvailable()
    finally:
        q.stop()
    prod, cust, fact = sinks
    # count parity: dims compact to live keys, the deleted product is gone
    assert sorted(prod.rows) == [1, 3]
    assert sorted(cust.rows) == [10, 11]
    assert sorted(fact.rows) == [100, 101, 102]
    assert prod.rows[3]["name"] == "doohickey"
    sale = fact.rows[101]
    assert (sale["product_id"], sale["customer_id"], sale["amount"]) == (3, 10, 4.25)


def test_cross_table_txn_dims_apply_before_facts(spark, tmp_path):
    """Within txn 3 the dim_product apply must precede the fact_sales
    apply (registration order), so the fact's FK target exists first."""
    sinks = [RecordingSink(), RecordingSink(), RecordingSink()]
    src = str(tmp_path / "changelog")
    _write_feed(src, SEED_ROWS, "batch0.parquet")
    pipe = _star_pipeline(spark, src, str(tmp_path / "ckpt"), sinks)
    pipe.process_batch(spark.read.schema(SCHEMA).parquet(src), 0)
    prod, _, fact = sinks
    # global commit order: txn 2's sale (100) applies before txn 3's (101)
    assert [a[0]["id"] for a in fact.applies[:2]] == [100, 101]
    applies_with_p3 = [i for i, a in enumerate(prod.applies)
                      if any(r["id"] == 3 for r in a)]
    assert applies_with_p3, "txn 3's dim apply missing"
    assert prod.rows[3]["name"] == "doohickey"


def test_crash_between_dim_and_fact_apply_converges_on_replay(spark, tmp_path):
    """Kill the pipeline BETWEEN txn 3's dim apply and its fact apply,
    then replay the micro-batch (what the checkpoint does): the end state
    must contain the whole txn in both sinks — no partial txn visible."""
    # dim_product sink call #3 is txn 3's apply (txn1 products, txn2 none,
    # txn3 product): let the dim apply SUCCEED, then crash the fact sink
    # on its txn-3 call (its 2nd call overall: txn2 sale, txn3 sale).
    prod = RecordingSink()
    cust = RecordingSink()
    fact = RecordingSink(fail_on_call=2)
    src = str(tmp_path / "changelog")
    _write_feed(src, SEED_ROWS, "batch0.parquet")
    pipe = _star_pipeline(spark, src, str(tmp_path / "ckpt"), [prod, cust, fact])
    batch = spark.read.schema(SCHEMA).parquet(src)
    with pytest.raises(RuntimeError, match="injected crash"):
        pipe.process_batch(batch, 0)
    # crash window: dim half of txn 3 is in, fact half is not — and txn 4
    # (after txn 3 in commit order) must NOT have been applied
    assert prod.rows[3]["name"] == "doohickey"
    assert 101 not in fact.rows
    assert prod.rows[2]["name"] == "gadget", "txn 4 leaked past the crash"
    # checkpoint replay: the whole micro-batch re-applies in the same
    # global order; keyed upsert/delete make every re-apply idempotent
    fact.fail_on_call = None
    pipe.process_batch(batch, 0)
    assert prod.rows[3]["name"] == "doohickey"
    sale = fact.rows[101]
    assert (sale["product_id"], sale["customer_id"], sale["amount"]) == (3, 10, 4.25)
    assert sorted(prod.rows) == [1, 3]      # txn 4 delete applied
    assert sorted(fact.rows) == [100, 101]


def test_null_txn_snapshot_rows_apply_once(spark, tmp_path):
    """Snapshot events carry no txn metadata (NULL txn_id): they form one
    real apply group and must land, not be dropped."""
    rows = [
        _row("dim_product", None, 1, id=7, name="snap"),
        _row("fact_sales", None, 2, id=200, product_id=7,
             customer_id=10, amount=2.0),
    ]
    sinks = [RecordingSink(), RecordingSink(), RecordingSink()]
    src = str(tmp_path / "changelog")
    _write_feed(src, rows, "snap.parquet")
    pipe = _star_pipeline(spark, src, str(tmp_path / "ckpt"), sinks)
    pipe.process_batch(spark.read.schema(SCHEMA).parquet(src), 0)
    assert sinks[0].rows[7]["name"] == "snap"
    sale = sinks[2].rows[200]
    assert (sale["product_id"], sale["customer_id"], sale["amount"]) == (7, 10, 2.0)


def test_sqlite_sinks_end_to_end_three_tables(spark, tmp_path):
    """Same star, real DbApiSink per table into ONE sqlite database —
    the reference's one-MSSQL-database sink shape — checking count parity
    with auto-created tables."""
    db = str(tmp_path / "star.db")
    mk = lambda table, keys: DbApiSink(  # noqa: E731
        connect=lambda: sqlite3.connect(db), table=table, key_cols=keys
    )
    sinks = [
        mk("dim_product", ["id"]),
        mk("dim_customer", ["id"]),
        mk("fact_sales", ["id"]),
    ]
    src = str(tmp_path / "changelog")
    _write_feed(src, SEED_ROWS, "batch0.parquet")
    pipe = _star_pipeline(spark, src, str(tmp_path / "ckpt"), sinks)
    q = pipe.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    con = sqlite3.connect(db)
    try:
        counts = {
            t: con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
            for t in ("dim_product", "dim_customer", "fact_sales")
        }
        assert counts == {"dim_product": 2, "dim_customer": 1, "fact_sales": 2}
        got = con.execute(
            "SELECT id, product_id, customer_id, amount FROM fact_sales ORDER BY id"
        ).fetchall()
        assert got == [(100, 1, 10, 9.5), (101, 3, 10, 4.25)]
    finally:
        con.close()


def test_global_txn_order_is_lexicographic_over_order_cols(spark):
    """Round-9 ADVICE (medium): the global commit order takes the
    LEXICOGRAPHIC minimum row of the order cols per txn (min over a
    struct), not per-column independent mins — with a Debezium
    ts_ms+LSN envelope, min(ts) and min(lsn) can come from different
    rows of one txn, composing a position belonging to no row and
    misordering two txns. Txn A's rows (ts=1,lsn=9),(ts=2,lsn=1) have
    per-column min (1,1) — before B's (1,5) — but A's true first change
    (1,9) is AFTER it."""
    pipe = MultiTableCdcPipeline(
        source=None,  # type: ignore[arg-type]  # _txn_order needs no stream
        tables=[DIM_PRODUCT],
        order_cols=["ts", "lsn"],
    )
    batch = spark.createDataFrame(
        [("A", 1, 9), ("A", 2, 1), ("B", 1, 5)],
        ["txn_id", "ts", "lsn"],
    )
    assert pipe._txn_order(batch) == ["B", "A"]


def test_duplicate_table_names_rejected(spark):
    with pytest.raises(ValueError, match="duplicate table names"):
        MultiTableCdcPipeline(
            source=None, tables=[DIM_PRODUCT, DIM_PRODUCT]  # type: ignore[arg-type]
        )


class TsqlMergeSink:
    """Sink double executing the GENERATED mssql MERGE/DELETE text
    through the T-SQL interpreter (tests/tsql_interpreter.py) — the
    reference's actual sink dialect (start-sink-connector.sh MERGE
    semantics), behaviorally verified without a server. Rows land in a
    shared TSqlDatabase so the purge script's UNION ALL count-parity
    verification (purge-source-db.sh:77-83) can run against the star."""

    def __init__(self, db, table: str, columns: list[str], keys: list[str]):
        from db_integration_via_kafka_ksql_spark.sinks import ddl

        self.table = db.table(table)
        self.columns = columns
        self.up_sql = ddl.merge_sql(table, columns, keys, "mssql")
        self.dl_sql = ddl.delete_sql(table, keys, "mssql")
        self.keys = keys

    def write_batch(self, upserts, delete_keys) -> None:
        for r in upserts.select(*self.columns).collect():
            self.table.merge_values(self.up_sql, [r[c] for c in self.columns])
        for r in delete_keys.select(*self.keys).collect():
            self.table.delete(self.dl_sql, [r[k] for k in self.keys])


PURGE_VERIFY_SQL = """
SELECT 'dim_product' AS TableName, COUNT(*) AS RecordCount FROM cso.dim_product
UNION ALL
SELECT 'dim_customer', COUNT(*) FROM cso.dim_customer
UNION ALL
SELECT 'fact_sales', COUNT(*) FROM cso.fact_sales;
"""


def test_purge_count_parity_across_star_tsql_twin(spark, tmp_path):
    """The reference's last untested shell verification shape
    (purge-source-db.sh: DELETE every row from every CDC table, then a
    UNION ALL count query proving source and sink agree): seed the star,
    verify non-zero counts match the source's latest-per-key state, purge
    via tombstones (facts before dims, the FK-safe order the script
    enforces with constraint toggles), and verify the SAME query reports
    zero everywhere — deletion propagated through the pipeline, not just
    the source."""
    from tests.tsql_interpreter import TSqlDatabase

    db = TSqlDatabase()
    sinks = [
        TsqlMergeSink(db, "dim_product", DIM_PRODUCT.columns, ["id"]),
        TsqlMergeSink(db, "dim_customer", DIM_CUSTOMER.columns, ["id"]),
        TsqlMergeSink(db, "fact_sales", FACT_SALES.columns, ["id"]),
    ]
    src = str(tmp_path / "changelog")
    _write_feed(src, SEED_ROWS, "batch0.parquet")
    pipe = _star_pipeline(spark, src, str(tmp_path / "ckpt"), sinks)
    q = pipe.start()
    try:
        q.processAllAvailable()
        # post-seed: sink counts == the source's live latest-per-key keys
        assert db.query_counts(PURGE_VERIFY_SQL) == [
            ("dim_product", 2),   # ids 1, 3 (2 was updated then deleted)
            ("dim_customer", 1),  # id 10
            ("fact_sales", 2),    # ids 100, 101
        ]
        # purge txn: tombstone EVERY live key, facts first (FK order)
        purge = [
            _row("fact_sales", 9, 20, deleted="true", id=100),
            _row("fact_sales", 9, 21, deleted="true", id=101),
            _row("dim_product", 9, 22, deleted="true", id=1),
            _row("dim_product", 9, 23, deleted="true", id=3),
            _row("dim_customer", 9, 24, deleted="true", id=10),
        ]
        _write_feed(src, purge, "batch1.parquet")
        q.processAllAvailable()
    finally:
        q.stop()
    # the script's final verification: every table reports zero
    assert db.query_counts(PURGE_VERIFY_SQL) == [
        ("dim_product", 0), ("dim_customer", 0), ("fact_sales", 0),
    ]
    # and the source agrees (count parity, not just empty sinks): the
    # latest-per-key compaction of the full changelog has no live rows
    from db_integration_via_kafka_ksql_spark.operators.cdc import (
        compact_latest,
    )

    log = spark.read.schema(SCHEMA).parquet(src)
    for spec in (DIM_PRODUCT, DIM_CUSTOMER, FACT_SALES):
        live = compact_latest(
            log.filter(F.col("__table") == spec.name),
            key_cols=spec.key_cols,
            order_cols=spec.order_cols,
        ).filter(F.col("__deleted") != "true")
        assert live.count() == 0
