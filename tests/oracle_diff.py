"""Local emulation of the driver's DuckDB-oracle differential gate.

Runs a registered Spark query and its oracle SQL on the same sf dir,
canonicalizes both results (columns sorted by name, rows sorted by
stringified values), and compares **bit-exactly** — the driver uses an
order-insensitive value hash, so anything short of exact equality there
is a failure, and this harness must be at least as strict.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)  # full precision — bit-exactness check
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    con = duckdb_conn(sf_dir)
    want = con.execute(oracle_sql).fetchdf()
    con.close()
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    g, w = canonicalize(got), canonicalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, (
        f"{len(mismatches)}/{len(g)} rows differ; first: spark={mismatches[0][0]} "
        f"oracle={mismatches[0][1]}"
    )
