"""Driver emulation: what the external correctness gate does, runnable locally.

Builds a PLAIN SparkSession (no engine tuning — the driver won't apply ours),
imports __spark_entry__, smoke-runs entry(), then value-hash-compares every
oracle-backed query against DuckDB at sf0.01. Exit 0 iff everything matches.

Usage: python /root/repo/tests/driver_emulation.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def vhash(pdf) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) for v in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5(str(rows).encode()).hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").appName("driver-emulation").getOrCreate()

    import __spark_entry__ as e

    df = e.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, cols={df.columns}")
    assert n > 0, "entry() must return rows"

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    fails = []
    for name in sorted(qs):
        got = qs[name](spark, sf).toPandas()
        if name in oracles:
            want = con.execute(oracles[name]).fetchdf()
            ok = (
                len(got) == len(want)
                and sorted(got.columns) == sorted(want.columns)
                and vhash(got) == vhash(want)
            )
            print(
                f"{name}: spark={len(got)} oracle={len(want)} "
                f"{'MATCH' if ok else 'MISMATCH'}"
            )
            if not ok:
                fails.append(name)
        else:
            print(f"{name}: rows-only, {len(got)} rows")
    print("FAIL:" if fails else "ALL MATCH", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
