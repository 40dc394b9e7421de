"""Dialect-aware SQL generation for the upsert/delete sink:
target-table DDL from a Spark schema (auto.create), ALTER for new columns
(auto.evolve), MERGE/upsert and DELETE statements.

Reference parity:
- auto.create=true / auto.evolve=true → create_table_sql / evolve_sql
  (start-sink-connector.sh:67-68)
- insert.mode=upsert, pk.mode=record_key, pk.fields=ID → merge_sql keyed
  on the record key (start-sink-connector.sh:69-71)
- delete.enabled=true → delete_sql on tombstoned keys
  (start-sink-connector.sh:73)
- identifier-case policy: lowercase everywhere (the reference fought
  ksqlDB's uppercasing, README.md:228-239; Spark is case-insensitive, we
  normalize to lowercase once at the boundary).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Spark type → SQL type per dialect. mssql mirrors the source-table types
# the reference replicates (init-db-sql/00-create-movies-db.sql:77-90).
_TYPE_MAP: dict[str, dict[str, str]] = {
    "mssql": {
        "IntegerType": "INT",
        "LongType": "BIGINT",
        "DoubleType": "FLOAT",
        "FloatType": "REAL",
        "StringType": "NVARCHAR(MAX)",
        "BooleanType": "BIT",
        "TimestampType": "DATETIME2",
        "TimestampNTZType": "DATETIME2",
        "DateType": "DATE",
        "BinaryType": "VARBINARY(MAX)",
    },
    "postgres": {
        "IntegerType": "INTEGER",
        "LongType": "BIGINT",
        "DoubleType": "DOUBLE PRECISION",
        "FloatType": "REAL",
        "StringType": "TEXT",
        "BooleanType": "BOOLEAN",
        "TimestampType": "TIMESTAMP",
        "TimestampNTZType": "TIMESTAMP",
        "DateType": "DATE",
        "BinaryType": "BYTEA",
    },
    "duckdb": {
        "IntegerType": "INTEGER",
        "LongType": "BIGINT",
        "DoubleType": "DOUBLE",
        "FloatType": "REAL",
        "StringType": "VARCHAR",
        "BooleanType": "BOOLEAN",
        "TimestampType": "TIMESTAMP",
        "TimestampNTZType": "TIMESTAMP",
        "DateType": "DATE",
        "BinaryType": "BLOB",
    },
    "sqlite": {
        "IntegerType": "INTEGER",
        "LongType": "INTEGER",
        "DoubleType": "REAL",
        "FloatType": "REAL",
        "StringType": "TEXT",
        "BooleanType": "INTEGER",
        "TimestampType": "TEXT",
        "TimestampNTZType": "TEXT",
        "DateType": "TEXT",
        "BinaryType": "BLOB",
    },
}


def sql_type(dt: T.DataType, dialect: str) -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    name = type(dt).__name__
    try:
        return _TYPE_MAP[dialect][name]
    except KeyError:
        raise ValueError(f"no {dialect} mapping for Spark type {name}") from None


def create_table_sql(
    table: str, schema: T.StructType, key_cols: list[str], dialect: str
) -> str:
    """auto.create: CREATE TABLE IF NOT EXISTS derived from the Spark
    schema, PK on the record key (K3)."""
    cols = ", ".join(
        f"{f.name.lower()} {sql_type(f.dataType, dialect)}" for f in schema.fields
    )
    pk = ", ".join(k.lower() for k in key_cols)
    return f"CREATE TABLE IF NOT EXISTS {table} ({cols}, PRIMARY KEY ({pk}))"


def evolve_sql(
    table: str,
    target_cols: set[str],
    schema: T.StructType,
    dialect: str,
) -> list[str]:
    """auto.evolve: ALTER TABLE ADD for columns present in the incoming
    schema but missing from the target (additive only — widenings and
    renames are out of scope, as in the reference's JDBC sink)."""
    stmts = []
    for f in schema.fields:
        if f.name.lower() not in target_cols:
            # bare ADD (no COLUMN keyword): T-SQL rejects 'ADD COLUMN',
            # and postgres/sqlite accept the bare form too
            stmts.append(
                f"ALTER TABLE {table} ADD "
                f"{f.name.lower()} {sql_type(f.dataType, dialect)}"
            )
    return stmts


def merge_sql(
    table: str, columns: list[str], key_cols: list[str], dialect: str, src: str = "?"
) -> str:
    """One-row/batched upsert statement keyed on the record key (K1).

    mssql: MERGE; postgres/sqlite: INSERT ... ON CONFLICT DO UPDATE.
    Placeholders are DBAPI-style '?' per column, in `columns` order.
    """
    cols = [c.lower() for c in columns]
    keys = [k.lower() for k in key_cols]
    non_keys = [c for c in cols if c not in keys]
    col_list = ", ".join(cols)
    placeholders = ", ".join([src] * len(cols))
    if dialect == "mssql":
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        src_cols = ", ".join(f"{src} AS {c}" for c in cols)
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE {table} AS t USING (SELECT {src_cols}) AS s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals});"
        )
    # postgres + sqlite + duckdb share the ON CONFLICT syntax
    conflict = ", ".join(keys)
    sets = ", ".join(f"{c} = excluded.{c}" for c in non_keys)
    return (
        f"INSERT INTO {table} ({col_list}) VALUES ({placeholders}) "
        f"ON CONFLICT ({conflict}) DO UPDATE SET {sets}"
    )


def delete_sql(table: str, key_cols: list[str], dialect: str, src: str = "?") -> str:
    """delete.enabled: DELETE by record key for tombstoned rows (K2)."""
    where = " AND ".join(f"{k.lower()} = {src}" for k in key_cols)
    return f"DELETE FROM {table} WHERE {where}"


def staged_merge_sql(
    table: str, stage_table: str, columns: list[str], key_cols: list[str], dialect: str
) -> str:
    """The cluster-scale MERGE: executors bulk-write the micro-batch to a
    stage table via spark JDBC, then ONE server-side set-based MERGE
    applies it — no per-row round trips (SURVEY §7.3.3)."""
    cols = [c.lower() for c in columns]
    keys = [k.lower() for k in key_cols]
    non_keys = [c for c in cols if c not in keys]
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    if dialect == "mssql":
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE {table} AS t USING {stage_table} AS s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals});"
        )
    conflict = ", ".join(keys)
    sets = ", ".join(f"{c} = excluded.{c}" for c in non_keys)
    col_list = ", ".join(cols)
    # WHERE true disambiguates INSERT ... SELECT from the upsert clause:
    # sqlite REQUIRES it (parse error otherwise — found by the behavioral
    # MERGE tests), postgres documents the same idiom, duckdb accepts it
    return (
        f"INSERT INTO {table} ({col_list}) SELECT {col_list} FROM {stage_table} "
        f"WHERE true ON CONFLICT ({conflict}) DO UPDATE SET {sets}"
    )
