"""A minimal T-SQL MERGE interpreter for behavioral verification of the
mssql-dialect statements `sinks/ddl.py` generates (no MSSQL server exists
in this container, and the bundled DuckDB 1.0.0 predates MERGE support).

The point of an INTERPRETER rather than a hand-written expectation: the
semantics executed here are derived entirely from PARSING the generated
SQL text — the ON clause decides matching, the SET clause decides which
columns update from which source columns, the INSERT clause decides the
not-matched row. If the generator ever emits a wrong ON key, swaps a SET
source/target, or drops an INSERT column, the interpreted outcome
diverges from the sqlite ON CONFLICT path and the comparison test fails.

Grammar covered = exactly what `merge_sql(..., "mssql")` and
`staged_merge_sql(..., "mssql")` emit (single-source-row VALUES merge and
stage-table merge), per SQL Server's documented MERGE semantics: each
source row either matches one target row on the ON predicate (UPDATE) or
matches none (INSERT). Duplicate source keys are rejected like the real
server rejects "MERGE cannot UPDATE the same row twice".
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_MERGE_RE = re.compile(
    r"^MERGE (?P<table>\S+) AS t "
    r"USING (?:\(SELECT (?P<select>.+?)\)|(?P<stage>\S+)) AS s "
    r"ON (?P<on>.+?) "
    r"WHEN MATCHED THEN UPDATE SET (?P<set>.+?) "
    r"WHEN NOT MATCHED THEN INSERT \((?P<ins_cols>.+?)\) "
    r"VALUES \((?P<ins_vals>.+?)\);$"
)


@dataclass
class ParsedMerge:
    table: str
    stage: str | None  # None = inline single-row VALUES source
    src_cols: list[str]  # placeholder order for the inline source
    key_cols: list[str]  # from the ON predicate
    sets: list[tuple[str, str]]  # (target col, source col)
    ins_cols: list[str]
    ins_src: list[str]  # source col per insert column


def parse_merge(sql: str) -> ParsedMerge:
    m = _MERGE_RE.match(sql.strip())
    if not m:
        raise ValueError(f"unparseable MERGE statement: {sql!r}")
    src_cols: list[str] = []
    if m.group("select"):
        for part in m.group("select").split(", "):
            ph, _as, col = part.partition(" AS ")
            if ph.strip() != "?":
                raise ValueError(f"expected '?' placeholder, got {ph!r}")
            src_cols.append(col.strip())
    key_cols = []
    for cond in m.group("on").split(" AND "):
        t, _eq, s = cond.partition(" = ")
        tk = t.strip().removeprefix("t.")
        sk = s.strip().removeprefix("s.")
        if tk != sk:
            raise ValueError(f"asymmetric ON condition: {cond!r}")
        key_cols.append(tk)
    sets = []
    for pair in m.group("set").split(", "):
        t, _eq, s = pair.partition(" = ")
        sets.append((t.strip().removeprefix("t."), s.strip().removeprefix("s.")))
    ins_cols = [c.strip() for c in m.group("ins_cols").split(",")]
    ins_src = [
        v.strip().removeprefix("s.") for v in m.group("ins_vals").split(",")
    ]
    return ParsedMerge(
        table=m.group("table"),
        stage=m.group("stage"),
        src_cols=src_cols,
        key_cols=key_cols,
        sets=sets,
        ins_cols=ins_cols,
        ins_src=ins_src,
    )


class TSqlTable:
    """Target-table model: rows keyed by the ON-clause key tuple."""

    def __init__(self) -> None:
        self.rows: dict[tuple, dict] = {}

    def merge(self, parsed: ParsedMerge, source_rows: list[dict]) -> None:
        """Apply MERGE semantics for every source row."""
        seen_keys = set()
        for src in source_rows:
            key = tuple(src[k] for k in parsed.key_cols)
            if key in seen_keys:
                # SQL Server: "The MERGE statement attempted to UPDATE or
                # DELETE the same row more than once" — surface it, don't
                # silently last-write-wins
                raise ValueError(f"duplicate source key in MERGE: {key}")
            seen_keys.add(key)
            target = self.rows.get(key)
            if target is not None:
                for tcol, scol in parsed.sets:
                    target[tcol] = src[scol]
            else:
                self.rows[key] = {
                    c: src[sc] for c, sc in zip(parsed.ins_cols, parsed.ins_src)
                }

    def merge_values(self, sql: str, params: list) -> None:
        """Execute an inline-VALUES merge with DBAPI-style '?' binds."""
        parsed = parse_merge(sql)
        if parsed.stage is not None:
            raise ValueError("merge_values called with a staged MERGE")
        if len(params) != len(parsed.src_cols):
            raise ValueError("bind count != placeholder count")
        self.merge(parsed, [dict(zip(parsed.src_cols, params))])

    def merge_stage(self, sql: str, stage_rows: list[dict]) -> None:
        """Execute a stage-table merge against the given stage contents."""
        parsed = parse_merge(sql)
        if parsed.stage is None:
            raise ValueError("merge_stage called with an inline MERGE")
        self.merge(parsed, stage_rows)

    def delete(self, sql: str, params: list) -> None:
        """Execute `DELETE FROM t WHERE k = ? [AND ...]`."""
        m = re.match(r"^DELETE FROM (\S+) WHERE (.+)$", sql.strip())
        if not m:
            raise ValueError(f"unparseable DELETE: {sql!r}")
        cols = []
        for cond in m.group(2).split(" AND "):
            c, _eq, ph = cond.partition(" = ")
            if ph.strip() != "?":
                raise ValueError(f"expected '?' bind in DELETE: {cond!r}")
            cols.append(c.strip())
        key_by_col = dict(zip(cols, params))
        self.rows = {
            k: r
            for k, r in self.rows.items()
            if any(r.get(c) != v for c, v in key_by_col.items())
        }

    def snapshot(self) -> list[tuple]:
        """Rows as sorted column-ordered tuples for comparison."""
        out = []
        for row in self.rows.values():
            out.append(tuple(row[c] for c in sorted(row)))
        return sorted(out)


_COUNT_ARM_RE = re.compile(
    r"^SELECT\s+'(?P<label>[^']+)'(?:\s+AS\s+(?P<lalias>\w+))?\s*,\s*"
    r"COUNT\(\*\)(?:\s+AS\s+(?P<calias>\w+))?\s+FROM\s+(?P<table>\S+?)\s*$",
    re.IGNORECASE,
)


class TSqlDatabase:
    """Named-table registry + the reference purge script's verification
    query surface (purge-source-db.sh:77-83): a `SELECT '<name>',
    COUNT(*) FROM <table> UNION ALL ...` count-parity probe, executed —
    like the MERGE surface — entirely by PARSING the submitted SQL text,
    so a drifted table name or a dropped UNION arm fails loudly instead
    of silently comparing the wrong counts."""

    def __init__(self) -> None:
        self.tables: dict[str, TSqlTable] = {}

    def table(self, name: str) -> TSqlTable:
        return self.tables.setdefault(name, TSqlTable())

    def query_counts(self, sql: str) -> list[tuple[str, int]]:
        """Execute the UNION ALL count query; returns (label, count)
        rows in statement order. Schema-qualified names (cso.movies)
        resolve by their last path segment, as the sink DDL does."""
        arms = re.split(
            r"\s+UNION\s+ALL\s+", sql.strip().rstrip(";"), flags=re.IGNORECASE
        )
        out: list[tuple[str, int]] = []
        for arm in arms:
            m = _COUNT_ARM_RE.match(arm.strip())
            if not m:
                raise ValueError(f"unparseable count arm: {arm!r}")
            tname = m.group("table").split(".")[-1]
            if tname not in self.tables:
                raise ValueError(f"unknown table in count query: {tname!r}")
            out.append((m.group("label"), len(self.tables[tname].rows)))
        return out
