"""Declarative data-quality constraint suite (the Deequ/Great-Expectations
shape): a list of expectations compiled into ONE aggregation pass, emitting
a per-constraint report frame.

Reference: none (the reference pipeline has no validation surface — its
`verify` step is a row-count `SELECT COUNT(*)` in `populate-source-db.sh`);
this generalizes that count check into the constraint families a 100 TB
ingest actually gates on before training-data jobs run downstream:

- **completeness(col)** — non-null ratio.
- **uniqueness(col)** — distinct/total ratio (exact).
- **in_set(col, values)** — domain conformance.
- **predicate(sql)** — arbitrary row-level boolean expectation.
- **referential(fk -> ref(pk))** — orphan-free foreign keys.

Scale shape: every row-level constraint (completeness / in_set /
predicate) is a conditional SUM inside the SAME single-scan aggregate —
adding a constraint adds an expression, not a pass. Uniqueness adds
count(distinct) columns, which Spark plans through Expand on the one
scan (each distinct column multiplies the pre-aggregate row stream, the
standard multi-distinct trade — still no second scan). Each referential
constraint is one left join against the distinct reference keys + the
same kind of conditional aggregate; the probe stays a single pass over
the fact frame and the reference side is dimension-sized (broadcast-able
when small; AQE decides, nothing is collected to the driver). The final
report is a STACK of the aggregate's columns — |constraints| rows.

All report math is integer (permille DIV) so the frame is engine-exact
for the DuckDB parity gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One expectation. `kind` in {'completeness', 'uniqueness', 'in_set',
    'predicate', 'referential'}; `min_permille` is the pass bar on the
    good-row ratio (1000 = must hold for every row)."""

    name: str
    kind: str
    column: str | None = None
    values: tuple[str, ...] = ()
    predicate: str | None = None
    # a DataFrame, or a zero-arg callable returning one — the callable
    # form re-resolves at every check_constraints call, which is what a
    # LIVE reference (a CDC-maintained dim state store, whose parquet
    # file listing is snapshotted per-DataFrame) needs under streaming
    ref: object | None = None
    ref_column: str | None = None
    min_permille: int = 1000


def completeness(name: str, column: str, min_permille: int = 1000) -> Constraint:
    return Constraint(name, "completeness", column=column, min_permille=min_permille)


def uniqueness(name: str, column: str, min_permille: int = 1000) -> Constraint:
    return Constraint(name, "uniqueness", column=column, min_permille=min_permille)


def in_set(
    name: str, column: str, values: tuple[str, ...], min_permille: int = 1000
) -> Constraint:
    return Constraint(name, "in_set", column=column, values=values, min_permille=min_permille)


def predicate(name: str, sql: str, min_permille: int = 1000) -> Constraint:
    return Constraint(name, "predicate", predicate=sql, min_permille=min_permille)


def referential(
    name: str,
    column: str,
    ref,  # DataFrame or () -> DataFrame (live reference; see Constraint.ref)
    ref_column: str,
    min_permille: int = 1000,
) -> Constraint:
    return Constraint(
        name, "referential", column=column, ref=ref, ref_column=ref_column,
        min_permille=min_permille,
    )


def _bad_expr(c: Constraint) -> Column:
    """Row-level 'violates the expectation' boolean for one constraint."""
    if c.kind == "completeness":
        return F.col(c.column).isNull()
    if c.kind == "in_set":
        if not c.values:
            # empty domain: no value conforms (and `IN ()` isn't SQL)
            return F.lit(True)
        lits = ", ".join("'" + v.replace("'", "''") + "'" for v in c.values)
        # NULL is a domain violation too: conformance is on the row
        return ~F.expr(f"coalesce({c.column} IN ({lits}), false)")
    if c.kind == "predicate":
        return ~F.expr(f"coalesce(({c.predicate}), false)")
    raise ValueError(f"not a row-level constraint: {c.kind}")


def check_constraints(df: DataFrame, checks: list[Constraint]) -> DataFrame:
    """Evaluate every constraint; return one report row per constraint:
    (constraint, n_rows, n_bad, metric_permille, status).

    metric_permille = good rows per thousand (integer DIV — exact);
    status = 'pass' iff metric_permille >= the constraint's min bar.
    Empty input passes every constraint vacuously at metric 1000; an
    empty `checks` list yields an empty (typed) report, so generated
    suites compose without a special case.
    """
    if not checks:
        return df.sparkSession.createDataFrame(
            [],
            "constraint string, n_rows bigint, n_bad bigint, "
            "metric_permille bigint, status string",
        )
    row_level = [c for c in checks if c.kind in ("completeness", "in_set", "predicate")]
    unique = [c for c in checks if c.kind == "uniqueness"]
    refs = [c for c in checks if c.kind == "referential"]
    if len({c.name for c in checks}) != len(checks):
        raise ValueError("constraint names must be unique")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in row_level:
        aggs.append(
            # coalesce: SUM over an empty frame is NULL, not 0
            F.coalesce(F.sum(F.when(_bad_expr(c), 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"_b_{c.name}")
        )
    for c in unique:
        # bad = duplicate occurrences beyond the first of each value
        # (count(col) - countDistinct ignores NULLs on both terms)
        aggs.append(
            (F.count(F.col(c.column)) - F.count_distinct(F.col(c.column)))
            .cast("bigint")
            .alias(f"_b_{c.name}")
        )
    one = df.agg(*aggs)

    parts: list[DataFrame] = []
    ordered = [c for c in checks if c.kind != "referential"]
    if ordered:
        stack = ", ".join(
            f"'{c.name}', _b_{c.name}" for c in ordered
        )
        parts.append(
            one.selectExpr(
                f"stack({len(ordered)}, {stack}) AS (constraint, n_bad)", "_n AS n_rows"
            ).select("constraint", "n_rows", "n_bad")
        )
    for c in refs:
        ref_df = c.ref() if callable(c.ref) else c.ref
        keys = ref_df.select(
            F.col(c.ref_column).alias("_rk"), F.lit(1).alias("_present")
        ).dropDuplicates(["_rk"])
        joined = df.join(keys, F.col(c.column) == F.col("_rk"), "left")
        parts.append(
            joined.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                # an orphan is a NON-NULL fk with no reference row;
                # NULL fks are completeness's business, not referential's
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(c.column).isNotNull() & F.col("_present").isNull(), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_bad"),
            ).select(F.lit(c.name).alias("constraint"), "n_rows", "n_bad")
        )

    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    bars = F.create_map(
        *[x for c in checks for x in (F.lit(c.name), F.lit(c.min_permille))]
    )
    return report.select(
        "constraint",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        F.expr("CASE WHEN n_rows = 0 THEN 1000 ELSE (n_rows - n_bad) * 1000 DIV n_rows END")
        .cast("bigint")
        .alias("metric_permille"),
    ).withColumn(
        "status",
        F.when(
            F.col("metric_permille") >= bars[F.col("constraint")], F.lit("pass")
        ).otherwise(F.lit("fail")),
    )
