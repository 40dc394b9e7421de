"""Cross-engine deterministic transcendental math from basic IEEE ops.

Spark (JVM ``Math.log``) and DuckDB (libm ``ln``) do not guarantee
bit-identical results for transcendental functions — each is merely
within 1 ulp of the true value, so the two engines can disagree in the
last bit.  Everything in this repo's oracle-parity surface is gated on
bit-identical values, so any operator that needs a logarithm (HyperLogLog
linear counting, BM25 idf) uses THIS construction instead: a fixed-order
sequence of +,-,*,/ on exact operands.  IEEE 754 requires those four ops
to be correctly rounded, so given the same literal constants and the same
association order, Spark and DuckDB produce the same 64 bits.

Construction (for x >= 1):
  e  = floor(log2(x))          -- integer, via bit length of floor(x)
  m  = x / 2^e                 -- in [1, 2); division by 2^e is exact
  t  = (m - 1) / (m + 1)       -- |t| < 1/3
  ln(m) = 2 * (t + t^3/3 + t^5/5 + t^7/7 + t^9/9)   (arctanh series)
  ln(x) = ln(2) * e + ln(m)

Truncation error of the 5-term series at |t| < 1/3 is ~2*t^11/11 < 2e-6
absolute — far below what estimation (HLL) or ranking (BM25) can notice,
and constant across engines, which is the property that matters.

Both dialects are generated from one template so the association order
cannot drift apart.  Reference parity target: the reference engine's
ksqlDB scalar functions (reference: deploy-ksql-cli.sh queries use only
arithmetic; logs appear in no reference query, so this helper serves the
repo's LLM-pipeline extensions only).
"""

from __future__ import annotations

def dlit(x: float) -> str:
    """A double literal BOTH SQL dialects parse as DOUBLE.

    Plain decimal literals (``0.333…``) are DECIMAL in Spark SQL and
    DuckDB alike — decimal arithmetic then follows dialect-specific
    scale/overflow rules and the two engines diverge. Exponent-notation
    literals are DOUBLE in both parsers, and repr() round-trips the
    exact bits through any correctly-rounded parser."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s or "inf" in s or "nan" in s) else s + "e0"


# Literal constants: repr() of the exact doubles, embedded verbatim in
# both dialects. Correctly-rounded parsers (JVM + DuckDB) round-trip them.
_LN2 = dlit(0.6931471805599453)
_C3 = dlit(1.0 / 3.0)
_C5 = dlit(1.0 / 5.0)
_C7 = dlit(1.0 / 7.0)
_C9 = dlit(1.0 / 9.0)


def det_ln_sql(x: str, dialect: str) -> str:
    """SQL text computing the deterministic ln of expression ``x``.

    Domain: 1 <= x < 2^63 (floor(x) must fit BIGINT for the exponent
    extraction; above that Spark nulls the cast where DuckDB errors).
    Every caller in this repo is structurally bounded: HLL linear
    counting (m/V <= 2^p), BM25 idf (arg <= N+1), PMI lift (<= N),
    weighted-sample priorities (2^60/(h+1) <= 2^60).

    dialect: 'spark' (use inside F.expr/selectExpr) or 'duckdb'.
    The expression references ``x`` several times; both Catalyst and
    DuckDB subsume the repeats via common-subexpression elimination.
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect}")
    xd = f"CAST({x} AS DOUBLE)"
    e = f"(length(bin(CAST(floor({xd}) AS BIGINT))) - 1)"
    if dialect == "spark":
        two_e = f"shiftleft(CAST(1 AS BIGINT), {e})"
    else:
        two_e = f"(CAST(1 AS BIGINT) << {e})"
    m = f"({xd} / CAST({two_e} AS DOUBLE))"
    t = f"(({m} - 1.0e0) / ({m} + 1.0e0))"
    t2 = f"({t} * {t})"
    # Horner form; parenthesized so both parsers build the same tree.
    series = (
        f"({t} * (1.0e0 + {t2} * ({_C3} + {t2} * "
        f"({_C5} + {t2} * ({_C7} + {t2} * {_C9})))))"
    )
    return f"({_LN2} * CAST({e} AS DOUBLE) + 2.0e0 * {series})"
