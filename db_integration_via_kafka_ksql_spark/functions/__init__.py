"""Reusable column-expression builders (JVM-side, no Python UDFs).

Everything here is built from ``pyspark.sql.functions`` so it stays inside
whole-stage codegen; the same formulas are mirrored in the DuckDB oracle SQL
generators in queries/ — both engines compute identical integer/string math
(md5-based hashing, exact decimal sums), which is what makes bit-exact
differential testing possible.
"""
