"""Plan auditing: machine-checkable scale discipline.

audit.py inspects a DataFrame's physical plan and extracts the properties
that matter at 100 TB — filter pushdown, column pruning, shuffle count,
join strategies, partial aggregation — so tests can assert "this query
keeps the plan we designed" instead of trusting comments.
"""
