"""Driver-facing query definitions, one module per operator family.

Each module registers callables via ``registry.query(name, oracle_sql)``.
The modules are thin: they wire testdata tables into the operators
package; the operator implementations live in ``operators/``.
"""
