"""Vector (embedding) expression builders: quantization, exact integer dot
products, cosine, and deterministic hyperplane-LSH bucketing.

Exactness strategy: similarity *scores* used for the DuckDB parity gate are
computed on 1024-quantized integer embeddings — `qdot` is a BIGINT, so
results are bit-identical across engines and across partitionings (float
accumulation order never enters). The float cosine is also provided for
callers that want it, but oracle-gated queries rank by qdot.

Scale strategy: brute-force top-k is the baseline (fine when the query set
is small and broadcast); hyperplane LSH gives the bucketed path — both
sides of a candidate join hash to the same deterministic bucket id, so the
join co-partitions by bucket and never materializes the full cross
product. Hyperplane signs derive from md5(plane, dim) — no RNG state to
ship, any executor recomputes them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1024  # quantization scale: q = floor(double(x) * 1024)


def quantize(vec: str = "embedding") -> Column:
    """array<float> → array<bigint>, exact in both engines:
    float→double cast is exact; double*1024 and floor are IEEE-identical."""
    return F.expr(
        f"transform({vec}, x -> cast(floor(cast(x as double) * {QUANT}) as bigint))"
    )


def qdot(a: str, b: str) -> Column:
    """Exact integer dot product of two quantized vectors (bigint).
    |q| <= ~4096 per dim, 64 dims → |qdot| <= 2^36 — no overflow."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0 as bigint), (acc, v) -> acc + v)"
    )


def qnorm2(a: str) -> Column:
    """Exact squared L2 norm of a quantized vector (bigint)."""
    return F.expr(
        f"aggregate({a}, cast(0 as bigint), (acc, x) -> acc + x * x)"
    )


def cosine(a: str, b: str) -> Column:
    """Float cosine on the raw vectors (double math, sequential fold).
    Not used in oracle-gated outputs — see module docstring."""
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )
    na = (
        f"aggregate({a}, cast(0 as double), "
        f"(acc, x) -> acc + cast(x as double) * cast(x as double))"
    )
    nb = (
        f"aggregate({b}, cast(0 as double), "
        f"(acc, x) -> acc + cast(x as double) * cast(x as double))"
    )
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")


def hyperplane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 weight for (plane, dim), derived from md5 parity.
    Python-side constant generation — the weights are baked into the
    generated expression, so Spark and DuckDB share the exact planes."""
    import hashlib

    h = hashlib.md5(f"p{plane}d{dim}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 1 else -1


def lsh_bucket(vec: str, n_planes: int, dims: int) -> Column:
    """Hyperplane-LSH bucket id (0 .. 2^n_planes-1) of a quantized vector.

    bit p = 1 iff sum_i sign(p,i) * q_i > 0. All-integer, portable.
    At scale: bucket is computed scan-side (no shuffle), and the candidate
    join keys on it — expected bucket occupancy n/2^p keeps the pair count
    ~n²/2^p instead of n².

    The per-plane sum is a zip_with fold against a constant sign array, not
    dims unrolled element_at terms: the unrolled form generated a ~400-node
    expression tree whose whole-stage-codegen compile cost ~7 s (janino) on
    first action per join side; the fold form compiles in milliseconds and
    evaluates the same integer math.
    """
    terms = []
    for p in range(n_planes):
        signs = [hyperplane_sign(p, i) for i in range(dims)]
        arr = "array(" + ",".join(str(sg) for sg in signs) + ")"
        s = (
            f"aggregate(zip_with({vec}, {arr}, (x, s) -> x * s), "
            f"cast(0 as bigint), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN ({s}) > 0 THEN {1 << p} ELSE 0 END)")
    return F.expr(" + ".join(terms))


def quantize_sql_duckdb(vec: str = "embedding") -> str:
    """The DuckDB mirror of `quantize` — the single definition every
    query module's oracle interpolates, so the two engines' quantization
    can never drift apart silently."""
    return (
        f"list_transform({vec}, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
    )


def lsh_bucket_sql_duckdb(vec: str, n_planes: int, dims: int) -> str:
    """The DuckDB mirror of lsh_bucket (1-based list indexing matches)."""
    terms = []
    for p in range(n_planes):
        signs = [hyperplane_sign(p, i) for i in range(dims)]
        s = " + ".join(
            f"({'' if sg > 0 else '-'}{vec}[{i + 1}])" for i, sg in enumerate(signs)
        )
        terms.append(f"(CASE WHEN ({s}) > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def lit_bigint_array(values: list[int]) -> str:
    """Spark-SQL literal `array(1L,2L,...)` fragment for baking small
    integer vectors (centroids, PQ codewords) into scan-side expressions
    — the shared codegen idiom of operators/kmeans.py and the IVF-PQ
    path in operators/similarity.py (one definition so the 'L'-suffix /
    fold conventions cannot drift between them)."""
    return "array(" + ",".join(f"{x}L" for x in values) + ")"
