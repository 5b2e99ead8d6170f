"""Vector (embedding) column expressions over ``array<float>`` columns.

All math stays JVM-side via higher-order functions (`transform`, `zip_with`,
`aggregate`) — no UDFs. Floats are widened to double element-wise before any
arithmetic so the fold is a deterministic sequence of double operations; the
DuckDB oracles run the identical left-fold (list comprehension +
``list_reduce``), giving bitwise-equal results.

At 100 TB scale these expressions vectorize inside whole-stage codegen; for
very wide vectors a Pandas UDF over Arrow batches becomes competitive, but at
d=64 the builtin HOFs win (no Python round-trip).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product of two double arrays.

    Measured on Spark 4.1 (r13 optimization round): this higher-order
    form OUTPERFORMS a fully unrolled ``a[0]*b[0] + a[1]*b[1] + ...``
    column expression by ~2.5x at 64 dims — the unrolled tree generates
    thousands of lines of null-checked code per dot, blowing fused
    whole-stage methods past the JIT/janino limits (never-compiled
    bytecode, or InternalCompilerException + interpreted fallback), while
    the HOF evaluates as a tight loop. Keep the HOF; do not unroll.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB oracle renderings (identical fold order) -----------------------


def dot_sql(a: str, b: str) -> str:
    prod = f"[{a}[i] * {b}[i] for i in generate_series(1, len({a}))]"
    return f"list_reduce({prod}, (acc, x) -> acc + x)"


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
