"""md5-derived integer hashing, rendered identically in Spark and DuckDB.

``hex4_to_int`` maps 4 hex chars of a digest to an int in [0, 65536) with
plain strpos arithmetic — chosen because DuckDB has no conv(); the same
expression tree evaluates bit-identically in both engines, which is what
makes every hash-derived query (simhash lanes, bloom positions, count-min
cells, split gates) value-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HEXDIGITS = "0123456789abcdef"


def hex4_to_int(col: Column, offset: int = 0) -> Column:
    """4 hex chars of an md5 starting at ``offset`` -> int in [0, 65536)."""
    val = F.lit(0)
    for i in range(4):
        ch = F.substring(col, offset + i + 1, 1)
        val = val + (F.instr(F.lit(HEXDIGITS), ch) - 1) * (16 ** (3 - i))
    return val


def hex4_to_int_sql(expr: str, offset: int = 0) -> str:
    terms = [
        f"(strpos('{HEXDIGITS}', substr({expr}, {offset + i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"
