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
    """4 hex chars of an md5 starting at ``offset`` -> int in [0, 65536).

    Spark side only: ``conv(substr, 16, 10)`` — one base-16 parse instead
    of the four substring+instr probes the value is DEFINED by (and that
    the DuckDB oracle, which has no conv(), still evaluates). Bitwise
    identical on any lowercase-hex input (verified exhaustively over the
    md5 alphabet); measurably cheaper per row and, more importantly, it
    collapses the generated code for hash-heavy stages (the 64-replicate
    bootstrap inlined 64 of these trees into one whole-stage method).
    """
    return F.conv(F.substring(col, offset + 1, 4), 16, 10).cast("int")


def hex4_to_int_sql(expr: str, offset: int = 0) -> str:
    terms = [
        f"(strpos('{HEXDIGITS}', substr({expr}, {offset + i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"
