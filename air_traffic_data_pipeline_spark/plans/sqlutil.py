"""Helpers for generating DuckDB oracle SQL that matches Spark's arithmetic.

DuckDB parses bare numeric literals as DECIMAL and evaluates mixed
decimal/double expressions in decimal — bitwise different from Spark's
double arithmetic. ``dlit`` forces every literal to DOUBLE so both engines
run the identical IEEE-754 operation sequence.
"""

from __future__ import annotations


def dlit(x: float) -> str:
    # append an exponent so DuckDB PARSES the literal as DOUBLE: a bare
    # decimal parses as DECIMAL first and the DECIMAL->DOUBLE cast can be
    # 1 ulp off the correctly-rounded value for 16-digit literals
    # (measured: CAST(0.9238795325112867 AS DOUBLE) -> ...868)
    r = repr(float(x))
    if "e" not in r and "E" not in r and "." in r:
        r += "e0"
    return f"CAST({r} AS DOUBLE)"
