"""Helpers for generating DuckDB oracle SQL that matches Spark's arithmetic.

DuckDB parses bare numeric literals as DECIMAL and evaluates mixed
decimal/double expressions in decimal — bitwise different from Spark's
double arithmetic. ``dlit`` forces every literal to DOUBLE so both engines
run the identical IEEE-754 operation sequence.
"""

from __future__ import annotations


def dlit(x: float) -> str:
    return f"CAST({float(x)!r} AS DOUBLE)"
