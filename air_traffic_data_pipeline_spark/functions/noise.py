"""Noise-model column expressions (reference functions.py:213-276 as Catalyst
expressions — the reference does this driver-side in Python/NumPy after a
``collect()``; here it stays distributed).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..constants import (
    DB_CLIMB,
    DB_CRUISE,
    DB_DESCENT,
    DB_ON_GROUND,
    REF_ALT,
    VR_THRESHOLD,
)


def phase_db(on_ground: Column, vertical_rate: Column) -> Column:
    """Flight-phase -> source dB classification (functions.py:217-226).

    Null ``vertical_rate`` falls through to the cruise branch, matching the
    engine contract documented in SURVEY.md §7 (the reference's Python would
    raise on None; we define null -> cruise explicitly).
    """
    return (
        F.when(on_ground, F.lit(DB_ON_GROUND))
        .when(vertical_rate < -VR_THRESHOLD, F.lit(DB_DESCENT))
        .when(vertical_rate > VR_THRESHOLD, F.lit(DB_CLIMB))
        .otherwise(F.lit(DB_CRUISE))
    )


def source_alt(on_ground: Column, geo_altitude: Column) -> Column:
    """Source altitude: 27 m when on ground, else geo_altitude (F:219-226)."""
    return F.when(on_ground, F.lit(REF_ALT)).otherwise(geo_altitude)


def phase_db_sql(on_ground: str = "on_ground", vertical_rate: str = "vertical_rate") -> str:
    """DuckDB CASE equivalent of :func:`phase_db` (null vr -> cruise)."""
    from ..plans.sqlutil import dlit

    return (
        f"CASE WHEN {on_ground} THEN {dlit(DB_ON_GROUND)} "
        f"WHEN {vertical_rate} < {dlit(-VR_THRESHOLD)} THEN {dlit(DB_DESCENT)} "
        f"WHEN {vertical_rate} > {dlit(VR_THRESHOLD)} THEN {dlit(DB_CLIMB)} "
        f"ELSE {dlit(DB_CRUISE)} END"
    )


def attenuated_power(src_db: Column, dist_m: Column) -> Column:
    """dB at ground -> linear power: 10^((src_db - 20*log10(dist))/10).

    Mirrors functions.py:263-268. ``dist > 0`` guard replaces NumPy's
    ``where=mask`` log10 masking; a zero distance contributes src_db
    unattenuated (loss 0), the closed-form limit the reference's masked-out
    zeros approximate.
    """
    loss = F.when(dist_m > 0, 20.0 * F.log10(dist_m)).otherwise(F.lit(0.0))
    return F.pow(F.lit(10.0), (src_db - loss) / 10.0)


def db_from_power(sum_power: Column) -> Column:
    """Power sum -> rounded dB: round(10*log10(sum), 2) (functions.py:271)."""
    return F.round(10.0 * F.log10(sum_power), 2)


def attenuated_power_sql(src_db: str, dist_m: str) -> str:
    from ..plans.sqlutil import dlit

    twenty, ten, zero = dlit(20.0), dlit(10.0), dlit(0.0)
    loss = f"(CASE WHEN {dist_m} > 0 THEN {twenty} * log10({dist_m}) ELSE {zero} END)"
    return f"pow({ten}, ({src_db} - {loss}) / {ten})"
