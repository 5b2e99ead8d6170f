"""Geospatial column expressions (all JVM-side builtin functions, no UDFs).

Implements the reference's great-circle math as Catalyst expressions:
 - haversine distance   (/root/reference/scripts/functions.py:229-237)
 - 3-D slant distance   (/root/reference/scripts/functions.py:194-211, dead code
   in the reference but part of its declared surface)

Angle conversion uses explicit ``* DEG2RAD`` literals rather than
``F.radians`` so the identical IEEE multiply runs in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..constants import DEG2RAD, EARTH_RAD, REF_ALT


def deg2rad(col: Column) -> Column:
    return col * F.lit(DEG2RAD)


def haversine_m(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in metres between two (degree) coordinate pairs.

    Mirrors haversine_matrix (reference functions.py:229-237) as a scalar
    expression: the |G|x|S| dense matrix becomes a join + this column.
    """
    la, lb = deg2rad(lat_a), deg2rad(lat_b)
    return haversine_m_pre(la, F.cos(la), deg2rad(lon_a), lb, F.cos(lb), deg2rad(lon_b))


def haversine_m_pre(
    la_rad: Column,
    cos_la: Column,
    lon_a_rad: Column,
    lb_rad: Column,
    cos_lb: Column,
    lon_b_rad: Column,
) -> Column:
    """Haversine from PRE-CONVERTED radians + per-side cosines.

    Identical arithmetic (same operands, same operation order) as
    :func:`haversine_m` — IEEE doubles give the same bits whether cos(φ)
    is evaluated per pair or hoisted to a per-row projection — but inside
    a radius join the per-side terms (2 cos + 4 deg2rad multiplies) are
    computed once per INPUT row instead of once per PAIR. Catalyst does
    not hoist them itself (the projection sits above the join), so the
    radius-join operators feed this variant from per-side columns.
    """
    dlat = la_rad - lb_rad
    dlon = lon_a_rad - lon_b_rad
    s1 = F.sin(dlat / 2)
    s2 = F.sin(dlon / 2)
    # x*x instead of pow(x, 2): a plain IEEE multiply is bitwise identical
    # across engines, pow() implementations may differ in the last ulp.
    a = s1 * s1 + cos_la * cos_lb * (s2 * s2)
    return F.lit(2.0 * EARTH_RAD) * F.asin(F.sqrt(a))


def slant_distance_m(
    gr_lat: Column, gr_lon: Column, pl_lat: Column, pl_lon: Column, alt: Column
) -> Column:
    """3-D distance: haversine horizontal + vertical offset vs REF_ALT (27 m).

    Parity with reference ``distance`` (functions.py:194-211), which hardcodes
    27 at F:210.
    """
    hor = haversine_m(gr_lat, gr_lon, pl_lat, pl_lon)
    ver = F.abs(alt - F.lit(REF_ALT))
    return F.sqrt(hor * hor + ver * ver)


def haversine_sql(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """DuckDB-SQL rendering of :func:`haversine_m` (identical arithmetic)."""
    from ..plans.sqlutil import dlit

    d2r = dlit(DEG2RAD)
    la = f"({lat_a} * {d2r})"
    lb = f"({lat_b} * {d2r})"
    dlat = f"({la} - {lb})"
    dlon = f"(({lon_a} * {d2r}) - ({lon_b} * {d2r}))"
    s1 = f"sin({dlat} / 2)"
    s2 = f"sin({dlon} / 2)"
    a = f"({s1} * {s1} + cos({la}) * cos({lb}) * ({s2} * {s2}))"
    return f"({dlit(2.0 * EARTH_RAD)} * asin(sqrt({a})))"
