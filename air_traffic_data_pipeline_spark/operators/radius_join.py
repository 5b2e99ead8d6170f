"""Radius (range) join: pairs of (grid cell, source) within R metres.

The reference materializes the dense |G|x|S| haversine matrix on the driver
(/root/reference/scripts/functions.py:229-237, 255-258). The naive Spark
translation is ``crossJoin + filter(haversine <= R)`` which Catalyst executes
as BroadcastNestedLoopJoin — fine when one side is tiny, catastrophic at
scale.

``radius_join`` instead bins both sides into square cells of side ~R (in
degrees), explodes the *smaller* side to its 3x3 neighbor bins, equi-joins on
(bin_lat, bin_lon) — a shuffled hash / sort-merge join Catalyst and AQE can
plan, skew-split, and parallelize — then applies the exact haversine
predicate. Semantics are identical to cross+filter (property-tested in
tests/test_radius_join.py); the equi-join prunes the candidate space from
|G|x|S| to ~9x the co-binned pairs.

At 100 TB: both sides shuffle-partition on the bin key; hot bins (airports)
are handled by AQE skew-join splitting (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..constants import DEG2RAD, EARTH_RAD, RAD2DEG
from ..functions.geo import haversine_m


def _bin_cols(lat: Column, lon: Column, bin_deg_lat: float, bin_deg_lon: float):
    return (
        F.floor(lat / F.lit(bin_deg_lat)).cast("long"),
        F.floor(lon / F.lit(bin_deg_lon)).cast("long"),
    )


def radius_join(
    grid: DataFrame,
    sources: DataFrame,
    radius_m: float,
    center_lat: float,
    grid_cols: tuple[str, str] = ("g_lat", "g_lon"),
    src_cols: tuple[str, str] = ("lat", "lon"),
    dist_col: str = "dist_m",
) -> DataFrame:
    """Inner join of grid x sources where haversine(grid, src) <= radius_m.

    Result = all grid columns + all source columns + ``dist_col``.
    ``center_lat`` scales the longitude bin width (degrees of longitude
    shrink by cos(lat)); correct for any region that doesn't straddle a pole.
    """
    import math

    bin_deg_lat = radius_m / EARTH_RAD * RAD2DEG
    bin_deg_lon = radius_m / (EARTH_RAD * math.cos(center_lat * DEG2RAD)) * RAD2DEG

    g_lat, g_lon = (F.col(c) for c in grid_cols)
    s_lat, s_lon = (F.col(c) for c in src_cols)

    gb_lat, gb_lon = _bin_cols(g_lat, g_lon, bin_deg_lat, bin_deg_lon)
    g = grid.withColumn("__bin_lat", gb_lat).withColumn("__bin_lon", gb_lon)

    sb_lat, sb_lon = _bin_cols(s_lat, s_lon, bin_deg_lat, bin_deg_lon)
    # Explode sources (the small side) to their 3x3 neighborhood so any pair
    # within radius shares a bin key.
    s = (
        sources.withColumn("__sb_lat", sb_lat)
        .withColumn("__sb_lon", sb_lon)
        .withColumn("__dlat", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__dlon", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__bin_lat", F.col("__sb_lat") + F.col("__dlat"))
        .withColumn("__bin_lon", F.col("__sb_lon") + F.col("__dlon"))
        .drop("__sb_lat", "__sb_lon", "__dlat", "__dlon")
    )

    joined = g.join(s, on=["__bin_lat", "__bin_lon"], how="inner")
    dist = haversine_m(g_lat, g_lon, s_lat, s_lon)
    return (
        joined.withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= F.lit(radius_m))
        .drop("__bin_lat", "__bin_lon")
    )


def naive_radius_join(
    grid: DataFrame,
    sources: DataFrame,
    radius_m: float,
    grid_cols: tuple[str, str] = ("g_lat", "g_lon"),
    src_cols: tuple[str, str] = ("lat", "lon"),
    dist_col: str = "dist_m",
) -> DataFrame:
    """Reference-shaped crossJoin + filter. For equivalence tests and for
    genuinely tiny source sets where a broadcast nested loop is optimal."""
    g_lat, g_lon = (F.col(c) for c in grid_cols)
    s_lat, s_lon = (F.col(c) for c in src_cols)
    dist = haversine_m(g_lat, g_lon, s_lat, s_lon)
    return (
        grid.crossJoin(F.broadcast(sources))
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= F.lit(radius_m))
    )
