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
predicate. Semantics are identical to cross+filter (equivalence-tested in
tests/test_domain.py); the equi-join prunes the candidate space from
|G|x|S| to ~9x the co-binned pairs.

At 100 TB: both sides shuffle-partition on the bin key; hot bins (airports)
are handled by AQE skew-join splitting (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..constants import DEG2RAD, EARTH_RAD, RAD2DEG
from ..functions.geo import deg2rad, haversine_m, haversine_m_pre  # noqa: F401 (haversine_m: public API kept for callers)


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

    # Hoist the per-side trig (deg2rad, cos φ) to per-ROW projections below
    # the join: identical IEEE values (haversine_m_pre docstring), but the
    # dominant per-PAIR cost drops 2 cos + 4 multiplies.
    g = _with_trig(g, g_lat, g_lon, "__g")
    s = _with_trig(s, s_lat, s_lon, "__s")

    joined = g.join(s, on=["__bin_lat", "__bin_lon"], how="inner")
    # Cheap exact prefilter before the trig: any pair within R satisfies
    # |dlat_deg| <= R-in-degrees (meridional distance never exceeds the
    # great-circle distance, and the bound is latitude-independent), while
    # bin candidates can be up to ~2R apart — this halves the haversine
    # evaluations without touching membership. A longitude analogue is NOT
    # safe to add statically: its bound tightens with cos(lat).
    lat_ok = F.abs(g_lat - s_lat) <= F.lit(bin_deg_lat)
    dist = _pre_dist("__g", "__s")
    return (
        joined.filter(lat_ok)
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= F.lit(radius_m))
        .drop("__bin_lat", "__bin_lon", *_TRIG_COLS("__g"), *_TRIG_COLS("__s"))
    )


def _TRIG_COLS(p: str) -> tuple[str, str, str]:
    return (f"{p}_lat_rad", f"{p}_cos_lat", f"{p}_lon_rad")


def _with_trig(df: DataFrame, lat: Column, lon: Column, p: str) -> DataFrame:
    lat_rad = deg2rad(lat)
    return (
        df.withColumn(f"{p}_lat_rad", lat_rad)
        .withColumn(f"{p}_cos_lat", F.cos(F.col(f"{p}_lat_rad")))
        .withColumn(f"{p}_lon_rad", deg2rad(lon))
    )


def _pre_dist(gp: str, sp: str) -> Column:
    return haversine_m_pre(
        F.col(f"{gp}_lat_rad"),
        F.col(f"{gp}_cos_lat"),
        F.col(f"{gp}_lon_rad"),
        F.col(f"{sp}_lat_rad"),
        F.col(f"{sp}_cos_lat"),
        F.col(f"{sp}_lon_rad"),
    )


def naive_radius_join(
    grid: DataFrame,
    sources: DataFrame,
    radius_m: float,
    grid_cols: tuple[str, str] = ("g_lat", "g_lon"),
    src_cols: tuple[str, str] = ("lat", "lon"),
    dist_col: str = "dist_m",
    broadcast_side: str = "sources",
) -> DataFrame:
    """Reference-shaped crossJoin + filter as a broadcast nested loop.

    Optimal when one side is tiny (broadcast it; the big side streams and
    the cross+filter runs inside whole-stage codegen with zero shuffle).
    Also the equivalence baseline for :func:`radius_join` tests.
    """
    g_lat, g_lon = (F.col(c) for c in grid_cols)
    s_lat, s_lon = (F.col(c) for c in src_cols)
    # same per-side trig hoist as radius_join: cos φ / radians once per row
    # below the (nested-loop) join instead of once per pair
    g = _with_trig(grid, g_lat, g_lon, "__g")
    s = _with_trig(sources, s_lat, s_lon, "__s")
    dist = _pre_dist("__g", "__s")
    if broadcast_side == "grid":
        joined = s.crossJoin(F.broadcast(g))
    else:
        joined = g.crossJoin(F.broadcast(s))
    return (
        joined.withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= F.lit(radius_m))
        .drop(*_TRIG_COLS("__g"), *_TRIG_COLS("__s"))
    )


# Below this many cells the grid side is broadcast and the pair generation
# stays shuffle-free; above it, bin-partitioned equi-join takes over.
BROADCAST_CELL_LIMIT = 250_000


def adaptive_radius_join(
    grid: DataFrame,
    sources: DataFrame,
    radius_m: float,
    center_lat: float,
    grid_cells: int | None = None,
    region_extent_m: float | None = None,
    **kw,
) -> DataFrame:
    """Strategy selection for the radius join.

    - grid side statically known to be small -> broadcast nested loop
      (no shuffle at all; the 'small dim' case).
    - region not much larger than the radius -> bins cannot prune
      (every bin neighbors every other): the equi-join would only add a 9x
      explode, so broadcast the smaller side instead.
    - otherwise -> binned equi-join (the 100 TB path: shuffle both sides
      once on the bin key, AQE splits hot bins).
    """
    # Crossover measured at sf0.1 (local[32]): with extent/R <= ~6 the 3x3
    # neighbor coverage spans most of the region, so binning prunes < 4x
    # while paying a 9x explode + shuffle — the broadcast nested loop wins.
    # Past that, candidate count falls quadratically with extent/R and the
    # equi-join dominates.
    dense_region = (
        region_extent_m is not None and region_extent_m <= 6.0 * radius_m
    )
    if dense_region:
        # bins cannot prune (every bin neighbors every other): broadcast the
        # sources side — the streamed grid side keeps the scan's parallelism.
        # (Broadcasting the grid instead is a trap: the tiny deduped sources
        # exchange AQE-coalesces to ~1 partition and the nested loop runs on
        # one core.)
        return naive_radius_join(grid, sources, radius_m, broadcast_side="sources", **kw)
    return radius_join(grid, sources, radius_m, center_lat, **kw)
