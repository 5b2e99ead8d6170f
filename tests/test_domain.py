"""M0 domain pipeline tests: flagship smoke, golden noise math, dedup
determinism, radius-join equivalence (SURVEY.md §5.2-5.4)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from air_traffic_data_pipeline_spark.constants import EARTH_RAD, NANTES_LAT, NANTES_LON, R_MAX
from air_traffic_data_pipeline_spark.functions.geo import haversine_m
from air_traffic_data_pipeline_spark.operators.dedup import last_wins_dedup
from air_traffic_data_pipeline_spark.operators.grid import gen_grid, grid_bounds
from air_traffic_data_pipeline_spark.operators.radius_join import naive_radius_join, radius_join
from air_traffic_data_pipeline_spark.plans.domain import flagship_noise_grid

SF_SMOKE = "/root/testdata/sf0.001"


def test_flagship_smoke(spark):
    df = flagship_noise_grid(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"g_lat", "g_lon", "db", "weight"}
    for r in rows[:50]:
        assert 0 < r.db <= 130.0
        assert 0 < r.weight <= 1.0


def test_grid_shape_and_bounds(spark):
    g = gen_grid(spark, NANTES_LAT, NANTES_LON, 200.0, 10)
    assert g.count() == 21 * 21
    b = grid_bounds(g).collect()[0]
    # reference stepslat: +/- n*step metres -> degrees (functions.py:134-147)
    expect_dlat = math.degrees(10 * 200.0 / EARTH_RAD)
    assert b.lamax - b.lamin == pytest.approx(2 * expect_dlat, abs=2e-6)
    assert b.lamin < NANTES_LAT < b.lamax
    assert b.lomin < NANTES_LON < b.lomax


def test_haversine_golden(spark):
    # golden from the reference's own formula computed with numpy (F:229-237)
    la, lo, lb, lo2 = 47.15, -1.60, 47.30, -1.40
    dlat = np.radians(la) - np.radians(lb)
    dlon = np.radians(lo) - np.radians(lo2)
    a = np.sin(dlat / 2) ** 2 + np.cos(np.radians(la)) * np.cos(np.radians(lb)) * np.sin(dlon / 2) ** 2
    expect = 2 * EARTH_RAD * np.arcsin(np.sqrt(a))
    got = (
        spark.range(1)
        .select(haversine_m(F.lit(la), F.lit(lo), F.lit(lb), F.lit(lo2)).alias("d"))
        .collect()[0]
        .d
    )
    assert got == pytest.approx(float(expect), rel=1e-12)


def test_phase_classification_golden(spark):
    rows = [
        Row(on_ground=True, vertical_rate=5.0, geo_altitude=100.0, want=80.0),
        Row(on_ground=False, vertical_rate=-2.0, geo_altitude=100.0, want=110.0),
        Row(on_ground=False, vertical_rate=2.0, geo_altitude=100.0, want=130.0),
        Row(on_ground=False, vertical_rate=0.0, geo_altitude=100.0, want=90.0),
        Row(on_ground=False, vertical_rate=None, geo_altitude=100.0, want=90.0),
        # strict inequality boundaries (F:221,223)
        Row(on_ground=False, vertical_rate=-1.5, geo_altitude=100.0, want=90.0),
        Row(on_ground=False, vertical_rate=1.5, geo_altitude=100.0, want=90.0),
    ]
    from air_traffic_data_pipeline_spark.functions.noise import phase_db

    df = spark.createDataFrame(rows).withColumn(
        "got", phase_db(F.col("on_ground"), F.col("vertical_rate"))
    )
    for r in df.collect():
        assert r.got == r.want, r


def test_power_sum_golden(spark):
    """Tiny grid x sources, expected dB computed with numpy exactly as the
    reference's decibel_estimation_ground (functions.py:239-276)."""
    src = [(47.16, -1.61, 90.0), (47.20, -1.55, 130.0)]
    grid_pts = [(47.15, -1.60), (47.40, -1.60)]
    src_df = spark.createDataFrame(src, "lat double, lon double, src_db double")
    grid_df = spark.createDataFrame(grid_pts, "g_lat double, g_lon double")

    from air_traffic_data_pipeline_spark.functions.noise import attenuated_power, db_from_power

    pairs = naive_radius_join(grid_df, src_df, R_MAX)
    got = {
        (r.g_lat, r.g_lon): r.db
        for r in pairs.withColumn("power", attenuated_power(F.col("src_db"), F.col("dist_m")))
        .groupBy("g_lat", "g_lon")
        .agg(F.sum("power").alias("p"))
        .filter(F.col("p") > 0)
        .select("g_lat", "g_lon", db_from_power(F.col("p")).alias("db"))
        .collect()
    }

    # independent numpy computation (reference math)
    def hav(a, b, c, d):
        dlat, dlon = np.radians(a) - np.radians(c), np.radians(b) - np.radians(d)
        x = np.sin(dlat / 2) ** 2 + np.cos(np.radians(a)) * np.cos(np.radians(c)) * np.sin(dlon / 2) ** 2
        return 2 * EARTH_RAD * np.arcsin(np.sqrt(x))

    for glat, glon in grid_pts:
        total = 0.0
        for slat, slon, sdb in src:
            d = hav(glat, glon, slat, slon)
            if d <= R_MAX:
                total += 10 ** ((sdb - 20 * np.log10(d)) / 10)
        if total > 0:
            assert got[(glat, glon)] == pytest.approx(round(10 * np.log10(total), 2), abs=0.01)
        else:
            assert (glat, glon) not in got


def test_last_wins_dedup_deterministic(spark):
    rows = [
        (47.1, -1.6, 1, "a"),
        (47.1, -1.6, 3, "c"),
        (47.1, -1.6, 2, "b"),
        (47.2, -1.5, 5, "d"),
    ]
    df = spark.createDataFrame(rows, "lat double, lon double, seq long, tag string")
    out = {(r.lat, r.lon): r.tag for r in last_wins_dedup(df, ["lat", "lon"], "seq").collect()}
    assert out == {(47.1, -1.6): "c", (47.2, -1.5): "d"}


def test_radius_join_equals_cross_filter(spark):
    """The §4 key equivalence: binned equi-join == crossJoin + haversine filter."""
    import random

    rng = random.Random(42)
    grid = gen_grid(spark, NANTES_LAT, NANTES_LON, 5000.0, 8)
    src = [
        (NANTES_LAT + rng.uniform(-0.6, 0.6), NANTES_LON + rng.uniform(-0.9, 0.9), float(i))
        for i in range(40)
    ]
    src_df = spark.createDataFrame(src, "lat double, lon double, sid double")

    fast = radius_join(grid, src_df, R_MAX, NANTES_LAT)
    slow = naive_radius_join(grid, src_df, R_MAX)
    key = lambda r: (r.g_lat, r.g_lon, r.sid)
    fast_set = {key(r) for r in fast.collect()}
    slow_set = {key(r) for r in slow.collect()}
    assert fast_set == slow_set
    assert len(fast_set) > 0
