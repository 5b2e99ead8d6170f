"""Domain (noise-pipeline) queries with DuckDB oracles.

The reference pipeline (states -> phase classify -> dedup -> grid radius join
-> attenuate -> power-sum per cell -> dB -> heat weights; /root/reference/
scripts/functions.py:213-302) runs here as one lazy DataFrame graph. Since
the driver's test lake has no flight-states table, a deterministic states
table is *derived* from ``events`` with exact integer/double arithmetic that
both Spark and DuckDB evaluate bitwise-identically (see ``build_states`` /
``STATES_SQL``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..constants import (
    FLAGSHIP_N_STEPS,
    FLAGSHIP_STEP_M,
    MAX_DB,
    NANTES_LAT,
    NANTES_LON,
    R_MAX,
)
from ..functions.geo import haversine_m, haversine_sql, slant_distance_m
from ..functions.noise import (
    attenuated_power,
    attenuated_power_sql,
    db_from_power,
    phase_db,
    phase_db_sql,
    source_alt,
)
from ..operators.dedup import last_wins_dedup
from ..operators.grid import gen_grid, grid_bounds, grid_sql
from ..operators.radius_join import adaptive_radius_join
from .tables import load

# ---------------------------------------------------------------------------
# Deterministic flight-states derivation from the events table.
# All arithmetic is +, *, % on exact inputs -> bitwise identical in both
# engines. vertical_rate: fmod is exact in IEEE-754. 'error' events carry a
# null vertical_rate to exercise the null->cruise branch.
# ---------------------------------------------------------------------------


def _lattice_lat() -> F.Column:
    return F.lit(47.0) + (F.col("user_id") % 120) * F.lit(0.0028)


def _lattice_lon() -> F.Column:
    return F.lit(-1.92) + (F.col("event_id") % 240) * F.lit(0.003)


def _vertical_rate() -> F.Column:
    return F.when(F.col("event_type") != "error", (F.col("value") % 30.0) - 15.0)


def _on_ground() -> F.Column:
    return F.col("event_type") == "signup"


def states_from_events(ev: DataFrame, *extra: F.Column) -> DataFrame:
    """Derive the deterministic states table from an events DataFrame —
    batch or per-micro-batch (see ``incremental_noise_grid``). ``extra``
    columns (e.g. a day bucket for the temporal rollup) ride along so
    derived pipelines never re-implement the lattice formulas."""
    return ev.select(
        F.col("event_id"),
        F.lpad(F.col("event_id").cast("string"), 6, "0").alias("icao24"),
        _lattice_lat().alias("latitude"),
        _lattice_lon().alias("longitude"),
        _on_ground().alias("on_ground"),
        _vertical_rate().alias("vertical_rate"),
        F.when(F.col("event_type") != "purchase", F.col("value") * 25.0)
        .alias("geo_altitude"),
        *extra,
    )


def build_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    return states_from_events(load(spark, sf_dir, "events"))


# shared SQL fragments — the single source for the lattice/phase formulas
# (used by STATES_SQL and the temporal-rollup oracle)
_LAT_SQL = "CAST(47.0 AS DOUBLE) + (user_id % 120) * CAST(0.0028 AS DOUBLE)"
_LON_SQL = "CAST(-1.92 AS DOUBLE) + (event_id % 240) * CAST(0.003 AS DOUBLE)"
_ON_GROUND_SQL = "event_type = 'signup'"
_VR_SQL = "CASE WHEN event_type != 'error' THEN (value % CAST(30.0 AS DOUBLE)) - CAST(15.0 AS DOUBLE) END"

STATES_SQL = f"""
SELECT event_id,
       lpad(CAST(event_id AS VARCHAR), 6, '0') AS icao24,
       {_LAT_SQL} AS latitude,
       {_LON_SQL} AS longitude,
       {_ON_GROUND_SQL} AS on_ground,
       {_VR_SQL} AS vertical_rate,
       CASE WHEN event_type != 'purchase' THEN value * CAST(25.0 AS DOUBLE) END AS geo_altitude
FROM events
"""


def classified_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = build_states(spark, sf_dir)
    return st.withColumn(
        "src_db", phase_db(F.col("on_ground"), F.col("vertical_rate"))
    ).withColumn("src_alt", source_alt(F.col("on_ground"), F.col("geo_altitude")))


def source_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped (lat, lon) -> (db, alt) source map (functions.py:213-227).

    Last-writer-wins on the coordinate key, deterministic by event_id desc.
    """
    st = classified_states(spark, sf_dir)
    deduped = last_wins_dedup(st, ["latitude", "longitude"], "event_id")
    return deduped.select(
        F.col("latitude").alias("lat"),
        F.col("longitude").alias("lon"),
        F.col("src_db"),
        F.col("src_alt"),
    )


SOURCE_LEVELS_SQL = f"""
WITH states AS ({STATES_SQL}),
classified AS (
  SELECT *, {phase_db_sql()} AS src_db,
         CASE WHEN on_ground THEN CAST(27.0 AS DOUBLE) ELSE geo_altitude END AS src_alt
  FROM states
),
deduped AS (
  SELECT *, row_number() OVER (PARTITION BY latitude, longitude ORDER BY event_id DESC) AS rn
  FROM classified
)
SELECT latitude AS lat, longitude AS lon, src_db, src_alt
FROM deduped WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Flagship: ground-noise grid
# ---------------------------------------------------------------------------


def flagship_noise_grid(
    spark: SparkSession,
    sf_dir: str,
    step_m: float = FLAGSHIP_STEP_M,
    n_steps: int = FLAGSHIP_N_STEPS,
) -> DataFrame:
    """states -> classify -> dedup -> binned radius join -> attenuate ->
    groupBy(cell).sum(power) -> dB -> heat weight. One lazy plan, no collect.
    """
    grid = gen_grid(spark, NANTES_LAT, NANTES_LON, step_m, n_steps)
    sources = source_levels(spark, sf_dir).select("lat", "lon", "src_db")
    n_cells = (2 * n_steps + 1) ** 2
    pairs = adaptive_radius_join(
        grid,
        sources,
        R_MAX,
        NANTES_LAT,
        grid_cells=n_cells,
        region_extent_m=2 * n_steps * step_m,
    )
    return _noise_agg(pairs)


def _noise_agg(pairs: DataFrame) -> DataFrame:
    """attenuate -> per-cell power sum -> dB -> heat weight (shared by the
    flagship and the reference-geometry variant). Rounding db to 2 dp and
    weight to 6 dp makes the output insensitive to float summation order."""
    power = attenuated_power(F.col("src_db"), F.col("dist_m"))
    agg = (
        pairs.withColumn("power", power)
        .groupBy("g_lat", "g_lon")
        .agg(F.sum("power").alias("sum_power"))
        .filter(F.col("sum_power") > 0)
    )
    return agg.select(
        "g_lat",
        "g_lon",
        db_from_power(F.col("sum_power")).alias("db"),
        F.round(db_from_power(F.col("sum_power")) / F.lit(MAX_DB), 6).alias("weight"),
    )


def flagship_sql(step_m: float = FLAGSHIP_STEP_M, n_steps: int = FLAGSHIP_N_STEPS) -> str:
    dist = haversine_sql("g.g_lat", "g.g_lon", "s.lat", "s.lon")
    power = attenuated_power_sql("src_db", "dist_m")
    return f"""
WITH grid AS ({grid_sql(NANTES_LAT, NANTES_LON, step_m, n_steps)}),
sources AS (SELECT lat, lon, src_db FROM ({SOURCE_LEVELS_SQL}) t),
pairs AS (
  SELECT g.g_lat, g.g_lon, s.src_db, {dist} AS dist_m
  FROM grid g CROSS JOIN sources s
),
contrib AS (
  SELECT g_lat, g_lon, {power} AS power
  FROM pairs WHERE dist_m <= CAST({R_MAX!r} AS DOUBLE)
),
agg AS (
  SELECT g_lat, g_lon, sum(power) AS sum_power
  FROM contrib GROUP BY g_lat, g_lon
  HAVING sum(power) > 0
)
SELECT g_lat, g_lon,
       round(CAST(10.0 AS DOUBLE) * log10(sum_power), 2) AS db,
       round(round(CAST(10.0 AS DOUBLE) * log10(sum_power), 2) / CAST({MAX_DB!r} AS DOUBLE), 6) AS weight
FROM agg
"""


# ---------------------------------------------------------------------------
# Reference-geometry flagship: step 200 m / n = 500 -> 1 002 001 cells
# (/root/reference/scripts/functions.py:281). At this extent/R = 10 the
# adaptive join picks the binned equi-join — the 100 TB scale path — and this
# query proves it end to end at the grid the reference actually ships.
# ---------------------------------------------------------------------------

REFGEOM_STEP_M = 200.0
REFGEOM_N_STEPS = 500
# The reference's source side is ONE OpenSky poll (~dozens-hundreds of
# aircraft, functions.py:47); our events-derived source lattice has
# thousands of occupied coordinates, so the refgeom query deterministically
# keeps ~1/40 of the coordinate lattice (pure integer arithmetic, identical
# in both engines) to bench the reference's real shape: huge grid x
# poll-sized source set.
REFGEOM_SAMPLE_MOD = 40


def _refgeom_keep(lat, lon) -> F.Column:
    i_lat = F.round((lat - F.lit(47.0)) / F.lit(0.0028)).cast("long")
    i_lon = F.round((lon + F.lit(1.92)) / F.lit(0.003)).cast("long")
    return (i_lat * 7 + i_lon * 11) % REFGEOM_SAMPLE_MOD == 0


_REFGEOM_KEEP_SQL = (
    "(CAST(round((lat - CAST(47.0 AS DOUBLE)) / CAST(0.0028 AS DOUBLE)) AS BIGINT) * 7"
    " + CAST(round((lon + CAST(1.92 AS DOUBLE)) / CAST(0.003 AS DOUBLE)) AS BIGINT) * 11)"
    f" % {REFGEOM_SAMPLE_MOD} = 0"
)


def refgeom_noise_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = gen_grid(spark, NANTES_LAT, NANTES_LON, REFGEOM_STEP_M, REFGEOM_N_STEPS)
    sources = (
        source_levels(spark, sf_dir)
        .filter(_refgeom_keep(F.col("lat"), F.col("lon")))
        .select("lat", "lon", "src_db")
    )
    n_cells = (2 * REFGEOM_N_STEPS + 1) ** 2
    pairs = adaptive_radius_join(
        grid,
        sources,
        R_MAX,
        NANTES_LAT,
        grid_cells=n_cells,
        region_extent_m=2 * REFGEOM_N_STEPS * REFGEOM_STEP_M,
    )
    return _noise_agg(pairs)


def refgeom_sql() -> str:
    """DuckDB oracle for the refgeom query, with the SAME binned-equi-join
    prefilter the Spark operator uses (the bin join is a pure prefilter — the
    exact haversine predicate decides membership — so result equivalence to
    cross+filter holds in either engine; binning just keeps the 1M-cell
    oracle tractable)."""
    import math

    from ..constants import DEG2RAD, EARTH_RAD, RAD2DEG
    from .sqlutil import dlit

    bin_deg_lat = R_MAX / EARTH_RAD * RAD2DEG
    bin_deg_lon = R_MAX / (EARTH_RAD * math.cos(NANTES_LAT * DEG2RAD)) * RAD2DEG
    dist = haversine_sql("g.g_lat", "g.g_lon", "s.lat", "s.lon")
    power = attenuated_power_sql("src_db", "dist_m")
    return f"""
WITH grid AS ({grid_sql(NANTES_LAT, NANTES_LON, REFGEOM_STEP_M, REFGEOM_N_STEPS)}),
src AS (
  SELECT lat, lon, src_db FROM ({SOURCE_LEVELS_SQL}) t WHERE {_REFGEOM_KEEP_SQL}
),
sx AS (
  SELECT lat, lon, src_db,
         CAST(floor(lat / {dlit(bin_deg_lat)}) AS BIGINT) + d.dlat AS bin_lat,
         CAST(floor(lon / {dlit(bin_deg_lon)}) AS BIGINT) + d.dlon AS bin_lon
  FROM src CROSS JOIN (SELECT a.dlat, b.dlon
                       FROM (VALUES (-1), (0), (1)) a(dlat),
                            (VALUES (-1), (0), (1)) b(dlon)) d
),
gb AS (
  SELECT g_lat, g_lon,
         CAST(floor(g_lat / {dlit(bin_deg_lat)}) AS BIGINT) AS bin_lat,
         CAST(floor(g_lon / {dlit(bin_deg_lon)}) AS BIGINT) AS bin_lon
  FROM grid
),
pairs AS (
  SELECT g.g_lat, g.g_lon, s.src_db, {dist} AS dist_m
  FROM gb g JOIN sx s ON g.bin_lat = s.bin_lat AND g.bin_lon = s.bin_lon
),
contrib AS (
  SELECT g_lat, g_lon, {power} AS power
  FROM pairs WHERE dist_m <= CAST({R_MAX!r} AS DOUBLE)
),
agg AS (
  SELECT g_lat, g_lon, sum(power) AS sum_power
  FROM contrib GROUP BY g_lat, g_lon
  HAVING sum(power) > 0
)
SELECT g_lat, g_lon,
       round(CAST(10.0 AS DOUBLE) * log10(sum_power), 2) AS db,
       round(round(CAST(10.0 AS DOUBLE) * log10(sum_power), 2) / CAST({MAX_DB!r} AS DOUBLE), 6) AS weight
FROM agg
"""


# ---------------------------------------------------------------------------
# Incremental noise-map maintenance (streaming materialized view)
# ---------------------------------------------------------------------------


def incremental_noise_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's production pattern — poll -> update the heatmap —
    as STREAMING MATERIALIZED-VIEW MAINTENANCE: each micro-batch of state
    observations runs the radius join against the grid and lands its
    per-cell PARTIAL power sums as an idempotent ``batch=<epoch>``
    partition (epoch replay overwrites the same directory — exactly-once);
    the view is the re-aggregation of the partials. Power-domain sums are
    associative, so the incremental result equals the one-shot batch
    flagship over all observations (no dedup — every poll contributes),
    which is exactly what the oracle computes.

    At scale each micro-batch touches only its own sources x nearby cells
    (binned equi radius join), the landed partials are cell-keyed and
    compact, and the final merge re-aggregates partials — never raw pairs.
    """
    import shutil
    import uuid

    from ..streaming.events_stream import EVENTS_SCHEMA, _stage_late_batches

    d = _stage_late_batches(spark, sf_dir)
    # unique dir per invocation: a previously returned (lazy) result must
    # never see its partials deleted by a later call. The try/finally below
    # removes it on EVERY exit path — a failed run must not leak a dir.
    base = f"{d.rstrip('/')}_noise_mv_{uuid.uuid4().hex[:8]}"

    grid = gen_grid(spark, NANTES_LAT, NANTES_LON, FLAGSHIP_STEP_M, FLAGSHIP_N_STEPS)
    n_cells = (2 * FLAGSHIP_N_STEPS + 1) ** 2

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        st = states_from_events(batch_df)
        sources = st.select(
            F.col("latitude").alias("lat"),
            F.col("longitude").alias("lon"),
            phase_db(F.col("on_ground"), F.col("vertical_rate")).alias("src_db"),
        )
        pairs = adaptive_radius_join(
            grid,
            sources,
            R_MAX,
            NANTES_LAT,
            grid_cells=n_cells,
            region_extent_m=2 * FLAGSHIP_N_STEPS * FLAGSHIP_STEP_M,
        )
        partial = (
            pairs.withColumn(
                "power", attenuated_power(F.col("src_db"), F.col("dist_m"))
            )
            .groupBy("g_lat", "g_lon")
            .agg(F.sum("power").alias("sum_power"))
        )
        partial.write.mode("overwrite").parquet(f"{base}/batch={epoch_id}")

    from ..operators.checkpoints import tracked_local_checkpoint

    try:
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{base}/batch=*")
            .groupBy("g_lat", "g_lon")
            .agg(F.sum("sum_power").alias("sum_power"))
            .filter(F.col("sum_power") > 0)
        )
        out = merged.select(
            "g_lat",
            "g_lon",
            db_from_power(F.col("sum_power")).alias("db"),
            F.round(db_from_power(F.col("sum_power")) / F.lit(MAX_DB), 6).alias(
                "weight"
            ),
        )
        # materialize (lineage-truncating) so the partials dir can be removed
        # now; the checkpoint is REGISTERED so entry()'s teardown releases
        # its block-manager storage (tests/test_entry.py)
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_sql() -> str:
    """Oracle: the one-shot flagship over ALL observations (no dedup), with
    the same bin prefilter as refgeom_sql to keep the pair count tractable
    (the exact haversine predicate decides membership either way)."""
    import math

    from ..constants import DEG2RAD, EARTH_RAD, RAD2DEG
    from .sqlutil import dlit

    bin_deg_lat = R_MAX / EARTH_RAD * RAD2DEG
    bin_deg_lon = R_MAX / (EARTH_RAD * math.cos(NANTES_LAT * DEG2RAD)) * RAD2DEG
    dist = haversine_sql("g.g_lat", "g.g_lon", "s.lat", "s.lon")
    power = attenuated_power_sql("src_db", "dist_m")
    return f"""
WITH grid AS ({grid_sql(NANTES_LAT, NANTES_LON, FLAGSHIP_STEP_M, FLAGSHIP_N_STEPS)}),
states AS ({STATES_SQL}),
src AS (
  SELECT latitude AS lat, longitude AS lon, {phase_db_sql()} AS src_db
  FROM states
),
sx AS (
  SELECT lat, lon, src_db,
         CAST(floor(lat / {dlit(bin_deg_lat)}) AS BIGINT) + d.dlat AS bin_lat,
         CAST(floor(lon / {dlit(bin_deg_lon)}) AS BIGINT) + d.dlon AS bin_lon
  FROM src CROSS JOIN (SELECT a.dlat, b.dlon
                       FROM (VALUES (-1), (0), (1)) a(dlat),
                            (VALUES (-1), (0), (1)) b(dlon)) d
),
gb AS (
  SELECT g_lat, g_lon,
         CAST(floor(g_lat / {dlit(bin_deg_lat)}) AS BIGINT) AS bin_lat,
         CAST(floor(g_lon / {dlit(bin_deg_lon)}) AS BIGINT) AS bin_lon
  FROM grid
),
pairs AS (
  SELECT g.g_lat, g.g_lon, s.src_db, {dist} AS dist_m
  FROM gb g JOIN sx s ON g.bin_lat = s.bin_lat AND g.bin_lon = s.bin_lon
),
contrib AS (
  SELECT g_lat, g_lon, {power} AS power
  FROM pairs WHERE dist_m <= CAST({R_MAX!r} AS DOUBLE)
),
agg AS (
  SELECT g_lat, g_lon, sum(power) AS sum_power
  FROM contrib GROUP BY g_lat, g_lon
  HAVING sum(power) > 0
)
SELECT g_lat, g_lon,
       round(CAST(10.0 AS DOUBLE) * log10(sum_power), 2) AS db,
       round(round(CAST(10.0 AS DOUBLE) * log10(sum_power), 2) / CAST({MAX_DB!r} AS DOUBLE), 6) AS weight
FROM agg
"""


# ---------------------------------------------------------------------------
# Component queries (each a small oracle-checked surface)
# ---------------------------------------------------------------------------


def q_phase_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classification branch counts — covers the F.when chain incl. nulls."""
    st = classified_states(spark, sf_dir)
    return (
        st.groupBy("src_db")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("vertical_rate").alias("n_vr_nonnull"),
        )
        .orderBy("src_db")
    )


PHASE_CLASSIFY_SQL = f"""
WITH states AS ({STATES_SQL})
SELECT {phase_db_sql()} AS src_db,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(vertical_rate) AS BIGINT) AS n_vr_nonnull
FROM states
GROUP BY 1 ORDER BY 1
"""


def q_source_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_levels(spark, sf_dir)


def q_grid_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = gen_grid(spark, NANTES_LAT, NANTES_LON, FLAGSHIP_STEP_M, FLAGSHIP_N_STEPS)
    b = grid_bounds(grid)
    n = grid.agg(F.count(F.lit(1)).alias("n_cells"))
    return b.crossJoin(n)


GRID_BOUNDS_SQL = f"""
WITH grid AS ({grid_sql(NANTES_LAT, NANTES_LON, FLAGSHIP_STEP_M, FLAGSHIP_N_STEPS)})
SELECT min(g_lat) AS lamin, min(g_lon) AS lomin,
       max(g_lat) AS lamax, max(g_lon) AS lomax,
       CAST(count(*) AS BIGINT) AS n_cells
FROM grid
"""


def q_slant_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D slant distance parity op (reference F:194-211, dead code there).

    Distances from the grid center to each deduped source at its altitude.
    """
    src = source_levels(spark, sf_dir).filter(F.col("src_alt").isNotNull())
    return src.select(
        "lat",
        "lon",
        F.round(
            slant_distance_m(
                F.lit(NANTES_LAT), F.lit(NANTES_LON), F.col("lat"), F.col("lon"), F.col("src_alt")
            ),
            2,
        ).alias("slant_m"),
    )


_SLANT_HOR = haversine_sql(
    f"CAST({NANTES_LAT!r} AS DOUBLE)", f"CAST({NANTES_LON!r} AS DOUBLE)", "lat", "lon"
)

SLANT_SQL = f"""
WITH src AS (SELECT * FROM ({SOURCE_LEVELS_SQL}) t WHERE src_alt IS NOT NULL)
SELECT lat, lon,
       round(sqrt(({_SLANT_HOR} * {_SLANT_HOR})
                  + (abs(src_alt - CAST(27.0 AS DOUBLE)) * abs(src_alt - CAST(27.0 AS DOUBLE)))), 2) AS slant_m
FROM src
"""


def q_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bbox predicate (the reference's S2 pushdown, F:42-48) as a filter that
    Catalyst pushes into the parquet scan of events."""
    st = classified_states(spark, sf_dir)
    return (
        st.filter(
            (F.col("latitude") >= 47.05)
            & (F.col("latitude") <= 47.25)
            & (F.col("longitude") >= -1.8)
            & (F.col("longitude") <= -1.4)
        )
        .groupBy("src_db")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src_db")
    )


BBOX_SQL = f"""
WITH states AS ({STATES_SQL})
SELECT {phase_db_sql()} AS src_db, CAST(count(*) AS BIGINT) AS n
FROM states
WHERE latitude >= 47.05 AND latitude <= 47.25 AND longitude >= -1.8 AND longitude <= -1.4
GROUP BY 1 ORDER BY 1
"""


def q_phase_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flight-phase transition detection (SURVEY §2 Part B windows row):
    per aircraft track (the latitude lattice line doubles as the track key
    in the derived lake), lag() the classified phase dB over the poll
    sequence and count each (from, to) transition — climb->cruise,
    cruise->descent, etc. One window shuffle on the track key; the
    transition matrix is tiny."""
    from pyspark.sql import Window

    st = classified_states(spark, sf_dir)
    w = Window.partitionBy("latitude").orderBy("event_id")
    prev = F.lag("src_db").over(w)
    return (
        st.withColumn("prev_db", prev)
        .filter(F.col("prev_db").isNotNull() & (F.col("prev_db") != F.col("src_db")))
        .groupBy(F.col("prev_db").alias("from_db"), F.col("src_db").alias("to_db"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


PHASE_TRANSITIONS_SQL = f"""
WITH states AS ({STATES_SQL}),
classified AS (
  SELECT *, {phase_db_sql()} AS src_db FROM states
),
lagged AS (
  SELECT src_db,
         lag(src_db) OVER (PARTITION BY latitude ORDER BY event_id) AS prev_db
  FROM classified
)
SELECT prev_db AS from_db, src_db AS to_db, count(*) AS n_transitions
FROM lagged
WHERE prev_db IS NOT NULL AND prev_db != src_db
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Temporal rollup: the flagship pipeline per day (hypertable-style)
# ---------------------------------------------------------------------------

ROLLUP_N_STEPS = 10  # 441 cells: keeps the oracle's pair count tractable
_NANOS_PER_DAY = 86_400_000_000_000


def q_daily_noise_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style temporal rollup of the flagship: the SAME
    states -> classify -> dedup -> radius join -> dB pipeline, bucketed by
    day — dedup is last-wins per (day, coordinate) and the aggregation key
    grows a time dimension. The rollup's scale shape is unchanged (the day
    column rides along the radius join; the per-cell aggregate shuffles on
    (day, cell)); at 100 TB the day key also becomes the lake's partition
    column, so each day's rollup prunes to its own files."""
    ev = load(spark, sf_dir, "events")
    st = states_from_events(
        ev, F.expr(f"ts div {_NANOS_PER_DAY}").cast("bigint").alias("day")
    ).withColumn("src_db", phase_db(F.col("on_ground"), F.col("vertical_rate")))
    deduped = last_wins_dedup(st, ["day", "latitude", "longitude"], "event_id")
    sources = deduped.select(
        "day", F.col("latitude").alias("lat"), F.col("longitude").alias("lon"), "src_db"
    )
    grid = gen_grid(spark, NANTES_LAT, NANTES_LON, FLAGSHIP_STEP_M, ROLLUP_N_STEPS)
    pairs = adaptive_radius_join(
        grid,
        sources,
        R_MAX,
        NANTES_LAT,
        grid_cells=(2 * ROLLUP_N_STEPS + 1) ** 2,
        region_extent_m=2 * ROLLUP_N_STEPS * FLAGSHIP_STEP_M,
    )
    power = attenuated_power(F.col("src_db"), F.col("dist_m"))
    agg = (
        pairs.withColumn("power", power)
        .groupBy("day", "g_lat", "g_lon")
        .agg(F.sum("power").alias("sum_power"))
        .filter(F.col("sum_power") > 0)
    )
    return agg.select(
        "day",
        "g_lat",
        "g_lon",
        db_from_power(F.col("sum_power")).alias("db"),
    )


def daily_rollup_sql() -> str:
    dist = haversine_sql("g.g_lat", "g.g_lon", "s.lat", "s.lon")
    power = attenuated_power_sql("src_db", "dist_m")
    return f"""
WITH grid AS ({grid_sql(NANTES_LAT, NANTES_LON, FLAGSHIP_STEP_M, ROLLUP_N_STEPS)}),
st AS (
  SELECT event_id,
         CAST(epoch_ns(ts) // {_NANOS_PER_DAY} AS BIGINT) AS day,
         {_LAT_SQL} AS latitude,
         {_LON_SQL} AS longitude,
         {phase_db_sql()} AS src_db
  FROM (SELECT *,
               {_ON_GROUND_SQL} AS on_ground,
               {_VR_SQL} AS vertical_rate
        FROM events) e
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY day, latitude, longitude ORDER BY event_id DESC) AS rn
    FROM st) t
  WHERE rn = 1
),
sources AS (SELECT day, latitude AS lat, longitude AS lon, src_db FROM deduped),
pairs AS (
  SELECT s.day, g.g_lat, g.g_lon, s.src_db, {dist} AS dist_m
  FROM grid g CROSS JOIN sources s
),
contrib AS (
  SELECT day, g_lat, g_lon, {power} AS power
  FROM pairs WHERE dist_m <= CAST({R_MAX!r} AS DOUBLE)
),
agg AS (
  SELECT day, g_lat, g_lon, sum(power) AS sum_power
  FROM contrib GROUP BY 1, 2, 3
  HAVING sum(power) > 0
)
SELECT day, g_lat, g_lon,
       round(CAST(10.0 AS DOUBLE) * log10(sum_power), 2) AS db
FROM agg
"""


def q_heat_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized heatmap triples (F:302): the flagship's sink projection."""
    return flagship_noise_grid(spark, sf_dir).select(
        F.col("g_lat").alias("lat"), F.col("g_lon").alias("lon"), "weight"
    )


def heat_triples_sql() -> str:
    return f"SELECT g_lat AS lat, g_lon AS lon, weight FROM ({flagship_sql()}) t"


def domain_queries() -> dict:
    return {
        "noise_grid_flagship": flagship_noise_grid,
        "noise_phase_classify": q_phase_classify,
        "noise_source_levels": q_source_levels,
        "noise_grid_bounds": q_grid_bounds,
        "noise_slant_distance": q_slant_distance,
        "noise_bbox_filter": q_bbox_filter,
        "noise_heat_triples": q_heat_triples,
        "noise_grid_refgeom": refgeom_noise_grid,
        "noise_grid_incremental": incremental_noise_grid,
        "noise_phase_transitions": q_phase_transitions,
        "noise_daily_rollup": q_daily_noise_rollup,
    }


def domain_oracles() -> dict:
    return {
        "noise_grid_flagship": flagship_sql(),
        "noise_phase_classify": PHASE_CLASSIFY_SQL,
        "noise_source_levels": SOURCE_LEVELS_SQL,
        "noise_grid_bounds": GRID_BOUNDS_SQL,
        "noise_slant_distance": SLANT_SQL,
        "noise_bbox_filter": BBOX_SQL,
        "noise_heat_triples": heat_triples_sql(),
        "noise_grid_refgeom": refgeom_sql(),
        "noise_grid_incremental": incremental_sql(),
        "noise_phase_transitions": PHASE_TRANSITIONS_SQL,
        "noise_daily_rollup": daily_rollup_sql(),
    }
