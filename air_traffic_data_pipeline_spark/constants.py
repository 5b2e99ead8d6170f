"""Physical and model constants shared by the engine and its DuckDB oracles.

Values mirror the reference semantics (/root/reference/scripts/functions.py:130-132,
188-192, 217-226, 302) but everything here is plain public math.

The DEG2RAD / RAD2DEG literals are spelled out (instead of calling engine
``radians()``/``degrees()``) so that Spark and DuckDB evaluate *identical*
IEEE-754 multiplications: both engines' builtin conversions use slightly
different instruction orderings which can differ in the last ulp, and we want
bitwise-stable group-by keys.
"""

EARTH_RAD = 6371000.0  # m, haversine sphere radius (F:130)
R_MAX = 20000.0        # m, audibility cutoff radius (F:131)
REF_ALT = 27.0         # m, ground reference altitude (F:132; hardcoded at F:210,219)
MAX_DB = 130.0         # normalization divisor for heat weights (F:302)

# Source-level dB table (F:217-226)
DB_ON_GROUND = 80.0
DB_DESCENT = 110.0     # vertical_rate < -1.5
DB_CLIMB = 130.0       # vertical_rate > +1.5
DB_CRUISE = 90.0       # otherwise (incl. null vertical_rate)
VR_THRESHOLD = 1.5

# Default grid center: Nantes airport (F:188-192)
NANTES_LAT = 47.1542
NANTES_LON = -1.6044

# Exact double literals for angle conversion (pi/180 and 180/pi)
DEG2RAD = 0.017453292519943295
RAD2DEG = 57.29577951308232

# Grid parameters used by the flagship query (scaled down from the
# reference's step=200m/n=500 to keep the oracle cross-check tractable;
# the operator itself takes arbitrary step/n).
FLAGSHIP_STEP_M = 2000.0
FLAGSHIP_N_STEPS = 25
