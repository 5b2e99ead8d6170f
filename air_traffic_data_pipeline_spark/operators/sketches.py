"""Count-min sketch as relational building blocks.

The sketch is a (row, pos, cnt) relation with FIXED cardinality
(CMS_ROWS x CMS_WIDTH cells) however large the input: each partition
partial-aggregates its own cells and one tiny table merges at the reduce.
Because cell counts are integers and addition is exact, per-batch partial
sketches merged by summation are BITWISE equal to the one-shot sketch —
the property the streaming incremental-maintenance query is value-checked
on (streaming/events_stream.py::incremental_cms_user_freq).

Hashing is md5-derived (identical hex in Spark and DuckDB) so every cell
and every estimate is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashes import hex4_to_int, hex4_to_int_sql

CMS_ROWS = 4
CMS_WIDTH = 1024


def cms_pos(item: Column, r: Column) -> Column:
    """Cell position of ``item`` under hash row ``r`` — md5(item || '@' || r)."""
    return (
        hex4_to_int(F.md5(F.concat(item, F.lit("@"), r.cast("string")))) % CMS_WIDTH
    )


def _with_rows(df: DataFrame, item: str) -> DataFrame:
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_ROWS)])).alias("r")
    return df.select("*", rows).withColumn("pos", cms_pos(F.col(item), F.col("r")))


def cms_cells(items: DataFrame, item: str = "w") -> DataFrame:
    """(r, pos, cnt) sketch cells for a relation of items (one row = one
    occurrence). Map-side combine shuffles at most CMS_ROWS x CMS_WIDTH
    rows regardless of input size."""
    return (
        _with_rows(items.select(item), item)
        .groupBy("r", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(probes: DataFrame, cells: DataFrame, item: str = "w") -> DataFrame:
    """min-over-rows estimate for each probe row (all probe columns kept).

    ``probes`` must contain ``item``; the join against the bounded cell
    table broadcasts under AQE at any corpus size.
    """
    keep = list(probes.columns)
    return (
        _with_rows(probes, item)
        .join(cells, ["r", "pos"])
        .groupBy(*keep)
        .agg(F.min("cnt").alias("cms_est"))
    )


# --- DuckDB oracle renderings ------------------------------------------------

CMS_ROWS_VALUES_SQL = (
    "(VALUES " + ", ".join(f"({r})" for r in range(CMS_ROWS)) + ") AS t(r)"
)


def cms_pos_sql(item: str) -> str:
    salted = "md5(" + item + " || '@' || CAST(r AS VARCHAR))"
    return f"({hex4_to_int_sql(salted)} % {CMS_WIDTH})"
