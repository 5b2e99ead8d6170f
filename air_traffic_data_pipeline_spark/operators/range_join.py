"""Range (interval) join: rows matched to [lo, hi) bands, as an equi-join.

Spark has no native range-join optimization: a plain ``value >= lo AND
value < hi`` join plans as BroadcastNestedLoopJoin (fine for a tiny band
table, catastrophic band-table-side scale-up). ``range_bin_join`` uses the
same trick as the geo radius join (operators/radius_join.py): quantize the
value axis into fixed-width bins, explode each band to every bin it
overlaps, equi-join on the bin id — a shuffled/broadcast HASH join Catalyst
and AQE can plan — then apply the exact range predicate.

At 100 TB: the fact side shuffles (or stays put under a broadcast band
side) on an integer bin key with no fan-out; the band side fans out by
(band width / bin size), which is bounded by choosing bin_size ~ median
band width. Skewed bins (a hot value range) are split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_bin_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` to ``bands`` where lo <= value < hi (half-open).

    Only ``inner`` is supported: the bin equi-join is a candidate
    prefilter, so outer semantics would need a post-filter unmatched-row
    recovery this operator doesn't implement.
    """
    if how != "inner":
        raise ValueError("range_bin_join supports how='inner' only")
    b = bands.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_size)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_size)).cast("long"),
            )
        ),
    )
    e = facts.withColumn("__bin", F.floor(F.col(value_col) / F.lit(bin_size)).cast("long"))
    return (
        e.join(b, "__bin", "inner")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bin")
    )
