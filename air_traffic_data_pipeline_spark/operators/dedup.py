"""Keyed deduplication operators.

``last_wins_dedup`` reproduces the reference's implicit dict-overwrite dedup
(/root/reference/scripts/functions.py:219-226) with a *deterministic*
tie-break: the reference keeps whichever row the API returned last; we keep
the row with the greatest ``order_col``.

At 100 TB scale this is a single hash-partitioned window (one shuffle on the
key). For pure duplicate *removal* without a preference order,
``df.dropDuplicates(keys)`` is cheaper (partial aggregation map-side); the
window form is required only when the survivor must be deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def last_wins_dedup(df: DataFrame, keys: Sequence[str], order_col: str | Column) -> DataFrame:
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*keys).orderBy(order.desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
