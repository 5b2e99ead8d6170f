"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship noise-grid query at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from air_traffic_data_pipeline_spark.plans import registry
from air_traffic_data_pipeline_spark.plans.domain import flagship_noise_grid


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Teardown guarantee: any tables persisted by earlier queries() calls in
    this session (minhash doc tables, LM bigram counts, contamination
    shingles) AND any registered localCheckpoint RDDs (connected
    components, incremental noise grid) are released first — entry()
    leaves no executor storage behind (tested in tests/test_entry.py),
    and the flagship itself persists nothing."""
    from air_traffic_data_pipeline_spark.operators import checkpoints
    from air_traffic_data_pipeline_spark.plans import llm

    llm.clear_caches()
    checkpoints.clear_all(spark)
    return flagship_noise_grid(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
