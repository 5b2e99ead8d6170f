"""Test-lake table loaders (parquet, explicit column pruning left to Catalyst)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame) -> DataFrame:
    """Small-input guard for CPU-heavy per-row pipelines (explode, k x md5).

    A tiny parquet file scans as a single partition (one row group), which
    serializes everything downstream onto one core. When the scan yields
    fewer partitions than the cluster's parallelism, round-robin repartition
    first — the shuffle moves only the small input. At 100 TB the scan
    already has >= cores partitions and this is a no-op (no shuffle added).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all lake tables as temp views so plans can use spark.sql."""
    tune_session(spark)
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
