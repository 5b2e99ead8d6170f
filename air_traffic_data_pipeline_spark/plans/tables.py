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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all lake tables as temp views so plans can use spark.sql."""
    tune_session(spark)
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
