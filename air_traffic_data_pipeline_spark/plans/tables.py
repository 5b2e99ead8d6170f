"""Test-lake table loaders (parquet, explicit column pruning left to Catalyst)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _canonical_event_time(df)
    return df


def _canonical_event_time(df: DataFrame) -> DataFrame:
    """Canonicalize ``events.ts`` to epoch-nanosecond int64.

    The engine's event-time algebra (bucketing, watermark replay oracles,
    sessionization) is integer arithmetic on epoch nanos — the same value
    DuckDB's ``epoch_ns(ts)`` yields — so lakes that store ``ts`` as a
    parquet TIMESTAMP (us, read as TIMESTAMP_NTZ) are normalized at the
    scan boundary. Session timezone is pinned to UTC (session.py), making
    the NTZ->instant conversion exact; a pure column expression, stays in
    whole-stage codegen, no shuffle. Lakes already storing int64 nanos
    pass through untouched.
    """
    field = df.schema["ts"].dataType if "ts" in df.columns else None
    if isinstance(field, (T.TimestampType, T.TimestampNTZType)):
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


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
