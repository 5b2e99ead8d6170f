"""Data-lake writers (fills the reference's reserved-but-unused
``processedData/`` slot, .gitignore:4).

At 100 TB the layout is the performance lever: partition by a low-cardinality
pruning column (date), keep files ~128MB-1GB via a pre-write repartition on
the partition key, and bucket fact tables on their join key so downstream
joins co-locate without a shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    # repartition on the partition columns first: one writer task per
    # partition directory instead of every task writing to every directory
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: later equi-joins/aggs on ``bucket_col``
    skip the shuffle (bucket-aware scan)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_rows_per_file: int,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction — the maintenance job every streaming/append
    lake needs: rewrite a directory of many tiny parquet files into
    ceil(rows / target) right-sized files. Returns the output file count.

    A row-count pass sizes the repartition; at scale swap the exact count
    for fileSize-based estimation from the catalog/listing. Round-robin
    repartition keeps output files uniform regardless of input skew.

    Refuses dest_path == src_path: overwrite mode truncates the target
    BEFORE the lazy read of the same directory executes, destroying the
    input (in-place compaction needs a staging dir + atomic rename, or a
    table format with transactional rewrite)."""
    import math
    import os

    def _canon(p: str) -> str:
        # normalize URI-scheme spellings (file:///x == /x) and resolve
        # symlinks so aliases of the same directory cannot dodge the guard
        if p.startswith("file://"):
            p = p[len("file://") :] or "/"
        return os.path.realpath(os.path.abspath(p))

    if _canon(dest_path) == _canon(src_path):
        raise ValueError(
            "compact_small_files: dest_path must differ from src_path "
            "(overwrite truncates the target before the source is read)"
        )
    df = spark.read.parquet(src_path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(n_files).write.mode(mode).parquet(dest_path)
    out_n = spark.read.parquet(dest_path).count()
    if out_n != n:
        raise RuntimeError(
            f"compaction row-count mismatch: wrote {out_n}, expected {n}"
        )
    return n_files
