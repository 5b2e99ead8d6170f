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


def _interleave16(a, b):
    """Morton (Z-order) interleave of two 16-bit ints -> 32-bit long.
    Pure bit arithmetic — stays in whole-stage codegen."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(16):
        z = (
            z
            + F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("long") * F.lit(1 << (2 * i + 1))
            + F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long") * F.lit(1 << (2 * i))
        )
    return z


def write_clustered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered write on two numeric columns — the multi-dimension
    data-skipping lever next to partitioning (one dim, directory pruning)
    and bucketing (one dim, join co-location): each output file covers a
    small rectangle of the (a, b) value space, so parquet min/max stats
    prune files for selective predicates on EITHER column.

    Shape of the job (the same as a table format's OPTIMIZE ZORDER BY):
    one tiny stats pass (global min/max of both columns), then map each row
    to a 32-bit Morton code, range-repartition on the code (one shuffle)
    and sort within partitions. Verified by tests/test_sources_sinks.py:
    per-file value spreads shrink several-fold vs an unclustered write of
    the same file count.
    """
    from pyspark.sql import functions as F

    a_col, b_col = cols
    st = df.agg(
        F.min(a_col).alias("a_min"),
        F.max(a_col).alias("a_max"),
        F.min(b_col).alias("b_min"),
        F.max(b_col).alias("b_max"),
    ).first()
    if st.a_min is None or st.b_min is None:
        # empty input (or all-null cluster columns): nothing to order —
        # write as-is instead of crashing in the range scaling
        df.write.mode(mode).parquet(path)
        return

    def _to16(c: str, lo, hi):
        rng = float(hi) - float(lo)
        if rng <= 0:
            return F.lit(0)
        scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(rng) * 65535.0
        return F.least(F.lit(65535), F.greatest(F.lit(0), F.floor(scaled).cast("int")))

    z = _interleave16(_to16(a_col, st.a_min, st.a_max), _to16(b_col, st.b_min, st.b_max))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
