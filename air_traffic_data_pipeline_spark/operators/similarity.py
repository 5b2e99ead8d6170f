"""Similarity-search operators over an embedding column (``array<float>``).

Three tiers, mirroring how ANN is built on top of Spark at scale:

- ``brute_force_topk``: exact cosine top-k. The query side is small and
  broadcast; the corpus side streams. O(|Q| * |C|) — the correctness
  baseline, and the right plan when |Q| is tiny.
- ``lsh_bucket``: random-hyperplane LSH signature (integer planes, so the
  bucket id is bitwise deterministic across engines). Co-bucketing turns the
  all-pairs cosine search into an equi-join on ``bucket`` — the scale path:
  both sides shuffle once on the bucket key, candidates drop from |Q|*|C| to
  co-bucketed pairs, and AQE handles bucket skew.
- ``ivf_assign`` / ``ivf_topk``: IVF-style coarse quantization: centroid =
  per-label mean vector (one distributed agg), vectors assigned to nearest
  centroid, queries probe the closest ``nprobe`` cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from ..functions.vectors import cosine, dot, norm, to_double

# 8 deterministic integer hyperplanes for d-dim vectors:
# plane[j][d] = ((j*37 + d*17) % 19) - 9  (range -9..9, mean ~0)
N_PLANES = 8


def plane(j: int, dim: int) -> list[float]:
    return [float(((j * 37 + d * 17) % 19) - 9) for d in range(dim)]


def plane_sql(j: int, dim: int) -> str:
    vals = ", ".join(repr(v) for v in plane(j, dim))
    return f"([{vals}]::DOUBLE[])"


def lsh_bucket(vec: Column, dim: int) -> Column:
    """Bucket id in [0, 2^N_PLANES): bit j = (dot(vec, plane_j) >= 0)."""
    bucket = F.lit(0)
    for j in range(N_PLANES):
        p = F.array(*[F.lit(v) for v in plane(j, dim)])
        bit = F.when(dot(vec, p) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("bigint")


def lsh_bucket_sql(vec: str, dim: int) -> str:
    from ..functions.vectors import dot_sql

    terms = []
    for j in range(N_PLANES):
        terms.append(
            f"(CASE WHEN {dot_sql(vec, plane_sql(j, dim))} >= 0 THEN {1 << j} ELSE 0 END)"
        )
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, window-ranked.

    Expects ``queries(q_id, q_vec)`` / ``corpus(c_id, c_vec)`` with double
    arrays. Deterministic tie-break on corpus id.
    """
    # norms once per vector (not per pair): cos = dot/(nq*nc) is the same
    # arithmetic and fold order as cosine(), so values stay bitwise equal
    # while the per-pair cost drops from three array folds to one
    q = queries.withColumn("__nq", norm(F.col("q_vec")))
    c = corpus.withColumn("__nc", norm(F.col("c_vec")))
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "cos_sim",
        F.round(dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__nq") * F.col("__nc")), 6),
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        pairs.filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def centroid_fold(
    vectors: DataFrame,
    keys: tuple[str, ...],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_count: bool = False,
    already_double: bool = False,
) -> DataFrame:
    """Deterministic per-key mean vector: posexplode + groupBy(keys, pos)
    with the per-dimension mean as a SEQUENTIAL left-fold over members
    sorted by ``id_col`` — the one bitwise-critical centroid kernel,
    shared by ivf_centroids (keys=("label",)), PQ codebook training
    (keys=("sub", "code")) and embedding_drift (keys=("label", "half")).
    Returns keys + ``centroid`` (+ ``n_members``). See ivf_centroids for
    the cost/discipline discussion."""
    vec = F.col(vec_col) if already_double else to_double(F.col(vec_col))
    exploded = vectors.select(
        *keys,
        F.col(id_col).alias("__i"),
        F.posexplode(vec).alias("__pos", "__x"),
    )
    per_dim = exploded.groupBy(*keys, "__pos").agg(
        F.array_sort(F.collect_list(F.struct("__i", "__x"))).alias("__xs")
    )
    m = F.aggregate(
        F.col("__xs"), F.lit(0.0), lambda acc, s: acc + s.getField("__x")
    ) / F.size("__xs")
    per_dim = per_dim.select(
        *keys, "__pos", m.alias("__m"), F.size("__xs").cast("bigint").alias("__cnt")
    )
    out = per_dim.groupBy(*keys).agg(
        F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pm"),
        # cnt is the member count, constant across pos within a key
        F.min("__cnt").alias("n_members"),
    )
    cols = [
        *keys,
        F.transform(F.col("__pm"), lambda s: s.getField("__m")).alias("centroid"),
    ]
    if with_count:
        cols.append(F.col("n_members"))
    return out.select(*cols)


def ivf_centroids(
    vectors: DataFrame, dim: int, id_col: str = "vec_id", with_count: bool = False
) -> DataFrame:
    """Per-label mean vector via posexplode + groupBy — one distributed agg.

    The per-dimension mean is computed as a SEQUENTIAL left-fold over members
    sorted by ``id_col`` (collect_list -> array_sort -> aggregate), not
    ``F.avg``: float addition is order-dependent, and a fixed fold order makes
    the centroid bitwise deterministic across partitionings and engines — the
    DuckDB oracle runs the identical fold (``list(x ORDER BY vec_id)`` +
    ``list_reduce``). Cost: members of one (label, pos) group materialize as
    one array; cell population per label is the IVF design bound (k-means-ish
    balance), so the array stays executor-sized at scale.

    ``with_count=True`` adds an ``n_members`` column carried through the same
    aggregate — callers that also need cluster sizes (k-means refinement)
    get them without a second pass over the input."""
    return centroid_fold(
        vectors, ("label",), id_col=id_col, with_count=with_count
    )


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, dim: int, k: int, nprobe: int = 2
) -> DataFrame:
    """Assign corpus to nearest centroid; queries probe nprobe cells."""
    cents = ivf_centroids(vectors, dim)

    # centroid and vector norms once each (not per pair): identical values
    # (same fold), k fewer norm folds per vector during assignment
    cents_n = cents.withColumn("__ncent", norm(F.col("centroid")))

    def nearest_cells(df: DataFrame, vec_col: str, n: int, out: str) -> DataFrame:
        scored = (
            df.withColumn("__nv", norm(F.col(vec_col)))
            .crossJoin(F.broadcast(cents_n))
            .withColumn(
                "cell_sim",
                dot(F.col(vec_col), F.col("centroid"))
                / (F.col("__nv") * F.col("__ncent")),
            )
        )
        w = W.partitionBy(df.columns[0]).orderBy(
            F.col("cell_sim").desc(), F.col("label")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .select(*df.columns, F.col("label").alias(out))
        )

    corpus = vectors.select(
        F.col("vec_id").alias("c_id"), to_double(F.col("embedding")).alias("c_vec")
    )
    corpus_cells = nearest_cells(corpus, "c_vec", 1, "cell")
    q_cells = nearest_cells(queries.select("q_id", "q_vec"), "q_vec", nprobe, "cell")

    cand = q_cells.join(corpus_cells, "cell").filter(F.col("q_id") != F.col("c_id"))
    scored = cand.withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )
