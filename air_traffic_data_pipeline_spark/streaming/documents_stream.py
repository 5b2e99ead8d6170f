"""Streaming incremental near-duplicate dedup of a document stream.

The rolling-crawl-ingestion flagship: documents arrive in micro-batches;
each batch is MinHash-banded and checked against the ACCUMULATED corpus
state (signature + shingle-set table landed per batch), verified pairs add
their higher-id member to the kill list, and the batch's own state is
appended. Because the staged batches partition the corpus in doc_id order,
every (doc_a < doc_b) verified pair is found exactly once — in doc_b's
batch — so the union of per-batch kills equals the one-shot batch kill
list and the surviving set is BITWISE identical to
``plans.llm.near_dup_survivors``. That batch query's SQL is this query's
oracle.

At 100 TB: per-batch work is (batch bands) ⋈ (corpus bands) — an
equi-join on the band key, never all-pairs; the corpus state is cell-keyed
parquet appended per batch (swap for a table format in production); the
kill list is digest-sized. Nothing reprocesses old raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..session import tune_session
from .events_stream import _STAGE_ROOT

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

JACCARD_MIN = 0.2  # same verify threshold as plans.llm.minhash_near_dup_pairs


def _stage_doc_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three mtime-ordered batches partitioning documents by doc_id
    terciles (maxFilesPerTrigger=1 -> one file per micro-batch, in id
    order). Id-ordered arrival makes every a<b pair land in b's batch."""
    import hashlib

    from ..plans.tables import load
    from .events_stream import _stage_ordered

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/docs_{key}"

    def build():
        from pyspark.sql import Window

        docs = load(spark, sf_dir, "documents")
        n = docs.count()
        lo, hi = n // 3, 2 * n // 3
        ranked = docs.withColumn(
            "rn", F.row_number().over(Window.orderBy("doc_id"))
        )
        return [
            ranked.filter(F.col("rn") <= lo).drop("rn"),
            ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop("rn"),
            ranked.filter(F.col("rn") > hi).drop("rn"),
        ]

    return _stage_ordered(
        d, ["01_lo.parquet", "02_mid.parquet", "03_hi.parquet"], build
    )


def incremental_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors after streaming incremental near-dup dedup — bitwise equal
    to the one-shot ``near_dup_survivors`` (its SQL is the oracle)."""
    import os
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import _band_rows, doc_tbl_from
    from ..plans.tables import load

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_state_{_uuid.uuid4().hex[:8]}"
    state_dir = f"{base}/doc_tbl"
    kills_dir = f"{base}/kills"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        # land THIS batch's doc table first, then read both sides back from
        # parquet: the expensive shingle explode + aggregate executes exactly
        # once per batch (the write), instead of once per lazy consumer —
        # the batch sibling of _minhash_doc_tbl's persist (its docstring
        # measures the recompute at ~2x runtime). mode=overwrite on the
        # epoch-scoped path makes the state write idempotent under
        # foreachBatch's at-least-once batch replay (a retry of epoch N
        # rewrites batch=N instead of duplicating its rows).
        doc_tbl_from(batch_df).write.mode("overwrite").parquet(
            f"{state_dir}/batch={epoch_id}"
        )
        batch_tbl = spark.read.parquet(f"{state_dir}/batch={epoch_id}")
        all_tbl = spark.read.parquet(f"{state_dir}/batch=*")
        # candidates: any band shared between an incoming doc (b side) and
        # any earlier-id doc already present (corpus or same batch)
        a = _band_rows(all_tbl).alias("a")
        b = _band_rows(batch_tbl).alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        a_side = all_tbl.select(F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a"))
        b_side = batch_tbl.select(F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b"))
        n_common = F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b"))).cast("long")
        kills = (
            a_side.join(cand, "doc_a")
            .join(b_side, "doc_b")
            .withColumn("n_common", n_common)
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_common").cast("double")
                    / (
                        F.size("arr_a") + F.size("arr_b") - F.col("n_common")
                    ).cast("double"),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= JACCARD_MIN)
            .select("doc_b")
            .distinct()
        )
        # same idempotence discipline for the kill list: epoch-scoped
        # overwrite, unioned back with a batch=* glob at the end
        kills.write.mode("overwrite").parquet(f"{kills_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        docs = load(spark, sf_dir, "documents")
        kills = (
            spark.read.parquet(f"{kills_dir}/batch=*")
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
            if os.path.isdir(kills_dir)
            else spark.createDataFrame([], "doc_id long")
        )
        out = docs.join(kills, "doc_id", "left_anti").select(
            "doc_id", "lang", "n_chars"
        )
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental URL-canonicalization dedup — bitwise equal to
    the one-shot ``plans.llm.url_dedup`` (its SQL is the oracle).

    The crawl-frontier shape of the incremental-MV family: every
    micro-batch canonicalizes ONLY its own URLs and lands a per-canonical
    partial (crawl count, max doc_id, that max's raw url); the final
    answer is one re-aggregate over the partials. All three outputs are
    distributive (sum of counts, max of maxes, max_by carried through the
    max), so the merge is exact whatever the arrival order — per-batch
    state is canonical-key-sized and old batches are never re-read beyond
    their partial rows. Idempotent under foreachBatch replay via the
    epoch-scoped overwrite discipline shared with the streams above.
    """
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import canonical_url, raw_urls_from

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_urls_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        partial = (
            raw_urls_from(batch_df)
            .select(
                "doc_id", "url", canonical_url(F.col("url")).alias("canonical_url")
            )
            .groupBy("canonical_url")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.max("doc_id").alias("max_doc"),
                F.max_by("url", "doc_id").alias("url_of_max"),
            )
        )
        partial.write.mode("overwrite").parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("canonical_url")
            .agg(
                F.sum("cnt").cast("bigint").alias("n_crawls"),
                F.max("max_doc").alias("kept_doc_id"),
                F.max_by("url_of_max", "max_doc").alias("kept_url"),
            )
        )
        out, _ = tracked_local_checkpoint(merged, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental BM25 index maintenance — bitwise equal to the
    one-shot ``plans.llm.bm25_topk`` (its SQL is the oracle).

    Micro-batches maintain BM25's sufficient statistics and the
    query-term posting slice: per batch, ONE (n_docs, sum_dl) stats
    partial (distributive int64 sums) and the batch's own
    (doc_id, dl, w, tf) postings for the fixed query terms. A document
    lives in exactly one batch, so postings are append-only facts never
    revisited; the int64 stats merge exactly under any arrival order.
    The final answer derives N and avgdl from the merged partials
    (identical cast-then-divide as the batch query), df from the
    accumulated postings, and ranks through the SHARED
    ``bm25_rank_from`` kernel — formula and fold order cannot drift.

    At 100 TB: per-batch state is query-term-posting sized (|terms| x
    docs-containing, never the token stream); old text is never
    re-tokenized — only its posting rows re-aggregate. Epoch-scoped
    overwrite = replay-idempotent like the sibling streams.
    """
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import BM25_MAX_ID, BM25_TERMS, bm25_rank_from

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_bm25_{_uuid.uuid4().hex[:8]}"
    stats_dir = f"{base}/stats"
    post_dir = f"{base}/postings"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        docs = (
            batch_df.filter(F.col("doc_id") < BM25_MAX_ID)
            .select("doc_id", F.split(F.col("text"), " ").alias("ws"))
            .select("doc_id", F.size("ws").cast("bigint").alias("dl"), "ws")
        )
        stats = docs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("sdl"),
        )
        stats.write.mode("overwrite").parquet(f"{stats_dir}/batch={epoch_id}")
        tf = (
            docs.select("doc_id", "dl", F.explode("ws").alias("w"))
            .filter(F.col("w").isin(*BM25_TERMS))
            .groupBy("doc_id", "dl", "w")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        tf.write.mode("overwrite").parquet(f"{post_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = spark.read.parquet(f"{stats_dir}/batch=*").agg(
            F.sum("sdl").cast("bigint").alias("sdl"),
            F.sum("n").cast("bigint").alias("n"),
        )
        avgdl = merged.select(
            (F.col("sdl").cast("double") / F.col("n").cast("double")).alias("avgdl"),
            F.col("n").cast("double").alias("n_docs"),
        )
        tf = spark.read.parquet(f"{post_dir}/batch=*")
        out, _ = tracked_local_checkpoint(bm25_rank_from(tf, avgdl), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _stage_emb_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three mtime-ordered micro-batches partitioning embeddings by
    vec_id MODULO 3 (arriving 1, 2, 0) — deliberately NOT id-ordered, so
    a pair's higher id routinely arrives before its lower id and the
    kill logic must be arrival-order independent (the pytest and oracle
    would catch a second-member-only formulation)."""
    import hashlib

    from ..plans.tables import load
    from .events_stream import _stage_ordered

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/emb_{key}"

    def build():
        e = load(spark, sf_dir, "embeddings")
        return [e.filter(F.col("vec_id") % 3 == m) for m in (1, 2, 0)]

    return _stage_ordered(
        d, ["01_m1.parquet", "02_m2.parquet", "03_m0.parquet"], build
    )


def incremental_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental SemDeDup — bitwise equal to the one-shot
    ``plans.llm.semdedup_cells`` (its SQL is the oracle) under ANY
    arrival order.

    The quantizer is FROZEN up front — the production SemDeDup posture:
    coarse centroids are trained offline and held fixed while data
    streams in. One setup pass computes the deterministic IVF centroids
    and each cell's subcell arity (ceil(|cell|/TARGET), sized from the
    reference corpus) and lands them once. Each micro-batch then assigns
    ONLY its own vectors to (cell, subcell) with the frozen quantizer
    (identical expressions to the batch query, so assignments are
    bitwise the same), lands them in the accumulated store, and checks
    in-subcell pairs between the store and the batch: every epsilon pair
    contributes its HIGHER vec_id to the kill list whichever side of the
    join it arrived on (greatest(a, b), not "the batch member") — so a
    pair flags in the batch where its SECOND member lands, whatever the
    order. The staged batches deliberately interleave vec_id mod 3 to
    exercise exactly that. Kills are append-only and idempotent under
    foreachBatch replay via the epoch-scoped overwrite discipline.

    At 100 TB: per-batch work is (batch rows) ⋈ (store rows) on the
    (cell, subcell) equi-key with in-subcell population capped at the
    quantizer's TARGET, centroids are a broadcast-sized table read per
    batch, and old vectors are never re-scored — only their stored
    (v, nv, cell, subcell) rows join.
    """
    import shutil
    import uuid as _uuid

    from pyspark.sql import Window as W

    from ..functions.vectors import dot, norm, to_double
    from ..operators.checkpoints import tracked_local_checkpoint
    from ..operators.similarity import ivf_centroids
    from ..plans.llm import (
        EMB_DIM,
        EMB_NEAR_DUP_THRESHOLD,
        SEMDEDUP_TARGET_CELL,
        _SUBCELL_HASH,
    )
    from ..plans.tables import load

    tune_session(spark)
    d = _stage_emb_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_sem_{_uuid.uuid4().hex[:8]}"
    quant_dir = f"{base}/quant"
    state_dir = f"{base}/state"
    kills_dir = f"{base}/kills"

    e = load(spark, sf_dir, "embeddings")

    def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
        """Nearest-centroid + frozen-arity subcell assignment — the exact
        expression chain of ``plans.llm._semdedup_cell_rows`` (cell_sim =
        dot/(nv·ncent), ties on label; Knuth multiplicative subcell
        hash), so streamed assignments are bitwise the batch query's."""
        corpus = vecs.select(
            "vec_id", to_double(F.col("embedding")).alias("v")
        ).withColumn("nv0", norm(F.col("v")))
        scored = corpus.crossJoin(F.broadcast(cents)).withColumn(
            "cell_sim",
            dot(F.col("v"), F.col("centroid")) / (F.col("nv0") * F.col("ncent")),
        )
        w = W.partitionBy("vec_id").orderBy(F.col("cell_sim").desc(), F.col("label"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "vec_id", "v", F.col("nv0").alias("nv"), F.col("label").alias("cell")
            )
        )

    # setup pass: train + freeze the quantizer (centroids and subcell arity)
    cents = ivf_centroids(e, EMB_DIM).withColumn("ncent", norm(F.col("centroid")))
    cents.write.mode("overwrite").parquet(f"{quant_dir}/cents")
    cents_q = spark.read.parquet(f"{quant_dir}/cents")
    t = SEMDEDUP_TARGET_CELL
    sizes = (
        _assign(e, cents_q)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cell_n"))
        .withColumn("n_sub", F.expr(f"(cell_n + {t - 1}) div {t}"))
        .select("cell", "n_sub")
    )
    sizes.write.mode("overwrite").parquet(f"{quant_dir}/sizes")

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        cents_b = spark.read.parquet(f"{quant_dir}/cents")
        sizes_b = spark.read.parquet(f"{quant_dir}/sizes")
        assigned = (
            _assign(batch_df, cents_b)
            .join(F.broadcast(sizes_b), "cell")
            .withColumn(
                "subcell", F.expr(_SUBCELL_HASH.format(v="vec_id") + " % n_sub")
            )
            .drop("n_sub")
        )
        assigned.write.mode("overwrite").parquet(f"{state_dir}/batch={epoch_id}")
        batch_tbl = spark.read.parquet(f"{state_dir}/batch={epoch_id}")
        all_tbl = spark.read.parquet(f"{state_dir}/batch=*")
        a, b = all_tbl.alias("a"), batch_tbl.alias("b")
        cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))
        kills = (
            a.join(
                b,
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.subcell") == F.col("b.subcell"))
                & (F.col("a.vec_id") != F.col("b.vec_id")),
            )
            .withColumn("cos_sim", F.round(cos, 6))
            .filter(F.col("cos_sim") >= EMB_NEAR_DUP_THRESHOLD)
            .select(F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_id"))
            .distinct()
        )
        kills.write.mode("overwrite").parquet(f"{kills_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(EMB_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        import os

        kills = (
            spark.read.parquet(f"{kills_dir}/batch=*").distinct()
            if os.path.isdir(kills_dir)
            else spark.createDataFrame([], "vec_id long")
        )
        out = e.join(kills, "vec_id", "left_anti").select("vec_id", "label")
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _winnow_store_flags(
    spark: SparkSession, fp_dir: str, flags_dir: str, batch_df: DataFrame, epoch_id: int
) -> None:
    """Land THIS batch's winnow fingerprints in the accumulated store and
    emit matched-site flags for the grams it touched — the ONE home of the
    incremental span-dedup step (shared by the standalone mirror and the
    composed pipeline mirror, which must compute the identical matched
    set). Both sites of a late-arriving repeat flag in the later batch,
    so accumulated flags equal the batch query's matched set under ANY
    arrival order; epoch-scoped overwrite = replay-idempotent."""
    from ..plans.llm import winnow_fp_from

    winnow_fp_from(batch_df).write.mode("overwrite").parquet(
        f"{fp_dir}/batch={epoch_id}"
    )
    batch_fp = spark.read.parquet(f"{fp_dir}/batch={epoch_id}")
    all_fp = spark.read.parquet(f"{fp_dir}/batch=*")
    touched = all_fp.join(
        batch_fp.select("h", "gram").distinct(), ["h", "gram"], "leftsemi"
    )
    repeated = (
        touched.groupBy("h", "gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("h", "gram")
    )
    flags = (
        touched.join(repeated, ["h", "gram"], "leftsemi")
        .select("doc_id", "fp_pos")
        .distinct()
    )
    flags.write.mode("overwrite").parquet(f"{flags_dir}/batch={epoch_id}")


def incremental_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental repeated-span detection — bitwise equal to the
    one-shot ``plans.llm.repeated_spans`` (its SQL is the oracle).

    Each micro-batch winnows ONLY its own documents and lands the selected
    fingerprints in the accumulated store; matched sites for grams touched
    by this batch are emitted from (store ∪ batch) — so when doc_b arrives
    repeating doc_a's span, BOTH sites flag in b's batch, and the union of
    per-batch flags equals the batch query's matched-site set whatever the
    arrival order. The final span merge + accounting runs once on the
    accumulated flags via the shared ``repeated_span_accounting`` kernel.

    At 100 TB: per-batch work is (batch grams) ⋈ (store grams) — a
    (h, gram)-keyed aggregate over a semi-joined slice of the store, never
    a rescan of old text; the store is fingerprint rows (~0.4 per gram),
    and flags are (doc_id, pos) pairs. Idempotent under foreachBatch
    replay via epoch-scoped overwrite like the near-dup stream above.
    """
    import os
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import repeated_span_accounting
    from ..plans.tables import load

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_winnow_{_uuid.uuid4().hex[:8]}"
    fp_dir = f"{base}/fp"
    flags_dir = f"{base}/flags"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        _winnow_store_flags(spark, fp_dir, flags_dir, batch_df, epoch_id)

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        matched = (
            spark.read.parquet(f"{flags_dir}/batch=*").distinct()
            if os.path.isdir(flags_dir)
            else spark.createDataFrame([], "doc_id long, fp_pos long")
        )
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        out = repeated_span_accounting(matched, docs)
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental cross-source 13-gram overlap — bitwise equal
    to the one-shot ``plans.llm.cross_source_overlap`` (its SQL is the
    oracle), under ANY arrival order.

    Each micro-batch lands ONLY its own DISTINCT (gram, source) rows; the
    accumulated state is the distinct union of the partials — set union is
    idempotent, commutative, and associative, so the merged frame equals
    the batch query's DISTINCT frame whatever the file source's slicing —
    and the pair matrix runs the SAME shared ``cross_source_matrix`` tail
    on it. Per-batch state is (new grams x sources)-sized; history is
    never re-read beyond the partial rows. Idempotent under foreachBatch
    replay via the epoch-scoped overwrite discipline shared with the
    streams above.
    """
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..functions.text import exploded_shingles
    from ..plans.llm import CROSS_SOURCE_K, cross_source_matrix

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_xsrc_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        partial = (
            exploded_shingles(
                batch_df.select("text", "source"), "text", CROSS_SOURCE_K, "g"
            )
            .select(F.md5("g").alias("g"), "source")
            .distinct()
        )
        partial.write.mode("overwrite").parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = spark.read.parquet(f"{part_dir}/batch=*").distinct()
        out = cross_source_matrix(merged)
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental preference-pair maintenance — bitwise equal
    to the one-shot ``plans.llm.preference_pairs`` (its SQL is the
    oracle), under ANY arrival order.

    The lexicographic-struct-extreme case of the incremental-MV family:
    each micro-batch lands per-source partials (count, max/min of the
    (score, -doc_id) key struct); struct MAX/MIN are associative and
    commutative, and counts are sums, so the merged extremes equal the
    one-shot aggregate whatever the slicing — per-batch state is one row
    per touched source. The final margin/gate projection runs on the
    |sources|-sized merged state. Idempotent under foreachBatch replay
    via the epoch-scoped overwrite discipline shared with the streams
    above.
    """
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..functions.text import quality_score

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_pref_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        key = F.struct(
            quality_score(F.col("text")).alias("score"),
            (-F.col("doc_id")).alias("nid"),
        )
        partial = (
            batch_df.select("source", key.alias("k"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.max("k").alias("ch"),
                F.min("k").alias("rj"),
            )
        )
        partial.write.mode("overwrite").parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("source")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.max("ch").alias("ch"),
                F.min("rj").alias("rj"),
            )
            .filter(F.col("n_docs") >= 2)
        )
        out = merged.select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            (-F.col("ch.nid")).cast("bigint").alias("chosen_doc"),
            F.col("ch.score").alias("chosen_score"),
            (-F.col("rj.nid")).cast("bigint").alias("rejected_doc"),
            F.col("rj.score").alias("rejected_score"),
            F.round(F.col("ch.score") - F.col("rj.score"), 6).alias("margin"),
        ).filter(F.col("margin") > 0)
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental token-budget planner — bitwise equal to the
    one-shot ``plans.llm.token_budget_plan`` (its SQL is the oracle).

    The pure integer-weight case of the incremental-MV family: each
    micro-batch lands per-(source, rate ladder) integer partials (doc
    count, token sum); the merge is a sum of sums, and the allocation
    math (weights, epochs) runs on the merged totals via the shared
    ``token_budget_from_per_source`` kernel. Everything before the final
    double division is integer arithmetic, so arrival order provably
    cannot change the plan — the easiest possible mergeability proof,
    which is exactly why the re-aggregate pattern applies unchanged."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import mixing_rate_tenths, token_budget_from_per_source

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_tokbudget_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        partial = (
            batch_df.select(
                "source",
                mixing_rate_tenths().alias("rate_tenths"),
                F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
            )
            .groupBy("source", "rate_tenths")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_tok").cast("bigint").alias("n_tokens"),
            )
        )
        partial.write.mode("overwrite").parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        per = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("source", "rate_tenths")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
        )
        out, _ = tracked_local_checkpoint(
            token_budget_from_per_source(per), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _incremental_stateless(
    spark: SparkSession, sf_dir: str, tag: str, score_batch
) -> DataFrame:
    """Shared shape for PER-DOC STATELESS streaming mirrors (gopher,
    readability): each micro-batch is scored independently with the batch
    kernel and appended as an epoch-scoped partial; the final answer is
    the plain union of partials — no merge step at all, because stateless
    per-row scoring commutes with any partitioning of the stream. The
    trivial end of the incremental-MV spectrum, included so the streaming
    surface spans the whole range: stateless -> integer re-aggregate
    (token budget) -> distributive state + emission recompute (RFM) ->
    cross-batch store joins (repeated spans / semdedup)."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_{tag}_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        score_batch(batch_df).write.mode("overwrite").parquet(
            f"{part_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out, _ = tracked_local_checkpoint(
            spark.read.parquet(f"{part_dir}/batch=*"), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Gopher rule audit — bitwise equal to plans.llm.gopher_rules
    (its SQL is the oracle); per-doc stateless, so batch outputs union."""
    from ..plans.llm import gopher_rules_from

    return _incremental_stateless(spark, sf_dir, "gopher", gopher_rules_from)


def incremental_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming readability scoring — bitwise equal to
    plans.llm.readability_score (its SQL is the oracle)."""
    from ..plans.llm import readability_from

    return _incremental_stateless(
        spark, sf_dir, "readability", readability_from
    )


def incremental_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental classifier-calibration audit — bitwise equal
    to the one-shot ``plans.llm.classifier_calibration`` (its SQL is the
    oracle).

    Both scorers are per-doc STATELESS (the hashing-trick weights are a
    deterministic constant; the Gopher rules are structural), so each
    micro-batch lands its (doc_id, clf_score, label) rows and the global
    reliability deciles + ECE re-aggregate at emission through the shared
    ``calibration_from`` tail — the diagram is corpus-global (bin means
    and the ECE weights shift with every batch), which is exactly why the
    emission recompute over per-doc partial ROWS (never raw text) is the
    right split. Epoch-scoped overwrite = replay-idempotent."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import (
        calibration_from,
        feature_hashing_from,
        gopher_rules_from,
    )

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_calib_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/scored"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        clf = feature_hashing_from(batch_df).select("doc_id", "clf_score")
        gop = gopher_rules_from(batch_df).select(
            "doc_id", F.col("passes").cast("bigint").alias("label")
        )
        clf.join(gop, "doc_id").write.mode("overwrite").parquet(
            f"{part_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            calibration_from(spark.read.parquet(f"{part_dir}/batch=*")),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Kneser-Ney LM scoring — bitwise equal to the
    one-shot ``plans.llm.lm_kneser_ney`` (its SQL is the oracle).

    The corpus-global-LM case (the doremi posture): each micro-batch
    lands its positional bigram stream (tokenize once; raw text never
    re-read); because ALL FIVE KN count tables — bigram, context, the two
    continuation-TYPE tables, total bigram types — are integer aggregates
    of the merged stream, per-doc scores are only final when the stream
    drains, so emission re-aggregates and scores through the shared
    ``lm_kn_from_pairs`` kernel; every fold inside it is position-pinned,
    so arrival order cannot move a perplexity."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import lm_bigram_pairs, lm_kn_from_pairs

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_kn_{_uuid.uuid4().hex[:8]}"
    pairs_dir = f"{base}/pairs"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        lm_bigram_pairs(batch_df.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(f"{pairs_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            lm_kn_from_pairs(spark.read.parquet(f"{pairs_dir}/batch=*")),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Heaps'-law fit — bitwise equal to the
    one-shot ``plans.llm.heaps_law_fit`` (its SQL is the oracle).

    Each micro-batch lands two partial families: per-doc (doc_id, n_tok)
    token counts (doc ids are unique, so the merge is plain union) and a
    per-batch (w, min doc_id) first-occurrence table — MIN is
    associative/commutative, so merging batch minima by MIN equals the
    corpus minimum under ANY arrival order. Emission pushes the merged
    partials through the shared ``heaps_fit_from`` tail (boundaries come
    from the merged max doc_id, so checkpoints are final only when the
    stream drains — the corpus-global posture). Raw text is tokenized
    once; state is doc-count + vocabulary sized, never re-read."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import heaps_fit_from

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_heaps_{_uuid.uuid4().hex[:8]}"
    docs_dir = f"{base}/docs"
    first_dir = f"{base}/first"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        b = batch_df.select(
            "doc_id",
            F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("ws"),
        )
        b.select("doc_id", F.size("ws").cast("bigint").alias("n_tok")).write.mode(
            "overwrite"
        ).parquet(f"{docs_dir}/batch={epoch_id}")
        b.select("doc_id", F.explode("ws").alias("w")).groupBy("w").agg(
            F.min("doc_id").alias("fd")
        ).write.mode("overwrite").parquet(f"{first_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        docs = spark.read.parquet(f"{docs_dir}/batch=*")
        first = (
            spark.read.parquet(f"{first_dir}/batch=*")
            .groupBy("w")
            .agg(F.min("fd").alias("fd"))
        )
        out, _ = tracked_local_checkpoint(
            heaps_fit_from(docs, first), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental temperature-scaling fit — bitwise equal to
    the one-shot ``plans.llm.temperature_scaling`` (its SQL is the
    oracle).

    The strongest member of the incremental-MV family: because the batch
    query's per-doc doubles are quantized to fixed-point BIGINT units
    BEFORE aggregation, each micro-batch lands <=80 (t, bin) integer
    partial rows (not per-doc rows) and emission is a sum-of-sums merge
    through the shared ``temperature_finish`` tail — exact integer
    addition is order-free, so arrival order provably cannot move the
    fitted temperature. State is O(|grid| x bins) per batch, independent
    of corpus size; raw text is read once."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import (
        feature_hashing_from,
        gopher_rules_from,
        temperature_bin_partials,
        temperature_finish,
    )

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_temp_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        clf = feature_hashing_from(batch_df).select("doc_id", "clf_score")
        gop = gopher_rules_from(batch_df).select(
            "doc_id", F.col("passes").cast("bigint").alias("label")
        )
        temperature_bin_partials(clf.join(gop, "doc_id")).write.mode(
            "overwrite"
        ).parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("t", "bin")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("p_u").cast("bigint").alias("p_u"),
                F.sum("n_pass").cast("bigint").alias("n_pass"),
                F.sum("nll_u").cast("bigint").alias("nll_u"),
            )
        )
        out, _ = tracked_local_checkpoint(
            temperature_finish(merged), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental DoReMi domain reweighting — bitwise equal to
    the one-shot ``plans.llm.doremi_weights`` (its SQL is the oracle).

    The corpus-global-LM case of the incremental-MV family, sharing the
    composed pipeline's posture: each micro-batch lands its positional
    bigram stream (tokenize once) plus a (doc_id, source) map; because the
    LM tables are corpus-global, per-doc xent is only final when the
    stream drains, so emission re-aggregates the integer n-gram tables
    from the merged stream and runs the shared ``lm_logprob_from_pairs``
    + ``doremi_from`` kernels — every fold inside them is pinned, so
    arrival order cannot move a weight. State is posting-sized partials;
    raw text is never re-read."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import doremi_from, lm_bigram_pairs, lm_logprob_from_pairs

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_doremi_{_uuid.uuid4().hex[:8]}"
    pairs_dir = f"{base}/pairs"
    src_dir = f"{base}/src"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        lm_bigram_pairs(batch_df.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(f"{pairs_dir}/batch={epoch_id}")
        batch_df.select("doc_id", "source").write.mode("overwrite").parquet(
            f"{src_dir}/batch={epoch_id}"
        )

    try:
        src_stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src_stream.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        lm = lm_logprob_from_pairs(
            spark.read.parquet(f"{pairs_dir}/batch=*")
        ).select("doc_id", "xent")
        src = spark.read.parquet(f"{src_dir}/batch=*")
        out, _ = tracked_local_checkpoint(doremi_from(lm, src), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental mirror of the COMPOSED curation stack — bitwise
    equal to the one-shot ``plans.llm.pretrain_pipeline_v2`` (its SQL is the
    oracle): URL dedup -> Gopher gate -> LM cross-entropy gate -> repeated-
    span drop -> survivor-distribution temperature sampling -> release
    accounting, maintained incrementally across micro-batches.

    Each stage lands exactly the partial its standalone mirror established:
    - URL keeps: per-canonical (max doc_id) partials — max of maxes.
    - Gopher passes: stateless per-doc flags, plain union.
    - LM gate: the batch's positional bigram stream (tokenize once — the
      bm25-postings discipline: raw text is never re-tokenized); the global
      bigram/context/V tables re-aggregate from the merged stream at
      emission time, because a corpus-global LM changes with EVERY batch —
      per-doc xent is only final once the stream is drained, so scoring
      runs once, on merged integer tables, through the shared
      ``lm_logprob_from_pairs`` kernel.
    - Repeated spans: winnow fingerprints into the accumulated store,
      matched-site flags emitted per batch (both sites flag in the later
      batch — arrival-order-free, as incremental_repeated_spans proves).
    - Doc meta: (doc_id, lang, n_words) so emission-time accounting never
      re-reads text.
    The composition itself adds NO new merge math: the gates are id-keyed
    semi/anti joins of the merged keep/drop sets, and the release tail is
    the shared ``pretrain_release_accounting`` kernel (counts + int64 sums,
    order-free by construction). Idempotent under foreachBatch replay via
    the epoch-scoped overwrite discipline shared with the sibling streams.

    At 100 TB: per-batch work is the batch's own tokenize/winnow plus
    (batch grams) ⋈ (store grams); state is posting/fingerprint/meta rows,
    never raw text; emission re-aggregates tables that are distinct-gram-
    sized, not corpus-sized."""
    import shutil
    import uuid as _uuid

    from ..functions.text import word_count
    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import (
        PIPE2_MAX_REPEATED,
        XENT_MAX,
        canonical_url,
        gopher_rules_from,
        lm_bigram_pairs,
        lm_logprob_from_pairs,
        pretrain_release_accounting,
        raw_urls_from,
        repeated_span_accounting_words,
    )

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_pipe2_{_uuid.uuid4().hex[:8]}"
    url_dir = f"{base}/urls"
    gop_dir = f"{base}/gopher"
    pairs_dir = f"{base}/pairs"
    fp_dir = f"{base}/fp"
    flags_dir = f"{base}/flags"
    meta_dir = f"{base}/meta"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        urls = (
            raw_urls_from(batch_df)
            .select("doc_id", canonical_url(F.col("url")).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.max("doc_id").alias("max_doc"))
        )
        urls.write.mode("overwrite").parquet(f"{url_dir}/batch={epoch_id}")
        gop = (
            gopher_rules_from(batch_df)
            .filter(F.col("passes") == 1)
            .select("doc_id")
        )
        gop.write.mode("overwrite").parquet(f"{gop_dir}/batch={epoch_id}")
        lm_bigram_pairs(batch_df.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(f"{pairs_dir}/batch={epoch_id}")
        # repeated-span store + per-batch matched-site flags — the shared
        # incremental span-dedup step (one home with the standalone mirror)
        _winnow_store_flags(spark, fp_dir, flags_dir, batch_df, epoch_id)
        meta = batch_df.select(
            "doc_id", "lang", word_count(F.col("text")).alias("n_words")
        )
        meta.write.mode("overwrite").parquet(f"{meta_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        url_keep = (
            spark.read.parquet(f"{url_dir}/batch=*")
            .groupBy("canonical_url")
            .agg(F.max("max_doc").alias("doc_id"))
            .select("doc_id")
        )
        gop = spark.read.parquet(f"{gop_dir}/batch=*")
        ppl = (
            lm_logprob_from_pairs(spark.read.parquet(f"{pairs_dir}/batch=*"))
            .filter(F.col("xent") <= XENT_MAX)
            .select("doc_id")
        )
        meta = spark.read.parquet(f"{meta_dir}/batch=*")
        # flags_dir always exists: _update writes (possibly empty) flags
        # every epoch and the staging always yields >=1 batch — an isdir
        # fallback here would be dead code (review finding), and the four
        # sibling reads above are deliberately unguarded for the same reason
        matched = spark.read.parquet(f"{flags_dir}/batch=*").distinct()
        heavy = (
            repeated_span_accounting_words(
                matched, meta.select("doc_id", F.col("n_words").alias("doc_words"))
            )
            .filter(F.col("repeated_frac") > PIPE2_MAX_REPEATED)
            .select("doc_id")
        )
        surv = (
            meta.join(url_keep, "doc_id", "leftsemi")
            .join(gop, "doc_id", "leftsemi")
            .join(ppl, "doc_id", "leftsemi")
            .join(heavy, "doc_id", "left_anti")
        )
        out = pretrain_release_accounting(
            surv.select("doc_id", "lang", F.col("n_words").alias("n_tok"))
        )
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-retraining streaming Naive Bayes — bitwise equal to
    the one-shot ``plans.llm.naive_bayes_langid`` (its SQL is the oracle).

    The classifier mirror the counting-model family makes possible: the
    MODEL is integer count tables (per-class token counts, class doc
    counts) and the EVAL side is per-doc token counts — all three are
    distributive, so each micro-batch lands its partials and the model
    retrains exactly at every emission by BIGINT merge. The confusion
    matrix is corpus-global twice over (every batch moves the model AND
    adds held-out docs; a later train batch can flip an earlier doc's
    argmax), so emission reruns the shared model-build + scoring kernel
    over merged partials — over token-count ROWS, never raw text.
    Epoch-scoped overwrite = replay-idempotent."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import nb_confusion_from_partials, nb_partials

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_nb_{_uuid.uuid4().hex[:8]}"
    dirs = {k: f"{base}/{k}" for k in ("cnt", "cls", "qtok")}

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        cnt, cls, qtok = nb_partials(batch_df.select("doc_id", "lang", "text"))
        cnt.write.mode("overwrite").parquet(f"{dirs['cnt']}/batch={epoch_id}")
        cls.write.mode("overwrite").parquet(f"{dirs['cls']}/batch={epoch_id}")
        qtok.write.mode("overwrite").parquet(f"{dirs['qtok']}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            nb_confusion_from_partials(
                spark.read.parquet(f"{dirs['cnt']}/batch=*"),
                spark.read.parquet(f"{dirs['cls']}/batch=*"),
                spark.read.parquet(f"{dirs['qtok']}/batch=*"),
            ),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental token burstiness — bitwise equal to the
    one-shot ``plans.llm.token_burstiness`` (its SQL is the oracle).
    A document lives wholly in one micro-batch, so the per-token
    (df, Σc, Σc²) vocab moments and the doc count are plain BIGINT
    partials; the VMR and the top-K cutoff are corpus-global (a later
    batch can evict a token from the top-K), so emission reruns the
    shared merge + rank tail."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import burstiness_from_partials, burstiness_partials

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_burst_{_uuid.uuid4().hex[:8]}"
    voc_dir, nd_dir = f"{base}/voc", f"{base}/nd"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        voc, nd = burstiness_partials(batch_df.select("doc_id", "text"))
        voc.write.mode("overwrite").parquet(f"{voc_dir}/batch={epoch_id}")
        nd.write.mode("overwrite").parquet(f"{nd_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            burstiness_from_partials(
                spark.read.parquet(f"{voc_dir}/batch=*"),
                spark.read.parquet(f"{nd_dir}/batch=*"),
            ),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental source-pair JSD matrix — bitwise equal to
    the one-shot ``plans.llm.source_jsd_matrix`` (its SQL is the
    oracle). Per-batch (source, token) counts are plain BIGINT partials;
    every distribution, the shared-token set, AND the exact correction
    term move with each batch, so emission reruns the shared
    decomposition over the merged count tables — over COUNT ROWS, never
    raw text (the nb_partials posture)."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import jsd_from_counts, jsd_token_partial

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_jsd_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/counts"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        jsd_token_partial(batch_df.select("source", "text")).write.mode(
            "overwrite"
        ).parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            jsd_from_counts(spark.read.parquet(f"{part_dir}/batch=*")),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_srp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental SRP cosine-LSH near-dup — bitwise equal to
    the one-shot ``plans.llm.srp_near_dup`` (its SQL is the oracle),
    completing the every-blocker-has-a-mirror story (minhash has
    incremental_near_dup_survivors; SRP gets the same shape).

    SRP's state story is the friendliest in the blocker family: the
    signature is PER-DOC STATELESS (md5 hyperplane parities of the
    doc's own hashed count vector — no corpus statistics), so each doc
    computes its bands and sparse bucket counts EXACTLY ONCE, in its
    arrival batch. State = the landed (doc_id, band, key) band rows +
    (doc_id, b, c) bucket counts. Per batch, candidates are the
    band-keyed equi-join of the BATCH's band rows against ALL landed
    rows (id-ordered staging makes every a<b pair land in b's batch,
    the minhash mirror's discipline), verified by the exact integer-dot
    cosine against landed bucket counts — new docs only ever join, the
    corpus is never re-paired. Epoch-scoped overwrite keeps every write
    replay-idempotent.

    At 100 TB: per-batch work is batch-sized × bucket-collision-sized;
    state grows linearly in docs (the signature table a production
    deployment materializes anyway)."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import (
        SRP_COS_MIN,
        _srp_band_rows,
        _srp_bucket_counts,
    )

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_srp_{_uuid.uuid4().hex[:8]}"
    per_dir = f"{base}/per"
    bands_dir = f"{base}/bands"
    pairs_dir = f"{base}/pairs"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        sp = batch_df.sparkSession
        per_b = _srp_bucket_counts(batch_df.select("doc_id", "text"))
        per_b.write.mode("overwrite").parquet(f"{per_dir}/batch={epoch_id}")
        per_b = sp.read.parquet(f"{per_dir}/batch={epoch_id}")
        _srp_band_rows(per_b).write.mode("overwrite").parquet(
            f"{bands_dir}/batch={epoch_id}"
        )
        bands_b = sp.read.parquet(f"{bands_dir}/batch={epoch_id}")
        bands_all = sp.read.parquet(f"{bands_dir}/batch=*")
        per_all = sp.read.parquet(f"{per_dir}/batch=*")
        cand = (
            bands_all.select(F.col("doc_id").alias("doc_a"), "band", "key")
            .join(
                bands_b.select(F.col("doc_id").alias("doc_b"), "band", "key"),
                ["band", "key"],
            )
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        ssq = per_all.groupBy("doc_id").agg(
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq")
        )
        pa = per_all.select(
            F.col("doc_id").alias("doc_a"), "b", F.col("c").alias("ca")
        )
        pb = per_all.select(
            F.col("doc_id").alias("doc_b"), "b", F.col("c").alias("cb")
        )
        dots = (
            cand.join(pa, "doc_a")
            .join(pb, ["doc_b", "b"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
        )
        cos = F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("ssq_a").cast("double"))
                * F.sqrt(F.col("ssq_b").cast("double"))
            ),
            6,
        )
        verified = (
            dots.join(
                ssq.select(
                    F.col("doc_id").alias("doc_a"), F.col("ssq").alias("ssq_a")
                ),
                "doc_a",
            )
            .join(
                ssq.select(
                    F.col("doc_id").alias("doc_b"), F.col("ssq").alias("ssq_b")
                ),
                "doc_b",
            )
            .withColumn("cos_sim", cos)
            .filter(F.col("cos_sim") >= F.lit(SRP_COS_MIN))
            .select("doc_a", "doc_b", "cos_sim")
        )
        verified.write.mode("overwrite").parquet(f"{pairs_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out = (
            spark.read.parquet(f"{pairs_dir}/batch=*")
            .distinct()
            .orderBy("doc_a", "doc_b")
        )
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental isotonic calibration — bitwise equal to the
    one-shot ``plans.llm.isotonic_calibration`` (its SQL is the oracle).
    Both scorers are per-doc stateless, so each micro-batch lands ≤
    ISO_BINS (bin, n, s) INTEGER partial rows (never per-doc rows — the
    temperature mirror's discipline); partials merge by exact addition,
    and emission runs the shared minimax tail over the merged bins-sized
    frame. The fit is corpus-global (pooling can reach across the whole
    score range), which is exactly why emission recomputes over the
    merged BINS, never raw text."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import (
        feature_hashing_from,
        gopher_rules_from,
        isotonic_bin_partials,
        isotonic_from_bins,
    )

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_iso_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/bins"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        clf = feature_hashing_from(batch_df).select("doc_id", "clf_score")
        gop = gopher_rules_from(batch_df).select(
            "doc_id", F.col("passes").cast("bigint").alias("label")
        )
        isotonic_bin_partials(clf.join(gop, "doc_id")).write.mode(
            "overwrite"
        ).parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("bin")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("s").cast("bigint").alias("s"),
            )
        )
        out, _ = tracked_local_checkpoint(isotonic_from_bins(merged), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental weighted priority sample — bitwise equal to
    the one-shot ``plans.llm.priority_sample`` (its SQL is the oracle).

    Priority sampling is MERGEABLE BY CONSTRUCTION: a doc's quantized
    priority w·2^32 // u is intrinsic to the row (no corpus statistics),
    so the global per-source top-K is the top-K of the union of
    per-batch top-Ks — each micro-batch lands at most |sources|·K
    candidate rows (a bounded keyed sketch, the smallest state any exact
    top-K can carry), and emission re-ranks the concatenated candidates.
    A doc outside its batch's top-K can never enter the global top-K,
    so dropping it at batch time is lossless."""
    import shutil
    import uuid as _uuid

    from pyspark.sql import Window

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import PRIO_K, PRIO_SCALE
    from ..plans.relational import _kmv_u32

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_prio_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/topk"

    def _batch_topk(df: DataFrame) -> DataFrame:
        u = (_kmv_u32(F.col("doc_id").cast("string")) + F.lit(1)).cast("bigint")
        keyed = df.select("doc_id", "source", "n_chars", u.alias("u")).select(
            "*",
            F.expr(f"(n_chars * CAST({PRIO_SCALE} AS BIGINT)) DIV u").alias(
                "priority_q"
            ),
        )
        rn = F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("priority_q").desc(), F.col("doc_id").asc()
            )
        )
        return (
            keyed.select("source", "doc_id", "n_chars", "priority_q", rn.alias("rn"))
            .filter(F.col("rn") <= PRIO_K)
            .drop("rn")
        )

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        _batch_topk(batch_df.select("doc_id", "source", "n_chars")).write.mode(
            "overwrite"
        ).parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        from pyspark.sql import Window

        cand = spark.read.parquet(f"{part_dir}/batch=*")
        rn = F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("priority_q").desc(), F.col("doc_id").asc()
            )
        ).cast("bigint")
        out = (
            cand.select("source", "doc_id", "n_chars", "priority_q", rn.alias("rank"))
            .filter(F.col("rank") <= PRIO_K)
            .orderBy("source", "rank")
        )
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# Retraction-aware priority sample (round 12): the ORDER-STATISTIC
# retraction shape — deletion erodes a bounded top-K frontier, the one
# failure mode signed sums (scalar/keyed/graph/calendar retract mirrors)
# and the watermark buffer (sequence retract mirror) never face.

# documents tombstone set: doc_id % 7 == 3. Deliberately NOT the orders
# RETRACT_MOD discipline (doc_id % 10) — the lake assigns source =
# f"src{doc_id % 20}", so any modulus sharing a factor with 20 deletes
# entire sources (doc_id%10==7 erases src7/src17 wholesale); 7 is coprime
# with 20 and spreads deletions uniformly across sources.
PRIO_RETRACT_MOD = 7
PRIO_RETRACT_RES = 3
# frontier erosion budget B: the state keeps top-(K+B) per source, so it
# survives up to B deletions per source that hit the kept set; the
# (B+1)-th is a DETECTED contract violation (ValueError), mirroring the
# markov-retract watermark discipline.
#
# SIZED, not guessed (tools/prio_erosion_probe.py replays the exact staged
# schedule through priority_retract_update and reports the x distribution):
# measured max erosion per source is 3 at sf0.001/sf0.01 and 10 at sf0.1 —
# the SATURATED regime, where docs-per-source >> K+B and erosion stops
# depending on corpus size: only late-parity tombstones (half the
# schedule's 1/7 deletion set) can erode, so per epoch each kept slot
# erodes w.p. ~1/14 and x ~ sum over the 3 staged epochs of
# Binomial(K+B, 1/14) — mean ~8.6, sd ~2.8 at saturation; the observed
# sf0.1 max of 10 sits on that mean and the 20-source max-tail stays
# under ~15. B = 20 = measured saturated worst case x2 margin; growing
# the BATCH COUNT (not the corpus) is what would require resizing, at
# ~(K+B)/14 per extra mutable epoch.
PRIO_RETRACT_B = 20

DOCS_RETRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("sign", T.IntegerType()),
    ]
)


def _stage_prio_retraction_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three doc_id-tercile insert slices with a -1 tombstone for every
    doc_id % PRIO_RETRACT_MOD == PRIO_RETRACT_RES document, scheduled
    adversarially: even (doc_id DIV MOD) tombstones one batch EARLY
    (delete-before-insert — the pending-tombstone path), odd ones one
    batch LATE (delete-after-insert — the frontier-erosion path);
    boundary slices fold edge tombstones into their own batch."""
    import hashlib

    from ..plans.tables import load
    from .events_stream import _STAGE_ROOT, _stage_adversarial_retraction

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return _stage_adversarial_retraction(
        d=f"{_STAGE_ROOT}/docs_prio_retract_{key}",
        frame_fn=lambda: load(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        ),
        order_cols=("doc_id",),
        id_col="doc_id",
        mod=PRIO_RETRACT_MOD,
        res=PRIO_RETRACT_RES,
        nb=3,
        cols=("doc_id", "source", "n_chars"),
    )


def priority_retract_update(
    prev_kept: DataFrame | None,
    prev_pend: DataFrame | None,
    prev_x: DataFrame | None,
    batch: DataFrame,
    k_plus_b: int,
) -> tuple:
    """The retraction sampler's per-epoch kernel, module-level so the
    frontier-erosion and pending-tombstone pytests can drive it with a
    tiny K. State: per source the top-(K+B) SURVIVING arrived docs by
    quantized priority (`kept`), the outstanding tombstones whose insert
    has not arrived (`pend`), and the per-source count of deletions that
    hit the kept set (`x` — the erosion tally).

    Why K+B suffices (the invariant the pytest pins): after x deletions
    have hit the kept set, it still contains the top-(K+B−x) of all
    arrived surviving docs — trimming only ever drops rows ranked past
    K+B, a new arrival that belongs to the surviving top-(K+B−x) always
    survives the trim, and a state-hitting deletion shrinks the
    guarantee by exactly one. So the final top-K is exact while x ≤ B.
    A deletion of a NON-kept doc is provably irrelevant: at its trim (or
    cancellation) time ≥ K+B−x survivors outranked it, and at most B−x
    future erosions can remove outrankers, leaving ≥ K — it could never
    re-enter the answer. Deletions of kept docs beyond B are DETECTED
    (caller raises), not silently wrong.

    Tombstone-before-insert parks in `pend` and cancels the insert on
    arrival (no erosion — the doc never occupies state). A tombstone for
    an already-trimmed doc stays in `pend` forever — harmless by the
    irrelevance argument, and bounded by the deletion contract; a real
    deployment ages these out with the same watermark the markov-retract
    buffer uses.

    Returns (kept, pend, x)."""
    from pyspark.sql import Window

    from ..plans.llm import PRIO_SCALE
    from ..plans.relational import _kmv_u32

    s = batch.sparkSession
    if prev_kept is None:
        prev_kept = s.createDataFrame(
            [], "source string, doc_id bigint, n_chars bigint, priority_q bigint"
        )
    if prev_pend is None:
        prev_pend = s.createDataFrame([], "doc_id bigint")
    if prev_x is None:
        prev_x = s.createDataFrame([], "source string, x bigint")
    ins = batch.filter(F.col("sign") == 1).select("doc_id", "source", "n_chars")
    dels = batch.filter(F.col("sign") == -1).select("doc_id", "source")
    dead = dels.select("doc_id").unionByName(prev_pend).distinct()
    ins_live = ins.join(dead, "doc_id", "left_anti")
    u = (_kmv_u32(F.col("doc_id").cast("string")) + F.lit(1)).cast("bigint")
    keyed = ins_live.select("source", "doc_id", "n_chars", u.alias("u")).select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(f"(n_chars * CAST({PRIO_SCALE} AS BIGINT)) DIV u").alias(
            "priority_q"
        ),
    )
    hits = (
        prev_kept.join(dels.select("doc_id"), "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    kept_base = prev_kept.join(dels.select("doc_id"), "doc_id", "left_anti")
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("priority_q").desc(), F.col("doc_id").asc()
        )
    )
    kept = (
        kept_base.unionByName(keyed)
        .select("source", "doc_id", "n_chars", "priority_q", rn.alias("rn"))
        .filter(F.col("rn") <= k_plus_b)
        .drop("rn")
    )
    pend = (
        prev_pend.join(ins.select("doc_id"), "doc_id", "left_anti")
        .unionByName(
            dels.select("doc_id")
            .join(prev_kept.select("doc_id"), "doc_id", "left_anti")
            .join(ins.select("doc_id"), "doc_id", "left_anti")
        )
        .distinct()
    )
    x = (
        prev_x.unionByName(hits)
        .groupBy("source")
        .agg(F.sum("x").cast("bigint").alias("x"))
    )
    return kept, pend, x


def incremental_priority_sample_retract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RETRACTION-AWARE streaming priority sample — bitwise equal to the
    one-shot ``plans.llm.priority_sample`` over the SURVIVING
    (never-deleted) documents (that batch SQL, survivor-filtered, is the
    oracle).

    The new retraction shape this closes (SURVEY round-12): bounded
    top-K state under deletion. The insert-only mirror keeps |sources|·K
    rows because a doc outside the top-K can never ENTER it; a deletion
    breaks exactly that — removing a kept doc must PROMOTE the next
    contender, which a K-bounded state has already discarded. The
    resolution is a per-source ERROR BUDGET: keep top-(K+PRIO_RETRACT_B)
    survivors, absorb up to B kept-set deletions per source (each
    consumes one buffer slot of guarantee — see
    ``priority_retract_update`` for the invariant), detect the (B+1)-th
    as a contract violation instead of emitting a silently-wrong sample.
    Deletions may arrive before their insert (pending-tombstone state)
    or after; both directions are exercised by the staged schedule.

    At 100 TB: state is |sources|·(K+B) rows plus the outstanding
    tombstone set (bounded by the deletion contract) plus |sources|
    erosion counters — independent of corpus size; under
    transformWithState the kept set is a per-source bounded ListState
    and the pending set a MapState with watermark-aged eviction."""
    import os
    import shutil
    import uuid as _uuid

    from pyspark.sql import Window

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import PRIO_K

    tune_session(spark)
    d = _stage_prio_retraction_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_prior_{_uuid.uuid4().hex[:8]}"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession

        def rd(tag: str):
            p = f"{base}/{tag}/epoch={epoch_id - 1}"
            return s.read.parquet(p) if os.path.exists(p) else None

        kept, pend, x = priority_retract_update(
            rd("kept"),
            rd("pend"),
            rd("x"),
            batch_df.select("doc_id", "source", "n_chars", "sign"),
            PRIO_K + PRIO_RETRACT_B,
        )
        over = x.filter(F.col("x") > PRIO_RETRACT_B).count()
        if over:
            raise ValueError(
                f"priority_retract erosion budget exhausted: {over} "
                f"source(s) exceeded B={PRIO_RETRACT_B} kept-set deletions"
            )
        kept.write.mode("overwrite").parquet(f"{base}/kept/epoch={epoch_id}")
        pend.write.mode("overwrite").parquet(f"{base}/pend/epoch={epoch_id}")
        x.write.mode("overwrite").parquet(f"{base}/x/epoch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_RETRACT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        kept = spark.read.parquet(f"{base}/kept/epoch=2")
        rank = F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("priority_q").desc(), F.col("doc_id").asc()
            )
        ).cast("bigint")
        out = (
            kept.select(
                "source", "doc_id", "n_chars", "priority_q", rank.alias("rank")
            )
            .filter(F.col("rank") <= PRIO_K)
            .orderBy("source", "rank")
        )
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# Retraction-aware near-dup dedup (round 12): un-ingestion for the dedup
# stack itself — the GDPR-shaped requirement that deleting a document also
# updates DEDUP state, because a deleted survivor's kill decisions must
# not outlive it.

DOCS_ND_RETRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("sign", T.IntegerType()),
    ]
)


def _stage_near_dup_retraction_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three doc_id-tercile insert slices with a -1 tombstone for every
    doc_id % PRIO_RETRACT_MOD == PRIO_RETRACT_RES document (the same
    source-uniform deletion set the priority retract mirror uses),
    scheduled adversarially: even (doc_id DIV MOD) tombstones one batch
    EARLY (the never-ingest path), odd one batch LATE (the
    kill-then-void path)."""
    import hashlib

    from ..plans.tables import load
    from .events_stream import _STAGE_ROOT, _stage_adversarial_retraction

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return _stage_adversarial_retraction(
        d=f"{_STAGE_ROOT}/docs_nd_retract_{key}",
        frame_fn=lambda: load(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "n_chars"
        ),
        order_cols=("doc_id",),
        id_col="doc_id",
        mod=PRIO_RETRACT_MOD,
        res=PRIO_RETRACT_RES,
        nb=3,
        cols=("doc_id", "text", "lang", "n_chars"),
    )


ND_COMPACT_EVERY = 2  # fold the batch-partial prefix every N epochs


def compact_dead_state(
    spark: SparkSession,
    state_dir: str,
    dead: DataFrame,
    epoch: int,
    anti_cols: tuple[str, ...] = ("doc_id",),
) -> None:
    """Tombstone compaction for DEAD-SET state (the anti-join sibling of
    orders_stream.compact_signed_state): fold every landed batch partial
    into one file, PHYSICALLY DROPPING rows whose id in any ``anti_cols``
    column is dead. Soundness needs only monotonicity: docs never
    resurrect, so a dead-keyed row is permanently void (a dead killer's
    edges can never re-arm; a dead doc's signatures can never match a
    future arrival the emission would count) and dropping it can never
    change the merge.

    Crash/replay discipline — STRONGER than the signed compactor's,
    because this state is SET-semantic (rows are facts, duplicates
    collapse under the fold's dropDuplicates and the consumers'
    distinct(), unlike signed sums where a double-counted row is wrong):
    the fold lands under a fresh nonce dir name (``batch={epoch}f<hex>``
    — never a replayable integer epoch, so a foreachBatch replay of the
    compaction epoch can overwrite its own partial without touching the
    fold) BEFORE the source dirs are removed. Every crash point leaves a
    glob whose union is row-equal to the state: old dirs only, old dirs
    plus the fold (duplicates — collapsed at the next fold/consumer), or
    the fold only. A replayed compaction folds the leftover fold together
    with the replayed partial into a new nonce dir and clears the rest.
    After compaction the state is surviving-rows-sized instead of
    sum-of-batch-partials-sized — the measured form of the 'dropped at
    the compaction boundary' claim."""
    import glob
    import os
    import shutil
    import uuid as _uuid

    dirs = sorted(glob.glob(f"{state_dir}/batch=*"))
    if len(dirs) < 2:
        return
    kept = spark.read.parquet(f"{state_dir}/batch=*")
    cols = kept.columns  # using-column joins reorder; restore below
    for c in anti_cols:
        kept = kept.join(
            dead.select(F.col("doc_id").alias(c)), c, "left_anti"
        )
    kept = kept.select(*cols).dropDuplicates()
    tmp = f"{state_dir}.compact_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, f"{state_dir}/batch={epoch}f{_uuid.uuid4().hex[:8]}")
    for d_ in dirs:
        shutil.rmtree(d_, ignore_errors=True)


def incremental_near_dup_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-AWARE streaming near-dup dedup — bitwise equal to the
    one-shot ``near_dup_survivors`` over the SURVIVING (never-deleted)
    documents (that SQL, survivor-restricted, is the oracle).

    Why deletion is a first-class dedup problem: the min-id survivor rule
    means a deleted SURVIVOR's victims must be RE-ELECTED — doc X killed
    doc Y, X is un-ingested, so Y must come back unless another surviving
    earlier doc also matches it. A kill SET cannot express that; the
    state must keep kill EDGES (doc_a, doc_b), and emission voids every
    edge whose killer is dead. The insert-only mirror's discovery
    invariant survives deletion untouched: a pair of FINALLY-SURVIVING
    docs (a < b) is discovered exactly once, at b's arrival, because a
    surviving killer's signature was necessarily still in state then —
    deletions only ever VOID edges, never create them (a tombstone that
    precedes its insert simply keeps the doc out of the signature state,
    which is also what the survivor-restricted oracle sees).

    Per epoch: cumulative dead set += batch tombstones; batch inserts
    already dead are dropped (never-ingest path); the batch's doc table
    lands; candidates join the batch against ALL landed signatures MINUS
    the dead (a deleted doc stops killing future arrivals immediately);
    verified J >= JACCARD_MIN pairs land as edges. Emission: survivors =
    (documents − dead) anti-join {doc_b of edges whose doc_a is not
    dead}. The resurrection pytest pins a real victim whose only killer
    is deleted.

    At 100 TB: dead set is deletion-contract-sized; dead docs' signature
    rows and edges are anti-joined at use AND physically dropped every
    ND_COMPACT_EVERY epochs by ``compact_dead_state`` (write-new → swap
    → drop, the signed compactor's crash discipline), so state is
    surviving-rows-sized; everything else is the insert-only mirror's
    banded state."""
    import os
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import _band_rows, doc_tbl_from
    from ..plans.tables import load

    tune_session(spark)
    d = _stage_near_dup_retraction_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_ndr_{_uuid.uuid4().hex[:8]}"
    state_dir = f"{base}/doc_tbl"
    edges_dir = f"{base}/edges"
    dead_dir = f"{base}/dead"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        prev_dead_p = f"{dead_dir}/epoch={epoch_id - 1}"
        prev_dead = (
            s.read.parquet(prev_dead_p)
            if os.path.exists(prev_dead_p)
            else s.createDataFrame([], "doc_id bigint")
        )
        dead = (
            prev_dead.unionByName(
                batch_df.filter(F.col("sign") == -1).select("doc_id")
            )
            .distinct()
        )
        dead.write.mode("overwrite").parquet(f"{dead_dir}/epoch={epoch_id}")
        dead = s.read.parquet(f"{dead_dir}/epoch={epoch_id}")
        ins = (
            batch_df.filter(F.col("sign") == 1)
            .select("doc_id", "text", "lang", "n_chars")
            .join(dead, "doc_id", "left_anti")
        )
        doc_tbl_from(ins).write.mode("overwrite").parquet(
            f"{state_dir}/batch={epoch_id}"
        )
        batch_tbl = s.read.parquet(f"{state_dir}/batch={epoch_id}")
        all_tbl = s.read.parquet(f"{state_dir}/batch=*").join(
            dead, "doc_id", "left_anti"
        )
        a = _band_rows(all_tbl).alias("a")
        b = _band_rows(batch_tbl).alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        a_side = all_tbl.select(
            F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("arr_a")
        )
        b_side = batch_tbl.select(
            F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("arr_b")
        )
        n_common = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
        edges = (
            a_side.join(cand, "doc_a")
            .join(b_side, "doc_b")
            .withColumn("n_common", n_common)
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_common").cast("double")
                    / (
                        F.size("arr_a") + F.size("arr_b") - F.col("n_common")
                    ).cast("double"),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= JACCARD_MIN)
            .select("doc_a", "doc_b")
        )
        edges.write.mode("overwrite").parquet(f"{edges_dir}/batch={epoch_id}")
        if epoch_id % ND_COMPACT_EVERY == 1:
            compact_dead_state(s, state_dir, dead, epoch_id)
            compact_dead_state(
                s, edges_dir, dead, epoch_id, anti_cols=("doc_a", "doc_b")
            )

    try:
        src = (
            spark.readStream.schema(DOCS_ND_RETRACT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        dead = spark.read.parquet(f"{dead_dir}/epoch=2")
        docs = load(spark, sf_dir, "documents").join(dead, "doc_id", "left_anti")
        edges = spark.read.parquet(f"{edges_dir}/batch=*")
        live_kills = (
            edges.join(
                dead.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_anti"
            )
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        out = docs.join(live_kills, "doc_id", "left_anti").select(
            "doc_id", "lang", "n_chars"
        )
        out, _ = tracked_local_checkpoint(out, register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-retraining streaming DSIR — bitwise equal to the
    one-shot ``plans.llm.dsir_weights`` (its SQL is the oracle).

    The importance-resampling mirror the counting-model family makes
    possible: the MODEL is two integer bucket-count tables (target and
    raw hashed-bigram distributions) and the EVAL side is per-doc bucket
    counts — all distributive, so each micro-batch lands its
    ``dsir_feats`` partials and the model re-estimates exactly at every
    emission by BIGINT merge. Every landed doc's weight is corpus-global
    (BOTH distributions move with each batch), so emission reruns the
    shared ``dsir_from_feats`` kernel over merged partials — over COUNT
    ROWS, never raw text (the nb_partials posture). Epoch-scoped
    overwrite = replay-idempotent."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.llm import dsir_feats, dsir_from_feats

    tune_session(spark)
    d = _stage_doc_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_dsir_{_uuid.uuid4().hex[:8]}"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        feats = dsir_feats(batch_df.select("doc_id", "source", "text"))
        feats.write.mode("overwrite").parquet(f"{base}/feats/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(DOCS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            dsir_from_feats(spark.read.parquet(f"{base}/feats/batch=*")),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)

def incremental_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental ANN-index (NSW graph) maintenance — bitwise
    equal to the one-shot ``operators.similarity.nsw_edges`` on the union
    of all batches (the DuckDB NSW graph CTE chain is the oracle) under
    ANY arrival order.

    The one large state the streaming surface never maintained (r12
    verdict item 3): the navigable-small-world neighbor graph. The
    "quantizer" is frozen by construction — the LSH probe planes are
    deterministic and stateless (``nsw_prep``), so no setup pass. Each
    micro-batch:

    1. prepares ONLY its own vectors (bucket + norm) and lands them in
       the accumulated vector store;
    2. generates banded candidate pairs by joining the BATCH against the
       store (never store x store): the directed pair (a, b) is created
       exactly once globally, in the batch where its LATER member
       arrives — new->any pairs come from the batch-side probe explode,
       and old->new reverse edges are the mirrored candidates whose
       source is NOT in the batch (an anti-join against the batch ids,
       candidates-sized work);
    3. merges them into the per-src top-``NSW_M_OUT`` forward-edge state
       (degree-capped edge insertion). Top-K is merge-associative —
       topK(all pairs) == topK(topK(prefix) ∪ new pairs) under the
       deterministic (e_sim DESC, dst) order — so the maintained state
       is bitwise the one-shot ``fwd`` table after every batch.

    Emission runs the shared ``nsw_finish`` kernel (symmetrize +
    degree-cap + NN-descent refinement) over the final forward state —
    the same derivation the one-shot build applies to the same ``fwd``.

    At 100 TB: per-batch contact is (batch x store) on the bucket
    equi-key (the minhash banding shape), the forward state is N * M_OUT
    rows of three scalars (compacted every batch, never reread raw
    vectors), and emission's NN-descent is N * M_DEG^2 exact cosines —
    linear in corpus size. Epoch-scoped overwrite = replay-idempotent:
    re-running epoch e rebuilds vecs/batch=e and fwd/epoch=e from the
    same inputs (state chains from the newest epoch BELOW e, never e
    itself)."""
    import os
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..operators.similarity import (
        banded_pairs_between,
        fwd_top_m,
        nsw_finish,
        nsw_prep,
    )
    from ..plans.llm import EMB_DIM
    from ..plans.tables import load

    tune_session(spark)
    d = _stage_emb_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_ann_{_uuid.uuid4().hex[:8]}"
    vecs_dir = f"{base}/vecs"
    fwd_dir = f"{base}/fwd"

    def _fwd_epochs() -> list[int]:
        if not os.path.isdir(fwd_dir):
            return []
        return sorted(
            int(p.split("=", 1)[1])
            for p in os.listdir(fwd_dir)
            if p.startswith("epoch=")
        )

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        prep = nsw_prep(batch_df, EMB_DIM).withColumn("ep", F.lit(epoch_id))
        prep.write.mode("overwrite").parquet(f"{vecs_dir}/batch={epoch_id}")
        store = spark.read.parquet(f"{vecs_dir}/batch=*")
        batch_v = store.filter(F.col("ep") == epoch_id)
        # new -> any (both directions of within-batch pairs arise here)
        p_new = banded_pairs_between(batch_v, store)
        # old -> new: mirror the candidates, drop mirrored within-batch
        # pairs (already present both ways in p_new)
        batch_ids = batch_v.select(F.col("vec_id").alias("a_id"))
        p_old = p_new.select(
            F.col("b_id").alias("a_id"),
            F.col("a_id").alias("b_id"),
            "cos_sim",
        ).join(F.broadcast(batch_ids), "a_id", "left_anti")
        directed = p_new.unionByName(p_old).select(
            F.col("a_id").alias("src"),
            F.col("b_id").alias("dst"),
            F.col("cos_sim").alias("e_sim"),
        )
        prev_eps = [e for e in _fwd_epochs() if e < epoch_id]
        if prev_eps:
            prev = spark.read.parquet(f"{fwd_dir}/epoch={max(prev_eps)}")
        else:
            prev = spark.createDataFrame(
                [], "src long, dst long, e_sim double"
            )
        merged = fwd_top_m(prev.unionByName(directed))
        merged.write.mode("overwrite").parquet(f"{fwd_dir}/epoch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(EMB_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        eps = _fwd_epochs()
        if not eps:
            return spark.createDataFrame([], "src long, dst long, e_sim double")
        fwd = spark.read.parquet(f"{fwd_dir}/epoch={max(eps)}")
        v = nsw_prep(load(spark, sf_dir, "embeddings"), EMB_DIM)
        out, _ = tracked_local_checkpoint(nsw_finish(fwd, v), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)

# ---------------------------------------------------------------------------
# Retraction-aware ANN-graph maintenance (round 13): vector UN-ingestion
# for the similarity index itself — deleting an embedding must also repair
# the NSW graph, because a deleted vector's edges must not outlive it and
# the neighbors it crowded out of a degree cap must be RE-ELECTED.

EMB_RETRACT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
        T.StructField("sign", T.IntegerType()),
    ]
)

ANN_COMPACT_EVERY = 2  # fold the pair/vector state every N epochs


def _stage_emb_retraction_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three vec_id-tercile insert slices with a -1 tombstone for every
    vec_id % PRIO_RETRACT_MOD == PRIO_RETRACT_RES vector, scheduled
    adversarially (even (id DIV MOD) tombstones one batch EARLY — the
    never-ingest path; odd one batch LATE — the ingest-then-void path)."""
    import hashlib

    from ..plans.tables import load
    from .events_stream import _STAGE_ROOT, _stage_adversarial_retraction

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return _stage_adversarial_retraction(
        d=f"{_STAGE_ROOT}/emb_retract_{key}",
        frame_fn=lambda: load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", "label"
        ),
        order_cols=("vec_id",),
        id_col="vec_id",
        mod=PRIO_RETRACT_MOD,
        res=PRIO_RETRACT_RES,
        nb=3,
        cols=("vec_id", "embedding", "label"),
    )


def incremental_ann_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-AWARE streaming NSW maintenance — bitwise equal to the
    one-shot ``nsw_edges`` over the SURVIVING (never-deleted) vectors
    (the survivor-restricted graph CTE chain is the oracle).

    Why deletion is a first-class ANN problem: the degree caps mean a
    deleted vector may have CROWDED OUT a true neighbor — dropping its
    rows is not enough, the evicted candidate must be re-elected. A
    capped edge state cannot express that (the evicted candidate is
    gone), so the state keeps the UNCAPPED banded candidate pairs — the
    same volume the one-shot build shuffles anyway, which is the honest
    price of exact un-ingestion (the insert-only mirror keeps only the
    capped top-M_OUT state; this one trades state size for
    retractability). The discovery invariant survives deletion: a pair
    of finally-surviving vectors is discovered exactly once, at the
    later member's arrival, because a surviving earlier member was
    necessarily in the store and not dead then — deletions only VOID
    pairs, never create them.

    Per epoch: cumulative dead set += batch tombstones; batch inserts
    already dead are dropped (never-ingest); the batch's prepared
    vectors land; banded candidates join the batch against the landed
    store MINUS the dead (a deleted vector stops matching immediately);
    the directed pairs land append-only. Every ANN_COMPACT_EVERY epochs
    ``compact_dead_state`` physically drops dead-touching pairs and
    vector rows (set-semantic state: duplicates from a replayed
    compaction epoch collapse under the fold's dropDuplicates and the
    emission's dropDuplicates). Emission: survivor pairs -> fwd_top_m ->
    the shared nsw_finish kernel over the surviving vectors.

    At 100 TB: per-batch contact is (batch x store) on the bucket
    equi-key; the pair state is the banding volume (compacted to
    survivor pairs); the dead set is deletion-contract-sized."""
    import os
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..operators.similarity import (
        banded_pairs_between,
        fwd_top_m,
        nsw_finish,
        nsw_prep,
    )
    from ..plans.llm import EMB_DIM
    from ..plans.tables import load

    tune_session(spark)
    d = _stage_emb_retraction_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_annr_{_uuid.uuid4().hex[:8]}"
    dead_dir = f"{base}/dead"
    vecs_dir = f"{base}/vecs"
    pairs_dir = f"{base}/pairs"

    def _read_or_empty(path: str, schema: str) -> DataFrame:
        if os.path.isdir(path):
            return spark.read.parquet(f"{path}/batch=*")
        return spark.createDataFrame([], schema)

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        tombs = batch_df.filter(F.col("sign") == -1).select("vec_id")
        tombs.write.mode("overwrite").parquet(f"{dead_dir}/batch={epoch_id}")
        dead = spark.read.parquet(f"{dead_dir}/batch=*").distinct()
        ins = (
            batch_df.filter(F.col("sign") == 1)
            .select("vec_id", "embedding")
            .join(dead, "vec_id", "left_anti")
        )
        prep = nsw_prep(ins, EMB_DIM).withColumn("ep", F.lit(epoch_id))
        prep.write.mode("overwrite").parquet(f"{vecs_dir}/batch={epoch_id}")
        store = (
            spark.read.parquet(f"{vecs_dir}/batch=*")
            .join(dead, "vec_id", "left_anti")
        )
        batch_v = store.filter(F.col("ep") == epoch_id)
        p_new = banded_pairs_between(batch_v, store)
        batch_ids = batch_v.select(F.col("vec_id").alias("a_id"))
        p_old = p_new.select(
            F.col("b_id").alias("a_id"),
            F.col("a_id").alias("b_id"),
            "cos_sim",
        ).join(F.broadcast(batch_ids), "a_id", "left_anti")
        directed = p_new.unionByName(p_old).select(
            F.col("a_id").alias("src"),
            F.col("b_id").alias("dst"),
            F.col("cos_sim").alias("e_sim"),
        )
        directed.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch={epoch_id}"
        )
        if epoch_id % ANN_COMPACT_EVERY == 1:
            dead_dd = dead.select(F.col("vec_id").alias("doc_id"))
            compact_dead_state(
                spark, pairs_dir, dead_dd, epoch_id, anti_cols=("src", "dst")
            )
            compact_dead_state(
                spark, vecs_dir, dead_dd, epoch_id, anti_cols=("vec_id",)
            )

    try:
        src = (
            spark.readStream.schema(EMB_RETRACT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        dead = _read_or_empty(dead_dir, "vec_id long").distinct()
        pairs = (
            _read_or_empty(pairs_dir, "src long, dst long, e_sim double")
            .join(dead.select(F.col("vec_id").alias("src")), "src", "left_anti")
            .join(dead.select(F.col("vec_id").alias("dst")), "dst", "left_anti")
            .select("src", "dst", "e_sim")
            .dropDuplicates()
        )
        surviving = load(spark, sf_dir, "embeddings").join(
            dead, "vec_id", "left_anti"
        )
        v = nsw_prep(surviving, EMB_DIM)
        out, _ = tracked_local_checkpoint(
            nsw_finish(fwd_top_m(pairs), v), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)
