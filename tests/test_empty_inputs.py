"""Empty-input robustness: every major pipeline must return an EMPTY,
CORRECTLY-TYPED result — not raise — when its input filters to nothing.
At 100 TB partition-level emptiness is routine (partition pruning, a quiet
hour of events); operators that crash on zero rows take the job down."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _empty_docs(spark):
    from air_traffic_data_pipeline_spark.plans.tables import load

    return load(spark, SF, "documents").filter(F.lit(False))


def test_radius_join_empty_sources(spark):
    from air_traffic_data_pipeline_spark.operators.grid import gen_grid
    from air_traffic_data_pipeline_spark.operators.radius_join import (
        adaptive_radius_join,
        radius_join,
    )
    from air_traffic_data_pipeline_spark.plans.domain import source_levels

    grid = gen_grid(spark, 47.15, -1.6, 2000.0, 5)
    src = source_levels(spark, SF).filter(F.lit(False)).select("lat", "lon", "src_db")
    for join in (radius_join, adaptive_radius_join):
        out = join(grid, src, 20000.0, 47.15)
        assert out.count() == 0
        assert "dist_m" in out.columns


def test_shingle_explosion_empty_corpus(spark):
    from air_traffic_data_pipeline_spark.functions.text import shingles

    docs = _empty_docs(spark)
    sh = docs.select("doc_id", shingles(F.col("text")).alias("sh"))
    assert sh.count() == 0


def test_window_and_dedup_empty(spark):
    from air_traffic_data_pipeline_spark.operators.dedup import last_wins_dedup
    from air_traffic_data_pipeline_spark.plans.tables import load

    ev = load(spark, SF, "events").filter(F.lit(False))
    out = last_wins_dedup(ev, ["user_id"], "event_id")
    assert out.count() == 0
    assert set(ev.columns) <= set(out.columns)


def test_connected_components_empty_edges(spark):
    from air_traffic_data_pipeline_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    out = connected_components(edges)
    assert out.count() == 0
    assert set(out.columns) == {"node", "comp"}


def test_similarity_topk_empty_queries(spark):
    from air_traffic_data_pipeline_spark.operators.similarity import brute_force_topk
    from air_traffic_data_pipeline_spark.plans.tables import load

    emb = load(spark, SF, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    corpus = emb.select(F.col("vec_id").alias("c_id"), vec.alias("c_vec"))
    queries = emb.select(F.col("vec_id").alias("q_id"), vec.alias("q_vec")).filter(
        F.lit(False)
    )
    out = brute_force_topk(queries, corpus, k=3)
    assert out.count() == 0
