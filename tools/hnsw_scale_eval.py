"""HNSW-vs-flat-NSW recall as the corpus grows (round-9 breadcrumb #2).

At toy scale (500 vectors) flat NSW's stride-16 entry scan exact-scores 6%
of the corpus — a subsidy the hierarchy deliberately forgoes, which showed
up as flat NSW leading by ~0.07 recall@3 at sf0.001. This tool measures
both recalls (and wall time) on progressively larger embedding lakes:
sf0.1 organic (2000 vectors) and deterministic PERTURBED replicas at 2x /
4x (sin-noise, no exact duplicates — replicas become genuine new neighbors
rather than ties). Queries (vec_id < 10) are kept un-replicated.

Usage: python tools/hnsw_scale_eval.py [base_sf_dir] [scales...]
Prints one JSON line per scale; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_OFFSET = 10_000_000


def build_lake(spark, base: str, out: str, mult: int) -> None:
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    parts = [emb]
    for i in range(1, mult):
        # keep the 10 query vectors un-replicated so truth stays 10 queries
        rep = emb.filter(F.col("vec_id") >= 10).select(
            (F.col("vec_id") + F.lit(i * ID_OFFSET)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, d: (
                    x
                    + F.lit(0.05 * i)
                    * F.sin(
                        (F.col("vec_id") + 1).cast("double")
                        * (d + 1).cast("double")
                    )
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
        parts.append(rep)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> int:
    argv = sys.argv[1:]
    base = "/root/testdata/sf0.1"
    if argv and os.path.isdir(argv[0]):
        base = argv.pop(0)
    scales = [int(a) for a in argv] or [1, 2, 4]

    from air_traffic_data_pipeline_spark.plans import llm
    from air_traffic_data_pipeline_spark.session import get_spark

    spark = get_spark("hnsw-scale-eval")
    root = tempfile.mkdtemp(prefix="hnsw_scale_")
    try:
        for m in scales:
            d = f"{root}/x{m}"
            build_lake(spark, base, d, m)
            n = spark.read.parquet(f"{d}/embeddings.parquet").count()
            llm.clear_caches()
            t0 = time.time()
            rows = llm.hnsw_recall_eval(spark, d).collect()
            wall = round(time.time() - t0, 3)
            rh = round(sum(r.recall_hnsw for r in rows) / len(rows), 4)
            rn = round(sum(r.recall_nsw for r in rows) / len(rows), 4)
            print(
                json.dumps(
                    {
                        "scale": m,
                        "n_vectors": n,
                        "recall_hnsw": rh,
                        "recall_nsw": rn,
                        "wall_sec": wall,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
