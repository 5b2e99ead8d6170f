"""~sf1 headline bench: build a persistent 10x multi-file replica lake
(the sf1_float_check growth models: events densify under fresh ids,
documents get distinct suffixed texts, embeddings replicate identically,
lineitem densifies lots under fresh orderkeys; other tables copy
through) and run bench.py against it. MULTI-FILE parquet on purpose —
bench-only, no DuckDB single-file constraint — matching the r9/r10
recording conditions so rounds stay comparable.

Usage: python tools/sf1_bench.py [base_sf_dir] [multiplier] [out_dir]
Prints bench.py's JSON line for the sf1 lake.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_multifile(spark, base: str, out: str, m: int) -> None:
    from pyspark.sql import functions as F

    from tools.scaling_curve import ID_OFFSET
    from tools.sf1_float_check import ALL_TABLES

    os.makedirs(out, exist_ok=True)
    ev = spark.read.parquet(f"{base}/events.parquet")
    doc = spark.read.parquet(f"{base}/documents.parquet")
    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    for name, src, idcol in (
        ("events", ev, "event_id"),
        ("documents", doc, "doc_id"),
        ("embeddings", emb, "vec_id"),
        ("lineitem", li, "l_orderkey"),
    ):
        parts = []
        for i in range(m):
            p = src.withColumn(idcol, F.col(idcol) + F.lit(i * ID_OFFSET))
            if name == "documents" and i:
                p = p.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1_{i}")
                )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    for t in ALL_TABLES:
        if t not in ("events", "documents", "embeddings", "lineitem"):
            src_p = f"{base}/{t}.parquet"
            dst_p = f"{out}/{t}.parquet"
            if os.path.exists(dst_p):
                continue
            if os.path.isdir(src_p):
                shutil.copytree(src_p, dst_p)
            else:
                shutil.copy(src_p, dst_p)


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1_bench_lake"

    from air_traffic_data_pipeline_spark.session import get_spark

    spark = get_spark("sf1-bench-build")
    build_multifile(spark, base, out, m)
    spark.stop()
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=out)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    print(lines[-1] if lines else proc.stdout[-2000:])
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
