"""Isolated per-query micro-bench with the noop sink (guide §1.4).

Usage: python tools/qbench.py <sf_dir> <reps> <name> [name ...]

Times each named query with df.write.format("noop") (computes every column
of every row, no sink cost) min-of-<reps>, clearing engine caches between
reps so every rep is cold. Prints one line per query plus the same
single-thread host probe bench.py uses, so a contended window carries its
own evidence. This is a DIAGNOSTIC tool; the driver-visible numbers stay
bench.py's count-action methodology.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]

    import __spark_entry__ as ent
    from air_traffic_data_pipeline_spark.session import get_spark
    from bench import _clear_engine_caches, _cpu_probe

    spark = get_spark("qbench")
    qs = ent.queries()
    print(f"probe_before={_cpu_probe()}")
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}")
            continue
        # warm codegen at sf0.001 once per shape
        _clear_engine_caches(spark)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        qs[name](spark, os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")).write.format("noop").mode(
            "overwrite"
        ).save()
        samples = []
        for _ in range(reps):
            _clear_engine_caches(spark)
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(samples):.3f}s reps="
            + ",".join(f"{s:.3f}" for s in samples)
        )
    print(f"probe_after={_cpu_probe()}")


if __name__ == "__main__":
    main()
