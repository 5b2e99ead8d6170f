"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed (count-collected) but results are not
materialized to the driver beyond the row count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "noise_grid_flagship",
    "noise_source_levels",
    "noise_heat_triples",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as ent
    from air_traffic_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = ent.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM/catalyst once with a trivial action
    spark.range(10).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
