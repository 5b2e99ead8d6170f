"""Per-operator SQL metrics for one query (diagnostic, guide §7.1).

Usage: python tools/sql_profile.py <sf_dir> <name>

Runs the named query once (noop sink) in a UI-enabled session and prints
the SQL tab's executed-plan node metrics — operator name plus its reported
timing/row metrics — so stage-level ambiguity (AQE re-use, fused stages)
can be resolved to actual operators.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sql-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "64g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent
    from bench import _clear_engine_caches

    qs = ent.queries()
    _clear_engine_caches(spark)
    qs[name](spark, os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")).write.format("noop").mode(
        "overwrite"
    ).save()
    _clear_engine_caches(spark)
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]["id"]
    sqls = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/sql?details=true&planDescription=false&length=200"
        )
    )
    # the last completed execution is the timed run; the list can be empty
    # if the timed run failed or is still marked RUNNING when scraped
    done = [s for s in sqls if s.get("status") == "COMPLETED"]
    if not done:
        statuses = sorted({s.get("status", "?") for s in sqls})
        print(f"no COMPLETED SQL execution found (statuses seen: {statuses})")
        return
    ex = done[-1]
    print(f"duration={ex['duration']}ms nodes={len(ex.get('nodes', []))}")
    rows = []
    for node in ex.get("nodes", []):
        mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
        t = 0.0
        for k, v in mets.items():
            if "total time" in k or "time in" in k or k == "time to build hash map":
                # values like "2.1 s", "341 ms", or "total (min, med, max)..."
                first = v.split("(")[0].strip().split("\n")[0]
                try:
                    num, unit = first.split()[:2]
                    mult = {"ms": 1, "s": 1000, "m": 60000, "us": 0.001}.get(
                        unit.rstrip(","), 0
                    )
                    t += float(num.replace(",", "")) * mult
                except Exception:
                    pass
        rows.append((t, node["nodeId"], node["nodeName"], mets))
    rows.sort(reverse=True)
    for t, nid, nname, mets in rows[:25]:
        out = {k: v.split("\n")[0] for k, v in mets.items() if "rows" in k or "time" in k}
        print(f"[{nid:>3}] {t/1000:7.2f}s {nname[:40]:40s} {out}")


if __name__ == "__main__":
    main()
