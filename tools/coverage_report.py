"""Driver-contact telemetry: which registered queries have a driver
CORRECTNESS row, which never had one, and what the next driver window
will check — so rotation health is auditable at a glance each round.

Reads the driver's own ``CORRECTNESS_r*.json`` artifacts (the same
evidence ``plans/registry._driver_green`` uses, including the
``_FORCE_RECHECK`` staleness rules) plus the live registry ordering.

Usage: python tools/coverage_report.py [--window N]
Prints ONE JSON line and also writes it to ``COVERAGE.json`` at the repo
root (overwritten each run — it describes "now", not history).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)  # import the checkout being audited, not a fixed path


def main() -> int:
    window = 50
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])

    from air_traffic_data_pipeline_spark.plans import registry

    names = list(registry.all_queries())
    oracles = set(registry.all_oracles())
    green = registry._driver_green()

    # per-round contact counts + the cumulative ever-checked set (any row,
    # green or not — "contact" is about the driver having LOOKED, the
    # green set is about the row still counting for the current code)
    per_round: dict[str, dict[str, int]] = {}
    ever_checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        if not isinstance(rows, dict):
            continue
        greens = sum(
            1
            for r in rows.values()
            if isinstance(r, dict)
            and r.get("rows_match")
            and r.get("schema_match")
            and r.get("hash_match")
        )
        per_round[f"r{int(m.group(1))}"] = {
            "checked": len(rows),
            "green": greens,
        }
        ever_checked.update(k for k, r in rows.items() if isinstance(r, dict))

    never_checked = [n for n in names if n not in ever_checked]
    pending = [n for n in names if n not in green]  # next-window candidates
    stale_recheck = [
        n for n in pending if n in ever_checked
    ]  # had a row, but it no longer counts (_FORCE_RECHECK or regression)
    next_window = names[:window]
    pending_outside_window = [n for n in pending if n not in next_window]
    # git-aware recheck: green rows whose function source has since changed
    # (QUERY_HASHES.json vs current code) — these jump the green tail
    changed_since_green = sorted(registry._changed_since_green(green))
    changed_outside_window = [
        n for n in changed_since_green if n not in next_window
    ]

    # staleness: rounds since each green query's latest driver row; bounded
    # by the oldest-green-first tail rotation at ~ceil(registered/window)+1
    green_rounds = registry._driver_green_rounds() or {}
    latest_round = max(
        (int(re.search(r"r(\d+)$", k).group(1)) for k in per_round), default=0
    )
    max_staleness = max(
        (latest_round - green_rounds[n] for n in names if n in green_rounds),
        default=0,
    )

    report = {
        "registered": len(names),
        "with_value_oracle": len(oracles),
        "driver_contact_ever": len(ever_checked & set(names)),
        "driver_green_current": len(green & set(names)),
        "never_checked_count": len(never_checked),
        "never_checked": never_checked,
        "stale_recheck": stale_recheck,
        "pending_count": len(pending),
        "window_size": window,
        "pending_outside_window": pending_outside_window,
        "changed_since_green": changed_since_green,
        "max_green_staleness_rounds": max_staleness,
        "per_round": per_round,
    }
    line = json.dumps(report)
    print(line)
    with open(os.path.join(ROOT, "COVERAGE.json"), "w") as fh:
        fh.write(line + "\n")
    # non-zero exit when rotation is unhealthy: a pending or changed-code
    # query would NOT be driver-checked next round
    return 1 if pending_outside_window or changed_outside_window else 0


if __name__ == "__main__":
    sys.exit(main())
