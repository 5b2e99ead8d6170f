"""Central query registry: name -> (spark, sf_dir) -> DataFrame, plus the
matching DuckDB oracle SQL (None for non-SQL-expressible ops, which the
driver checks rows-only).

Registry ORDER is part of the driver contract: the correctness gate checks
the first N (observed: 50) entries. Ordering is three tiers: (1) the
``_WINDOW_PRIORITY`` names that are still never-driver-green, (2) all other
never-green queries in module order, (3) queries with a green driver row in
any recorded round, last — ordered stalest row first, so once everything is
green the window becomes a rolling re-verification of the oldest evidence
(full tail re-checked every ~ceil(N/50) rounds). Tier membership is
computed from the driver's own
CORRECTNESS_r*.json artifacts (``_driver_green``), so the window
self-rotates: each round the freshly-greened queries fall to the tail and
the never-checked ones move up, converging on full driver coverage without
hand-editing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Hand-ordered names that jump the never-green tier (highest information per
# window slot). DRAINED as of round 8: every name the round-4 list carried has
# a green driver row (CORRECTNESS_r4–r7), so each was filtered out by the
# ``name not in green`` guard below and the list was dead weight in the
# rotation math — new queries already self-prioritize through the never-green
# tier in module order. Re-populate only to hand-rank WITHIN that tier.
_WINDOW_PRIORITY: tuple[str, ...] = ()


# Queries whose implementation (or oracle) changed AFTER they last earned a
# green driver row, mapped to the round the change landed in. A green row
# recorded in an EARLIER round proves nothing about the new code, so these
# re-enter the window — but a green row from >= the change round re-greens
# them automatically (self-pruning: no hand-editing after the driver
# re-records them).
_FORCE_RECHECK: dict[str, int] = {
    "llm_simhash": 3,  # r3: 16-bit simhash -> 64-bit, banded 4x16
    "llm_simhash_near_dup": 3,  # r3: same rework
    "llm_ann_ivf_topk": 3,  # r3: deterministic centroids + new value oracle
    "llm_multimodal_decode": 3,  # r3: real WAV/BMP byte-format parse
    "llm_multimodal_meta": 3,  # r3: payloads regenerated in real byte formats
    "llm_multimodal_frames": 3,  # r3: same payload change
    # r4: minhash lanes moved from two salted md5s to one sha256 digest
    # (every signature value changes) — all lane consumers re-enter
    "llm_minhash_signatures": 4,
    "llm_minhash_near_dup_pairs": 4,
    "llm_near_dup_survivors": 4,
    "llm_dedup_clusters": 4,
    "llm_cluster_survivors": 4,
    "llm_curation_pipeline": 4,
    "llm_minhash_jaccard_est": 4,
    "llm_minhash_band_stats": 4,
    "llm_lsh_sensitivity": 4,
    "stream_incremental_near_dup": 4,
    # r4: bounded-population subcell split changes the kill set
    # r6: cell-assignment extracted to _semdedup_cell_rows (plan-identical
    # refactor, bitwise-verified locally — re-entered on principle)
    "llm_semdedup_cells": 6,
    # r7: ADVICE fixes change values/plans — hash-gate delimiter, overflow
    # clamp, banded final skyline pass (the r7 repeated-spans island-merge
    # entries were superseded by the r8 ones below)
    "llm_lang_temperature_sample": 7,
    "llm_length_bucketing": 7,
    "rel_skyline_frontier": 7,
    # r7: scoring/top-k extracted to bm25_rank_from for the streaming
    # incremental index (plan-identical refactor, bitwise-verified locally
    # — re-entered on principle)
    "llm_bm25_topk": 7,
    # r8: winnow helpers parameterized by (k, gap) for the K-sensitivity
    # sweep — defaults reproduce the canonical pipeline bitwise (verified
    # via oracle_check on every consumer); re-entered on principle
    "llm_winnow_fingerprints": 8,
    "llm_repeated_spans": 8,
    "llm_span_scrub_apply": 8,
    "stream_incremental_repeated_spans": 8,
    "llm_pretrain_pipeline_v2": 8,
    # r8: scoring kernels extracted for the new streaming mirrors
    # (rfm_from_per_customer / token_budget_from_per_source) — bitwise
    # verified via oracle_check; re-entered on principle
    "rel_rfm_segments": 8,
    "llm_token_budget_plan": 8,
    "llm_gopher_rules": 8,
    "llm_readability_score": 8,
    # r8 (late): lm_token_logprob's pairs/scoring split into shared kernels
    # for the composed-pipeline streaming mirror (plan-identical refactor,
    # bitwise-verified via oracle_check) — downstream consumers whose own
    # source did not change re-enter on principle
    "llm_lm_ppl_filter": 8,
    "llm_filter_agreement": 8,
    # r12: _pf_candidate_pairs gained t_num/t_den threshold params for the
    # blocking threshold sweep (defaults preserve behavior exactly; both
    # consumers re-verified bitwise via oracle_check) — re-enter on principle
    "llm_prefix_filter_join": 12,
    "llm_blocking_cost_eval": 12,
    # r12: theil-sen exact audit branch moved from the percentile UDAF to
    # distributed selection (_exact_median_by_selection) — same multiset
    # median, both consumers re-verified bitwise via oracle_check
    "rel_theil_sen_sampled": 12,
    "stream_incremental_theil_sen_sampled": 12,
    # r12: _priority_sample_sql / _markov_sql gained a `where` param for
    # the retraction mirrors' survivor oracles (defaults preserve behavior
    # exactly; consumers re-verified bitwise) — re-enter on principle
    "llm_priority_sample": 12,
    "stream_incremental_priority_sample": 12,
    "rel_markov_stationary": 12,
    "stream_incremental_markov": 12,
    # r12 (late): compact_signed_state hardened to the exclude-current /
    # tmp+_SUCCESS-recovery protocol (replay of a compaction epoch no
    # longer loses the fold) — all four consumers re-verified bitwise
    "stream_incremental_quantile_retract": 12,
    "stream_incremental_rfm_retract": 12,
    "stream_incremental_seasonal_retract": 12,
    "stream_incremental_shortest_path_retract": 12,
}


def _query_src_hash(fn: object) -> str | None:
    """md5 of the query function's source text — the change signal behind
    the git-aware recheck. Direct source only: a helper edited in another
    function does NOT bump consumers' hashes (cover those with
    _FORCE_RECHECK, as the r7 island-merge entry does)."""
    import hashlib
    import inspect

    try:
        return hashlib.md5(inspect.getsource(fn).encode()).hexdigest()
    except Exception:
        return None


def _load_query_hashes() -> dict[str, str]:
    """name -> source hash recorded at that query's LAST green driver row
    (QUERY_HASHES.json at the repo root, maintained by
    tools/refresh_query_hashes.py at round start). Empty when absent."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        with open(os.path.join(root, "QUERY_HASHES.json")) as fh:
            data = json.load(fh)
        return {
            k: v["hash"]
            for k, v in data.items()
            if isinstance(v, dict) and isinstance(v.get("hash"), str)
        }
    except Exception:
        return {}


# INVARIANT: this memo assumes registered query functions are immutable for
# the life of the process. Anything that reloads or monkeypatches a query
# function after the first all_queries() call (importlib.reload, a test
# simulating source drift) must call _clear_src_hash_cache() first, or
# _changed_since_green silently compares against stale hashes (r8 ADVICE).
_SRC_HASH_CACHE: dict[str, str | None] = {}


def _clear_src_hash_cache() -> None:
    """Invalidate the per-process source-hash memo — for tests/tools that
    reload or patch query functions mid-process."""
    _SRC_HASH_CACHE.clear()


def _current_src_hashes() -> dict[str, str | None]:
    """Per-process memo of every registered query's CURRENT source hash —
    the inspect.getsource+md5 pass is the expensive leg of the git-aware
    recheck and function sources cannot change mid-process, so hashing
    ~290 functions on every all_queries() call was pure overhead
    (r7 ADVICE). The QUERY_HASHES.json snapshot is deliberately NOT
    memoized: it is tiny, and tests (and tools) swap it out."""
    if not _SRC_HASH_CACHE:
        for name, fn in _collect_queries().items():
            _SRC_HASH_CACHE[name] = _query_src_hash(fn)
    return _SRC_HASH_CACHE


def _changed_since_green(green: frozenset[str]) -> set[str]:
    """Green-tail queries whose CURRENT function source no longer matches
    the hash recorded at their last green driver row — their green
    evidence describes code that no longer exists, so they jump the green
    tail into the recheck window (the r6 VERDICT's git-aware hook)."""
    recorded = _load_query_hashes()
    if not recorded:
        return set()
    current = _current_src_hashes()
    out: set[str] = set()
    for name in green:
        h = current.get(name)
        if name in recorded and h is not None and h != recorded[name]:
            out.add(name)
    return out


def _driver_green_rounds() -> dict[str, int] | None:
    """Map each driver-CHECKED query to the round of its latest qualifying
    row, read from the driver's own CORRECTNESS_r*.json artifacts at the repo
    root. A qualifying row is either fully green (rows+schema+hash) or a
    deliberate rows-only row (``err == "no_oracle"`` — the strongest signal
    that query can ever get, so re-running it wastes a slot). These have the
    least to gain from a scarce window slot, so they sort LAST — and within
    that green tail, oldest round FIRST, so in the all-green steady state the
    50-slot window re-verifies the 50 stalest rows each round and a silent
    regression anywhere in the tail is re-checked within ~ceil(228/50)
    rounds. Anything the driver has never checked — including every query
    added after _WINDOW_PRIORITY was written — sorts between the priority
    block and this tail, in module order. Reading the artifacts (instead of a
    hand-maintained list) makes the rotation self-updating: each round the
    freshly-checked queries drop to the END of the tail and the stalest ones
    move up. A ``_FORCE_RECHECK`` name only counts as green from a row
    recorded in >= its change round — older rows are stale evidence for
    reworked code, newer rows re-green it automatically. Returns None if no
    artifacts are readable (callers fall back to the static round-1 list)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green: dict[str, int] = {}
    found = False
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
            if not isinstance(rows, dict):
                continue  # unknown artifact shape: ignore, don't crash
            found = True
            for name, row in rows.items():
                if not isinstance(row, dict):
                    continue
                if rnd < _FORCE_RECHECK.get(name, 0):
                    continue  # row predates the query's rework: stale
                fully_green = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                )
                # rows-only (no oracle) rows count as checked ONLY when the
                # query actually produced rows — a 0-row regression must
                # re-enter the window, not hide in the tail
                checked_rows_only = row.get("err") == "no_oracle" and (
                    row.get("spark_rows") or 0
                ) > 0
                if fully_green or checked_rows_only:
                    green[name] = rnd
                else:
                    # latest round wins: files are iterated in ascending round
                    # order, so a newer red/errored row EVICTS a green earned
                    # in an earlier round — a regressed query must re-enter
                    # the window instead of hiding in the green tail
                    green.pop(name, None)
        except Exception:
            continue
    return green if found else None


def _driver_green() -> frozenset[str]:
    """Set view of :func:`_driver_green_rounds` (static round-1 fallback when
    no artifacts are readable)."""
    rounds = _driver_green_rounds()
    if rounds is None:
        return _R1_GREEN - set(_FORCE_RECHECK)
    return frozenset(rounds)


# Static fallback: round-1 green rows (used only if the artifacts are gone).
_R1_GREEN: frozenset[str] = frozenset(
    {
        "noise_bbox_filter",
        "noise_grid_bounds",
        "noise_grid_flagship",
        "noise_heat_triples",
        "noise_phase_classify",
        "noise_slant_distance",
        "noise_source_levels",
        "rel_agg_count_distinct",
        "rel_agg_cube",
        "rel_agg_grouping_sets",
        "rel_agg_median_argmax",
        "rel_agg_rollup",
        "rel_agg_stats",
        "rel_array_funcs",
        "rel_conditional_case",
        "rel_date_funcs",
        "rel_date_funcs2",
        "rel_distinct_pairs",
        "rel_explode_wordcount",
        "rel_from_unixtime",
        "rel_histogram_bucket",
        "rel_join_anti",
        "rel_join_cross",
        "rel_join_full_outer",
        "rel_join_left_outer",
        "rel_join_right_outer",
        "rel_join_semi",
        "rel_math_funcs",
        "rel_null_handling",
        "rel_pivot_status",
        "rel_q1_pricing_summary",
        "rel_q3_top_orders",
        "rel_q5_nation_revenue",
        "rel_salted_join_agg",
        "rel_set_except",
        "rel_set_intersect",
        "rel_set_union",
        "rel_sort_limit_topk",
        "rel_stats_moments",
        "rel_string_funcs",
        "rel_string_funcs2",
        "rel_unpivot_balances",
        "rel_win_arg_max",
        "rel_win_frames",
        "rel_win_lag_lead",
        "rel_win_moving_avg",
        "rel_win_rank",
        "rel_win_running_sum",
        "rel_win_topk_orders",
    }
)


def _window_order(d: dict[str, object]) -> dict[str, object]:
    rounds = _driver_green_rounds()
    green = (
        frozenset(rounds)
        if rounds is not None
        else _R1_GREEN - set(_FORCE_RECHECK)
    )
    out = {
        name: d[name]
        for name in _WINDOW_PRIORITY
        if name in d and name not in green
    }
    out.update(
        {name: v for name, v in d.items() if name not in out and name not in green}
    )
    # Green-but-source-changed block: green rows describing code that has
    # since changed jump the tail (stalest first), right after the
    # never-green queries — the git-aware recheck hook.
    changed = _changed_since_green(green)
    jump = [name for name in d if name not in out and name in changed]
    jump.sort(key=lambda n: (rounds or {}).get(n, 0))
    out.update({name: d[name] for name in jump})
    # Green tail: stalest driver row first (stable on module order within a
    # round), so the steady-state window re-verifies the oldest evidence.
    tail = [name for name in d if name not in out]
    tail.sort(key=lambda n: (rounds or {}).get(n, 0))
    out.update({name: d[name] for name in tail})
    return out


def _collect_queries() -> dict[str, QueryFn]:
    """Raw name -> fn map in module order, BEFORE window ordering (the
    ordering itself needs this map to hash function sources)."""
    out: dict[str, QueryFn] = {}
    from . import domain

    out.update(domain.domain_queries())
    try:
        from . import relational

        out.update(relational.queries())
    except ImportError:
        pass
    try:
        from . import llm

        out.update(llm.queries())
    except ImportError:
        pass
    try:
        from . import streaming_plans

        out.update(streaming_plans.queries())
    except ImportError:
        pass
    return out


def all_queries() -> dict[str, QueryFn]:
    return _window_order(_collect_queries())


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    from . import domain

    out.update(domain.domain_oracles())
    try:
        from . import relational

        out.update(relational.oracles())
    except ImportError:
        pass
    try:
        from . import llm

        out.update(llm.oracles())
    except ImportError:
        pass
    try:
        from . import streaming_plans

        out.update(streaming_plans.oracles())
    except ImportError:
        pass
    return _window_order({k: v for k, v in out.items() if v is not None})
