"""Training-data prep operators (round 2): chunking, packing, split, scrub,
heavy hitters, mixing — plus the TPC-H-shape relational fill."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from air_traffic_data_pipeline_spark.plans import llm, relational
from air_traffic_data_pipeline_spark.plans.tables import load

SF = "/root/testdata/sf0.001"


def test_chunking_partitions_every_doc(spark):
    """Chunks tile each document exactly: token counts re-sum to the doc's
    word count, chunk ids are dense from 0, and only the last chunk may be
    ragged."""
    docs = load(spark, SF, "documents")
    chunks = llm.doc_chunking(spark, SF)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("tok"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_id").alias("max_id"),
        F.min("chunk_id").alias("min_id"),
    )
    joined = per_doc.join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("wc")), "doc_id"
    )
    bad = joined.filter(
        (F.col("tok") != F.col("wc"))
        | (F.col("min_id") != 0)
        | (F.col("max_id") != F.col("n_chunks") - 1)
    )
    assert bad.count() == 0
    assert per_doc.count() == docs.count()
    # every non-final chunk is exactly CHUNK_WORDS tokens
    short = chunks.join(per_doc.select("doc_id", "max_id"), "doc_id").filter(
        (F.col("chunk_id") < F.col("max_id"))
        & (F.col("n_tokens") != llm.CHUNK_WORDS)
    )
    assert short.count() == 0


def test_packing_conserves_tokens_and_orders_bins(spark):
    """Packing neither drops nor duplicates tokens, and bins within a source
    are dense consecutive ids starting at 0."""
    docs = load(spark, SF, "documents")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    packs = llm.sequence_packing(spark, SF).collect()
    assert sum(p.tokens_packed for p in packs) == total
    by_source: dict[str, list[int]] = {}
    for p in packs:
        by_source.setdefault(p.source, []).append(p.pack_id)
    for ids in by_source.values():
        ids.sort()
        assert ids == list(range(len(ids)))


def test_split_partitions_corpus_with_expected_shape(spark):
    rows = {r.split: r for r in llm.train_val_split(spark, SF).collect()}
    n_docs = load(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows.values()) == n_docs
    assert rows["train"].n_docs > rows.get("val", rows["train"]).n_docs or n_docs < 20
    # determinism: rerun gives the identical partition
    again = {r.split: r.n_docs for r in llm.train_val_split(spark, SF).collect()}
    assert again == {k: v.n_docs for k, v in rows.items()}


def test_pii_scrub_redacts_all_digit_runs(spark):
    out = llm.pii_scrub(spark, SF)
    n_events = load(spark, SF, "events").count()
    rows = out.collect()
    assert len(rows) == n_events  # every props payload carries a number
    assert all(r.n_num_redactions >= 1 for r in rows)


def test_heavy_hitters_topk_is_sorted_and_exact(spark):
    rows = llm.heavy_hitters(spark, SF).collect()
    assert len(rows) == 20
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # spot-check one token's count against a direct filter
    w0 = rows[0].w
    direct = (
        load(spark, SF, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") == w0)
        .count()
    )
    assert direct == rows[0].freq


def test_mixing_rates_within_tolerance(spark):
    for r in llm.dataset_mixing(spark, SF).collect():
        assert 0 <= r.n_kept <= r.n_total
        # hash sampling is unbiased; at tiny SF just bound the realized rate
        assert 0.0 <= r.realized_rate <= 1.0


def test_q18_rows_all_exceed_threshold(spark):
    rows = relational.q18_large_orders(spark, SF).collect()
    assert all(r.sum_qty > 150 for r in rows)


def test_hll_estimates_close_to_exact(spark):
    """Sketch partial + merge: per-group estimates within 5% of exact, and
    the merged global estimate within 5% of the true global distinct."""
    rows = {r.l_returnflag: r for r in relational._hll_partial_raw(spark, SF).collect()}
    li = load(spark, SF, "lineitem")
    for flag, r in rows.items():
        if flag == "ALL":
            exact = li.select("l_partkey").distinct().count()
        else:
            exact = (
                li.filter(F.col("l_returnflag") == flag)
                .select("l_partkey").distinct().count()
            )
        assert r.exact_parts == exact
        assert abs(r.est_parts - exact) <= max(2, 0.05 * exact)
    # and the registered (oracle-facing) form reports every band satisfied
    for r in relational.hll_partial_merge(spark, SF).collect():
        assert r.est_within_band, r.l_returnflag


def test_null_safe_join_matches_null_group(spark):
    rows = {r.k: r for r in relational.join_null_safe(spark, SF).collect()}
    assert None in rows, "NULL <=> NULL group must match"
    assert rows[None].n_pairs == rows[None].n_cust * rows[None].n_supp


def test_date_spine_is_dense_and_flags_gaps(spark):
    rows = sorted(relational.date_spine_gapfill(spark, SF).collect(), key=lambda r: r.day)
    days = [r.day for r in rows]
    assert days == list(range(days[0], days[-1] + 1)), "spine must be gapless"
    for r in rows:
        assert (r.n_events == 0) == r.is_gap
    assert rows[0].n_events > 0 and rows[-1].n_events > 0  # bounds come from data


def test_fuzzy_match_detects_near_dups(spark):
    """The synthetic corpus has near-duplicate docs; their edit distance on
    the shared prefix must be far below the random-pair baseline."""
    pairs = llm.fuzzy_match_levenshtein(spark, SF).collect()
    near = llm.minhash_near_dup_pairs(spark, SF).filter(
        (F.col("doc_a") < llm.FUZZY_MAX_ID) & (F.col("doc_b") < llm.FUZZY_MAX_ID)
    ).collect()
    got = {(p.doc_a, p.doc_b) for p in pairs}
    for n in near:
        assert (n.doc_a, n.doc_b) in got, "true near-dup missed by edit-distance kernel"


def test_quality_pandas_udf_matches_native(spark):
    """Arrow scalar UDF and native column expression agree bitwise."""
    udf = llm.quality_pandas_udf(spark, SF)
    from air_traffic_data_pipeline_spark.plans.llm import _SPECS

    native_fn = dict((n, f) for n, f, _ in _SPECS)["llm_quality_score"]
    native = native_fn(spark, SF)
    diff = udf.alias("u").join(native.alias("n"), "doc_id").filter(
        F.col("u.quality") != F.col("n.quality")
    )
    assert diff.count() == 0


def test_q6_matches_manual_filter(spark):
    li = load(spark, SF, "lineitem")
    manual = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).count()
    )
    row = relational.q6_revenue_band(spark, SF).collect()[0]
    assert row.n_items == manual


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe LSH probes a superset of buckets, so its recall@3 can
    never be below single-probe recall on any query."""
    rows = llm.ann_recall_eval(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.recall_single <= r.recall_multi <= 1.0


def test_asof_forward_includes_same_ts_click(spark, tmp_path):
    """A click at EXACTLY the error's timestamp must match (clk_ts >= err_ts),
    and the smallest click id wins ties — the generated lakes contain no
    same-user same-ts pairs, so this synthetic lake pins the semantics."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        asof_join,
        asof_join_forward,
    )

    rows = [
        # (event_id, ts_nanos, user_id, event_type, value, props)
        (1, 100, 7, "error", 1.0, "{}"),
        (2, 100, 7, "click", 1.0, "{}"),  # same-ts click: must win forward
        (3, 200, 7, "click", 1.0, "{}"),
        (4, 500, 7, "error", 1.0, "{}"),  # no future click -> NULL
        (5, 50, 7, "click", 1.0, "{}"),   # past click: backward's match
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    lake = str(tmp_path / "lake")
    df.write.parquet(f"{lake}/events.parquet")

    fwd = {r.err_id: r.clk_id for r in asof_join_forward(spark, lake).collect()}
    assert fwd == {1: 2, 4: None}
    back = {r.err_id: r.clk_id for r in asof_join(spark, lake).collect()}
    assert back == {1: 2, 4: 3}


def test_dq_checks_clean_lake_all_pass(spark):
    """The synthetic lake satisfies every constraint; counts line up with
    the raw tables so a violation could never hide in n_rows."""
    rows = {r.check_name: r for r in relational.dq_checks(spark, SF).collect()}
    assert len(rows) == 6
    assert all(r.n_violations == 0 for r in rows.values())
    assert all(r["pass"] == 1 for r in rows.values())
    assert rows["orders_null_custkey"].n_rows == load(spark, SF, "orders").count()
    assert rows["lineitem_orphan_orderkey"].n_rows == load(spark, SF, "lineitem").count()


def test_dq_checks_catches_injected_violations(spark):
    """Feed the ACTUAL check kernel corrupted frames: every constraint
    must count its injected violations — the checks are live, not
    vacuously green."""
    li = load(spark, SF, "lineitem").limit(50)
    od = load(spark, SF, "orders").limit(40)
    ev = load(spark, SF, "events").limit(30)
    bad_li = li.withColumn("l_orderkey", F.lit(-999)).withColumn(
        "l_quantity", F.lit(-1.0).cast(li.schema["l_quantity"].dataType)
    )
    bad_od = od.withColumn("o_custkey", F.lit(None).cast("long")).withColumn(
        "o_orderstatus", F.lit("X")
    )
    bad_ev = ev.withColumn("value", F.lit(-5.0)).withColumn(
        "user_id", F.lit(None).cast("long")
    )
    rows = {
        r.check_name: r
        for r in relational.dq_checks_over(bad_li, bad_od, bad_ev).collect()
    }
    assert rows["lineitem_orphan_orderkey"].n_violations == 50
    assert rows["lineitem_nonpositive_qty"].n_violations == 50
    assert rows["orders_null_custkey"].n_violations == 40
    assert rows["orders_unknown_status"].n_violations == 40
    assert rows["events_negative_value"].n_violations == 30
    assert rows["events_null_user"].n_violations == 30
    assert all(r["pass"] == 0 for r in rows.values())


def test_funnel_is_monotone_and_ordered(spark):
    """Step counts can only shrink, and every converting user's step times
    are strictly increasing."""
    steps = {r.step: r.n_users for r in relational.funnel_steps(spark, SF).collect()}
    assert set(steps) == {1, 2, 3}
    assert steps[1] >= steps[2] >= steps[3]
    assert steps[1] > 0


def test_cohort_retention_accounts_every_user(spark):
    """k=0 rows partition all active users by first week; no negative
    offsets exist."""
    rows = relational.cohort_retention(spark, SF).collect()
    assert all(r.k >= 0 for r in rows)
    n_users = (
        load(spark, SF, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows if r.k == 0) == n_users


def test_ab_test_zscore_matches_numpy(spark):
    """The decimal-sum pipeline must reproduce numpy's two-sample z within
    rounding, with sample variance (ddof=1)."""
    import numpy as np

    ev = (
        load(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "value")
        .collect()
    )
    a = np.array([r.value for r in ev if r.user_id % 2 == 0])
    b = np.array([r.value for r in ev if r.user_id % 2 == 1])
    want = (b.mean() - a.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    row = relational.ab_test_zscore(spark, SF).collect()[0]
    assert row.n_control == len(a) and row.n_treatment == len(b)
    assert abs(row.z_score - round(float(want), 6)) < 1e-6


def test_k_anonymity_classes_account_all_events(spark):
    """Equivalence classes partition the event log exactly; violation flag
    agrees with the threshold; buckets recomputed driver-side with the
    same integer arithmetic."""
    from collections import Counter

    rows = relational.k_anonymity(spark, SF).collect()
    ev = (
        relational.load(spark, SF, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    want = Counter(
        (r.event_type, (r.ts // 1_000_000_000 // 3600) % 24, int(r.value // 25.0))
        for r in ev
    )
    got = {(r.event_type, r.hour, r.value_band): r for r in rows}
    assert sum(r.n for r in rows) == len(ev)
    assert {k: v.n for k, v in got.items()} == dict(want)
    for r in rows:
        assert r.k_violation == int(r.n < relational.K_ANON_THRESHOLD)


def test_tseries_motif_matches_reference(spark):
    """Recompute every user's z-normalized sliding-window distance to the
    ramp pattern in Python with the identical in-order folds; top-5 must
    match exactly."""
    rows = [(r.user_id, r.event_id, r.dist) for r in relational.tseries_motif(spark, SF).collect()]
    assert len(rows) == relational.TSM_TOPK

    ev = sorted(
        relational.load(spark, SF, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    L = relational.TSM_LEN
    pat = relational.TSM_PATTERN
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)
    scored = []
    for uid, rs in per_user.items():
        for i in range(L - 1, len(rs)):
            wv = [rs[j].value for j in range(i - L + 1, i + 1)]
            m = 0.0
            for x in wv:
                m += x
            m /= float(L)
            v = 0.0
            for x in wv:
                v += (x - m) * (x - m)
            s = (v / float(L)) ** 0.5
            if not s > 0.0:
                continue
            d = 0.0
            for x, p in zip(wv, pat):
                d += ((x - m) / s - p) * ((x - m) / s - p)
            scored.append((uid, rs[i].event_id, round(d, 6)))
    want = sorted(scored, key=lambda t: (t[2], t[0], t[1]))[: relational.TSM_TOPK]
    assert rows == want


def test_tseries_motif_ignores_null_values(spark, tmp_path):
    """A NULL reading is excluded identically on both sides (it would
    otherwise shrink Spark's collect_list frame while DuckDB's list()
    kept it): results equal the clean-series recompute."""
    sf = str(tmp_path)
    ev = relational.load(spark, SF, "events").limit(200)
    nulled = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 37 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    nulled.write.parquet(f"{sf}/events.parquet")
    out = relational.tseries_motif(spark, sf)
    rows = out.collect()
    assert 0 < len(rows) <= relational.TSM_TOPK
    assert all(r.dist is not None for r in rows)


def test_skew_diagnostics_partitions_all_rows(spark):
    """Buckets partition the fact exactly; load factors average to 1."""
    rows = relational.skew_diagnostics(spark, SF).collect()
    n = relational.load(spark, SF, "lineitem").count()
    assert sum(r.n_rows for r in rows) == n
    assert 0 < len(rows) <= relational.SKEW_BUCKETS
    total_lf = sum(r.load_factor * r.n_rows for r in rows)
    for r in rows:
        assert abs(r.load_factor - round(r.n_rows * relational.SKEW_BUCKETS / n, 6)) < 1e-9


def test_time_weighted_avg_matches_reference(spark):
    """TWAP recomputed per user with exact nano intervals and the same
    sorted fold; users with a single reading are excluded."""
    rows = {r.user_id: r for r in relational.time_weighted_avg(spark, SF).collect()}
    ev = sorted(
        relational.load(spark, SF, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)
    for uid, rs in per_user.items():
        if len(rs) < 2:
            assert uid not in rows
            continue
        num = 0.0
        dt_sum = 0
        for a, b in zip(rs, rs[1:]):
            dt = b.ts - a.ts
            num += a.value * float(dt)
            dt_sum += dt
        r = rows[uid]
        assert r.n_intervals == len(rs) - 1
        if dt_sum > 0:
            assert r.twa_value == round(num / float(dt_sum), 6)
        else:
            assert r.twa_value is None


def test_gaps_islands_matches_reference(spark):
    """Islands recomputed per supplier from distinct ship-day sets: every
    maximal consecutive-day run of length >= ISL_MIN_LEN, exactly once."""
    rows = sorted(
        (r.l_suppkey, r.day_start, r.day_end, r.island_len)
        for r in relational.gaps_islands(spark, SF).collect()
    )
    import datetime as dt

    li = load(spark, SF, "lineitem").select("l_suppkey", "l_shipdate").collect()
    epoch = dt.date(1970, 1, 1)
    days = {}
    for r in li:
        d = r.l_shipdate.date() if hasattr(r.l_shipdate, "date") else r.l_shipdate
        days.setdefault(r.l_suppkey, set()).add((d - epoch).days)
    want = []
    for sk, ds in days.items():
        run = []
        for d in sorted(ds) + [None]:
            if run and (d is None or d != run[-1] + 1):
                if len(run) >= relational.ISL_MIN_LEN:
                    want.append((sk, run[0], run[-1], len(run)))
                run = []
            if d is not None:
                run.append(d)
    assert rows == sorted(want)
    assert rows, "sf0.001 must contain at least one multi-day island"


def test_ewma_matches_reference(spark):
    """EWMA recurrence replayed in pure Python over the same
    (ts, event_id) order, seeded with the first value."""
    rows = {r.user_id: r for r in relational.ewma_per_user(spark, SF).collect()}
    ev = sorted(
        load(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r.value)
    a = relational.EWMA_ALPHA
    for uid, vals in per_user.items():
        y = vals[0]
        for x in vals[1:]:
            y = a * x + (1.0 - a) * y
        r = rows[uid]
        assert r.n_events == len(vals)
        assert r.ewma_last == round(y, 6)
    assert set(rows) == set(per_user)


def test_interval_overlap_matches_reference(spark):
    """Overlap counts recomputed with pure Python date math for each promo
    window (start_a <= end_b AND end_a >= start_b)."""
    import datetime as dt

    rows = {
        r.promo_id: (r.n_orders, r.n_custs)
        for r in relational.interval_overlap_join(spark, SF).collect()
    }
    orders = load(spark, SF, "orders").select("o_custkey", "o_orderdate").collect()
    want = {}
    for pid, s, e in relational.PROMO_WINDOWS:
        ps = dt.date.fromisoformat(s)
        pe = dt.date.fromisoformat(e)
        hits = [
            o
            for o in orders
            if o.o_orderdate.date() <= pe
            and o.o_orderdate.date() + dt.timedelta(days=relational.FULFILL_DAYS) >= ps
        ]
        if hits:
            want[pid] = (len(hits), len({o.o_custkey for o in hits}))
    assert rows == want
    assert rows, "promo windows must overlap some orders at sf0.001"


def test_first_touch_attribution_matches_reference(spark):
    """First click per user (min (ts, event_id)), purchases inside the
    7-day band summed in (ts, event_id) order; zero-match users report
    n=0 / 0.0, never-clicked users are absent."""
    rows = {r.user_id: r for r in relational.first_touch_attribution(spark, SF).collect()}
    ev = load(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()
    clicks = {}
    for r in ev:
        if r.event_type == "click":
            k = (r.ts, r.event_id)
            if r.user_id not in clicks or k < clicks[r.user_id]:
                clicks[r.user_id] = k
    assert set(rows) == set(clicks)
    for uid, (cts, _) in clicks.items():
        pur = sorted(
            (r.ts, r.event_id, r.value)
            for r in ev
            if r.user_id == uid
            and r.event_type == "purchase"
            and r.value is not None
            and cts <= r.ts <= cts + relational.ATTR_WINDOW_NS
        )
        total = 0.0
        for _, _, v in pur:
            total += v
        r = rows[uid]
        assert r.click_ts == cts
        assert r.n_purchases == len(pur)
        assert r.attributed_value == round(total, 6)


def test_gaps_islands_synthetic_edges(spark, tmp_path):
    """Controlled island structure: duplicate lineitems on one day
    collapse, singleton days are excluded by ISL_MIN_LEN, runs split
    exactly at missing days, and a run crossing a month boundary stays
    one island."""
    import datetime as dt

    sf = str(tmp_path)
    base = load(spark, SF, "lineitem").limit(0)

    def day(s):
        return dt.datetime.fromisoformat(s)

    rows = [
        # supplier 1: run of 3 (incl. month boundary), gap, singleton
        (1, "1995-01-30"), (1, "1995-01-31"), (1, "1995-02-01"),
        (1, "1995-02-05"),
        # supplier 2: duplicates on the same day + neighbor -> one island of 2
        (2, "1995-03-10"), (2, "1995-03-10"), (2, "1995-03-11"),
        # supplier 3: singletons only -> no output
        (3, "1995-04-01"), (3, "1995-04-03"),
    ]
    df = spark.createDataFrame(
        [(sk, day(d)) for sk, d in rows], "l_suppkey long, l_shipdate timestamp"
    )
    cols = {c: F.lit(None).cast(t.dataType) for c, t in zip(base.columns, base.schema) if c not in df.columns}
    out_df = df.select("*", *[v.alias(k) for k, v in cols.items()]).select(base.columns)
    out_df.write.parquet(f"{sf}/lineitem.parquet")

    epoch = dt.date(1970, 1, 1)

    def dn(s):
        return (dt.date.fromisoformat(s) - epoch).days

    got = sorted(
        (r.l_suppkey, r.day_start, r.day_end, r.island_len)
        for r in relational.gaps_islands(spark, sf).collect()
    )
    assert got == [
        (1, dn("1995-01-30"), dn("1995-02-01"), 3),
        (2, dn("1995-03-10"), dn("1995-03-11"), 2),
    ]


def test_ewma_single_event_user(spark, tmp_path):
    """A user with exactly one event: the fold seed IS the answer
    (slice(_, 2, 0) returns empty — pinned, since that edge is easy to
    regress into an error or NULL)."""
    import datetime as dt

    sf = str(tmp_path)
    base = load(spark, SF, "events").limit(0)
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 101, "view", 42.5, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 0, 0), 102, "view", 10.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 0, 0, 1), 102, "view", 20.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).select(base.columns)
    df.write.parquet(f"{sf}/events.parquet")
    rows = {r.user_id: r for r in relational.ewma_per_user(spark, sf).collect()}
    assert rows[101].n_events == 1 and rows[101].ewma_last == 42.5
    a = relational.EWMA_ALPHA
    assert rows[102].ewma_last == round(a * 20.0 + (1 - a) * 10.0, 6)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
def test_sketch_error_bounds_both_scales(spark, sf):
    """VERDICT r5 item 7: the two rows-only sketch queries carry pytest
    accuracy bounds at sf0.1 as well as the tiny SF — approx distinct
    within 5% of exact per group, approx median inside the group's true
    value range and within 5% of the exact median; HLL partial+merge
    within 5% at every group and globally."""
    exact = {
        r.l_returnflag: (r.n_parts, r.med)
        for r in load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("med"),
        )
        .collect()
    }
    got = {r.l_returnflag: r for r in relational._approx_distinct_raw(spark, sf).collect()}
    assert set(got) == set(exact)
    for flag, (n_parts, med) in exact.items():
        r = got[flag]
        assert abs(r.approx_parts - n_parts) <= max(2, 0.05 * n_parts), flag
        assert abs(r.approx_median_price - med) <= 0.05 * med, flag
    for r in relational.approx_distinct(spark, sf).collect():
        assert r.parts_est_within_band and r.median_est_within_band, r.l_returnflag

    rows = {r.l_returnflag: r for r in relational._hll_partial_raw(spark, sf).collect()}
    li = load(spark, sf, "lineitem")
    glob = li.select("l_partkey").distinct().count()
    for flag, r in rows.items():
        ex = glob if flag == "ALL" else exact[flag][0]
        assert abs(r.est_parts - ex) <= max(2, 0.05 * ex), flag
    for r in relational.hll_partial_merge(spark, sf).collect():
        assert r.est_within_band, r.l_returnflag


def test_market_basket_matches_reference(spark):
    """Association rules recomputed driver-side with itertools over the
    collected (order, brand) baskets: every pair count, support,
    confidence and lift matches, and no qualifying pair is missing."""
    import itertools

    got = {
        (r.brand_a, r.brand_b): r
        for r in relational.market_basket(spark, SF).collect()
    }
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    pt = load(spark, SF, "part").select("p_partkey", "p_brand")
    rows = li.join(pt, li.l_partkey == pt.p_partkey).select(
        "l_orderkey", "p_brand"
    ).collect()
    baskets: dict[int, set[str]] = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.p_brand)
    n_orders = len(baskets)
    supp: dict[str, int] = {}
    pair_cnt: dict[tuple[str, str], int] = {}
    for items in baskets.values():
        for it in items:
            supp[it] = supp.get(it, 0) + 1
        for a, b in itertools.combinations(sorted(items), 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    want = {k: c for k, c in pair_cnt.items() if c >= relational.BASKET_MIN_PAIR}
    assert set(got) == set(want)
    for (a, b), c in want.items():
        r = got[(a, b)]
        assert r.n_ab == c and r.n_a == supp[a] and r.n_b == supp[b]
        assert r.n_orders == n_orders
        assert r.support == round(c / n_orders, 6)
        assert r.confidence == round(c / supp[a], 6)
        assert r.lift == round(c * n_orders / (supp[a] * supp[b]), 6)
    assert want, "sf0.001 should produce qualifying brand pairs"


def test_zorder_morton_interleave_unit(spark):
    """The mask-and-shift Morton spread matches the bit-twiddling
    reference for a sweep of 8-bit coordinate pairs."""
    def spread(v: int) -> int:
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        return (v | (v << 1)) & 0x5555

    pairs = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (7, 200), (63, 64)]
    df = spark.createDataFrame(pairs, "x int, y int")
    z = relational._morton_spread(F.col("x")).bitwiseOR(
        F.shiftleft(relational._morton_spread(F.col("y")), 1)
    )
    got = {(r.x, r.y): r.z for r in df.select("x", "y", z.alias("z")).collect()}
    for x, y in pairs:
        want = spread(x) | (spread(y) << 1)
        assert got[(x, y)] == want, (x, y)
        # interleave really alternates bits: reconstruct x from even bits
        rx = sum(((want >> (2 * i)) & 1) << i for i in range(8))
        ry = sum(((want >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (rx, ry) == (x, y)


def test_zorder_layout_beats_natural(spark):
    """The point of z-ordering: Morton-prefix files carry a far smaller
    average bounding box over (customer, day) than insert-order files,
    so min/max file skipping prunes on BOTH dimensions. Also pins the
    row-conservation invariant (both layouts tile all orders)."""
    rows = {r.layout: r for r in relational.zorder_layout(spark, SF).collect()}
    assert set(rows) == {"natural", "zorder"}
    n = load(spark, SF, "orders").count()
    assert rows["natural"].n_rows == n and rows["zorder"].n_rows == n
    nat, zo = rows["natural"], rows["zorder"]
    assert zo.avg_bbox_area < nat.avg_bbox_area / 2, (
        zo.avg_bbox_area,
        nat.avg_bbox_area,
    )


def test_skyline_frontier_matches_bruteforce(spark):
    """Frontier recomputed by brute-force dominance over the distinct
    (price, size) pairs; the two-phase bucket pruning must produce
    exactly the dominated-free set, with counts and exemplars intact."""
    p = load(spark, SF, "part").select("p_retailprice", "p_size", "p_partkey").collect()
    agg: dict[tuple, list[int]] = {}
    for r in p:
        agg.setdefault((r.p_retailprice, r.p_size), []).append(r.p_partkey)
    pairs = list(agg)
    def dominated(x):
        return any(
            y[0] <= x[0] and y[1] <= x[1] and (y[0] < x[0] or y[1] < x[1])
            for y in pairs
        )
    want = {
        (pr, sz, len(agg[(pr, sz)]), min(agg[(pr, sz)]))
        for (pr, sz) in pairs
        if not dominated((pr, sz))
    }
    got = {
        (r.price, r.size, r.n_parts, r.min_partkey)
        for r in relational.skyline_frontier(spark, SF).collect()
    }
    assert got == want
    assert 1 <= len(got) < len(pairs), "frontier should prune most pairs"


def test_ewma_anomaly_flags_matches_reference(spark):
    """Prefix-EWMA residual screen replayed in pure Python (same order,
    same float sequence): sigma, anomaly counts, and max residual must
    match, and the threshold must flag at least one anomaly somewhere."""
    import math

    rows = {
        r.user_id: r for r in relational.ewma_anomaly_flags(spark, SF).collect()
    }
    ev = sorted(
        load(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per_user: dict[int, list[float]] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r.value)
    a = relational.EWMA_ALPHA
    total_anoms = 0
    for uid, vals in per_user.items():
        n = len(vals)
        ews = [vals[0]]
        for x in vals[1:]:
            ews.append(a * x + (1.0 - a) * ews[-1])
        rs = [vals[i] - ews[i - 1] for i in range(1, n)]
        sx = 0.0
        for v in vals:
            sx += v
        sxx = 0.0
        for v in vals:
            sxx += v * v
        sigma = math.sqrt((n * sxx - sx * sx) / (n * n))
        anoms = sum(1 for r in rs if abs(r) > relational.ANOM_K * sigma)
        mx = 0.0
        for r in rs:
            mx = max(mx, abs(r))
        g = rows[uid]
        assert g.n_events == n
        assert g.sigma == round(sigma, 6)
        assert g.n_anomalies == anoms
        assert g.max_resid == round(mx, 6)
        total_anoms += anoms
    assert set(rows) == set(per_user)
    assert total_anoms > 0, "the threshold should flag something at sf0.001"


def test_user_erasure_audit_consistent(spark):
    """Per-table accounting must balance, and the lineitem cascade must
    equal the driver-side recompute through erased orders."""
    rows = {
        r.table_name: r for r in relational.user_erasure_audit(spark, SF).collect()
    }
    assert set(rows) == {"events", "customer", "orders", "lineitem"}
    for r in rows.values():
        assert r.rows_before == r.rows_removed + r.rows_after
    orders = load(spark, SF, "orders").select("o_orderkey", "o_custkey").collect()
    erased = {o.o_orderkey for o in orders if o.o_custkey % relational.ERASE_MOD == 0}
    li = load(spark, SF, "lineitem").select("l_orderkey").collect()
    assert rows["lineitem"].rows_removed == sum(1 for x in li if x.l_orderkey in erased)
    assert rows["orders"].rows_removed == len(erased)
    assert sum(r.rows_removed for r in rows.values()) > 0


def test_session_paths_matches_reference(spark):
    """Transition counts and conditional probabilities replayed in pure
    Python over the same session split; probabilities per from-type sum
    to 1 and cross-session boundaries contribute nothing."""
    ev = sorted(
        load(spark, SF, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    gap = relational.SESS_GAP_US
    want: dict[tuple, int] = {}
    prev_user, prev_us, prev_type = None, None, None
    for r in ev:
        us = r.ts // 1000
        same_sess = (
            r.user_id == prev_user and prev_us is not None and us - prev_us <= gap
        )
        if same_sess:
            want[(prev_type, r.event_type)] = want.get((prev_type, r.event_type), 0) + 1
        prev_user, prev_us, prev_type = r.user_id, us, r.event_type
    rows = relational.session_paths(spark, SF).collect()
    got = {(r.from_type, r.to_type): r.n for r in rows}
    assert got == want
    from_tot: dict[str, int] = {}
    for (f, _t), n in want.items():
        from_tot[f] = from_tot.get(f, 0) + n
    for r in rows:
        assert r.p_given_from == round(r.n / from_tot[r.from_type], 6)


def test_dp_noisy_counts_reference(spark):
    """Laplace inverse-CDF noise replayed in pure Python from the same
    hash-seeded uniforms; released = count + noise; |noise| scale sane."""
    import hashlib
    import math

    rows = {r.event_type: r for r in relational.dp_noisy_counts(spark, SF).collect()}
    ev = load(spark, SF, "events").select("event_type").collect()
    counts: dict[str, int] = {}
    for r in ev:
        counts[r.event_type] = counts.get(r.event_type, 0) + 1
    assert set(rows) == set(counts)
    b = 1.0 / relational.DP_EPSILON
    for t, n in counts.items():
        u = (int(hashlib.md5(t.encode()).hexdigest()[:4], 16) + 0.5) / 65536.0
        half = u - 0.5
        sign = (half > 0) - (half < 0)
        noise = -b * sign * math.log(1.0 - 2.0 * abs(half))
        g = rows[t]
        assert g.true_count == n
        assert g.noise == round(noise, 6)
        assert g.released == round(n + noise, 6)


def test_dataset_diff_balances(spark):
    """The four statuses partition the joined universe: added+changed+
    unchanged = current docs; removed+changed+unchanged = prev docs; each
    class is non-empty at sf0.001 (the derivation guarantees all four)."""
    from air_traffic_data_pipeline_spark.plans import llm

    rows = {r.status: r for r in llm.dataset_diff(spark, SF).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    docs = load(spark, SF, "documents").select("doc_id").collect()
    n = len(docs)
    n_added = sum(1 for d in docs if d.doc_id % llm.DIFF_ADD_MOD == 3)
    n_removed = sum(1 for d in docs if d.doc_id % llm.DIFF_RM_MOD == 7)
    n_changed = sum(
        1
        for d in docs
        if d.doc_id % llm.DIFF_ADD_MOD != 3 and d.doc_id % llm.DIFF_CHG_MOD == 5
    )
    assert rows["added"].n_docs == n_added
    assert rows["removed"].n_docs == n_removed
    assert rows["changed"].n_docs == n_changed
    assert rows["unchanged"].n_docs == n - n_added - n_changed


def test_clamped_running_balance_matches_reference(spark):
    """The floor-0 recurrence replayed in pure Python (same order, same
    float sequence): final balance, clamp count and lost value match
    bitwise, and the lake actually exercises the clamp somewhere."""
    rows = {
        r.user_id: r
        for r in relational.clamped_running_balance(spark, SF).collect()
    }
    ev = sorted(
        load(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    per: dict[int, list[float]] = {}
    for r in ev:
        d = -r.value if r.event_type == "purchase" else r.value
        per.setdefault(r.user_id, []).append(d)
    clamps = 0
    for uid, ds in per.items():
        bal, nc, lost = relational.BALANCE_SEED, 0, 0.0
        for d in ds:
            t = bal + d
            if t < 0:
                nc += 1
                lost += -t
                bal = 0.0
            else:
                bal = max(0.0, t)
        g = rows[uid]
        assert g.n_events == len(ds)
        assert g.final_balance == round(bal, 6)
        assert g.n_clamped == nc
        assert g.value_lost == round(lost, 6)
        clamps += nc
    assert set(rows) == set(per)
    assert clamps > 0, "fixture should trigger at least one clamp"


def test_max_concurrency_matches_reference(spark):
    """The +1/-1 sweep replayed in pure Python per priority: peak live
    count and earliest peak date match, and the peak exceeds 1 somewhere
    (the fixture's 90-day windows overlap heavily)."""
    import datetime as dt

    rows = {
        r.o_orderpriority: r
        for r in relational.max_concurrency(spark, SF).collect()
    }
    orders = (
        load(spark, SF, "orders").select("o_orderpriority", "o_orderdate").collect()
    )
    epoch = dt.date(1970, 1, 1)
    deltas: dict[str, dict[int, int]] = {}
    for o in orders:
        day = (o.o_orderdate.date() - epoch).days
        d = deltas.setdefault(o.o_orderpriority, {})
        d[day] = d.get(day, 0) + 1
        end = day + relational.FULFILL_DAYS + 1
        d[end] = d.get(end, 0) - 1
    want = {}
    for pri, d in deltas.items():
        live, peak, peak_day = 0, None, None
        for day in sorted(d):
            live += d[day]
            if peak is None or live > peak:
                peak, peak_day = live, day
        want[pri] = (peak, (epoch + dt.timedelta(days=peak_day)).isoformat())
    got = {p: (r.peak_live, r.peak_date) for p, r in rows.items()}
    assert got == want
    assert max(p for p, _ in want.values()) > 1


def test_rfm_segments_matches_reference(spark):
    """RFM scores replayed in pure Python/numpy: per-customer recency/
    frequency/monetary from raw orders, quintile boundaries via the same
    linear-interpolated percentile (rounded 4 dp), segment rollup counts
    and means exact."""
    import numpy as np

    orders = (
        load(spark, SF, "orders")
        .select(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .collect()
    )
    per: dict[int, list] = {}
    for r in orders:
        e = per.setdefault(r.o_custkey, [None, 0, 0])
        e[0] = r.d if e[0] is None else max(e[0], r.d)
        e[1] += 1
        e[2] += r.p
    ref = max(e[0] for e in per.values())
    base = {
        c: ((ref - e[0]).days, e[1], float(e[2])) for c, e in per.items()
    }
    qs = list(relational.RFM_QS)
    bounds = [
        [
            round(float(np.quantile([b[i] for b in base.values()], q, method="linear")), 4)
            for q in qs
        ]
        for i in range(3)
    ]
    segs: dict[tuple, list] = {}
    for rec, freq, mon in base.values():
        r_s = 5 - sum(rec > b for b in bounds[0])
        f_s = 1 + sum(freq > b for b in bounds[1])
        m_s = 1 + sum(mon > b for b in bounds[2])
        e = segs.setdefault((r_s, f_s, m_s), [0, 0, 0, 0.0])
        e[0] += 1
        e[1] += rec
        e[2] += freq
        e[3] += mon
    rows = relational.rfm_segments(spark, SF).collect()
    assert len(rows) == len(segs)
    for r in rows:
        e = segs[(r.r_score, r.f_score, r.m_score)]
        assert r.segment == f"{r.r_score}-{r.f_score}-{r.m_score}"
        assert r.n_customers == e[0]
        assert r.avg_recency_days == e[1] / e[0]
        assert r.avg_orders == e[2] / e[0]
        assert abs(r.avg_monetary - e[3] / e[0]) < 1e-6
    assert {r.r_score for r in rows} == {1, 2, 3, 4, 5}


def test_l_diversity_matches_reference(spark):
    """Distinct-band counts per QI class replayed in pure Python; the
    fixture must contain at least one violating and one passing class."""
    events = load(spark, SF, "events").select("event_type", "ts", "value").collect()
    classes: dict[tuple, set] = {}
    sizes: dict[tuple, int] = {}
    import math

    for r in events:
        hour = (r.ts // 1_000_000_000 // 3600) % 24
        band = math.floor(r.value / 25.0)
        k = (r.event_type, hour)
        classes.setdefault(k, set()).add(band)
        sizes[k] = sizes.get(k, 0) + 1
    rows = {
        (r.event_type, r.hour): r
        for r in relational.l_diversity(spark, SF).collect()
    }
    assert set(rows) == set(classes)
    for k, bands in classes.items():
        r = rows[k]
        assert r.n == sizes[k]
        assert r.l_distinct == len(bands)
        assert r.l_violation == int(len(bands) < relational.L_DIVERSITY)
    flags = {r.l_violation for r in rows.values()}
    assert flags == {0, 1}


def test_benford_audit_matches_reference(spark):
    """First-digit counts replayed in pure Python from the decimal
    rendering; expectation/chi2 parts from the same fixed dag; all nine
    digits must appear in the fixture."""
    import math
    from decimal import Decimal

    orders = load(spark, SF, "orders").select("o_totalprice").collect()
    counts: dict[int, int] = {}
    for r in orders:
        d = str(Decimal(repr(r.o_totalprice)).quantize(Decimal("0.01")))[0]
        if d.isdigit() and d != "0":
            counts[int(d)] = counts.get(int(d), 0) + 1
    n = sum(counts.values())
    rows = {r.digit: r for r in relational.benford_audit(spark, SF).collect()}
    assert set(rows) == set(counts)
    assert set(counts) == set(range(1, 10)), "fixture should hit all digits"
    for d, c in counts.items():
        exp = n * math.log10(1.0 + 1.0 / d)
        r = rows[d]
        assert r.n_obs == c
        assert abs(r.n_expected - exp) < 5e-4
        assert abs(r.chi2_part - (c - exp) ** 2 / exp) < 5e-6


def test_fifo_matching_equals_procedural_queue(spark):
    """The cumulative-interval intersection must equal an actual
    procedural FIFO queue replay (pop receipts first-in-first-out per
    issue): same matched (receipt, issue) pairs, same quantities; and at
    least one issue must span two receipts (a real split)."""
    li = (
        load(spark, SF, "lineitem")
        .filter(F.col("l_partkey") < relational.FIFO_MAX_PART)
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
        .collect()
    )
    lots: dict[tuple, int] = {}
    for r in li:
        k = (r.l_partkey, r.l_orderkey, r.l_linenumber)
        lots[k] = lots.get(k, 0) + int(r.l_quantity)
    parts: dict[int, dict[str, list]] = {}
    for (pk, ok, ln) in sorted(lots):
        side = "in" if ln % 2 == 1 else "out"
        parts.setdefault(pk, {"in": [], "out": []})[side].append(
            (ok, ln, lots[(pk, ok, ln)])
        )
    want: dict[tuple, int] = {}
    split_seen = False
    for pk, sides in parts.items():
        queue = [list(x) for x in sides["in"]]  # mutable remaining qty
        qi = 0
        for o_ord, o_line, o_qty in sides["out"]:
            need = o_qty
            used = 0
            while need > 0 and qi < len(queue):
                r_ord, r_line, r_rem = queue[qi]
                take = min(need, r_rem)
                if take > 0:
                    want[(pk, r_ord, r_line, o_ord, o_line)] = take
                    used += 1
                queue[qi][2] -= take
                need -= take
                if queue[qi][2] == 0:
                    qi += 1
            if used > 1:
                split_seen = True
    got = {
        (r.l_partkey, r.in_order, r.in_line, r.out_order, r.out_line): r.qty_matched
        for r in relational.fifo_matching(spark, SF).collect()
    }
    assert got == want and len(want) > 0
    assert split_seen, "fixture should split an issue across receipts"


def test_fifo_interval_formulation_property():
    """Pure-math property (no Spark): for ANY receipt/issue quantity
    streams, cumulative-interval intersection produces exactly the
    procedural FIFO queue's matches. This is the identity the
    rel_fifo_matching plan relies on; engine parity is pinned separately
    by the oracle and the fixture test."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=50), max_size=12),
        st.lists(st.integers(min_value=1, max_value=50), max_size=12),
    )
    def check(rec_q, iss_q):
        # intervals
        ri, c = [], 0
        for i, q in enumerate(rec_q):
            ri.append((i, c, c + q))
            c += q
        ii, c = [], 0
        for j, q in enumerate(iss_q):
            ii.append((j, c, c + q))
            c += q
        interval = {
            (i, j): min(rh, ih) - max(rl, il)
            for i, rl, rh in ri
            for j, il, ih in ii
            if rl < ih and il < rh
        }
        # procedural queue
        queue = [[i, q] for i, q in enumerate(rec_q)]
        qi, want = 0, {}
        for j, q in enumerate(iss_q):
            need = q
            while need > 0 and qi < len(queue):
                take = min(need, queue[qi][1])
                if take > 0:
                    want[(queue[qi][0], j)] = take
                queue[qi][1] -= take
                need -= take
                if queue[qi][1] == 0:
                    qi += 1
        assert interval == want

    check()


def test_shortest_path_matches_reference(spark):
    """Bellman-Ford replayed driver-side in pure Python (same edge
    weights, same K relaxation rounds, same double sums); the (source,
    node, dist) table must match bitwise, every source must reach itself
    at distance 0, and K rounds must genuinely use the hop bound (some
    node's K-hop distance improves on its 1-hop distance, i.e. multi-edge
    paths won)."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        SP_N_SOURCES,
        SP_ROUNDS,
        shortest_path,
    )

    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order: dict[int, list[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, []).append(r.l_partkey)
    cnt: dict[tuple, int] = {}
    for parts in by_order.values():
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                if a == b:
                    continue
                k = (min(a, b), max(a, b))
                cnt[k] = cnt.get(k, 0) + 1
    adj: dict[int, list[tuple]] = {}
    for (a, b), c in cnt.items():
        w = round(1.0 / c, 6)
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    sources = sorted(adj)[:SP_N_SOURCES]
    want = {}
    for s in sources:
        dist = {s: 0.0}
        for _ in range(SP_ROUNDS):
            nxt = dict(dist)
            for u, d in dist.items():
                for v, w in adj.get(u, []):
                    nd = d + w
                    if nd < nxt.get(v, float("inf")):
                        nxt[v] = nd
            dist = nxt
        for n, d in dist.items():
            want[(s, n)] = round(d, 6)
    got = {
        (r.source, r.node): r.dist for r in shortest_path(spark, SF).collect()
    }
    assert got == want
    for s in sources:
        assert got[(s, s)] == 0.0
    multi_hop_won = any(
        (s, n) in got and n not in dict(adj.get(s, [])) and s != n
        for (s, n) in got
    )
    assert multi_hop_won, "hop bound never exercised beyond 1 edge"


def test_semantic_contamination_subset_of_exact(spark):
    """Banded semantic contamination vs exact brute force at the same tau:
    every flagged corpus item must be a true positive with the EXACT max
    similarity (banding can lower recall, never precision), and the
    banded pass must catch a usable share of the exact positives at this
    tau/probe setting."""
    from air_traffic_data_pipeline_spark.functions.vectors import cosine, to_double
    from air_traffic_data_pipeline_spark.plans.llm import (
        CONTAM_BENCH_MAX_ID,
        SEM_CONTAM_TAU,
        semantic_contamination,
    )

    e = load(spark, SF, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    b = e.filter(F.col("vec_id") < CONTAM_BENCH_MAX_ID).select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv")
    )
    c = e.filter(F.col("vec_id") >= CONTAM_BENCH_MAX_ID).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    exact = (
        c.crossJoin(F.broadcast(b))
        .select("c_id", "b_id", F.round(cosine(F.col("bv"), F.col("cv")), 6).alias("cs"))
        .filter(F.col("cs") >= SEM_CONTAM_TAU)
        .groupBy("c_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("cs").alias("mx"))
        .collect()
    )
    exact_by_id = {r.c_id: (r.n, r.mx) for r in exact}
    got = {r.vec_id: (r.n_bench_hits, r.max_sim)
           for r in semantic_contamination(spark, SF).collect()}
    assert got, "banded pass found nothing at this tau"
    for vid, (n, mx) in got.items():
        assert vid in exact_by_id, vid
        en, emx = exact_by_id[vid]
        assert n <= en and mx <= emx, (vid, n, en, mx, emx)
    # at the synthetic lake's tau (0.3 — barely above random for these
    # vectors) hyperplane LSH is intentionally weak; real contamination
    # (paraphrases, cos >= ~0.9) is the planted-fixture test below
    recall = len(got) / len(exact_by_id)
    assert recall >= 0.1, (recall, len(got), len(exact_by_id))


def test_semantic_contamination_recall_on_planted_dups(spark, tmp_path):
    """The realistic contamination regime: corpus items that ARE
    near-copies of benchmark items (deterministically perturbed bench
    vectors, cosine ~0.99). Multi-probe banding must recover a solid
    majority of the planted contaminants — this is the recall claim the
    operator actually makes at production taus, where hyperplane bits
    agree with high probability."""
    from air_traffic_data_pipeline_spark.plans.llm import (
        CONTAM_BENCH_MAX_ID,
        semantic_contamination,
    )

    sf = str(tmp_path)
    base = load(spark, SF, "embeddings").filter(
        F.col("vec_id") < CONTAM_BENCH_MAX_ID
    )
    planted = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x * F.lit(0.97)
                + F.lit(0.01) * F.sin((F.col("vec_id") + 1).cast("double") * (i + 1).cast("double"))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    base.unionByName(planted).write.parquet(f"{sf}/embeddings.parquet")
    got = {r.vec_id for r in semantic_contamination(spark, sf).collect()}
    planted_ids = {r.vec_id for r in planted.select("vec_id").collect()}
    found = got & planted_ids
    recall = len(found) / len(planted_ids)
    assert recall >= 0.6, (recall, len(found), len(planted_ids))


def test_quantile_sketch_matches_reference(spark):
    """Histogram quantile sketch replayed driver-side in pure Python (same
    two passes, same bin width, same integer ranks, same interpolation);
    every row must match bitwise and every estimate must sit within one
    bin width of the exact percentile (the guarantee column must be 1
    across the board — equi-width histograms cannot miss by more than a
    bin on the value axis)."""
    import math

    from air_traffic_data_pipeline_spark.plans.relational import (
        QS_BINS,
        QS_PCTS,
        quantile_sketch,
    )

    xs = sorted(
        r.o_totalprice for r in load(spark, SF, "orders").select("o_totalprice").collect()
    )
    lo, hi, n = min(xs), max(xs), len(xs)
    w = (hi - lo) / float(QS_BINS)
    counts: dict[int, int] = {}
    for x in xs:
        b = min(int(math.floor((x - lo) / w)), QS_BINS - 1)
        counts[b] = counts.get(b, 0) + 1
    want = {}
    for p in QS_PCTS:
        rank = (n * p + 99) // 100
        cum = 0
        for b in sorted(counts):
            if cum + counts[b] >= rank:
                est = lo + w * (b + (rank - cum) / counts[b])
                break
            cum += counts[b]
        q = p / 100.0
        pos = (n - 1) * q
        f = int(math.floor(pos))
        frac = pos - f
        exact = xs[f] + (xs[f + 1] - xs[f]) * frac if f + 1 < n else xs[f]
        want[p] = (rank, round(est, 4), round(exact, 4))
    got = {
        r.q_pct: (r.rank, r.est_q, r.exact_q, r.within_one_bin)
        for r in quantile_sketch(spark, SF).collect()
    }
    assert set(got) == set(want)
    for p, (rank, est, exact) in want.items():
        g = got[p]
        assert g[:3] == (rank, est, exact), (p, g, (rank, est, exact))
        assert g[3] == 1, p


def test_rfm_sketch_boundaries_tradeoff(spark):
    """The boundary-tradeoff audit: the rescore count must equal a direct
    replay (count customers whose count-of-boundaries-below differs
    between exact and sketch boundary sets), every boundary must sit
    within one bin width, and the misclassification rate must be small
    (the sketch's whole point — boundary error <= bin width moves only
    customers inside that bin)."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        RFM_SK_PCTS,
        rfm_sketch_boundaries,
    )

    rows = sorted(rfm_sketch_boundaries(spark, SF).collect(), key=lambda r: r.q_pct)
    assert [r.q_pct for r in rows] == list(RFM_SK_PCTS)
    # at sf0.001 (150 customers over 512 bins) the interpolated percentile
    # can sit several SPARSE bins from the rank statistic — the one-bin
    # flag is only expected to hold once bins are populated (sf0.01 below)
    dense = sorted(
        rfm_sketch_boundaries(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.q_pct,
    )
    assert all(r.within_one_bin == 1 for r in dense), dense
    e = {r.q_pct: r.exact_b for r in rows}
    s = {r.q_pct: r.sketch_b for r in rows}
    per = (
        load(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("m")
        )
        .collect()
    )
    moved = sum(
        1
        for r in per
        if sum(r.m > e[p] for p in RFM_SK_PCTS) != sum(r.m > s[p] for p in RFM_SK_PCTS)
    )
    assert rows[0].n_rescored == moved
    assert rows[0].n_customers == len(per)
    assert moved <= max(2, 0.05 * len(per)), (moved, len(per))


def _copurchase_graph(spark):
    """(adj_weighted, cnt) driver-side replay of copurchase_pairs: adj maps
    node -> [(nbr, 1/cnt-rounded)] for the distance queries, cnt holds the
    raw integer pair counts for the vote/rank queries."""
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order: dict[int, list[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, []).append(r.l_partkey)
    cnt: dict[tuple, int] = {}
    for parts in by_order.values():
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                if a == b:
                    continue
                k = (min(a, b), max(a, b))
                cnt[k] = cnt.get(k, 0) + 1
    adj: dict[int, list[tuple]] = {}
    for (a, b), c in cnt.items():
        w = round(1.0 / c, 6)
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    return adj, cnt


def test_shortest_path_k_audit_matches_reference(spark):
    """The K-sensitivity audit vs a pure-Python replay that snapshots one
    relaxation pass at K=2/4/8 (the same single-pass discipline the Spark
    side uses): per-(K, source) reached/converged/max_dist must match, and
    the audit's own invariants must hold — reached is non-decreasing in K,
    converged <= reached, and at K=Kmax converged == reached."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        SP_AUDIT_ROUNDS,
        SP_N_SOURCES,
        shortest_path_k_audit,
    )

    adj, _ = _copurchase_graph(spark)
    sources = sorted(adj)[:SP_N_SOURCES]
    kmax = max(SP_AUDIT_ROUNDS)
    snaps: dict[int, dict] = {}
    per_src = {}
    for s in sources:
        dist = {s: 0.0}
        hist = {}
        for k in range(1, kmax + 1):
            nxt = dict(dist)
            for u, d in dist.items():
                for v, w in adj.get(u, []):
                    nd = d + w
                    if nd < nxt.get(v, float("inf")):
                        nxt[v] = nd
            dist = nxt
            if k in SP_AUDIT_ROUNDS:
                hist[k] = dict(dist)
        per_src[s] = hist
    want = {}
    for s in sources:
        final = per_src[s][kmax]
        for k in SP_AUDIT_ROUNDS:
            dk = per_src[s][k]
            reached = len(dk)
            converged = sum(1 for n, d in dk.items() if d == final[n])
            max_dist = round(max(dk.values()), 6)
            want[(k, s)] = (reached, converged, max_dist)
    got = {
        (r.k, r.source): (r.reached, r.converged, r.max_dist)
        for r in shortest_path_k_audit(spark, SF).collect()
    }
    assert got == want
    for s in sources:
        ks = sorted(SP_AUDIT_ROUNDS)
        reach = [got[(k, s)][0] for k in ks]
        assert reach == sorted(reach), "reached must be monotone in K"
        for k in ks:
            assert got[(k, s)][1] <= got[(k, s)][0]
        assert got[(kmax, s)][1] == got[(kmax, s)][0]


def test_label_propagation_matches_reference(spark):
    """Weighted LPA vs a pure-Python synchronous replay (integer vote
    totals, ties to the smallest label): the community table must match
    exactly, membership must partition the node set, and at least one
    genuine multi-member community must form."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        LP_ROUNDS,
        label_propagation_communities,
    )

    _, cnt = _copurchase_graph(spark)
    out_edges: dict[int, list[tuple]] = {}
    for (a, b), c in cnt.items():
        out_edges.setdefault(a, []).append((b, c))
        out_edges.setdefault(b, []).append((a, c))
    nodes = sorted(out_edges)
    labels = {v: v for v in nodes}
    for _ in range(LP_ROUNDS):
        tally: dict[int, dict[int, int]] = {}
        for u, nbrs in out_edges.items():
            lu = labels[u]
            for v, w in nbrs:
                tally.setdefault(v, {}).setdefault(lu, 0)
                tally[v][lu] += w
        new = {}
        for v in nodes:
            t = tally.get(v)
            if t:
                new[v] = max(t.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            else:
                new[v] = labels[v]
        labels = new
    want: dict[int, list[int]] = {}
    for v, l in labels.items():
        want.setdefault(l, []).append(v)
    want_rows = {
        (l, len(m), min(m), max(m)) for l, m in want.items()
    }
    got_rows = {
        (r.community, r.n_members, r.min_member, r.max_member)
        for r in label_propagation_communities(spark, SF).collect()
    }
    assert got_rows == want_rows
    assert sum(r[1] for r in got_rows) == len(nodes)
    assert any(r[1] >= 2 for r in got_rows), "no community ever formed"


def test_pagerank_integer_matches_reference(spark):
    """Integer micro-unit PageRank vs a pure-Python replay using the same
    floor-division fixed point: the top-20 table must match exactly, ranks
    must be positive, and total mass must stay within the documented
    floor-leak envelope of the initial SCALE."""
    from air_traffic_data_pipeline_spark.operators.graph import PAGERANK_SCALE
    from air_traffic_data_pipeline_spark.plans.relational import (
        PR_ROUNDS,
        PR_TOPK,
        pagerank_copurchase,
    )

    _, cnt = _copurchase_graph(spark)
    out_edges: dict[int, list[tuple]] = {}
    for (a, b), c in cnt.items():
        out_edges.setdefault(a, []).append((b, c))
        out_edges.setdefault(b, []).append((a, c))
    nodes = sorted(out_edges)
    sw = {u: sum(w for _, w in nbrs) for u, nbrs in out_edges.items()}
    n = len(nodes)
    r0 = PAGERANK_SCALE // n
    base = (15 * r0) // 100
    rank = {v: r0 for v in nodes}
    for _ in range(PR_ROUNDS):
        s: dict[int, int] = {}
        for u, nbrs in out_edges.items():
            ru = rank[u]
            du = sw[u]
            for v, w in nbrs:
                s[v] = s.get(v, 0) + (ru * w) // du
        rank = {v: base + (85 * s.get(v, 0)) // 100 for v in nodes}
    top = sorted(nodes, key=lambda v: (-rank[v], v))[:PR_TOPK]
    want = {(v, rank[v]) for v in top}
    got = {
        (r.node, r.rank_micro) for r in pagerank_copurchase(spark, SF).collect()
    }
    assert got == want
    assert all(rm > 0 for _, rm in got)
    total = sum(rank.values())
    assert 0.9 * PAGERANK_SCALE <= total <= PAGERANK_SCALE + n


def test_kcore_decomposition_matches_reference(spark):
    """Bounded k-core peeling vs a pure-Python replay (same round budget,
    same both-endpoints-surviving degree rule): the per-k table must match
    exactly, cores must nest (4-core <= 3-core <= 2-core), and a converged
    flag must mean the replayed fixed point was actually reached."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        KC_KS,
        KC_ROUNDS,
        kcore_decomposition,
    )

    _, cnt = _copurchase_graph(spark)
    adj: dict[int, set] = {}
    for a, b in cnt:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    by_k = {}
    for k in KC_KS:
        surv = set(adj)
        prev = surv
        for _ in range(KC_ROUNDS):
            prev = surv
            surv = {u for u in surv if len(adj[u] & surv) >= k}
        core_edges = sum(len(adj[u] & surv) for u in surv) // 2
        want[k] = (
            len(surv),
            core_edges,
            len(surv) == len(prev),
            min(surv) if surv else None,
            max(surv) if surv else None,
        )
        by_k[k] = surv
    got = {
        r.k: (r.core_nodes, r.core_edges, r.converged, r.min_node, r.max_node)
        for r in kcore_decomposition(spark, SF).collect()
    }
    assert got == want
    ks = sorted(KC_KS)
    for lo, hi in zip(ks, ks[1:]):
        assert by_k[hi] <= by_k[lo], "cores must nest"
    # every converged core is the true k-core: one more replay round is a
    # no-op
    for k in ks:
        if got[k][2]:
            surv = by_k[k]
            again = {u for u in surv if len(adj[u] & surv) >= k}
            assert again == surv


def test_core_numbers_matches_reference(spark):
    """Per-node core-number decomposition vs a pure-Python replay of the
    identical bounded, peel-shared sweep (k's peel seeded from (k-1)'s
    survivors): every node's coreness must match exactly, the coreness
    histogram must be consistent with nesting, and at every k the
    decomposition's >=k set must equal the replayed k-survivor set."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        KCN_KMAX,
        KCN_ROUNDS,
        core_numbers_copurchase,
    )

    _, cnt = _copurchase_graph(spark)
    adj: dict[int, set] = {}
    for a, b in cnt:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {u: 1 for u in adj}
    by_k = {}
    surv = set(adj)
    for k in range(2, KCN_KMAX + 1):
        for _ in range(KCN_ROUNDS):
            surv = {u for u in surv if len(adj[u] & surv) >= k}
        for u in surv:
            want[u] = k
        by_k[k] = set(surv)
    rows = core_numbers_copurchase(spark, SF).collect()
    got = {r.node: r.core for r in rows}
    assert got == want
    # output is ordered by node and covers the node set exactly once
    assert [r.node for r in rows] == sorted(adj)
    # decomposition vs survivor sets: {v : core >= k} == bounded k-core
    for k in range(2, KCN_KMAX + 1):
        assert {u for u, c in got.items() if c >= k} == by_k[k]
    assert all(1 <= c <= KCN_KMAX for c in got.values())


def test_two_hop_recs_matches_reference(spark):
    """Degree-capped 2-hop recommendations vs a pure-Python replay of the
    identical definition (top-M strongest edges per node with the
    (cnt desc, partner asc) tie order, path-weight scoring, direct-edge
    exclusion, per-node top-k with the (score desc, rec asc) tie order):
    every (node, rank, rec, score) row must match exactly."""
    from air_traffic_data_pipeline_spark.plans.relational import (
        REC_TOP_EDGES,
        REC_TOP_K,
        two_hop_recs,
    )

    _, cnt = _copurchase_graph(spark)
    e: dict[int, dict[int, int]] = {}
    for (a, b), c in cnt.items():
        e.setdefault(a, {})[b] = c
        e.setdefault(b, {})[a] = c
    top = {
        u: sorted(nbrs.items(), key=lambda kv: (-kv[1], kv[0]))[:REC_TOP_EDGES]
        for u, nbrs in e.items()
    }
    want = []
    for u in sorted(e):
        score: dict[int, int] = {}
        for m, c1 in top[u]:
            for v, c2 in top.get(m, []):
                if v == u or v in e[u]:
                    continue
                score[v] = score.get(v, 0) + c1 * c2
        ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:REC_TOP_K]
        for i, (v, s) in enumerate(ranked, 1):
            want.append((u, i, v, s))
    got = [tuple(r) for r in two_hop_recs(spark, SF).collect()]
    assert got == want and want


def test_seq_pattern_match_reference(spark):
    """The MATCH_RECOGNIZE-lite regex scan replayed in pure Python: the
    same per-user-day ordered strings, Python's re (a third regex engine
    next to Java and RE2) extracting leftmost non-overlapping matches,
    and the same per-(pattern, length) rollup."""
    import re
    from collections import defaultdict

    ev = sorted(
        load(spark, SF, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts // 1000, r.event_id),
    )
    seqs: dict[tuple, list[str]] = defaultdict(list)
    for r in ev:
        day = (r.ts // 1000) // relational.MICROS_PER_DAY
        seqs[(r.user_id, day)].append(r.event_type[0])
    want: dict[tuple, tuple[int, set]] = {}
    for name, rx in relational.SEQ_PATTERNS:
        for key, chars in seqs.items():
            for hit in re.findall(rx, "".join(chars)):
                k = (name, len(hit))
                n, s = want.get(k, (0, set()))
                want[k] = (n + 1, s | {key})
    got = {
        (r.pattern, r.match_len): (r.n_matches, r.n_seqs)
        for r in relational.seq_pattern_match(spark, SF).collect()
    }
    assert got == {k: (n, len(s)) for k, (n, s) in want.items()}
    assert got  # non-vacuous at sf0.001


def test_seq_pattern_non_overlapping_semantics(spark):
    """Crafted sequences pin the scan semantics: backtracking inside
    `vc*p` (vcvp yields ONE match, the trailing vp), non-overlap
    (vpvp yields two length-2 matches, vpvpv only two), and the greedy
    error-burst run split eee+ee -> one 3-run and one 2-run across a
    day boundary."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []

    def add(uid, day, codes):
        full = {"v": "view", "c": "click", "p": "purchase",
                "s": "signup", "e": "error"}
        for i, ch in enumerate(codes):
            rows.append(
                (len(rows), base + dt.timedelta(days=day, minutes=i),
                 uid, full[ch], 1.0, "{}")
            )

    add(100, 0, "vcvp")    # backtrack: one browse_to_buy of length 2 (vp)
    add(101, 0, "vpvp")    # two non-overlapping length-2 matches
    add(102, 0, "vccp")    # one length-4 match
    add(103, 0, "eee")     # one 3-burst
    add(103, 1, "ee")      # day boundary: separate 2-burst
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        got = {
            (r.pattern, r.match_len): (r.n_matches, r.n_seqs)
            for r in relational.seq_pattern_match(spark, td).collect()
        }
    assert got == {
        ("browse_to_buy", 2): (3, 2),   # vcvp's vp + vpvp's two
        ("browse_to_buy", 4): (1, 1),   # vccp
        ("error_burst", 3): (1, 1),
        ("error_burst", 2): (1, 1),
    }


def test_ks_two_sample_reference(spark):
    """ECDF sup-gap replayed in exact integer arithmetic in Python; the
    argmax value, Stephens lambda, and one-term tail all reproduced."""
    import math

    ev = load(spark, SF, "events").select("user_id", "value").collect()
    a = sorted(r.value for r in ev if r.value is not None and r.user_id % 2 == 0)
    b = sorted(r.value for r in ev if r.value is not None and r.user_id % 2 == 1)
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    best_num, best_v = -1, None
    ia = ib = 0
    for v in values:
        while ia < na and a[ia] <= v:
            ia += 1
        while ib < nb and b[ib] <= v:
            ib += 1
        num = abs(ia * nb - ib * na)
        if num > best_num:
            best_num, best_v = num, v
    d = best_num / (na * nb)
    en = math.sqrt(na * nb / (na + nb))
    lam = (en + 0.12 + 0.11 / en) * d
    row = relational.ks_two_sample(spark, SF).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.ks_d == round(d, 6)
    assert row.d_at_value == best_v
    assert row.lambda_eff == round(lam, 6)
    assert row.p_approx == round(2.0 * math.exp(-2.0 * lam * lam), 6)


def test_bh_fdr_step_up_reference(spark):
    """Welch z grid + Zelen-Severo tail + BH step-up replayed in Python;
    the rejected set must be the step-up prefix, not the naive per-row
    comparison (a p above its own threshold is still rejected when a
    later rank passes)."""
    import math
    from collections import defaultdict

    ev = load(spark, SF, "events").select("user_id", "ts", "event_type", "value").collect()
    cells = defaultdict(lambda: [0, 0, 0.0, 0.0, 0.0, 0.0])
    for r in ev:
        if r.value is None:
            continue
        wd = ((r.ts // 1000) // relational.MICROS_PER_DAY) % 7
        c = cells[(r.event_type, wd)]
        v = round(r.value, 2)
        if r.user_id % 2 == 0:
            c[0] += 1; c[2] += v; c[4] += v * v
        else:
            c[1] += 1; c[3] += v; c[5] += v * v
    pv = {}
    for key, (n_a, n_b, sa, sb, ssa, ssb) in cells.items():
        if n_a < 2 or n_b < 2:
            continue
        va = (ssa - sa * sa / n_a) / (n_a - 1)
        vb = (ssb - sb * sb / n_b) / (n_b - 1)
        z = (sb / n_b - sa / n_a) / math.sqrt(va / n_a + vb / n_b)
        az = abs(z)
        t = 1.0 / (1.0 + relational._ZS_T * az)
        poly = sum(bc * t ** (i + 1) for i, bc in enumerate(relational._ZS_B))
        phi = math.exp(-az * az / 2.0) / math.sqrt(2.0 * math.pi)
        pv[key] = (round(z, 6), round(2.0 * phi * poly, 6))
    rows = {(r.event_type, r.weekday): r for r in relational.bh_fdr(spark, SF).collect()}
    assert set(rows) == set(pv)
    m = len(pv)
    ordered = sorted(pv.items(), key=lambda kv: (kv[1][1], kv[0][0], kv[0][1]))
    k_ok = 0
    for i, (_k, (_z, p)) in enumerate(ordered, 1):
        if p <= round(i * relational.BH_Q / m, 6):
            k_ok = i
    for i, (key, (z, p)) in enumerate(ordered, 1):
        row = rows[key]
        assert (row.z_score, row.p_value, row.p_rank) == (z, p, i)
        assert row.rejected == (i <= k_ok)
    assert any(r.rejected for r in rows.values()) or k_ok == 0


def test_conformal_interval_reference(spark):
    """Split-conformal replay: exact integer rank k = ceil(0.9(n+1)),
    q_hat the k-th smallest calibration residual, coverage re-counted on
    the test split; marginal coverage must be >= 1 - alpha - slack on
    the real lake (the finite-sample guarantee holds per type here
    because values are iid by construction)."""
    from collections import defaultdict

    ev = load(spark, SF, "events").select("event_id", "event_type", "value").collect()
    cal = defaultdict(list)
    tst = defaultdict(list)
    for r in ev:
        if r.value is None:
            continue
        v = round(r.value, 2)
        (cal if r.event_id % 2 == 0 else tst)[r.event_type].append((v, r.event_id))
    rows = {r.event_type: r for r in relational.conformal_interval(spark, SF).collect()}
    for et, cvals in cal.items():
        n = len(cvals)
        k = (90 * (n + 1) + 99) // 100
        if k > n or et not in tst:
            assert et not in rows or rows[et].n_test == 0
            continue
        pred = sum(v for v, _ in cvals) / n
        scores = sorted((abs(v - pred), eid) for v, eid in cvals)
        q = scores[k - 1][0]
        covered = sum(1 for v, _ in tst[et] if abs(v - pred) <= q)
        row = rows[et]
        assert (row.n_cal, row.n_test) == (n, len(tst[et]))
        assert row.pred_mean == round(pred, 6)
        assert row.q_hat == round(q, 6)
        assert row.coverage == round(covered / len(tst[et]), 6)
        assert row.coverage >= 0.8  # 90% target with small-sample slack


def test_ips_offline_eval_reference(spark):
    """IPS/SNIPS replayed in pure Python: target policy learned on the
    fit split (argmax mean, ties to larger type via struct-max), cell
    weights pi/p, micro-unit quantized sums; SNIPS must equal IPS
    divided by the mean importance weight (algebraic identity checked
    numerically via the micro sums)."""
    import math
    from collections import defaultdict

    ev = load(spark, SF, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).collect()
    fit = defaultdict(lambda: [0, 0.0])
    cells = defaultdict(lambda: [0, 0.0])
    for r in ev:
        if r.value is None:
            continue
        wd = ((r.ts // 1000) // relational.MICROS_PER_DAY) % 7
        v = round(r.value, 2)
        if r.event_id % 2 == 0:
            fit[(wd, r.event_type)][0] += 1
            fit[(wd, r.event_type)][1] += v
        else:
            cells[(wd, r.event_type)][0] += 1
            cells[(wd, r.event_type)][1] += v
    target = {}
    for (wd, et), (n, s) in fit.items():
        key = (s / n, et)
        if wd not in target or key > target[wd]:
            target[wd] = key
    got = {r.weekday: r for r in relational.ips_offline_eval(spark, SF).collect()}
    eps = relational.IPS_EPS
    by_wd = defaultdict(dict)
    for (wd, et), (n, s) in cells.items():
        by_wd[wd][et] = (n, s)
    assert set(got) == set(by_wd)
    for wd, acts in by_wd.items():
        n_x = sum(n for n, _ in acts.values())
        k = len(acts)
        t_micro = w_micro = 0
        sum_all = sum(s for _, s in acts.values())
        tgt = target[wd][1]
        for et, (n_xa, s) in acts.items():
            pi = (1.0 - eps) if et == tgt else eps / (k - 1)
            w = pi * n_x / n_xa
            t_micro += int(math.floor(w * s * 1e6 + 0.5))
            w_micro += int(math.floor(w * n_xa * 1e6 + 0.5))
        row = got[wd]
        assert row.target_action == tgt and row.n_eval == n_x
        assert row.ips_value == round(t_micro / (1e6 * n_x), 6)
        assert row.snips_value == round(t_micro / w_micro, 6)
        assert row.logged_mean == round(sum_all / n_x, 6)
        # SNIPS = IPS / mean importance weight (w_micro/1e6/n_x)
        assert abs(row.snips_value - row.ips_value / (w_micro / 1e6 / n_x)) < 1e-5


def test_dr_offline_eval_reference(spark):
    """DR replay: DM term + importance-weighted residual correction from
    the same fit/eval cells; when the reward model is PERFECT on a cell
    (q = eval mean) the cell's correction vanishes up to quantization;
    DR must sit near IPS when the model is decent (same target policy)."""
    import math
    from collections import defaultdict

    ev = load(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    ).collect()
    fit = defaultdict(lambda: [0, 0.0])
    cells = defaultdict(lambda: [0, 0.0])
    for r in ev:
        if r.value is None:
            continue
        wd = ((r.ts // 1000) // relational.MICROS_PER_DAY) % 7
        v = round(r.value, 2)
        (fit if r.event_id % 2 == 0 else cells)[(wd, r.event_type)][0] += 1
        (fit if r.event_id % 2 == 0 else cells)[(wd, r.event_type)][1] += v
    target = {}
    q = {}
    for (wd, et), (n, s) in fit.items():
        q[(wd, et)] = s / n
        key = (s / n, et)
        if wd not in target or key > target[wd]:
            target[wd] = key
    by_wd = defaultdict(dict)
    for (wd, et), (n, s) in cells.items():
        by_wd[wd][et] = (n, s)
    eps = relational.IPS_EPS
    got = {r.weekday: r for r in relational.dr_offline_eval(spark, SF).collect()}
    ips = {r.weekday: r for r in relational.ips_offline_eval(spark, SF).collect()}
    assert set(got) == set(by_wd)
    for wd, acts in by_wd.items():
        n_x = sum(n for n, _ in acts.values())
        k = len(acts)
        tgt = target[wd][1]
        dm_mu = corr_mu = 0
        for et, (n_xa, s) in acts.items():
            pi = (1.0 - eps) if et == tgt else eps / (k - 1)
            qv = q.get((wd, et), 0.0)
            rho = pi * n_x / n_xa
            dm_mu += int(math.floor(n_x * pi * qv * 1e6 + 0.5))
            corr_mu += int(math.floor(rho * (s - n_xa * qv) * 1e6 + 0.5))
        row = got[wd]
        assert row.target_action == tgt and row.n_eval == n_x
        assert row.dm_value == round(dm_mu / (1e6 * n_x), 6)
        assert row.ips_correction == round(corr_mu / (1e6 * n_x), 6)
        assert row.dr_value == round((dm_mu + corr_mu) / (1e6 * n_x), 6)
        # variance-reduction sanity: DR within 2x of IPS's distance from
        # the logged mean (both estimate the same target policy value)
        assert abs(row.dr_value - ips[wd].ips_value) < max(
            1.0, 2 * abs(ips[wd].ips_value)
        )


def test_ams_f2_sketch_reference(spark):
    """AMS Z_r estimators replayed in pure Python from the same md5 sign
    hashes; exact F2 from a Counter; the median-of-means assembly and
    the bounded relative error (the sketch's usefulness claim) pinned."""
    import hashlib
    import statistics
    from collections import Counter

    ev = load(spark, SF, "events").select("user_id", "event_type").collect()
    items = [f"{r.user_id}#{r.event_type}" for r in ev]
    f = Counter(items)
    f2 = sum(v * v for v in f.values())
    R, G = relational.AMS_R, relational.AMS_G

    def sign(item, r):
        h = hashlib.md5(f"{item}@ams{r}".encode()).hexdigest()
        v = int(h[:4], 16)
        return 1 if v % 2 == 0 else -1

    z = [sum(sign(i, r) for i in items) for r in range(R)]
    per = R // G
    gms = sorted(
        sum(z[g * per + j] ** 2 for j in range(per)) / per for g in range(G)
    )
    est = (gms[G // 2 - 1] + gms[G // 2]) / 2.0
    row = relational.ams_f2_sketch(spark, SF).collect()[0]
    assert (row.n_items, row.f2_exact) == (len(f), f2)
    assert row.f2_est == round(est, 6)
    assert row.rel_error == round(abs(est - f2) / f2, 6)
    assert row.rel_error < 0.5  # R=256 median-of-means keeps it bounded
