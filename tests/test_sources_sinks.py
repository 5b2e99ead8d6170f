"""Ingest (S1-S4, O1-O8) and sink (K1, lake) tests."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from air_traffic_data_pipeline_spark.sources.opensky import (
    bbox_params,
    parse_states_envelope,
    states_schema,
)

ENVELOPE = {
    "time": 1757030400,
    "states": [
        # full row
        ["ab1234", "AFR123  ", "France", 1757030400, 1757030410, -1.55, 47.2,
         3000.0, False, 150.0, 90.0, 5.0, "[1,2,3]", 3100.0, "7001", False, 0],
        # nulls + on-ground + empty sensors string
        ["cd5678", None, "Germany", None, 1757030420, -1.60, 47.15,
         None, True, 5.0, 180.0, None, None, 27.0, None, None, 1],
        # single-element sensors
        ["ef9012", "DLH9  ", "Spain", 1757030401, 1757030421, -1.45, 47.25,
         8000.0, False, 220.0, 270.0, -3.0, "[7]", 8100.0, "2200", True, 2],
    ],
}


def test_parse_states_full_row(spark):
    df = parse_states_envelope(spark, json.dumps(ENVELOPE))
    assert df.schema == states_schema()
    rows = {r.icao24: r for r in df.collect()}
    assert len(rows) == 3
    r = rows["ab1234"]
    assert r.sensors == [1, 2, 3]
    assert r.longitude == -1.55 and r.latitude == 47.2
    assert r.on_ground is False and r.position_source == 0
    assert rows["cd5678"].sensors is None
    assert rows["cd5678"].vertical_rate is None
    assert rows["ef9012"].sensors == [7]
    assert rows["ef9012"].vertical_rate == -3.0


@pytest.mark.parametrize("states", [None, []])
def test_parse_states_empty_guard(spark, states):
    """S4: null/empty states -> empty typed frame, not an exit."""
    df = parse_states_envelope(spark, json.dumps({"time": 1, "states": states}))
    assert df.count() == 0
    assert df.schema == states_schema()


def test_bbox_params_order():
    b = {"lamin": 1.0, "lomin": 2.0, "lamax": 3.0, "lomax": 4.0, "extra": 9}
    assert bbox_params(b) == {"lamin": 1.0, "lomin": 2.0, "lamax": 3.0, "lomax": 4.0}


def test_heatmap_sink_fallback_or_folium(spark):
    from air_traffic_data_pipeline_spark.sinks.heatmap import write_heatmap

    df = spark.createDataFrame(
        [(47.1, -1.6, 0.5), (47.2, -1.5, 0.9)], "lat double, lon double, weight double"
    )
    bounds = {"lamin": 47.0, "lomin": -1.9, "lamax": 47.3, "lomax": -1.2}
    path = os.path.join(tempfile.mkdtemp(), "map.html")
    out = write_heatmap(df, path, bounds)
    assert os.path.exists(out)
    with open(out) as f:
        content = f.read()
    assert "47.1" in content or "0.5" in content


def test_lake_partitioned_write_prunes(spark):
    from air_traffic_data_pipeline_spark.sinks.lake import write_partitioned

    src = spark.range(1000).withColumn("part", (F.col("id") % 4).cast("int"))
    out = tempfile.mkdtemp(prefix="lake_")
    write_partitioned(src, out, ["part"])
    assert sorted(os.listdir(out))[:1] == ["_SUCCESS"] or any(
        d.startswith("part=") for d in os.listdir(out)
    )
    back = spark.read.parquet(out).filter(F.col("part") == 2)
    assert back.count() == 250
    # partition pruning visible in the physical plan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "part=2" in plan or back.count() == 250


def test_csv_jsonl_scan_roundtrip(spark):
    """The scans row of SURVEY §2 Part B promises parquet/json/csv: write
    the customer table out as JSONL and CSV and read both back with an
    explicit schema — values must survive the round trip exactly."""
    src = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )
    schema = "c_custkey long, c_name string, c_acctbal double"
    jdir = tempfile.mkdtemp(prefix="lake_json_")
    cdir = tempfile.mkdtemp(prefix="lake_csv_")
    src.write.mode("overwrite").json(jdir)
    src.write.mode("overwrite").option("header", True).csv(cdir)
    back_j = spark.read.schema(schema).json(jdir)
    back_c = spark.read.schema(schema).option("header", True).csv(cdir)
    expect = sorted(tuple(r) for r in src.collect())
    assert sorted(tuple(r) for r in back_j.collect()) == expect
    assert sorted(tuple(r) for r in back_c.collect()) == expect


def test_bucketed_join_skips_shuffle(spark):
    """Joining two tables bucketed on the join key must not shuffle either
    side: the bucket-aware scan provides the required hash partitioning.
    This is the co-located-join layout lever SURVEY §2 Part B promises for
    100 TB fact-fact joins."""
    from air_traffic_data_pipeline_spark.sinks.lake import read_table, write_bucketed

    import uuid

    sfx = uuid.uuid4().hex[:8]
    ta_name, tb_name = f"bkt_a_{sfx}", f"bkt_b_{sfx}"
    a = spark.range(2000).withColumn("v", (F.col("id") % 7).cast("long"))
    b = spark.range(2000).withColumn("w", (F.col("id") % 5).cast("long"))
    write_bucketed(a, ta_name, "id", n_buckets=8)
    write_bucketed(b, tb_name, "id", n_buckets=8)
    # disable auto-broadcast: these test tables are tiny, and a broadcast
    # join would bypass bucketing; at 100 TB fact-fact scale broadcast is
    # off the table anyway — the bucketed SMJ is exactly the plan to pin
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = read_table(spark, ta_name), read_table(spark, tb_name)
        joined = ta.join(tb, "id").groupBy("v").agg(F.sum("w").alias("sw"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 7
        pre_agg = plan.split("HashAggregate")[-1]  # below the agg: join + scans
        assert "Exchange" not in pre_agg, pre_agg
        assert "SelectedBucketsCount" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta_name}")
        spark.sql(f"DROP TABLE IF EXISTS {tb_name}")


def test_flagship_end_to_end_with_sink(spark):
    """Full reference pipeline shape: flagship query -> heatmap sink."""
    from air_traffic_data_pipeline_spark.operators.grid import gen_grid, grid_bounds
    from air_traffic_data_pipeline_spark.constants import (
        FLAGSHIP_N_STEPS,
        FLAGSHIP_STEP_M,
        NANTES_LAT,
        NANTES_LON,
    )
    from air_traffic_data_pipeline_spark.plans.domain import q_heat_triples
    from air_traffic_data_pipeline_spark.sinks.heatmap import write_heatmap

    triples = q_heat_triples(spark, "/root/testdata/sf0.001")
    b = grid_bounds(
        gen_grid(spark, NANTES_LAT, NANTES_LON, FLAGSHIP_STEP_M, FLAGSHIP_N_STEPS)
    ).collect()[0]
    bounds = {"lamin": b.lamin, "lomin": b.lomin, "lamax": b.lamax, "lomax": b.lomax}
    out = write_heatmap(triples, os.path.join(tempfile.mkdtemp(), "flagship.html"), bounds)
    assert os.path.getsize(out) > 100


def test_partition_pruning_skips_directories(spark, tmp_path):
    """A filter on the partition column must become PartitionFilters (scan
    lists only matching directories), not a post-scan filter."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from air_traffic_data_pipeline_spark.plans.tables import load
    from air_traffic_data_pipeline_spark.sinks.lake import write_partitioned

    ev = load(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "part_events")
    write_partitioned(ev, path, ["event_type"])
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p
    seg = p.split("PartitionFilters")[1][:200]
    assert "event_type" in seg
    exact = ev.filter(F.col("event_type") == "click").count()
    assert df.count() == exact


def test_compaction_merges_small_files(spark, tmp_path):
    import os

    from air_traffic_data_pipeline_spark.plans.tables import load
    from air_traffic_data_pipeline_spark.sinks.lake import compact_small_files

    ev = load(spark, "/root/testdata/sf0.001", "events")
    n = ev.count()
    src = str(tmp_path / "many")
    ev.repartition(37).write.parquet(src)  # simulate a small-file mess
    n_small = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_small == 37
    dest = str(tmp_path / "compacted")
    n_files = compact_small_files(spark, src, dest, target_rows_per_file=n // 3 + 1)
    n_out = sum(1 for f in os.listdir(dest) if f.endswith(".parquet"))
    assert n_out == n_files <= 3
    assert spark.read.parquet(dest).count() == n


def test_orc_and_text_scan_roundtrip(spark, tmp_path):
    """ORC and text sources: explicit-schema round trips survive exactly —
    the remaining built-in file formats next to parquet/csv/jsonl."""
    from air_traffic_data_pipeline_spark.plans.tables import load

    sf = "/root/testdata/sf0.001"
    nat = load(spark, sf, "nation")

    orc_dir = str(tmp_path / "nation_orc")
    nat.write.mode("overwrite").orc(orc_dir)
    back = spark.read.schema(nat.schema).orc(orc_dir)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nat.collect()))

    txt_dir = str(tmp_path / "nation_txt")
    nat.select(
        F.concat_ws("|", "n_nationkey", "n_name", "n_regionkey").alias("value")
    ).write.mode("overwrite").text(txt_dir)
    parsed = (
        spark.read.text(txt_dir)
        .select(F.split("value", r"\|").alias("p"))
        .select(
            F.col("p")[0].cast("int").alias("n_nationkey"),
            F.col("p")[1].alias("n_name"),
            F.col("p")[2].cast("int").alias("n_regionkey"),
        )
    )
    assert sorted(map(tuple, parsed.collect())) == sorted(map(tuple, nat.collect()))


def test_observation_metrics_match_direct_agg(spark):
    """df.observe(Observation, ...): accumulator-style metrics collected on
    the pass that materializes the result — the zero-extra-pass way to get
    row counts / sums out of a 100 TB pipeline run (vs a second scan)."""
    from pyspark.sql import Observation

    from air_traffic_data_pipeline_spark.plans.tables import load

    sf = "/root/testdata/sf0.001"
    li = load(spark, sf, "lineitem")
    obs = Observation("li_stats")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )
    n_out = observed.filter(F.col("l_quantity") > 25).count()

    direct = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    ).collect()[0]
    assert obs.get["n_rows"] == direct.n_rows
    assert obs.get["total_qty"] == direct.total_qty
    # the observed metrics cover the FULL scan, not the filtered output
    assert n_out < direct.n_rows


def test_compaction_refuses_in_place_overwrite(spark, tmp_path):
    """In-place compaction would truncate the source before reading it —
    the operator must refuse, not destroy data."""
    from air_traffic_data_pipeline_spark.plans.tables import load
    from air_traffic_data_pipeline_spark.sinks.lake import compact_small_files

    src = str(tmp_path / "lake")
    load(spark, "/root/testdata/sf0.001", "nation").write.parquet(src)
    with pytest.raises(ValueError, match="must differ"):
        compact_small_files(spark, src, src, 1000)


def test_zorder_clustered_write_shrinks_file_ranges(spark, tmp_path):
    """Each Z-order-clustered file must cover a small rectangle of the
    (user_id, value) space: the mean per-file min/max spread of BOTH
    columns shrinks several-fold vs an unclustered write with the same
    file count — the parquet-stats pruning surface for 2-D predicates."""
    import glob

    from air_traffic_data_pipeline_spark.plans.tables import load
    from air_traffic_data_pipeline_spark.sinks.lake import write_clustered

    ev = load(spark, "/root/testdata/sf0.01", "events").select("user_id", "value")
    n_files = 16
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_clustered(ev, clustered, ("user_id", "value"), n_files=n_files)
    ev.repartition(n_files).write.parquet(plain)

    def mean_spread(path: str, col: str) -> float:
        lo = ev.agg(F.min(col)).first()[0]
        hi = ev.agg(F.max(col)).first()[0]
        spreads = []
        for f in glob.glob(f"{path}/*.parquet"):
            part = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).first()
            if part.lo is not None:
                spreads.append((part.hi - part.lo) / max(1e-9, float(hi - lo)))
        assert spreads
        return sum(spreads) / len(spreads)

    for col, factor in (("user_id", 0.5), ("value", 0.65)):
        c, p = mean_spread(clustered, col), mean_spread(plain, col)
        # unclustered round-robin files span ~the full range; z-ordered
        # files must cover a clear fraction of it per dimension. `value` is
        # heavy-tailed (p99 ≈ max/2), so linear 16-bit scaling spends little
        # resolution on the sparse tail and the raw-range shrink is smaller
        # than uniform user_id's — still a ~2x stats-pruning win.
        assert c < factor * p, (col, c, p)


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Lake schema evolution: a second batch adds a column; reading with
    mergeSchema unifies the schema and back-fills nulls for the old
    files — the additive-evolution contract a 100 TB lake relies on when
    a pipeline starts emitting a new field mid-history."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolve")
    spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(f"{base}/batch=1")
    spark.range(5, 10).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit("tag").alias("extra"),
    ).write.parquet(f"{base}/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(f"{base}/batch=*")
    assert set(merged.columns) >= {"k", "v", "extra"}
    rows = {r.k: r for r in merged.collect()}
    assert len(rows) == 10
    assert all(rows[k].extra is None for k in range(5))
    assert all(rows[k].extra == "tag" for k in range(5, 10))
    # WITHOUT mergeSchema the first-listed footer wins: the column may be
    # absent — the failure mode the option exists to prevent
    plain = spark.read.parquet(f"{base}/batch=*")
    assert set(plain.columns) >= {"k", "v"}


def test_bucketed_copurchase_pair_build_skips_shuffle(spark):
    """The rel_pagerank watch item (r9 VERDICT item 6): the co-purchase
    pair build is a lineitem self-join on l_orderkey, and at growing lot
    density that self-join's shuffle is the scaling bound (1.95x wall at
    4x data, PERF.md). The bucketed-write lever removes the shuffle
    entirely: land the (l_orderkey, l_partkey) projection bucketed on
    l_orderkey once, and the self-join becomes a zero-Exchange
    bucket-aware SMJ — each bucket joins against itself in place, which
    is exactly how the pair state would be maintained on a 1000-executor
    cluster (land bucketed, rebuild pairs per bucket, merge counts).
    This test pins that plan AND that the bucketed build is bitwise equal
    to the straight self-join."""
    import uuid

    from air_traffic_data_pipeline_spark.plans.relational import copurchase_pairs
    from air_traffic_data_pipeline_spark.plans.tables import load
    from air_traffic_data_pipeline_spark.sinks.lake import read_table, write_bucketed

    sf = "/root/testdata/sf0.001"
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    tname = f"bkt_li_{uuid.uuid4().hex[:8]}"
    write_bucketed(li, tname, "l_orderkey", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = copurchase_pairs(read_table(spark, tname))
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        # below the self-join: only bucket-aware scans — no Exchange
        below_join = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in below_join, below_join
        assert "SelectedBucketsCount" in plan, plan
        got = sorted(tuple(r) for r in pairs.collect())
        want = sorted(tuple(r) for r in copurchase_pairs(li).collect())
        assert got == want and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
