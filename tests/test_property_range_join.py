"""Property test (hypothesis): range_bin_join == naive range join for ANY
band layout — overlapping bands, point bands, negative values, bin sizes
that do and don't divide the band widths. The binning is a candidate
prefilter and must never change membership."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_vals = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=25
)
_bands = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=40),
    ),
    min_size=1,
    max_size=8,
)
_bin = st.sampled_from([1.0, 2.5, 7.0, 64.0])


@settings(max_examples=6, deadline=None)
@given(vals=_vals, bands=_bands, bin_size=_bin)
def test_range_bin_join_equals_naive(spark, vals, bands, bin_size):
    from air_traffic_data_pipeline_spark.operators.range_join import range_bin_join

    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "fid long, value double"
    )
    band_df = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(bands)],
        "bid long, lo double, hi double",
    )
    binned = (
        range_bin_join(facts, band_df, "value", "lo", "hi", bin_size=bin_size)
        .select("fid", "bid")
        .withColumn("side", F.lit("binned"))
    )
    # broadcast the reference side: createDataFrame frames carry unknown
    # stats, so the non-equi inner join otherwise plans as a 32x32-task
    # CartesianProduct — ~15 s of scheduling per hypothesis example for
    # <=25x8 rows (the hint changes the plan, never the membership)
    naive = (
        facts.join(
            F.broadcast(band_df),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .select("fid", "bid")
        .withColumn("side", F.lit("naive"))
    )
    # one action for both sides: per-example Spark job latency dominates
    # this property test, so collect the union once and split in Python
    rows = binned.unionByName(naive).collect()
    got = {(r.fid, r.bid) for r in rows if r.side == "binned"}
    want = {(r.fid, r.bid) for r in rows if r.side == "naive"}
    assert got == want
