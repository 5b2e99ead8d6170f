"""Property test (hypothesis): the Spark winnowing selection equals the
pure-Python reference on ARBITRARY word sequences (tiny alphabet to force
hash ties, repeats, and short docs), and the detection guarantee holds —
any two docs sharing a run of >= K + W - 1 words share at least one
selected fingerprint, wherever the run is implanted."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from air_traffic_data_pipeline_spark.plans import llm
from tests.test_llm_ops import _ref_winnow

_word = st.sampled_from(["a", "b", "c", "d", "e", "f"])
_words = st.lists(_word, min_size=0, max_size=40)
_t = llm.WINNOW_K + llm.WINNOW_W - 1


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(_words, min_size=1, max_size=5))
def test_winnow_selection_matches_reference_any_text(spark, texts):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in llm.winnow_fp_from(df).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.h, r.gram))
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _ref_winnow(text), (doc_id, text)


@settings(max_examples=5, deadline=None)
@given(
    pre=st.lists(_word, min_size=0, max_size=20),
    post=st.lists(_word, min_size=0, max_size=20),
    run_seed=st.integers(min_value=0, max_value=10**6),
)
def test_winnow_guarantee_any_context(spark, pre, post, run_seed):
    """Implant a t-word run (unique tokens, so it cannot accidentally
    repeat inside the filler) into two different contexts: the reference
    fingerprint sets must intersect on the run — the winnowing guarantee
    that makes repeated_spans recall-complete above length t."""
    run = [f"r{run_seed}x{i}" for i in range(_t)]
    doc_a = " ".join(pre + run)
    doc_b = " ".join(run + post)
    fps_a = {(h, g) for _, h, g in _ref_winnow(doc_a)}
    fps_b = {(h, g) for _, h, g in _ref_winnow(doc_b)}
    assert fps_a & fps_b, (doc_a, doc_b)


def _flagged_docs(spark, sf, k):
    """Doc ids with >= 1 repeated winnow fingerprint at gram length k —
    the detection leg of the K-sweep, recomputed per K."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    fps = llm.winnow_fp_from(
        spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text"),
        k=k,
    )
    wg = W.partitionBy("h", "gram")
    return {
        r.doc_id
        for r in fps.withColumn("n_occ", F.count(F.lit(1)).over(wg))
        .filter(F.col("n_occ") >= 2)
        .select("doc_id")
        .distinct()
        .collect()
    }


def test_k_sweep_monotone_and_nested(spark):
    """K-sensitivity sweep invariants at sf0.001: index cost (n_fps) and
    detection yield (matched sites, flagged docs, span words) are
    non-increasing in K, and the flagged-doc sets are NESTED
    (K16 ⊆ K8 ⊆ K4): a K-gram repeat is a shared run of >= K words, and
    K >= K'+W-1 for the next smaller K' in the sweep, so the winnowing
    guarantee at K' must also flag both sites — the recall argument that
    justifies small K as the high-recall end of the tradeoff."""
    sf = "/root/testdata/sf0.001"
    rows = sorted(
        llm.repeated_spans_k_sweep(spark, sf).collect(), key=lambda r: r.k
    )
    assert [r.k for r in rows] == sorted(llm.SPAN_SWEEP_KS)
    for a, b in zip(rows, rows[1:]):
        assert a.n_fps >= b.n_fps, (a.k, b.k)
        assert a.n_matched_sites >= b.n_matched_sites, (a.k, b.k)
        assert a.n_docs_flagged >= b.n_docs_flagged, (a.k, b.k)
        assert a.span_words >= b.span_words, (a.k, b.k)
        assert a.repeated_word_frac >= b.repeated_word_frac, (a.k, b.k)
    sets = {k: _flagged_docs(spark, sf, k) for k in llm.SPAN_SWEEP_KS}
    ks = sorted(llm.SPAN_SWEEP_KS)
    for small, big in zip(ks, ks[1:]):
        assert sets[big] <= sets[small], (small, big)
