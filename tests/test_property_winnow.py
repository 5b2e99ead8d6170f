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
