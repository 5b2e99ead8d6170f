"""The mirror-coverage catalog must be a PARTITION of the live registry:
no batch query silently unclassified, no stale entries, every
cross-reference resolvable. Pure-Python over the registry — no Spark."""

from air_traffic_data_pipeline_spark.plans import mirror_coverage as mc
from air_traffic_data_pipeline_spark.plans import registry


def test_catalog_partitions_the_registry():
    names = set(registry.all_queries())
    batch = {n for n in names if not n.startswith("stream_")}
    mirror_rows = set(mc.MIRRORS)
    # every catalogued mirror is registered; every registered incremental
    # mirror is catalogued
    assert mirror_rows <= names
    registered_mirrors = {
        n for n in names if n.startswith("stream_incremental_")
    }
    assert registered_mirrors <= mirror_rows
    # batch-side partition: mirrored targets + exclusions + the mirrors
    # that live under a batch prefix (noise_grid_incremental) cover every
    # batch query exactly once
    targets = {t for t in mc.MIRRORS.values() if t is not None}
    excluded = set(mc.EXCLUDED)
    batch_mirror_rows = mirror_rows & batch
    assert targets <= batch
    assert excluded <= batch, sorted(excluded - batch)
    assert not (targets & excluded), sorted(targets & excluded)
    assert not (excluded & batch_mirror_rows)
    uncovered = batch - targets - excluded - batch_mirror_rows
    assert not uncovered, sorted(uncovered)
    # and the rendered view agrees
    rows = mc.coverage_rows()
    assert not [r for r in rows if r["status"] == "UNCLASSIFIED"]


def test_catalog_cross_references_resolve():
    names = set(registry.all_queries())
    for q, (cat, note) in mc.EXCLUDED.items():
        assert cat in mc.CATEGORIES, (q, cat)
        # pattern-covered / emission-kernel notes NAME the covering
        # streaming query — it must exist
        if cat in (mc.PC, mc.EK):
            assert note in names and note.startswith(
                ("stream_", "noise_grid_incremental")
            ), (q, note)
        else:
            assert note  # every exclusion carries a human-readable reason
