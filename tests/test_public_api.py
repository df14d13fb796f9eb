"""The curated public API (timing_explorer_spark/__init__.py): every
exported name resolves lazily to a real callable, dir() is stable, and a
representative end-to-end snippet from USER_GUIDE.md runs."""

from __future__ import annotations

import pytest


def test_every_export_resolves():
    import timing_explorer_spark as tes

    for name in tes.__all__:
        if name == "__version__":
            continue
        obj = getattr(tes, name)
        assert callable(obj), name
    # cached after first access (no repeated importlib work)
    assert "minhash_lsh_pairs" in vars(tes)


def test_unknown_attribute_raises():
    import timing_explorer_spark as tes

    with pytest.raises(AttributeError, match="no attribute"):
        tes.not_a_real_operator  # noqa: B018


def test_dir_lists_exports():
    import timing_explorer_spark as tes

    d = dir(tes)
    for probe in ("get_spark", "load", "kn_train", "strip_html", "influxql"):
        assert probe in d


def test_guide_dedup_snippet_runs(spark):
    """USER_GUIDE.md §1, end to end on the sf0.001 fixture."""
    import timing_explorer_spark as tes

    docs = tes.load(spark, "/root/testdata/sf0.001", "documents")
    pairs = tes.minhash_lsh_pairs(docs, threshold=0.8)
    comps = tes.resolve_components(pairs)
    deduped = docs.join(comps, docs.doc_id == comps.doc, "left_anti")
    n_docs, n_comps, n_kept = docs.count(), comps.count(), deduped.count()
    assert n_kept == n_docs - n_comps
    assert set(pairs.columns) == {"doc_a", "doc_b", "jaccard"}
