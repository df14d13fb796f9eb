"""CCNet-style perplexity filtering (operators/unigram.py::doc_perplexity,
ccnet_buckets) — rows-only at the driver, so the formula and the bucketing
contract are pinned here: exact ppl arithmetic against a hand-computed
closed form, reference-like text scoring lower than alien text, balanced
per-language buckets ordered by perplexity, and determinism.
"""

from __future__ import annotations

import math

from timing_explorer_spark.operators.unigram import (
    ccnet_buckets,
    doc_perplexity,
    unigram_train,
)
from timing_explorer_spark.plans import all_queries

SPECS = all_queries()


def _docs(spark, rows):
    # rows: (doc_id, text, lang)
    return spark.createDataFrame(
        [(i, t, lang, f"s{i % 3}", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def test_ppl_closed_form(spark):
    # fixed vocab, no training: ppl must equal exp(-(sum logp)/n_pieces)
    vocab = {"ab": math.log(0.5), "a": math.log(0.25), "b": math.log(0.25)}
    docs = _docs(spark, [("ab ab b", "en")])
    out = doc_perplexity(docs, vocab, max_piece_len=2).collect()
    assert len(out) == 1
    r = out[0]
    # "ab" -> [ab] (logp ln .5), "b" -> [b] (ln .25); 3 pieces total
    want_logp = 2 * math.log(0.5) + math.log(0.25)
    assert r["n_tokens"] == 3
    assert abs(r["ppl"] - math.exp(-want_logp / 3)) < 1e-12


def test_reference_text_scores_lower_than_alien(spark):
    ref_rows = [("the cat sat on the mat " * 4, "en")] * 6
    vocab, _ = unigram_train(
        _docs(spark, ref_rows), vocab_size=64, max_piece_len=4, n_iters=2, seed_size=256
    )
    mixed = _docs(
        spark,
        [("the cat sat on the mat", "en"), ("qzxvj wkpfy qzxvj zzz", "en")],
    )
    out = {r["doc_id"]: r["ppl"] for r in doc_perplexity(mixed, vocab, 4).collect()}
    assert out[0] < out[1]  # in-domain text is less surprising


def test_buckets_balanced_and_ordered_per_lang(spark):
    # 9 docs per lang with strictly increasing alien-ness
    rows = []
    for lang in ("en", "fr"):
        for k in range(9):
            good = "alpha beta gamma " * (9 - k)
            alien = "qq zz xx " * k
            rows.append((good + alien, lang))
    docs = _docs(spark, rows)
    ref = docs.where("text like 'alpha%'")
    vocab, _ = unigram_train(ref, vocab_size=64, max_piece_len=4, n_iters=2, seed_size=256)
    out = ccnet_buckets(docs, vocab, max_piece_len=4, n_buckets=3).collect()
    for lang in ("en", "fr"):
        sub = [r for r in out if r["lang"] == lang]
        assert len(sub) == 9
        by_bucket = {b: sorted(r["ppl"] for r in sub if r["bucket"] == b) for b in (1, 2, 3)}
        assert all(len(v) == 3 for v in by_bucket.values())  # equal-frequency
        # head band sits strictly below tail band
        assert by_bucket[1][-1] <= by_bucket[2][0] + 1e-12
        assert by_bucket[2][-1] <= by_bucket[3][0] + 1e-12


def test_deterministic_under_repartitioning(spark):
    rows = [(f"tok{i % 5} tok{i % 3} common word here", "en") for i in range(24)]
    vocab = {c: math.log(1.0 / 30) for c in "abcdefghijklmnopqrstuvwxyz0123"}
    a = sorted(
        doc_perplexity(_docs(spark, rows).repartition(1), vocab, 1).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        doc_perplexity(_docs(spark, rows).repartition(11), vocab, 1).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [(r["doc_id"], r["n_tokens"], r["ppl"]) for r in a] == [
        (r["doc_id"], r["n_tokens"], r["ppl"]) for r in b
    ]


def test_registered_query_on_fixture(spark, sf_smoke):
    out = SPECS["q_ccnet_perplexity_buckets"].build(spark, sf_smoke).collect()
    assert out
    langs = {r["lang"] for r in out}
    assert langs  # every fixture lang appears
    for lang in langs:
        sub = sorted((r for r in out if r["lang"] == lang), key=lambda r: r["bucket"])
        ns = [r["n_docs"] for r in sub]
        assert max(ns) - min(ns) <= 1  # equal-frequency split
        # bands ordered: bucket b's max ppl <= bucket b+1's max ppl
        for x, y in zip(sub, sub[1:]):
            assert x["ppl_min"] <= y["ppl_max"]
        for r in sub:
            assert r["ppl_min"] <= r["ppl_max"] and r["n_tokens"] > 0


def test_approx_method_matches_exact_within_tolerance(spark):
    # 60 docs per lang with distinct ppl values: the sketch at accuracy 1e4
    # is exact at this size, so bucket assignments must agree except at ties.
    # 'z' carries a DIFFERENT logp than the other letters — with a uniform
    # vocab every doc's mean logp is identical (ppl == 26 exactly for all
    # 120 docs, a full tie plateau; the old double-sum noise used to break
    # the ties, which the r7 order-independent decimal sum removed), so the
    # mix ratio must genuinely move the mean for ppls to be distinct
    rows = []
    for lang in ("en", "de"):
        for k in range(60):
            rows.append(("alpha " * (k + 1) + "zz " * (60 - k), lang))
    docs = _docs(spark, rows)
    # fixed single-piece vocab: ppl is a deterministic function of the mix
    vocab = {c: math.log(1.0 / 26) for c in "abcdefghijklmnopqrstuvwxyz"}
    vocab["z"] = math.log(1.0 / 52)
    exact = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_buckets(docs, vocab, 1, n_buckets=3, method="exact").collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in ccnet_buckets(docs, vocab, 1, n_buckets=3, method="approx").collect()
    }
    assert set(exact) == set(approx)
    diffs = [d for d in exact if exact[d] != approx[d]]
    # boundary docs may fall either side of a sketch cutpoint; the bulk agree
    assert len(diffs) <= 6, diffs
    for d in diffs:
        assert abs(exact[d] - approx[d]) == 1  # never off by more than one band


def test_bad_method_rejected(spark):
    docs = _docs(spark, [("a", "en")])
    try:
        ccnet_buckets(docs, {"a": -0.1}, 1, method="nope").collect()
    except ValueError as e:
        assert "method" in str(e)
    else:
        raise AssertionError("bad method accepted")
