"""Unigram-LM tokenizer training (operators/unigram.py) — the math and the
distribution contract.

Rows-only at the driver (EM has no SQL oracle), so the semantics are pinned
here: hard-EM objective monotonicity, exact round-trip segmentation, unknown-
character coverage, and bit-identical training under repartitioning.
"""

from __future__ import annotations

import math

from timing_explorer_spark.operators.unigram import (
    seed_candidates,
    unigram_encode_stats,
    unigram_train,
    viterbi_segment,
    word_histogram,
)
from timing_explorer_spark.plans import all_queries

SPECS = all_queries()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def test_objective_monotone_nondecreasing(spark):
    docs = _docs(spark, ["the cat sat on the mat " * 4, "the dog ate the cat " * 4] * 5)
    _, objs = unigram_train(docs, vocab_size=64, max_piece_len=4, n_iters=4, seed_size=256)
    assert len(objs) == 4
    for a, b in zip(objs, objs[1:]):
        assert b >= a - 1e-9  # hard-EM climbs the Viterbi objective


def test_frequent_substrings_win_vocab_slots(spark):
    docs = _docs(spark, ["the theme theater " * 10] * 8)
    vocab, _ = unigram_train(docs, vocab_size=32, max_piece_len=4, n_iters=3, seed_size=128)
    assert "the" in vocab  # shared prefix of every word, by far the heaviest piece
    # probabilities normalize: logsumexp over the vocab == 0
    lse = math.log(sum(math.exp(lp) for lp in vocab.values()))
    assert abs(lse) < 1e-9


def test_roundtrip_segmentation_exact(spark):
    docs = _docs(spark, ["interchangeable internationalization " * 3] * 4)
    vocab, _ = unigram_train(docs, vocab_size=48, max_piece_len=4, n_iters=2, seed_size=128)
    words = word_histogram(docs)
    seg = viterbi_segment(words, vocab, max_piece_len=4).collect()
    assert seg
    for r in seg:
        assert "".join(r["pieces"]) == r["word"]
        for p in r["pieces"]:
            assert 1 <= len(p) <= 4


def test_unknown_chars_still_segmentable(spark):
    train = _docs(spark, ["aaa bbb ccc " * 5] * 3)
    vocab, _ = unigram_train(train, vocab_size=16, max_piece_len=3, n_iters=2, seed_size=64)
    assert all("z" not in p for p in vocab)
    other = _docs(spark, ["zzzq aaa"])
    words = word_histogram(other)
    seg = {r["word"]: r for r in viterbi_segment(words, vocab, max_piece_len=3).collect()}
    assert "".join(seg["zzzq"]["pieces"]) == "zzzq"  # UNK per-char fallback
    assert math.isfinite(seg["zzzq"]["logp"])
    # known word segments strictly better than the UNK floor would allow
    assert seg["aaa"]["logp"] > 4 * -20.0


def test_training_deterministic_under_repartitioning(spark):
    texts = [f"alpha beta gamma delta w{i % 7}" * 3 for i in range(40)]
    v1, o1 = unigram_train(
        _docs(spark, texts).repartition(1), vocab_size=48, max_piece_len=4, n_iters=2
    )
    v2, o2 = unigram_train(
        _docs(spark, texts).repartition(13), vocab_size=48, max_piece_len=4, n_iters=2
    )
    assert v1 == v2  # bit-identical logprobs, same piece set
    assert o1 == o2


def test_seed_keeps_all_chars(spark):
    docs = _docs(spark, ["xy z qqq"])
    seed = seed_candidates(word_histogram(docs), max_piece_len=3, seed_size=2).collect()
    pieces = {r["piece"] for r in seed}
    # every char survives even with seed_size=2; multi-char slots are capped
    assert {"x", "y", "z", "q"} <= pieces
    assert sum(len(p) > 1 for p in pieces) <= 2


def test_encode_stats_dictionary_join(spark):
    docs = _docs(spark, ["aa bb", "aa bb aa"])
    vocab = {"aa": math.log(0.5), "bb": math.log(0.3), "a": math.log(0.1), "b": math.log(0.1)}
    out = {r["source"]: r for r in unigram_encode_stats(docs, vocab, 2).collect()}
    # s0 = doc0: 2 words -> 2 pieces; s1 = doc1: 3 words -> 3 pieces
    assert out["s0"]["n_words"] == 2 and out["s0"]["n_tokens"] == 2
    assert out["s1"]["n_words"] == 3 and out["s1"]["n_tokens"] == 3
    assert out["s0"]["chars_per_token"] == 2.0


def test_registered_queries_run_on_fixture(spark, sf_smoke):
    v = SPECS["q_unigram_lm_vocab"].build(spark, sf_smoke).collect()
    # pieces with zero Viterbi usage are pruned, so the vocab can come in
    # under the 256 target on the tiny smoke corpus — but never over it
    assert 20 <= len(v) <= 256
    assert all(r["logprob"] < 0 for r in v)
    ranks = [r["rank"] for r in v]
    assert ranks == sorted(ranks)
    s = SPECS["q_unigram_tokenize_stats"].build(spark, sf_smoke).collect()
    assert s
    for r in s:
        assert r["n_tokens"] >= r["n_words"]  # a word is >= 1 piece
        assert r["chars_per_token"] > 1.0  # compresses beyond chars


def test_viterbi_matches_bruteforce_enumeration(spark):
    """Property: the distributed DP's best segmentation logp equals the max
    over ALL segmentations enumerated in pure Python."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def all_segmentations(word, max_len):
        if not word:
            yield []
            return
        for l in range(1, min(max_len, len(word)) + 1):
            for rest in all_segmentations(word[l:], max_len):
                yield [word[:l]] + rest

    @settings(max_examples=12, deadline=None)
    @given(
        word=st.text(alphabet="abc", min_size=1, max_size=6),
        probs=st.lists(
            st.floats(min_value=0.01, max_value=1.0), min_size=7, max_size=7
        ),
    )
    def prop(word, probs):
        pieces = ["a", "b", "c", "ab", "bc", "ca", "abc"]
        vocab = {p: math.log(q) for p, q in zip(pieces, probs)}
        words = spark.createDataFrame([(word, 1)], "word string, cnt bigint")
        (r,) = viterbi_segment(words, vocab, max_piece_len=3).collect()

        def seg_logp(seg):
            total = 0.0
            for p in seg:
                if p in vocab:
                    total += vocab[p]
                elif len(p) == 1:
                    total += -20.0  # _UNK_PENALTY
                else:
                    return None
            return total

        best = max(
            (lp for s in all_segmentations(word, 3) if (lp := seg_logp(s)) is not None),
            default=None,
        )
        assert best is not None
        assert abs(r["logp"] - best) < 1e-9
        assert "".join(r["pieces"]) == word

    prop()
