"""Distributed unigram-LM tokenizer training (SentencePiece-style).

The second tokenizer-training primitive of an LLM pipeline, next to BPE
(operators/bpe.py): Kudo 2018, "Subword Regularization: Improving Neural
Network Translation Models with Multiple Subword Candidates", trains a
unigram language model over subword pieces — seed a large candidate vocab,
alternate (E) segment the corpus under current piece probabilities with
(here) Viterbi best-segmentation hard-EM, (M) re-estimate probabilities from
piece usage, and prune low-probability pieces toward the target vocab size.
(Full SentencePiece uses forward-backward expected counts; the Viterbi
hard-EM variant keeps the same lattice and model family and is the standard
cheap approximation — the objective it climbs, Σ_w cnt(w)·log P(viterbi(w)),
is asserted monotone in tests.)

Spark-first shape — the load-bearing design choice is the WORD HISTOGRAM:

  1. The corpus collapses to its distinct-word histogram (word, cnt) in one
     map-side-combinable shuffle. Every later stage — seeding, Viterbi,
     re-estimation, encoding — runs on that bounded grain (≤ ~|vocabulary|
     rows at ANY corpus scale; Heaps' law, not corpus size), never on raw
     documents. Tokenizing 100 TB costs one word-count plus work
     proportional to the dictionary.
  2. Candidate seeding is pure JVM dataflow: substring explosion via HOF
     transforms, weighted counts, one top-V selection.
  3. Viterbi segmentation is the one genuinely-Python step (a per-word DP
     has no relational form) — an Arrow-batched mapInPandas over the word
     HISTOGRAM only, with the O(V) piece table riding the closure. Raw
     corpus rows never reach Python.
  4. Piece-count re-estimation is JVM again: explode the segmented pieces,
     weight by word count, one groupBy. The driver only ever collects the
     O(V) model artifact (the BPE merge-table pattern).
  5. Encoding new text is DICTIONARY ENCODING: segment the distinct words
     of the new corpus once, then broadcast-join words->pieces back onto
     positions. A word occurring a million times is segmented once.

Determinism: counts are exact integers; probabilities are computed on the
driver from a sorted piece table with identical float ops on every run, and
piece/tie ordering is total (count DESC, piece ASC) — training reproduces
bit-for-bit under any partitioning (tested).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNK_PENALTY = -20.0  # per-char fallback logp for characters outside the vocab


def word_histogram(docs: DataFrame, text_col: str = "text", max_word_len: int = 64) -> DataFrame:
    """(word, cnt) over whitespace-split tokens. Words longer than
    ``max_word_len`` are dropped (they are data noise — URLs/base64 — and
    would make the DP grain unbounded)."""
    w = docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
    return (
        w.where((F.length("word") > 0) & (F.length("word") <= max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def seed_candidates(
    words: DataFrame, max_piece_len: int = 4, seed_size: int = 2048
) -> DataFrame:
    """Candidate pieces: every character (always kept — they guarantee any
    word stays segmentable) plus the top multi-char substrings of length
    2..max_piece_len by corpus-weighted frequency. Pure JVM HOF explosion
    over the word histogram."""
    subs = (
        words.select("word", "cnt", F.explode(F.sequence(F.lit(1), F.lit(max_piece_len))).alias("l"))
        .where(F.length("word") >= F.col("l"))
        .select(
            "cnt",
            "l",
            F.explode(
                F.expr("transform(sequence(1, length(word) - l + 1), i -> substring(word, i, l))")
            ).alias("piece"),
        )
    )
    counts = subs.groupBy("piece").agg(F.sum("cnt").alias("w"))
    chars = counts.where(F.length("piece") == 1)
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.desc("w"), F.asc("piece"))
        .limit(seed_size)
    )
    return chars.unionByName(multi)


def _viterbi_fn(vocab: dict[str, float], max_piece_len: int):
    """mapInPandas body: per-word Viterbi best segmentation under the piece
    logprobs in ``vocab`` (closure-shipped, O(V)). Unknown single chars fall
    back to _UNK_PENALTY so every word is segmentable. Input batches carry
    (word, cnt); output (word, cnt, pieces, logp)."""
    import pandas as pd

    def fn(batches):
        for batch in batches:
            out_pieces, out_logp = [], []
            for word in batch["word"]:
                n = len(word)
                # dp[i]: (best logp of word[:i], backpointer start of last piece)
                dp = [(-math.inf, -1)] * (n + 1)
                dp[0] = (0.0, -1)
                for i in range(1, n + 1):
                    best = (-math.inf, -1)
                    for j in range(max(0, i - max_piece_len), i):
                        base = dp[j][0]
                        if base == -math.inf:
                            continue
                        piece = word[j:i]
                        lp = vocab.get(piece)
                        if lp is None:
                            if i - j == 1:
                                lp = _UNK_PENALTY
                            else:
                                continue
                        cand = base + lp
                        if cand > best[0]:
                            best = (cand, j)
                    dp[i] = best
                pieces = []
                i = n
                while i > 0:
                    j = dp[i][1]
                    pieces.append(word[j:i])
                    i = j
                pieces.reverse()
                out_pieces.append(pieces)
                out_logp.append(dp[n][0])
            yield pd.DataFrame(
                {
                    "word": batch["word"],
                    "cnt": batch["cnt"],
                    "pieces": out_pieces,
                    "logp": out_logp,
                }
            )

    return fn


def viterbi_segment(
    words: DataFrame, vocab: dict[str, float], max_piece_len: int
) -> DataFrame:
    """Segment the word histogram under ``vocab``: (word, cnt, pieces, logp).
    Arrow-batched Python over the bounded histogram grain only."""
    return words.select("word", "cnt").mapInPandas(
        _viterbi_fn(vocab, max_piece_len),
        "word string, cnt bigint, pieces array<string>, logp double",
    )


def _normalize(counts: list[tuple[str, float]]) -> dict[str, float]:
    total = sum(c for _, c in counts)
    return {p: math.log(c / total) for p, c in counts}


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 512,
    max_piece_len: int = 4,
    n_iters: int = 3,
    seed_size: int = 2048,
    text_col: str = "text",
) -> tuple[dict[str, float], list[float]]:
    """Train the unigram LM; returns (piece -> logprob, per-iteration Viterbi
    objective Σ cnt·logp). The corpus never leaves the cluster; the driver
    holds only the O(seed_size) model table per round."""
    from .dedup import track_cache

    words = track_cache(word_histogram(docs, text_col=text_col))
    seed_rows = seed_candidates(words, max_piece_len, seed_size).collect()
    # initial probs from raw substring weights, sorted for bit-stable float ops
    vocab = _normalize(sorted((r["piece"], float(r["w"])) for r in seed_rows))
    objectives: list[float] = []
    for it in range(n_iters):
        # Persist the segmentation: it feeds BOTH the objective scalar and
        # the piece-usage counts, and without the boundary the Arrow-batched
        # Viterbi pass ran TWICE per EM round (r12 — guide §4.5/§5). The
        # objective then rides the usage collect as a marked row: ONE driver
        # action per round instead of two. Sums are exact (decimal objective,
        # integer usage), so vocab and objectives are bit-identical.
        seg = viterbi_segment(words, vocab, max_piece_len).persist()
        contrib = (F.col("cnt").cast("double") * F.col("logp")).cast("decimal(27,8)")
        stats = (
            seg.select(F.explode("pieces").alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("used"))
            .select("piece", "used", F.lit(None).cast("decimal(27,8)").alias("obj"))
            .unionByName(
                seg.agg(F.sum(contrib).alias("obj")).select(
                    F.lit(None).cast("string").alias("piece"),
                    F.lit(None).cast("bigint").alias("used"),
                    "obj",
                )
            )
            .collect()
        )
        seg.unpersist()
        objectives.append(
            next(float(r["obj"]) for r in stats if r["piece"] is None)
        )
        rows = sorted(
            (r["piece"], float(r["used"])) for r in stats if r["piece"] is not None
        )
        # prune toward the target: single chars always survive (coverage),
        # multi-char pieces keep the top slots by usage (tie: piece ASC)
        chars = [(p, c) for p, c in rows if len(p) == 1]
        multi = [(p, c) for p, c in rows if len(p) > 1]
        multi.sort(key=lambda pc: (-pc[1], pc[0]))
        keep = chars + multi[: max(0, vocab_size - len(chars))]
        vocab = _normalize(sorted(keep))
    return vocab, objectives


def doc_perplexity(
    docs: DataFrame,
    vocab: dict[str, float],
    max_piece_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under a trained unigram LM, via dictionary
    encoding: segment each DISTINCT word of the corpus exactly once (bounded
    grain), broadcast-join (logp, n_pieces) back onto (doc, word) occurrences,
    then one groupBy(doc) — ppl = exp(-Σ logp / Σ pieces). The corpus text
    never reaches Python; scoring 100 TB costs one explode + one shuffle on
    ``id_col`` plus dictionary-sized DP work."""
    occurrences = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).where((F.length("word") > 0) & (F.length("word") <= 64))
    distinct_words = occurrences.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    seg = viterbi_segment(distinct_words, vocab, max_piece_len).select(
        "word", F.size("pieces").alias("n_pieces"), "logp"
    )
    return (
        occurrences.join(F.broadcast(seg), on="word")
        .groupBy("_doc")
        .agg(
            F.sum("n_pieces").alias("n_tokens"),
            # DECIMAL(38,18)-quantized log p before the per-doc sum: exact,
            # order-independent arithmetic regardless of input partitioning
            # (double sums flip last-ULP bits when the partial-merge order
            # changes — the KN save/load flake, kneser_ney.py::kn_perplexity)
            F.sum(F.col("logp").cast("decimal(38,18)")).alias("sum_logp"),
        )
        .select(
            F.col("_doc").alias(id_col),
            "n_tokens",
            F.exp(
                -F.col("sum_logp").cast("double") / F.col("n_tokens").cast("double")
            ).alias("ppl"),
        )
    )


def _bucketize(
    scored: DataFrame,
    id_col: str,
    lang_col: str,
    n_buckets: int,
    method: str,
) -> DataFrame:
    """The CCNet equal-frequency split, shared by both LM families (unigram
    here, modified Kneser-Ney in operators/kneser_ney.py): ``scored`` carries
    (id, lang, n_tokens, ppl); returns it plus bucket 1..n_buckets. See
    ccnet_buckets for the exact-vs-approx contract."""
    if method == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy(lang_col).orderBy(F.asc("ppl"), F.asc(id_col))
        return scored.select(
            id_col,
            lang_col,
            "n_tokens",
            "ppl",
            F.ntile(n_buckets).over(w).alias("bucket"),
        )
    if method != "approx":
        raise ValueError(f"ccnet_buckets: unknown method {method!r}")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.groupBy(lang_col).agg(
        F.percentile_approx("ppl", probs, 10000).alias("cuts")
    )
    joined = scored.join(F.broadcast(cuts), on=lang_col)
    # bucket = 1 + #cutpoints strictly below ppl (ties fall left, matching
    # the exact method's ordering by (ppl, id) closely enough for the sketch)
    bucket = F.lit(1) + F.aggregate(
        F.col("cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col("ppl") > c, 1).otherwise(0),
    )
    return joined.select(
        id_col, lang_col, "n_tokens", "ppl", bucket.cast("int").alias("bucket")
    )


def ccnet_buckets(
    docs: DataFrame,
    vocab: dict[str, float] | None = None,
    max_piece_len: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    method: str = "exact",
    model=None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"): score
    every document's perplexity under a reference-trained LM, then split each
    language into equal-frequency buckets (head = lowest perplexity =
    best-matching-the-reference, ..., tail). CCNet uses per-language KenLM
    5-gram models; here the LM is the unigram model of this module (the
    bucketing pipeline — the part that is a DATAFLOW problem — is identical;
    the LM family is pluggable). Returns one row per document:
    (doc_id, lang, n_tokens, ppl, bucket 1..n_buckets).

    ``method="exact"``: per-language ntile — a window partitioned by lang,
    so each language's documents flow through ONE task's sort. Exact
    equal-frequency split; right up to ~10⁸ docs per language.
    ``method="approx"``: the 100 TB path — per-lang approx_percentile
    cutpoints (map-side sketch, one tiny groupBy) broadcast-joined back and
    compared; no per-lang sort ever happens, bucket sizes are equal only to
    sketch accuracy (1e-4 relative error). Same head/middle/tail contract;
    the two methods' boundaries agree within sketch tolerance (tested).

    ``model``: pass a trained operators.kneser_ney.KNModel to score
    perplexity under the TRUE CCNet LM family (5-gram modified Kneser-Ney)
    instead of the unigram model — the bucketing dataflow is identical;
    vocab/max_piece_len are ignored in that case."""
    if model is not None:
        from .kneser_ney import kn_perplexity

        ppl = kn_perplexity(docs, model, text_col=text_col, id_col=id_col)
    else:
        if vocab is None or max_piece_len is None:
            raise ValueError("ccnet_buckets: pass (vocab, max_piece_len) or model=")
        ppl = doc_perplexity(docs, vocab, max_piece_len, text_col=text_col, id_col=id_col)
    scored = docs.select(id_col, lang_col).join(ppl, on=id_col)
    return _bucketize(scored, id_col, lang_col, n_buckets, method)


def unigram_encode_stats(
    docs: DataFrame,
    vocab: dict[str, float],
    max_piece_len: int,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Tokenization inference via dictionary encoding: segment each DISTINCT
    word once (bounded grain), then broadcast-join piece counts back onto
    the corpus word occurrences — a word occurring a million times costs one
    DP. Returns per-group token statistics."""
    occurrences = docs.select(
        F.col(group_col).alias("grp"), F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).where((F.length("word") > 0) & (F.length("word") <= 64))
    distinct_words = occurrences.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    seg = viterbi_segment(distinct_words, vocab, max_piece_len).select(
        "word", F.size("pieces").alias("n_pieces"), F.length("word").alias("n_chars")
    )
    return (
        occurrences.join(F.broadcast(seg), on="word")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_words",
            "n_tokens",
            (F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")).alias(
                "chars_per_token"
            ),
        )
    )
