"""Distributed BPE-style vocabulary training (word-level pair merging).

The tokenizer-training primitive of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"),
expressed at the word level over the corpus: repeatedly find the most
frequent ADJACENT token pair and fuse it into one token. Each round is pure
dataflow —

  pair counting   explode (tokens[i], tokens[i+1]) per doc, one groupBy —
                  map-side combinable, the same shuffle shape as word counts;
  argmax          deterministic (count DESC, pair ASC) — a 1-row result the
                  DRIVER reads to decide the next merge (the standard
                  iterative-algorithm control-flow pattern: the decision is
                  O(1) data; the corpus never leaves the cluster);
  merge           every doc's token array rewritten by one linear HOF pass
                  (aggregate with (acc, pending) state), embarrassingly
                  parallel, no shuffle.

Token arrays stay arrays end to end (no string round-trip, no regex), so
merged tokens are joined with '\\u2581' (the sentencepiece-style joiner) and
any text is safe. Determinism: counts are exact integers and the tie-break
is total, so training reproduces bit-for-bit on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOINER = "▁"


def adjacent_pair_counts(toks: DataFrame, col: str = "toks") -> DataFrame:
    """(a, b, cnt) counts of adjacent token pairs across all rows."""
    # size >= 2 guard BEFORE the transform: sequence(0, -1) would descend.
    pairs = toks.where(F.expr(f"size({col}) >= 2")).select(
        F.explode(
            F.expr(
                f"transform(sequence(0, size({col})-2),"
                f" i -> struct({col}[i] as a, {col}[i+1] as b))"
            )
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_pair(toks: DataFrame, col: str = "toks") -> DataFrame:
    """The single most frequent adjacent pair (count DESC, a ASC, b ASC)."""
    return adjacent_pair_counts(toks, col).orderBy(
        F.desc("cnt"), F.asc("a"), F.asc("b")
    ).limit(1)


def apply_merge(toks: DataFrame, a: str, b: str, col: str = "toks") -> DataFrame:
    """Fuse every left-to-right non-overlapping adjacent (a, b) into one
    token a⁁b, in ONE linear pass per row: fold over the array carrying a
    one-token lookbehind ('pending'); when pending==a and the next token==b,
    emit the fused token and clear the pending slot (so 'a a b' fuses the
    LAST two and 'a b a b' fuses both — exact BPE scan semantics)."""
    def q(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    merged = f"{a}{JOINER}{b}"
    expr = f"""
        aggregate(
          {col},
          struct(cast(array() as array<string>) as acc, cast(null as string) as pending),
          (s, t) -> CASE
              WHEN s.pending = '{q(a)}' AND t = '{q(b)}'
                  THEN struct(array_append(s.acc, '{q(merged)}') as acc,
                              cast(null as string) as pending)
              WHEN s.pending IS NULL
                  THEN struct(s.acc as acc, t as pending)
              ELSE struct(array_append(s.acc, s.pending) as acc, t as pending)
          END,
          s -> CASE WHEN s.pending IS NULL THEN s.acc
                    ELSE array_append(s.acc, s.pending) END
        )
    """
    return toks.withColumn(col, F.expr(expr))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    sample_fraction: float | None = None,
    seed: int = 42,
) -> tuple[list, DataFrame]:
    """Run ``n_merges`` rounds; returns (merge table, final tokenized corpus).

    merge table rows: (rank, a, b, cnt) in merge order — the artifact a
    tokenizer ships. Each round re-counts pairs on the merged corpus; the
    corpus DataFrame is iteratively persisted so round i+1 reads round i's
    arrays, not the raw text re-derived (the PageRank/components pattern).

    COST BOUND (r8 verdict task #5): every merge is one FULL pair-count
    pass over the (current) corpus — training is O(n_merges x corpus),
    inherent to exact BPE. The deployment answer at scale is the same as
    pq_train_codebooks': train the merge table on a bounded SAMPLE
    (``sample_fraction``; seeded, reproducible) — pair-frequency ranks are
    corpus statistics that stabilize long before full coverage — then run
    ``bpe_encode`` (shuffle-free, linear) over the full corpus. Sampling
    changes only which merges win ties near the frequency floor; a merge
    table trained on a representative sample encodes unseen text
    identically (equivalence pinned on a deterministic fixture in
    tests/test_round3_ops.py, cost measured in BENCH_sf1.json).
    """
    from .dedup import track_cache

    base = docs
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    toks = track_cache(base.select(F.split(F.col(text_col), r"\s+").alias("toks")))
    merges: list = []
    for rank in range(n_merges):
        row = top_pair(toks).collect()
        if not row or row[0]["cnt"] < 2:
            break
        a, b, cnt = row[0]["a"], row[0]["b"], row[0]["cnt"]
        merges.append((rank, a, b, int(cnt)))
        toks = track_cache(apply_merge(toks, a, b))
    return merges, toks


def bpe_save(spark, merges: list, path: str) -> None:
    """Persist a trained merge table as ONE parquet table — the shippable
    tokenizer artifact (the kn_save pattern: everything through Spark
    writers so the artifact lands on one filesystem; no driver-local
    sidecar). Columns: (rank, a, b, cnt) in merge order."""
    spark.createDataFrame(
        [(int(r), str(a), str(b), int(c)) for r, a, b, c in merges],
        "rank int, a string, b string, cnt bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bpe_load(spark, path: str) -> list:
    """Load a bpe_save artifact back into the merge-table form bpe_encode
    takes; round-trips bit-exactly (pinned in tests)."""
    return [
        (int(r["rank"]), str(r["a"]), str(r["b"]), int(r["cnt"]))
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]


def bpe_encode(docs: DataFrame, merges: list, text_col: str = "text") -> DataFrame:
    """Tokenization INFERENCE: apply a trained merge table (rank order) to
    new text — the other half of the tokenizer artifact. Each merge is one
    shuffle-free linear pass; K merges chain into one codegen'd projection
    pipeline. Invariant (tested): re-encoding the training corpus from raw
    text reproduces the training loop's final token arrays exactly."""
    toks = docs.select(F.split(F.col(text_col), r"\s+").alias("toks"))
    for _, a, b, _ in sorted(merges):
        toks = apply_merge(toks, a, b)
    return toks
