"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169): select pretraining documents whose hashed-n-gram
distribution looks like a TARGET domain, by importance weight under two
bag-of-hashed-ngrams models.

    log w(doc) = sum_k  c_k(doc) * ( ln p_target(k) - ln q_raw(k) )

where c_k counts the doc's unigrams+bigrams hashed into bucket k, and the
two bucket distributions are Laplace-smoothed estimates from the target
sample and the full raw corpus. Resampling draws documents without
replacement with probability proportional to softmax(log w / T) — the
Gumbel-top-k trick, made deterministic here by deriving each document's
uniform from md5(seed || doc_id).

Spark shape (100 TB lens):
  - ONE pass computes both distributions: explode grams -> bucket ->
    groupBy(bucket) with a conditional sum for the target side. The bucket
    table is K rows (K = n_buckets, default 4096) — a bounded grain.
  - Per-doc weights: grams join the broadcast K-row log-ratio table
    map-side, then ONE shuffle on doc_id with map-side partial aggregation.
    No all-pairs shape, no driver collect; the corpus never leaves the
    cluster.
  - Determinism / engine parity: every log term is quantized to
    DECIMAL(27,8) BEFORE summing (the suite's PMI idiom), so the per-doc
    sum is an exact decimal reduction — order-independent under any
    partitioning, hash-identical to the DuckDB oracle. The bucket hash is
    the first 4 hex chars of md5 (portable across engines), and the
    resampling uniform is the first 8 hex chars of md5(seed || doc_id).

Reference parity note: the reference engine (alpinegizmo/timing-explorer)
has no corpus-selection surface; this operator belongs to the
driver-mandated LLM-pipeline extension family (exact/fuzzy dedup,
contamination, quality scoring live in operators/dedup.py and
plans/quality_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(27,8)"


def _hashed_grams(docs: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    """(id_col, bucket) — one row per unigram AND bigram occurrence, hashed
    into [0, n_buckets). Tokenization: lowercased whitespace split, the
    text suite's convention. Bucket = first 16 bits of md5 mod n_buckets
    (md5 is identical everywhere; 65536 % n_buckets == 0 keeps it uniform
    for power-of-two n_buckets)."""
    if n_buckets < 2 or 65536 % n_buckets:
        raise ValueError("n_buckets must be a power of two <= 65536")
    toks = F.split(F.lower(F.col(text_col)), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(toks, bigrams)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("gram")), 1, 4), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).alias("bucket")
    return docs.select(id_col, F.explode(grams).alias("gram")).select(id_col, bucket)


def _log_ratio_table(
    grams: DataFrame,
    target_ids: DataFrame,
    id_col: str,
    n_buckets: int,
    alpha: float,
) -> DataFrame:
    """K-row (bucket, lr) table: lr = ln p_target(k) - ln q_raw(k), each of
    the four ln terms quantized to DECIMAL(27,8) before combining. Laplace
    smoothing with integer alpha keeps every ln argument an exact integer,
    so both engines take ln of identical doubles."""
    flagged = grams.join(
        F.broadcast(target_ids.select(F.col(id_col), F.lit(1).alias("__t"))),
        id_col,
        "left",
    )
    counts = flagged.groupBy("bucket").agg(
        F.sum(F.coalesce(F.col("__t"), F.lit(0))).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    a = F.lit(alpha)
    ak = F.lit(alpha * n_buckets)
    lr = (
        F.log(F.col("ct") + a).cast(_DEC)
        - F.log(F.col("tt") + ak).cast(_DEC)
        - F.log(F.col("cr") + a).cast(_DEC)
        + F.log(F.col("tr") + ak).cast(_DEC)
    ).alias("lr")
    return counts.crossJoin(F.broadcast(totals)).select("bucket", lr)


def dsir_log_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weight: (id_col, log_weight double).

    ``is_target`` marks the target-domain sample (a boolean Column over
    ``docs``); the raw distribution is the whole corpus, target included —
    the paper's setup (the target sample is drawn from the raw pool).
    Positive log_weight = the document looks more target-like than the
    corpus average.
    """
    grams = _hashed_grams(docs, text_col, id_col, n_buckets)
    target_ids = docs.where(is_target).select(id_col)
    ratio = _log_ratio_table(grams, target_ids, id_col, n_buckets, alpha)
    # map-side broadcast join per gram row, then ONE shuffle keyed on doc
    # with map-side partial decimal sums
    return (
        grams.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lr").cast("double").alias("log_weight"))
    )


def dsir_resample(
    weights: DataFrame,
    n: int,
    temperature: float = 1.0,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k resampling without replacement, proportional to
    softmax(log_weight / temperature): key = log_weight/T + Gumbel(0,1),
    take the n largest keys. The Gumbel noise is DETERMINISTIC — each doc's
    uniform is md5(seed || doc_id)'s first 32 bits mapped into (0,1) — so
    the same (corpus, seed) always selects the same documents on any
    engine and any partitioning. Output: (id_col, log_weight, key), the n
    selected docs. Plan: map-side key computation + TakeOrdered(n) — no
    full sort materializes."""
    if n < 1:
        raise ValueError("n must be >= 1")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(str(seed)), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    gumbel = -F.log(-F.log(u))
    key = (
        (F.col("log_weight") / F.lit(temperature)).cast(_DEC) + gumbel.cast(_DEC)
    ).cast("double")
    return (
        weights.select(id_col, "log_weight", key.alias("key"))
        .orderBy(F.desc("key"), F.asc(id_col))
        .limit(n)
    )
