"""DSIR importance resampling (operators/dsir.py) — semantic properties
beyond the registry's oracle hash-match: target-likeness ordering,
partitioning invariance of the exact decimal reduction, and deterministic
Gumbel resampling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timing_explorer_spark.operators.dsir import dsir_log_weights, dsir_resample


@pytest.fixture(scope="module")
def corpus(spark):
    # two sharply different vocabularies: "code" docs (target) vs "food"
    rows = []
    for i in range(40):
        rows.append((i, "spark shuffle partition join broadcast agg " * 3, "code"))
    for i in range(40, 80):
        rows.append((i, "butter flour sugar oven whisk bake " * 3, "food"))
    # mixed doc: half-and-half — should land between the two groups
    rows.append((80, "spark shuffle partition butter flour sugar", "mixed"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string").cache()


def test_target_docs_score_higher(corpus):
    w = dsir_log_weights(corpus, F.col("kind") == "code").join(
        corpus.select("doc_id", "kind"), "doc_id"
    )
    means = {r["kind"]: r["m"] for r in w.groupBy("kind").agg(F.avg("log_weight").alias("m")).collect()}
    assert means["code"] > means["mixed"] > means["food"]
    # every code doc outranks every food doc in this separable corpus
    worst_code = w.where(F.col("kind") == "code").agg(F.min("log_weight")).first()[0]
    best_food = w.where(F.col("kind") == "food").agg(F.max("log_weight")).first()[0]
    assert worst_code > best_food


def test_weights_partitioning_invariant(corpus):
    """The decimal-quantized log sum is exact: any repartitioning yields
    bit-identical doubles."""
    base = dsir_log_weights(corpus, F.col("kind") == "code")
    shuffled = dsir_log_weights(corpus.repartition(13, "text"), F.col("kind") == "code")
    a = {r["doc_id"]: r["log_weight"] for r in base.collect()}
    b = {r["doc_id"]: r["log_weight"] for r in shuffled.collect()}
    assert a == b  # exact equality, not approx


def test_resample_deterministic_and_weighted(corpus):
    w = dsir_log_weights(corpus, F.col("kind") == "code").cache()
    s1 = {r["doc_id"] for r in dsir_resample(w, n=20, seed=7).collect()}
    s2 = {r["doc_id"] for r in dsir_resample(w, n=20, seed=7).collect()}
    assert s1 == s2  # same seed -> same sample
    s3 = {r["doc_id"] for r in dsir_resample(w, n=20, seed=8).collect()}
    assert s1 != s3  # different seed -> different draw (overwhelmingly)
    # weighted: code docs (40 of 81) dominate a 20-doc sample
    kinds = corpus.select("doc_id", "kind").toPandas().set_index("doc_id")["kind"]
    assert sum(kinds[d] == "code" for d in s1) >= 15


def test_resample_guards(corpus):
    w = dsir_log_weights(corpus, F.col("kind") == "code")
    with pytest.raises(ValueError):
        dsir_resample(w, n=0)
    with pytest.raises(ValueError):
        dsir_log_weights(corpus, F.col("kind") == "code", n_buckets=1000)
