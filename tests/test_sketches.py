"""k-min-statistic distinct sketch (operators/sketches.py): accuracy vs
exact COUNT(DISTINCT), merge invariance under pre-aggregation layout, and
determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timing_explorer_spark.operators.sketches import kmin_distinct_estimate
from timing_explorer_spark.sources.tables import load


def test_kmin_estimate_within_error_bound(spark, sf_oracle):
    k = 64
    o = load(spark, sf_oracle, "orders")
    est = {
        r["o_orderpriority"]: r["distinct_est"]
        for r in kmin_distinct_estimate(o, ["o_orderpriority"], "o_custkey", k=k).collect()
    }
    exact = {
        r["o_orderpriority"]: r["d"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    tol = 3.0 / math.sqrt(k - 2)  # ~3 standard errors
    for key, d in exact.items():
        rel = abs(est[key] - d) / d
        assert rel < tol, (key, est[key], d, rel)


def test_kmin_estimate_partitioning_invariant(spark, sf_oracle):
    """Element-wise-min mergeability: the estimate must be bit-identical
    under any input partitioning (1 vs 32 partitions)."""
    o = load(spark, sf_oracle, "orders")
    a = sorted(
        (r["o_orderpriority"], r["distinct_est"])
        for r in kmin_distinct_estimate(o.repartition(1), ["o_orderpriority"], "o_custkey").collect()
    )
    b = sorted(
        (r["o_orderpriority"], r["distinct_est"])
        for r in kmin_distinct_estimate(o.repartition(32), ["o_orderpriority"], "o_custkey").collect()
    )
    assert a == b


def test_cms_overestimate_bound_and_merge(spark, sf_smoke):
    """CMS guarantees: est >= true always; est <= true + 2N/width for the
    probed keys (w.h.p.); and cell-wise addition of two disjoint-input
    sketches equals the whole-input sketch (mergeability)."""
    from pyspark.sql import functions as F

    from timing_explorer_spark.functions.text import tokens
    from timing_explorer_spark.operators.sketches import cms_build, cms_estimate
    from timing_explorer_spark.sources.tables import load

    d = load(spark, sf_smoke, "documents")
    words = d.select(F.explode(tokens(F.col("text"))).alias("word"))
    total = words.count()
    sketch = cms_build(words, "word")

    exact = {
        r["word"]: r["c"]
        for r in words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).orderBy(F.desc("c")).limit(40).collect()
    }
    probes = spark.createDataFrame([(w,) for w in exact], ["word"])
    est = {r["word"]: r["est"] for r in cms_estimate(sketch, probes, "word").collect()}
    slack = 2 * total / 2048
    for w, c in exact.items():
        assert est[w] >= c, f"{w}: CMS underestimated"
        assert est[w] <= c + slack, f"{w}: overestimate beyond bound"

    # Mergeability: sketch(A) + sketch(B) == sketch(A ∪ B), cell-wise.
    a = words.where(F.xxhash64("word") % 2 == 0)
    b = words.where(F.xxhash64("word") % 2 != 0)
    merged = (
        cms_build(a, "word")
        .unionByName(cms_build(b, "word"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = merged.exceptAll(sketch).count() + sketch.exceptAll(merged).count()
    assert diff == 0
