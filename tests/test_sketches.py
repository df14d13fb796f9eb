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
