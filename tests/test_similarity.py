"""ANN quality: LSH top-k recall vs brute force; numpy NN vs expression NN."""

from __future__ import annotations

from pyspark.sql import functions as F

from timing_explorer_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    nearest_neighbor_all,
)
from timing_explorer_spark.sources.tables import load


def test_lsh_topk_recall(spark, sf_oracle):
    emb = load(spark, sf_oracle, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=10).select("query_id", "neighbor_id").collect()
    approx = lsh_topk(emb, queries, k=10).select("query_id", "neighbor_id").collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"LSH top-10 recall too low: {recall:.2f}"


def test_numpy_nn_equals_expression_nn(spark, sf_smoke):
    """The mapInPandas fast path must return the same neighbors as the
    column-expression formulation (modulo fp rounding in cos)."""
    emb = load(spark, sf_smoke, "embeddings").limit(200)
    fast = {
        (r.query_id, r.neighbor_id) for r in nearest_neighbor_all(emb).collect()
    }
    slow = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, emb, k=1).select("query_id", "neighbor_id").collect()
    }
    assert fast == slow
