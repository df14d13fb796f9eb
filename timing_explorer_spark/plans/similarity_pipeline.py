"""Similarity-search query inventory over ``embeddings`` (SURVEY §7 P4).

Brute-force cosine (exact, oracle-checked against DuckDB list arithmetic in
DOUBLE precision) and LSH-bucketed ANN (approximate — rows-only check, recall
asserted in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ivf_topk,
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_topk,
    nearest_neighbor_all,
)
from ..sources.tables import load
from .registry import register

# DuckDB cosine in DOUBLE precision with explicit sequential arithmetic,
# mirroring Spark's zip_with/aggregate left fold.
_COS = (
    "list_dot_product(a.v, b.v) / "
    "(SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v)))"
)


@register(
    "q_embedding_nn",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   {_COS} AS cos
            FROM e a JOIN e b ON a.vec_id <> b.vec_id
        ), ranked AS (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rn
            FROM scored
        )
        SELECT query_id, neighbor_id, cos FROM ranked WHERE rn = 1
    """,
    doc="Exact nearest neighbor for every vector (all-pairs cosine, double precision).",
    headline=True,
    tags=("similarity", "knn"),
)
def q_embedding_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus_path → the build-side matrix is loaded by each Python worker
    # straight from parquet; the driver never materializes the corpus.
    return nearest_neighbor_all(
        load(spark, sf_dir, "embeddings"),
        corpus_path=f"{sf_dir}/embeddings.parquet",
    )


@register(
    "q_embedding_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT * FROM e WHERE vec_id < 5),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cos
            FROM q a JOIN e b ON a.vec_id <> b.vec_id
        )
        SELECT query_id, neighbor_id, cos, rank FROM (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
        WHERE rank <= 10
    """,
    doc=(
        "Top-10 cosine neighbors for a small query set (vec_id < 5): the "
        "broadcast-queries-vs-scan-corpus pattern — the exact-search shape "
        "that stays linear in corpus size at 100 TB."
    ),
    tags=("similarity", "topk"),
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


@register(
    "q_embedding_neardup",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {_COS} >= 0.45
    """,
    doc="Embedding near-duplicate pairs: cosine ≥ 0.45 over all pairs.",
    tags=("similarity", "neardup"),
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup_pairs(
        load(spark, sf_dir, "embeddings"),
        threshold=0.45,
        corpus_path=f"{sf_dir}/embeddings.parquet",
    )


@register(
    "q_ann_lsh_topk",
    oracle=None,  # approximate by construction; recall vs brute force in pytest
    doc=(
        "Approximate top-10 via OR-amplified random-hyperplane LSH (4 tables "
        "x 4 bits): candidate generation is an equi-join on (table, bucket) — "
        "the linear-shuffle ANN design for corpora where all-pairs is "
        "impossible. Driver does a rows-only check; tests assert recall ≥ 0.8 "
        "against brute_force_topk."
    ),
    tags=("similarity", "ann", "lsh"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return lsh_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


@register(
    "q_ann_ivf_topk",
    oracle=None,  # approximate by construction; recall vs brute force in pytest
    doc=(
        "Approximate top-10 via IVF (coarse k-means inverted lists, FAISS "
        "IVF-flat scheme): corpus bucketed by nearest centroid, queries probe "
        "their 4 nearest lists, exact cosine ranks the candidates. The "
        "centroid model broadcasts; the corpus shuffles once on bucket. "
        "Driver does a rows-only check; tests assert recall vs "
        "brute_force_topk."
    ),
    tags=("similarity", "ann", "ivf"),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.where(F.col("vec_id") < 5), k=10, n_centroids=16, n_probe=4)


@register(
    "q_embedding_rp_project",
    oracle="""
        SELECT vec_id,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(0*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p0,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(1*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p1,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(2*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p2,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(3*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p3,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(4*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p4,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(5*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p5,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(6*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p6,
               CAST(list_sum(list_transform(range(64), d ->
                   CAST(FLOOR(embedding[d+1]*1000) AS BIGINT) * (xor(7*73856093, d*19349663)%7 - 3))) AS DOUBLE)/1000.0 AS p7
        FROM embeddings
    """,
    doc=(
        "Dimensionality reduction 64->8 by deterministic quantized random "
        "projection (Achlioptas-style integer matrix, floor-quantized exact "
        "integer accumulation — bit-reproducible on any cluster). The cheap "
        "front-end of a two-stage similarity cascade: search in 8 dims, "
        "re-rank survivors in 64."
    ),
    tags=("similarity", "projection", "jl", "llm-pipeline"),
)
def q_embedding_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import random_projection

    return random_projection(load(spark, sf_dir, "embeddings"))
