"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — exact, O(|queries| * |corpus|); correct
at test scale and the right tool whenever the query set is small (broadcast
the queries, never the corpus). Scale path: random-hyperplane LSH — bucket
corpus and queries by sign-bit sketches so only same-bucket vectors meet,
turning the quadratic join into a bucketed equi-join (recall measured in
tests/test_similarity.py). Embedding near-dup (cosine ≥ t over all pairs)
reuses the same machinery.

Everything is JVM-side column arithmetic (zip_with/aggregate); no Python UDF.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding self-matches):
    broadcast the (small) query side against the corpus, rank per query.
    Output: (query_id, neighbor_id, cos, rank)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")).where(F.col("rank") <= k)


def nearest_neighbor_all(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Top-1 neighbor for EVERY corpus vector (all-pairs cosine), exact.

    Dense linear algebra is the one place where column expressions lose to
    Arrow-batched numpy by orders of magnitude (BLAS matmul vs per-element
    expression eval — measured 88 s vs <2 s at sf0.1), so this uses
    mapInPandas: the corpus matrix is L2-normalized once, broadcast to
    executors, and each partition computes a (batch x N) matmul. Broadcast is
    fine up to ~1M x 64 (512 MB); beyond that the scale answer is tiling the
    corpus (loop over broadcast chunks) or lsh_topk — all-pairs exact NN over
    100 TB is not a thing regardless of engine.
    """
    import numpy as np
    import pandas as pd

    pdf = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).toPandas()
    ids = pdf["vid"].to_numpy()
    mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    pos_of_id = {int(i): p for p, i in enumerate(ids)}
    bc = corpus.sparkSession.sparkContext.broadcast((ids, mat, pos_of_id))

    def top1(batches):
        b_ids, b_mat, b_pos = bc.value
        for batch in batches:
            q = np.vstack(batch["v"].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ b_mat.T
            qids = batch["vid"].to_numpy()
            for row, qid in enumerate(qids):
                sims[row, b_pos[int(qid)]] = -np.inf  # exclude self
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": qids,
                    "neighbor_id": b_ids[best],
                    "cos": sims[np.arange(len(qids)), best],
                }
            )

    return corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")).mapInPandas(
        top1, schema="query_id long, neighbor_id long, cos double"
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-duplicate check)."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit sketch of a vector against fixed random hyperplanes -> int
    bucket id. Same-bucket vectors are 'probably close' (cosine LSH)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(as_double(vec_col), F.array(*[F.lit(p) for p in plane]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 3,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: OR-amplified cosine LSH. Each of ``n_tables``
    sketches buckets the corpus; a query meets only the union of its buckets.
    The candidate join is an equi-join on (table, bucket) — linear shuffle, no
    cross join — then exact cosine ranks the shortlist. Recall vs
    brute_force_topk is asserted in tests (≥0.8 for top-10 at sf0.01)."""
    tables = [
        (t, _hyperplanes(dim, n_planes, seed=1000 + t)) for t in range(n_tables)
    ]

    def bucketed(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(idname), F.col(vec_col).alias(vecname))
        pairs = F.array(
            *[
                F.struct(F.lit(t).alias("tbl"), lsh_bucket(F.col(vecname), planes).alias("bkt"))
                for t, planes in tables
            ]
        )
        return out.select(idname, vecname, F.explode(pairs).alias("tb")).select(
            idname, vecname, F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt")
        )

    c = bucketed(corpus, "neighbor_id", "cvec")
    q = bucketed(queries, "query_id", "qvec")
    cands = (
        c.join(q, ["tbl", "bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cands.select("query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos"))
        .select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )
