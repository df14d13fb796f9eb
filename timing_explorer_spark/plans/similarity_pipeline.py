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
    "q_ann_ivfpq_topk",
    oracle=None,  # approximate by construction; recall vs brute force in pytest
    doc=(
        "Approximate top-10 via IVF-PQ (Jégou et al. 2011; the FAISS IVFPQ "
        "serving layout): IVF lists bound WHICH vectors a query meets, "
        "product-quantization codes bound the BYTES each candidate costs — "
        "the full vectors leave the candidate path entirely (96-bit codes "
        "here, 21x smaller than the float32 vectors). Candidate score = "
        "sum of m LUT entries (pure JVM aggregate over the code array "
        "after the bucket equi-join); the ADC shortlist re-ranks EXACTLY "
        "against the full vectors (two-stage refine). Rows-only driver "
        "check; tests pin recall vs brute_force_topk (1.0 at the pinned "
        "operating point on the worst-case near-uniform synthetic vectors)."
    ),
    tags=("similarity", "ann", "ivf", "pq"),
)
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfpq_topk

    emb = load(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, emb.where(F.col("vec_id") < 5), k=10,
        n_centroids=16, n_probe=8, m=16, k_sub=64, refine=8,
    )


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


@register(
    "q_int8_embedding_topk",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        mx AS (SELECT MAX(list_max(list_transform(v, x -> ABS(x)))) AS m FROM e),
        q8 AS (
            SELECT vec_id,
                   list_transform(v, x -> CAST(ROUND(x * (127.0 / m)) AS INTEGER)) AS q
            FROM e, mx
        ),
        qs AS (SELECT * FROM q8 WHERE vec_id < 5),
        scored AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   CAST(list_sum(list_transform(range(1, LEN(a.q) + 1),
                        i -> CAST(a.q[i] AS BIGINT) * b.q[i])) AS BIGINT) AS qdot
            FROM qs a JOIN q8 b ON a.vec_id <> b.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, qdot,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY qdot DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, qdot, rank FROM ranked WHERE rank <= 10
    """,
    doc=(
        "Top-k retrieval in INT8-quantized space: symmetric scalar "
        "quantization (one corpus-wide max-abs scalar -> scale = 127/max, "
        "q = round(x*scale); no clamp needed since |x| <= max by "
        "construction), then exact INTEGER dot products rank the neighbors. "
        "The memory-bandwidth play of every production vector store "
        "(FAISS SQ8): 4x fewer bytes per vector than float32, and the "
        "integer accumulation makes the score — and therefore the ranking — "
        "bit-exact cross-engine, which float dot products cannot promise. "
        "Plan shape: the max-abs scalar is a 1-row broadcast (sanctioned "
        "nested-loop), quantization is a map-only pass, and the bounded "
        "query set (vec_id < 5) broadcasts against the corpus — scoring "
        "never shuffles the corpus. At 100 TB the same scale constant ships "
        "to every executor and the quantized corpus is the 4x-smaller "
        "artifact the ANN index (IVF/LSH, registered separately) is built "
        "over; recall vs the float ranking is asserted in pytest."
    ),
    tags=("similarity", "quantization", "int8", "topk"),
)
def q_int8_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vectors import as_double

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    mx = e.agg(F.max(F.array_max(F.transform(F.col("v"), F.abs))).alias("m"))
    from ..operators.dedup import track_cache

    # The quantized corpus is read by both the query side and the scoring
    # side; persist it — it is also the artifact that would be WRITTEN once
    # and served many times in production (4x smaller than float32).
    q8 = track_cache(
        e.crossJoin(F.broadcast(mx)).select(
            "vec_id",
            F.transform(
                F.col("v"), lambda x: F.round(x * (F.lit(127.0) / F.col("m"))).cast("int")
            ).alias("q"),
        )
    )
    qs = q8.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qa")
    )
    scored = (
        F.broadcast(qs)
        .join(q8, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with(F.col("qa"), F.col("q"), lambda x, y: (x * y).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "qdot", "rank")
    )


@register(
    "q_hard_negatives",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        q AS (SELECT * FROM e WHERE vec_id < 20),
        scored AS (
            SELECT a.vec_id AS query_id, a.label AS query_label,
                   b.vec_id AS neighbor_id, b.label AS neighbor_label,
                   {_COS} AS cos
            FROM q a JOIN e b
              ON a.vec_id <> b.vec_id AND a.label <> b.label
        )
        SELECT query_id, query_label, neighbor_id, neighbor_label, cos, rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
        WHERE rank <= 5
    """,
    doc=(
        "Hard-negative mining for contrastive training: per query vector, "
        "the 5 most-similar corpus vectors carrying a DIFFERENT label — the "
        "near-miss negatives that make embedding models learn boundaries "
        "(in-batch random negatives are too easy). Same "
        "broadcast-queries-vs-scan-corpus shape as q_embedding_topk with the "
        "label-mismatch predicate fused into the join, so rejected "
        "candidates never rank. Linear in corpus size; per-query state is "
        "one top-5 heap inside the window."
    ),
    tags=("similarity", "topk", "llm-pipeline", "training"),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vectors import cosine_prenormed, norm as vnorm

    emb = load(spark, sf_dir, "embeddings")
    # Per-side norm columns: the broadcast pair grain pays one dot fold
    # per candidate instead of three (r12, cosine_prenormed).
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("cvec"),
        vnorm(F.col("embedding")).alias("cn"),
    )
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qvec"),
        vnorm(F.col("embedding")).alias("qn"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("query_label") != F.col("neighbor_label")),
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        cosine_prenormed(
            F.col("qvec"), F.col("cvec"), F.col("qn"), F.col("cn")
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")).where(F.col("rank") <= 5)


@register(
    "q_label_centroids",
    oracle="""
        WITH comp AS (
            SELECT e.label, u.i AS dim,
                   CAST(FLOOR(u.comp_v * 16777216) AS BIGINT) AS um
            FROM (SELECT label, embedding::DOUBLE[] AS vv FROM embeddings) e,
                 LATERAL (SELECT UNNEST(e.vv) AS comp_v,
                                 UNNEST(generate_series(0, len(e.vv) - 1)) AS i) u
        ),
        cent AS (
            SELECT label, dim, SUM(CAST(um AS HUGEINT)) AS su
            FROM comp GROUP BY label, dim
        ),
        pair AS (
            SELECT a.label AS label_a, b.label AS label_b,
                   SUM(a.su * b.su)          AS sab,
                   SUM(a.su * a.su)          AS saa,
                   SUM(b.su * b.su)          AS sbb
            FROM cent a JOIN cent b
              ON a.dim = b.dim AND a.label < b.label
            GROUP BY a.label, b.label
        )
        SELECT label_a, label_b,
               CAST(sab AS DOUBLE)
                   / (SQRT(CAST(saa AS DOUBLE)) * SQRT(CAST(sbb AS DOUBLE)))
                   AS cos_centroid
        FROM pair
    """,
    doc=(
        "Inter-label centroid cosine matrix — the class-separability report "
        "an embedding-quality audit runs (labels whose centroids nearly "
        "coincide are candidates for merging or relabeling). Components are "
        "summed as exact 1e-7-unit integers per (label, dim) — one "
        "fact-table shuffle onto a 64×#labels grain — and the cosine "
        "identity cancels both the unit scale and the per-label counts "
        "(cos of mean = cos of sum), so the whole matrix derives from "
        "exact integer moments: bit-deterministic, no floating "
        "accumulation anywhere. The pair join runs on the tiny grain."
    ),
    tags=("similarity", "centroid", "llm-pipeline", "stats"),
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("dim", "v")
    ).select(
        "label",
        "dim",
        # floor at a 2^24 scale, not rint at 1e7: float components widened to
        # double are dyadic rationals, so v*1e7 CAN land exactly on .5 where
        # Spark rint (half-even) and DuckDB ROUND (half-away) disagree —
        # observed at sf0.01. floor has no tie case, and 2^24 ≥ the float
        # mantissa keeps the quantization error below the format's own
        # resolution (the q_embedding_rp_project floor-quantization rule).
        F.floor(F.col("v").cast("double") * F.lit(16777216)).cast("long").alias("um"),
    )
    cent = comp.groupBy("label", "dim").agg(
        F.sum(F.col("um").cast("decimal(38,0)")).alias("su")
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("dim").alias("dim_a"), F.col("su").alias("sua")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("dim").alias("dim_b"), F.col("su").alias("sub")
    )
    pair = (
        a.join(b, (F.col("dim_a") == F.col("dim_b")) & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sua") * F.col("sub")).alias("sab"),
            F.sum(F.col("sua") * F.col("sua")).alias("saa"),
            F.sum(F.col("sub") * F.col("sub")).alias("sbb"),
        )
    )
    return pair.select(
        "label_a",
        "label_b",
        (
            F.col("sab").cast("double")
            / (F.sqrt(F.col("saa").cast("double")) * F.sqrt(F.col("sbb").cast("double")))
        ).alias("cos_centroid"),
    )


@register(
    "q_semdedup_pairs",
    oracle=None,  # k-means clustering is not SQL-expressible; recall vs the
    # exact all-pairs scan asserted in tests/test_similarity.py
    doc=(
        "SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup "
        "pairs compared only WITHIN k-means clusters — the published "
        "web-corpus recipe that replaces the N^2 all-pairs scan with "
        "sum-of-cluster-size^2 work. One corpus shuffle on the cluster id; "
        "centroids broadcast; exact JVM-side cosine verifies every emitted "
        "pair, so precision is 1.0 by construction and only recall is "
        "approximate (cross-cluster pairs are skipped by design). "
        "operators/similarity.py::semdedup_pairs."
    ),
    tags=("dedup", "similarity", "ann", "llm-pipeline"),
)
def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb, threshold=0.45, n_clusters=8).orderBy(
        "id_a", "id_b"
    )


@register(
    "q_embedding_pca_variance",
    oracle=None,  # eigendecomposition — no SQL form; math pinned in pytest
    doc=(
        "Distributed PCA over the embedding corpus (the FAISS-style "
        "pre-transform in front of ANN / semantic dedup): fit = ONE scan "
        "emitting per-Arrow-batch (sum xx^T, sum x, n) partials — shuffle "
        "volume is batches x d^2 regardless of corpus size — with the d x d "
        "eigendecomposition on the driver; project = pure JVM zip_with dot "
        "products (model rides as literals, map-only). Output: per "
        "component, the model eigenvalue, the MEASURED variance of the "
        "projected coordinate (recomputed distributed — the two agreeing is "
        "the self-check), and explained-variance ratios. operators/pca.py."
    ),
    tags=("similarity", "embedding", "pca", "llm-pipeline"),
)
def q_embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.pca import pca_fit, pca_project

    emb = load(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=8)
    proj = pca_project(emb, model, "embedding", "pc")
    per_coord = (
        proj.select(F.posexplode("pc").alias("component", "y"))
        .groupBy("component")
        .agg(F.var_pop("y").alias("projected_variance"))
    )
    meta = spark.createDataFrame(
        [
            (j, ev, ev / model.total_variance)
            for j, ev in enumerate(model.eigenvalues)
        ],
        "component int, eigenvalue double, explained_variance_ratio double",
    )
    w = Window.orderBy("component").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_coord.join(meta, on="component")
        .select(
            "component",
            "eigenvalue",
            "projected_variance",
            "explained_variance_ratio",
            F.sum("explained_variance_ratio").over(w).alias("cumulative_evr"),
        )
        .orderBy("component")
    )


@register(
    "q_kmeans_cluster_profile",
    oracle=None,  # iterative Lloyd's — rows-only; invariants pinned in pytest
    doc=(
        "Corpus clustering report — the embedding-space profile a curation "
        "run reads before SemDeDup/IVF parameter choices: k-means "
        "(pyspark.ml, fixed seed) over L2-normalized embeddings, then per "
        "cluster: size, share of the corpus, mean within-cluster cosine to "
        "the centroid (tightness), and the dominant label with its purity. "
        "Assignment + profiling are JVM/Arrow dataflow on ONE corpus pass "
        "each; the model is O(k x dim) on the driver "
        "(operators/similarity.py::ivf_train_centroids / ivf_assign). At "
        "100 TB: train on a sample, assign map-only with the centroid "
        "matrix in the closure — no shuffle wider than the k-row profile "
        "aggregation."
    ),
    tags=("similarity", "embedding", "clustering", "llm-pipeline"),
)
def q_kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine_prenormed, norm as vnorm
    from ..operators.similarity import ivf_assign, ivf_train_centroids

    emb = load(spark, sf_dir, "embeddings")
    centers = ivf_train_centroids(emb, n_centroids=8, seed=42, max_iter=10)
    assigned = ivf_assign(emb, centers, "vec_id", "embedding", n_probe=1)
    labeled = assigned.join(emb.select("vec_id", "label"), on="vec_id")
    # Center norms precomputed on the 8-row broadcast side (JVM norm(), so
    # the doubles are identical to the per-row fold they replace); the scan
    # then pays one dot + one vector-norm fold per row instead of three
    # folds (r12, cosine_prenormed).
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "bucket int, center array<double>",
    ).withColumn("center_n", vnorm(F.col("center")))
    from ..operators.dedup import track_cache

    # per_vec feeds the total count (below), the dominant-label leg, and
    # the profile leg — without a boundary each re-runs the full assign +
    # cosine scan (r12, guide §5.3). The count doubles as materialization.
    per_vec = track_cache(
        labeled.join(F.broadcast(cdf), on="bucket").select(
            "bucket",
            "label",
            cosine_prenormed(
                F.col("embedding"),
                F.col("center"),
                vnorm(F.col("embedding")),
                F.col("center_n"),
            ).alias("cos_to_center"),
        )
    )
    total = per_vec.count()
    label_counts = per_vec.groupBy("bucket", "label").agg(
        F.count(F.lit(1)).alias("n_label")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy(F.desc("n_label"), F.asc("label"))
    dominant = (
        label_counts.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .select("bucket", F.col("label").alias("dominant_label"), "n_label")
    )
    prof = per_vec.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("size"),
        F.avg("cos_to_center").alias("mean_cos_to_center"),
    )
    return (
        prof.join(dominant, on="bucket")
        .select(
            F.col("bucket").alias("cluster"),
            "size",
            (F.col("size").cast("double") / F.lit(float(total))).alias("share"),
            "mean_cos_to_center",
            "dominant_label",
            (F.col("n_label").cast("double") / F.col("size")).alias("purity"),
        )
        .orderBy("cluster")
    )
