"""Leakage-safe dataset splitting — assign train/val/test by NEAR-DUP
CLUSTER, never by document. Splitting a corpus row-wise after (or without)
dedup quietly puts near-copies of the same page on both sides of the
train/eval boundary; the standard guard (used by the dedup literature's
eval protocols, e.g. Lee et al. 2022's train/test overlap analysis) is to
make the atomic unit of assignment the connected component of the near-dup
graph, so a document and all its near-copies land in the SAME split by
construction.

Spark-first shape: components come from the existing min-label propagation
(operators/dedup.py::resolve_components — co-partitioned bounded shuffles);
the split decision is then one deterministic hash of the CLUSTER
representative: u = uniform(seed, rep) ∈ [0,1) cut by cumulative fractions.
Every doc in a cluster hashes the same rep → same split, no coordination, no
extra shuffle beyond the left join of the (small) component table onto the
corpus — broadcastable whenever near-dup clusters are rare relative to the
corpus, which is the only regime dedup is worth running in.

Determinism: the assignment is a pure function of (seed, cluster rep), so
re-running on the same corpus — at any partitioning, any cluster — reproduces
the identical split (tested); adding NEW documents never moves an existing
singleton between splits (its unit is its own id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1 << 32


def _uniform(col, seed: int):
    """Deterministic uniform in [0,1) from xxhash64(seed, col)."""
    h = F.xxhash64(F.lit(int(seed)), col.cast("string"))
    return (F.pmod(h, F.lit(_M))).cast("double") / F.lit(float(_M))


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Append (unit, split) to ``docs``: unit = the near-dup component rep
    (the doc's own id for singletons), split = named bucket cut from the
    cumulative ``fractions`` (insertion order; default 90/5/5
    train/val/test). Fractions must sum to 1 (±1e-9)."""
    from .dedup import resolve_components

    fractions = fractions or {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, want 1.0")
    if not fractions:
        raise ValueError("need at least one split")

    comps = resolve_components(pairs, a_col=a_col, b_col=b_col).withColumnRenamed(
        "doc", id_col
    )
    assigned = docs.join(F.broadcast(comps), on=id_col, how="left").withColumn(
        "unit", F.coalesce(F.col("rep"), F.col(id_col))
    ).drop("rep")

    u = _uniform(F.col("unit"), seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return assigned.withColumn("split", expr)


def split_report(
    split_docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Per-split summary with the leakage PROOF column: (split, n_docs,
    n_units, cross_split_pairs) where cross_split_pairs counts near-dup
    pairs whose endpoints landed in different splits — 0 by construction
    for cluster_safe_split output (tested; any row-wise splitter shows >0
    on a corpus with near-dups)."""
    sides = split_docs.select(id_col, "split")
    crossing = (
        pairs.join(
            sides.select(F.col(id_col).alias(a_col), F.col("split").alias("sa")),
            on=a_col,
        )
        .join(
            sides.select(F.col(id_col).alias(b_col), F.col("split").alias("sb")),
            on=b_col,
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    return (
        split_docs.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("unit").alias("n_units"),
        )
        .withColumn("cross_split_pairs", F.lit(int(crossing)))
    )
