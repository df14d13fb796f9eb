"""Vector (embedding) column expressions — JVM-side, no Python UDFs.

Embeddings arrive as array<float>; every op first casts to array<double> so
arithmetic runs in double precision (matching the DuckDB oracle, which casts
to DOUBLE[]). dot/norm are left-fold aggregates over zip_with — sequential
accumulation, same order as the oracle's list_dot_product.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the two norms taken from precomputed columns.

    Inside a candidate join, ``cosine`` re-runs BOTH norm folds per PAIR —
    3 O(d) aggregates where 1 suffices, since each side's norm is constant
    per row. Attach ``norm(vec)`` to each side BEFORE the join and pass the
    columns here (r12, guide §2.2: per-row compute off the pair grain).
    Bit-identical to ``cosine``: the norm column is the same ``norm()``
    expression evaluated on the same array, and the combine
    ``dot / (na * nb)`` is the same expression tree."""
    return dot(a, b) / (na * nb)
