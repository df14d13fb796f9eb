"""Mergeable cardinality sketches from pure column expressions.

Spark ships HyperLogLog++ (approx_count_distinct); this module adds a
k-min-statistic sketch built ONLY from MIN aggregates — the same family as
KMV/theta sketches — to demonstrate that a novel sketch can ride Spark's
existing aggregation machinery instead of a custom UDAF:

  slot i of the sketch = min over the group of u_i(x), where
  u_i(x) = (xxhash64(x, seed+i) scaled to (0,1)) — k independent uniform
  hashes per element.

Each slot is a plain MIN() — partial (map-side) aggregation, shuffle carries
k doubles per group, and sketches MERGE by element-wise min (associative,
commutative — the property that makes the estimate identical under any
partitioning or pre-aggregation layout, exactly like the fixed-point sums in
functions/numeric.py).

Estimator: for n distinct elements the slot minimum is ~Beta(1, n), i.e.
approximately Exp(n) for large n; the MLE across k independent slots is
n_hat = (k - 1) / sum(m_i)  (the unbiased form of k/sum m).  Relative
standard error ~ 1/sqrt(k-2).

The reference has no sketches at all (SURVEY §2.2); this belongs to the
driver's extension surface (approximate distinct at 100 TB with explicit,
tunable error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO63 = float(1 << 63)


def _uniform(col: Column, seed: int) -> Column:
    """xxhash64(col, seed) mapped to a uniform double in (0, 1]."""
    # shift signed long into [0, 2^64) as double, then scale; +1 avoids an
    # exact zero (which would make a slot's min degenerate).
    h = F.xxhash64(col, F.lit(seed)).cast("double")
    return (h + _TWO63 + F.lit(1.0)) / F.lit(2.0 * _TWO63 + 2.0)


def kmin_distinct_estimate(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT col) via the k-min-statistic
    sketch. Output: keys + n_rows + distinct_est (double).

    One hash aggregation: k MIN expressions with map-side combine — the
    shuffle carries k doubles per group regardless of group size. Error
    ~ 1/sqrt(k-2) relative (k=64 -> ~13%%)."""
    mins = [
        F.min(_uniform(F.col(col), seed + i)).alias(f"m{i}") for i in range(k)
    ]
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"), *mins)
    total = None
    for i in range(k):
        c = F.col(f"m{i}")
        total = c if total is None else total + c
    est = (F.lit(float(k - 1)) / total).alias("distinct_est")
    return agg.select(*keys, "n_rows", est)


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame:
    (row, bucket, cnt) cells, row i bucketing by an independent seeded
    xxhash64. depth*width longs regardless of stream size — THE bounded-
    memory frequency summary for streams too hot to recount exactly.

    Mergeable by construction: sketches over disjoint inputs combine by
    cell-wise addition (same groupBy on (row, bucket)), so partial sketches
    roll up across files/hours/days like any algebraic aggregate. Build cost
    is one shuffle of depth x |distinct-per-partition| partial cells
    (map-side combine collapses repeats before the exchange).
    """
    # ONE pass over the stream: each item emits its depth (row, bucket)
    # cells via inline() — the previous depth-way UNION of full scans
    # re-read (and re-exploded, for callers feeding tokenized text) the
    # stream once per sketch row (r12, guide §2.4: the union branches were
    # four identical scans). Cell counts are identical either way.
    cells = items.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.col(key_col).cast("string"), F.lit(seed + i)),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        )
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """(key, est) point-frequency estimates: min over the depth rows of the
    probed cells. Never underestimates; overestimates by <= e*N/width with
    probability 1 - e^-depth. The probe set joins against the sketch cells
    (broadcast whichever side is small)."""
    exploded = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.col(key_col).cast("string"), F.lit(seed + i)),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("h"),
    ).select(key_col, F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
    return (
        exploded.join(sketch, ["row", "bucket"], "left")
        .select(key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )
