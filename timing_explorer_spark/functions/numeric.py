"""Deterministic (order-independent) floating aggregation.

Distributed SUM/AVG over doubles is order-sensitive: partial aggregates
combine in partition order, so a 1000-executor run (or Spark vs the DuckDB
oracle) can differ in the last ~4 ulps. The driver's correctness gate hashes
values at 9 significant digits — a sum landing within an ulp of a rounding
boundary then flips a digit and fails the hash even though both engines are
"right". Observed in practice on q09 at sf0.001 (…17449 vs …17451).

Fix: fixed-point aggregation. Each term is cast to DECIMAL (exact, scale 4
for money-like values — the TPC-H spec itself makes money DECIMAL(15,2)),
summed with exact integer arithmetic (associative and commutative, so *any*
partition order gives the same bits), and the final scalar cast back to
DOUBLE. The per-row double expressions feeding the cast are bit-identical
across engines (IEEE 754 ops on the same parquet input), so Spark and the
oracle agree exactly at any scale and any partitioning.

The DuckDB oracle mirrors the same shape:
    CAST(SUM(CAST(expr AS DECIMAL(18,4))) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,4)"  # money-ish values (2-decimal data; 1e14 headroom)
FINE = "decimal(27,8)"  # generic measures (sensor values, scores)


def exact_sum(col: Column, dt: str = MONEY) -> Column:
    """Order-independent SUM of a double expression, returned as double."""
    return F.sum(col.cast(dt)).cast("double")


def exact_avg(col: Column, dt: str = MONEY) -> Column:
    """Order-independent AVG (exact sum / non-null count), as double."""
    return exact_sum(col, dt) / F.count(col)


def oracle_sum(expr: str, dt: str = "DECIMAL(18,4)") -> str:
    """The DuckDB-side spelling of exact_sum."""
    return f"CAST(SUM(CAST({expr} AS {dt})) AS DOUBLE)"


def oracle_avg(expr: str, dt: str = "DECIMAL(18,4)") -> str:
    return f"CAST(SUM(CAST({expr} AS {dt})) AS DOUBLE) / COUNT({expr})"


def grouped_exact_sum(df, keys: list, alias: str, col: Column, scale: int = 10000):
    """Two-level exact SUM for low-cardinality groupings: per-(group,
    partition) partial sums as scaled longs (bounded rows per partition ⇒ no
    overflow), then a decimal merge of the tiny partial set. ~2x faster than
    row-wise decimal accumulation, same bit-reproducibility, overflow-safe at
    any total scale. Use only when |groups| << |rows| — for high-cardinality
    keys the partial set is no smaller than the input and plain exact_sum
    wins.

    Oracle spelling:  CAST(SUM(CAST(ROUND(expr*scale) AS BIGINT)) AS DOUBLE)
                      / scale.0
    (single-level is fine in DuckDB — its BIGINT sums accumulate in hugeint).
    """
    import pyspark.sql.functions as _F

    partial = df.groupBy(*keys, _F.spark_partition_id().alias("__pid")).agg(
        _F.sum(_F.round(col * scale).cast("long")).alias("__u")
    )
    return partial.groupBy(*keys).agg(
        (_F.sum(_F.col("__u").cast("decimal(38,0)")).cast("double") / _F.lit(float(scale)))
        .alias(alias)
    )
