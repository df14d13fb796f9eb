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


def units(col: Column, scale: int) -> Column:
    """Exact fixed-point units for a money-like double: rint(col*scale) as
    long. ``F.rint`` (IEEE round-half-to-even, pure FP) instead of
    ``F.round`` (HALF_UP via per-row BigDecimal — measured 2.6x slower in a
    hot aggregate). The two only disagree when col*scale lands EXACTLY on
    .5 — impossible when 10^k exactly represents the value's rational
    decimal places (k >= the expression's decimal count): the scaled value
    is then within ~1e-4 ulps of an integer, and every correct rounding
    (Spark rint, DuckDB ROUND) picks the same one.

    RULE: scale exponent >= decimal places of the rational value.
      l_extendedprice (2dp)            -> 10^4 fine
      price*(1-disc) (4dp)             -> 10^4 fine
      price*(1-disc)*(1+tax) (6dp)     -> 10^6 REQUIRED (at 10^4 the scaled
                                          value sits exactly on .5 for ~1%%
                                          of rows; observed round!=rint)
    """
    return F.rint(col * scale).cast("long")


def oracle_unit_sum(expr: str, scale: int) -> str:
    """DuckDB spelling of SUM(units(expr, scale))/scale as double. DuckDB
    accumulates BIGINT sums in hugeint, so one level suffices; the outer
    DOUBLE cast keeps the driver's pandas hash off the HUGEINT path."""
    return f"CAST(SUM(CAST(ROUND({expr} * {scale}) AS BIGINT)) AS DOUBLE) / {scale}.0"


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

    ``scale`` must satisfy the ``units()`` rule: 10^k exactly covers the
    expression's rational decimal places, else rint/ROUND can disagree at .5.
    """
    import pyspark.sql.functions as _F

    partial = df.groupBy(*keys, _F.spark_partition_id().alias("__pid")).agg(
        _F.sum(units(col, scale)).alias("__u")
    )
    return partial.groupBy(*keys).agg(
        (_F.sum(_F.col("__u").cast("decimal(38,0)")).cast("double") / _F.lit(float(scale)))
        .alias(alias)
    )
