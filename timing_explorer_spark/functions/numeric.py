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


def split_exact_sum(col: Column, scale: int = 10000, split_bits: int = 20) -> tuple[Column, Column]:
    """Single-pass exact SUM of scaled-long units with overflow headroom far
    beyond long capacity, as TWO long aggregates (combine with
    ``merge_split_sum``).

    The long unit u = rint(col*scale) is split u = (u>>b)*2^b + (u & (2^b-1));
    both halves are summed as plain longs (codegen fast path, map-side partial
    agg, ONE exchange), then recombined exactly in DECIMAL(38) once per group.
    Two's-complement identities make the split exact for either sign, and each
    piece's magnitude is ≤ 2^b (low) / |u|/2^b (high) per row, so with
    |u| ≤ 2^33 (money ≤ ~$860k at scale 10^4) a single group can absorb
    ~2^43 ≈ 8.8e12 rows before either accumulator nears 2^63 — about a
    petabyte of lineitem in ONE group. (The earlier design got the same
    safety from per-partition partial sums, but that costs a second Exchange
    and stage; at low latency budgets the extra stage dominates.)
    """
    u = units(col, scale)
    hi = F.shiftright(u, split_bits)
    lo = u.bitwiseAND(F.lit((1 << split_bits) - 1))
    return F.sum(hi), F.sum(lo)


def merge_split_sum(hi: Column, lo: Column, scale: int = 10000, split_bits: int = 20) -> Column:
    """Recombine split_exact_sum halves: (hi*2^b + lo) exactly in decimal,
    scaled back to a double."""
    total = hi.cast("decimal(38,0)") * F.lit(1 << split_bits) + lo.cast("decimal(38,0)")
    return total.cast("double") / F.lit(float(scale))


def grouped_exact_sum(df, keys: list, alias: str, col: Column, scale: int = 10000):
    """Order-independent grouped SUM of a money-like double on the long fast
    path, planned as ONE HashAggregate pair (partial → exchange → final): the
    split-accumulator sum (see split_exact_sum) keeps per-row work at two long
    adds — no per-row BigDecimal (~2x faster, measured), no second
    aggregation stage (the round-2 design's per-(group, partition) pre-sum
    cost an extra Exchange; fusing it shaved the stage-launch overhead that
    dominated q05 at bench scale).

    Oracle spelling:  CAST(SUM(CAST(ROUND(expr*scale) AS BIGINT)) AS DOUBLE)
                      / scale.0
    (single-level is fine in DuckDB — its BIGINT sums accumulate in hugeint).

    ``scale`` must satisfy the ``units()`` rule: 10^k exactly covers the
    expression's rational decimal places, else rint/ROUND can disagree at .5.
    """
    hi, lo = split_exact_sum(col, scale)
    return (
        df.groupBy(*keys)
        .agg(hi.alias("__hi"), lo.alias("__lo"))
        .select(*keys, merge_split_sum(F.col("__hi"), F.col("__lo"), scale).alias(alias))
    )
