"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The 100 TB problem this solves: partition pruning (tests/test_plans_scale.py::
test_partitioned_layout_prunes) only skips data along ONE directory dimension.
Queries that filter on TWO dimensions (user AND time, id AND date) need the
file layout itself to co-locate rows that are close in BOTH — which is what
Delta/Iceberg ``OPTIMIZE ZORDER BY`` does: sort the table by the bit-interleave
of the dimensions' bucket codes, so every output file covers a small rectangle
of the dim space and its parquet min/max footers prune on either predicate.

This module computes the Morton key as a closed-form column expression —
five shift/mask rounds per dimension (the standard bit-spreading identity),
pure JVM integer arithmetic, zero shuffle, reproducible on any engine. The
reference has no layout surface (single-node Flink demo, SURVEY §2); this is
part of the driver-mandated scale surface alongside bucketing and salting
(operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Bit-spreading masks for interleaving two 16-bit codes into a 32-bit Morton
# key (the classic magic-number sequence, e.g. Hacker's Delight §7-2 /
# graphics.stanford.edu bithacks "Interleave bits by Binary Magic Numbers").
# Spark longs are signed 64-bit; 2x16 bits stays far below the sign bit.
_SPREAD: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

MORTON_BITS = 16  # per-dimension code width


def spread_bits(code: Column) -> Column:
    """Spread a 16-bit integer's bits to even positions (b_i -> bit 2i)."""
    x = code.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_key(x_code: Column, y_code: Column) -> Column:
    """Interleave two 16-bit bucket codes into one Z-order key.

    Callers produce the codes however fits the data: modulo buckets for IDs,
    range buckets for time, rank buckets for skewed continuous values. Equal
    code widths keep the curve balanced between the dimensions.
    """
    return spread_bits(x_code).bitwiseOR(F.shiftleft(spread_bits(y_code), 1))


def morton_sql(x_expr: str, y_expr: str) -> str:
    """The identical Morton key as ANSI SQL (the DuckDB oracle side).

    Generated from the same _SPREAD table so the two engines can never
    drift: ``morton_sql`` IS the specification ``morton_key`` is tested
    against.
    """

    def spread(e: str) -> str:
        x = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
):
    """Small-files compaction — the lake-maintenance pass every ingest-heavy
    table needs (streaming sinks and per-batch writers leave thousands of
    KB-sized files; at 100 TB the resulting file-listing and per-file task
    overhead dominate scans).

    Sizing comes from the actual on-disk footprint (filesystem listing, no
    data read), not row counts: output file count = ceil(total_bytes /
    target_file_bytes). ``sort_by`` optionally re-sorts while rewriting
    (e.g. a Z-order key from ``morton_key`` — compaction is the natural
    moment to fix layout, same as OPTIMIZE ... ZORDER BY), which uses a
    range repartition so files cover disjoint key ranges and parquet
    min/max footers prune; without it a round-robin repartition balances
    bytes evenly.

    Returns (n_files_before, n_files_after). At cluster scale this runs
    per partition directory (compact the partitions a day's ingest
    touched), which keeps each job's shuffle bounded.
    """
    import math
    import os

    # The overwrite write would delete the very files the lazy scan is
    # reading: refuse overlapping src/dst outright (same dir, dst nested
    # under src, or src nested under dst).
    src_real = os.path.realpath(src_dir)
    dst_real = os.path.realpath(dst_dir)
    if (
        dst_real == src_real
        or dst_real.startswith(src_real + os.sep)
        or src_real.startswith(dst_real + os.sep)
    ):
        raise ValueError(
            f"compact_parquet: dst_dir {dst_dir!r} overlaps src_dir {src_dir!r}; "
            "the overwrite would destroy the source mid-scan — write to a "
            "sibling directory and swap"
        )

    total = 0
    n_before = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n_before += 1
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst_dir)
    n_after = sum(
        1
        for root, _dirs, files in os.walk(dst_dir)
        for f in files
        if f.endswith(".parquet")
    )
    return n_before, n_after
