"""Data-proportional stage widths (optimization guide §2: make partition
counts scale-adaptive — derived from input size — instead of constants tuned
for either local mode or one cluster shape).

Several CPU-heavy, byte-light stages (shingling, Misra-Gries passes, the
Jaccard pair blow-up) spread their compact input over ``defaultParallelism``
partitions so every core works. That is the right width once the data is big
enough — but for a small input it is pure overhead: at sf0.1 the whole
shingle index is under 2 MB, and 32 tasks x several stages of scheduling
(plus one Python worker per partition for Arrow-batched stages) made those
queries SLOWER at 32 cores than at 8 (inverse core scaling, measured r12).

``plan_size_bytes`` reads Catalyst's plan-time size estimate — file sizes
for parquet scans, materialized bytes for cached relations — for free, with
no job. ``adaptive_width`` turns it into a task count: one task per
``bytes_per_task`` of input, floored at 2 (never a single-task path) and
capped at the core count. At corpus scale stats >> cores, so the width is
exactly ``defaultParallelism`` — behavior at 100 TB is unchanged; only
small inputs stop paying for idle width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's plan-time sizeInBytes estimate for ``df``, or None when
    it is unavailable or a sentinel (<=0, or absurdly large — Catalyst uses
    huge defaults for plans it cannot estimate)."""
    try:
        v = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — a stats probe must never fail a plan
        return None
    if v <= 0 or v > (1 << 50):
        return None
    return v


def cache_if_bounded(
    df: DataFrame, cap_bytes: int = 1 << 30, materialize: bool = False
) -> DataFrame:
    """track_cache ``df`` only when its plan-time size estimate is known AND
    under ``cap_bytes`` — the scale-adaptive persist (r13, guide §5: caching
    is only worth it when recomputing costs more than the memory pressure it
    creates). A corpus-grain intermediate that fits comfortably at bench
    scale would be cache-sized-like-the-corpus at 100 TB: MEMORY_AND_DISK
    would spill the whole thing to disk, costing a full write+read of the
    corpus to save one recompute. Above the cap (or when stats are
    unavailable) the frame is returned un-persisted and each consumer
    recomputes — the cheaper trade at scale. Results are identical either
    way; only materialization strategy changes."""
    from .dedup import track_cache

    b = plan_size_bytes(df)
    if b is not None and b <= cap_bytes:
        return track_cache(df, materialize=materialize)
    return df


def adaptive_width(
    df: DataFrame, bytes_per_task: int = 256 << 10, floor: int = 2
) -> int:
    """Partition count for a CPU-heavy stage over ``df``: ~``bytes_per_task``
    of plan-time input bytes per task, clamped to [floor, defaultParallelism].
    Falls back to full core width when stats are unavailable (never narrows
    blindly)."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    b = plan_size_bytes(df)
    if b is None:
        return cores
    return max(floor, min(cores, -(-b // bytes_per_task)))
