"""Exact distributed heavy hitters: Misra-Gries candidates + exact recount.

The scalable two-pass design for "items with frequency >= phi * N" when the
key space is huge and Zipf-tailed (corpus vocabulary, URL hosts, user agents):

  pass 1  per-partition Misra-Gries summaries with k = ceil(1/phi) counters
          (Misra & Gries 1982, "Finding repeated elements"). If an item has
          global frequency >= phi*N, then in at least one partition its local
          frequency is >= phi * n_p (pigeonhole over N = sum n_p), and MG with
          k >= 1/phi counters retains every item of local frequency
          > n_p/(k+1) — so the UNION of per-partition candidate sets is a
          SUPERSET of the true heavy hitters. No shuffle of the long tail.
          The same pass also emits each partition's row count, so the global
          N (for the threshold) costs no extra scan.
  pass 2  exact recount of the candidates only: broadcast the candidate set
          (<= partitions * k rows), hash-semi-join the stream against it,
          then one tiny groupBy. The tail — the overwhelming bulk at 100 TB —
          is filtered map-side and never shuffles.

The final output is EXACT (the candidate superset is re-counted precisely and
filtered by the true threshold), so the operator is oracle-checkable against
a plain GROUP BY ... HAVING — unlike sketch-only heavy hitters whose counts
carry error. MG runs as an Arrow-batched mapInPandas over each partition
(per-partition state across batches in the generator); everything else stays
JVM-side.

Partitioning: the item stream is consumed AS-IS — no repartition here. The
superset guarantee is partitioning-independent, so any layout is correct;
the CALLER decides whether a rebalance is worth a shuffle. For derived
streams (explode of tokenized docs), repartition the compact upstream rows
(the docs) and explode after — spreading the exploded stream itself would
shuffle the entire corpus, exactly what this operator exists to avoid.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition_summaries(k: int, key_col: str):
    """mapInPandas generator: Misra-Gries summary with k counters over one
    partition's key stream (state persists across Arrow batches). Emits the
    surviving candidate keys once at end-of-partition, plus one marker row
    (key NULL, n_rows = partition row count) so the caller can reconstruct
    the global N without another pass over the data.

    Batched formulation (mergeable summaries, Agarwal et al. 2013): each Arrow
    batch is counted exactly with vectorized value_counts, merged into the
    running summary by counter addition, then pruned back to k counters by
    subtracting the (k+1)-th largest count from all and dropping non-positive
    ones — the MG merge rule, same n_p/(k+1) error bound as item-at-a-time MG,
    with the hot loop in C instead of a per-row Python dict walk."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for key, cnt in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {c: v - cut for c, v in counters.items() if v > cut}
        yield pd.DataFrame(
            {key_col: list(counters.keys()) + [None], "n_rows": [0] * len(counters) + [n_rows]}
        )

    return gen


def heavy_hitters(
    items: DataFrame,
    phi: float,
    key_col: str = "key",
    spread: int | None = None,
) -> DataFrame:
    """(key, freq) for every key with freq >= ceil(phi * count(items)).

    ``items`` is a one-column-of-interest DataFrame (one row per occurrence),
    consumed with its existing partitioning (see module docstring).
    ``spread``: optional explicit round-robin repartition width for the MG
    pass — only for callers whose stream is both compact and badly skewed
    across partitions; a rebalance cannot break correctness, only cost.
    """
    k = math.ceil(1.0 / phi)
    stream = items.select(F.col(key_col).cast("string").alias(key_col))
    if spread is not None:
        stream = stream.repartition(spread)
    # Persist the (tiny: partitions*(k+1) rows) summary table: it feeds BOTH
    # the candidate broadcast and the threshold broadcast, and without a
    # materialization boundary each broadcast would re-run the corpus-wide
    # MG scan. Same lifecycle as the dedup caches (release_cached()).
    from .dedup import track_cache

    summaries = track_cache(
        stream.mapInPandas(
            _mg_partition_summaries(k, key_col), schema=f"{key_col} string, n_rows long"
        )
    )
    candidates = summaries.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    total = summaries.select(F.sum("n_rows").alias("__total"))
    threshold = F.ceil(F.lit(phi) * F.col("__total")).cast("bigint")
    return (
        stream.join(F.broadcast(candidates), key_col, "leftsemi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .join(F.broadcast(total))
        .where(F.col("freq") >= threshold)
        .select(key_col, "freq")
    )
