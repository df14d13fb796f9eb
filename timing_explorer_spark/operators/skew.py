"""Skew and co-location tools for joins at 100 TB.

Three mechanisms, in escalation order:

  1. AQE skew-join splitting — on by default in this engine's sessions
     (session.py: spark.sql.adaptive.skewJoin.enabled). Handles skew the
     optimizer can SEE (post-shuffle partition sizes).
  2. Salted join (here) — for the skew AQE cannot fix: a hot key on the
     *build* side of a non-broadcastable join, or aggregations over a hot
     key. Salting splits each hot key into ``n_salts`` synthetic sub-keys:
     the skewed side gets a random salt per row, the other side is exploded
     across all salts (replicated n_salts times for the hot keys only).
  3. Bucketed tables (here) — pre-shuffle both fact tables once into the
     same bucket layout; every future equi-join on the bucket key is then
     shuffle-free (co-located). This is the 100 TB answer for repeated
     lineitem⋈orders-style joins: pay the shuffle once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join with hot-key salting.

    ``left`` is the skewed (large, hot-keyed) side: each row gets a random
    salt in [0, n_salts). ``right`` is replicated: hot-key rows are exploded
    across every salt; non-hot rows keep salt 0 and left's non-hot rows are
    forced to salt 0 too, so replication cost is paid ONLY for hot keys.

    ``hot_keys``: one-column DataFrame of keys to salt (broadcast). If None,
    every key is treated as hot (full n_salts replication of ``right`` —
    correct, but only acceptable when ``right`` is small).

    Result == left.join(right, on, how) exactly for how in {'inner', 'left',
    'left_semi', 'left_anti'}; only the physical distribution differs.
    Right/full outer joins are rejected: an unmatched hot-key right row is
    replicated once per salt, so the null-extended side would carry n_salts
    duplicates. Salt the other input instead (swap sides + use 'left').
    Salting column names are internal (__salt).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — right/full outer would "
            f"duplicate unmatched hot-key right rows n_salts times; "
            f"allowed: inner/left/left_semi/left_anti"
        )
    if hot_keys is not None:
        hot = F.broadcast(hot_keys.select(F.col(hot_keys.columns[0]).alias("__hot_key")))
        left = left.join(hot, left[on] == F.col("__hot_key"), "left").withColumn(
            "__salt",
            F.when(
                F.col("__hot_key").isNotNull(),
                (F.rand(seed=42) * n_salts).cast("int"),
            ).otherwise(F.lit(0)),
        ).drop("__hot_key")
        right = right.join(hot, right[on] == F.col("__hot_key"), "left").withColumn(
            "__salts",
            F.when(
                F.col("__hot_key").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        ).drop("__hot_key")
    else:
        left = left.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
        right = right.withColumn("__salts", F.sequence(F.lit(0), F.lit(n_salts - 1)))
    right = right.withColumn("__salt", F.explode("__salts")).drop("__salts")
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")


def top_keys(df: DataFrame, on: str, min_count: int) -> DataFrame:
    """Identify hot keys (count > min_count) — the input to salted_join.
    One aggregation over the key column only (column-pruned scan)."""
    return (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > min_count)
        .select(on)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table: hash-partitioned into
    ``n_buckets`` files per partition by ``bucket_col`` (optionally sorted
    within buckets). Joins/aggregations between tables bucketed identically
    on the join key skip the shuffle entirely — verified by plan assertion in
    tests/test_skew_bucketing.py."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planned as
    a shuffle-free sort-merge join (no Exchange on either side)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys.

    Phase 1 groups by (keys..., random salt) — the hot key's rows split
    across n_salts reducers; phase 2 merges the per-salt partials by the
    real keys (tiny input: n_groups * n_salts rows). ``aggs`` maps column →
    one of sum/count/min/max (the mergeable aggregates where
    merge(partials) == agg(all)).

    Spark's hash aggregation already does map-side partial combine, which
    handles most skew; salting matters when per-key state is too big for one
    reducer even AFTER combine (e.g. count-distinct-style payloads) or when
    a downstream stage must stay keyed by the hot key. Kept deliberately
    API-compatible with a plain groupBy().agg() so it's a drop-in swap.
    """
    # COUNT counts NON-NULL values of the named column (matching
    # groupBy().agg() COUNT(col) — the drop-in-swap claim), not group rows.
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": lambda c: F.count(F.col(c)), "min": F.min, "max": F.max}
    for how in aggs.values():
        if how not in merge_fn:
            raise ValueError(f"salted_agg: unsupported agg {how!r} (mergeable only)")
    salted = df.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first_fn[how](c).alias(f"__p_{c}_{how}") for c, how in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[how](f"__p_{c}_{how}").alias(f"{how}_{c}") for c, how in aggs.items()]
    )
