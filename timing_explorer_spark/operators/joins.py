"""Temporal join operators Spark lacks as builtins: as-of and interval joins.

Both are implemented as shuffle-once compositions of existing DataFrame ops
(the (a) strategy from the build rules — no UDFs, no cross joins):

  as-of     union the two sides, one window pass per key carrying the last
            right-side row forward — O(n log n) per key, single shuffle.
            (The naive alternative — join + filter + row_number — shuffles
            the full pair blow-up; the broadcast-range-join alternative only
            works when one side is small.)
  interval  equi-join on coarse time buckets (left side exploded to the
            neighbor buckets) + exact predicate — turns the inequality join
            into a linear bucketed shuffle, the standard range-join
            optimization (what Databricks' range-join hints do under the
            hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach one right row with the same key (`on`):

      direction='backward'  the most recent right row with right.ts <= left.ts
                            (default; ASOF LEFT JOIN / merge_asof semantics)
      direction='forward'   the next right row with right.ts >= left.ts
      direction='nearest'   whichever of the two is closer in time
                            (ties -> backward, like pandas merge_asof)

    ``tolerance_us``: maximum |left.ts - right.ts| in microseconds; matches
    further away are nulled out (merge_asof's tolerance). Left rows keep
    NULLs when no qualifying right row exists.

    Output: all left columns + asof_ts + right_cols prefixed 'asof_'.
    Single shuffle regardless of direction: both passes ride the same
    union + keyed-window ordering.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    lcols = left.columns
    payload = F.when(
        F.col("__side") == 1,
        F.struct(F.col(f"__r_{right_ts}").alias("ts"), *[F.col(f"__r_{c}").alias(c) for c in right_cols]),
    )
    l_tagged = left.select(
        F.lit(0).alias("__side"),
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__t"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).alias(f"__r_{c}") for c in (right_ts, *right_cols)],
    )
    r_tagged = right.select(
        F.lit(1).alias("__side"),
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__t"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in (right_ts, *right_cols)],
    )
    merged = l_tagged.unionByName(r_tagged)
    # Backward: right rows sort BEFORE left rows at equal timestamps
    # (__side desc) so a right row at exactly left.ts is visible (<=
    # semantics). Forward: ascending __side puts the equal-ts right row
    # AFTER the left row, inside the following frame (>= semantics). Both
    # windows share the (__key, __t) sort — one shuffle, one ordering.
    if direction in ("backward", "nearest"):
        w_b = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t"), F.col("__side").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = merged.withColumn("__carry_b", F.last(payload, ignorenulls=True).over(w_b))
    if direction in ("forward", "nearest"):
        w_f = (
            Window.partitionBy("__key")
            .orderBy(F.col("__t"), F.col("__side").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        merged = merged.withColumn("__carry_f", F.first(payload, ignorenulls=True).over(w_f))
    if direction == "backward":
        carry = F.col("__carry_b")
    elif direction == "forward":
        carry = F.col("__carry_f")
    else:
        d_b = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__carry_b.ts"))
        d_f = F.unix_micros(F.col("__carry_f.ts")) - F.unix_micros(F.col("__t"))
        carry = (
            F.when(F.col("__carry_b").isNull(), F.col("__carry_f"))
            .when(F.col("__carry_f").isNull(), F.col("__carry_b"))
            .when(d_b <= d_f, F.col("__carry_b"))
            .otherwise(F.col("__carry_f"))
        )
    if tolerance_us is not None:
        carry = F.when(
            F.abs(F.unix_micros(carry["ts"]) - F.unix_micros(F.col("__t"))) <= tolerance_us,
            carry,
        )
    merged = merged.withColumn("__carry", carry)
    return merged.where(F.col("__side") == 0).select(
        *[F.col(c) for c in lcols],
        F.col("__carry.ts").alias("asof_ts"),
        *[F.col(f"__carry.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def interval_pairs(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    id_col: str = "event_id",
    max_gap_seconds: int = 300,
) -> DataFrame:
    """All pairs of rows sharing `key` with |ts_a - ts_b| <= max_gap_seconds
    (id_a < id_b). Bucketed: side B keeps its own bucket; side A explodes to
    {bucket-1, bucket, bucket+1}, so each true pair meets exactly once in an
    equi-join on (key, bucket) and the exact predicate filters the rest —
    linear shuffle instead of a per-key cross join."""
    bucket = (F.unix_timestamp(F.col(ts)) / max_gap_seconds).cast("long")
    a = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_a"),
        F.col(ts).alias("ts_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bkt"),
    )
    b = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_b"),
        F.col(ts).alias("ts_b"),
        bucket.alias("bkt"),
    )
    # Exact micros for the predicate and the gap (unix_timestamp truncates to
    # whole seconds; fractional-second gaps must survive).
    gap_us = F.abs(F.unix_micros(F.col("ts_a")) - F.unix_micros(F.col("ts_b")))
    return (
        a.join(b, ["k", "bkt"])
        .where((F.col("id_a") < F.col("id_b")) & (gap_us <= max_gap_seconds * 1_000_000))
        .select(
            F.col("k").alias(key),
            "id_a",
            "id_b",
            (gap_us / F.lit(1_000_000.0)).alias("gap_seconds"),
        )
    )
