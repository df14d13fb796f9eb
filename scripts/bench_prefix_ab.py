#!/usr/bin/env python
"""Same-session micro A/B for the r13 single-exchange prefix scan: the r12
two-exchange shape (range by order cols + window hash re-shuffle on the
opaque spark_partition_id) vs the r13 bucketed single-exchange shape —
alternating executions of both plans in one bench session (host drift hits
both sides equally).

Usage: python scripts/bench_prefix_ab.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_running_total(df, order_cols, value_col, alias="running_total",
                      n_parts=None, total_alias=None):
    """The pre-r13 two-exchange implementation, verbatim (reference side)."""
    spark = df.sparkSession
    n = n_parts or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(
        n, *[F.col(c) for c in order_cols]
    ).withColumn("__pid", F.spark_partition_id())
    totals = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__ptotal"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    cols = [
        F.col("__pid"),
        F.coalesce(F.sum("__ptotal").over(w), F.lit(0)).alias("__offset"),
    ]
    if total_alias:
        w_all = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cols.append(F.sum("__ptotal").over(w_all).alias("__total"))
    offsets = totals.select(*cols)
    staged = ranged.join(F.broadcast(offsets), "__pid")
    local_w = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    extra = [F.col("__total").alias(total_alias)] if total_alias else []
    return staged.select(
        *df.columns,
        (F.sum(value_col).over(local_w) + F.col("__offset")).alias(alias),
        *extra,
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 6
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])

    from bench import bench_session
    from timing_explorer_spark.operators.prefix import running_total
    from timing_explorer_spark.sources.tables import load

    spark = bench_session("bench-prefix-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # the q_concurrent_events core: sweep-line deltas over event bounds
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(F.col("ts").alias("t")).agg(F.sum(F.lit(1)).alias("d"))
    # the q_pareto_revenue core: per-customer units, desc cumulative share
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_extendedprice") * 100).cast("bigint").alias("units"),
    )
    spend = li.groupBy("k").agg(F.sum("units").alias("u")).select(
        "k", "u", (-F.col("u")).alias("neg")
    )

    plans = {
        "events_new": running_total(agg, ["t"], "d", alias="c", shape="bucketed"),
        "events_old": old_running_total(agg, ["t"], "d", alias="c"),
        "pareto_new": running_total(spend, ["neg", "k"], "u", alias="cum", total_alias="t", shape="bucketed"),
        "pareto_old": old_running_total(spend, ["neg", "k"], "u", alias="cum", total_alias="t"),
    }
    times: dict[str, list[float]] = {k: [] for k in plans}
    for name, df in plans.items():
        spark.sparkContext.setJobDescription(f"prefix-ab warmup {name}")
        df.write.mode("overwrite").format("noop").save()
    for _ in range(reps):
        for name, df in plans.items():
            spark.sparkContext.setJobDescription(f"prefix-ab {name}")
            t0 = time.monotonic()
            df.write.mode("overwrite").format("noop").save()
            times[name].append(round(time.monotonic() - t0, 4))
    # exactness witness: new == old, bit for bit
    chk = {}
    for base in ("events", "pareto"):
        a = sorted(map(tuple, plans[f"{base}_new"].collect()))
        b = sorted(map(tuple, plans[f"{base}_old"].collect()))
        chk[base] = a == b
    print(json.dumps({
        "sf_dir": sf_dir,
        "mins": {k: min(v) for k, v in times.items()},
        "identical": chk,
        "all": times,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
