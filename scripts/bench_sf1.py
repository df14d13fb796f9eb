#!/usr/bin/env python
"""Per-query Spark-vs-DuckDB crossover at sf1 (round-3 verdict directive #2).

At sf0.1 five headline queries are stage-floor-dominated (sub-0.3s absolute
against Spark's ~0.1s stage-launch floor) and individually exceed 2x DuckDB
even though their plans are the reviewed scale-safe ones. This script runs
exactly those five queries at 10x that scale (fixture from make_sf1.py, both
engines reading the SAME parquet), with the same methodology as bench.py
(untimed codegen pass, then per-query hot blocks, MIN of 4; DuckDB warm MIN
of 3 on the identical oracle SQL).

Prints ONE JSON line; the repo records it as BENCH_sf1.json.

Usage: python scripts/bench_sf1.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_sf1 import make_sf1  # noqa: E402

FLOOR_BOUND = (
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q_asof_join_last_click",
    "q_events_per_window",
)


def main() -> None:
    sf_dir = make_sf1(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-fixture")

    from bench import bench_session  # same confs as the recorded bench

    from timing_explorer_spark.plans import all_queries
    from timing_explorer_spark.sources.tables import warm_cache

    spark = bench_session("timing-explorer-spark-bench-sf1")
    # 10x the data of sf0.1 -> shuffle partitions scale with it (bench.py
    # uses 8 at sf0.1; re-measured 8/16/32 grid at sf1: 16 wins — enough
    # parallelism for the 6M-row scans without per-task launch overhead
    # dominating the reduced per-task work). The broadcast threshold drops
    # back to 8 MB: at sf1 the filtered orders side is ~20 MB, and
    # re-broadcasting 685k rows per execution loses to the co-partitioned
    # exchange-free ShuffledHashJoin the bucketed cache enables (measured:
    # q05 0.585→0.431s, q03 0.542→0.231s).
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
    specs = {n: s for n, s in all_queries().items() if n in FLOOR_BOUND}

    warm_cache(
        spark,
        sf_dir,
        tables=("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"),
        n_partitions=32,
        partition_keys={
            "lineitem": "l_orderkey",
            "orders": "o_orderkey",
            "events": "user_id",
        },
        drop_columns={"events": ("props",)},  # projection-aware cache (bench.py)
    )

    plans = {n: s.build(spark, sf_dir) for n, s in specs.items()}
    for df in plans.values():  # untimed codegen/JIT pass
        df.write.mode("overwrite").format("noop").save()
    timings: dict[str, float] = {}
    for name, df in sorted(plans.items()):
        df.write.mode("overwrite").format("noop").save()  # untimed block warm-up
        runs = []
        for _ in range(4):
            t0 = time.monotonic()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.monotonic() - t0)
        timings[name] = round(min(runs), 3)

    from timing_explorer_spark.testing import duckdb_connection

    con = duckdb_connection(sf_dir)
    duck: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        con.execute(spec.oracle).fetchall()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            con.execute(spec.oracle).fetchall()
            runs.append(time.monotonic() - t0)
        duck[name] = round(min(runs), 3)

    ratios = {n: round(timings[n] / duck[n], 2) for n in timings}
    print(
        json.dumps(
            {
                "metric": "sf1_crossover",
                "unit": "sec",
                "sf": 1.0,
                "note": "10x-tiled sf0.1 fixture (scripts/make_sf1.py); both engines read the same parquet",
                "spark": timings,
                "spark_total": round(sum(timings.values()), 3),
                "duckdb": duck,
                "duckdb_total": round(sum(duck.values()), 3),
                "ratio_spark_over_duckdb": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
