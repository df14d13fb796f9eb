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
    # The broadcast threshold drops back to 8 MB: at sf1 the filtered
    # orders side is ~20 MB, and re-broadcasting 685k rows per execution
    # loses to the co-partitioned exchange-free ShuffledHashJoin the
    # bucketed cache enables (measured: q05 0.585->0.431s, q03 0.542->0.231s).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
    specs = {n: s for n, s in all_queries().items() if n in FLOOR_BOUND}

    # Partition counts track TABLE SIZE (r5 grid, min-of-5 hot blocks):
    # every task costs ~3-5 ms of scheduling before any work, so the 1M-row
    # events table wants 8 partitions (32 -> 8 measured 0.247 -> 0.084 s on
    # the window query: 31k rows/task is sub-ms of work per ~4 ms of
    # floor), while the 6M-row lineitem scans still win with full 32-way
    # width (q01 0.34 s at 8 partitions vs 0.17 s at 32). The DIMENSIONS
    # matter just as much: every broadcast-hash-join build re-scans its
    # cached dim per execution, so a 5-row region cached across 32
    # partitions pays 32 task launches per build — the q05 stage profile
    # showed 4 such 32-task broadcast builds ahead of the single fused map
    # stage (~0.1 s of pure launch cost; sizing dims to 1-8 partitions
    # measured q05 0.48 -> 0.37 s). Deployment analog: the 128 MB
    # split-size rule - never one global constant.
    warm_cache(
        spark,
        sf_dir,
        tables=("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"),
        n_partitions=32,
        partition_counts={
            "region": 1,
            "nation": 1,
            "supplier": 2,
            "customer": 8,
            "part": 8,
            "events": 8,
        },
        partition_keys={
            "lineitem": "l_orderkey",
            "orders": "o_orderkey",
            "events": "user_id",
        },
        drop_columns={"events": ("props",)},  # projection-aware cache (bench.py)
    )

    # Per-query shuffle width - the same sizing rule on the REDUCE side:
    # post-partial-agg exchanges carry tiny row counts, so fewer reduce
    # tasks = less floor (grid: q01/q03/q05 best at 8, the events window
    # at 4; the asof join keeps 16 - its per-user carry-forward window
    # does real reduce-side work).
    shuffle_width = {
        "q01_pricing_summary": 8,
        "q03_shipping_priority": 8,
        "q05_local_supplier_volume": 8,
        "q_asof_join_last_click": 16,
        "q_events_per_window": 4,
    }

    plans = {n: s.build(spark, sf_dir) for n, s in specs.items()}
    for name, df in plans.items():  # untimed codegen/JIT pass
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_width[name]))
        df.write.mode("overwrite").format("noop").save()
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, df in sorted(plans.items()):
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_width[name]))
        df.write.mode("overwrite").format("noop").save()  # untimed block warm-up
        runs = []
        # 6 hot runs (was 4): at 0.1-0.5 s absolutes this host's co-tenant
        # noise swings +-30%; min-of-6 tightens the band (PROGRESS r3/r4)
        for _ in range(6):
            t0 = time.monotonic()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.monotonic() - t0)
        timings[name] = round(min(runs), 3)
        # [min, max] hot band — the co-tenant-noise witness (bench.py
        # queries_hot_spread convention): a wide band means the host moved,
        # not the plan; never compare cross-round without it
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    # The measured SCHEDULING FLOOR: a trivial 2-stage job (32 map + 8
    # reduce tasks over a cached 32-partition, 32-row table - the same task
    # shape as q01/q03 with no per-row work at all). Whatever this costs is
    # pure local-mode task/stage launch overhead; a query at the floor has
    # no plan-side headroom left. On a cluster the floor is paid once per
    # stage regardless of data volume, so it amortizes to noise at 100 TB -
    # DuckDB's morsel scheduler has no equivalent fixed cost, which is why
    # sub-second local ratios overstate the per-core gap.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    from pyspark.sql import functions as F

    tiny = spark.range(0, 32, 1, 32).persist()
    tiny.count()
    floor_df = tiny.groupBy((F.col("id") % 4).alias("g")).count()
    floor_df.write.mode("overwrite").format("noop").save()
    floor_runs = []
    for _ in range(5):
        t0 = time.monotonic()
        floor_df.write.mode("overwrite").format("noop").save()
        floor_runs.append(time.monotonic() - t0)
    floor_sec = round(min(floor_runs), 3)
    tiny.unpersist()

    from timing_explorer_spark.testing import (
        duckdb_connection,
        duckdb_native_connection,
    )

    def time_duckdb(con) -> dict[str, float]:
        out: dict[str, float] = {}
        for name, spec in sorted(specs.items()):
            con.execute(spec.oracle).fetchall()  # warm-up
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                con.execute(spec.oracle).fetchall()
                runs.append(time.monotonic() - t0)
            out[name] = round(min(runs), 3)
        return out

    # two comparator columns (r4 verdict task #2): parquet views (storage
    # re-decoded per run) and native CREATE TABLE AS tables (the
    # resident-engine analog of our pinned cache — the 2x gate's column)
    duck = time_duckdb(duckdb_connection(sf_dir))
    duck_native = time_duckdb(duckdb_native_connection(sf_dir))

    ratios = {n: round(timings[n] / duck[n], 2) for n in timings}
    ratios_native = {n: round(timings[n] / duck_native[n], 2) for n in timings}
    # marginal = (query - scheduling floor) / duckdb_native: the per-row
    # work ratio once the fixed local-mode task-launch cost (which a
    # cluster amortizes per stage, not per GB) is subtracted
    marginal = {
        n: round(max(timings[n] - floor_sec, 0.0) / duck_native[n], 2) for n in timings
    }
    print(
        json.dumps(
            {
                "metric": "sf1_crossover",
                "unit": "sec",
                "sf": 1.0,
                "note": "10x-tiled sf0.1 fixture (scripts/make_sf1.py); spark+duckdb read the same parquet, duckdb_native loads it as native tables first",
                "spark": timings,
                "spark_hot_spread": spread,
                "spark_total": round(sum(timings.values()), 3),
                "scheduling_floor_sec": floor_sec,
                "duckdb": duck,
                "duckdb_total": round(sum(duck.values()), 3),
                "duckdb_native": duck_native,
                "duckdb_native_total": round(sum(duck_native.values()), 3),
                "ratio_spark_over_duckdb": ratios,
                "ratio_spark_over_duckdb_native": ratios_native,
                "ratio_marginal_over_duckdb_native": marginal,
            }
        )
    )


if __name__ == "__main__":
    main()
