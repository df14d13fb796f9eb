#!/usr/bin/env python
"""Re-pin the sf0.1 warm headline bench vs DuckDB-native with INTERLEAVED
same-session S/D/S/D blocks (round-7 verdict task #5).

Why: BENCH_r06 showed Spark's warm total drifting +7% vs r5 while DuckDB
native got 20% FASTER in the same artifact (ratio 0.75x -> 1.01x). The two
engines were timed in separate phases of one process there — still exposed
to host-state drift between phases. This script alternates whole engine
blocks within one session:

  S1 D1 S2 D2 S3 D3    (each block: per-query min over 4 hot runs)

and reports per-query and total bands across blocks for BOTH engines plus
the per-block ratio. If the ratio band is tight across the interleave, the
r6 drift was cross-phase host noise; if Spark's blocks are uniformly slower
than r5's 1.564 s while DuckDB holds, the regression is real and the commit
range r5..r6 is implicated.

Setup mirrors bench.py exactly: same session confs, same warm_cache sizing,
same prepared plans, same noop sink; DuckDB native tables, 32 threads.
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BLOCKS = 3
RUNS_PER_BLOCK = 4


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import bench_session

    from timing_explorer_spark.plans import all_queries
    from timing_explorer_spark.sources.tables import warm_cache
    from timing_explorer_spark.testing import duckdb_native_connection

    spark = bench_session("timing-explorer-spark-sd-repin")
    specs = {n: s for n, s in all_queries().items() if s.headline}

    warm_cache(
        spark,
        sf_dir,
        n_partitions=16,
        partition_counts={
            "region": 1, "nation": 1, "supplier": 1, "customer": 2,
            "part": 2, "events": 4,
        },
        partition_keys={
            "lineitem": "l_orderkey", "orders": "o_orderkey", "events": "user_id",
        },
        drop_columns={"events": ("props",)},
    )
    plans = {name: spec.build(spark, sf_dir) for name, spec in specs.items()}
    for df in plans.values():  # untimed codegen/JIT warm-up
        df.write.mode("overwrite").format("noop").save()

    con = duckdb_native_connection(sf_dir)
    con.execute("SET threads=32")
    for spec in specs.values():  # untimed DuckDB warm-up
        if spec.oracle:
            con.execute(spec.oracle).fetchall()

    def s_block() -> dict[str, float]:
        out = {}
        for name, df in sorted(plans.items()):
            df.write.mode("overwrite").format("noop").save()  # block warm-up
            runs = []
            for _ in range(RUNS_PER_BLOCK):
                t0 = time.monotonic()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.monotonic() - t0)
            out[name] = round(min(runs), 3)
        return out

    def d_block() -> dict[str, float]:
        out = {}
        for name, spec in sorted(specs.items()):
            if not spec.oracle:
                continue
            con.execute(spec.oracle).fetchall()  # block warm-up
            runs = []
            for _ in range(RUNS_PER_BLOCK):
                t0 = time.monotonic()
                con.execute(spec.oracle).fetchall()
                runs.append(time.monotonic() - t0)
            out[name] = round(min(runs), 3)
        return out

    s_blocks, d_blocks = [], []
    for _ in range(N_BLOCKS):
        s_blocks.append(s_block())
        d_blocks.append(d_block())

    def totals(blocks):
        return [round(sum(b.values()), 3) for b in blocks]

    s_tot, d_tot = totals(s_blocks), totals(d_blocks)
    ratios = [round(s / d, 3) for s, d in zip(s_tot, d_tot)]
    per_query = {
        name: {
            "spark": [b[name] for b in s_blocks],
            "duckdb_native": [b.get(name) for b in d_blocks],
        }
        for name in sorted(plans)
    }
    print(
        json.dumps(
            {
                "metric": "sf01_sd_interleaved_repin",
                "sf": os.path.basename(sf_dir.rstrip("/")).replace("sf", ""),
                "protocol": f"{N_BLOCKS}x interleaved S/D blocks, "
                            f"min of {RUNS_PER_BLOCK} hot runs per query per block",
                "spark_totals": s_tot,
                "duckdb_native_totals": d_tot,
                "ratio_per_block": ratios,
                "per_query": per_query,
                "r5_reference_total": 1.564,
                "r6_reference_total": 1.681,
            }
        )
    )


if __name__ == "__main__":
    main()
