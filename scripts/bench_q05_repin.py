#!/usr/bin/env python
"""Re-pin q05 at sf0.1 (round-6 verdict task #5): same-session interleaved
A/B/A of the r5 size-tracked partition counts vs the r4-era uniform width.

The r5 driver bench moved q05 0.183 -> 0.210 s at sf0.1 while everything
else improved; hot spreads didn't overlap, so the judge flagged the
size-tracked partition-count change (dims 1-2, events 4) as the suspect.
This script warms the cache BOTH ways in one session and interleaves:

  A  = r5 counts (dims 1-2 partitions, events 4, facts 16 bucketed)
  B  = r4-era counts (uniform 16-way width, same bucketing)
  A2 = r5 counts again (drift witness)

min-of-6 per block per headline query. If B consistently beats A on q05
while A wins elsewhere, the fix is a per-query exception; if A >= B
everywhere, the r5 regression was the recorded run's host noise.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q_events_per_window",
)

R5_COUNTS = {
    "region": 1, "nation": 1, "supplier": 1, "customer": 2, "part": 2, "events": 4,
}
R4_COUNTS: dict[str, int] = {}  # uniform n_partitions=16 for every table


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import bench_session

    from timing_explorer_spark.plans import all_queries
    from timing_explorer_spark.sources.tables import warm_cache

    spark = bench_session("timing-explorer-spark-q05-repin")
    specs = {n: s for n, s in all_queries().items() if n in QUERIES}

    def warm(counts: dict[str, int]) -> None:
        warm_cache(
            spark,
            sf_dir,
            n_partitions=16,
            partition_counts=counts,
            partition_keys={
                "lineitem": "l_orderkey", "orders": "o_orderkey", "events": "user_id",
            },
            drop_columns={"events": ("props",)},
        )

    def block() -> dict[str, float]:
        plans = {n: s.build(spark, sf_dir) for n, s in specs.items()}
        for df in plans.values():
            df.write.mode("overwrite").format("noop").save()  # untimed warm-up
        out = {}
        for name, df in sorted(plans.items()):
            runs = []
            for _ in range(6):
                t0 = time.monotonic()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.monotonic() - t0)
            out[name] = round(min(runs), 3)
        return out

    blocks = []
    for label, counts in (("A_r5_sized", R5_COUNTS), ("B_r4_uniform", R4_COUNTS), ("A2_r5_sized", R5_COUNTS)):
        warm(counts)
        blocks.append({"block": label, "times": block()})

    a1, b, a2 = (bl["times"] for bl in blocks)
    print(
        json.dumps(
            {
                "metric": "q05_repin_partition_counts_aba",
                "unit": "sec",
                "sf": 0.1,
                "blocks": blocks,
                "r5_sized_over_r4_uniform": {
                    n: round(min(a1[n], a2[n]) / b[n], 2) for n in a1
                },
            }
        )
    )


if __name__ == "__main__":
    main()
