#!/usr/bin/env python
"""Same-session A/B/A for the in-memory-cache compression lever at sf10.

Run-1 vs run-2 of scripts/bench_sf10.py suggested uncompressed cached
batches (spark.sql.inMemoryColumnarStorage.compressed=false) cut q03 by
~40% and the events window by ~30% — but those were separate processes, and
this host's noise protocol (PROGRESS r3/r5) forbids cross-session A/B. This
script settles it in ONE session: warm the cache UNCOMPRESSED -> time all
four weak queries -> re-warm COMPRESSED -> time -> re-warm UNCOMPRESSED ->
time. The conf applies when the InMemoryRelation materializes, so each
re-warm really flips the storage format. Min-of-4 per block.

Prints ONE JSON line with the three blocks per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from make_sf10 import make_sf10  # noqa: E402

WEAK4 = (
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q_events_per_window",
)


def main() -> None:
    sf_dir = make_sf10(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10-fixture")

    from timing_explorer_spark.plans import all_queries
    from timing_explorer_spark.session import get_spark
    from timing_explorer_spark.sources.tables import warm_cache

    spark = get_spark(
        app_name="timing-explorer-spark-sf10-cache-ab",
        shuffle_partitions=32,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024)},
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.sparkContext.setLogLevel("WARN")

    specs = {n: s for n, s in all_queries().items() if n in WEAK4}

    def warm(compressed: bool) -> None:
        spark.conf.set(
            "spark.sql.inMemoryColumnarStorage.compressed",
            "true" if compressed else "false",
        )
        warm_cache(
            spark,
            sf_dir,
            tables=("region", "nation", "customer", "supplier", "orders", "lineitem", "events"),
            n_partitions=32,
            partition_counts={
                "region": 1, "nation": 1, "supplier": 2, "customer": 8, "events": 32,
            },
            partition_keys={
                "lineitem": "l_orderkey", "orders": "o_orderkey", "events": "user_id",
            },
            drop_columns={"events": ("props",)},
        )

    def block() -> dict[str, float]:
        plans = {n: s.build(spark, sf_dir) for n, s in specs.items()}
        for df in plans.values():  # materialize cache + codegen, untimed
            df.write.mode("overwrite").format("noop").save()
        out = {}
        for name, df in sorted(plans.items()):
            runs = []
            for _ in range(4):
                t0 = time.monotonic()
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.monotonic() - t0)
            out[name] = round(min(runs), 3)
        return out

    blocks = []
    for label, compressed in (("A_uncompressed", False), ("B_compressed", True), ("A2_uncompressed", False)):
        warm(compressed)
        blocks.append({"block": label, "times": block()})

    a1, b, a2 = (bl["times"] for bl in blocks)
    print(
        json.dumps(
            {
                "metric": "sf10_cache_compression_aba",
                "unit": "sec",
                "sf": 10.0,
                "blocks": blocks,
                "speedup_uncompressed_over_compressed": {
                    n: round(b[n] / min(a1[n], a2[n]), 2) for n in a1
                },
            }
        )
    )


if __name__ == "__main__":
    main()
