#!/usr/bin/env python
"""Interleaved HITS-vs-PageRank A/B on the link-graph skew fixture (r10
verdict task #4's measurement instrument).

Runs warm interleaved rounds of pagerank_directed and hits_fixed (5
iterations each) over the 500k-node / 6M-edge / 250,000x-hub fixture that
scripts/bench_linkgraph_skew.py synthesizes (run that first if the fixture
parquet is missing). Interleaving makes the RATIO host-drift-robust; per
the r10 measurements the per-session medians still span ~1.4-1.7x because
PageRank's shorter wall is proportionally noisier — report the full band,
never a single round. Results recorded in BENCH_sf1.json "hits_trim_r10".

Usage: python scripts/bench_hits_ab.py [--rounds N] [--fixture DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--fixture", default="/tmp/linkgraph-skew-fixture")
    args = ap.parse_args()

    from timing_explorer_spark.operators.dedup import release_cached
    from timing_explorer_spark.operators.graph import hits_fixed, pagerank_directed
    from timing_explorer_spark.session import get_spark

    spark = get_spark(
        app_name="hits-ab",
        # the 100 TB join shape: the rank table never fits a broadcast
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(args.fixture)

    def run(fn) -> float:
        release_cached()
        t0 = time.monotonic()
        fn(edges, iterations=5).write.mode("overwrite").format("noop").save()
        release_cached()
        return round(time.monotonic() - t0, 2)

    run(pagerank_directed)
    run(hits_fixed)  # warmup both paths
    rounds = []
    for _ in range(args.rounds):
        p = run(pagerank_directed)
        h = run(hits_fixed)
        rounds.append({"pagerank": p, "hits": h, "ratio": round(h / p, 2)})
    ratios = sorted(r["ratio"] for r in rounds)
    print(
        json.dumps(
            {
                "metric": "hits_vs_pagerank_ab",
                "rounds": rounds,
                "ratio_band": [ratios[0], ratios[-1]],
                "ratio_median": ratios[len(ratios) // 2],
            }
        )
    )


if __name__ == "__main__":
    main()
