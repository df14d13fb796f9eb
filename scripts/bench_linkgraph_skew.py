#!/usr/bin/env python
"""Link-graph ops under POWER-LAW skew (r9 verdict task #4).

The sf1 LLM probe bounds task skew on the tiled document corpus, but real
link graphs are power-law: a handful of hub pages carry orders of magnitude
more edges than the median page. This probe synthesizes a directed graph
with that shape DETERMINISTICALLY — 500k nodes, ~3M uniform edges (median
out-degree ~6) plus ONE mega-hub with 1.5M out-edges and 1.5M in-edges
(~250,000x the median degree, far past the verdict's 1000x bar) — and runs
the directed-PageRank loop and weakly-connected-components on it with the
same REST task-skew bound as bench_sf1_llm (max task shuffle-read <= 4x
median on every stage with meaningful shuffle).

Why the bound holds by DESIGN, not luck (r9: pagerank_directed moved to
GraphX-style sender-side adjacency messaging after this probe caught the
edge-join shape at 5-7.6x):

  - the per-round join is adjacency ⋈ ranks with exactly ONE row per key
    on each side — an out-degree hub cannot skew a join in which it is a
    single row; the probe forces the 100 TB join shape (no auto-broadcast
    of the rank table — at real scale it never fits);
  - the per-round rank aggregate (groupBy(dst).sum) absorbs in-degree skew
    in the map-side partial sum: the hub's 1.5M contribution rows collapse
    to one partial row per map task before the shuffle;
  - the ONE-TIME adjacency build necessarily concentrates each hub's
    out-list (deg x 8 B) in one task — see MAX_TASK_READ_FLOOR below for
    why that is bounded and immaterial in the link-graph domain;
  - min-label components propagate through the same shapes.

Prints ONE JSON line; merged into BENCH_sf1.json as "link_graph_skew".
Nonzero exit if any profiled stage violates the bound.

Usage: python scripts/bench_linkgraph_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_sf1_llm  # noqa: E402
from bench_sf1_llm import (  # noqa: E402
    MAX_OVER_MEDIAN,
    UI_PORT,
    _app_id,
    _completed_stages,
    _stage_task_skew,
)

N_NODES = 500_000
N_UNIFORM = 3_000_000
HUB_DEG = 1_500_000  # one mega-hub, both directions

# A violation needs RELATIVE skew (>4x median, the sf1-llm bound) AND a
# MATERIAL straggler (max task read above this floor — a 12 MB task is
# ~100 ms regardless of distribution). The one legitimately concentrated
# stage is the ONE-TIME adjacency build: a hub's out-list is deg x 8 B in
# a single task by definition of materializing the list — 12 MB at this
# fixture's deliberately absurd 250,000x hub, while real out-degrees are
# page-bounded (in-degree is where web power laws live, and in-degree
# never materializes as an array in this dataflow). Every RECURRING
# (per-round) stage must stay under the relative bound outright, which the
# 1 MB profiling floor below makes visible instead of filtering away.
# Floor sized to the documented ~12 MB expected concentrated task plus
# ~33% headroom for shuffle framing/compression variance (ADVICE r10 —
# the earlier 32 MB masked up to 2.7x the expected size).
MAX_TASK_READ_FLOOR = 16 * 1024 * 1024


def main() -> int:
    from pyspark.sql import functions as F

    from timing_explorer_spark.operators.dedup import release_cached
    from timing_explorer_spark.session import get_spark

    spark = get_spark(
        app_name="timing-explorer-spark-linkgraph-skew",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "2000",
            # the 100 TB join shape: the rank table never fits a broadcast
            # at real scale, so the probe must exercise the shuffled join
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # AQE skew-join split sized to this fixture (see module doc)
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # split sizes sized to this fixture's ~1.5 MB median task read
            # (split chunks land at ~advisory size, so the bound needs
            # advisory within ~2x of the median; production keeps the
            # 256 MB-class defaults with proportionally larger tasks)
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.sparkContext.setLogLevel("WARN")
    app = _app_id()

    n = F.lit(N_NODES)
    uniform = spark.range(N_UNIFORM).select(
        F.pmod(F.xxhash64("id", F.lit(1)), n).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(2)), n).alias("dst"),
    )
    hub_out = spark.range(HUB_DEG).select(
        F.lit(0).cast("long").alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(3)), n - 1) + 1).alias("dst"),
    )
    hub_in = spark.range(HUB_DEG).select(
        (F.pmod(F.xxhash64("id", F.lit(4)), n - 1) + 1).alias("src"),
        F.lit(0).cast("long").alias("dst"),
    )
    edges = (
        uniform.unionAll(hub_out)
        .unionAll(hub_in)
        .where(F.col("src") != F.col("dst"))
    )
    # land the fixture as parquet so every op reads the same scan (and the
    # synthesis cost stays out of the timed region)
    fixture = "/tmp/linkgraph-skew-fixture"
    if not os.path.exists(f"{fixture}/_SUCCESS"):
        edges.write.mode("overwrite").parquet(fixture)
    edges = spark.read.parquet(fixture)
    n_edges = edges.count()

    results: dict[str, dict] = {}
    violations: list[dict] = []

    # profile down to 1 MB stage shuffle so the (uniform) per-round stages
    # are DEMONSTRABLY in-bound rather than filtered out as trivial
    bench_sf1_llm.MIN_STAGE_SHUFFLE = 1 * 1024 * 1024

    def profiled(name: str, run) -> None:
        release_cached()
        seen = {(s["stageId"], s["attemptId"]) for s in _completed_stages(app)}
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            run()
            runs.append(round(time.monotonic() - t0, 3))
            release_cached()
        stages = _completed_stages(app)
        new = [s for s in stages if (s["stageId"], s["attemptId"]) not in seen]
        skews = [k for s in new if (k := _stage_task_skew(app, s))]
        worst = max(skews, key=lambda k: k["ratio"], default=None)
        over_relative = [k for k in skews if k["ratio"] > MAX_OVER_MEDIAN]
        material = [
            k
            for k in over_relative
            if k["max_task_shuffle_read"] > MAX_TASK_READ_FLOOR
        ]
        violations.extend({"op": name, **k} for k in material)
        results[name] = {
            "cold_sec": runs[0],
            "warm_sec": min(runs[1:]),
            "stages_profiled": len(skews),
            "worst_task_skew": worst,
            # full transparency: relative-bound exceedances that fall under
            # the materiality floor (the one-time adjacency build lands
            # here by design — see module constants). ONLY the sub-floor
            # subset (ADVICE r10): material ones are in `violations`.
            "immaterial_relative_exceedances": [
                k
                for k in over_relative
                if k["max_task_shuffle_read"] <= MAX_TASK_READ_FLOOR
            ],
        }

    def run_pagerank() -> None:
        from timing_explorer_spark.operators.graph import pagerank_directed

        pagerank_directed(edges, iterations=5).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_components() -> None:
        from timing_explorer_spark.operators.dedup import resolve_components

        resolve_components(
            edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")),
            n_parts=32,
        ).write.mode("overwrite").format("noop").save()

    def run_hits() -> None:
        from timing_explorer_spark.operators.graph import hits_fixed

        hits_fixed(edges, iterations=5).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_bfs() -> None:
        # r10 verdict task #3: the BFS loop under the same hub. Seeding AT
        # the hub forces the worst case — round 1 joins the hub's 1.5M-dst
        # adjacency row (one task by construction, ~12 MB — the same
        # bounded concentration as the adjacency build) and the min-agg
        # absorbs the 1.5M candidate rows map-side.
        from timing_explorer_spark.operators.graph import bfs_depth

        seeds = spark.range(8).select(F.col("id").alias("doc"))
        bfs_depth(edges, seeds, max_hops=30).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_anchor_terms() -> None:
        # r10 verdict task #3: the anchor-corpus build's (dst_url, term)
        # aggregate, in-degree-skewed by construction (the hub's dst_url
        # receives 1.5M mentions). Same dataflow tail as q_anchor_terms:
        # explode terms, groupBy(dst_url, term) with count +
        # count_distinct(src) — the distinct goes through Spark's two-phase
        # (key+src) expand, so the hub key spreads over src before the
        # final aggregate; plain counts collapse in map-side partials.
        vocab = F.array(*[F.lit(w) for w in
                          ("click", "here", "best", "cheap", "official",
                           "home", "page", "link")])
        pairs = edges.select(
            F.col("src").alias("doc_id"),
            F.concat(
                F.lit("https://example.com/doc/"), F.col("dst").cast("string")
            ).alias("dst_url"),
            F.concat_ws(
                " ",
                F.element_at(vocab, (F.pmod(F.xxhash64("src", "dst"), F.lit(8)) + 1).cast("int")),
                F.element_at(vocab, (F.pmod(F.xxhash64("dst", "src"), F.lit(8)) + 1).cast("int")),
            ).alias("anchor"),
        )
        terms = pairs.select(
            "doc_id",
            "dst_url",
            F.explode(F.split(F.lower(F.trim(F.col("anchor"))), r"\s+")).alias(
                "term"
            ),
        ).where(F.length("term") > 0)
        terms.groupBy("dst_url", "term").agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.count_distinct("doc_id").alias("n_src_docs"),
        ).write.mode("overwrite").format("noop").save()

    def run_host_capped_sample() -> None:
        # r11 verdict task #2: the per-host anti-domination cap under the
        # hub. (doc, host) membership from the edge fixture (host = dst —
        # the hub host has 1.5M distinct member docs, the claimed "bounded
        # by host doc count" concentration this probe now MEASURES). The
        # q_host_capped_sample shape verbatim: distinct membership, Knuth
        # hash order, host-PARTITIONED ROW_NUMBER <= 40. Spark's
        # WindowGroupLimit pushes the rank filter into a PARTIAL pre-shuffle
        # pass, so the hub partition's shuffle read is ~cap x map-tasks
        # rows, not 1.5M — the probe verifies that, not just asserts it.
        from pyspark.sql import Window

        members = (
            edges.select(
                F.col("src").alias("doc_id"), F.col("dst").alias("host")
            )
            .distinct()
        )
        keyed = members.select(
            "doc_id",
            "host",
            F.pmod(
                F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)
            ).alias("hkey"),
        )
        rn = F.row_number().over(
            Window.partitionBy("host").orderBy("hkey", "doc_id")
        )
        keyed.withColumn("rn", rn).where(F.col("rn") <= 40).write.mode(
            "overwrite"
        ).format("noop").save()

    def run_budget_sampled_approx() -> None:
        # r11 verdict task #2: the scale-safe row-emitting budget sampler
        # (q_budget_sampled_corpus_approx's dataflow) over hub-skewed
        # PageRank ranks — approx-percentile bucket thresholds (three 1-row
        # sketch aggregates), 3-row rate broadcast, map-only keep filter.
        # The hub's extreme rank lands in bucket 1 like any other row; the
        # probe confirms no stage concentrates.
        from timing_explorer_spark.operators.graph import pagerank_directed
        from timing_explorer_spark.plans.text_pipeline import (
            _budget_rates_parallel,
            _hash_threshold_sample,
            approx_ntile3_buckets,
        )

        ranks = pagerank_directed(edges, iterations=2).localCheckpoint()
        tokens = ranks.select(
            F.col("doc").alias("doc_id"),
            (200 + F.pmod(F.xxhash64("doc", F.lit(9)), F.lit(800))).alias(
                "n_tokens"
            ),
        )
        scored = approx_ntile3_buckets(ranks, tokens).localCheckpoint()
        rates = _budget_rates_parallel(scored).select("bucket", "sample_rate")
        _hash_threshold_sample(scored, rates).write.mode("overwrite").format(
            "noop"
        ).save()

    profiled("pagerank_directed_5it", run_pagerank)
    profiled("link_components", run_components)
    profiled("hits_5it", run_hits)
    profiled("bfs_depth_from_hub", run_bfs)
    profiled("anchor_terms_build", run_anchor_terms)
    profiled("host_capped_sample", run_host_capped_sample)
    profiled("budget_sampled_approx", run_budget_sampled_approx)

    out = {
        "metric": "link_graph_skew_probe",
        "n_nodes": N_NODES,
        "n_edges": int(n_edges),
        "hub_degree": HUB_DEG,
        "median_out_degree": 6,
        "hub_over_median": HUB_DEG // 6,
        "skew_bound": MAX_OVER_MEDIAN,
        "results": results,
        "violations": violations,
    }
    print(json.dumps(out))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
