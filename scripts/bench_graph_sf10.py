#!/usr/bin/env python
"""Graph family at 10x scale — ~60M directed edges (r11 verdict task #3).

The link-graph loops (PageRank / components / HITS / BFS) carry a
"per-round localCheckpoint holds driver memory and lineage at depth"
claim proven so far at the 6M-edge skew-probe scale; the r9 failure mode
(lineage-induced driver OOM at default heap) was only ever OBSERVED at
default driver memory. This probe re-proves the fix at 10x data: a
10M-node / ~60M-edge directed graph (54M uniform edges, median out-degree
~5, plus the same 1.5M-degree mega-hub as bench_linkgraph_skew — the
power-law shape at sf10-equivalent edge count), run in a FOREIGN
SparkSession (plain builder, default confs apart from the UI needed for
stage profiling — NOT the engine's own get_spark) at the DEFAULT driver
heap, so a lineage or accumulator leak at depth would OOM here instead of
in a user's session.

Per op it records cold + warm wall seconds, the worst-stage task-skew
entry (max/median shuffle read via the REST taskSummary, the
bench_sf1_llm bound), rounds executed, and the driver JVM's used heap
after the op — the "no driver OOM, memory flat" evidence. Nonzero exit if
any MATERIAL skew violation appears (same floor logic as the hub probe,
scaled: the one-time adjacency build's hub out-list is deg x 8 B in one
task by construction).

Prints ONE JSON line; merged into BENCH_sf10.json as "graph_sf10".

Usage: python scripts/bench_graph_sf10.py
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

N_NODES = 10_000_000
N_UNIFORM = 54_000_000
HUB_DEG = 1_500_000
FIXTURE = "/tmp/graph-sf10-fixture"
# same materiality logic as bench_linkgraph_skew: the adjacency build
# necessarily concentrates the hub's out-list (~12 MB) in one task; a
# violation needs relative skew AND a straggler above this floor
MAX_TASK_READ_FLOOR = 32 * 1024 * 1024


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from timing_explorer_spark.operators.dedup import release_cached

    # FOREIGN session: plain builder, default confs except master + UI for
    # profiling and an 8g heap — the probe's point is that the loops
    # survive a session the engine did not tune. 8g is the regime where
    # the r9 lineage OOM was observed (the engine's own default), NOT the
    # 48g the sf10 relational bench grants itself; Spark's stock 1g is
    # excluded because 32 local threads sharing one 1g JVM cannot run ANY
    # 60M-row shuffle (32 x task buffers alone exceed it) — that failure
    # says nothing about lineage discipline.
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("graph-sf10-foreign")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    app = _app_id()

    n = F.lit(N_NODES)
    if not os.path.exists(f"{FIXTURE}/_SUCCESS"):
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
        (
            uniform.unionAll(hub_out)
            .unionAll(hub_in)
            .where(F.col("src") != F.col("dst"))
            .write.mode("overwrite")
            .parquet(FIXTURE)
        )
    edges = spark.read.parquet(FIXTURE)
    n_edges = edges.count()

    results: dict[str, dict] = {}
    violations: list[dict] = []
    bench_sf1_llm.MIN_STAGE_SHUFFLE = 4 * 1024 * 1024

    def used_heap_mb() -> int:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        return int((rt.totalMemory() - rt.freeMemory()) / (1024 * 1024))

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
        material = [
            k
            for k in skews
            if k["ratio"] > MAX_OVER_MEDIAN
            and k["max_task_shuffle_read"] > MAX_TASK_READ_FLOOR
        ]
        violations.extend({"op": name, **k} for k in material)
        results[name] = {
            "cold_sec": runs[0],
            "warm_sec": min(runs[1:]),
            "stages_profiled": len(skews),
            "worst_task_skew": worst,
            "driver_used_heap_mb_after": used_heap_mb(),
        }
        print(f"# {name}: cold {runs[0]}s warm {min(runs[1:])}s "
              f"heap {results[name]['driver_used_heap_mb_after']} MB",
              file=sys.stderr)

    def run_pagerank() -> None:
        from timing_explorer_spark.operators.graph import pagerank_directed

        pagerank_directed(edges, iterations=5).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_hits() -> None:
        from timing_explorer_spark.operators.graph import hits_fixed

        hits_fixed(edges, iterations=5).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_components() -> None:
        from timing_explorer_spark.operators.dedup import resolve_components

        # n_parts sized to the data per the operator's contract ("size to
        # the edge count at your scale"): 120M symmetrized edges / 256 ≈
        # 500k rows per task — 64 parts put ~2M-row sort/join buffers in
        # each of 32 concurrent tasks, the 32 MB humongous-allocation
        # pattern that fragmented the 8g G1 heap in the first probe run
        resolve_components(
            edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")),
            max_iters=60,
            n_parts=256,
        ).write.mode("overwrite").format("noop").save()

    def run_bfs() -> None:
        from timing_explorer_spark.operators.graph import bfs_depth

        seeds = spark.range(8).select(F.col("id").alias("doc"))
        bfs_depth(edges, seeds, max_hops=30).write.mode("overwrite").format(
            "noop"
        ).save()

    ops = {
        "pagerank_directed_5it": run_pagerank,
        "hits_5it": run_hits,
        "bfs_depth_from_hub": run_bfs,
        "link_components": run_components,
    }
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = only[0].split(",") if only else list(ops)
    for name in names:
        profiled(name, ops[name])

    out = {
        "metric": "graph_sf10_probe",
        "n_nodes": N_NODES,
        "n_edges": int(n_edges),
        "hub_degree": HUB_DEG,
        "driver_heap": "8g (the engine default / r9 OOM regime — not the sf10 bench's 48g)",
        "session": "foreign (plain builder, default confs + UI), fresh JVM per op",
        "skew_bound": MAX_OVER_MEDIAN,
        "max_task_read_floor_bytes": MAX_TASK_READ_FLOOR,
        "results": results,
        "violations": violations,
    }
    print(json.dumps(out))
    return 1 if violations else 0


def orchestrate() -> int:
    """Default entry: one FRESH JVM per op (the repo's fresh-process bench
    doctrine — finished ops' lingering checkpoint/cache blocks otherwise
    make an 8g session marginal for the NEXT op even though every op fits
    alone: measured here as a non-deterministic back-to-back OOM). Each
    worker prints one JSON line; the parent merges them."""
    import subprocess

    merged: dict | None = None
    for op in (
        "pagerank_directed_5it",
        "hits_5it",
        "bfs_depth_from_hub",
        "link_components",
    ):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), op, "--worker"],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if r.returncode != 0 and not r.stdout.strip():
            raise RuntimeError(f"worker {op} died: {r.stderr[-2000:]}")
        d = json.loads(r.stdout.strip().splitlines()[-1])
        if merged is None:
            merged = d
        else:
            merged["results"].update(d["results"])
            merged["violations"].extend(d["violations"])
        print(f"# {op} done", file=sys.stderr)
    print(json.dumps(merged))
    return 1 if merged["violations"] else 0


if __name__ == "__main__":
    sys.exit(main() if "--worker" in sys.argv else orchestrate())
