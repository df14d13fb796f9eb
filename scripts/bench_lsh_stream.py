#!/usr/bin/env python
"""Streaming-LSH dedup throughput probe (round 7, protocol v3 in round 10):
docs/s of minhash_dedup_stream in default (all-JVM
dropDuplicatesWithinWatermark) vs verify mode (TWS signature store) at the
default operating point (num_perm=64, bands=16), on the same corpus.

Fixture: sf0.1 documents replicated REPLICAS x with fresh ids + 1-second
ts spacing, landed as N_FILES parquet files, drained availableNow with
FILES_PER_TRIGGER files per micro-batch. The number that matters at
100 TB/day is docs/s per core and the default/verify ratio — the price
of the precision layer. In the state-only regimes verdicts_emitted is 0
BY DESIGN: the watermark horizon exceeds the fixture's time span, so no
verdict window seals during the drain — the measured work is the
signature + banding + stateful dedup stages, which is the ingest hot
path.

PROTOCOL NOTE (r10): every timed drain runs in a FRESH SUBPROCESS (its
own SparkSession + JVM). The r7-r9 protocol interleaved D/V runs inside
one session; r10 found that state-store providers from FINISHED streaming
queries keep running maintenance (RocksDB snapshot/cleanup threads) in
the shared JVM, degrading later rounds — within one session an identical
verify config measured 22.3 s on round 1 and 49.7 s on round 4, and the
drift systematically inflates whichever mode runs later. Fresh processes
pay JVM/codegen cold-start in BOTH columns equally (absolute walls are
higher than r9's warm numbers; the D/V ratio is the comparable quantity)
and each round is still a temporally-adjacent D/V pair, preserving the
host-drift robustness of the interleaved protocol.

The ``emission`` block (r9 verdict task #2) closes the one unmeasured
leg: the same corpus drained in ONE trigger with the watermark horizon
INSIDE the fixture's 10-hour time span ("10 minutes"), so after the data
batch the no-data micro-batch advances the watermark and windows
actually SEAL — verdicts_emitted > 0 (every doc whose seal window the
final watermark passed). Single-trigger geometry on both sides
(emission-inclusive vs a state-only control at the same trigger count)
so the delta isolates the window-seal/emit + timer-eviction path, not a
different number of stateful passes.

Prints ONE JSON line; write BENCH_lsh_stream.json via --json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The row-local HOF signature is the dominant cost (~tens of docs/s/core —
# higher-order functions run interpreted, no codegen): parallelism must
# come from FILES, so the trigger geometry keeps every core busy per
# micro-batch.
REPLICAS = int(os.environ.get("LSH_BENCH_REPLICAS", "40"))  # sf0.1's 5000 docs x 40 = 200k
N_FILES = 64
FILES_PER_TRIGGER = 32


def worker(args) -> None:
    """One timed drain in THIS process (spawned fresh per measurement)."""
    from timing_explorer_spark.compat import ensure_protobuf
    from timing_explorer_spark.session import get_spark
    from timing_explorer_spark.streaming.lsh_dedup import minhash_dedup_stream
    from timing_explorer_spark.streaming.state import rocksdb_state_conf

    ensure_protobuf()
    spark = get_spark(
        app_name="lsh-stream-bench-worker",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="lshbench_out_")
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", args.files_per_trigger)
        .parquet(args.indir)
    )
    verdicts = minhash_dedup_stream(
        stream,
        watermark=args.watermark,
        verify=(args.verify if args.verify > 0 else None),
    )
    t0 = time.monotonic()
    q = (
        verdicts.writeStream.format("parquet")
        .option("path", f"{out}/o")
        .option("checkpointLocation", f"{out}/c")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    emitted = spark.read.parquet(f"{out}/o").count()
    print(
        json.dumps(
            {
                "wall_sec": round(wall, 1),
                "docs_per_sec": int(args.n_docs / wall),
                "verdicts_emitted": emitted,
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # worker-mode args (internal)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--indir", default=None)
    ap.add_argument("--n-docs", type=int, default=0)
    ap.add_argument("--verify", type=float, default=0.0)  # 0 = default mode
    ap.add_argument("--watermark", default="11 hours")
    ap.add_argument("--files-per-trigger", type=int, default=FILES_PER_TRIGGER)
    args = ap.parse_args()

    if args.worker:
        worker(args)
        return

    from pyspark.sql import functions as F

    from timing_explorer_spark.session import get_spark

    # fixture-builder session only — stopped before any measurement runs
    spark = get_spark(
        app_name="lsh-stream-bench-fixture",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def build_corpus(unique: bool) -> tuple[str, int]:
        indir = tempfile.mkdtemp(prefix="lshbench_in_")
        base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("rep"))
        )
        if unique:
            # per-replica token prefix -> every doc's shingle set is
            # distinct: the unique-heavy regime (real-traffic steady state,
            # where almost nothing collides)
            text = F.concat(
                F.lit("u"), F.col("rep").cast("string"), F.lit("x "), F.col("text")
            )
        else:
            # replicas of one doc are EXACT duplicates — the dup-heavy
            # crawl regime the exact-sig prefilter is built for
            text = F.col("text")
        docs = base.select(
            (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
            F.to_timestamp(
                F.lit("2024-01-01 00:00:00")
            ).cast("timestamp").alias("base"),
            text.alias("text"),
        ).select(
            "doc_id",
            (F.col("base") + F.make_interval(secs=F.col("doc_id") % 36000)).alias("ts"),
            "text",
        )
        n = docs.count()
        docs.repartition(N_FILES).write.mode("overwrite").parquet(indir)
        return indir, n

    indir, n_docs = build_corpus(unique=False)
    uniq_dir, n_uniq = build_corpus(unique=True)
    spark.stop()

    me = str(Path(__file__).resolve())

    def run(verify, src=None, watermark="11 hours", files_per_trigger=FILES_PER_TRIGGER):
        cmd = [
            sys.executable,
            me,
            "--worker",
            "--cpus",
            str(args.cpus),
            "--indir",
            src or indir,
            "--n-docs",
            str(n_uniq if (src or indir) == uniq_dir else n_docs),
            "--verify",
            str(verify if verify is not None else 0.0),
            "--watermark",
            watermark,
            "--files-per-trigger",
            str(files_per_trigger),
        ]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
        if r.returncode != 0:
            # ADVICE r10: a crashed drain must surface its real stderr, not
            # an opaque IndexError on empty stdout
            raise RuntimeError(
                f"worker exited {r.returncode}: {r.stderr[-2000:]}"
            )
        line = r.stdout.strip().splitlines()[-1]
        return json.loads(line)

    # interleaved D/V rounds (the BENCH_sd_repin protocol), each drain in a
    # fresh process; headline = best round of each mode
    rounds = []
    for _ in range(3):
        rounds.append({"default": run(None), "verify_0.8": run(0.8)})
    results = {
        mode: min((r[mode] for r in rounds), key=lambda x: x["wall_sec"])
        for mode in ("default", "verify_0.8")
    }
    # the OTHER traffic regime (r8): an all-unique corpus — nothing for the
    # exact-sig prefilter to kill, every band key fresh — the steady-state
    # cost ceiling of the precision layer on real traffic
    uniq_rounds = []
    for _ in range(3):
        uniq_rounds.append(
            {"default": run(None, src=uniq_dir), "verify_0.8": run(0.8, src=uniq_dir)}
        )
    unique_results = {
        mode: min((r[mode] for r in uniq_rounds), key=lambda x: x["wall_sec"])
        for mode in ("default", "verify_0.8")
    }
    # r9 task #2: the verdict-EMISSION leg. One data trigger both sides;
    # control = state-only horizon (nothing seals), measured = 10-minute
    # horizon inside the 10 h span (watermark 0 during the data batch, so
    # no late drops and identical dedup work — then the no-data batch
    # seals ~98% of windows and verdicts actually emit).
    emission = {}
    for mode, v in (("default", None), ("verify_0.8", 0.8)):
        em_rounds = [
            {
                "ctl": run(v, watermark="11 hours", files_per_trigger=N_FILES),
                "em": run(v, watermark="10 minutes", files_per_trigger=N_FILES),
            }
            for _ in range(2)
        ]
        ctl = min((r["ctl"] for r in em_rounds), key=lambda x: x["wall_sec"])
        em = min((r["em"] for r in em_rounds), key=lambda x: x["wall_sec"])
        emission[mode] = {
            "state_only_1trigger": ctl,
            "emission_inclusive": em,
            "emission_overhead_ratio": round(em["wall_sec"] / ctl["wall_sec"], 2),
            "interleaved_rounds": em_rounds,
        }

    def round_ratios(rds):
        # per-round ratios + median: each round is a temporally-adjacent
        # D/V pair of fresh processes, so the ratio list is robust to both
        # host drift AND the in-session state-store contamination the r10
        # protocol note documents
        rr = sorted(
            round(r["verify_0.8"]["wall_sec"] / r["default"]["wall_sec"], 2)
            for r in rds
        )
        return rr, rr[len(rr) // 2]

    dup_rr, dup_med = round_ratios(rounds)
    uniq_rr, uniq_med = round_ratios(uniq_rounds)
    out = {
        "metric": "streaming_lsh_throughput",
        "protocol": "fresh-process-per-drain (r10; see module docstring)",
        "cpus": args.cpus,
        "n_docs": n_docs,
        "n_files": N_FILES,
        "files_per_trigger": FILES_PER_TRIGGER,
        "verify_cost_ratio": round(
            results["verify_0.8"]["wall_sec"] / results["default"]["wall_sec"], 2
        ),
        "round_ratios": dup_rr,
        "median_round_ratio": dup_med,
        "results": results,
        "interleaved_rounds": rounds,
        "unique_corpus": {
            "n_docs": n_uniq,
            "verify_cost_ratio": round(
                unique_results["verify_0.8"]["wall_sec"]
                / unique_results["default"]["wall_sec"],
                2,
            ),
            "round_ratios": uniq_rr,
            "median_round_ratio": uniq_med,
            "results": unique_results,
            "interleaved_rounds": uniq_rounds,
        },
        "emission": emission,
    }
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
