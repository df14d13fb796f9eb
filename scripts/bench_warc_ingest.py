#!/usr/bin/env python
"""WARC ingest throughput probe (round 7): how fast does the crawl
front-end — container walk + gzip member chain + HTML strip — actually
run per core, batch and streaming?

Fixture: sf0.1 documents replicated REPLICAS x, wrapped in synthesized
HTML, encoded as spec-conforming WARC records (one gzip member each for
the .gz variant), concatenated into N_FILES files on local disk — the
Common Crawl segment shape at reduced size. Parallelism is per FILE
(binaryFile source), exactly the 100 TB deployment story, so records/s
here scales with executors as long as files >> cores.

Measured (min of PASSES):
  - batch plain  : read_warc -> valid records counted
  - batch gz     : same over per-record gzip members
  - batch gz+strip: records -> strip_html -> non-empty texts counted
  - stream gz    : availableNow file-stream drain, records/s

Prints ONE JSON line; write BENCH_warc_ingest.json via --json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPLICAS = 50
N_FILES = 64
PASSES = 3


def build_fixture(spark, sf_dir: str, out_plain: str, out_gz: str) -> dict:
    from pyspark.sql import functions as F

    from timing_explorer_spark.operators.html_extract import synthesize_html
    from timing_explorer_spark.sources.warc import synthetic_warc_blobs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .crossJoin(spark.range(REPLICAS).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
            synthesize_html(F.col("text"), F.col("doc_id")).alias("text"),
        )
    )
    n_docs = docs.count()
    for out, gz in ((out_plain, False), (out_gz, True)):
        os.makedirs(out, exist_ok=True)
        blobs = synthetic_warc_blobs(docs, n_blobs=N_FILES, gz=gz).collect()
        ext = "warc.gz" if gz else "warc"
        for r in blobs:
            with open(f"{out}/seg-{int(r['blob_id']):05d}.{ext}", "wb") as f:
                f.write(bytes(r["payload"]))
    size = lambda d: sum(p.stat().st_size for p in Path(d).iterdir())  # noqa: E731
    return {
        "n_records": n_docs,
        "plain_bytes": size(out_plain),
        "gz_bytes": size(out_gz),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from timing_explorer_spark.operators.html_extract import strip_html
    from timing_explorer_spark.session import get_spark
    from timing_explorer_spark.sources.warc import read_warc, read_warc_stream

    spark = get_spark(
        app_name="warc-ingest-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    root = tempfile.mkdtemp(prefix="warcbench_")
    plain_dir, gz_dir = f"{root}/plain", f"{root}/gz"
    fx = build_fixture(spark, args.sf_dir, plain_dir, gz_dir)
    print(f"fixture: {fx}", file=sys.stderr)

    def timed(fn) -> tuple[float, int]:
        best, n = float("inf"), 0
        for _ in range(PASSES):
            t0 = time.monotonic()
            n = fn()
            best = min(best, time.monotonic() - t0)
        return best, n

    results = {}
    for label, d in (("batch_plain", plain_dir), ("batch_gz", gz_dir)):
        wall, n = timed(lambda d=d: read_warc(spark, d).where("valid").count())
        assert n == fx["n_records"], (label, n)
        results[label] = {
            "wall_sec": round(wall, 2),
            "records_per_sec": int(n / wall),
            "mb_per_sec": round(
                (fx["plain_bytes" if label == "batch_plain" else "gz_bytes"] / 1e6)
                / wall, 1,
            ),
        }

    def gz_strip() -> int:
        return (
            read_warc(spark, gz_dir)
            .where("valid")
            .select(strip_html(F.decode("payload", "UTF-8")).alias("t"))
            .where(F.length("t") > 0)
            .count()
        )

    wall, n = timed(gz_strip)
    assert n == fx["n_records"]
    results["batch_gz_strip"] = {
        "wall_sec": round(wall, 2),
        "records_per_sec": int(n / wall),
    }

    # streaming drain: all files in one availableNow run, 8 files/trigger
    sdir = tempfile.mkdtemp(prefix="warcbench_s_")
    t0 = time.monotonic()
    q = (
        read_warc_stream(spark, gz_dir)
        .where("valid")
        .select("blob_id", "rec_idx", "content_length")
        .writeStream.format("parquet")
        .option("path", f"{sdir}/out")
        .option("checkpointLocation", f"{sdir}/ckpt")
        .option("maxFilesPerTrigger", 8)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    n = spark.read.parquet(f"{sdir}/out").count()
    assert n == fx["n_records"]
    results["stream_gz"] = {
        "wall_sec": round(wall, 2),
        "records_per_sec": int(n / wall),
    }

    # r8: the STREAMING leg of the crawl-to-corpus flagship — gz-WARC
    # stream -> visible-text strip -> mojibake repair -> paragraph-grain
    # dedup verdicts (streaming/paragraph_dedup.py), drained availableNow.
    # Verdict rows are 0 here by design (the horizon exceeds the fixture
    # span); the measured work is the full ingest-path transform + the
    # stateful paragraph layer — the batch counterpart is
    # q_crawl_to_corpus (oracle-matched).
    from timing_explorer_spark.functions.text import fix_mojibake
    from timing_explorer_spark.streaming.paragraph_dedup import (
        paragraph_dedup_stream,
    )

    cdir = tempfile.mkdtemp(prefix="warcbench_c_")
    t0 = time.monotonic()
    cleaned = (
        read_warc_stream(spark, gz_dir)
        .where("valid")
        .select(
            F.xxhash64("blob_id", "rec_idx").alias("doc_id"),
            F.timestamp_millis(
                F.lit(1704067200000) + F.pmod(F.col("blob_id"), F.lit(36000)) * 1000
            ).alias("ts"),
            fix_mojibake(
                strip_html(F.decode("payload", "UTF-8"))
            ).alias("text"),
        )
    )
    q = (
        paragraph_dedup_stream(cleaned, watermark="11 hours")
        .writeStream.format("parquet")
        .option("path", f"{cdir}/out")
        .option("checkpointLocation", f"{cdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    results["stream_crawl_chain"] = {
        "wall_sec": round(wall, 2),
        "records_per_sec": int(fx["n_records"] / wall),
    }

    out = {
        "metric": "warc_ingest_throughput",
        "cpus": args.cpus,
        "n_records": fx["n_records"],
        "n_files": N_FILES,
        "plain_mb": round(fx["plain_bytes"] / 1e6, 1),
        "gz_mb": round(fx["gz_bytes"] / 1e6, 1),
        "passes": PASSES,
        "results": results,
    }
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
