"""Measure streaming-LSH dedup precision/recall at several operating points
(round-7 verdict task #3a): runs the REAL minhash_dedup_stream operator
(both verify modes) over a mixed corpus with known ground truth and writes
BENCH_lsh_fp.json.

Corpus: sf0.01 documents (base population) + deterministic variants of a
subset — exact copies (J=1), one-word appends (J~0.95), light edits
(~J0.6-0.75) — arriving after their sources across several micro-batches.

Ground truth per arriving doc: TRUE-DUP iff some EARLIER arrival has exact
word-3-shingle Jaccard >= TAU (all arrivals inside the watermark horizon,
so eviction never enters the measurement).

Metrics per operating point:
  fp_rate  = P(flagged dup | truly unique)   -- silent data loss if
             consumers drop flagged docs without routing
  recall   = P(flagged dup | truly dup)      -- dedup effectiveness
A doc is "flagged dup" when its verdict row has is_unique=false OR it
emitted no verdict row (fully-collided hard-dup convention).

Usage: python scripts/lsh_operating_points.py [--sf-dir DIR] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TAU = 0.8  # exact-Jaccard ground-truth threshold == verify threshold

BATCHES = 5
N_BASE = 200  # base docs sampled from the documents table


def build_corpus(docs: list[tuple[int, str]]) -> list[tuple[int, str, str]]:
    """(doc_id, ts, text) arrivals: base docs then variants, ts 1 s apart."""
    rows: list[tuple[int, str]] = list(docs)
    next_id = max(d for d, _ in docs) + 1000
    for i, (src_id, text) in enumerate(docs):
        words = text.split()
        if i % 10 == 0:  # exact copy
            rows.append((next_id, text))
            next_id += 1
        elif i % 10 == 1:  # append one word: J ~ |S|/(|S|+1)
            rows.append((next_id, text + " appended"))
            next_id += 1
        elif i % 10 == 2:  # light edit: replace every 8th word
            w = [f"edit{j}" if j % 8 == 3 else x for j, x in enumerate(words)]
            rows.append((next_id, " ".join(w)))
            next_id += 1
    out = []
    t0 = 0
    for doc_id, text in rows:
        mm, ss = divmod(t0, 60)
        hh, mm = divmod(mm, 60)
        out.append((doc_id, f"2024-01-01 {hh:02d}:{mm:02d}:{ss:02d}", text))
        t0 += 1
    return out


def shingle_set(text: str, n: int = 3) -> frozenset:
    w = re.split(r"\s+", text.strip())
    return frozenset(
        " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
    ) if len(w) >= n else frozenset()


def ground_truth(corpus: list[tuple[int, str, str]]) -> dict[int, bool]:
    """TRUE-DUP iff exact Jaccard >= TAU vs some earlier arrival."""
    seen: list[tuple[int, frozenset]] = []
    truth: dict[int, bool] = {}
    for doc_id, _, text in corpus:
        s = shingle_set(text)
        dup = False
        if s:
            for _, s2 in seen:
                inter = len(s & s2)
                if inter and inter / (len(s) + len(s2) - inter) >= TAU:
                    dup = True
                    break
        truth[doc_id] = dup
        seen.append((doc_id, s))
    return truth


def run_point(spark, indir: str, num_perm: int, bands: int, verify):
    from pyspark.sql import functions as F

    from timing_explorer_spark.streaming.lsh_dedup import minhash_dedup_stream

    outdir = tempfile.mkdtemp(prefix="lshfp_out_")
    ckpt = tempfile.mkdtemp(prefix="lshfp_ck_")
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    out = minhash_dedup_stream(
        stream,
        watermark="2 hours",
        num_perm=num_perm,
        bands=bands,
        verify=verify,
    )
    t0 = time.monotonic()
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    verdicts = {
        r["doc"]: bool(r["is_unique"])
        for r in spark.read.parquet(outdir).collect()
    }
    return verdicts, wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default="BENCH_lsh_fp.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from timing_explorer_spark.compat import ensure_protobuf
    from timing_explorer_spark.session import get_spark
    from timing_explorer_spark.sources.tables import load
    from timing_explorer_spark.streaming.state import rocksdb_state_conf

    ensure_protobuf()
    spark = get_spark(app_name="lsh-operating-points", master="local[8]",
                      shuffle_partitions=16)
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    base = [
        (int(r["doc_id"]), str(r["text"]))
        for r in load(spark, args.sf_dir, "documents")
        .orderBy("doc_id")
        .limit(N_BASE)
        .collect()
    ]
    corpus = build_corpus(base)
    truth = ground_truth(corpus)
    # seal sentinels: two far-future batches flush every verdict window
    sentinel = [
        (999_001, "2024-01-01 06:00:00", "seal sentinel document number one"),
        (999_002, "2024-01-01 07:00:00", "seal sentinel document number two"),
    ]
    for s in sentinel:
        truth[s[0]] = False

    indir = tempfile.mkdtemp(prefix="lshfp_in_")
    per_batch = (len(corpus) + BATCHES - 1) // BATCHES
    chunks = [
        corpus[i * per_batch : (i + 1) * per_batch] for i in range(BATCHES)
    ] + [[sentinel[0]], [sentinel[1]]]
    for rows in chunks:
        if not rows:
            continue
        spark.createDataFrame(
            rows, "doc_id long, ts string, text string"
        ).select(
            "doc_id", F.col("ts").cast("timestamp").alias("ts"), "text"
        ).coalesce(1).write.mode("append").parquet(indir)
        time.sleep(1.1)

    n_dup = sum(truth[d] for d, _, _ in corpus)
    n_uni = len(corpus) - n_dup
    print(
        f"corpus: {len(corpus)} docs ({n_dup} true-dup, {n_uni} true-unique) "
        f"tau={TAU}",
        file=sys.stderr,
    )

    points = []
    for num_perm, bands in [(64, 32), (64, 16), (64, 8)]:
        for verify in [None, TAU]:
            verdicts, wall = run_point(spark, indir, num_perm, bands, verify)
            fp = fn = tp = tn = 0
            for doc_id, _, _ in corpus:
                flagged = not verdicts.get(doc_id, False)  # absent => dup
                if truth[doc_id]:
                    tp += flagged
                    fn += not flagged
                else:
                    fp += flagged
                    tn += not flagged
            point = {
                "num_perm": num_perm,
                "bands": bands,
                "rows_per_band": num_perm // bands,
                "verify": verify,
                "fp_rate": round(fp / max(n_uni, 1), 4),
                "recall": round(tp / max(n_dup, 1), 4),
                "fp": fp, "fn": fn, "tp": tp, "tn": tn,
                "wall_sec": round(wall, 1),
            }
            points.append(point)
            print(json.dumps(point), file=sys.stderr)

    result = {
        "metric": "streaming_lsh_operating_points",
        "tau": TAU,
        "corpus_docs": len(corpus),
        "true_dup": n_dup,
        "true_unique": n_uni,
        "points": points,
    }
    Path(args.json).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
