#!/usr/bin/env python
"""BPE sampled-training cost probe (round-8 verdict task #5): exact BPE
training is one full pair-count pass PER MERGE — O(n_merges x corpus) —
so the scale path is TRAIN on a seeded sample, ENCODE the full corpus
(shuffle-free linear passes). This measures both halves at the sf1 corpus
(sf0.1 documents tiled 10x, same fixture family as BENCH_sf1.json) and
records whether the sampled merge table matches the full one.

Prints ONE JSON line; write BENCH_bpe_sampled.json via --json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_MERGES = 8
SAMPLE = 0.1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tile", type=int, default=40)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from timing_explorer_spark.operators.bpe import bpe_encode, bpe_train
    from timing_explorer_spark.session import get_spark

    spark = get_spark(
        app_name="bpe-sampled-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # sf1-scale corpus: tile sf0.1 documents 10x (distinct doc ids; BPE pair
    # stats just scale 10x, which is exactly the point of sampled training)
    corpus_dir = tempfile.mkdtemp(prefix="bpe_corpus_")
    (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .crossJoin(spark.range(args.tile).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") * args.tile + F.col("rep")).alias("doc_id"),
            "text",
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(corpus_dir)
    )
    docs = spark.read.parquet(corpus_dir)
    n_docs = docs.count()

    t0 = time.monotonic()
    full, _ = bpe_train(docs, N_MERGES)
    t_full = time.monotonic() - t0

    t0 = time.monotonic()
    sampled, _ = bpe_train(docs, N_MERGES, sample_fraction=SAMPLE, seed=42)
    t_sampled = time.monotonic() - t0

    raw_tokens = docs.select(
        F.sum(F.size(F.split("text", r"\s+")))
    ).collect()[0][0]

    t0 = time.monotonic()
    enc = bpe_encode(docs, sampled)
    n_tokens_sampled = enc.select(F.sum(F.size("toks"))).collect()[0][0]
    t_encode = time.monotonic() - t0
    n_tokens_full = (
        bpe_encode(docs, full).select(F.sum(F.size("toks"))).collect()[0][0]
    )

    pairs_full = [(a, b) for _, a, b, _ in full]
    pairs_samp = [(a, b) for _, a, b, _ in sampled]
    agree = sum(p == q for p, q in zip(pairs_full, pairs_samp))

    out = {
        "metric": "bpe_sampled_training",
        "cpus": args.cpus,
        "n_docs": n_docs,
        "n_merges": N_MERGES,
        "sample_fraction": SAMPLE,
        "train_full_sec": round(t_full, 1),
        "train_sampled_sec": round(t_sampled, 1),
        "train_speedup": round(t_full / t_sampled, 2),
        "encode_full_corpus_sec": round(t_encode, 1),
        "raw_tokens": int(raw_tokens),
        "encoded_tokens_sampled_table": int(n_tokens_sampled),
        "encoded_tokens_full_table": int(n_tokens_full),
        # the deployment-relevant equivalence: tokens REMOVED by the merge
        # table (compression work). Rank reorders near the frequency floor
        # swap WHICH merges land, not how much they compress.
        "compression_parity": round(
            (raw_tokens - n_tokens_sampled) / max(raw_tokens - n_tokens_full, 1),
            4,
        ),
        "merge_table_agreement": f"{agree}/{N_MERGES}",
        "note": (
            "training cost is bounded by sample_fraction while the encode "
            "pass (the full-corpus half) is shuffle-free linear. On "
            "natural text, near-floor frequency ties reorder merges "
            "between sample and full corpus — the quality metric is "
            "compression_parity (tokens removed by sampled table / full "
            "table), not rank agreement; EXACT table agreement on a "
            "rank-separated fixture is pinned in tests/test_round3_ops.py"
            "::test_bpe_sampled_training_equivalence"
        ),
    }
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
