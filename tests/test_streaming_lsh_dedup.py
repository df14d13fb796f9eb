"""Streaming MinHash-LSH near-dup suppression (streaming/lsh_dedup.py):

  - the row-local signature is bit-identical to the batch aggregation
    (operators/dedup.py::minhash_signatures — same hash family, same seed)
  - replay parity: streamed verdicts == a greedy first-arrival-wins sweep
    over the SAME band keys computed in batch
  - bounded state: a near-duplicate arriving after the watermark horizon is
    unique again (band fingerprints evicted — the dedup_stream contract)
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from timing_explorer_spark.streaming.lsh_dedup import (
    band_keys,
    minhash_dedup_stream,
    row_local_signature,
)

NUM_PERM, BANDS, N = 64, 16, 3

BASE = (
    "the quick brown fox jumped over the lazy dog while the cat sat on the "
    "mat and watched the birds fly south for the winter season as usual"
)
EDITED = BASE.replace("lazy dog", "sleepy dog")  # near-dup: one shingle zone
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized operators hash joins and shuffle exchanges "
    "running on large clusters every day"
)
THIRD = (
    "yet another unrelated passage describing mountain weather patterns "
    "snowfall accumulation alpine ridgelines and the seasonal migration of "
    "birds across the high passes every autumn"
)


def test_row_local_signature_matches_batch(spark):
    from timing_explorer_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, BASE), (2, EDITED), (3, OTHER), (4, "too short")],
        "doc_id long, text string",
    )
    batch = {
        r["doc"]: list(r["sig"])
        for r in minhash_signatures(docs, num_perm=NUM_PERM, n=N).collect()
    }
    local = {
        r["doc_id"]: (list(r["sig"]) if r["sig"] is not None else None)
        for r in docs.select(
            "doc_id", row_local_signature(F.col("text"), NUM_PERM, N).alias("sig")
        ).collect()
    }
    assert local[1] == batch[1]
    assert local[2] == batch[2]
    assert local[3] == batch[3]
    assert local[4] is None and 4 not in batch  # shingle-less conventions


def _greedy_expected(spark, rows):
    """First-arrival-wins over batch-computed band keys, in ts order."""
    df = spark.createDataFrame(rows, "doc_id long, ts string, text string")
    keyed = df.select(
        "doc_id", "ts", band_keys(F.col("text"), NUM_PERM, BANDS, N).alias("bk")
    ).collect()
    seen: set = set()
    verdicts = {}
    for r in sorted(keyed, key=lambda r: r["ts"]):
        bk = r["bk"]
        if bk is None:
            verdicts[r["doc_id"]] = True
            continue
        keys = {(i, v) for i, v in enumerate(bk)}
        fresh = keys - seen
        if len(fresh) == len(keys):
            verdicts[r["doc_id"]] = True  # all bands fresh -> unique
        elif fresh:
            verdicts[r["doc_id"]] = False  # partial collision -> near-dup
        else:
            verdicts[r["doc_id"]] = None  # fully collided -> no verdict row
        seen |= fresh
    return verdicts


def _run_stream(spark, tmp_path, batches, watermark="10 minutes"):
    indir, outdir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, ts string, text string").select(
            "doc_id", F.col("ts").cast("timestamp").alias("ts"), "text"
        )
        df.coalesce(1).write.mode("append").parquet(indir)
        time.sleep(1.1)  # file-source batch order follows modification time
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    out = minhash_dedup_stream(
        stream, watermark=watermark, num_perm=NUM_PERM, bands=BANDS, n=N
    )
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["doc"]: r for r in spark.read.parquet(outdir).collect()}


def test_stream_parity_with_batch_greedy(spark, tmp_path):
    batches = [
        [(1, "2024-01-01 00:00:10", BASE), (10, "2024-01-01 00:00:11", OTHER)],
        [(2, "2024-01-01 00:00:20", EDITED)],   # near-dup of 1 (partial bands)
        [(3, "2024-01-01 00:00:30", BASE)],     # exact dup of 1 (all bands)
        [(4, "2024-01-01 00:00:40", "too short"),
         (5, "2024-01-01 00:00:41", "also short")],  # shingle-less pass through
        # sentinel far ahead: seals every earlier verdict window
        [(99, "2024-01-01 01:00:00", "seal sentinel document only")],
    ]
    got = _run_stream(spark, tmp_path, batches)
    want = _greedy_expected(spark, [r for b in batches[:-1] for r in b])
    for doc_id, verdict in want.items():
        if verdict is None:
            assert doc_id not in got, f"fully-collided doc {doc_id} must emit no row"
        else:
            assert doc_id in got, f"doc {doc_id} verdict missing"
            assert got[doc_id]["is_unique"] == verdict, (doc_id, dict(got[doc_id].asDict()))
    # the near-dup kept SOME fresh bands but not all
    assert 0 < got[2]["n_bands"] < BANDS


def test_state_evicts_after_watermark_horizon(spark, tmp_path):
    """The bounded-state trade, same contract as exact dedup_stream: a copy
    arriving after the horizon re-classifies as unique (its band
    fingerprints were evicted)."""
    batches = [
        [(1, "2024-01-01 00:00:10", BASE)],
        [(2, "2024-01-01 00:00:20", BASE)],   # inside horizon: suppressed
        # watermark jumps ~2h past doc 1/2 + 10min horizon...
        [(50, "2024-01-01 02:00:00", OTHER)],
        # ...and takes effect ONE TRIGGER LATE (the pinned late-data
        # contract): this spacer batch is where doc 1's band state evicts
        [(51, "2024-01-01 02:00:05", THIRD)],
        [(3, "2024-01-01 02:00:10", BASE)],   # same text, fresh again
        [(99, "2024-01-01 03:00:00", "seal sentinel document only")],
        [(100, "2024-01-01 04:00:00", "second seal sentinel flushes verdicts")],
    ]
    got = _run_stream(spark, tmp_path, batches, watermark="10 minutes")
    assert got[1]["is_unique"] is True
    assert 2 not in got  # exact dup inside horizon: every band collided
    assert got[3]["is_unique"] is True  # re-admitted after eviction
