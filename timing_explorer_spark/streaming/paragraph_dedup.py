"""Streaming paragraph-grain exact dedup — CCNet's dedup step at ingest.

The batch operator (plans/text_pipeline.py::q_paragraph_dedup) dedups
SHA-hashed paragraphs across a corpus at rest (Wenzek et al. 2020 §3.1);
this is its ingest-path counterpart: as documents land, every paragraph
whose hash was already seen inside the watermark horizon is dropped, and
each document gets a sealed verdict row with its surviving-paragraph count.

Shape (the exact-dedup analog of lsh_dedup.py, one grain finer than
pipeline.py::dedup_stream's whole-document contract):

  1. split + posexplode to (doc, para_idx, para) — map-only, append-safe.
  2. ``dropDuplicatesWithinWatermark`` on xxhash64(para): state holds one
     fingerprint per DISTINCT surviving paragraph within the horizon, so
     state is bounded by (distinct-paragraph rate x horizon) — on
     duplicate-heavy crawl traffic that is far BELOW the row rate, the
     same property that made the batch window's two-sided
     WindowGroupLimit shuffle 1/10th of the paragraph table at sf1.
  3. verdicts seal as a watermarked event-time aggregation per document:
     (doc, window_start, n_paras, kept_paras, dup_frac, is_unique).

Semantics: FIRST-ARRIVAL-WINS across micro-batches (replay-parity tested
against a greedy sweep in arrival order); within one micro-batch the
survivor per paragraph hash is arbitrary — same caveat, and same
documented consumer contract, as default-mode minhash_dedup_stream. A
document ALL of whose paragraphs are stale emits NO verdict row (absence
= full duplicate — consumers keep docs with a verdict row, routing
kept_paras < n_paras docs to reassembly).

Reassembly note: this operator emits VERDICTS, not cleaned text — at
ingest the consumer either keeps/drops whole documents on the verdict or
routes partial docs to the batch reassembly path (the ordered
collect_list in q_paragraph_dedup); a streaming ordered reassembly would
need the full surviving-paragraph set per doc in one place anyway, which
IS that batch aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paragraph_dedup_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    sep: str = r"\n+",
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    seal_window: str = "1 second",
) -> DataFrame:
    """Paragraph-dedup verdict stream: one row per document that kept at
    least one paragraph — (doc, window_start, n_paras, kept_paras,
    dup_frac, is_unique). ``sep`` is the paragraph-separator regex
    (newlines in deployment). Empty documents split into one empty
    paragraph and so dedup against each other — an empty doc is a
    duplicate of the previous empty doc, the CCNet convention."""
    wm = docs.withWatermark(ts_col, watermark)
    parted = wm.select(
        F.col(id_col).alias("doc"),
        F.col(ts_col).alias("ev_ts"),
        F.split(F.col(text_col), sep).alias("parts"),
    )
    paras = parted.select(
        "doc",
        "ev_ts",
        F.size("parts").alias("n_paras"),
        F.posexplode("parts").alias("para_idx", "para"),
    ).select("doc", "ev_ts", "n_paras", F.xxhash64("para").alias("para_hash"))
    fresh = paras.dropDuplicatesWithinWatermark(["para_hash"])
    kept = F.count(F.lit(1))
    return (
        fresh.groupBy(
            F.window("ev_ts", seal_window).alias("w"), F.col("doc"), F.col("n_paras")
        )
        .agg(kept.alias("kept_paras"))
        .select(
            "doc",
            F.col("w.start").alias("window_start"),
            "n_paras",
            "kept_paras",
            (
                F.lit(1.0)
                - F.col("kept_paras").cast("double") / F.col("n_paras").cast("double")
            ).alias("dup_frac"),
            (F.col("kept_paras") == F.col("n_paras")).alias("is_unique"),
        )
    )
