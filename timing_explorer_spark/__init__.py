"""timing_explorer_spark — a PySpark-native analytics engine.

A from-scratch Spark (DataFrame / SQL / Structured Streaming) engine with the
query and data-processing capabilities of the reference project
``alpinegizmo/timing-explorer`` (a Flink time-semantics demo app; see
/root/reference), extended with a DuckDB-checkable relational query inventory
over TPC-H-ish tables and LLM-data-pipeline operators (dedup, similarity
search, LM/tokenizer training, text analysis, raw-HTML extraction, multimodal
column plumbing), all designed for multi-executor scale: broadcast joins for
small dimensions, partial (map-side) aggregation, predicate pushdown / column
pruning via Catalyst, and AQE.

Quickstart (see USER_GUIDE.md for runnable walkthroughs)::

    import timing_explorer_spark as tes

    spark = tes.get_spark()
    docs = tes.load(spark, "/root/testdata/sf0.01", "documents")
    pairs = tes.minhash_lsh_pairs(docs, threshold=0.8)

Layout:
  session     SparkSession builders with scale-appropriate defaults
  sources     deterministic generator (reference parity) + parquet table loaders
  functions   reusable column expressions (waveforms, text, vectors, InfluxQL)
  operators   composed DataFrame operators (dedup, similarity, LM training, ...)
  plans       the declared query inventory (Spark builder + DuckDB oracle SQL)
  streaming   Structured Streaming pipelines = the reference's TimingExplorer job
  multimodal  binary-column (image/audio) decode + perceptual hashing

The curated operator surface below lazy-loads (PEP 562): importing the
package costs nothing beyond this module; each symbol resolves its module on
first access.
"""

from __future__ import annotations

__version__ = "0.2.0"

# public name -> "module:attr" (resolved lazily on first attribute access)
_EXPORTS = {
    # session + tables
    "get_spark": "timing_explorer_spark.session:get_spark",
    "ensure_confs": "timing_explorer_spark.session:ensure_confs",
    "load": "timing_explorer_spark.sources.tables:load",
    "warm_cache": "timing_explorer_spark.sources.tables:warm_cache",
    # query registry (the driver-facing inventory, also usable as a library)
    "all_queries": "timing_explorer_spark.plans.registry:all_queries",
    # InfluxQL dialect
    "influxql": "timing_explorer_spark.functions.influxql:influxql",
    # deduplication
    "exact_dedup_groups": "timing_explorer_spark.operators.dedup:exact_dedup_groups",
    "jaccard_pairs": "timing_explorer_spark.operators.dedup:jaccard_pairs",
    "minhash_lsh_pairs": "timing_explorer_spark.operators.dedup:minhash_lsh_pairs",
    "simhash_pairs": "timing_explorer_spark.operators.dedup:simhash_pairs",
    "hamming_pairs": "timing_explorer_spark.operators.dedup:hamming_pairs",
    "containment_pairs": "timing_explorer_spark.operators.dedup:containment_pairs",
    "resolve_components": "timing_explorer_spark.operators.dedup:resolve_components",
    "semdedup_pairs": "timing_explorer_spark.operators.similarity:semdedup_pairs",
    # similarity search
    "brute_force_topk": "timing_explorer_spark.operators.similarity:brute_force_topk",
    "nearest_neighbor_all": "timing_explorer_spark.operators.similarity:nearest_neighbor_all",
    "lsh_topk": "timing_explorer_spark.operators.similarity:lsh_topk",
    "ivf_topk": "timing_explorer_spark.operators.similarity:ivf_topk",
    "embedding_neardup_pairs": "timing_explorer_spark.operators.similarity:embedding_neardup_pairs",
    # LM / tokenizer training + quality filtering
    "bpe_train": "timing_explorer_spark.operators.bpe:bpe_train",
    "bpe_encode": "timing_explorer_spark.operators.bpe:bpe_encode",
    "bpe_save": "timing_explorer_spark.operators.bpe:bpe_save",
    "bpe_load": "timing_explorer_spark.operators.bpe:bpe_load",
    "ann_save": "timing_explorer_spark.operators.similarity:ann_save",
    "ann_load": "timing_explorer_spark.operators.similarity:ann_load",
    "unigram_train": "timing_explorer_spark.operators.unigram:unigram_train",
    "doc_perplexity": "timing_explorer_spark.operators.unigram:doc_perplexity",
    "ccnet_buckets": "timing_explorer_spark.operators.unigram:ccnet_buckets",
    "kn_train": "timing_explorer_spark.operators.kneser_ney:kn_train",
    "kn_perplexity": "timing_explorer_spark.operators.kneser_ney:kn_perplexity",
    "kn_save": "timing_explorer_spark.operators.kneser_ney:kn_save",
    "kn_load": "timing_explorer_spark.operators.kneser_ney:kn_load",
    "kn_train_per_lang": "timing_explorer_spark.operators.kneser_ney:kn_train_per_lang",
    "kn_perplexity_per_lang": "timing_explorer_spark.operators.kneser_ney:kn_perplexity_per_lang",
    "ngram_counts": "timing_explorer_spark.operators.kneser_ney:ngram_counts",
    "logreg_train": "timing_explorer_spark.operators.logreg:logreg_train",
    "logreg_score": "timing_explorer_spark.operators.logreg:logreg_score",
    "dsir_log_weights": "timing_explorer_spark.operators.dsir:dsir_log_weights",
    "dsir_resample": "timing_explorer_spark.operators.dsir:dsir_resample",
    "pca_fit": "timing_explorer_spark.operators.pca:pca_fit",
    "pca_project": "timing_explorer_spark.operators.pca:pca_project",
    "cluster_safe_split": "timing_explorer_spark.operators.splits:cluster_safe_split",
    "pq_train_codebooks": "timing_explorer_spark.operators.similarity:pq_train_codebooks",
    "pq_encode": "timing_explorer_spark.operators.similarity:pq_encode",
    "ivfpq_topk": "timing_explorer_spark.operators.similarity:ivfpq_topk",
    "ivf_residuals": "timing_explorer_spark.operators.similarity:ivf_residuals",
    # raw-crawl front-end
    "strip_html": "timing_explorer_spark.operators.html_extract:strip_html",
    "extract_main_text": "timing_explorer_spark.operators.html_extract:extract_main_text",
    "read_warc": "timing_explorer_spark.sources.warc:read_warc",
    "read_warc_stream": "timing_explorer_spark.sources.warc:read_warc_stream",
    "warc_records": "timing_explorer_spark.sources.warc:warc_records",
    "gzip_warc_record": "timing_explorer_spark.sources.warc:gzip_warc_record",
    "canonicalize_url": "timing_explorer_spark.operators.html_extract:canonicalize_url",
    "squeeze_repeats": "timing_explorer_spark.functions.text:squeeze_repeats",
    "fix_mojibake": "timing_explorer_spark.functions.text:fix_mojibake",
    # temporal joins
    "asof_join": "timing_explorer_spark.operators.joins:asof_join",
    "interval_pairs": "timing_explorer_spark.operators.joins:interval_pairs",
    # skew / layout
    "salted_join": "timing_explorer_spark.operators.skew:salted_join",
    "salted_agg": "timing_explorer_spark.operators.skew:salted_agg",
    "compact_parquet": "timing_explorer_spark.operators.layout:compact_parquet",
    # multimodal
    "media_perceptual_hashes": "timing_explorer_spark.multimodal.phash:media_perceptual_hashes",
    "phash_neardup_pairs": "timing_explorer_spark.multimodal.phash:phash_neardup_pairs",
    # streaming
    "dedup_stream": "timing_explorer_spark.streaming.pipeline:dedup_stream",
    "minhash_dedup_stream": "timing_explorer_spark.streaming.lsh_dedup:minhash_dedup_stream",
    "paragraph_dedup_stream": "timing_explorer_spark.streaming.paragraph_dedup:paragraph_dedup_stream",
}

__all__ = ["__version__", *sorted(_EXPORTS)]


def __getattr__(name: str):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    mod_name, attr = target.split(":")
    value = getattr(importlib.import_module(mod_name), attr)
    globals()[name] = value  # cache: next access skips __getattr__
    return value


def __dir__():
    return __all__
