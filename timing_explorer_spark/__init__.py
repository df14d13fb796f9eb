"""timing_explorer_spark — a PySpark-native analytics engine.

A from-scratch Spark (DataFrame / SQL / Structured Streaming) engine with the
query and data-processing capabilities of the reference project
``alpinegizmo/timing-explorer`` (a Flink time-semantics demo app; see
/root/reference), extended with a DuckDB-checkable relational query inventory
over TPC-H-ish tables and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal column plumbing), all designed for
multi-executor scale: broadcast joins for small dimensions, partial (map-side)
aggregation, predicate pushdown / column pruning via Catalyst, and AQE.

Layout:
  session     SparkSession builders with scale-appropriate defaults
  sources     deterministic generator (reference parity) + parquet table loaders
  functions   reusable column expressions (waveforms, text, vectors)
  operators   composed DataFrame operators (windows, dedup, similarity)
  plans       the declared query inventory (Spark builder + DuckDB oracle SQL)
  streaming   Structured Streaming pipeline = the reference's TimingExplorer job
  multimodal  binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
