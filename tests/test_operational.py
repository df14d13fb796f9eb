"""Operational-reliability behaviors a 100 TB deployment leans on:
corrupt-file tolerance (a bad object in a million-file table must not
kill the scan when ops opts in) and additive schema evolution (new
ingest adds a column; old files stay readable)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_ignore_corrupt_files_opt_in(spark, tmp_path):
    """One corrupt object among good parquet files: default read fails
    loudly (correctness first); with ignoreCorruptFiles the scan survives
    and returns every valid row — the opt-in degraded mode for
    petabyte-scale backfills where a handful of bad objects is routine."""
    d = tmp_path / "table"
    spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")).coalesce(
        2
    ).write.parquet(str(d))
    (d / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet PAR1")

    with pytest.raises(Exception):
        spark.read.parquet(str(d)).count()

    saved = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        out = spark.read.parquet(str(d))
        assert out.count() == 100
        assert out.agg(F.sum("v")).collect()[0][0] == 2 * (99 * 100 // 2)
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", saved)


def test_additive_schema_evolution_merge(spark, tmp_path):
    """Ingest adds a column mid-stream: mergeSchema reads old + new files as
    one table, old rows NULL in the new column; without mergeSchema the
    picked footer wins (documented Spark behavior) — the engine's loaders
    pass paths straight through, so evolved layouts need no code change."""
    d = tmp_path / "evolving"
    spark.range(50).select(F.col("id"), F.lit("a").alias("src")).write.parquet(
        str(d / "batch=1")
    )
    spark.range(50, 80).select(
        F.col("id"), F.lit("b").alias("src"), (F.col("id") % 7).alias("quality")
    ).write.parquet(str(d / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(d / "batch=1"), str(d / "batch=2")
    )
    assert set(merged.columns) == {"id", "src", "quality"}
    assert merged.count() == 80
    nulls = merged.where(F.col("quality").isNull()).count()
    assert nulls == 50  # every pre-evolution row
    assert merged.where(F.col("src") == "b").agg(F.count("quality")).collect()[0][0] == 30
