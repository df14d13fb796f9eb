"""File-format interop: the engine's tables round-trip through CSV and JSON
with explicit schemas (no inference in production paths) and partitioned
parquet — the source/sink surface beyond the fixtures' parquet.

The reference has exactly one connector (InfluxDB out —
/root/reference/src/main/java/com/ververica/sinks/InfluxDBSink.java); the
line-protocol analog is covered in tests/test_influx_sink.py. These tests
cover the generic batch formats a Spark-first engine gets natively."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from timing_explorer_spark.sources.tables import load

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _events(spark, sf_smoke):
    # timestamp_ntz -> timestamp for format-generic round-trips
    return load(spark, sf_smoke, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _assert_same(a, b):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_csv_roundtrip_explicit_schema(spark, sf_smoke, tmp_path):
    e = _events(spark, sf_smoke)
    path = str(tmp_path / "events_csv")
    (
        e.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )
    back = (
        spark.read.schema(SCHEMA)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )
    _assert_same(e, back)


def test_json_roundtrip_explicit_schema(spark, sf_smoke, tmp_path):
    e = _events(spark, sf_smoke)
    path = str(tmp_path / "events_json")
    (
        e.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )
    back = (
        spark.read.schema(SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )
    _assert_same(e, back)


def test_json_preserves_embedded_json_string(spark, sf_smoke, tmp_path):
    """props carries a JSON document AS A STRING; the JSON sink must not
    double-encode or inline it."""
    e = _events(spark, sf_smoke).limit(50)
    path = str(tmp_path / "props_json")
    e.write.mode("overwrite").json(path)
    back = spark.read.schema(SCHEMA).json(path)
    got = {r["event_id"]: r["props"] for r in back.collect()}
    want = {r["event_id"]: r["props"] for r in e.collect()}
    assert got == want
    assert any(v and v.startswith("{") for v in want.values())
