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


def test_orc_roundtrip(spark, sf_smoke, tmp_path):
    """ORC round-trip with schema + value fidelity (the other columnar
    format large estates actually hold; reader/writer are Spark-native)."""
    out = str(tmp_path / "orc")
    src = load(spark, sf_smoke, "orders")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_binaryfile_media_ingestion(spark, tmp_path):
    """The real multimodal ingest path: opaque files on disk read via the
    native binaryFile source (path/length/content columns), fingerprinted
    through the same Arrow mapInPandas operator as the media table."""
    import hashlib

    from timing_explorer_spark.multimodal.binary_ops import media_fingerprints

    blobs = {f"m{i}.bin": bytes([i]) * (100 + i) for i in range(8)}
    for fname, payload in blobs.items():
        (tmp_path / fname).write_bytes(payload)
    raw = spark.read.format("binaryFile").load(str(tmp_path) + "/*.bin")
    media = raw.select(
        F.regexp_extract(F.input_file_name(), r"m(\d+)\.bin", 1).cast("long").alias("media_id"),
        F.col("content").alias("payload"),
    )
    fps = {r["media_id"]: (r["n_bytes"], r["fp_md5"]) for r in media_fingerprints(media).collect()}
    assert len(fps) == 8
    for fname, payload in blobs.items():
        mid = int(fname[1:-4])
        assert fps[mid] == (len(payload), hashlib.md5(payload).hexdigest())
