"""Line-protocol sink: exact byte format, tag escaping, idempotent batches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timing_explorer_spark.streaming.influx import (
    line_protocol_batch_writer,
    to_line_protocol,
)
from timing_explorer_spark.streaming.pipeline import (
    sensor_stream_from_files,
    write_generator_files,
)


def test_line_format_exact(spark):
    ts = dt.datetime(2024, 1, 1, 0, 0, 1, 500000)
    df = spark.createDataFrame(
        [("temp", ts, 0.5)], "key string, ts timestamp, value double"
    )
    [row] = df.select(to_line_protocol("sensors").alias("l")).collect()
    # ms-precision epoch for 2024-01-01T00:00:01.500 UTC
    epoch_ms = int(dt.datetime(2024, 1, 1, 0, 0, 1, 500000, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert row["l"] == f"sensors,key=temp value=0.5 {epoch_ms}"


def test_line_format_unkeyed_and_escaping(spark):
    ts = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("room 1,a=b", ts, 2.0)], "key string, ts timestamp, value double"
    )
    [keyed] = df.select(to_line_protocol("m").alias("l")).collect()
    assert keyed["l"].startswith("m,key=room\\ 1\\,a\\=b value=2.0 ")
    [unkeyed] = df.select(to_line_protocol("m", key=None).alias("l")).collect()
    assert unkeyed["l"].startswith("m value=2.0 ")


def test_streaming_sink_writes_lines(spark, tmp_path):
    data = str(tmp_path / "input")
    write_generator_files(spark, data, n_events=100, files=2)
    q = (
        sensor_stream_from_files(spark, data)
        .writeStream.foreachBatch(line_protocol_batch_writer(str(tmp_path / "lines"), "sensors"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    lines = spark.read.text(str(tmp_path / "lines")).collect()
    assert len(lines) == 200  # 100 events x 2 keys
    import re

    pat = re.compile(r"^sensors,key=(temp|pressure) value=-?\d+(\.\d+)?(E-?\d+)? \d{13}$")
    for r in lines[:20]:
        assert pat.match(r["value"]), r["value"]
