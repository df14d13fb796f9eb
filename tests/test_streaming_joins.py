"""Streaming joins: stream-stream (watermarked interval equi-join) and
stream-static enrichment — the streaming shapes beyond the reference's
single-stream pipeline that a Spark-first engine provides natively."""

from __future__ import annotations

from pyspark.sql import functions as F

from timing_explorer_spark.streaming.pipeline import (
    sensor_stream_from_files,
    write_generator_files,
)


def test_stream_stream_interval_join(spark, tmp_path):
    """temp and pressure sub-streams of the same generator joined on exact
    event time: every temp reading pairs with exactly the one pressure
    reading at the same timestamp (the generator emits both per tick)."""
    data = str(tmp_path / "input")
    write_generator_files(spark, data, n_events=200, files=4)

    src = sensor_stream_from_files(spark, data)
    temp = (
        src.where(F.col("key") == "temp")
        .select(F.col("ts").alias("t_ts"), F.col("value").alias("t_val"))
        .withWatermark("t_ts", "5 seconds")
    )
    pressure = (
        src.where(F.col("key") == "pressure")
        .select(F.col("ts").alias("p_ts"), F.col("value").alias("p_val"))
        .withWatermark("p_ts", "5 seconds")
    )
    joined = temp.join(
        pressure,
        F.expr("t_ts = p_ts"),
        "inner",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 200  # one pair per tick
    # Pair correctness: pressure = sin(2*pi*temp) at every joined tick.
    import math

    bad = out.where(
        F.abs(F.col("p_val") - F.sin(F.col("t_val") * F.lit(2 * math.pi))) > 1e-9
    ).count()
    assert bad == 0


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream enriched against a static dimension (broadcast per micro-batch,
    no streaming state): the standard lookup-join shape."""
    data = str(tmp_path / "input")
    write_generator_files(spark, data, n_events=100, files=2)
    dim = spark.createDataFrame(
        [("temp", "celsius"), ("pressure", "bar")], "key string, unit string"
    )
    q = (
        sensor_stream_from_files(spark, data)
        .join(F.broadcast(dim), "key")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 200
    units = {(r["key"], r["unit"]) for r in out.select("key", "unit").distinct().collect()}
    assert units == {("temp", "celsius"), ("pressure", "bar")}
