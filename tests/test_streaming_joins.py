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


def test_stream_stream_left_outer_join_null_extension(spark, tmp_path):
    """Stream-stream LEFT OUTER join: unmatched left rows must be emitted
    null-extended once the watermark passes their join window — the state
    eviction path (Spark buffers the left side until it can PROVE no match
    will arrive; without watermark-driven eviction the state grows
    unboundedly and unmatched rows never emit). Join every temp reading to
    pressure readings at the same tick SHIFTED by a condition that matches
    only half the ticks."""
    data = str(tmp_path / "input")
    write_generator_files(spark, data, n_events=200, files=4)

    src = sensor_stream_from_files(spark, data)
    temp = (
        src.where(F.col("key") == "temp")
        .select(F.col("ts").alias("t_ts"), F.col("value").alias("t_val"))
        .withWatermark("t_ts", "2 seconds")
    )
    # Pressure rows only for even seconds: odd-second temps have no match.
    pressure = (
        src.where((F.col("key") == "pressure") & (F.second("ts") % 2 == 0))
        .select(F.col("ts").alias("p_ts"), F.col("value").alias("p_val"))
        .withWatermark("p_ts", "2 seconds")
    )
    joined = temp.join(
        pressure,
        F.expr("t_ts = p_ts AND p_ts >= t_ts - INTERVAL 1 SECOND AND p_ts <= t_ts + INTERVAL 1 SECOND"),
        "left_outer",
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
    # End-of-stream semantics: rows inside the final watermark window stay
    # buffered (nothing arrives to push the watermark past them), so the
    # emitted set is all 200 minus at most the tail few seconds' worth of
    # rows (10 ticks/s; 2s delay + batch-boundary slack). No duplicates.
    n = out.count()
    assert 200 - 40 <= n <= 200, n
    assert out.select("t_ts").distinct().count() == n, "no duplicate emissions"
    matched = out.where(F.col("p_val").isNotNull())
    unmatched = out.where(F.col("p_val").isNull())
    assert unmatched.count() > 0, "watermark must emit null-extended rows"
    # Parity invariant: matched iff the tick's second is even.
    assert matched.where(F.second("t_ts") % 2 != 0).count() == 0
    assert unmatched.where(F.second("t_ts") % 2 == 0).count() == 0
    # Held-back rows are exclusively from the stream tail.
    max_ts = out.agg(F.max("t_ts")).collect()[0][0]
    emitted_odd = {r[0] for r in unmatched.select("t_ts").collect()}
    all_src = spark.read.parquet(data).where(F.col("key") == "temp")
    held = all_src.where(
        (F.second("ts") % 2 != 0)
        & ~F.col("ts").isin(*emitted_odd)
    )
    import datetime
    tail_floor = max_ts - datetime.timedelta(seconds=5)
    assert held.where(F.col("ts") < tail_floor).count() == 0, (
        "non-tail unmatched rows must have been emitted"
    )
