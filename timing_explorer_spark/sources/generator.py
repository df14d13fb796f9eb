"""Deterministic sensor-stream generator — reference-source parity.

The reference synthesizes its input with a stateful Flink source + stateful
map chain (/root/reference/src/main/java/com/ververica/sources/
TimestampSource.java:29-104 emits one event per 100 ms with a synthetic clock
floored to a second boundary; functions/SawtoothFunction.java:30-79 keeps a
step counter in ListState; functions/SineWaveFunction.java:27-33 and
functions/AssignKeyFunction.java:24-36 are pure; jobs/TimingExplorer.java:
122-151 wires source → sawtooth → {temp, sine→pressure} → union).

Spark-first design: because the synthetic clock advances by *exactly*
``period_ms`` per event, every value is a closed-form function of the event
index — so the operator state dissolves into a ``select`` over a range/rate
source. This is both simpler and scale-correct: a pure projection
parallelizes over any number of partitions with zero state and zero shuffle,
whereas a stateful per-event source is parallelism-1 by construction.

  ts(i)       = floor(start, 1s) + i * period_ms          (TimestampSource.java:56-57,71-72)
  sawtooth(i) = (i % num_steps) / num_steps               (SawtoothFunction.java:72-77)
  sine(i)     = sin(2π * sawtooth(i))                     (SineWaveFunction.java:29-32)
  keys        = 'temp' (sawtooth), 'pressure' (sine)      (TimingExplorer.java:137,144)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PERIOD_MS = 100  # TimestampSource wired with (100, 1): TimingExplorer.java:118-119
DEFAULT_NUM_STEPS = 10  # SawtoothFunction wired with 10: TimingExplorer.java:130-133
DEFAULT_START_TS = "2024-01-01 00:00:00"  # tests pin the clock; already second-aligned

TWO_PI = 2.0 * math.pi


def _waveforms(base: DataFrame, period_ms: int, num_steps: int) -> DataFrame:
    """From (i, ts) build the unioned keyed sensor stream (key, ts, value)."""
    step = (F.col("i") % num_steps).cast("double") / float(num_steps)
    with_phase = base.withColumn("phase", step)
    temp = with_phase.select(
        F.lit("temp").alias("key"), F.col("ts"), F.col("phase").alias("value")
    )
    pressure = with_phase.select(
        F.lit("pressure").alias("key"),
        F.col("ts"),
        F.sin(F.col("phase") * F.lit(TWO_PI)).alias("value"),
    )
    # DataStream.union == UNION ALL (TimingExplorer.java:148-149)
    return temp.unionByName(pressure)


def sensor_stream_batch(
    spark: SparkSession,
    n_events: int = 600,
    period_ms: int = DEFAULT_PERIOD_MS,
    num_steps: int = DEFAULT_NUM_STEPS,
    start_ts: str = DEFAULT_START_TS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Bounded, deterministic sensor stream: 2*n_events rows of
    (key string, ts timestamp, value double). Partition-parallel: range() is
    split across the cluster and every derived column is a pure projection."""
    from ..session import ensure_confs

    ensure_confs(spark)
    base = (
        spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
        .withColumnRenamed("id", "i")
        .withColumn(
            "ts",
            F.timestamp_millis(
                F.unix_millis(F.to_timestamp(F.lit(start_ts))) + F.col("i") * period_ms
            ),
        )
    )
    return _waveforms(base, period_ms, num_steps)


def sensor_stream_streaming(
    spark: SparkSession,
    rows_per_batch: int = 10,
    period_ms: int = DEFAULT_PERIOD_MS,
    num_steps: int = DEFAULT_NUM_STEPS,
    start_ts: str = DEFAULT_START_TS,
) -> DataFrame:
    """Unbounded streaming variant over the rate-micro-batch source.

    ``rate-micro-batch`` emits a deterministic monotonically increasing
    ``value`` column — our event index — so the same closed-form projection
    applies. Recovery state is just source offsets in the checkpoint,
    replacing the reference's ListState clock (TimestampSource.java:44-65).
    """
    base = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
        .select(
            F.col("value").alias("i"),
            F.timestamp_millis(
                F.unix_millis(F.to_timestamp(F.lit(start_ts))) + F.col("value") * period_ms
            ).alias("ts"),
        )
    )
    return _waveforms(base, period_ms, num_steps)
