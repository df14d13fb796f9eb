"""The reference's TimingExplorer job, re-expressed in Structured Streaming.

Reference wiring (/root/reference/src/main/java/com/ververica/jobs/
TimingExplorer.java:109-152 and :83-103): stateful source → watermarks →
sawtooth → {temp, sine→pressure} → union → three sinks:
  sensors                  raw stream
  eventsPerSecond          keyed 1 s tumbling count, EVENT time   (deterministic)
  eventsProcessedPerSecond keyed 1 s tumbling count, PROCESSING time (not)

Spark design decisions (SURVEY.md §4.3):
 - The generator is a closed-form projection (sources/generator.py); in
   streaming tests we materialize it to parquet and readStream the files so
   AvailableNow gives bounded, replayable micro-batches with real source
   offsets (recovery = checkpoint offsets, replacing Flink ListState).
 - Event-time window: withWatermark + window() groupBy — semantically exact
   vs PseudoWindow in event-time mode; results appear one micro-batch later
   than Flink's per-event timers (watermark advances between batches), same
   final table. Window label = end-inclusive (end - 1 ms, PseudoWindow.java:82).
 - Processing-time window: PseudoWindow's proc-time mode buckets by wall
   clock at processing moment (PseudoWindow.java:79-80,86-87) and is
   *deliberately* non-deterministic. No declarative equivalent exists in
   Structured Streaming; we reproduce it with foreachBatch arrival-time
   bucketing: each micro-batch's rows are counted into the wall-clock second
   at which the batch processes them. Partial counts for the same
   (bucket, key) across adjacent batches are summed by the idempotent sink's
   read-side aggregation — same semantics: counts depend on arrival timing.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.generator import sensor_stream_batch


def sensor_stream_from_files(
    spark: SparkSession,
    data_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-based replay of the generator output: bounded, deterministic,
    multi-batch (one parquet file per micro-batch with the default
    maxFilesPerTrigger=1), with real offset tracking for recovery tests."""
    from ..session import ensure_confs

    ensure_confs(spark)
    reader = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(data_dir)


def write_generator_files(
    spark: SparkSession,
    data_dir: str,
    n_events: int = 600,
    files: int = 10,
    start_ts: str = "2024-01-01 00:00:00",
    first_event: int = 0,
) -> None:
    """Materialize the closed-form generator as ``files`` parquet files
    written SEQUENTIALLY in event-time order. The file source orders batches
    by modification time, so sequential writes guarantee in-order replay —
    the reference's in-order source assumption (TimestampSource.java:71-76)
    that makes the 0-lag watermark sound. (A single bulk write would leave
    file order nondeterministic; with a 0 s watermark, out-of-order files
    would be dropped as late — observed as silently missing windows.)

    ``first_event`` > 0 appends a later slice of the same closed-form stream
    (for recovery tests)."""
    import datetime as _dt
    import math

    from ..session import ensure_confs

    ensure_confs(spark)
    df = sensor_stream_batch(spark, n_events=n_events, start_ts=start_ts)
    base = _dt.datetime.fromisoformat(start_ts)
    total = n_events - first_event
    chunk = math.ceil(total / files)
    for i in range(files):
        lo = first_event + i * chunk
        hi = min(lo + chunk, n_events)
        if lo >= hi:
            break
        # Boundaries as STRING literals through to_timestamp: python datetime
        # literals convert via the process-local timezone, while the ts column
        # (to_timestamp of a string) uses the session timezone — mixing the
        # two silently empties the filter under a non-UTC session.
        t_lo = (base + _dt.timedelta(milliseconds=100 * lo)).strftime("%Y-%m-%d %H:%M:%S.%f")
        t_hi = (base + _dt.timedelta(milliseconds=100 * hi)).strftime("%Y-%m-%d %H:%M:%S.%f")
        df.where(
            (F.col("ts") >= F.to_timestamp(F.lit(t_lo)))
            & (F.col("ts") < F.to_timestamp(F.lit(t_hi)))
        ).coalesce(1).write.mode("append").parquet(data_dir)


def event_time_windows(
    sensors: DataFrame, duration: str = "1 second", watermark: str = "0 seconds"
) -> DataFrame:
    """PseudoWindow, event-time mode: keyed tumbling count windows.

    Zero-lag watermark matches SensorDataWatermarkAssigner.java:27-41
    (watermark = last seen event time; the source is in-order by
    construction, so no events are ever late)."""
    return (
        sensors.withWatermark("ts", watermark)
        .groupBy(F.col("key"), F.window("ts", duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            (F.col("w.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("window_end_label"),
            F.col("n_events").alias("value"),
        )
    )


def dedup_stream(
    sensors: DataFrame,
    keys: tuple[str, ...] = ("key",),
    watermark: str = "10 seconds",
    bounded_state: bool = True,
) -> DataFrame:
    """Streaming exact-dedup at ingest — the arrival-time counterpart of the
    batch ``operators/dedup.py`` family (an LLM pipeline dedups documents as
    they land, not after).

    ``bounded_state=True`` (the only mode that survives an unbounded stream /
    100 TB ingest) uses ``dropDuplicatesWithinWatermark``: a key's dedup
    fingerprint is held ONLY until the watermark passes its event time +
    delay, so state size is bounded by the arrival rate x watermark horizon
    — the trade is that a duplicate arriving after eviction is re-emitted
    (pinned in tests/test_streaming_dedup.py). ``bounded_state=False`` uses
    plain ``dropDuplicates``: exact forever, but state grows with the
    distinct-key count — acceptable only for bounded backfill replays.
    """
    wm = sensors.withWatermark("ts", watermark)
    cols = list(keys)
    if bounded_state:
        return wm.dropDuplicatesWithinWatermark(cols)
    return wm.dropDuplicates(cols)


def m4_windows(sensors: DataFrame, duration: str = "1 second", watermark: str = "0 seconds") -> DataFrame:
    """Continuous M4 downsampling (VLDB'14) over the sensor stream: per
    (key, tumbling window) emit n/min/max/first/last — the streaming form of
    the batch ``q_m4_downsample`` operator, i.e. a continuously-maintained
    render-ready aggregate for the reference's Grafana dashboards (the
    dashboards re-aggregate with GROUP BY time($__interval);
    dashboard.json:295-331 — M4 is that operation done right).

    first/last use min_by/max_by on event time, which Structured Streaming
    maintains incrementally in state; append mode + watermark seals each
    window exactly once. The source is in-order per key by construction, so
    (ts) is a sufficient order key here (batch M4 over the events table uses
    (ts, event_id) because that table has no in-order guarantee)."""
    return (
        sensors.withWatermark("ts", watermark)
        .groupBy(F.col("key"), F.window("ts", duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", "ts").alias("v_first"),
            F.max_by("value", "ts").alias("v_last"),
        )
        .select(
            "key",
            (F.col("w.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("window_end_label"),
            "n",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
        )
    )


def processing_time_counts_foreach_batch(output_table_dir: str, duration_ms: int = 1000):
    """foreachBatch function reproducing PseudoWindow's processing-time mode:
    every row is credited to the wall-clock bucket in which this micro-batch
    runs (PseudoWindow.java:79-80: bucket = System.currentTimeMillis()
    rounded into the window). Emits end-inclusive labels like the reference.

    Returns partial counts per (batch); read back with
    ``read_processing_time_counts`` which sums partials per (key, bucket) —
    arrival-time-dependent, hence non-deterministic, which is the point
    (README.md:41-44)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        now_ms = int(time.time() * 1000)
        bucket_end = now_ms - (now_ms % duration_ms) + duration_ms - 1
        (
            batch_df.groupBy("key")
            .agg(F.count(F.lit(1)).alias("value"))
            .withColumn("window_end_label", F.timestamp_millis(F.lit(bucket_end)))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_table_dir)
        )

    return fn


def read_processing_time_counts(spark: SparkSession, output_table_dir: str) -> DataFrame:
    """Read-side merge of per-batch partial counts -> final proc-time window
    table (key, window_end_label, value)."""
    return (
        spark.read.parquet(output_table_dir)
        .groupBy("key", "window_end_label")
        .agg(F.sum("value").alias("value"))
    )


def run_pipeline_available_now(
    spark: SparkSession,
    data_dir: str,
    checkpoint_dir: str,
    sinks_dir: str,
    duration: str = "1 second",
) -> dict[str, str]:
    """Wire the full job (sensors + event-time windows + proc-time windows)
    as three concurrent AvailableNow queries over the same file source —
    mirroring the reference's three-sink fan-out (TimingExplorer.java:83-103),
    each with its own checkpoint (sink wiring row, SURVEY §2 row 10).

    Returns {measurement: output_dir}. Blocks until all three finish."""
    sensors = sensor_stream_from_files(spark, data_dir)
    out = {
        "sensors": f"{sinks_dir}/sensors",
        "eventsPerSecond": f"{sinks_dir}/eventsPerSecond",
        "eventsProcessedPerSecond": f"{sinks_dir}/eventsProcessedPerSecond",
    }

    q_raw = (
        sensors.writeStream.format("parquet")
        .option("path", out["sensors"])
        .option("checkpointLocation", f"{checkpoint_dir}/sensors")
        .trigger(availableNow=True)
        .start()
    )
    q_evt = (
        event_time_windows(sensors, duration)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out["eventsPerSecond"])
        .option("checkpointLocation", f"{checkpoint_dir}/eventsPerSecond")
        .trigger(availableNow=True)
        .start()
    )
    q_proc = (
        sensors.writeStream.foreachBatch(
            processing_time_counts_foreach_batch(out["eventsProcessedPerSecond"])
        )
        .option("checkpointLocation", f"{checkpoint_dir}/eventsProcessedPerSecond")
        .trigger(availableNow=True)
        .start()
    )
    for q in (q_raw, q_evt, q_proc):
        q.awaitTermination()
    return out



def session_windows_stream(
    sensors: DataFrame, gap: str = "5 seconds", watermark: str = "0 seconds"
) -> DataFrame:
    """Keyed SESSION windows over the stream — the window type the reference
    lacks entirely (SURVEY §2.2: tumbling only, PseudoWindow.java:82) but a
    general engine must offer. ``session_window(ts, gap)`` maintains merging
    session state incrementally; append mode + watermark seals a session
    only once the watermark passes its end + gap, so each (key, session) is
    emitted exactly once with its final extent. Batch equivalence: the same
    expression over the collected rows (pinned in
    tests/test_streaming_sessions.py); the batch oracle-backed counterpart
    over raw events is ``q_session_windows``.

    Scale: state is per (key, open session) — bounded by key cardinality x
    sessions inside the watermark horizon, merged in the state store, one
    shuffle on key. Same plan shape a 1000-executor deployment runs.
    """
    return (
        sensors.withWatermark("ts", watermark)
        .groupBy(F.col("key"), F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            "key",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )
