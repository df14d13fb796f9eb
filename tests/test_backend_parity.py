"""State-backend parity (SURVEY §5 row 4): the same windowed pipeline under
the default HDFS-backed state store and under RocksDB must produce identical
results — the property that makes the reference's ChangeBackend migration job
dissolve into a configuration flip (SURVEY §2 row 15)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timing_explorer_spark.streaming.pipeline import (
    event_time_windows,
    sensor_stream_from_files,
    write_generator_files,
)
from timing_explorer_spark.streaming.state import rocksdb_state_conf

N_EVENTS = 300


def _run_windows(spark, data, out, ckpt):
    q = (
        event_time_windows(sensor_stream_from_files(spark, data))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_hdfs_vs_rocksdb_identical_windows(spark, tmp_path):
    data = str(tmp_path / "input")
    write_generator_files(spark, data, n_events=N_EVENTS, files=6)

    # Default (HDFS-backed) provider.
    _run_windows(spark, data, str(tmp_path / "out_hdfs"), str(tmp_path / "ckpt_hdfs"))

    # RocksDB provider — session-scoped conf, restored afterwards.
    saved = {}
    for k, v in rocksdb_state_conf().items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        _run_windows(spark, data, str(tmp_path / "out_rocks"), str(tmp_path / "ckpt_rocks"))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    hdfs = spark.read.parquet(str(tmp_path / "out_hdfs")).select(
        "key", "window_end_label", F.col("value").cast("long").alias("value")
    )
    rocks = spark.read.parquet(str(tmp_path / "out_rocks")).select(
        "key", "window_end_label", F.col("value").cast("long").alias("value")
    )
    assert hdfs.count() > 0
    assert hdfs.exceptAll(rocks).count() == 0
    assert rocks.exceptAll(hdfs).count() == 0
    # And the invariant holds under both backends.
    assert hdfs.where(F.col("value") != 10).count() == 0
