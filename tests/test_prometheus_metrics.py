"""Prometheus metrics export — the reference's Prometheus reporter parity
(flink-conf.yaml:26-28, README.md:53-62: Flink exposes per-operator metrics
on ports 9250-9260 for Prometheus+Grafana). Spark's PrometheusServlet
serves the same exposition format from the driver; with streaming metrics
enabled the per-query gauges (input/processed rates, state rows, watermark)
land in the same registry."""

from __future__ import annotations

import urllib.request


def test_prometheus_endpoint_serves_streaming_gauges(tmp_path):
    from pyspark.sql import SparkSession

    from timing_explorer_spark.streaming.metrics import prometheus_metrics_conf

    b = (
        SparkSession.builder.master("local[2]")
        .appName("prom-metrics-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in prometheus_metrics_conf(ui_port=4058).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    try:
        from timing_explorer_spark.streaming.pipeline import (
            event_time_windows,
            sensor_stream_from_files,
            write_generator_files,
        )

        data = str(tmp_path / "in")
        write_generator_files(spark, data, n_events=200, files=2)
        import time

        q = (
            event_time_windows(
                sensor_stream_from_files(spark, data, max_files_per_trigger=1)
            )
            .writeStream.format("noop")
            .queryName("pseudo_window")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            # per-query gauges exist only while the query runs — scrape live
            deadline = time.monotonic() + 45
            txt = ""
            while time.monotonic() < deadline and "pseudo_window" not in txt:
                time.sleep(0.5)
                txt = urllib.request.urlopen(
                    "http://localhost:4058/metrics/prometheus", timeout=15
                ).read().decode()
        finally:
            q.stop()
            q.awaitTermination()
        # exposition format with engine gauges
        assert 'type="gauges"' in txt
        assert "BlockManager_memory" in txt
        # the named streaming query's metrics are registered while running
        assert "pseudo_window" in txt
    finally:
        spark.stop()
