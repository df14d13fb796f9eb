"""Prometheus metrics export — the reference's Prometheus reporter parity
(flink-conf.yaml:26-28, README.md:53-62: Flink exposes per-operator metrics
on ports 9250-9260 for Prometheus+Grafana). Spark's PrometheusServlet
serves the same exposition format from the driver; with streaming metrics
enabled the per-query gauges land in the same registry.

Runs in a SUBPROCESS: the metrics system initializes with the
SparkContext, so the test needs its own session with build-time confs —
getOrCreate() inside the shared test JVM would silently reuse (and then
stop!) the session-scoped fixture's context and take the whole suite down
with it (observed: 338 downstream failures)."""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import sys, time, tempfile, urllib.request
sys.path.insert(0, "__REPO__")
from pyspark.sql import SparkSession
from timing_explorer_spark.streaming.metrics import prometheus_metrics_conf

b = (SparkSession.builder.master("local[2]")
     .appName("prom-metrics-test")
     .config("spark.sql.shuffle.partitions", "2")
     .config("spark.sql.session.timeZone", "UTC"))
for k, v in prometheus_metrics_conf(ui_port=4058).items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from timing_explorer_spark.streaming.pipeline import (
    event_time_windows, sensor_stream_from_files, write_generator_files)

root = tempfile.mkdtemp()
data = f"{root}/in"
write_generator_files(spark, data, n_events=200, files=2)
q = (event_time_windows(sensor_stream_from_files(spark, data, max_files_per_trigger=1))
     .writeStream.format("noop").queryName("pseudo_window")
     .option("checkpointLocation", f"{root}/ckpt")
     .trigger(processingTime="200 milliseconds").start())
try:
    deadline = time.monotonic() + 45
    txt = ""
    while time.monotonic() < deadline and "pseudo_window" not in txt:
        time.sleep(0.5)
        txt = urllib.request.urlopen(
            "http://localhost:4058/metrics/prometheus", timeout=15).read().decode()
finally:
    q.stop(); q.awaitTermination()
assert 'type="gauges"' in txt, "no exposition-format gauges"
assert "BlockManager_memory" in txt, "no engine gauges"
assert "pseudo_window" in txt, "named streaming query gauges missing"
print("PROM-OK")
spark.stop()
"""


def test_prometheus_endpoint_serves_streaming_gauges():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", repo)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, f"stdout={out.stdout[-2000:]}\nstderr={out.stderr[-2000:]}"
    assert "PROM-OK" in out.stdout


def test_nearest_rank_percentile():
    """Sink lag percentiles use nearest-rank (ceil(p*n)-1): p50 of 2 samples
    is the FIRST sample, not the max (ADVICE r5: int(p*n) sat one rank high)."""
    from timing_explorer_spark.streaming.metrics import nearest_rank

    assert nearest_rank([], 0.5) is None
    assert nearest_rank([7.0], 0.5) == 7.0
    assert nearest_rank([1.0, 9.0], 0.50) == 1.0          # was 9.0 pre-fix
    assert nearest_rank([1.0, 9.0], 0.95) == 9.0
    assert nearest_rank([1.0, 2.0, 3.0, 4.0], 0.50) == 2.0
    assert nearest_rank([1.0, 2.0, 3.0, 4.0], 0.75) == 3.0
    assert nearest_rank([1.0, 2.0, 3.0, 4.0], 0.99) == 4.0
    # n=100: p50 -> rank 50 (1-based) = index 49
    vals = [float(i) for i in range(100)]
    assert nearest_rank(vals, 0.50) == 49.0
    assert nearest_rank(vals, 0.95) == 94.0
