"""Generator closed-form parity with the reference's stateful chain
(SURVEY §5: sawtooth/sine match closed form; timestamps advance 100 ms)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timing_explorer_spark.sources.generator import sensor_stream_batch


def test_closed_form_values(spark):
    rows = sensor_stream_batch(spark, n_events=50).collect()
    by_key = {"temp": {}, "pressure": {}}
    for r in rows:
        by_key[r.key][r.ts] = r.value
    assert len(by_key["temp"]) == 50 and len(by_key["pressure"]) == 50
    ts_sorted = sorted(by_key["temp"])
    for i, ts in enumerate(ts_sorted):
        # timestamps advance exactly 100 ms (TimestampSource.java:71-72)
        if i:
            assert (ts - ts_sorted[i - 1]).total_seconds() == 0.1
        expected_saw = (i % 10) / 10.0
        assert abs(by_key["temp"][ts] - expected_saw) < 1e-12
        assert abs(by_key["pressure"][ts] - math.sin(2 * math.pi * expected_saw)) < 1e-9


def test_partitioned_generation_is_identical(spark):
    """The generator must be partition-count invariant (pure projection —
    unlike the reference's parallelism-1 stateful source)."""
    one = set(map(tuple, sensor_stream_batch(spark, 200, num_partitions=1).collect()))
    many = set(map(tuple, sensor_stream_batch(spark, 200, num_partitions=16).collect()))
    assert one == many
