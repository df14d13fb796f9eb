"""applyInPandasWithState PseudoWindow parity (SURVEY §2 row 8, low level).

The stateful operator must reproduce both the reference invariant (exactly
10 events per complete 1 s window per key) and the declarative
event_time_windows output — same rows, same end-inclusive labels.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timing_explorer_spark.streaming.pipeline import (
    event_time_windows,
    sensor_stream_from_files,
    write_generator_files,
)
from timing_explorer_spark.streaming.stateful import pseudo_window_stateful

N_EVENTS = 400


@pytest.fixture(scope="module")
def stateful_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stateful")
    data = str(root / "input")
    write_generator_files(spark, data, n_events=N_EVENTS, files=8)

    sensors = sensor_stream_from_files(spark, data)
    q = (
        pseudo_window_stateful(sensors, duration_ms=1000)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(root / "out"))
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"root": root, "data": data, "out": str(root / "out")}


def test_stateful_exactly_ten_per_window(spark, stateful_run):
    rows = spark.read.parquet(stateful_run["out"]).collect()
    assert rows, "stateful operator emitted nothing"
    for r in rows:
        assert r["value"] == 10, f"{r['key']} @ {r['window_end_label']}: {r['value']}"
    keys = {r["key"] for r in rows}
    assert keys == {"temp", "pressure"}


def test_stateful_matches_declarative(spark, stateful_run, tmp_path):
    """Same input through the declarative window — identical emitted rows
    (both paths withhold the watermark-tail windows, so the complete sets
    are directly comparable)."""
    sensors = sensor_stream_from_files(spark, stateful_run["data"])
    q = (
        event_time_windows(sensors, "1 second")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(tmp_path / "decl"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    decl = spark.read.parquet(str(tmp_path / "decl")).select(
        "key", "window_end_label", F.col("value").cast("long").alias("value")
    )
    stateful = spark.read.parquet(stateful_run["out"]).select(
        "key", "window_end_label", F.col("value").cast("long").alias("value")
    )
    only_decl = decl.exceptAll(stateful).collect()
    only_state = stateful.exceptAll(decl).collect()
    assert not only_decl and not only_state, (
        f"declarative-only: {only_decl[:3]}, stateful-only: {only_state[:3]}"
    )


def test_stateful_window_labels_end_inclusive(spark, stateful_run):
    """Labels are window start + 999 ms (PseudoWindow.java:82)."""
    rows = spark.read.parquet(stateful_run["out"]).collect()
    for r in rows:
        ms = int(r["window_end_label"].timestamp() * 1000)
        assert ms % 1000 == 999, f"label {r['window_end_label']} not end-inclusive"
