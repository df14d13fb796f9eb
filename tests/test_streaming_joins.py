"""Stream-stream interval join semantics (streaming/joins.py) — pinned on
pyspark 4.1: batch equivalence of the inner join across micro-batch
boundaries, the left-outer emit-on-watermark contract, and bounded join
state (eviction driven by watermark + interval, the 100 TB property).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from chaos_util import kill_chaos_run
from timing_explorer_spark.streaming.joins import (
    interval_join_batch,
    interval_join_streams,
)
from timing_explorer_spark.streaming.pipeline import sensor_stream_from_files


def _write_batch(spark, path: str, rows: list[tuple[str, str, float]]) -> None:
    df = spark.createDataFrame(rows, ["key", "ts", "value"]).select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # file-source batch order follows modification time


def _run(spark, ldir, rdir, outdir, ckpt, how="inner", **kw):
    l = sensor_stream_from_files(spark, ldir, max_files_per_trigger=1)
    r = sensor_stream_from_files(spark, rdir, max_files_per_trigger=1)
    out = interval_join_streams(l, r, how=how, **kw)
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = list(q.recentProgress)
    rows = sorted(
        spark.read.parquet(outdir).collect(),
        key=lambda x: (x["key"], x["left_ts"], x["right_ts"] or x["left_ts"]),
    )
    return rows, progress


def _key(r):
    return (r["key"], r["left_ts"], r["left_value"], r["right_ts"], r["right_value"])


def test_inner_join_matches_batch_across_microbatches(spark, tmp_path):
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    # left events at t=10 and t=30; right spread across separate files so the
    # join must match across micro-batch boundaries through state
    _write_batch(spark, ldir, [("a", "2024-01-01 00:00:10", 1.0)])
    _write_batch(spark, rdir, [("a", "2024-01-01 00:00:12", 100.0)])
    _write_batch(spark, ldir, [("a", "2024-01-01 00:00:30", 2.0), ("b", "2024-01-01 00:00:30", 3.0)])
    _write_batch(
        spark,
        rdir,
        [
            ("a", "2024-01-01 00:00:14", 101.0),  # still in [10, 15] for l@10
            ("a", "2024-01-01 00:00:31", 102.0),
            ("b", "2024-01-01 00:00:36", 103.0),  # boundary: exactly +6s -> out
        ],
    )
    got, _ = _run(
        spark,
        ldir,
        rdir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        lower="0 seconds",
        upper="5 seconds",
        watermark="20 seconds",
    )
    lb = spark.read.parquet(ldir)
    rb = spark.read.parquet(rdir)
    want = sorted(
        interval_join_batch(lb, rb, lower="0 seconds", upper="5 seconds").collect(),
        key=lambda x: (x["key"], x["left_ts"], x["right_ts"]),
    )
    assert [_key(r) for r in got] == [_key(r) for r in want]
    # sanity on the fixture itself: 3 matches, the +6s right row excluded
    assert len(got) == 3
    assert all(r["right_value"] != 103.0 for r in got)


def test_left_outer_emits_null_after_watermark(spark, tmp_path):
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    # 'lonely' never gets a right match; 'a' does
    _write_batch(
        spark,
        ldir,
        [("a", "2024-01-01 00:00:10", 1.0), ("lonely", "2024-01-01 00:00:10", 5.0)],
    )
    _write_batch(spark, rdir, [("a", "2024-01-01 00:00:11", 50.0)])
    # late traffic on BOTH sides pushes both watermarks far past 10s+interval
    _write_batch(spark, ldir, [("z", "2024-01-01 00:05:00", 0.0)])
    _write_batch(spark, rdir, [("z2", "2024-01-01 00:05:00", 0.0)])
    got, _ = _run(
        spark,
        ldir,
        rdir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        how="leftOuter",
        lower="0 seconds",
        upper="5 seconds",
        watermark="10 seconds",
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append(r)
    assert [r["right_value"] for r in by_key["a"]] == [50.0]
    # the unmatched left row DID emit, with nulls, once provably unmatched
    assert len(by_key["lonely"]) == 1
    assert by_key["lonely"][0]["right_ts"] is None
    assert by_key["lonely"][0]["right_value"] is None
    # 'z' unmatched too but its watermark horizon may not have closed by the
    # final micro-batch — do not assert on it (pinning only the closed case)


def test_join_state_is_bounded_by_watermark(spark, tmp_path):
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    # 40 early rows per side, then a far-future row advancing the watermark:
    # all early state is evictable before the last micro-batch
    early_l = [(f"k{i}", "2024-01-01 00:00:10", float(i)) for i in range(40)]
    early_r = [(f"k{i}", "2024-01-01 00:00:11", float(i)) for i in range(40)]
    _write_batch(spark, ldir, early_l)
    _write_batch(spark, rdir, early_r)
    _write_batch(spark, ldir, [("adv", "2024-01-01 01:00:00", 0.0)])
    _write_batch(spark, rdir, [("adv2", "2024-01-01 01:00:00", 0.0)])
    _write_batch(spark, ldir, [("adv3", "2024-01-01 02:00:00", 0.0)])
    _write_batch(spark, rdir, [("adv4", "2024-01-01 02:00:00", 0.0)])
    got, progress = _run(
        spark,
        ldir,
        rdir,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        lower="0 seconds",
        upper="5 seconds",
        watermark="10 seconds",
    )
    assert len(got) == 40  # every early pair matched
    state_rows = [
        op["numRowsTotal"]
        for p in progress
        for op in (p.get("stateOperators") or [])
        if "numRowsTotal" in op
    ]
    assert state_rows, "no state metrics reported"
    # final micro-batch: the 80 early rows are gone; only the handful of
    # watermark-advancer rows may remain buffered
    assert state_rows[-1] <= 8, state_rows


def test_join_kill_restart_exactly_once(spark, tmp_path):
    """Chaos soak for the stream-stream join: a live (ProcessingTime) run is
    killed mid-stream on the same checkpoint several times; after the final
    drain the joined output must equal the batch interval join over the full
    inputs EXACTLY — join state, source offsets, and the idempotent sink all
    recover with nothing lost and nothing doubled."""
    import time as _t

    from timing_explorer_spark.streaming.pipeline import write_generator_files

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    outdir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    # 2000 events per key at 100 ms -> 200 s of data, 10 files per side
    write_generator_files(spark, ldir, n_events=2000, files=10)
    write_generator_files(spark, rdir, n_events=2000, files=10)

    def start(trigger_kwargs):
        l = sensor_stream_from_files(spark, ldir, max_files_per_trigger=1)
        r = sensor_stream_from_files(spark, rdir, max_files_per_trigger=1)
        out = interval_join_streams(
            l, r, lower="0 seconds", upper="0.2 seconds", watermark="2 seconds"
        )
        return (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    for cycle in range(3):
        q = start({"processingTime": "50 milliseconds"})
        deadline = _t.monotonic() + 0.8 + 0.3 * cycle
        while _t.monotonic() < deadline:
            _t.sleep(0.05)
        # tolerant teardown: the kill may surface as StreamingQueryException
        # under load (the r6 flake) — exactly-once is judged on the strict
        # final drain below, not on how the killed run died
        kill_chaos_run(q)

    q = start({"availableNow": True})  # final drain on the same checkpoint
    q.awaitTermination()

    got = spark.read.parquet(outdir)
    # no duplicated output row (each (key, left_ts, right_ts) is unique)
    dups = (
        got.groupBy("key", "left_ts", "right_ts")
        .count()
        .where("count > 1")
        .count()
    )
    assert dups == 0
    want = interval_join_batch(
        spark.read.parquet(ldir),
        spark.read.parquet(rdir),
        lower="0 seconds",
        upper="0.2 seconds",
    )
    got_set = {tuple(r) for r in got.collect()}
    want_set = {tuple(r) for r in want.collect()}
    assert got_set == want_set, (
        len(got_set - want_set),
        len(want_set - got_set),
    )
