"""InfluxQL translator tests: the reference's dashboard queries run VERBATIM
(dashboard.json:86-111,189-216,295-331 — the panels' InfluxQL strings with
$timeFilter expanded, as Grafana sends them), plus grammar edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timing_explorer_spark.functions.influxql import influxql
from timing_explorer_spark.sources.generator import sensor_stream_batch


@pytest.fixture(scope="module")
def sensors(spark):
    # 60s of the reference generator: keys temp/pressure, 100ms period.
    return sensor_stream_batch(spark, n_events=600).cache()


def test_dashboard_pressure_panel_verbatim(spark, sensors):
    """dashboard.json:86-111 — SELECT "value" FROM "sensors" WHERE
    key='pressure' AND $timeFilter."""
    q = (
        "SELECT \"value\" FROM \"sensors\" WHERE \"key\" = 'pressure' "
        "AND time >= '2024-01-01 00:00:10' AND time < '2024-01-01 00:00:20'"
    )
    got = influxql(q, {"sensors": sensors})
    assert got.columns == ["time", "value"]
    expected = sensors.where(
        (F.col("key") == "pressure")
        & (F.col("ts") >= F.lit("2024-01-01 00:00:10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-01 00:00:20").cast("timestamp"))
    )
    assert got.count() == expected.count() > 0
    assert sorted(r["value"] for r in got.collect()) == sorted(
        r["value"] for r in expected.collect()
    )


def test_dashboard_reaggregation_verbatim(spark, sensors):
    """dashboard.json:295-331 — GROUP BY time($__interval) + mean + fill(null),
    with $__interval=1s: mean of the sawtooth phase over each second must be
    the exact 10-sample average, and every spine second must appear."""
    q = (
        "SELECT mean(\"value\") FROM \"sensors\" WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:00:29' "
        "GROUP BY time(1s) fill(null) ORDER BY time ASC"
    )
    rows = influxql(q, {"sensors": sensors}).orderBy("time").collect()
    assert len(rows) == 30
    # Each FULL second holds phases 0.0..0.9 -> mean 0.45 exactly; the last
    # bucket is cut by the <= 00:00:29 range to the single sample at 29.000s
    # (InfluxQL bucket-edge semantics: the range trims the bucket contents).
    assert all(abs(r["mean"] - 0.45) < 1e-12 for r in rows[:-1])
    assert rows[-1]["mean"] == 0.0


def test_groupby_tag_series(spark, sensors):
    """GROUP BY time(10s), key — one series per tag, like multi-series panels."""
    q = (
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(10s), \"key\""
    )
    rows = influxql(q, {"sensors": sensors}).collect()
    got = {(r["time"].second, r["key"]): r["count"] for r in rows}
    # 10 samples/s * 10s = 100 per (bucket, key)
    assert set(got.values()) == {100}
    assert len(got) == 6  # 3 buckets x 2 keys


def test_fill_linear(spark):
    """fill(linear): a manufactured hole interpolates to the midpoint."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 10.0), ("2024-01-01 00:00:02", 30.0)], ["ts", "value"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    q = (
        "SELECT mean(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:00:02' "
        "GROUP BY time(1s) fill(linear)"
    )
    rows = influxql(q, {"m": df}).orderBy("time").collect()
    assert [r["mean"] for r in rows] == [10.0, 20.0, 30.0]


def test_scalar_aggregate_and_limit(spark, sensors):
    q = "SELECT count(\"value\") FROM \"sensors\""
    # n_events is PER KEY (two keyed generator instances, like the reference)
    assert influxql(q, {"sensors": sensors}).collect()[0]["count"] == 1200
    q2 = "SELECT \"value\" FROM \"sensors\" ORDER BY time DESC LIMIT 5"
    assert influxql(q2, {"sensors": sensors}).count() == 5


@pytest.mark.parametrize(
    "bad",
    [
        "DROP MEASUREMENT sensors",
        "SELECT value FROM nope",
        "SELECT mean(\"value\") FROM \"sensors\" GROUP BY time(1s) fill(null)",  # fill w/o range
        "SELECT \"value\" FROM \"sensors\" WHERE key =~ x",  # regex needs /slashes/
    ],
)
def test_rejects_unsupported(spark, sensors, bad):
    with pytest.raises(ValueError):
        influxql(bad, {"sensors": sensors})


def test_groupby_tag_with_fill(spark, sensors):
    """fill(null) with a tag grouping: the spine crosses with the distinct
    tags, so silent series get explicit null rows per bucket."""
    q = (
        "SELECT mean(\"value\") FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:02:00' "
        "GROUP BY time(30s), \"key\" fill(null)"
    )
    rows = influxql(q, {"sensors": sensors}).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r["mean"])
    # 5 spine buckets (0,30,60,90,120s) x 2 keys; data covers 0-59.9s, so
    # the 60/90/120s buckets are explicit nulls for BOTH series.
    assert set(by_key) == {"temp", "pressure"}
    for vals in by_key.values():
        assert len(vals) == 5
        assert sum(v is None for v in vals) == 3


def test_fill_previous_locf(spark):
    """fill(previous): a hole carries the last observed value forward; a
    leading hole (nothing to carry) stays NULL — InfluxDB semantics."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:01", 10.0), ("2024-01-01 00:00:03", 30.0)], ["ts", "value"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    q = (
        "SELECT mean(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:00:03' "
        "GROUP BY time(1s) fill(previous)"
    )
    rows = influxql(q, {"m": df}).orderBy("time").collect()
    assert [r["mean"] for r in rows] == [None, 10.0, 10.0, 30.0]


def test_fill_constant_number(spark):
    """fill(0): holes take the literal constant; count stays integral."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 10.0), ("2024-01-01 00:00:02", 30.0)], ["ts", "value"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    q = (
        "SELECT count(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:00:02' "
        "GROUP BY time(1s) fill(0)"
    )
    rows = influxql(q, {"m": df}).orderBy("time").collect()
    assert [r["count"] for r in rows] == [1, 0, 1]
    assert dict(influxql(q, {"m": df}).dtypes)["count"] == "bigint"
    q2 = q.replace("count", "mean").replace("fill(0)", "fill(-1.5)")
    rows2 = influxql(q2, {"m": df}).orderBy("time").collect()
    assert [r["mean"] for r in rows2] == [10.0, -1.5, 30.0]


def test_selector_and_spread_aggregates(spark):
    """first()/last() select by event time; median averages even counts;
    spread = max - min; stddev is the sample deviation."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 40.0),
            ("2024-01-01 00:00:01", 10.0),
            ("2024-01-01 00:00:02", 20.0),
            ("2024-01-01 00:00:03", 30.0),
        ],
        ["ts", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    t = {"m": df}
    assert influxql('SELECT first("value") FROM "m"', t).collect()[0]["first"] == 40.0
    assert influxql('SELECT last("value") FROM "m"', t).collect()[0]["last"] == 30.0
    assert influxql('SELECT median("value") FROM "m"', t).collect()[0]["median"] == 25.0
    assert influxql('SELECT spread("value") FROM "m"', t).collect()[0]["spread"] == 30.0
    sd = influxql('SELECT stddev("value") FROM "m"', t).collect()[0]["stddev"]
    assert abs(sd - 12.909944487358056) < 1e-12  # sample stddev of {10,20,30,40}


def test_selector_aggregates_bucketed(spark):
    """first() inside GROUP BY time(): earliest value per bucket."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00.100", 1.0),
            ("2024-01-01 00:00:00.900", 2.0),
            ("2024-01-01 00:00:01.200", 3.0),
            ("2024-01-01 00:00:01.800", 4.0),
        ],
        ["ts", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    q = (
        "SELECT first(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:02' "
        "GROUP BY time(1s)"
    )
    rows = influxql(q, {"m": df}).orderBy("time").collect()
    assert [r["first"] for r in rows] == [1.0, 3.0]


def test_derivative_rate(spark):
    """derivative(count) per bucket: counts 1,3,2 → rates +2, -1; the first
    point has no predecessor and is dropped; non_negative_ drops the -1."""
    rows = [("2024-01-01 00:00:00.500", 1.0)]
    rows += [(f"2024-01-01 00:00:01.{i}00", 1.0) for i in range(3)]
    rows += [(f"2024-01-01 00:00:02.{i}00", 1.0) for i in range(2)]
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    base = (
        "SELECT {proj} FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:03' "
        "GROUP BY time(1s)"
    )
    q = base.format(proj='derivative(count("value"))')
    out = influxql(q, {"m": df}).orderBy("time").collect()
    assert [r["derivative"] for r in out] == [2.0, -1.0]
    qn = base.format(proj='non_negative_derivative(count("value"))')
    outn = influxql(qn, {"m": df}).orderBy("time").collect()
    assert [r["non_negative_derivative"] for r in outn] == [2.0]
    # explicit unit: per-2s rate doubles the per-1s rate
    q2 = base.format(proj='derivative(count("value"), 2s)')
    out2 = influxql(q2, {"m": df}).orderBy("time").collect()
    assert [r["derivative"] for r in out2] == [4.0, -2.0]


def test_derivative_with_fill_over_gap(spark):
    """derivative() + fill(): the rate is computed on the UNFILLED aggregate
    (observed buckets, actual time delta across the gap) and fill applies to
    the derivative OUTPUT — InfluxDB's order of operations.

    Counts by second: t0=1, t1=3, t2..t3 empty, t4=5. Observed derivative
    points: t1 → +2, t4 → (5−3)·1s/3s = 2/3. With fill(null) the same two
    real rates must survive (the old fill-first order dropped t4's rate
    because its lag row was a filled NULL), with the gap buckets present as
    NULL rows; with fill(0) the gap buckets read 0 and no spurious rates
    appear."""
    rows = [("2024-01-01 00:00:00.500", 1.0)]
    rows += [(f"2024-01-01 00:00:01.{i}00", 1.0) for i in range(3)]
    rows += [(f"2024-01-01 00:00:04.{i}00", 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    base = (
        "SELECT derivative(count(\"value\")) FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:00:04.900' "
        "GROUP BY time(1s) {fill} ORDER BY time ASC"
    )
    unfilled = influxql(base.format(fill=""), {"m": df}).collect()
    assert [(str(r["time"]), round(r["derivative"], 6)) for r in unfilled] == [
        ("2024-01-01 00:00:01", 2.0),
        ("2024-01-01 00:00:04", round(2 / 3, 6)),
    ]
    filled = influxql(base.format(fill="fill(null)"), {"m": df}).collect()
    got = {str(r["time"]): r["derivative"] for r in filled}
    # every real rate from the unfilled query survives fill(null) ...
    assert got["2024-01-01 00:00:01"] == 2.0
    assert round(got["2024-01-01 00:00:04"], 6) == round(2 / 3, 6)
    # ... and the spine adds the first bucket + gap buckets as NULLs
    assert got["2024-01-01 00:00:00"] is None
    assert got["2024-01-01 00:00:02"] is None
    assert got["2024-01-01 00:00:03"] is None
    zero = influxql(base.format(fill="fill(0)"), {"m": df}).collect()
    gotz = {str(r["time"]): r["derivative"] for r in zero}
    assert gotz["2024-01-01 00:00:02"] == 0.0 and gotz["2024-01-01 00:00:03"] == 0.0
    assert gotz["2024-01-01 00:00:01"] == 2.0  # real rates untouched


def test_show_unknown_measurement_raises_valueerror(spark, sensors):
    """SHOW TAG/FIELD KEYS FROM an unknown measurement honors the parser
    contract (ValueError, not KeyError), like the TAG VALUES branch; the
    empty-tables case must not leak StopIteration."""
    import pytest

    t = {"sensors": sensors}
    for q in ('SHOW TAG KEYS FROM "nope"', 'SHOW FIELD KEYS FROM "nope"'):
        with pytest.raises(ValueError, match="unknown measurement"):
            influxql(q, t)
    with pytest.raises(ValueError):
        influxql("SHOW MEASUREMENTS", {})


def test_derivative_requires_group(spark, sensors):
    import pytest

    with pytest.raises(ValueError):
        influxql('SELECT derivative(mean("value")) FROM "sensors"', {"sensors": sensors})


def test_show_metadata_commands(spark, sensors):
    """SHOW MEASUREMENTS / TAG KEYS / FIELD KEYS / TAG VALUES — the queries
    Grafana template-variable dropdowns issue."""
    t = {"sensors": sensors}
    assert [r["name"] for r in influxql("SHOW MEASUREMENTS", t).collect()] == ["sensors"]
    tags = influxql('SHOW TAG KEYS FROM "sensors"', t).collect()
    assert [(r["measurement"], r["key"]) for r in tags] == [("sensors", "key")]
    fields = influxql('SHOW FIELD KEYS FROM "sensors"', t).collect()
    assert ("sensors", "value") in [(r["measurement"], r["key"]) for r in fields]
    assert all(r["key"] != "ts" for r in fields)
    vals = influxql('SHOW TAG VALUES FROM "sensors" WITH KEY = "key"', t).collect()
    assert [(r["key"], r["value"]) for r in vals] == [
        ("key", "pressure"),
        ("key", "temp"),
    ]


def test_parser_fuzz_never_crashes_unhelpfully(spark, sensors):
    """Property: any input either translates or raises ValueError — the
    parser must never leak an AttributeError/KeyError/regex explosion to
    callers (Grafana sends arbitrary user-typed strings)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tokens = st.sampled_from(
        ["SELECT", "FROM", "WHERE", "GROUP", "BY", "ORDER", "LIMIT", "SHOW",
         "time(1s)", "fill(null)", "fill(bogus)", '"value"', '"sensors"',
         'mean("value")', "derivative(", ")", "AND", "time >= '2024-01-01'",
         "moving_average(", "cumulative_sum(", "difference(",
         "tz('America/New_York')", "tz('bogus/zone')",
         'percentile("value", 50)', 'percentile("value", 999)', ", 3", ", 4s",
         "key = 'temp'", ",", "*", "'", '"', "1e9", ";", "--", "𝕊"]
    )
    text = st.lists(tokens, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=200, deadline=None)
    @given(text)
    def run(q):
        try:
            influxql(q, {"sensors": sensors})
        except ValueError:
            pass  # the contract: unsupported input -> ValueError

    run()


def test_difference_and_cumulative_sum(spark):
    """difference(): per-bucket deltas, first point dropped, non_negative_
    drops negatives; cumulative_sum(): running total over observed buckets."""
    rows = [("2024-01-01 00:00:00.500", 1.0)]
    rows += [(f"2024-01-01 00:00:01.{i}00", 1.0) for i in range(4)]
    rows += [(f"2024-01-01 00:00:02.{i}00", 1.0) for i in range(2)]
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    base = (
        "SELECT {proj} FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:03' "
        "GROUP BY time(1s) ORDER BY time ASC"
    )
    out = influxql(base.format(proj='difference(count("value"))'), {"m": df}).collect()
    assert [r["difference"] for r in out] == [3, -2]
    outn = influxql(
        base.format(proj='non_negative_difference(count("value"))'), {"m": df}
    ).collect()
    assert [r["non_negative_difference"] for r in outn] == [3]
    outc = influxql(base.format(proj='cumulative_sum(count("value"))'), {"m": df}).collect()
    assert [r["cumulative_sum"] for r in outc] == [1.0, 5.0, 7.0]


def test_moving_average_warmup_dropped(spark):
    """moving_average(mean, 2): first bucket has no full 2-point window and
    is dropped; remaining points average consecutive observed buckets."""
    rows = [
        ("2024-01-01 00:00:00.100", 2.0),
        ("2024-01-01 00:00:01.100", 4.0),
        ("2024-01-01 00:00:02.100", 6.0),
        ("2024-01-01 00:00:04.100", 10.0),  # gap at t3: observed-points window
    ]
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    q = (
        "SELECT moving_average(mean(\"value\"), 2) FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:05' "
        "GROUP BY time(1s) ORDER BY time ASC"
    )
    out = influxql(q, {"m": df}).collect()
    assert [(str(r["time"]), r["moving_average"]) for r in out] == [
        ("2024-01-01 00:00:01", 3.0),
        ("2024-01-01 00:00:02", 5.0),
        ("2024-01-01 00:00:04", 8.0),  # across the gap: last 2 OBSERVED points
    ]


def test_percentile_aggregate(spark, sensors):
    """percentile(value, N): InfluxDB's 0..100 argument scale AND its
    nearest-rank semantics — the result is an ACTUAL sample point selected
    by round-half-up rank (influxdb functions.go PercentileReduce:
    idx = floor(n*p/100 + 0.5) - 1), not an interpolated value."""
    q = (
        "SELECT percentile(\"value\", 50) FROM \"sensors\" "
        "WHERE key = 'temp'"
    )
    got = influxql(q, {"sensors": sensors}).collect()[0]["percentile"]
    import math

    import pytest as _pytest

    samples = sorted(
        r["value"] for r in sensors.where(F.col("key") == "temp").collect()
    )
    idx = math.floor(len(samples) * 50 / 100.0 + 0.5) - 1
    want = samples[idx]
    assert got == _pytest.approx(want)
    assert got in samples  # an actual observation, never interpolated
    with _pytest.raises(ValueError):
        influxql('SELECT percentile("value", 101) FROM "sensors"', {"sensors": sensors})
    with _pytest.raises(ValueError):
        influxql('SELECT percentile("value") FROM "sensors"', {"sensors": sensors})


def test_transform_argument_validation(spark, sensors):
    base = (
        "SELECT {proj} FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:01:00' "
        "GROUP BY time(1s)"
    )
    t = {"sensors": sensors}
    for proj in (
        'moving_average(mean("value"))',       # missing count
        'moving_average(mean("value"), 1)',    # count < 2
        'moving_average(mean("value"), 4s)',   # duration, not count
        'difference(mean("value"), 2)',        # no args allowed
        'cumulative_sum(mean("value"), 2)',    # no args allowed
        'derivative(mean("value"), 5)',        # unit suffix required
    ):
        with pytest.raises(ValueError):
            influxql(base.format(proj=proj), t)


def test_integral_trapezoid_per_bucket(spark):
    """integral(value): trapezoidal area over consecutive points WITHIN each
    bucket (no interpolation across boundaries); single-point buckets emit
    nothing; optional unit argument rescales."""
    rows = [
        ("2024-01-01 00:00:00.000", 0.0),
        ("2024-01-01 00:00:00.500", 2.0),
        ("2024-01-01 00:00:00.800", 2.0),
        ("2024-01-01 00:00:01.300", 4.0),  # lone point in bucket 1
        ("2024-01-01 00:00:02.000", 1.0),
        ("2024-01-01 00:00:02.400", 3.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    q = (
        "SELECT integral(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:03' "
        "GROUP BY time(1s) ORDER BY time ASC"
    )
    out = influxql(q, {"m": df}).collect()
    got = {str(r["time"]): round(r["integral"], 9) for r in out}
    # bucket 0: (0+2)/2*0.5 + (2+2)/2*0.3 = 0.5 + 0.6 = 1.1 ; bucket 1: none
    # bucket 2: (1+3)/2*0.4 = 0.8
    assert got == {"2024-01-01 00:00:00": 1.1, "2024-01-01 00:00:02": 0.8}
    # unit argument: per-2-second area halves the per-second number
    q2 = q.replace('integral("value")', 'integral("value", 2)')
    out2 = influxql(q2, {"m": df}).collect()
    got2 = {str(r["time"]): round(r["integral"], 9) for r in out2}
    assert got2 == {"2024-01-01 00:00:00": 0.55, "2024-01-01 00:00:02": 0.4}
    # scalar integral (no GROUP BY) is rejected (would be an unpartitioned
    # fact-scale window — the translator keeps only scale-safe shapes)
    with pytest.raises(ValueError):
        influxql('SELECT integral("value") FROM "m"', {"m": df})


def test_multi_aggregate_select(spark, sensors):
    """SELECT mean(v), max(v), count(v) — the multi-stat panel query; with
    GROUP BY time the aggregates share one bucketed pass; duplicate agg
    names take InfluxDB's _1 suffix; fill(null) pads every column."""
    t = {"sensors": sensors}
    row = influxql(
        "SELECT mean(\"value\"), max(\"value\"), count(\"value\") FROM \"sensors\" "
        "WHERE \"key\" = 'temp'",
        t,
    ).collect()[0]
    assert row["count"] == 600 and row["max"] == 0.9
    assert abs(row["mean"] - 0.45) < 1e-9
    rows = influxql(
        'SELECT min("value"), max("value") FROM "sensors" '
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        'GROUP BY time(10s), "key" ORDER BY time ASC',
        t,
    ).collect()
    assert len(rows) == 6  # 3 buckets x 2 keys
    for r in rows:
        if r["key"] == "temp":  # sawtooth phase: exactly 0.0 .. 0.9
            assert r["min"] == 0.0 and r["max"] == 0.9
        else:  # pressure sine: full cycle spans ±sin(72°)
            assert abs(r["min"] + 0.9510565) < 1e-6
            assert abs(r["max"] - 0.9510565) < 1e-6
    # duplicate names -> suffixed
    dup = influxql('SELECT mean("value"), mean("value") FROM "sensors"', t)
    assert dup.columns == ["mean", "mean_1"]
    # fill(null): gap buckets appear with NULL in every aggregate column
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0), ("2024-01-01 00:00:02", 3.0)], ["ts", "value"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    filled = influxql(
        'SELECT mean("value"), count("value") FROM "m" '
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:00:02' "
        "GROUP BY time(1s) fill(null) ORDER BY time ASC",
        {"m": df},
    ).collect()
    assert [(r["mean"], r["count"]) for r in filled] == [(1.0, 1), (None, None), (3.0, 1)]


def test_multi_select_rejects_mixed_and_transforms(spark, sensors):
    t = {"sensors": sensors}
    for q in (
        'SELECT mean("value"), "value" FROM "sensors"',  # raw field mixed in
        'SELECT derivative(mean("value")), max("value") FROM "sensors" '
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:01:00' "
        "GROUP BY time(1s)",  # transformation in multi-select
        'SELECT mean("value"), integral("value") FROM "sensors" '
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:01:00' "
        "GROUP BY time(1s)",
    ):
        with pytest.raises(ValueError):
            influxql(q, t)


def test_tz_clause_local_day_buckets(spark):
    """tz('America/New_York'): daily buckets align to LOCAL midnight
    (InfluxDB's tz clause). January = EST (UTC-5), so bucket boundaries are
    05:00 UTC: events at 03:00Z and 10:00Z land in DIFFERENT local days
    (22:00 previous day / 05:00 same day local), while plain UTC bucketing
    puts them in the same day. fill(null)'s spine uses the same local
    alignment."""
    df = spark.createDataFrame(
        [("2024-01-01 03:00:00", 1.0), ("2024-01-01 10:00:00", 2.0)], ["ts", "value"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    base = (
        "SELECT count(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 12:00:00' "
        "GROUP BY time(1d) ORDER BY time ASC{tz}"
    )
    utc = influxql(base.format(tz=""), {"m": df}).collect()
    assert [(str(r["time"]), r["count"]) for r in utc] == [("2024-01-01 00:00:00", 2)]
    ny = influxql(base.format(tz=" tz('America/New_York')"), {"m": df}).collect()
    assert [(str(r["time"]), r["count"]) for r in ny] == [
        ("2023-12-31 05:00:00", 1),
        ("2024-01-01 05:00:00", 1),
    ]
    filled = influxql(
        base.format(tz=" tz('America/New_York')").replace(
            "ORDER BY", "fill(null) ORDER BY"
        ),
        {"m": df},
    ).collect()
    # spine floors the range start to the LOCAL day boundary too
    assert [str(r["time"]) for r in filled][:2] == [
        "2023-12-31 05:00:00",
        "2024-01-01 05:00:00",
    ]


def test_where_field_comparisons_and_tag_negation(spark, sensors):
    """Numeric field predicates (the Grafana alert-query shape) and tag
    negation: WHERE "value" > 0.5, WHERE "key" != 'temp'."""
    t = {"sensors": sensors}
    hi = influxql(
        "SELECT count(\"value\") FROM \"sensors\" WHERE \"key\" = 'temp' AND \"value\" >= 0.5",
        t,
    ).collect()[0]["count"]
    # sawtooth phases 0.5..0.9 -> 5 of 10 samples per second, 60s
    assert hi == 300
    ne = influxql(
        "SELECT count(\"value\") FROM \"sensors\" WHERE \"key\" != 'temp'", t
    ).collect()[0]["count"]
    assert ne == 600  # only pressure remains
    band = influxql(
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE \"key\" = 'temp' AND \"value\" > 0.1 AND \"value\" < 0.5",
        t,
    ).collect()[0]["count"]
    assert band == 180  # phases 0.2, 0.3, 0.4


def test_subquery_downsample_then_aggregate(spark, sensors):
    """FROM-subquery (InfluxDB's downsample-then-aggregate idiom): inner
    mean per 10s, outer max of those means per 30s; the inner aggregate's
    column name is the outer field. Two levels of nesting also work."""
    t = {"sensors": sensors}
    q = (
        "SELECT max(\"mean\") FROM ("
        "SELECT mean(\"value\") FROM \"sensors\" "
        "WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:01:00' "
        "GROUP BY time(10s)"
        ") WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:01:00' "
        "GROUP BY time(30s) ORDER BY time ASC"
    )
    rows = influxql(q, t).collect()
    # every full 10s bucket of the sawtooth means 0.45 -> max per 30s = 0.45
    assert len(rows) == 2
    assert all(abs(r["max"] - 0.45) < 1e-12 for r in rows)
    # nested twice: count of the maxes
    q2 = f'SELECT count("max") FROM ({q[:q.rindex(" ORDER BY")]})'
    assert influxql(q2, t).collect()[0]["count"] == 2
    # subquery without a time column is rejected
    with pytest.raises(ValueError, match="time column"):
        influxql(
            'SELECT max("count") FROM (SELECT count("value") FROM "sensors")', t
        )


def test_groupby_tag_only_and_or_tag_values(spark, sensors):
    """GROUP BY "key" without time() (the Grafana table-panel shape) and
    multi-value template variables: ("key" = 'a' OR "key" = 'b')."""
    t = {"sensors": sensors}
    rows = influxql('SELECT count("value") FROM "sensors" GROUP BY "key"', t).collect()
    assert {(r["key"], r["count"]) for r in rows} == {("temp", 600), ("pressure", 600)}
    multi = influxql(
        'SELECT mean("value"), count("value") FROM "sensors" GROUP BY "key"', t
    ).collect()
    assert len(multi) == 2 and all(r["count"] == 600 for r in multi)
    both = influxql(
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE (\"key\" = 'temp' OR \"key\" = 'pressure')",
        t,
    ).collect()[0]["count"]
    assert both == 1200
    one = influxql(
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE (\"key\" = 'temp' OR \"key\" = 'nope')",
        t,
    ).collect()[0]["count"]
    assert one == 600
    with pytest.raises(ValueError, match="ONE tag"):
        influxql(
            "SELECT count(\"value\") FROM \"sensors\" "
            "WHERE (\"key\" = 'temp' OR \"other\" = 'x')",
            t,
        )


def test_tz_fill_spine_across_dst_transition(spark):
    """tz() + fill() across a DST change (ADVICE r4): local-midnight day
    buckets are NOT uniformly spaced in UTC — America/New_York midnights sit
    at 05:00Z before the 2024-03-10 spring-forward and 04:00Z after. The
    spine must follow the local grid (so real aggregate rows survive the
    left join and filled rows land on true bucket instants), not a fixed
    24h UTC ladder that drifts an hour off after the transition."""
    df = spark.createDataFrame(
        [
            ("2024-03-08 12:00:00", 1.0),  # local 03-08 07:00 EST -> bucket 03-08 05:00Z
            ("2024-03-11 12:00:00", 5.0),  # local 03-11 08:00 EDT -> bucket 03-11 04:00Z
        ],
        ["ts", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    q = (
        "SELECT count(\"value\") FROM \"m\" "
        "WHERE time >= '2024-03-08 05:00:00' AND time <= '2024-03-12 23:00:00' "
        "GROUP BY time(1d) fill(0) ORDER BY time ASC tz('America/New_York')"
    )
    rows = influxql(q, {"m": df}).collect()
    assert [(str(r["time"]), r["count"]) for r in rows] == [
        ("2024-03-08 05:00:00", 1),  # EST grid
        ("2024-03-09 05:00:00", 0),
        ("2024-03-10 05:00:00", 0),  # transition day: local midnight still 05:00Z
        ("2024-03-11 04:00:00", 1),  # EDT grid — post-transition buckets shift 1h
        ("2024-03-12 04:00:00", 0),
    ]

    # fall-back (2024-11-03): the grid shifts 04:00Z -> 05:00Z, and the
    # repeated local hour collapses to a single bucket label, matching the
    # aggregate's own image.
    df2 = spark.createDataFrame(
        [("2024-11-04 12:00:00", 9.0)], ["ts", "value"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    q2 = (
        "SELECT count(\"value\") FROM \"m\" "
        "WHERE time >= '2024-11-02 04:00:00' AND time <= '2024-11-05 23:00:00' "
        "GROUP BY time(1d) fill(0) ORDER BY time ASC tz('America/New_York')"
    )
    rows2 = influxql(q2, {"m": df2}).collect()
    assert [(str(r["time"]), r["count"]) for r in rows2] == [
        ("2024-11-02 04:00:00", 0),  # EDT grid
        ("2024-11-03 04:00:00", 0),  # transition day starts on the EDT grid
        ("2024-11-04 05:00:00", 1),  # EST grid
        ("2024-11-05 05:00:00", 0),
    ]


def test_regex_tag_predicate(spark, sensors):
    """"key" =~ /regex/ and !~ — Grafana's multi-value template variables in
    'All' mode render regex tag filters (unanchored RE2; rlike matches)."""
    q = (
        "SELECT count(\"value\") FROM \"sensors\" WHERE \"key\" =~ /temp|nope/ "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30'"
    )
    assert influxql(q, {"sensors": sensors}).collect()[0]["count"] == 300
    q_neg = q.replace("=~", "!~")
    assert influxql(q_neg, {"sensors": sensors}).collect()[0]["count"] == 300  # pressure
    # prefix match, unanchored
    q_pre = q.replace("/temp|nope/", "/^pres/")
    assert influxql(q_pre, {"sensors": sensors}).collect()[0]["count"] == 300


def test_top_bottom_selectors(spark):
    """top(field, N)/bottom(field, N): N greatest/least VALUES, each row
    keeping its original point timestamp; grouped form takes N per bucket."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 4.0),
            ("2024-01-01 00:00:01", 9.0),
            ("2024-01-01 00:00:02", 1.0),
            ("2024-01-01 00:01:00", 7.0),
            ("2024-01-01 00:01:01", 2.0),
            ("2024-01-01 00:01:02", 8.0),
        ],
        ["ts", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    t = {"m": df}
    rows = influxql('SELECT top("value", 2) FROM "m"', t).collect()
    assert [(str(r["time"]), r["top"]) for r in rows] == [
        ("2024-01-01 00:00:01", 9.0),
        ("2024-01-01 00:01:02", 8.0),
    ]
    rows = influxql('SELECT bottom("value", 2) FROM "m"', t).collect()
    assert [(str(r["time"]), r["bottom"]) for r in rows] == [
        ("2024-01-01 00:00:02", 1.0),
        ("2024-01-01 00:01:01", 2.0),
    ]
    # grouped: top-1 per minute keeps the point's own timestamp
    rows = influxql(
        'SELECT top("value", 1) FROM "m" '
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:02:00' "
        "GROUP BY time(1m)",
        t,
    ).collect()
    assert [(str(r["time"]), r["top"]) for r in rows] == [
        ("2024-01-01 00:00:01", 9.0),
        ("2024-01-01 00:01:02", 8.0),
    ]
    with pytest.raises(ValueError):
        influxql('SELECT top("value", 0) FROM "m"', t)
    with pytest.raises(ValueError):
        influxql(
            'SELECT top("value", 1) FROM "m" '
            "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:02:00' "
            "GROUP BY time(1m) fill(null)",
            t,
        )


def test_elapsed_transformation(spark):
    """elapsed(field[, unit]): truncated integer delta to the previous
    point; first point dropped; default unit 1ns like InfluxDB."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00.000", 1.0),
            ("2024-01-01 00:00:01.500", 2.0),
            ("2024-01-01 00:00:04.200", 3.0),
        ],
        ["ts", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    t = {"m": df}
    rows = influxql('SELECT elapsed("value", 1s) FROM "m"', t).collect()
    assert [(str(r["time"]), r["elapsed"]) for r in rows] == [
        ("2024-01-01 00:00:01.500000", 1),  # 1.5s -> truncates to 1
        ("2024-01-01 00:00:04.200000", 2),  # 2.7s -> 2
    ]
    rows_ns = influxql('SELECT elapsed("value") FROM "m"', t).collect()
    assert [r["elapsed"] for r in rows_ns] == [1_500_000_000, 2_700_000_000]
    with pytest.raises(ValueError):
        influxql(
            'SELECT elapsed("value", 1s) FROM "m" '
            "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:02:00' "
            "GROUP BY time(1m)",
            t,
        )


def test_fill_spine_equals_bucket_image_any_zone(spark):
    """Property: for any tz and step, the fill() spine is exactly the set of
    bucket labels _bucket_col would assign to instants densely covering the
    range — so the left join never drops a real aggregate row or invents a
    bucket that data could not produce (DST transitions included)."""
    import datetime as dt

    from timing_explorer_spark.functions.influxql import _bucket_col, _fill_spine

    cases = [
        # (tz, step_us, lo, hi) — ranges deliberately spanning the 2024 US
        # spring-forward, US fall-back, EU spring-forward, and a half-hour
        # offset zone (India, no DST)
        ("America/New_York", 86_400_000_000, "2024-03-08 00:00:00", "2024-03-13 00:00:00"),
        ("America/New_York", 86_400_000_000, "2024-11-01 00:00:00", "2024-11-06 00:00:00"),
        ("Europe/Berlin", 43_200_000_000, "2024-03-30 00:00:00", "2024-04-01 12:00:00"),
        ("Asia/Kolkata", 86_400_000_000, "2024-06-01 00:00:00", "2024-06-04 00:00:00"),
        (None, 21_600_000_000, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
    ]
    for tz, step_us, lo, hi in cases:
        lo_dt = dt.datetime.fromisoformat(lo)
        hi_dt = dt.datetime.fromisoformat(hi)
        n_hours = int((hi_dt - lo_dt).total_seconds() // 3600)
        dense = spark.range(n_hours + 1).select(
            (
                F.lit(lo).cast("timestamp")
                + F.make_interval(hours=F.col("id").cast("int"))
            ).alias("ts")
        )
        image = {
            r["time"]
            for r in dense.select(_bucket_col("ts", step_us, tz)).distinct().collect()
        }
        spine = {
            r["time"]
            for r in _fill_spine(spark, lo, hi, step_us, tz).collect()
        }
        assert spine == image, (tz, step_us, sorted(spine ^ image))


def test_mode_and_distinct_aggregates(spark):
    """MODE(): most frequent value, ties take the LOWEST value (InfluxDB
    contract); DISTINCT(): multi-row distinct values per bucket, epoch-0
    timestamp when ungrouped."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 2.0),
            ("2024-01-01 00:00:01", 2.0),
            ("2024-01-01 00:00:02", 1.0),
            ("2024-01-01 00:00:03", 1.0),
            ("2024-01-01 00:00:04", 3.0),
            # second minute: 3.0 dominates
            ("2024-01-01 00:01:00", 3.0),
            ("2024-01-01 00:01:01", 3.0),
            ("2024-01-01 00:01:02", 1.0),
        ],
        ["ts", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    t = {"m": df}
    # global mode: counts {1.0: 3, 2.0: 2, 3.0: 3} -> tie 1.0 vs 3.0 -> 1.0
    assert influxql('SELECT mode("value") FROM "m"', t).collect()[0]["mode"] == 1.0
    rows = influxql(
        "SELECT mode(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:02:00' "
        "GROUP BY time(1m) ORDER BY time ASC",
        t,
    ).collect()
    assert [(str(r["time"]), r["mode"]) for r in rows] == [
        ("2024-01-01 00:00:00", 1.0),  # tie {1.0:2, 2.0:2} -> lowest
        ("2024-01-01 00:01:00", 3.0),
    ]
    # distinct, ungrouped: epoch-0 timestamps, sorted values
    drows = influxql('SELECT distinct("value") FROM "m"', t).collect()
    assert [(str(r["time"]), r["distinct"]) for r in drows] == [
        ("1970-01-01 00:00:00", 1.0),
        ("1970-01-01 00:00:00", 2.0),
        ("1970-01-01 00:00:00", 3.0),
    ]
    # distinct per minute bucket
    drows2 = influxql(
        "SELECT distinct(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:02:00' "
        "GROUP BY time(1m)",
        t,
    ).collect()
    assert [(str(r["time"]), r["distinct"]) for r in drows2] == [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-01 00:00:00", 2.0),
        ("2024-01-01 00:00:00", 3.0),
        ("2024-01-01 00:01:00", 1.0),
        ("2024-01-01 00:01:00", 3.0),
    ]


def test_mode_fold_matches_python_reference(spark):
    """Hypothesis: the mode() fold (sorted-run scan inside F.aggregate)
    equals the Python reference (max count, ties -> lowest value) for any
    multiset of values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-5, max_value=5).map(lambda v: v / 2.0),
            min_size=1,
            max_size=25,
        )
    )
    def run(vals):
        from collections import Counter

        df = spark.createDataFrame(
            [("2024-01-01 00:00:00", v) for v in vals], ["ts", "value"]
        ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
        got = influxql('SELECT mode("value") FROM "m"', {"m": df}).collect()[0]["mode"]
        counts = Counter(vals)
        best_n = max(counts.values())
        want = min(v for v, n in counts.items() if n == best_n)
        assert got == want, (vals, got, want)

    run()


def test_top_with_tag_series(spark):
    """top(value, N) with GROUP BY time, tag: N per (bucket, series), each
    row keeping its own timestamp and tag."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "a", 1.0),
            ("2024-01-01 00:00:01", "a", 5.0),
            ("2024-01-01 00:00:02", "b", 9.0),
            ("2024-01-01 00:00:03", "b", 2.0),
        ],
        ["ts", "key", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "key", "value")
    rows = influxql(
        'SELECT top("value", 1) FROM "m" '
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:01:00' "
        'GROUP BY time(1m), "key"',
        {"m": df},
    ).collect()
    assert {(str(r["time"]), r["key"], r["top"]) for r in rows} == {
        ("2024-01-01 00:00:01", "a", 5.0),
        ("2024-01-01 00:00:02", "b", 9.0),
    }


def test_top_limit_is_per_series_when_tag_grouped(spark):
    """LIMIT with a tag in GROUP BY pages points PER SERIES for selectors
    too (ADVICE r5: _top_bottom applied it globally — one LIMIT clause, two
    semantics depending on projection type)."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "a", 1.0),
            ("2024-01-01 00:00:01", "a", 5.0),
            ("2024-01-01 00:00:02", "a", 3.0),
            ("2024-01-01 00:00:03", "b", 9.0),
            ("2024-01-01 00:00:04", "b", 2.0),
            ("2024-01-01 00:00:05", "b", 7.0),
        ],
        ["ts", "key", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "key", "value")
    rows = influxql(
        'SELECT top("value", 2) FROM "m" '
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:01:00' "
        'GROUP BY "key" ORDER BY time ASC LIMIT 1',
        {"m": df},
    ).collect()
    # top-2 per series = {a:5,3  b:9,7}; LIMIT 1 keeps the FIRST point in
    # time order of EACH series, not one global row
    assert {(r["key"], r["top"]) for r in rows} == {("a", 5.0), ("b", 9.0)}


def test_distinct_limit_is_per_series_when_tag_grouped(spark):
    """distinct(field) + GROUP BY tag + LIMIT N: N distinct values PER
    series (deterministic: value-ordered tiebreak at the shared epoch-0
    timestamp)."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "a", 3.0),
            ("2024-01-01 00:00:01", "a", 1.0),
            ("2024-01-01 00:00:02", "a", 3.0),
            ("2024-01-01 00:00:03", "b", 8.0),
            ("2024-01-01 00:00:04", "b", 6.0),
        ],
        ["ts", "key", "value"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "key", "value")
    rows = influxql(
        'SELECT distinct("value") FROM "m" '
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:01:00' "
        'GROUP BY "key" LIMIT 1',
        {"m": df},
    ).collect()
    assert {(r["key"], r["distinct"]) for r in rows} == {("a", 1.0), ("b", 6.0)}


def test_live_now_is_timezone_independent(spark):
    """A LIVE now() (no injected instant) must denote the current INSTANT
    regardless of the session timezone (ADVICE r5: the naive UTC wall-clock
    string was re-interpreted in the session zone, shifting the boundary by
    the offset — hours of data vanish in America/New_York)."""
    import datetime as dt

    now_utc = dt.datetime.now(dt.timezone.utc)
    df = spark.createDataFrame(
        [
            (now_utc - dt.timedelta(minutes=30), 1.0),  # inside now()-1h
            (now_utc - dt.timedelta(hours=2), 2.0),     # outside
        ],
        ["ts", "value"],
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        rows = influxql(
            'SELECT "value" FROM "m" WHERE time >= now() - 1h', {"m": df}
        ).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert [r["value"] for r in rows] == [1.0]


# ---- pagination (LIMIT/OFFSET points, SLIMIT/SOFFSET series) & bucket offset


def test_limit_offset_per_series(spark, sensors):
    """With a tag in GROUP BY, LIMIT/OFFSET page points PER SERIES in time
    order (InfluxDB's contract) — buckets 2..3 of each key's 10s series."""
    q = (
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:50' "
        "GROUP BY time(10s), \"key\" ORDER BY time ASC LIMIT 2 OFFSET 1"
    )
    rows = influxql(q, {"sensors": sensors}).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r["time"].second)
    assert set(by_key) == {"temp", "pressure"}
    for secs in by_key.values():
        assert sorted(secs) == [10, 20]  # skipped bucket 0, kept 2 buckets


def test_limit_offset_global(spark, sensors):
    """Ungrouped: LIMIT/OFFSET page the global time-ordered points."""
    base = (
        "SELECT mean(\"value\") FROM \"sensors\" "
        "WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(1s) ORDER BY time ASC"
    )
    full = [r["time"] for r in influxql(base, {"sensors": sensors}).collect()]
    page = influxql(base + " LIMIT 5 OFFSET 7", {"sensors": sensors}).collect()
    assert [r["time"] for r in page] == full[7:12]


def test_slimit_soffset_series_pagination(spark, sensors):
    """SLIMIT/SOFFSET keep whole SERIES by lexical tag order: of
    {pressure, temp}, SOFFSET 1 SLIMIT 1 keeps only temp — every point."""
    q = (
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(10s), \"key\" SLIMIT 1 SOFFSET 1"
    )
    rows = influxql(q, {"sensors": sensors}).collect()
    assert {r["key"] for r in rows} == {"temp"}
    assert len(rows) == 3  # all of temp's buckets survive


def test_bucket_offset_grid(spark, sensors):
    """GROUP BY time(10s, 3s): boundaries at :03/:13/:23... — each full
    shifted bucket still holds exactly 100 samples per key, and a negative
    offset lands on the identical grid (floor semantics)."""
    q = (
        "SELECT count(\"value\") FROM \"sensors\" WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:03' AND time < '2024-01-01 00:00:23' "
        "GROUP BY time(10s, 3s) ORDER BY time ASC"
    )
    rows = influxql(q, {"sensors": sensors}).collect()
    assert [(r["time"].second, r["count"]) for r in rows] == [(3, 100), (13, 100)]
    qneg = q.replace("time(10s, 3s)", "time(10s, -7s)")
    assert influxql(qneg, {"sensors": sensors}).collect() == rows


def test_bucket_offset_composes_with_fill(spark):
    """fill() spine aligns to the shifted grid: labels are offset-grid
    boundaries and the manufactured hole still fills."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:03", 1.0), ("2024-01-01 00:00:23", 5.0)], ["ts", "value"]
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    q = (
        "SELECT sum(\"value\") FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:03' AND time <= '2024-01-01 00:00:25' "
        "GROUP BY time(10s, 3s) fill(0) ORDER BY time ASC"
    )
    rows = influxql(q, {"m": df}).collect()
    assert [(r["time"].second, r["sum"]) for r in rows] == [(3, 1.0), (13, 0.0), (23, 5.0)]


def test_pagination_guards(spark, sensors):
    """Unsupported pagination combinations raise instead of silently
    ignoring a matched clause."""
    for bad, msg in [
        ("SELECT top(\"value\", 2) FROM \"sensors\" OFFSET 1", "top()"),
        ("SELECT mean(\"value\") FROM \"sensors\" SLIMIT 2", "SLIMIT"),
        ("SELECT elapsed(\"value\") FROM \"sensors\" SOFFSET 1", "elapsed"),
        ("SELECT mean(\"value\"), max(\"value\") FROM \"sensors\" OFFSET 1", "multi"),
    ]:
        with pytest.raises(ValueError):
            influxql(bad, {"sensors": sensors})


def test_resolve_time_expr_forms():
    """The three operand families Grafana/clients actually render: quoted
    ISO (optionally with arithmetic), bare epoch with unit suffix (bare
    integers are nanoseconds in InfluxQL), and now() with +/- durations.
    now is injected for determinism."""
    from timing_explorer_spark.functions.influxql import _resolve_time_expr

    fixed = "2024-01-01 00:00:30"
    assert _resolve_time_expr("'2024-01-01 00:00:10'", None) == "2024-01-01 00:00:10"
    assert (
        _resolve_time_expr("'2024-01-01 00:00:10' + 6h", None)
        == "2024-01-01 06:00:10"
    )
    # Grafana renders $timeFilter as epoch-ms: time >= 1704067210000ms
    assert _resolve_time_expr("1704067210000ms", None) == "2024-01-01 00:00:10"
    # bare integer = nanoseconds (InfluxQL default precision)
    assert _resolve_time_expr("1704067210000000000", None) == "2024-01-01 00:00:10"
    assert _resolve_time_expr("1704067210s", None) == "2024-01-01 00:00:10"
    assert _resolve_time_expr("now()", fixed) == "2024-01-01 00:00:30"
    assert _resolve_time_expr("now() - 20s", fixed) == "2024-01-01 00:00:10"
    assert _resolve_time_expr("now() - 1m + 500ms", fixed) == "2023-12-31 23:59:30.500000"
    assert _resolve_time_expr("now() - 1w", fixed) == "2023-12-25 00:00:30"
    with pytest.raises(ValueError):
        _resolve_time_expr("yesterday", fixed)
    with pytest.raises(ValueError):
        _resolve_time_expr("now() * 2", fixed)


def test_now_relative_range_matches_absolute(spark, sensors):
    """WHERE time >= now() - 20s with an injected now must equal the
    absolute-range translation — including the GROUP BY time() spine, whose
    bounds derive from the resolved t_lo/t_hi."""
    rel = (
        "SELECT mean(\"value\") FROM \"sensors\" WHERE \"key\" = 'temp' "
        "AND time >= now() - 20s AND time < now() GROUP BY time(5s) fill(null)"
    )
    absq = (
        "SELECT mean(\"value\") FROM \"sensors\" WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:10' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(5s) fill(null)"
    )
    got = influxql(rel, {"sensors": sensors}, now="2024-01-01 00:00:30").orderBy("time")
    want = influxql(absq, {"sensors": sensors}).orderBy("time")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    assert got.count() == 4


def test_epoch_ms_range_matches_quoted(spark, sensors):
    """Grafana's raw $timeFilter (epoch-ms suffix) equals the quoted-ISO
    form: 1704067210000ms == '2024-01-01 00:00:10'."""
    eq = (
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE time >= 1704067210000ms AND time < 1704067220000ms"
    )
    quoted = (
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:10' AND time < '2024-01-01 00:00:20'"
    )
    a = influxql(eq, {"sensors": sensors}).collect()
    b = influxql(quoted, {"sensors": sensors}).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["count"] == 200  # 10s * 10 samples/s * 2 keys


@pytest.fixture(scope="module")
def sensors2(sensors):
    # second tag: a site derived from the sample's sub-second phase — two
    # deterministic values per key, so (key, site) yields 4 series
    return sensors.withColumn(
        "site", F.when((F.col("value") * 10 % 2) < 1, "east").otherwise("west")
    ).cache()


def test_multi_tag_groupby_matches_manual(spark, sensors2):
    """GROUP BY time(10s), "key", "site" — one series per TAG TUPLE."""
    q = (
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(10s), \"key\", \"site\""
    )
    got = influxql(q, {"sensors": sensors2})
    assert got.columns == ["time", "key", "site", "count"]
    manual = (
        sensors2.where(F.col("ts") < F.lit("2024-01-01 00:00:30").cast("timestamp"))
        .groupBy(
            F.window("ts", "10 seconds").start.alias("time"), "key", "site"
        )
        .agg(F.count("value").alias("count"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, manual.collect()))
    assert got.count() == 3 * 4  # 3 buckets x (2 keys x 2 sites)


def test_group_by_star_expands_all_tags(spark, sensors2):
    """GROUP BY * = every tag column (string-typed), tag-only and bucketed."""
    explicit = influxql(
        'SELECT mean("value") FROM "sensors" GROUP BY "key", "site"',
        {"sensors": sensors2},
    )
    star = influxql(
        'SELECT mean("value") FROM "sensors" GROUP BY *', {"sensors": sensors2}
    )
    assert star.columns == explicit.columns
    assert sorted(map(tuple, star.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    bucketed = influxql(
        'SELECT sum("value") FROM "sensors" GROUP BY time(10s), *',
        {"sensors": sensors2},
    )
    assert bucketed.columns == ["time", "key", "site", "sum"]


def test_multi_tag_fill_spine_per_observed_series(spark, sensors2):
    """fill(null) with two tags: the spine covers every OBSERVED tag tuple
    (InfluxDB fills per existing series, never inventing tag combos)."""
    q = (
        "SELECT mean(\"value\") FROM \"sensors\" WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:40' "
        "GROUP BY time(10s), \"key\", \"site\" fill(null)"
    )
    rows = influxql(q, {"sensors": sensors2}).collect()
    # 4 spine buckets x (1 key x 2 sites); bucket 30-40s has no data (the
    # generator stops at 60s of 100ms samples = 0..59.9s, but key filter
    # keeps data through 59s — range cut at 40 keeps all 4 buckets observed)
    assert len(rows) == 4 * 2
    assert {(r["key"], r["site"]) for r in rows} == {("temp", "east"), ("temp", "west")}


def test_slimit_orders_series_by_tag_tuple(spark, sensors2):
    """SLIMIT/SOFFSET with two tags paginate series in tuple-lexical order:
    (pressure,east) (pressure,west) (temp,east) (temp,west)."""
    q = (
        "SELECT count(\"value\") FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(30s), \"key\", \"site\" SLIMIT 2 SOFFSET 1"
    )
    rows = influxql(q, {"sensors": sensors2}).collect()
    assert {(r["key"], r["site"]) for r in rows} == {
        ("pressure", "west"),
        ("temp", "east"),
    }


def test_from_multi_measurement_union(spark, sensors):
    """FROM "a", "b" — per-measurement results (never merged), stacked under
    a leading measurement column; each block equals its single-FROM run."""
    temp = sensors.where(F.col("key") == "temp")
    pres = sensors.where(F.col("key") == "pressure")
    tables = {"temp_m": temp, "pressure_m": pres}
    q = (
        "SELECT count(\"value\") FROM \"temp_m\", \"pressure_m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(10s)"
    )
    got = influxql(q, tables)
    assert got.columns == ["measurement", "time", "count"]
    rows = got.collect()
    assert len(rows) == 6
    single = influxql(
        "SELECT count(\"value\") FROM \"temp_m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(10s)",
        tables,
    ).collect()
    block = [(r["time"], r["count"]) for r in rows if r["measurement"] == "temp_m"]
    assert sorted(block) == sorted((r["time"], r["count"]) for r in single)


def test_from_regex_matches_measurements(spark, sensors):
    """FROM /regex/ — unanchored match over registered measurements, sorted;
    no match is a loud error."""
    tables = {
        "cpu_east": sensors.where(F.col("key") == "temp"),
        "cpu_west": sensors.where(F.col("key") == "pressure"),
        "mem": sensors,
    }
    got = influxql('SELECT count("value") FROM /^cpu_/', tables)
    assert [r["measurement"] for r in got.collect()] == ["cpu_east", "cpu_west"]
    with pytest.raises(ValueError):
        influxql('SELECT count("value") FROM /nothing/', tables)


def test_select_into_registers_measurement(spark, sensors):
    """SELECT ... INTO "target" FROM ... — the continuous-query form:
    materializes the result as a new measurement, re-queryable in the same
    tables mapping; downsample-then-requery round-trips."""
    tables = {"sensors": sensors}
    out = influxql(
        "SELECT mean(\"value\") INTO \"daily\" FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(10s), \"key\"",
        tables,
    )
    assert "daily" in tables
    assert out.count() == 6
    requery = influxql('SELECT max("mean") FROM "daily" GROUP BY "key"', tables)
    rows = {r["key"]: r["max"] for r in requery.collect()}
    assert set(rows) == {"temp", "pressure"}
    # max of 10s-bucket means of the temp sawtooth (0.0..0.9 per second) = 0.45
    assert abs(rows["temp"] - 0.45) < 1e-12


def test_aggregate_scalar_math_and_alias(spark, sensors):
    """SELECT mean("value") * 8 AS scaled — unit-conversion math applies to
    the aggregate BEFORE fill (the fill constant is emitted verbatim)."""
    q = (
        "SELECT mean(\"value\") * 8 AS scaled FROM \"sensors\" "
        "WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:02:30' "
        "GROUP BY time(30s) fill(7)"
    )
    rows = influxql(q, {"sensors": sensors}).orderBy("time").collect()
    assert rows[0].__fields__ == ["time", "scaled"]
    assert len(rows) == 5
    # observed buckets: mean 0.45 * 8 = 3.6; data ends at 59.9s -> buckets
    # 60s+ are filled with the verbatim constant 7 (never 56)
    assert abs(rows[0]["scaled"] - 3.6) < 1e-9
    assert abs(rows[1]["scaled"] - 3.6) < 1e-9
    assert rows[2]["scaled"] == 7.0 and rows[4]["scaled"] == 7.0


def test_scalar_agg_math_no_group(spark, sensors):
    q = (
        "SELECT count(\"value\") / 10 AS per_decisecond FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:10'"
    )
    r = influxql(q, {"sensors": sensors}).first()
    assert r["per_decisecond"] == 20.0  # 200 samples / 10


def test_raw_field_math_requires_alias(spark, sensors):
    got = influxql(
        'SELECT "value" * 2 AS doubled FROM "sensors" '
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:01'",
        {"sensors": sensors},
    )
    assert got.columns == ["time", "doubled"]
    vals = sorted(r["doubled"] for r in got.collect())
    assert vals == sorted(
        r["value"] * 2
        for r in influxql(
            'SELECT "value" FROM "sensors" '
            "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:01'",
            {"sensors": sensors},
        ).collect()
    )
    with pytest.raises(ValueError):
        influxql('SELECT "value" * 2 FROM "sensors"', {"sensors": sensors})


def test_field_to_field_math(spark, sensors):
    two = sensors.withColumn("value2", F.col("value") * 3)
    got = influxql(
        'SELECT "value2" - "value" AS delta FROM "sensors" '
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:01'",
        {"sensors": two},
    )
    assert all(abs(r["delta"]) < 2.0 for r in got.collect())
    assert got.count() == 20


def test_multi_agg_aliases(spark, sensors):
    q = (
        "SELECT mean(\"value\") AS lo_mean, max(\"value\") AS hi FROM \"sensors\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:10' "
        "GROUP BY time(5s)"
    )
    got = influxql(q, {"sensors": sensors})
    assert got.columns == ["time", "lo_mean", "hi"]
    with pytest.raises(ValueError):
        influxql(
            'SELECT mean("value") AS x, max("value") AS x FROM "sensors"',
            {"sensors": sensors},
        )


def test_alias_on_selector_and_transformation(spark, sensors):
    top = influxql(
        'SELECT top("value", 3) AS best FROM "sensors"', {"sensors": sensors}
    )
    assert top.columns == ["time", "best"]
    der = influxql(
        "SELECT derivative(mean(\"value\"), 1s) AS rate FROM \"sensors\" "
        "WHERE \"key\" = 'temp' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:00:30' "
        "GROUP BY time(10s)",
        {"sensors": sensors},
    )
    assert der.columns == ["time", "rate"]


def test_show_series_and_tag_values_in(spark, sensors2):
    """SHOW SERIES renders measurement,k=v series keys (tag keys lexical);
    SHOW TAG VALUES ... WITH KEY IN stacks (key, value) pairs."""
    series = influxql("SHOW SERIES FROM sensors", {"sensors": sensors2})
    got = [r["key"] for r in series.collect()]
    assert got == sorted(got)
    assert "sensors,key=temp,site=east" in got
    assert len(got) == 4
    # all-measurement form prefixes each block with its measurement name
    allseries = influxql(
        "SHOW SERIES", {"sensors": sensors2, "other": sensors2.limit(1)}
    )
    assert {r["key"].split(",")[0] for r in allseries.collect()} == {
        "sensors",
        "other",
    }
    tv = influxql(
        'SHOW TAG VALUES FROM sensors WITH KEY IN ("key", "site")',
        {"sensors": sensors2},
    )
    rows = [(r["key"], r["value"]) for r in tv.collect()]
    assert rows == sorted(rows)
    assert ("key", "temp") in rows and ("site", "west") in rows
    assert len(rows) == 4
