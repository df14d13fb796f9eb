"""Holt-Winters forecasting: closed-form quality pins for the core math
(functions/forecast.py) and the InfluxQL surface
(holt_winters / holt_winters_with_fit over GROUP BY time())."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from timing_explorer_spark.functions.forecast import holt_winters_forecast
from timing_explorer_spark.functions.influxql import influxql


def test_constant_series_forecasts_constant():
    f = holt_winters_forecast(np.full(20, 5.0), 3, 0)
    assert np.allclose(f, 5.0)


def test_linear_series_continues_line():
    y = 2.0 * np.arange(30) + 1.0
    f = holt_winters_forecast(y, 3, 0)
    assert np.allclose(f, [61.0, 63.0, 65.0], atol=1e-6)


def test_seasonal_series_continues_pattern():
    pat = np.array([0.0, 3.0, 1.0, -2.0])
    y = np.tile(pat, 8) + 0.5 * np.arange(32)
    f = holt_winters_forecast(y, 4, 4)
    expect = pat[np.arange(32, 36) % 4] + 0.5 * np.arange(32, 36)
    assert np.allclose(f, expect, atol=1e-6)


def test_with_fit_prefixes_in_sample_fit():
    pat = np.array([1.0, -1.0])
    y = np.tile(pat, 10)
    out = holt_winters_forecast(y, 2, 2, with_fit=True)
    assert len(out) == 22
    assert np.allclose(out[-2:], pat, atol=1e-6)  # forecast continues pattern


def test_determinism_and_input_validation():
    y = np.sin(np.arange(40) / 3.0)
    assert np.array_equal(
        holt_winters_forecast(y, 5, 8), holt_winters_forecast(y, 5, 8)
    )
    with pytest.raises(ValueError):
        holt_winters_forecast(np.arange(5.0), 1, 4)  # < 2 seasons
    with pytest.raises(ValueError):
        holt_winters_forecast(np.array([1.0]), 1, 0)  # < 2 points


@pytest.fixture()
def seasonal_df(spark):
    """A perfectly daily-seasonal hourly series over 4 days: value depends
    only on hour-of-day, so a (24-bucket season) forecast must reproduce
    the next day's pattern exactly."""
    rows = []
    for d in range(4):
        for hh in range(24):
            rows.append((f"2024-01-0{d+1} {hh:02d}:30:00", float(hh % 6)))
    return (
        spark.createDataFrame(rows, ["ts", "value"])
        .select(F.col("ts").cast("timestamp").alias("ts"), "value")
    )


def test_influxql_holt_winters_forecast_rows(spark, seasonal_df):
    q = (
        "SELECT holt_winters(mean(\"value\"), 24, 24) FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-05 00:00:00' "
        "GROUP BY time(1h) ORDER BY time ASC"
    )
    rows = influxql(q, {"m": seasonal_df}).collect()
    assert len(rows) == 24
    # forecast buckets start right after the last observed bucket
    assert str(rows[0]["time"]) == "2024-01-05 00:00:00"
    got = [r["holt_winters"] for r in rows]
    expect = [float(hh % 6) for hh in range(24)]
    assert np.allclose(got, expect, atol=1e-6)


def test_influxql_holt_winters_with_fit_and_errors(spark, seasonal_df):
    q = (
        "SELECT holt_winters_with_fit(mean(\"value\"), 12, 24) FROM \"m\" "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-05 00:00:00' "
        "GROUP BY time(1h)"
    )
    rows = influxql(q, {"m": seasonal_df}).collect()
    assert len(rows) == 96 + 12  # fitted buckets + horizon
    with pytest.raises(ValueError):
        influxql('SELECT holt_winters(mean("value"), 5, 0) FROM "m"', {"m": seasonal_df})
    with pytest.raises(ValueError):
        influxql(
            "SELECT holt_winters(mean(\"value\"), 5, 0) FROM \"m\" "
            "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-05 00:00:00' "
            "GROUP BY time(1h) fill(0)",
            {"m": seasonal_df},
        )


def test_influxql_holt_winters_rejects_unknown_agg_and_tz(spark, seasonal_df):
    with pytest.raises(ValueError, match="inner aggregate"):
        influxql(
            "SELECT holt_winters(bogus(\"value\"), 5, 0) FROM \"m\" "
            "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-05 00:00:00' "
            "GROUP BY time(1h)",
            {"m": seasonal_df},
        )
    with pytest.raises(ValueError, match="tz"):
        influxql(
            "SELECT holt_winters(mean(\"value\"), 5, 0) FROM \"m\" "
            "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-05 00:00:00' "
            "GROUP BY time(1d) tz('America/New_York')",
            {"m": seasonal_df},
        )
