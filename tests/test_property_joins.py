"""Property-based checks (hypothesis) for the hand-rolled temporal joins and
the exact-aggregation helpers — the operators with real custom logic.

Each example spins Spark jobs, so example counts are deliberately small; the
generators aim density at the interesting boundaries (equal timestamps,
bucket edges, empty sides) rather than breadth.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from timing_explorer_spark.functions.numeric import exact_sum
from timing_explorer_spark.operators.joins import asof_join, interval_pairs

BASE = dt.datetime(2024, 1, 1)

# (key, seconds-offset) pairs; tight key/offset ranges force collisions at
# bucket boundaries and shared keys.
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 900), st.integers(0, 999_999)),
    min_size=0,
    max_size=25,
)


def _mk_events(spark, raw):
    rows = [
        (i, f"u{k}", BASE + dt.timedelta(seconds=s, microseconds=us))
        for i, (k, s, us) in enumerate(raw)
    ]
    return spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(raw=events_strategy)
def test_interval_pairs_matches_naive(spark, raw):
    df = _mk_events(spark, raw)
    got = {
        (r.user_id, r.id_a, r.id_b)
        for r in interval_pairs(df, key="user_id", max_gap_seconds=300).collect()
    }
    rows = [(i, f"u{k}", BASE + dt.timedelta(seconds=s, microseconds=us))
            for i, (k, s, us) in enumerate(raw)]
    expected = {
        (ka, ia, ib)
        for (ia, ka, ta) in rows
        for (ib, kb, tb) in rows
        if ka == kb and ia < ib and abs((ta - tb).total_seconds()) <= 300
    }
    assert got == expected


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_raw=events_strategy,
    right_raw=events_strategy,
)
def test_asof_join_matches_naive(spark, left_raw, right_raw):
    # Unique (key, ts) per side: ASOF tie-breaking among equal right
    # timestamps is unspecified in every engine (incl. DuckDB), so ties are
    # excluded from the property, not from the operator.
    def dedup(raw):
        seen, out = set(), []
        for k, s, us in raw:
            if (k, s, us) not in seen:
                seen.add((k, s, us))
                out.append((k, s, us))
        return out

    left_raw, right_raw = dedup(left_raw), dedup(right_raw)
    left = _mk_events(spark, left_raw)
    right = _mk_events(spark, right_raw)
    got = {
        (r.event_id, r.asof_event_id)
        for r in asof_join(
            left, right, on="user_id", right_cols=("event_id",)
        ).collect()
    }
    lrows = [(i, f"u{k}", BASE + dt.timedelta(seconds=s, microseconds=us))
             for i, (k, s, us) in enumerate(left_raw)]
    rrows = [(i, f"u{k}", BASE + dt.timedelta(seconds=s, microseconds=us))
             for i, (k, s, us) in enumerate(right_raw)]
    expected = set()
    for li, lk, lt in lrows:
        cands = [(rt, ri) for ri, rk, rt in rrows if rk == lk and rt <= lt]
        expected.add((li, max(cands)[1] if cands else None))
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=40,
    ),
    n_parts=st.integers(1, 6),
)
def test_exact_sum_invariant_under_repartition(spark, vals, n_parts):
    """The whole point of fixed-point aggregation: identical bits no matter
    how the rows are partitioned."""
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    a = df.coalesce(1).agg(exact_sum(F.col("x")).alias("s")).collect()[0]["s"]
    b = (
        df.repartition(n_parts)
        .agg(exact_sum(F.col("x")).alias("s"))
        .collect()[0]["s"]
    )
    assert a == b  # bitwise, not approx


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",
        "q_stats_aggregates",
        # round-3 families: every one must reproduce bit-identically under
        # different shuffle widths (the 1000-executor == laptop property)
        "q_m4_downsample",
        "q_time_weighted_avg",
        "q_sensor_correlation",
        "q_vocab_heavy_hitters",
        "q_neardup_pagerank",
        "q_bigram_surprisal",
        "q_embedding_rp_project",
        "q_quality_expectations",
        # session additions: closed-form CUSUM, argmax LTTB selection,
        # slope-median Theil-Sen, SAX words, order-statistic winsorization,
        # Morton layout, span coverage, int8 ranking — all claim bit-exact
        # determinism; hold them to it
        "q_cusum_changepoints",
        "q_lttb_downsample",
        "q_theil_sen_trend",
        "q_sax_symbols",
        "q_winsorized_stats",
        "q_zorder_layout",
        "q_boilerplate_span_coverage",
        "q_exact_substr_trim",
        "q_int8_embedding_topk",
        # statistical/behavioral suite: exact-moment regressions and
        # correlation, decimal-rounded-log information metrics, value-grain
        # Gini, integer-moment centroid cosines, first-seen prefix sums —
        # every one claims bit-exact determinism; hold them to it
        "q_ols_trend",
        "q_acf_hourly",
        "q_seasonal_hod_anomaly",
        "q_token_entropy",
        "q_kl_source_divergence",
        "q_doclen_gini",
        "q_zipf_slope",
        "q_burstiness",
        "q_label_centroids",
        "q_wau_stickiness",
        "q_cumulative_distinct_users",
        "q_benford_order_totals",
        "q_weighted_median_price",
        "q_ks_source_drift",
        "q_kaplan_meier",
        "q_seasonal_naive_mase",
        "q_event_trigrams",
        "q_audience_overlap",
        "q_pit_activity_state",
        "q_session_stats_daily",
        "q_bigram_pmi",
        "q_heaps_law",
        "q_word_burstiness",
    ],
)
def test_query_results_partition_invariant(spark, sf_smoke, name):
    """Whole-query determinism: the decimal/exact-moment aggregation queries
    return bit-identical results under different shuffle widths — the
    property that makes a 1000-executor run reproduce a laptop run."""
    from timing_explorer_spark.plans import all_queries
    from timing_explorer_spark.testing import spark_canonical

    spec = all_queries()[name]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for nparts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            results.append(spark_canonical(spec.build(spark, sf_smoke)))
        assert results[0] == results[1]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_asof_directions_and_tolerance(spark):
    """backward/forward/nearest semantics + tolerance nulling, on a frame
    small enough to verify by hand. Left rows at :10 and 1:00; right rows at
    :08 (v=1), :11 (v=2), 10:00 (v=3)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10"), (2, "2024-01-01 00:01:00")], ["id", "ts"]
    ).select("id", F.col("ts").cast("timestamp").alias("ts"), F.lit(1).alias("k"))
    right = spark.createDataFrame(
        [("2024-01-01 00:00:08", 1.0), ("2024-01-01 00:00:11", 2.0), ("2024-01-01 00:10:00", 3.0)],
        ["ts", "v"],
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v", F.lit(1).alias("k"))

    def got(**kw):
        rows = asof_join(left, right, on="k", right_cols=("v",), **kw).orderBy("id").collect()
        return [(r["id"], r["asof_v"]) for r in rows]

    assert got(direction="backward") == [(1, 1.0), (2, 2.0)]
    assert got(direction="forward") == [(1, 2.0), (2, 3.0)]
    # nearest: id1 -> :11 is 1s away vs :08 2s away; id2 -> :11 (49s) vs 10:00 (540s)
    assert got(direction="nearest") == [(1, 2.0), (2, 2.0)]
    # 5s tolerance nulls id2's 49s-away nearest match
    assert got(direction="nearest", tolerance_us=5_000_000) == [(1, 2.0), (2, None)]


def test_asof_equal_timestamp_visibility(spark):
    """A right row at exactly left.ts must be visible in BOTH directions
    (<= and >= inclusive semantics, matching DuckDB ASOF and merge_asof)."""
    left = spark.createDataFrame([(1, "2024-01-01 00:00:10")], ["id", "ts"]).select(
        "id", F.col("ts").cast("timestamp").alias("ts"), F.lit(1).alias("k")
    )
    right = spark.createDataFrame([("2024-01-01 00:00:10", 7.0)], ["ts", "v"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "v", F.lit(1).alias("k")
    )
    for d in ("backward", "forward", "nearest"):
        rows = asof_join(left, right, on="k", right_cols=("v",), direction=d).collect()
        assert [(r["id"], r["asof_v"]) for r in rows] == [(1, 7.0)], d
