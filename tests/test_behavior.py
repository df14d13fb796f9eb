"""Semantic properties of the behavioral-analytics queries (plans/behavior.py).

Oracle hash-equivalence is covered by the generic test_relational_oracle
matrix; these pin closed-form answers on synthetic streams and analytic
bounds on the fixtures.
"""

from __future__ import annotations

import datetime as dt

from timing_explorer_spark.plans import all_queries

SPECS = all_queries()


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_trigrams_synthetic_sequence(spark, tmp_path):
    """A user repeating view->click->buy 5 times yields the cyclic trigrams;
    the dominant in-phase trigram appears exactly as often as the scan
    admits (13 windows over 15 events: 5,4,4 across the three phases)."""
    base = dt.datetime(2024, 1, 1)
    seq = ["view", "click", "buy"] * 5
    rows = [
        (i, base + dt.timedelta(minutes=i), 7, t, 1.0, "{}") for i, t in enumerate(seq)
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        (r["e1"], r["e2"], r["e3"]): r["cnt"]
        for r in SPECS["q_event_trigrams"].build(spark, str(tmp_path)).collect()
    }
    assert out[("view", "click", "buy")] == 5
    assert out[("click", "buy", "view")] == 4
    assert out[("buy", "view", "click")] == 4
    assert sum(out.values()) == 13  # n - 2 windows total


def test_wau_single_user_every_day(spark, tmp_path):
    """One user active daily: DAU = WAU = 1 → stickiness exactly 1 every day."""
    base = dt.datetime(2024, 1, 1)
    rows = [(d, base + dt.timedelta(days=d, hours=3), 1, "view", 1.0, "{}") for d in range(10)]
    _write_events(spark, tmp_path, rows)
    out = SPECS["q_wau_stickiness"].build(spark, str(tmp_path)).collect()
    assert len(out) == 10
    for r in out:
        assert (r["dau"], r["wau"], r["stickiness"]) == (1, 1, 1.0)


def test_wau_bounds_on_fixture(spark, sf_smoke):
    """DAU ≤ WAU always (the day is inside its own window) → stickiness in
    (0, 1]; WAU ≤ sum of the 7 contributing DAUs."""
    rows = SPECS["q_wau_stickiness"].build(spark, sf_smoke).collect()
    assert rows
    by_day = {r["day"]: r for r in rows}
    for r in rows:
        assert r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0
        window_dau = sum(
            by_day[d]["dau"]
            for off in range(7)
            if (d := r["day"] - dt.timedelta(days=off)) in by_day
        )
        assert r["wau"] <= window_dau


def test_audience_overlap_jaccard_bounds(spark, sf_smoke):
    rows = SPECS["q_audience_overlap"].build(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0


def test_audience_overlap_disjoint_and_identical(spark, tmp_path):
    """Types with identical audiences → Jaccard 1; disjoint audiences emit
    no pair row at all (inner join on shared users)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in (1, 2, 3):  # 'a' and 'b' share all three users
        rows.append((len(rows), base, u, "a", 1.0, "{}"))
        rows.append((len(rows), base, u, "b", 1.0, "{}"))
    for u in (8, 9):  # 'z' has a disjoint audience
        rows.append((len(rows), base, u, "z", 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    out = {
        (r["type_a"], r["type_b"]): r
        for r in SPECS["q_audience_overlap"].build(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("a", "b")}
    assert out[("a", "b")]["jaccard"] == 1.0


def test_pit_state_is_latest_preceding(spark, tmp_path):
    """Synthetic stream: view@t1, click@t3, purchases at t2 and t4 → the t2
    purchase sees 'view', the t4 purchase sees 'click'; a purchase before
    any state event keeps NULL."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base + dt.timedelta(minutes=0), 1, "purchase", 5.0, "{}"),   # before any state
        (1, base + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=2), 1, "purchase", 6.0, "{}"),
        (3, base + dt.timedelta(minutes=3), 1, "click", 1.0, "{}"),
        (4, base + dt.timedelta(minutes=4), 1, "purchase", 7.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_id"]: r
        for r in SPECS["q_pit_activity_state"].build(spark, str(tmp_path)).collect()
    }
    assert out[0]["asof_state"] is None
    assert out[2]["asof_state"] == "view"
    assert out[4]["asof_state"] == "click"


def test_cumulative_distinct_users_properties(spark, sf_smoke):
    """Monotone non-decreasing; final value equals the true distinct count;
    per-day increments equal the new-user counts."""
    from timing_explorer_spark.sources.tables import load

    rows = sorted(
        SPECS["q_cumulative_distinct_users"].build(spark, sf_smoke).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    assert rows[0]["cum_users"] == rows[0]["n_new"]
    for a, b in zip(rows, rows[1:]):
        assert b["cum_users"] == a["cum_users"] + b["n_new"]
    true_distinct = (
        load(spark, sf_smoke, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cum_users"] == true_distinct


def test_benford_shares_sum_to_one(spark, sf_smoke):
    rows = SPECS["q_benford_order_totals"].build(spark, sf_smoke).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r["n_obs"] > 0


def test_kaplan_meier_textbook_cohort(spark, tmp_path):
    """4-user cohort with hand-computed KM: churns at t=0,1,2 drop S to
    3/4, 1/2, 1/4; the censored max-horizon user leaves S unchanged."""
    base = dt.datetime(2024, 1, 1)

    def active(uid, days):
        return [
            (uid * 100 + d, base + dt.timedelta(days=d, hours=1), uid, "view", 1.0, "{}")
            for d in days
        ]

    rows = active(1, [0]) + active(2, [0, 1, 2]) + active(3, [0, 2, 4]) + active(4, [0, 1])
    _write_events(spark, tmp_path, rows)
    out = {r["duration_days"]: r for r in SPECS["q_kaplan_meier"].build(spark, str(tmp_path)).collect()}
    assert out[0]["n_at_risk"] == 4 and out[0]["churned"] == 1
    assert out[0]["survival"] == 0.75
    assert out[1]["n_at_risk"] == 3 and out[1]["survival"] == 0.5
    assert out[2]["n_at_risk"] == 2 and out[2]["survival"] == 0.25
    assert out[4]["n_at_risk"] == 1 and out[4]["churned"] == 0 and out[4]["censored"] == 1
    assert out[4]["survival"] == 0.25  # censoring leaves the curve flat


def test_kaplan_meier_monotone_on_fixture(spark, sf_smoke):
    rows = sorted(
        SPECS["q_kaplan_meier"].build(spark, sf_smoke).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    last = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= last + 1e-12  # non-increasing
        last = r["survival"]
        assert r["n_at_risk"] >= r["churned"] + r["censored"]


def test_session_stats_synthetic(spark, tmp_path):
    """One user: 3 events within 30-min gaps (one session), a lone event 2h
    later the same day (a bounce) → 2 sessions, 1 bounce, 2 events/session."""
    base = dt.datetime(2024, 1, 5, 10, 0, 0)
    rows = [
        (1, base, 7, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=10), 7, "click", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=35), 7, "view", 1.0, "{}"),  # 25min gap: same session
        (4, base + dt.timedelta(hours=3), 7, "view", 1.0, "{}"),     # new session, 1 event
    ]
    _write_events(spark, tmp_path, rows)
    out = SPECS["q_session_stats_daily"].build(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sessions"] == 2 and r["n_bounces"] == 1
    assert r["bounce_rate"] == 0.5
    assert r["events_per_session"] == 2.0
    assert r["mean_duration_sec"] == (35 * 60 + 0) / 2  # 2100s and 0s sessions


def test_bounce_rate_bounds_on_fixture(spark, sf_smoke):
    for r in SPECS["q_session_stats_daily"].build(spark, sf_smoke).collect():
        assert 0.0 <= r["bounce_rate"] <= 1.0
        assert r["events_per_session"] >= 1.0
        assert r["mean_duration_sec"] >= 0.0
