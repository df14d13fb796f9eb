"""Semantic properties of the hypothesis-testing suite
(plans/hypothesis_suite.py).

DuckDB hash-equivalence of every query is covered by the generic oracle
matrix (scripts/driver_sim.py / test_relational_oracle); these tests pin the
MATH — closed-form answers on synthetic inputs where the right value is known
a priori, plus hard analytic bounds on the real fixtures.
"""

from __future__ import annotations

import datetime as dt
import math

from timing_explorer_spark.plans import all_queries

SPECS = all_queries()

_BASE = dt.datetime(2024, 1, 1)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _events(type_values):
    rows = []
    i = 0
    for et, vals in type_values.items():
        for v in vals:
            rows.append((i, _BASE + dt.timedelta(minutes=i), i % 7, et, v, "{}"))
            i += 1
    return rows


def test_welch_closed_form(spark, tmp_path):
    """Hand-computed Welch t on two tiny samples must match to float
    round-off (the engine uses the identical formula over exact cent
    moments, so agreement is ~1 ulp, not statistical)."""
    a = [10.0, 12.0, 14.0, 16.0]  # mean 13, var 20/3
    b = [9.0, 10.0, 11.0]  # mean 10, var 1
    _write_events(spark, tmp_path, _events({"purchase": a, "click": b}))
    r = SPECS["q_welch_ttest"].build(spark, str(tmp_path)).collect()[0]
    n1, n2 = len(a), len(b)
    m1 = sum(a) / n1
    m2 = sum(b) / n2
    v1 = sum((x - m1) ** 2 for x in a) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in b) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert r["n_purchase"] == n1 and r["n_click"] == n2
    assert math.isclose(r["mean_purchase"], m1, rel_tol=1e-12)
    assert math.isclose(r["t_stat"], t, rel_tol=1e-9)
    assert math.isclose(r["welch_df"], df, rel_tol=1e-9)


def test_chi2_exactly_zero_when_independent(spark, tmp_path):
    """A contingency table where every cell equals its expectation has
    chi-squared EXACTLY zero (per-cell terms are exact-zero doubles before
    the decimal rounding), and Cramér's V zero."""
    rows = []
    i = 0
    for lang in ("en", "de"):
        for source in ("s0", "s1", "s2"):
            for _ in range(10):
                rows.append((i, "t", lang, source, 1))
                i += 1
    _write_docs(spark, tmp_path, rows)
    r = SPECS["q_chi2_lang_source"].build(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 60
    assert r["n_langs"] == 2 and r["n_sources"] == 3
    assert r["dof"] == 2
    assert r["chi2"] == 0.0
    assert r["cramers_v"] == 0.0


def test_chi2_counts_zero_cells(spark, tmp_path):
    """Perfect association (each lang seen in only its own source) must
    yield chi2 == n * min(r-1, c-1), i.e. Cramér's V == 1 — this only holds
    if structurally-missing cells enter the statistic as o=0."""
    rows = []
    i = 0
    for lang, source in (("en", "s0"), ("de", "s1")):
        for _ in range(15):
            rows.append((i, "t", lang, source, 1))
            i += 1
    _write_docs(spark, tmp_path, rows)
    r = SPECS["q_chi2_lang_source"].build(spark, str(tmp_path)).collect()[0]
    assert r["dof"] == 1
    assert math.isclose(r["chi2"], 30.0, rel_tol=1e-12)
    assert math.isclose(r["cramers_v"], 1.0, rel_tol=1e-12)


def test_mann_whitney_complete_separation(spark, tmp_path):
    """All purchase values above all view values -> U_purchase = n1*n2
    exactly, and z positive."""
    a = [100.0 + i for i in range(5)]
    b = [1.0 + i for i in range(4)]
    _write_events(spark, tmp_path, _events({"purchase": a, "view": b}))
    r = SPECS["q_mann_whitney_u"].build(spark, str(tmp_path)).collect()[0]
    assert r["n_purchase"] == 5 and r["n_view"] == 4
    assert r["u_purchase"] == 20.0
    assert r["u_view"] == 0.0
    assert r["z_stat"] > 0


def test_mann_whitney_identical_distributions(spark, tmp_path):
    """Identical value multisets in both groups -> U1 = U2 = n1*n2/2 and
    z exactly 0 (midranks make the rank sums equal by symmetry)."""
    vals = [1.0, 2.0, 2.0, 3.0]
    _write_events(spark, tmp_path, _events({"purchase": vals, "view": list(vals)}))
    r = SPECS["q_mann_whitney_u"].build(spark, str(tmp_path)).collect()[0]
    assert r["u_purchase"] == 8.0
    assert r["u_view"] == 8.0
    assert r["z_stat"] == 0.0


def test_stl_pure_seasonal_series(spark, tmp_path):
    """A purely periodic hourly-count signal (period 24, no trend) must
    decompose to: constant trend == the period mean, seasonal == the
    centered pattern, residual ~ 0 (within the decimal(27,8) summand
    rounding) wherever the trend window is full."""
    pattern = [10 + (h % 24) for h in range(24)]  # counts 10..33
    n_hours = 6 * 24
    rows = []
    i = 0
    for t in range(n_hours):
        for _ in range(pattern[t % 24]):
            rows.append((i, _BASE + dt.timedelta(hours=t, minutes=1), 1, "view", 1.0, "{}"))
            i += 1
    _write_events(spark, tmp_path, rows)
    out = SPECS["q_stl_decompose"].build(spark, str(tmp_path)).collect()
    assert len(out) == n_hours
    period_mean = sum(pattern) / 24.0
    full = [r for r in out if r["trend"] is not None]
    # 2x24 MA windows are full for rows 12 .. n-13
    assert len(full) == n_hours - 24
    for r in full:
        assert math.isclose(r["trend"], period_mean, rel_tol=1e-12)
        expected_seasonal = pattern[r["hod"]] - period_mean
        assert abs(r["seasonal"] - expected_seasonal) < 1e-6
        assert abs(r["resid"]) < 1e-6
    # seasonal components must (approximately) sum to zero over one period
    by_hod = {r["hod"]: r["seasonal"] for r in full}
    assert len(by_hod) == 24
    assert abs(sum(by_hod.values())) < 1e-6


def test_fixture_bounds(spark, sf_smoke):
    """Finite, well-formed statistics on the real fixture."""
    w = SPECS["q_welch_ttest"].build(spark, sf_smoke).collect()[0]
    assert w["n_purchase"] > 0 and w["n_click"] > 0
    assert math.isfinite(w["t_stat"]) and w["welch_df"] > 1
    c = SPECS["q_chi2_lang_source"].build(spark, sf_smoke).collect()[0]
    assert c["chi2"] >= 0 and 0 <= c["cramers_v"] <= 1
    m = SPECS["q_mann_whitney_u"].build(spark, sf_smoke).collect()[0]
    assert 0 <= m["u_purchase"] <= m["n_purchase"] * m["n_view"]
    assert math.isclose(
        m["u_purchase"] + m["u_view"], m["n_purchase"] * m["n_view"], rel_tol=1e-12
    )
    s = SPECS["q_stl_decompose"].build(spark, sf_smoke)
    rows = s.collect()
    assert len(rows) > 24
    full = [r for r in rows if r["trend"] is not None]
    # decomposition identity holds row-by-row
    for r in full[:50]:
        assert math.isclose(
            r["trend"] + r["seasonal"] + r["resid"], float(r["y"]), rel_tol=1e-9
        )
