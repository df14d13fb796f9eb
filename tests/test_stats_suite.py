"""Semantic properties of the statistics suite (plans/stats_suite.py).

The DuckDB hash-equivalence of every query is covered by the generic
test_relational_oracle matrix; these tests pin the MATH — closed-form answers
on synthetic inputs where the right value is known a priori, and hard
analytic bounds on the real fixtures.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from timing_explorer_spark.plans import all_queries

SPECS = all_queries()


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_ols_recovers_exact_linear_trend(spark, tmp_path):
    """A noiseless daily series y = 7 + 3·day must come back with slope
    exactly 3, intercept exactly 7, R² exactly 1 — the closed form is exact
    integer arithmetic, so no tolerance is needed."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (d, base + dt.timedelta(days=d), 1, "lin", 7.0 + 3.0 * d, "{}")
        for d in range(10)
    ]
    _write_events(spark, tmp_path, rows)
    out = SPECS["q_ols_trend"].build(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 10
    assert r["slope_per_day"] == 3.0
    assert r["intercept"] == 7.0
    assert r["r2"] == 1.0


def test_acf_perfectly_periodic_series(spark, tmp_path):
    """A series with an exact period of 24 hours has lag-24 autocorrelation
    exactly 1 (every pair is (x, x) of a non-constant signal)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24 * 10):  # 10 full days
        # hour-of-day-dependent count: hod % 4 + 1 events in hour h
        for _ in range((h % 24) % 4 + 1):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), 1, "per", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r["lag_h"]: r for r in SPECS["q_acf_hourly"].build(spark, str(tmp_path)).collect()}
    assert out[24]["acf"] == 1.0
    assert abs(out[1]["acf"]) <= 1.0


def test_acf_bounds_on_fixture(spark, sf_smoke):
    for r in SPECS["q_acf_hourly"].build(spark, sf_smoke).collect():
        assert -1.0 - 1e-12 <= r["acf"] <= 1.0 + 1e-12


def test_seasonal_anomaly_bounds(spark, sf_smoke):
    """Chebyshev: at most 1/4 of hours can sit beyond 2σ of their own
    profile; counts are also trivially bounded by the group size."""
    for r in SPECS["q_seasonal_hod_anomaly"].build(spark, sf_smoke).collect():
        assert 0 <= r["n_anomalous"] <= r["n_hours"]
        assert r["n_anomalous"] <= r["n_hours"] / 4 + 1
        assert r["std_cnt"] >= 0.0


def test_entropy_uniform_and_bounds(spark, tmp_path):
    """All-distinct tokens → H = ln(n) exactly (up to the 8-decimal log
    rounding); repeated single token → H = 0. Real docs obey
    0 ≤ H ≤ ln(n_types)."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c d e f g h", "en", "s", 15),
            (2, "x x x x", "en", "s", 7),
        ],
    )
    out = {r["doc_id"]: r for r in SPECS["q_token_entropy"].build(spark, str(tmp_path)).collect()}
    assert abs(out[1]["entropy_nats"] - math.log(8)) < 1e-7
    assert out[1]["ttr"] == 1.0
    assert out[2]["entropy_nats"] == 0.0
    assert out[2]["n_types"] == 1


def test_entropy_bounds_on_fixture(spark, sf_smoke):
    rows = SPECS["q_token_entropy"].build(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["n_types"]) + 1e-7


def test_zipf_slope_negative(spark, sf_smoke):
    r = SPECS["q_zipf_slope"].build(spark, sf_smoke).collect()[0]
    assert r["n_words"] > 10  # sf0.001's synthetic vocabulary is ~31 words
    assert r["slope"] < 0.0  # frequency decreases with rank by construction


def test_kl_nonnegative_and_zero_for_identical(spark, tmp_path, sf_smoke):
    """Gibbs' inequality: KL ≥ 0 always; a source whose distribution equals
    the corpus distribution (single source) has KL exactly 0."""
    _write_docs(spark, tmp_path, [(1, "a a b c", "en", "only", 7), (2, "a b c c", "en", "only", 7)])
    out = SPECS["q_kl_source_divergence"].build(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["kl_nats"] == 0.0
    for r in SPECS["q_kl_source_divergence"].build(spark, sf_smoke).collect():
        assert r["kl_nats"] >= -1e-7  # 8-decimal log rounding can dip ~1e-8


def test_gini_closed_forms(spark, tmp_path):
    """Equal lengths → G = 0. The two-value case {1×a, (n-1)×b} has a closed
    form; check 900×100 vs 100×10000 explicitly. Real data stays in [0, 1)."""
    rows = [(i, "t", "en", "eq", 500) for i in range(10)]
    rows += [(100 + i, "t", "en", "skew", 100 if i < 9 else 91 * 100) for i in range(10)]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in SPECS["q_doclen_gini"].build(spark, str(tmp_path)).collect()}
    assert out["eq"]["gini"] == 0.0
    # skew: 9 docs of 100 chars + 1 doc of 9100 chars, total 10000.
    # G = 2*T/(n*S) - (n+1)/n with T = sum i*x_(i) = 100*(1+..+9) + 9100*10
    t = 100 * sum(range(1, 10)) + 9100 * 10
    expected = 2 * t / (10 * 10000) - 11 / 10
    assert abs(out["skew"]["gini"] - expected) < 1e-12


def test_gini_bounds_on_fixture(spark, sf_smoke):
    for r in SPECS["q_doclen_gini"].build(spark, sf_smoke).collect():
        assert -1e-12 <= r["gini"] < 1.0


def test_ols_trend_partitioning_invariant(spark, sf_smoke):
    """Exact-moment aggregation ⇒ identical bits under hostile partitioning."""
    a = sorted(map(tuple, SPECS["q_ols_trend"].build(spark, sf_smoke).collect()))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(map(tuple, SPECS["q_ols_trend"].build(spark, sf_smoke).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_interarrival_percentiles_ordered(spark, sf_smoke):
    rows = SPECS["q_interarrival_profile"].build(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r["p50_us"] <= r["p90_us"] <= r["p99_us"]
        assert r["n_gaps"] > 0


def test_burstiness_bounds(spark, sf_smoke):
    for r in SPECS["q_burstiness"].build(spark, sf_smoke).collect():
        assert r["fano"] >= 0.0
        assert -1.0 < r["burstiness"] < 1.0
        assert r["mean_per_hour"] > 0.0


def test_burstiness_constant_series_is_minimal(spark, tmp_path):
    """A perfectly regular series (same count every hour) has zero variance:
    Fano = 0 and burstiness = -1 exactly (σ = 0)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (h * 2 + k, base + dt.timedelta(hours=h, minutes=k), 1, "flat", 1.0, "{}")
        for h in range(48)
        for k in range(2)
    ]
    _write_events(spark, tmp_path, rows)
    r = SPECS["q_burstiness"].build(spark, str(tmp_path)).collect()[0]
    assert r["fano"] == 0.0
    assert r["burstiness"] == -1.0
    assert r["mean_per_hour"] == 2.0


def test_cross_source_dup_canonical_pairs(spark, sf_smoke):
    rows = SPECS["q_cross_source_dup"].build(spark, sf_smoke).collect()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["n_shared_docs"] >= 1


def test_cross_source_dup_synthetic(spark, tmp_path):
    """Two sources sharing exactly one identical text (after whitespace
    normalization) → one pair row with count 1; a third source with unique
    content appears in no pair."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "shared doc body", "en", "alpha", 15),
            (2, "  shared   doc body ", "en", "beta", 20),  # same after norm
            (3, "only in alpha", "en", "alpha", 13),
            (4, "unique gamma", "en", "gamma", 12),
        ],
    )
    rows = SPECS["q_cross_source_dup"].build(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert (rows[0]["source_a"], rows[0]["source_b"], rows[0]["n_shared_docs"]) == (
        "alpha",
        "beta",
        1,
    )


def test_hard_negatives_label_mismatch(spark, sf_smoke):
    rows = SPECS["q_hard_negatives"].build(spark, sf_smoke).collect()
    assert rows
    per_query = {}
    for r in rows:
        assert r["neighbor_label"] != r["query_label"]
        assert -1.0 - 1e-12 <= r["cos"] <= 1.0 + 1e-12
        assert 1 <= r["rank"] <= 5
        per_query.setdefault(r["query_id"], []).append(r)
    for q, rs in per_query.items():
        # ranks are dense from 1 and cosine is non-increasing along them
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        ordered = sorted(rs, key=lambda r: r["rank"])
        assert all(a["cos"] >= b["cos"] for a, b in zip(ordered, ordered[1:]))


def test_label_centroids_bounds_and_self_similarity(spark, sf_smoke, tmp_path):
    for r in SPECS["q_label_centroids"].build(spark, sf_smoke).collect():
        assert r["label_a"] < r["label_b"]
        assert -1.0 - 1e-12 <= r["cos_centroid"] <= 1.0 + 1e-12
    # two labels whose members are identical vectors -> centroid cosine 1
    rows = [(i, [0.5, -0.25, 0.125, 1.0], 1) for i in range(3)]
    rows += [(10 + i, [0.5, -0.25, 0.125, 1.0], 2) for i in range(5)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = SPECS["q_label_centroids"].build(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["cos_centroid"] == 1.0


def test_weighted_median_properties(spark, sf_smoke):
    """The weighted median must satisfy the defining inequalities: weight at
    or below it ≥ W/2, and weight strictly below it < W/2... (lower median
    convention). Verified against a direct computation."""
    from pyspark.sql import functions as F

    from timing_explorer_spark.sources.tables import load

    out = {
        r["l_returnflag"]: r
        for r in SPECS["q_weighted_median_price"].build(spark, sf_smoke).collect()
    }
    li = load(spark, sf_smoke, "lineitem")
    rows = li.select(
        "l_returnflag",
        F.rint(F.col("l_extendedprice") * 100).cast("long").alias("pu"),
        F.rint(F.col("l_quantity")).cast("long").alias("w"),
    ).collect()
    import collections

    by_flag = collections.defaultdict(list)
    for r in rows:
        by_flag[r["l_returnflag"]].append((r["pu"], r["w"]))
    for flag, pairs in by_flag.items():
        big_w = sum(w for _, w in pairs)
        med_u = round(out[flag]["weighted_median_price"] * 100)
        at_or_below = sum(w for p, w in pairs if p <= med_u)
        below = sum(w for p, w in pairs if p < med_u)
        assert 2 * at_or_below >= big_w
        assert 2 * below < big_w
        assert out[flag]["total_weight"] == big_w


def test_ks_drift_bounds_and_shifted_source(spark, sf_smoke, tmp_path):
    """D ∈ [0, 1]; a source whose lengths are shifted far from the rest has
    D = 1 (disjoint supports)."""
    for r in SPECS["q_ks_source_drift"].build(spark, sf_smoke).collect():
        assert 0.0 <= r["d_stat"] <= 1.0
    rows = [(i, "t", "en", "low", 100 + i) for i in range(20)]
    rows += [(50 + i, "t", "en", "high", 9000 + i) for i in range(20)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["source"]: r for r in SPECS["q_ks_source_drift"].build(spark, str(tmp_path)).collect()}
    assert out["low"]["d_stat"] == 1.0
    assert out["high"]["d_stat"] == 1.0


def test_mase_zero_for_perfectly_periodic(spark, tmp_path):
    """A series with exact 24h periodicity: the seasonal-naive forecast is
    perfect (MASE = 0) while the naive baseline errs on every step."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24 * 5):
        for _ in range((h % 24) % 4 + 1):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=2), 1, "per", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    r = SPECS["q_seasonal_naive_mase"].build(spark, str(tmp_path)).collect()[0]
    assert r["mae_seasonal"] == 0.0
    assert r["mae_naive"] > 0.0
    assert r["mase"] == 0.0


def test_mase_bounds_on_fixture(spark, sf_smoke):
    rows = SPECS["q_seasonal_naive_mase"].build(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["mae_seasonal"] >= 0.0 and r["mae_naive"] >= 0.0
        assert r["n_hours"] > 0


def test_pmi_synthetic_collocation(spark, tmp_path):
    """'new york' always adjacent vs independent fillers: the collocation's
    PMI is ln(N·c/( c·c )) = ln(N/c) > 0 and tops independent pairs."""
    import math

    docs = [(i, "new york " + " ".join(f"w{j}" for j in range(i % 3 + 1)), "en", "s", 20)
            for i in range(10)]
    _write_docs(spark, tmp_path, docs)
    rows = SPECS["q_bigram_pmi"].build(spark, str(tmp_path)).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    ny = by_pair[("new", "york")]
    assert ny["n12"] == 10
    # c(new,·)=10, c(·,york)=10, so PMI = ln(N*10/(10*10)) = ln(N/10)
    n_total = sum(r_["n12"] for r_ in rows)  # top-50 covers all pairs here
    assert abs(ny["pmi"] - math.log(n_total / 10)) < 1e-6


def test_heaps_law_closed_forms(spark, tmp_path):
    """All-unique vocabulary: V(N) = N exactly => beta = 1, ln_k = 0. A
    saturated corpus (every doc repeats one word) gives beta = 0."""
    # Separate dirs: load() caches the analyzed plan (and file listing) per
    # (session, dir) — overwriting the same dir would leave the cached scan
    # pointing at deleted part files.
    docs = [(i, " ".join(f"u{i}_{j}" for j in range(4)), "en", "s", 30) for i in range(64)]
    _write_docs(spark, f"{tmp_path}/a", docs)
    r = SPECS["q_heaps_law"].build(spark, f"{tmp_path}/a").collect()[0]
    assert r["n_checkpoints"] == 6  # checkpoints 2,4,8,16,32,64
    assert abs(r["beta"] - 1.0) < 1e-7
    assert abs(r["ln_k"]) < 1e-6
    docs2 = [(i, "same same same same", "en", "s", 20) for i in range(64)]
    _write_docs(spark, f"{tmp_path}/b", docs2)
    r2 = SPECS["q_heaps_law"].build(spark, f"{tmp_path}/b").collect()[0]
    assert abs(r2["beta"]) < 1e-7


def test_heaps_beta_plausible_on_fixture(spark, sf_smoke):
    r = SPECS["q_heaps_law"].build(spark, sf_smoke).collect()[0]
    assert 0.0 <= r["beta"] <= 1.0 + 1e-9  # vocab can't grow faster than tokens
