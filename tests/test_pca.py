"""Distributed PCA (operators/pca.py) — rows-only at the driver (eigen-
decomposition has no SQL oracle), so the linear algebra is pinned here:
the closed-form 2-D case, variance bookkeeping (trace preservation,
projected-coordinate variances = eigenvalues, zero cross-covariance),
exact k=d reconstruction, whitened unit variance, and stability under
repartitioning.
"""

from __future__ import annotations

import math

from timing_explorer_spark.operators.pca import (
    pca_fit,
    pca_project,
    pca_reconstruct,
)
from timing_explorer_spark.plans import all_queries

SPECS = all_queries()


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id bigint, embedding array<float>",
    )


def test_closed_form_2d(spark):
    # points on the line y = x plus symmetric noise on y = -x:
    # cov = [[a+b, a-b], [a-b, a+b]] with eigvecs (1,1)/√2 and (1,-1)/√2
    pts = [(t, t) for t in (-3, -1, 1, 3)] + [(t, -t) for t in (-1, 1)]
    model = pca_fit(_vecs(spark, pts), k=2)
    assert abs(model.mean[0]) < 1e-12 and abs(model.mean[1]) < 1e-12
    v0 = model.components[0]
    r = 1 / math.sqrt(2)
    assert abs(abs(v0[0]) - r) < 1e-9 and abs(abs(v0[1]) - r) < 1e-9
    assert v0[0] * v0[1] > 0  # the (1,1) direction dominates
    # hand-computed eigenvalues: sum t²/n along each axis pair
    # along (1,1): (9+1+1+9)*2/6... verify via trace instead:
    assert abs(model.eigenvalues[0] + model.eigenvalues[1] - model.total_variance) < 1e-9
    assert model.eigenvalues[0] > model.eigenvalues[1] > 0


def test_projected_variance_equals_eigenvalues_and_decorrelates(spark):
    import random

    rng = random.Random(7)
    rows = [[rng.gauss(0, 3), rng.gauss(0, 1), rng.gauss(0, 0.2)] for _ in range(80)]
    df = _vecs(spark, rows)
    model = pca_fit(df, k=3)
    proj = pca_project(df, model, out_col="pc").select("pc").collect()
    ys = [r["pc"] for r in proj]
    n = len(ys)
    for j in range(3):
        col = [y[j] for y in ys]
        mu = sum(col) / n
        var = sum((v - mu) ** 2 for v in col) / n
        assert abs(mu) < 1e-9                       # centered
        assert abs(var - model.eigenvalues[j]) < 1e-9 * max(1.0, var)
    # pairwise decorrelation
    for a in range(3):
        for b in range(a + 1, 3):
            cov = sum(y[a] * y[b] for y in ys) / n
            assert abs(cov) < 1e-9


def test_reconstruction_exact_at_full_rank(spark):
    rows = [[1.0, 2.0, 3.0], [4.0, 0.0, -1.0], [0.5, 2.5, 9.0], [-2.0, 1.0, 0.0]]
    df = _vecs(spark, rows)
    model = pca_fit(df, k=3)
    out = pca_reconstruct(pca_project(df, model), model).select("embedding", "recon").collect()
    for r in out:
        for x, xr in zip(r["embedding"], r["recon"]):
            assert abs(float(x) - xr) < 1e-9


def test_whitening_unit_variance(spark):
    import random

    rng = random.Random(11)
    rows = [[rng.gauss(0, 5), rng.gauss(0, 0.5)] for _ in range(60)]
    df = _vecs(spark, rows)
    model = pca_fit(df, k=2)
    ys = [r["pc"] for r in pca_project(df, model, out_col="pc", whiten=True).collect()]
    n = len(ys)
    for j in range(2):
        var = sum(y[j] ** 2 for y in ys) / n - (sum(y[j] for y in ys) / n) ** 2
        assert abs(var - 1.0) < 1e-9


def test_stable_under_repartitioning(spark):
    import random

    rng = random.Random(3)
    rows = [[rng.gauss(0, 2) for _ in range(5)] for _ in range(64)]
    m1 = pca_fit(_vecs(spark, rows).repartition(1), k=5)
    m2 = pca_fit(_vecs(spark, rows).repartition(9), k=5)
    for a, b in zip(m1.eigenvalues, m2.eigenvalues):
        assert abs(a - b) < 1e-9 * max(1.0, abs(a))
    for va, vb in zip(m1.components, m2.components):
        for x, y in zip(va, vb):
            assert abs(x - y) < 1e-7


def test_registered_query_on_fixture(spark, sf_smoke):
    out = SPECS["q_embedding_pca_variance"].build(spark, sf_smoke).collect()
    assert len(out) == 8
    evs = [r["eigenvalue"] for r in out]
    assert evs == sorted(evs, reverse=True)
    for r in out:
        # the distributed re-measurement agrees with the model eigenvalue
        assert abs(r["projected_variance"] - r["eigenvalue"]) <= 1e-6 * max(
            1.0, r["eigenvalue"]
        )
        assert 0.0 <= r["explained_variance_ratio"] <= 1.0
    cum = [r["cumulative_evr"] for r in out]
    assert all(b >= a - 1e-12 for a, b in zip(cum, cum[1:]))
    assert cum[-1] <= 1.0 + 1e-9
