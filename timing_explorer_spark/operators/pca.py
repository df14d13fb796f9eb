"""Distributed PCA / whitening over an embedding column — the dimensionality-
reduction step in front of ANN indexing and semantic dedup (FAISS's OPQ/PCA
pre-transform; SemDeDup et al. cluster in a reduced space).

Spark-first shape for n ≫ d (the 100 TB case: billions of vectors, d ≤ a few
thousand):

  1. FIT reduces the corpus to sufficient statistics — one pass emitting a
     PER-ARROW-BATCH partial (Σxxᵀ flattened d², Σx, count). Shuffle volume
     is (#batches × d²) regardless of corpus size: the map-side-combine shape
     of linear algebra. This is the module's one Python stage (dense matmul —
     the same numpy-over-Arrow exception as similarity.nearest_neighbor_all);
     it never appears in a registered query's returned plan (fit is eager).
  2. The d×d covariance eigendecomposition happens ON THE DRIVER (numpy) —
     O(d³) is trivial next to the scan; the model (mean + top-k components,
     sign-fixed) is O(k·d) and broadcasts as literals.
  3. PROJECT is pure JVM dataflow: y_j = Σ_i (x_i − μ_i)·W_ij as zip_with +
     aggregate HOFs per output coordinate — map-only, WholeStageCodegen, no
     Python, no shuffle.

Determinism: per-batch float sums depend on row placement, so fitted values
are bit-stable for a FIXED partitioning and agree to ~1e-9 relative under
repartitioning (covariance entries are means of bounded products); the
eigenvector sign is fixed by convention (largest-|coordinate| positive).
Tests pin the closed-form 2-D case, variance bookkeeping (Σ eigenvalues =
total variance; projected coordinate variances = eigenvalues; cross-covariance
0), exact k=d reconstruction, and whitened unit variance.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double


@dataclass(frozen=True)
class PCAModel:
    mean: list[float]          # d
    components: list[list[float]]  # k rows, each d (orthonormal, sign-fixed)
    eigenvalues: list[float]   # k, descending
    total_variance: float      # trace of the covariance (all d directions)
    n: int


def _suffstats(df: DataFrame, vec_col: str):
    """(Σxxᵀ, Σx, n) via per-batch numpy partials — one scan, tiny output."""
    import numpy as np

    d_row = df.select(F.size(vec_col).alias("d")).first()
    if d_row is None:
        raise ValueError("pca: empty input")
    d = int(d_row["d"])
    schema = "gram array<double>, s array<double>, n long"

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "gram": [(X.T @ X).ravel().tolist()],
                    "s": [X.sum(axis=0).tolist()],
                    "n": [len(X)],
                }
            )

    parts = df.select(F.col(vec_col).cast("array<double>").alias(vec_col)).mapInPandas(
        fn, schema
    ).collect()
    if not parts:
        raise ValueError("pca: empty input")
    gram = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    # fixed driver-side reduction order (by partition emission order is not
    # stable across runs — sort partials for bit-stable accumulation)
    for r in sorted(parts, key=lambda r: (r["n"], r["s"])):
        gram += np.asarray(r["gram"]).reshape(d, d)
        s += np.asarray(r["s"])
        n += int(r["n"])
    return gram, s, n


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAModel:
    """Fit on one distributed pass + an O(d³) driver eigendecomposition."""
    import numpy as np

    gram, s, n = _suffstats(df, vec_col)
    if n < 2:
        raise ValueError("pca: need at least 2 rows")
    mu = s / n
    # covariance (population, 1/n): E[xxT] - mu muT
    cov = gram / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    k = min(k, len(evals))
    comps = []
    for j in range(k):
        v = evecs[:, j]
        i = int(np.argmax(np.abs(v)))
        if v[i] < 0:                             # sign convention
            v = -v
        comps.append([float(x) for x in v])
    return PCAModel(
        mean=[float(x) for x in mu],
        components=comps,
        eigenvalues=[float(max(e, 0.0)) for e in evals[:k]],
        total_variance=float(max(np.trace(cov), 0.0)),
        n=n,
    )


def _proj_expr(vec_col: str, mean: list[float], component: list[float]):
    """Σ_i (x_i − μ_i)·w_i as pure JVM HOFs (centering folded into a constant:
    x·w − μ·w, so the row-side work is one zip_with dot)."""
    w = F.array(*[F.lit(float(c)) for c in component])
    offset = sum(m * c for m, c in zip(mean, component))
    dot = F.aggregate(
        F.zip_with(as_double(F.col(vec_col)), w, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot - F.lit(float(offset))


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pc",
    whiten: bool = False,
) -> DataFrame:
    """Append ``out_col`` = array<double> of k projected (optionally whitened)
    coordinates. Map-only JVM dataflow; the model rides as literals."""
    import math

    coords = []
    for j, comp in enumerate(model.components):
        e = _proj_expr(vec_col, model.mean, comp)
        if whiten:
            sd = math.sqrt(model.eigenvalues[j]) or 1.0
            e = e / F.lit(sd)
        coords.append(e)
    return df.withColumn(out_col, F.array(*coords))


def pca_reconstruct(
    df: DataFrame, model: PCAModel, pc_col: str = "pc", out_col: str = "recon"
) -> DataFrame:
    """Inverse transform x̂ = μ + Σ_j y_j·w_j — exact when k = d (tested)."""
    d = len(model.mean)
    exprs = []
    for i in range(d):
        e = F.lit(float(model.mean[i]))
        for j, comp in enumerate(model.components):
            e = e + F.element_at(F.col(pc_col), j + 1) * F.lit(float(comp[i]))
        exprs.append(e)
    return df.withColumn(out_col, F.array(*exprs))
