"""Holt-Winters forecasting — the engine's time-series extrapolation
operator, exposed through the InfluxQL surface as
``holt_winters(<agg>(field), h, m)`` / ``holt_winters_with_fit`` (InfluxDB's
forecasting functions; see the public InfluxQL docs).

Method: ADDITIVE triple exponential smoothing (Holt-Winters seasonal
method, Winters 1960 — public-textbook formulation; see e.g. Hyndman &
Athanasopoulos, "Forecasting: Principles and Practice", §8.3):

    level_t  = alpha*(y_t - season_{t-m}) + (1-alpha)*(level_{t-1} + trend_{t-1})
    trend_t  = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}
    season_t = gamma*(y_t - level_t)       + (1-gamma)*season_{t-m}
    yhat_{t+h} = level_t + h*trend_t + season_{t - m + (h mod m)}

With m == 0 this degrades to Holt's linear (double) smoothing. The
smoothing parameters are fitted per series by minimizing in-sample SSE
with a deterministic hand-rolled Nelder-Mead (fixed start simplex, fixed
iteration budget — bit-stable across runs and partitionings; numpy only).

Parity note: InfluxDB also fits by Nelder-Mead over SSE, but its exact
seasonal formulation, initialization, and optimizer schedule are
implementation details of that engine — this operator claims the same
SURFACE and method family, not bit-equal output, so its registry entry is
rows-only (no DuckDB oracle exists for an optimizer loop either) and its
quality is pinned by closed-form tests (constant series -> constant
forecast, linear series -> linear continuation, periodic series ->
pattern continuation; tests/test_forecast.py).

Scale: fitting runs per SERIES on the GROUP BY time() aggregate — the
series length is bounded by the query's time range / bucket width, the
per-series state is three scalars plus m seasonal terms, and distinct
series parallelize across the cluster via applyInPandas. The raw fact
table never reaches Python.
"""

from __future__ import annotations

import numpy as np


def _hw_sse(params: np.ndarray, y: np.ndarray, m: int) -> float:
    """In-sample one-step-ahead SSE of additive Holt-Winters with the given
    (alpha, beta, gamma); parameters outside [0, 1] are infeasible."""
    alpha, beta, gamma = params
    if not (0.0 <= alpha <= 1.0 and 0.0 <= beta <= 1.0 and 0.0 <= gamma <= 1.0):
        return float("inf")
    n = len(y)
    if m > 0:
        # classical init: first-season mean level, mean first-season ->
        # second-season increment trend, first-season deviations as seasonals
        level = float(np.mean(y[:m]))
        trend = (
            float((np.mean(y[m : 2 * m]) - np.mean(y[:m])) / m) if n >= 2 * m else 0.0
        )
        season = (y[:m] - level).astype(float).copy()
        start = m
    else:
        level = float(y[0])
        trend = float(y[1] - y[0]) if n > 1 else 0.0
        season = None
        start = 1
    sse = 0.0
    for t in range(start, n):
        s = season[t % m] if m > 0 else 0.0
        yhat = level + trend + s
        err = float(y[t]) - yhat
        sse += err * err
        prev_level = level
        level = alpha * (float(y[t]) - s) + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1.0 - beta) * trend
        if m > 0:
            season[t % m] = gamma * (float(y[t]) - level) + (1.0 - gamma) * s
    return sse


def _nelder_mead(f, x0: np.ndarray, step: float = 0.25, iters: int = 150) -> np.ndarray:
    """Deterministic Nelder-Mead (standard reflection/expansion/contraction/
    shrink coefficients 1, 2, 0.5, 0.5; fixed axis-aligned start simplex,
    fixed iteration budget). Good enough for a smooth 3-parameter SSE bowl;
    no randomness, so results are identical on every run and executor."""
    n = len(x0)
    simplex = [x0.copy()]
    for i in range(n):
        p = x0.copy()
        p[i] = min(1.0, p[i] + step)
        simplex.append(p)
    fv = [f(p) for p in simplex]
    for _ in range(iters):
        order = np.argsort(fv, kind="stable")
        simplex = [simplex[i] for i in order]
        fv = [fv[i] for i in order]
        centroid = np.mean(simplex[:-1], axis=0)
        # reflect
        xr = centroid + (centroid - simplex[-1])
        fr = f(xr)
        if fr < fv[0]:
            xe = centroid + 2.0 * (centroid - simplex[-1])
            fe = f(xe)
            simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:  # shrink toward best
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    fv[i] = f(simplex[i])
    return simplex[int(np.argmin(fv))]


def holt_winters_forecast(
    y: np.ndarray, h: int, m: int, with_fit: bool = False
) -> np.ndarray:
    """Fit additive Holt-Winters on ``y`` and forecast ``h`` steps.

    Returns the h forecast values, or (fitted ++ forecast) when
    ``with_fit`` (InfluxDB's holt_winters_with_fit shape: the in-sample
    one-step-ahead fit followed by the forecast).
    """
    y = np.asarray(y, dtype=float)
    n = len(y)
    if m < 0:
        raise ValueError("seasonal pattern length must be >= 0")
    if m > 0 and n < 2 * m:
        raise ValueError(
            f"holt_winters needs >= 2 full seasons of points (2*{m}), got {n}"
        )
    if n < 2:
        raise ValueError("holt_winters needs at least 2 points")
    params = _nelder_mead(lambda p: _hw_sse(p, y, m), np.array([0.5, 0.1, 0.1]))
    alpha, beta, gamma = np.clip(params, 0.0, 1.0)

    # replay the recursion with the fitted parameters, recording the fit
    if m > 0:
        level = float(np.mean(y[:m]))
        trend = float((np.mean(y[m : 2 * m]) - np.mean(y[:m])) / m)
        season = (y[:m] - level).astype(float).copy()
        start = m
        fitted = list(y[:m])  # warm-up points fit themselves (no prediction)
    else:
        level = float(y[0])
        trend = float(y[1] - y[0]) if n > 1 else 0.0
        season = None
        start = 1
        fitted = [float(y[0])]
    for t in range(start, n):
        s = season[t % m] if m > 0 else 0.0
        fitted.append(level + trend + s)
        prev_level = level
        level = alpha * (float(y[t]) - s) + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1.0 - beta) * trend
        if m > 0:
            season[t % m] = gamma * (float(y[t]) - level) + (1.0 - gamma) * s
    forecast = [
        level + (k + 1) * trend + (season[(n + k) % m] if m > 0 else 0.0)
        for k in range(h)
    ]
    out = (fitted + forecast) if with_fit else forecast
    return np.asarray(out, dtype=float)
