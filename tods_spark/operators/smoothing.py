"""Exponential-smoothing recurrences (SURVEY.md §2.5):

* SES  — SimpleExpSmoothing(y).fit(smoothing_level=0.2, optimized=False)
         .fittedvalues (tods/timeseries_processing/SimpleExponentialSmoothing.py:186)
* Holt — Holt(y).fit(smoothing_level=0.2, smoothing_slope=0.2,
         optimized=False).fittedvalues (HoltSmoothing.py:182)
* Holt-Winters — ExponentialSmoothing(y, seasonal_periods=3, trend='add',
         seasonal='add').fit(use_boxcox=False).fittedvalues
         (HoltWintersExponentialSmoothing.py:181)

statsmodels is not installable here; the recurrences are re-derived in numpy
from the published Holt-Winters equations with the classic ("legacy
heuristic") initialization statsmodels uses when optimized=False:
  SES:   l0 = y0;                     fitted[t] = l_{t-1}, fitted[0] = l0
  Holt:  l0 = y0, b0 = y1 - y0;       fitted[t] = l_{t-1} + b_{t-1}
  HW(add, m): l0 = mean(y[:m]), b0 = (mean(y[m:2m]) - mean(y[:m]))/m,
         s0_i = y_i - l0;             fitted[t] = l_{t-1}+b_{t-1}+s_{t-m}
(HW smoothing params are fit by statsmodels' internal optimizer in the
reference; `holt_winters_auto` replicates that fit as a deterministic
multi-start Nelder-Mead SSE minimization over (α, β, γ) in [0,1]³ —
same objective, same bounds, numpy-only. Explicit α/β/γ remain available
via `holt_winters_smoothing` for pinned-parameter parity fixtures.)

Recurrences don't fit Catalyst window frames (each output depends on the
previous OUTPUT, not a fixed frame) → grouped-map Arrow UDF per series,
vectorized numpy inside; group size bounded by the series key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tods_spark.operators._util import grouped_apply


def ses_fitted(y: np.ndarray, alpha: float = 0.2) -> np.ndarray:
    y = np.asarray(y, float)
    out = np.empty_like(y)
    level = y[0]
    out[0] = level
    for t in range(1, len(y)):
        out[t] = level
        level = alpha * y[t] + (1 - alpha) * level
    return out


def holt_fitted(y: np.ndarray, alpha: float = 0.2, beta: float = 0.2) -> np.ndarray:
    y = np.asarray(y, float)
    n = len(y)
    out = np.empty_like(y)
    level = y[0]
    trend = y[1] - y[0] if n > 1 else 0.0
    for t in range(n):
        out[t] = level + trend
        if t < n:
            new_level = alpha * y[t] + (1 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1 - beta) * trend
            level = new_level
    return out


def holt_winters_fitted(
    y: np.ndarray, m: int = 3, alpha: float = 0.2, beta: float = 0.1,
    gamma: float = 0.1,
) -> np.ndarray:
    y = np.asarray(y, float)
    n = len(y)
    if n < 2 * m:
        return ses_fitted(y)
    l = float(np.mean(y[:m]))
    b = (float(np.mean(y[m : 2 * m])) - l) / m
    s = list(y[:m] - l)
    out = np.empty_like(y)
    for t in range(n):
        si = s[t % m] if t < m else s[-m]
        out[t] = l + b + si
        snew = gamma * (y[t] - l - b) + (1 - gamma) * si
        lnew = alpha * (y[t] - si) + (1 - alpha) * (l + b)
        b = beta * (lnew - l) + (1 - beta) * b
        l = lnew
        s.append(snew)
    return out


def _hw_sse(y: np.ndarray, m: int, a: float, b: float, g: float) -> float:
    """Holt-Winters SSE with SEQUENTIAL error accumulation (not numpy's
    pairwise `.sum()`): every operation, in this order, is plain IEEE
    +/−/×, so the DuckDB oracle twin's list_reduce fold reproduces the
    value BITWISE — which in turn makes the whole Nelder-Mead search path
    (driven purely by SSE comparisons) cross-engine identical."""
    n = len(y)
    if n < 2 * m:
        fitted = ses_fitted(y)
        sse = 0.0
        for t in range(n):
            err = y[t] - fitted[t]
            sse = sse + err * err
        return sse
    l = (y[0] + y[1] + y[2]) / 3.0 if m == 3 else float(np.mean(y[:m]))
    bb = (((y[3] + y[4] + y[5]) / 3.0 if m == 3 else float(np.mean(y[m:2 * m])))
          - l) / m
    r = [y[t] - l for t in range(m)]
    sse = 0.0
    for t in range(n):
        si = r[t % m]
        err = y[t] - (l + bb + si)
        sse = sse + err * err
        snew = g * ((y[t] - l) - bb) + (1 - g) * si
        lnew = a * (y[t] - si) + (1 - a) * (l + bb)
        bb = b * (lnew - l) + (1 - b) * bb
        l = lnew
        r[t % m] = snew
    return sse


def _nelder_mead(f, x0: np.ndarray, step: float = 0.15,
                 max_iter: int = 400, tol: float = 1e-10):
    """Minimal Nelder-Mead simplex (standard 1/2/0.5/0.5 coefficients),
    numpy-only — the optimizer statsmodels applies to the Holt-Winters SSE
    when .fit(optimized=True); returns (x_best, f_best). Deterministic."""
    n = len(x0)
    simplex = [np.asarray(x0, float)]
    for i in range(n):
        v = simplex[0].copy()
        v[i] += step
        simplex.append(v)
    fv = [f(v) for v in simplex]
    for _ in range(max_iter):
        order = np.argsort(fv)
        simplex = [simplex[i] for i in order]
        fv = [fv[i] for i in order]
        if abs(fv[-1] - fv[0]) <= tol * (abs(fv[0]) + tol):
            break
        centroid = np.mean(simplex[:-1], axis=0)
        xr = centroid + (centroid - simplex[-1])          # reflect
        fr = f(xr)
        if fr < fv[0]:
            xe = centroid + 2.0 * (centroid - simplex[-1])  # expand
            fe = f(xe)
            simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)  # contract
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:                                           # shrink
                simplex = [simplex[0]] + [
                    simplex[0] + 0.5 * (v - simplex[0]) for v in simplex[1:]
                ]
                fv = [fv[0]] + [f(v) for v in simplex[1:]]
    best = int(np.argmin(fv))
    return simplex[best], fv[best]


def holt_winters_optimize(y: np.ndarray, m: int = 3,
                          start_grid: tuple | None = None,
                          max_iter: int = 400
                          ) -> tuple[float, float, float]:
    """Fit (α, β, γ) by SSE minimization over the fitted values — the numpy
    replication of what statsmodels' ExponentialSmoothing(...).fit()
    does for the reference (HoltWintersExponentialSmoothing.py:169-181,
    which calls .fit() with the internal optimizer). Multi-start
    Nelder-Mead on a fixed seed grid (deterministic, no RNG); parameters
    outside [0,1] are rejected with an infinite penalty (statsmodels'
    box bounds)."""
    y = np.asarray(y, float)

    def sse(p):
        a, b, g = p
        if not (1e-4 <= a <= 1 - 1e-4 and 0 <= b <= 1 and 0 <= g <= 1):
            return np.inf
        return _hw_sse(y, m, a, b, g)

    best_x, best_f = None, np.inf
    for a0, b0, g0 in start_grid if start_grid is not None else DEFAULT_STARTS:
        x, fx = _nelder_mead(sse, np.array([a0, b0, g0]), max_iter=max_iter)
        if fx < best_f:
            best_x, best_f = x, fx
    a, b, g = np.clip(best_x, 0.0, 1.0)
    return float(a), float(b), float(g)


#: statsmodels-style deterministic multi-start seed grid (3 α × 2 (β,γ)).
DEFAULT_STARTS = tuple(
    (a0, b0, g0)
    for a0 in (0.1, 0.5, 0.9)
    for b0, g0 in ((0.05, 0.05), (0.2, 0.2))
)

#: 2-start subset used by the driver-budget `holt_winters_auto_1d` query —
#: the SQL twin inlines the SAME grid so both sides run the identical search.
SMALL_STARTS = ((0.1, 0.05, 0.05), (0.5, 0.2, 0.2))


def holt_winters_auto(y: np.ndarray, m: int = 3,
                      start_grid: tuple | None = None,
                      max_iter: int = 400) -> np.ndarray:
    """Holt-Winters fittedvalues with optimizer-chosen (α, β, γ) — the
    engine analogue of the reference's statsmodels .fit() default.
    `start_grid` shrinks the multi-start seed grid (same optimizer code
    path) for driver-budget variants; default = the full 6-start grid."""
    y = np.asarray(y, float)
    if len(y) < 2 * m:
        return ses_fitted(y)
    a, b, g = holt_winters_optimize(y, m, start_grid=start_grid,
                                    max_iter=max_iter)
    return holt_winters_fitted(y, m, a, b, g)


_KERNELS = {
    "simple_exponential_smoothing": ses_fitted,
    "holt_smoothing": holt_fitted,
    "holt_winters_smoothing": holt_winters_fitted,
    "holt_winters_auto": holt_winters_auto,
}


def smooth(
    df: DataFrame,
    value_cols: list[str],
    method: str = "simple_exponential_smoothing",
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    **params,
) -> DataFrame:
    """Append `<col>_<method>` columns, computed per (keys) series in one
    grouped-map Arrow UDF."""
    kern = _KERNELS[method]
    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        for c in value_cols:
            pdf[f"{c}_{method}"] = kern(pdf[c].to_numpy(float), **params)
        return pdf

    new_cols = ", ".join(f"`{c}_{method}` double" for c in value_cols)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + new_cols
    return grouped_apply(df, keys, fn, schema)
