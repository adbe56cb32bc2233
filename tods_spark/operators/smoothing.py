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
(HW smoothing params are fit by statsmodels' optimizer in the reference —
not reproducible without scipy — so HW takes explicit α/β/γ arguments and
the parity fixture pins OUR constants; docstring notes the deviation.)

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


_KERNELS = {
    "simple_exponential_smoothing": ses_fitted,
    "holt_smoothing": holt_fitted,
    "holt_winters_smoothing": holt_winters_fitted,
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
