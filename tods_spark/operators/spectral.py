"""Spectral / frequency-domain operators (SURVEY.md §2.8), all grouped-map
Arrow UDFs over per-series numpy.fft (Spark has no built-in FFT):

* ``fft`` / ``dct`` — FastFourierTransformPrimitive
  (tods/feature_analysis/FastFourierTransform.py:146) and
  DiscreteCosineTransformPrimitive (DiscreteCosineTransform.py:153). FFT
  emits (real, imag); DCT is the type-II transform re-derived in numpy via
  the even-extension FFT identity (scipy not available), matching
  scipy.fft.dct(norm=None).
* ``spectral_residual`` — SpectralResidualTransformPrimitive, transcribed
  EXACTLY from SpectralResidualTransform.py:304-345 + `_average_filter`
  (:350-357): fft → magnitude clamped at EPS=1e-8 → log (0 at clamped
  bins) → subtract trailing-cumulative average filter → exp → scale the
  spectrum → ifft magnitude, rounded to 4.
* ``bk_filter`` — Baxter-King band-pass (BKFilter.py:197,351-363): the
  symmetric moving-average weights from the published formula (Baxter &
  King 1999), applied as a ±K convolution; ends get NaN like statsmodels.
* ``auto_correlation`` — AutoCorrelationPrimitive (AutoCorrelation.py:160-185):
  ACF with nlags (statsmodels acf default = biased estimator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tods_spark.operators._util import grouped_apply


def _avg_filter(values: np.ndarray, n: int = 3) -> np.ndarray:
    # SpectralResidualTransform.py:350-357, verbatim semantics
    if n >= len(values):
        n = len(values)
    res = np.cumsum(values, dtype=float)
    res[n:] = res[n:] - res[:-n]
    res[n:] = res[n:] / n
    for i in range(1, n):
        res[i] /= i + 1
    return res


def spectral_residual_series(values: np.ndarray, avg_filter_dimension: int = 3
                             ) -> np.ndarray:
    # SpectralResidualTransform.py:304-333, verbatim semantics
    EPS = 1e-8
    values = np.asarray(values, float)
    trans = np.fft.fft(values)
    mag = np.sqrt(trans.real**2 + trans.imag**2)
    eps_index = np.where(mag <= EPS)[0]
    mag[eps_index] = EPS
    mag_log = np.log(mag)
    mag_log[eps_index] = 0
    spectral = np.exp(mag_log - _avg_filter(mag_log, n=avg_filter_dimension))
    trans.real = trans.real * spectral / mag
    trans.imag = trans.imag * spectral / mag
    trans.real[eps_index] = 0
    trans.imag[eps_index] = 0
    wave_r = np.fft.ifft(trans)
    return np.round(np.sqrt(wave_r.real**2 + wave_r.imag**2), 4)


def dct2_series(values: np.ndarray) -> np.ndarray:
    """DCT-II (scipy.fft.dct norm=None) via the even-extension FFT identity."""
    x = np.asarray(values, float)
    n = len(x)
    ext = np.concatenate([x, x[::-1]])
    spec = np.fft.fft(ext)[:n]
    phase = np.exp(-1j * np.pi * np.arange(n) / (2 * n))
    return (spec * phase).real


def bk_weights(low: int = 6, high: int = 32, k: int = 12) -> np.ndarray:
    """Baxter-King symmetric band-pass weights (public formula)."""
    w1, w2 = 2 * np.pi / high, 2 * np.pi / low
    j = np.arange(1, k + 1)
    b = (np.sin(w2 * j) - np.sin(w1 * j)) / (np.pi * j)
    b0 = (w2 - w1) / np.pi
    full = np.concatenate([b[::-1], [b0], b])
    return full - full.mean()  # normalize to sum zero


def acf_series(values: np.ndarray, nlags: int = 40) -> np.ndarray:
    """Biased ACF, r_k = sum((y_t-ȳ)(y_{t+k}-ȳ)) / sum((y_t-ȳ)²)."""
    y = np.asarray(values, float)
    y = y - y.mean()
    n = len(y)
    denom = float(y @ y) or 1.0
    k = min(nlags, n - 1)
    out = np.empty(k + 1)
    for i in range(k + 1):
        out[i] = float(y[: n - i] @ y[i:]) / denom
    return out


def spectral_transform(
    df: DataFrame,
    value_cols: list[str],
    method: str = "spectral_residual",
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    **params,
) -> DataFrame:
    """Append per-series spectral columns. method ∈ {spectral_residual,
    fft_mag, dct, bk_filter, hp_cycle, hp_trend, yeo_johnson,
    wavelet_denoise}."""
    from tods_spark.functions import filters as FL

    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        for c in value_cols:
            y = pdf[c].to_numpy(float)
            if method == "spectral_residual":
                pdf[f"{c}_spectral_residual"] = spectral_residual_series(
                    y, params.get("avg_filter_dimension", 3)
                )
            elif method == "fft_mag":
                pdf[f"{c}_fft_mag"] = np.abs(np.fft.fft(y))
            elif method == "dct":
                pdf[f"{c}_dct"] = dct2_series(y)
            elif method == "bk_filter":
                w = bk_weights(params.get("low", 6), params.get("high", 32),
                               params.get("k", 12))
                k = (len(w) - 1) // 2
                conv = np.convolve(y, w[::-1], mode="same")
                conv[:k] = np.nan
                conv[len(y) - k:] = np.nan
                pdf[f"{c}_bk_filter"] = conv
            elif method in ("hp_cycle", "hp_trend"):
                cycle, trend = FL.hp_filter(y, params.get("lamb", 1600.0))
                pdf[f"{c}_{method}"] = cycle if method == "hp_cycle" else trend
            elif method == "yeo_johnson":
                pdf[f"{c}_yeo_johnson"] = FL.yeo_johnson_transform(
                    y, params.get("lmbda"), params.get("standardize", True),
                    params.get("lmbda_decimals"),
                )
            elif method == "wavelet_denoise":
                coeffs = FL.haar_dwt(y, params.get("level"))
                thr = params.get("threshold", 0.0)
                coeffs = [coeffs[0]] + [
                    np.where(np.abs(cd) > thr, cd, 0.0) for cd in coeffs[1:]
                ]
                pdf[f"{c}_wavelet_denoise"] = FL.haar_idwt(coeffs, len(y))
            else:
                raise ValueError(method)
        return pdf

    suffix = {"spectral_residual": "spectral_residual", "fft_mag": "fft_mag",
              "dct": "dct", "bk_filter": "bk_filter", "hp_cycle": "hp_cycle",
              "hp_trend": "hp_trend", "yeo_johnson": "yeo_johnson",
              "wavelet_denoise": "wavelet_denoise"}[method]
    new_cols = ", ".join(f"`{c}_{suffix}` double" for c in value_cols)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + new_cols
    return grouped_apply(df, keys, fn, schema)


def auto_correlation(
    df: DataFrame,
    value_cols: list[str],
    nlags: int = 40,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> DataFrame:
    """Per-series ACF — one output row per lag (long form, unlike the
    reference's nlags+1-row column block appended to the frame)."""
    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        rows = {}
        for c in value_cols:
            rows[f"{c}_acf"] = acf_series(pdf[c].to_numpy(float), nlags)
        out = pd.DataFrame(rows)
        out.insert(0, "lag", np.arange(len(out)))
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, "lag", *rows]]

    key_fields = "".join(f"`{k}` string, " for k in keys)
    acf_fields = ", ".join(f"`{c}_acf` double" for c in value_cols)
    schema = f"{key_fields}lag int, {acf_fields}"
    return grouped_apply(df, keys, fn, schema)
