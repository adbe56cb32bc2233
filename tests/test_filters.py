"""Haar DWT, Hodrick-Prescott, Yeo-Johnson — numpy kernels + Spark operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from tods_spark.functions import filters as FL
from tods_spark.operators import spectral as SP


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), min_size=2, max_size=257))
def test_haar_roundtrip(xs):
    x = np.asarray(xs, float)
    rec = FL.haar_idwt(FL.haar_dwt(x), len(x))
    np.testing.assert_allclose(rec, x, rtol=1e-9, atol=1e-6)


def test_haar_energy_preservation():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 256)
    coeffs = FL.haar_dwt(x)
    energy = sum(float((c**2).sum()) for c in coeffs)
    np.testing.assert_allclose(energy, float((x**2).sum()), rtol=1e-9)


def test_hp_filter_properties():
    # trend of a pure line IS the line; cycle ~ 0
    t = np.arange(200, dtype=float)
    y = 3.0 + 0.5 * t
    cycle, trend = FL.hp_filter(y, 1600.0)
    np.testing.assert_allclose(trend, y, atol=1e-6)
    np.testing.assert_allclose(cycle, 0, atol=1e-6)
    # solving the normal equations exactly: residual check A t = y
    rng = np.random.default_rng(5)
    y2 = np.cumsum(rng.normal(0, 1, 150)) + 10 * np.sin(np.arange(150) / 6)
    lamb = 1600.0
    c2, t2 = FL.hp_filter(y2, lamb)
    n = len(y2)
    D = np.zeros((n - 2, n))
    for i in range(n - 2):
        D[i, i], D[i, i + 1], D[i, i + 2] = 1.0, -2.0, 1.0
    A = np.eye(n) + lamb * D.T @ D
    t_exact = np.linalg.solve(A, y2)
    np.testing.assert_allclose(t2, t_exact, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(c2, y2 - t_exact, rtol=1e-7, atol=1e-8)


def test_hp_filter_tiny_series_vs_dense():
    # n == 3 and n == 4 hit every banded-matrix edge case (at n == 3,
    # main[1] and main[-2] are the SAME element — regression for the
    # double-increment bug that made the diagonal 1+8λ instead of 1+4λ)
    for n, lamb in [(3, 1600.0), (3, 2.0), (4, 1600.0), (5, 10.0)]:
        rng = np.random.default_rng(n)
        y = np.cumsum(rng.normal(0, 1, n))
        _, trend = FL.hp_filter(y, lamb)
        D = np.zeros((n - 2, n))
        for i in range(n - 2):
            D[i, i], D[i, i + 1], D[i, i + 2] = 1.0, -2.0, 1.0
        A = np.eye(n) + lamb * D.T @ D
        np.testing.assert_allclose(trend, np.linalg.solve(A, y),
                                   rtol=1e-9, atol=1e-9)


def test_yeo_johnson_gaussianizes():
    rng = np.random.default_rng(7)
    x = rng.exponential(2.0, 2000)  # heavily right-skewed
    z = FL.yeo_johnson_transform(x)
    def skew(a):
        a = a - a.mean()
        return (a**3).mean() / (a**2).mean() ** 1.5
    assert abs(skew(z)) < 0.15 < abs(skew(x))
    np.testing.assert_allclose(z.mean(), 0, atol=1e-9)
    np.testing.assert_allclose(z.std(), 1, atol=1e-9)
    # identity case: already-normal data -> lambda near 1
    xn = rng.normal(5, 1, 4000)
    assert abs(FL.yeo_johnson_fit(xn) - 1.0) < 0.25


def test_spark_hp_and_wavelet_and_yj(spark):
    rng = np.random.default_rng(9)
    y = np.cumsum(rng.normal(0, 1, 128))
    pdf = pd.DataFrame({"timestamp": range(128), "value": y})
    df = spark.createDataFrame(pdf)
    trend = (
        SP.spectral_transform(df, ["value"], "hp_trend")
        .orderBy("timestamp").toPandas()["value_hp_trend"].to_numpy()
    )
    _, t_exp = FL.hp_filter(y)
    np.testing.assert_allclose(trend, t_exp, rtol=1e-9)
    den = (
        SP.spectral_transform(df, ["value"], "wavelet_denoise", threshold=0.0)
        .orderBy("timestamp").toPandas()["value_wavelet_denoise"].to_numpy()
    )
    np.testing.assert_allclose(den, y, rtol=1e-9)  # thr=0 → exact round-trip
    yj = (
        SP.spectral_transform(df, ["value"], "yeo_johnson")
        .orderBy("timestamp").toPandas()["value_yeo_johnson"].to_numpy()
    )
    np.testing.assert_allclose(yj, FL.yeo_johnson_transform(y), rtol=1e-6)
