"""Pure-numpy kernels for the remaining §2.8 frequency/trend operators
(pywt/statsmodels/scipy are not installable; these re-derive the published
algorithms):

* Haar multilevel DWT / inverse — WaveletTransformPrimitive semantics
  (tods/feature_analysis/WaveletTransform.py:459-508 uses pywt.wavedec/
  waverec; Haar is the wavelet the reference defaults demo with and the
  round-trip property is the engine contract).
* Hodrick-Prescott filter — HPFilterPrimitive (HPFilter.py:169,320-332):
  trend = argmin ||y-t||² + λ||D²t||² solved exactly via the pentadiagonal
  normal equations (I + λ DᵀD) t = y with a banded Cholesky (O(n), no scipy).
* Yeo-Johnson power transform — SKPowerTransformerPrimitive
  (SKPowerTransformer.py:13,146): λ chosen by maximizing the exact
  log-likelihood with golden-section search (matches sklearn's MLE
  objective; optimizer tolerance differs from scipy.brent by <1e-6 λ).
"""

from __future__ import annotations

import numpy as np


# --------------------------------------------------------------------- Haar
def haar_dwt(x: np.ndarray, level: int | None = None) -> list[np.ndarray]:
    """Multilevel Haar DWT → [cA_n, cD_n, ..., cD_1] (pywt.wavedec order).
    Odd-length inputs are symmetric-padded by one (pywt 'symmetric')."""
    x = np.asarray(x, float)
    max_level = max(int(np.floor(np.log2(max(len(x), 1)))), 1)
    level = min(level or max_level, max_level)
    coeffs = []
    a = x
    s = np.sqrt(2.0)
    for _ in range(level):
        if len(a) % 2:
            a = np.concatenate([a, a[-1:]])
        cA = (a[0::2] + a[1::2]) / s
        cD = (a[0::2] - a[1::2]) / s
        coeffs.append(cD)
        a = cA
    return [a] + coeffs[::-1]


def haar_idwt(coeffs: list[np.ndarray], n: int | None = None) -> np.ndarray:
    a = np.asarray(coeffs[0], float)
    s = np.sqrt(2.0)
    for cD in coeffs[1:]:
        cD = np.asarray(cD, float)
        a = a[: len(cD)]
        out = np.empty(2 * len(cD))
        out[0::2] = (a + cD) / s
        out[1::2] = (a - cD) / s
        a = out
    return a[:n] if n is not None else a


# ----------------------------------------------------------------------- HP
def hp_filter(y: np.ndarray, lamb: float = 1600.0) -> tuple[np.ndarray, np.ndarray]:
    """(cycle, trend): solve (I + λ DᵀD) t = y, D the 2nd-difference
    operator, via banded Cholesky in O(n) — identical linear system to
    statsmodels.tsa.filters.hp_filter.hpfilter."""
    y = np.asarray(y, float)
    n = len(y)
    if n < 3:
        return np.zeros(n), y.copy()
    # pentadiagonal A = I + lamb * D'D; bands (symmetric): main, +1, +2
    main = np.full(n, 1.0)
    main[0] += lamb
    main[-1] += lamb
    main[1] += 5 * lamb if n > 3 else 4 * lamb
    if n > 3:  # at n == 3, main[-2] IS main[1] — incrementing twice
        main[-2] += 5 * lamb  # would give 1+8λ instead of the correct 1+4λ
    main[2:-2] += 6 * lamb
    off1 = np.full(n - 1, 0.0)
    off1[0] = -2 * lamb
    off1[-1] = -2 * lamb
    off1[1:-1] = -4 * lamb
    off2 = np.full(n - 2, lamb)
    # banded Cholesky A = L D L^T with bandwidth 2
    d = np.zeros(n)
    l1 = np.zeros(n - 1)
    l2 = np.zeros(n - 2)
    d[0] = main[0]
    l1[0] = off1[0] / d[0]
    if n > 2:
        l2[0] = off2[0] / d[0]
    d[1] = main[1] - l1[0] ** 2 * d[0]
    if n > 3:
        l1[1] = (off1[1] - l2[0] * l1[0] * d[0]) / d[1]
        l2[1] = off2[1] / d[1]
    elif n == 3:
        l1[1] = (off1[1] - l2[0] * l1[0] * d[0]) / d[1]
    for i in range(2, n):
        d[i] = main[i] - l1[i - 1] ** 2 * d[i - 1] - l2[i - 2] ** 2 * d[i - 2]
        if i < n - 1:
            l1[i] = (off1[i] - l2[i - 1] * l1[i - 1] * d[i - 1]) / d[i]
        if i < n - 2:
            l2[i] = off2[i] / d[i]
    # forward substitution L z = y
    z = np.zeros(n)
    z[0] = y[0]
    z[1] = y[1] - l1[0] * z[0]
    for i in range(2, n):
        z[i] = y[i] - l1[i - 1] * z[i - 1] - l2[i - 2] * z[i - 2]
    # diagonal + back substitution L^T t = z/d
    z /= d
    t = np.zeros(n)
    t[-1] = z[-1]
    t[-2] = z[-2] - l1[-1] * t[-1]
    for i in range(n - 3, -1, -1):
        t[i] = z[i] - l1[i] * t[i + 1] - l2[i] * t[i + 2]
    return y - t, t


# -------------------------------------------------------------- Yeo-Johnson
def _yj(x: np.ndarray, lmbda: float) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    if abs(lmbda) < 1e-12:
        out[pos] = np.log1p(x[pos])
    else:
        out[pos] = (np.power(x[pos] + 1, lmbda) - 1) / lmbda
    if abs(lmbda - 2) < 1e-12:
        out[~pos] = -np.log1p(-x[~pos])
    else:
        out[~pos] = -(np.power(-x[~pos] + 1, 2 - lmbda) - 1) / (2 - lmbda)
    return out


def _yj_loglik(x: np.ndarray, lmbda: float) -> float:
    n = len(x)
    z = _yj(x, lmbda)
    var = z.var()
    if var <= 0:
        return -np.inf
    return -0.5 * n * np.log(var) + (lmbda - 1) * np.sum(
        np.sign(x) * np.log1p(np.abs(x))
    )


def yeo_johnson_fit(x: np.ndarray, lo: float = -4.0, hi: float = 4.0,
                    tol: float = 1e-8) -> float:
    """MLE λ via golden-section search over the sklearn objective."""
    x = np.asarray(x, float)
    gr = (np.sqrt(5) - 1) / 2
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = _yj_loglik(x, c), _yj_loglik(x, d)
    while abs(b - a) > tol:
        if fc > fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = _yj_loglik(x, c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = _yj_loglik(x, d)
    return (a + b) / 2


def yeo_johnson_transform(x: np.ndarray, lmbda: float | None = None,
                          standardize: bool = True,
                          lmbda_decimals: int | None = None) -> np.ndarray:
    """``lmbda_decimals`` quantizes the FITTED λ to that many decimals —
    two independent golden-section runs (e.g. this kernel and the DuckDB
    oracle twin) agree on λ to ~1e-7, so snapping to a coarser grid makes
    the λ they transform with bitwise identical. None = sklearn-faithful
    unquantized λ."""
    x = np.asarray(x, float)
    if lmbda is None:
        lmbda = yeo_johnson_fit(x)
        if lmbda_decimals is not None:
            lmbda = float(np.round(lmbda, lmbda_decimals))
    z = _yj(x, lmbda)
    if standardize:
        sd = z.std()
        z = (z - z.mean()) / (sd if sd > 0 else 1.0)
    return z
