"""Matrix profile (SURVEY.md §2.8/§2.10 — MatrixProfilePrimitive wraps
stumpy.stump, tods/feature_analysis/MatrixProfile.py:36,123 and
tods/detection_algorithm/MatrixProfile.py:216; stumpy is not installable).

Re-derived from the published STOMP algorithm (Zhu et al., "Matrix Profile
II", ICDM 2016 — public knowledge): z-normalized Euclidean distance between
every length-m subsequence and its nearest non-trivial neighbor.

    QT_{i,j} = dot(x[i:i+m], x[j:j+m]) maintained incrementally:
    QT_{i+1,j+1} = QT_{i,j} - x[i]x[j] + x[i+m]x[j+m]
    dist² = 2m (1 - (QT - m μ_i μ_j) / (m σ_i σ_j))

O(n²) per series with O(n) memory per row — fine for bounded per-series
groups (the engine keys series by doc/day); distributed across series via
grouped-map Arrow UDF. Discord detection = top-k profile values; motif =
argmin. The standard m/4 exclusion zone suppresses trivial self-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tods_spark.operators._util import grouped_apply


def matrix_profile_series(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(profile, profile_index) — z-normalized, exclusion zone ceil(m/4)."""
    x = np.asarray(x, float)
    n = len(x)
    k = n - m + 1
    if k < 2:
        return np.full(max(k, 0), np.inf), np.full(max(k, 0), -1)
    excl = int(np.ceil(m / 4))
    # subsequence means/stds via cumsum
    c = np.concatenate(([0.0], np.cumsum(x)))
    c2 = np.concatenate(([0.0], np.cumsum(x * x)))
    mu = (c[m:] - c[:-m]) / m
    var = (c2[m:] - c2[:-m]) / m - mu**2
    sig = np.sqrt(np.maximum(var, 1e-14))

    prof = np.full(k, np.inf)
    pidx = np.full(k, -1)
    # first row of QT: dot(x[0:m], x[j:j+m]) for all j — O(n m) once
    qt_first = np.array([float(x[:m] @ x[j : j + m]) for j in range(k)])
    qt = qt_first.copy()
    for i in range(k):
        if i > 0:
            # incremental update right-shift
            qt[1:] = qt[:-1] - x[: k - 1] * x[i - 1] + x[m : m + k - 1] * x[i + m - 1]
            qt[0] = qt_first[i]
        d2 = 2.0 * m * (1.0 - (qt - m * mu[i] * mu) / (m * sig[i] * sig))
        d2 = np.maximum(d2, 0.0)
        lo, hi = max(0, i - excl), min(k, i + excl + 1)
        d2[lo:hi] = np.inf
        j = int(np.argmin(d2))
        if np.isfinite(d2[j]) and d2[j] < prof[i] ** 2:
            prof[i] = np.sqrt(d2[j])
            pidx[i] = j
    return prof, pidx


def matrix_profile(
    df: DataFrame,
    value_col: str,
    window_size: int,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> DataFrame:
    """Long-form matrix profile per series: (keys, seg_id, profile, nn_idx)."""
    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        prof, pidx = matrix_profile_series(
            pdf[value_col].to_numpy(float), window_size
        )
        out = pd.DataFrame(
            {"seg_id": np.arange(len(prof)), "profile": prof,
             "nn_idx": pidx.astype(np.int64)}
        )
        for kcol in keys:
            out[kcol] = pdf[kcol].iloc[0]
        return out[[*keys, "seg_id", "profile", "nn_idx"]]

    key_fields = "".join(f"`{k}` string, " for k in keys)
    schema = f"{key_fields}seg_id long, profile double, nn_idx long"
    return grouped_apply(df, keys, fn, schema)
