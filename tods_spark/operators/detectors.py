"""Statistical detector cores (SURVEY.md §2.10) re-derived in numpy and run
per series as grouped-map Arrow UDFs — the engine-native versions of the
reference's sklearn/pyod-backed cores (neither library is assumed):

* ``autoreg_od`` — core.AutoRegOD (tods/detection_algorithm/core/AutoRegOD.py:59-103):
  sliding windows (w, step) via the SubsequenceSegmentation kernel, drop the
  last window, target y_i = X[i·step + w]; ordinary least squares WITH
  intercept (numpy lstsq == sklearn LinearRegression); score = |y − ŷ|.
  Per-dim multivariate variant (core.MultiAutoRegOD) = apply per column.

* ``pca_od`` — core.PCA → pyod.models.pca semantics: standardize flattened
  windows, project onto principal components, score = sum over selected
  components of squared projection / explained variance (weighted distance
  to the principal subspace — pyod's default weighted=True).

* ``kdiscord_od`` — core.KDiscord: kNN distance between flattened windows
  (pyod KNN method='largest', k-th nearest neighbor distance).

Each returns one row per window: (keys, seg_id, left_ind, right_ind, score)
plus thresholded label via the CollectiveBase percentile rule
(CollectiveBase.py:329-345). Scores are computed inside one Arrow batch per
series; group size is bounded by the series key (doc/day at engine scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tods_spark.operators._util import grouped_apply


def _windows(x: np.ndarray, w: int, step: int) -> tuple[np.ndarray, np.ndarray]:
    """Flattened sliding windows (valid ones only) + left indices —
    the non-padded prefix of the SubsequenceSegmentation kernel."""
    n = len(x)
    lefts = np.arange(0, n - w + 1, step)
    mat = np.stack([x[i : i + w] for i in lefts]) if len(lefts) else np.empty((0, w))
    return mat, lefts


def autoreg_scores(x: np.ndarray, window_size: int, step: int = 1) -> tuple:
    mat, lefts = _windows(x, window_size, step)
    # reference: drop last window; y_i = x[i*step + w]
    usable = [i for i in range(len(lefts)) if lefts[i] + window_size < len(x)]
    mat, lefts = mat[usable], lefts[usable]
    y = x[lefts + window_size]
    A = np.hstack([mat, np.ones((len(mat), 1))])  # intercept column
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    scores = np.abs(y - A @ coef)
    return scores, lefts


def pca_scores(x: np.ndarray, window_size: int, step: int = 1,
               n_components: int | None = None) -> tuple:
    mat, lefts = _windows(x, window_size, step)
    if len(mat) < 2:
        return np.zeros(len(mat)), lefts
    mu, sd = mat.mean(0), mat.std(0)
    sd[sd == 0] = 1.0
    Z = (mat - mu) / sd
    _, s, vt = np.linalg.svd(Z, full_matrices=False)
    var = (s**2) / max(len(mat) - 1, 1)
    k = n_components or len(var)
    var = np.maximum(var[:k], 1e-12)
    proj = Z @ vt[:k].T
    # pyod PCA (weighted): sum of squared projections scaled by eigenvalue
    scores = ((proj**2) / var).sum(axis=1)
    return scores, lefts


def knn_scores(x: np.ndarray, window_size: int, step: int = 1,
               n_neighbors: int = 5) -> tuple:
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 1:
        return np.zeros(m), lefts
    # pairwise distances between windows (bounded per-series group size)
    sq = (mat**2).sum(1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2 * (mat @ mat.T), 0)
    np.fill_diagonal(d2, np.inf)
    k = min(n_neighbors, m - 1)
    kth = np.partition(np.sqrt(d2), k - 1, axis=1)[:, k - 1]
    return kth, lefts


def lof_scores(x: np.ndarray, window_size: int, step: int = 1,
               n_neighbors: int = 5) -> tuple:
    """Local Outlier Factor over flattened windows — PyodLOF.py:212 →
    pyod.models.lof → sklearn LocalOutlierFactor (score = LOF value, the
    positive quantity sklearn negates into negative_outlier_factor_):

      k-dist(p)   = distance to the k-th nearest neighbor
      N_k(p)      = all points within k-dist(p) (ties included)
      reach(p,o)  = max(k-dist(o), d(p,o))
      lrd(p)      = |N_k(p)| / Σ_{o∈N_k(p)} reach(p,o)
      LOF(p)      = mean_{o∈N_k(p)} lrd(o) / lrd(p)
    """
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 1:
        return np.ones(m), lefts
    sq = (mat**2).sum(1)
    d = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * (mat @ mat.T), 0))
    np.fill_diagonal(d, np.inf)
    k = min(n_neighbors, m - 1)
    kdist = np.partition(d, k - 1, axis=1)[:, k - 1]
    # neighborhood masks (ties at the k-distance included, per the paper)
    nmask = d <= kdist[:, None] + 1e-12
    reach = np.maximum(kdist[None, :], d)  # reach(p, o) row=p col=o
    n_nb = nmask.sum(1)
    lrd = n_nb / np.where(nmask, reach, 0).sum(1)
    lof = (np.where(nmask, lrd[None, :], 0).sum(1) / n_nb) / lrd
    return lof, lefts


_CORES = {"autoreg": autoreg_scores, "pca": pca_scores, "knn": knn_scores,
          "lof": lof_scores}


def detect(
    df: DataFrame,
    value_col: str,
    method: str = "autoreg",
    window_size: int = 10,
    step: int = 1,
    contamination: float = 0.1,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    **params,
) -> DataFrame:
    """Per-series windowed anomaly detection. Output: one row per window
    with score + percentile-thresholded label (CollectiveBase.py:340-345)."""
    kern = _CORES[method]
    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(float)
        scores, lefts = kern(x, window_size, step, **params)
        if len(scores):
            th = np.percentile(scores, 100 * (1 - contamination))
            labels = (scores > th).astype(int)
        else:
            th, labels = 0.0, np.array([], int)
        out = pd.DataFrame(
            {
                "seg_id": np.arange(len(scores)),
                "left_ind": lefts,
                "right_ind": np.minimum(lefts + window_size, len(x)),
                "score": scores,
                "threshold": th,
                "label": labels,
            }
        )
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, "seg_id", "left_ind", "right_ind", "score",
                    "threshold", "label"]]

    key_fields = "".join(f"`{k}` string, " for k in keys)
    schema = (f"{key_fields}seg_id long, left_ind long, right_ind long, "
              "score double, threshold double, label int")
    return grouped_apply(df, keys, fn, schema)
