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

* ``lof_scores`` — PyodLOF.py:212: Breunig local-outlier-factor over
  flattened windows (k-dist / reachability / lrd ratio, ties included).

* ``iforest_scores`` — PyodIsolationForest.py:192: seeded isolation forest
  over flattened windows, s(p) = 2^(−E[h(p)]/c(ψ)), vectorized level-order
  tree traversal.

Each returns one row per window: (keys, seg_id, left_ind, right_ind, score)
plus thresholded label via the CollectiveBase percentile rule
(CollectiveBase.py:329-345). Scores are computed inside one Arrow batch per
series; group size is bounded by the series key (doc/day at engine scale).

SCALE NOTE: the kNN-family cores (knn/lof/abod) are O(m²) memory/compute in
the number of windows per GROUP — identical to their pyod/sklearn
counterparts. The engine contract is that the grouping key bounds m (a
source-day at 1m resolution is 1440 windows); feeding one unbounded series
through them is the same mistake as calling sklearn on it.
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

# kernels whose per-group cost/memory is quadratic in the window count m
# (pairwise-distance matrices) — these REQUIRE a time-bounded grouping key
_QUADRATIC = {"knn", "lof", "abod"}

# default hard ceiling for quadratic kernels: 20k windows ≈ 3.2 GB of f64
# pairwise distances per Arrow group — beyond that the group must be split,
# not silently OOMed (a source-day at 1m resolution is 1,440 windows)
MAX_QUADRATIC_GROUP = 20_000


def detect(
    df: DataFrame,
    value_col: str,
    method: str = "autoreg",
    window_size: int = 10,
    step: int = 1,
    contamination: float = 0.1,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    max_group_size: int | None = None,
    thresholding: str = "percentile",
    **params,
) -> DataFrame:
    """Per-series windowed anomaly detection. Output: one row per window
    with score + percentile-thresholded label (CollectiveBase.py:340-345).
    ``thresholding='telemanom'`` swaps the percentile rule for Hundman et
    al.'s nonparametric dynamic error threshold (telemanom_threshold).

    For the quadratic kernels (knn/lof/abod) a group larger than
    ``max_group_size`` (default MAX_QUADRATIC_GROUP) raises instead of
    building an m×m distance matrix: re-key the input by a time-bounded
    key such as (series, day)."""
    kern = _CORES[method]
    keys = keys or []
    guard = max_group_size if max_group_size is not None else (
        MAX_QUADRATIC_GROUP if method in _QUADRATIC else None
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if guard is not None and len(pdf) > guard:
            gk = {k: pdf[k].iloc[0] for k in keys}
            raise ValueError(
                f"detect(method={method!r}): group {gk} has {len(pdf)} rows "
                f"> max_group_size={guard}; this kernel is O(m²) per group — "
                "re-key by a time-bounded key, e.g. (series, day)"
            )
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(float)
        scores, lefts = kern(x, window_size, step, **params)
        if len(scores):
            if thresholding == "telemanom":
                th = telemanom_threshold(scores)
            else:
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


def _lstm_forward(X: np.ndarray, Wx, Wh, b, Wo, bo):
    """Vectorized single-layer LSTM over a batch of windows (m, w) of
    scalars; returns predictions (m,) from the last hidden state and the
    per-step cell/hidden states for BPTT."""
    m, w = X.shape
    h = Wx.shape[1] // 4
    H = np.zeros((m, h))
    C = np.zeros((m, h))
    cache = []
    for t in range(w):
        z = X[:, t : t + 1] @ Wx + H @ Wh + b  # (m, 4h)
        i = 1.0 / (1.0 + np.exp(-z[:, :h]))
        f = 1.0 / (1.0 + np.exp(-z[:, h : 2 * h]))
        o = 1.0 / (1.0 + np.exp(-z[:, 2 * h : 3 * h]))
        g = np.tanh(z[:, 3 * h :])
        C_new = f * C + i * g
        H_new = o * np.tanh(C_new)
        cache.append((H, C, i, f, o, g, C_new))
        H, C = H_new, C_new
    pred = (H @ Wo + bo).ravel()
    return pred, H, cache


def lstmod_scores(x: np.ndarray, window_size: int, step: int = 1,
                  hidden: int = 8, epochs: int = 60, lr: float = 0.02,
                  seed: int = 0) -> tuple:
    """LSTMOD core re-derived in numpy (core/LSTMOD.py:17 — LSTM
    forecaster residual scores; the reference trains a keras LSTM, this
    engine trains a seeded single-layer LSTM with full-batch Adam and
    truncated BPTT written out by hand — same semantics: score =
    |next value − forecast|, which UODBase thresholds). Deterministic:
    seeded Xavier init, full-batch updates, no dropout. Series values
    are standardized for training; scores are on the original scale."""
    mat, lefts = _windows(x, window_size, step)
    usable = [i for i in range(len(lefts)) if lefts[i] + window_size < len(x)]
    mat, lefts = mat[usable], lefts[usable]
    m = len(mat)
    if m <= 2:
        return np.zeros(m), lefts
    y = x[lefts + window_size]
    mu, sd = x.mean(), x.std() or 1.0
    Xn, yn = (mat - mu) / sd, (y - mu) / sd
    rng = np.random.default_rng(seed)
    h = hidden
    sc_in = 1.0 / np.sqrt(1 + h)
    Wx = rng.normal(0, sc_in, (1, 4 * h))
    Wh = rng.normal(0, sc_in, (h, 4 * h))
    b = np.zeros(4 * h)
    b[h : 2 * h] = 1.0  # forget-gate bias 1 (standard init)
    Wo = rng.normal(0, 1.0 / np.sqrt(h), (h, 1))
    bo = np.zeros(1)
    params = [Wx, Wh, b, Wo, bo]
    adam_m = [np.zeros_like(p) for p in params]
    adam_v = [np.zeros_like(p) for p in params]
    b1, b2, eps = 0.9, 0.999, 1e-8
    for ep in range(1, epochs + 1):
        pred, H, cache = _lstm_forward(Xn, Wx, Wh, b, Wo, bo)
        err = (pred - yn)[:, None] / m  # d(MSE/2)/dpred
        gWo = H.T @ err
        gbo = err.sum(0)
        dH = err @ Wo.T
        dC = np.zeros_like(dH)
        gWx = np.zeros_like(Wx)
        gWh = np.zeros_like(Wh)
        gb = np.zeros_like(b)
        for t in reversed(range(window_size)):
            Hp, Cp, i, f, o, g, Cn = cache[t]
            tC = np.tanh(Cn)
            do = dH * tC
            dCn = dC + dH * o * (1 - tC * tC)
            di, df, dg = dCn * g, dCn * Cp, dCn * i
            dz = np.concatenate(
                [di * i * (1 - i), df * f * (1 - f),
                 do * o * (1 - o), dg * (1 - g * g)], axis=1)
            gWx += Xn[:, t : t + 1].T @ dz
            gWh += Hp.T @ dz
            gb += dz.sum(0)
            dH = dz @ Wh.T
            dC = dCn * f
        grads = [gWx, gWh, gb, gWo, gbo]
        for p, gr, mm, vv in zip(params, grads, adam_m, adam_v):
            mm += (1 - b1) * (gr - mm)
            vv += (1 - b2) * (gr * gr - vv)
            mhat = mm / (1 - b1**ep)
            vhat = vv / (1 - b2**ep)
            p -= lr * mhat / (np.sqrt(vhat) + eps)
    pred, _, _ = _lstm_forward(Xn, Wx, Wh, b, Wo, bo)
    return np.abs(yn - pred) * sd, lefts


_CORES["lstmod"] = lstmod_scores


def deeplog_scores(keys_seq: np.ndarray, window_size: int = 10,
                   top_k: int = 2, hidden: int = 12, epochs: int = 80,
                   lr: float = 0.05, seed: int = 0) -> tuple:
    """DeepLog core re-derived in numpy (DeepLog.py:196 — Du et al. 2017,
    "DeepLog: anomaly detection and diagnosis from system logs through
    deep learning"): an LSTM learns to predict the NEXT log key from the
    previous `window_size` keys; a step is anomalous when the actual key
    is not among the model's top-k predictions. The keras LSTM is
    replaced by a seeded single-layer numpy LSTM (one-hot inputs, softmax
    head, cross-entropy, full-batch Adam BPTT — deterministic).

    Input: integer-encoded key sequence. Returns (scores, lefts) where
    score = 1 − P(actual key) and the caller thresholds; a hard DeepLog
    label (outside top-k) is recoverable as score > k-th largest
    probability — the registered query uses the probability score with
    the standard percentile rule for frame consistency."""
    ks = np.asarray(keys_seq, int)
    n = len(ks)
    V = int(ks.max()) + 1 if n else 1
    lefts = np.arange(0, n - window_size, 1)
    m = len(lefts)
    if m <= 2 or V < 2:
        return np.zeros(max(m, 0)), lefts
    X = np.stack([ks[i : i + window_size] for i in lefts])  # (m, w) ints
    y = ks[lefts + window_size]
    rng = np.random.default_rng(seed)
    h = hidden
    sc_in = 1.0 / np.sqrt(V + h)
    Wx = rng.normal(0, sc_in, (V, 4 * h))
    Wh = rng.normal(0, sc_in, (h, 4 * h))
    b = np.zeros(4 * h)
    b[h : 2 * h] = 1.0
    Wo = rng.normal(0, 1.0 / np.sqrt(h), (h, V))
    bo = np.zeros(V)
    params = [Wx, Wh, b, Wo, bo]
    adam_m = [np.zeros_like(p) for p in params]
    adam_v = [np.zeros_like(p) for p in params]
    b1, b2, eps = 0.9, 0.999, 1e-8
    onehot = np.eye(V)
    for ep in range(1, epochs + 1):
        H = np.zeros((m, h))
        C = np.zeros((m, h))
        cache = []
        for t in range(window_size):
            xt = onehot[X[:, t]]  # (m, V)
            z = xt @ Wx + H @ Wh + b
            i = 1.0 / (1.0 + np.exp(-z[:, :h]))
            f = 1.0 / (1.0 + np.exp(-z[:, h : 2 * h]))
            o = 1.0 / (1.0 + np.exp(-z[:, 2 * h : 3 * h]))
            g = np.tanh(z[:, 3 * h :])
            C_new = f * C + i * g
            H_new = o * np.tanh(C_new)
            cache.append((xt, H, C, i, f, o, g, C_new))
            H, C = H_new, C_new
        logits = H @ Wo + bo
        logits -= logits.max(axis=1, keepdims=True)
        P = np.exp(logits)
        P /= P.sum(axis=1, keepdims=True)
        dlogits = (P - onehot[y]) / m
        gWo = H.T @ dlogits
        gbo = dlogits.sum(0)
        dH = dlogits @ Wo.T
        dC = np.zeros_like(dH)
        gWx = np.zeros_like(Wx)
        gWh = np.zeros_like(Wh)
        gb = np.zeros_like(b)
        for t in reversed(range(window_size)):
            xt, Hp, Cp, i, f, o, g, Cn = cache[t]
            tC = np.tanh(Cn)
            do = dH * tC
            dCn = dC + dH * o * (1 - tC * tC)
            di, df, dg = dCn * g, dCn * Cp, dCn * i
            dz = np.concatenate(
                [di * i * (1 - i), df * f * (1 - f),
                 do * o * (1 - o), dg * (1 - g * g)], axis=1)
            gWx += xt.T @ dz
            gWh += Hp.T @ dz
            gb += dz.sum(0)
            dH = dz @ Wh.T
            dC = dCn * f
        grads = [gWx, gWh, gb, gWo, gbo]
        for p, gr, mm, vv in zip(params, grads, adam_m, adam_v):
            mm += (1 - b1) * (gr - mm)
            vv += (1 - b2) * (gr * gr - vv)
            p -= lr * (mm / (1 - b1**ep)) / (np.sqrt(vv / (1 - b2**ep)) + eps)
    # final forward for scores
    H = np.zeros((m, h))
    C = np.zeros((m, h))
    for t in range(window_size):
        xt = onehot[X[:, t]]
        z = xt @ Wx + H @ Wh + b
        i = 1.0 / (1.0 + np.exp(-z[:, :h]))
        f = 1.0 / (1.0 + np.exp(-z[:, h : 2 * h]))
        o = 1.0 / (1.0 + np.exp(-z[:, 2 * h : 3 * h]))
        g = np.tanh(z[:, 3 * h :])
        C = f * C + i * g
        H = o * np.tanh(C)
    logits = H @ Wo + bo
    logits -= logits.max(axis=1, keepdims=True)
    P = np.exp(logits)
    P /= P.sum(axis=1, keepdims=True)
    return 1.0 - P[np.arange(m), y], lefts


def telemanom_threshold(errors: np.ndarray,
                        z_range: np.ndarray | None = None) -> float:
    """Telemanom's nonparametric dynamic error threshold (Hundman et al.
    2018, KDD — "Detecting spacecraft anomalies using LSTMs and
    nonparametric dynamic thresholding", eq. 1-2): choose ε = μ + z·σ
    from a candidate z grid maximizing
        (Δμ/μ + Δσ/σ) / (|e_a| + |E_seq|²)
    where Δμ/Δσ are the drops in mean/std after removing errors above ε,
    e_a the anomalous errors and E_seq their contiguous runs. Pure
    closed-form selection over a finite grid — deterministic."""
    e = np.asarray(errors, float)
    mu, sd = e.mean(), e.std()
    if sd == 0:
        return float(mu)
    if z_range is None:
        z_range = np.arange(2.0, 10.5, 0.5)
    best_eps, best_score = mu + z_range[0] * sd, -np.inf
    for z in z_range:
        eps = mu + z * sd
        below = e[e < eps]
        above_idx = np.where(e >= eps)[0]
        if len(below) == 0:
            continue
        dmu = (mu - below.mean()) / mu if mu != 0 else 0.0
        dsd = (sd - below.std()) / sd
        n_above = len(above_idx)
        if n_above == 0:
            continue
        runs = 1 + int((np.diff(above_idx) > 1).sum())
        score = (dmu + dsd) / (n_above + runs**2)
        if score > best_score:
            best_score, best_eps = score, eps
    return float(best_eps)


def _c_factor(n: int) -> float:
    """Average unsuccessful-search path length c(n) in a BST — the iForest
    normalizer (Liu, Ting & Zhou 2008, eq. 1)."""
    if n <= 1:
        return 0.0
    h = np.log(n - 1) + 0.5772156649015329  # harmonic via Euler-Mascheroni
    return 2.0 * h - 2.0 * (n - 1) / n


def _build_itree(X: np.ndarray, rng, depth_limit: int):
    """One isolation tree as flat arrays (feature, split, left, right,
    leaf_size, leaf_depth); array-based so scoring can traverse all points
    level-by-level with numpy instead of per-point recursion."""
    feat, split, left, right, size, depth = [], [], [], [], [], []

    def rec(idx: np.ndarray, d: int) -> int:
        node = len(feat)
        feat.append(-1); split.append(0.0); left.append(-1); right.append(-1)
        size.append(len(idx)); depth.append(d)
        if d >= depth_limit or len(idx) <= 1:
            return node
        sub = X[idx]
        lo, hi = sub.min(axis=0), sub.max(axis=0)
        usable = np.where(hi > lo)[0]
        if not len(usable):
            return node
        f = int(rng.choice(usable))
        s = float(rng.uniform(lo[f], hi[f]))
        mask = sub[:, f] < s
        feat[node], split[node] = f, s
        left[node] = rec(idx[mask], d + 1)
        right[node] = rec(idx[~mask], d + 1)
        return node

    rec(np.arange(len(X)), 0)
    return (np.array(feat), np.array(split), np.array(left),
            np.array(right), np.array(size), np.array(depth))


def iforest_scores(x: np.ndarray, window_size: int, step: int = 1,
                   n_trees: int = 100, subsample: int = 256,
                   seed: int = 0) -> tuple:
    """Isolation Forest over flattened windows — PyodIsolationForest.py:192
    → sklearn IsolationForest semantics: anomaly score
    s(p) = 2^(−E[h(p)] / c(ψ)), h = path depth + c(leaf_size). Deterministic
    seeded trees (the engine contract; sklearn's forest depends on its own
    RNG stream). Scoring traverses each tree level-by-level, vectorized
    over all windows."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 1:
        return np.zeros(m), lefts
    rng = np.random.default_rng(seed)
    psi = min(subsample, m)
    depth_limit = int(np.ceil(np.log2(max(psi, 2))))
    paths = np.zeros(m)
    for _ in range(n_trees):
        samp = rng.choice(m, size=psi, replace=False)
        feat, split, left, right, size, depth = _build_itree(
            mat[samp], rng, depth_limit
        )
        node = np.zeros(m, dtype=np.int64)
        active = np.ones(m, dtype=bool)
        while active.any():
            cur = node[active]
            internal = feat[cur] >= 0
            idx = np.where(active)[0]
            done = idx[~internal]
            active[done] = False
            go = idx[internal]
            if not len(go):
                break
            cn = node[go]
            goes_left = mat[go, feat[cn]] < split[cn]
            node[go] = np.where(goes_left, left[cn], right[cn])
        leaf = node
        paths += depth[leaf] + np.vectorize(_c_factor)(size[leaf])
    avg_h = paths / n_trees
    scores = np.exp2(-avg_h / max(_c_factor(psi), 1e-12))
    return scores, lefts


_CORES["iforest"] = iforest_scores


def abod_scores(x: np.ndarray, window_size: int, step: int = 1,
                n_neighbors: int = 8) -> tuple:
    """FastABOD core (PyodABOD.py → pyod.models.abod, method='fast'):
    angle-based outlier factor over flattened windows. For each point p,
    ABOF(p) = variance over neighbor pairs (a, b) of the weighted angle
      <(a−p),(b−p)> / (|a−p|²·|b−p|²)
    restricted to the k nearest neighbors; pyod returns score = −ABOF
    (outliers have SMALL angle variance), so higher = more anomalous,
    matching the engine's score contract. O(m·k²) — bounded per series."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 2:
        return np.zeros(m), lefts
    sq = (mat**2).sum(1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2 * (mat @ mat.T), 0)
    np.fill_diagonal(d2, np.inf)
    k = min(n_neighbors, m - 1)
    nbrs = np.argpartition(d2, k - 1, axis=1)[:, :k]
    scores = np.empty(m)
    for p in range(m):
        V = mat[nbrs[p]] - mat[p]          # k × w difference vectors
        nv = (V**2).sum(1)                  # |v|²
        G = V @ V.T                         # pairwise dots
        W = G / (nv[:, None] * nv[None, :])  # weighted angles
        iu = np.triu_indices(k, 1)
        scores[p] = -float(np.var(W[iu]))
    return scores, lefts


def loda_projections(w: int, n_projections: int = 20,
                     seed: int = 0) -> list[list[tuple[int, float]]]:
    """The seeded sparse projection set LODA uses, as (index, weight)
    pairs sorted by index — exposed so the DuckDB oracle twin can inline
    the exact same literals (queries._loda_sql)."""
    rng = np.random.default_rng(seed)
    nz = max(1, int(np.sqrt(w)))  # LODA sparsity: ~sqrt(d) non-zeros
    projs = []
    for _ in range(n_projections):
        idx = rng.choice(w, size=nz, replace=False)
        vals = rng.standard_normal(nz)
        projs.append(sorted(zip(idx.tolist(), vals.tolist())))
    return projs


def loda_scores(x: np.ndarray, window_size: int, step: int = 1,
                n_projections: int = 20, n_bins: int = 10,
                seed: int = 0) -> tuple:
    """LODA core (pyod.models.loda — Pevný 2016, "Loda: Lightweight on-line
    detector of anomalies"): random sparse projections, equal-width
    histogram per projection, score = −mean log density of the sample's
    bin. Seeded projections = deterministic engine contract.

    The projection is accumulated term-by-term in index order (not BLAS
    `mat @ proj`) so z is bitwise-reproducible by the left-associative
    sum the SQL twin evaluates — same values, defined operation order."""
    mat, lefts = _windows(x, window_size, step)
    m, w = mat.shape if len(mat) else (0, window_size)
    if m <= 1:
        return np.zeros(m), lefts
    logdens = np.zeros(m)
    for proj in loda_projections(w, n_projections, seed):
        z = np.zeros(m)
        for j, wt in proj:
            z = z + wt * mat[:, j]
        lo, hi = z.min(), z.max()
        width = (hi - lo) / n_bins or 1.0
        b = np.minimum(((z - lo) / width).astype(int), n_bins - 1)
        counts = np.bincount(b, minlength=n_bins)
        dens = counts[b] / (m * width)
        logdens += np.log(dens + 1e-12)
    return -logdens / n_projections, lefts


_CORES["abod"] = abod_scores
_CORES["loda"] = loda_scores


def ae_scores(x: np.ndarray, window_size: int, step: int = 1,
              n_components: int = 2) -> tuple:
    """Linear-autoencoder score — the engine answer to the reference's
    DEFAULT detector `pyod_ae` (tods/utils.py:46-53 → PyodAE.py:181,
    hidden_neurons [4,2,4]): a linear AE with bottleneck k attains its
    optimum at the PCA top-k subspace, so the reconstruction error of the
    trained linear AE equals the residual from the top-k principal
    components. Matching pyod's AutoEncoder scoring pipeline: standardize
    windows, reconstruct from the k-dim code, score = Euclidean distance
    between input and reconstruction (pyod pairwise_distances_no_broadcast).
    k defaults to 2 = the reference default's bottleneck width."""
    mat, lefts = _windows(x, window_size, step)
    if len(mat) < 2:
        return np.zeros(len(mat)), lefts
    mu, sd = mat.mean(0), mat.std(0)
    sd[sd == 0] = 1.0
    Z = (mat - mu) / sd
    _, _, vt = np.linalg.svd(Z, full_matrices=False)
    k = min(n_components, vt.shape[0])
    resid = Z - (Z @ vt[:k].T) @ vt[:k]
    return np.sqrt((resid**2).sum(axis=1)), lefts


def _gbdt_tree_fit(X: np.ndarray, grad: np.ndarray, hess: np.ndarray,
                   depth: int, lam: float, n_thresholds: int = 32):
    """One regression tree on (grad, hess) — exact greedy xgboost-style
    splits (gain = ½[G_L²/(H_L+λ) + G_R²/(H_R+λ) − G²/(H+λ)]), candidate
    thresholds at up to `n_thresholds` per-feature quantiles.
    Deterministic: no subsampling, ties resolved by (feature, threshold)
    order. Returns a nested dict tree."""
    m, d = X.shape

    def build(idx: np.ndarray, lvl: int):
        G, H = grad[idx].sum(), hess[idx].sum()
        leaf = {"w": -G / (H + lam)}
        if lvl >= depth or len(idx) < 2:
            return leaf
        best = (0.0, None, None)
        for j in range(d):
            col = X[idx, j]
            qs = np.unique(np.quantile(col, np.linspace(0, 1, n_thresholds)))
            for t in qs[:-1]:
                left = col <= t
                if not left.any() or left.all():
                    continue
                GL, HL = grad[idx[left]].sum(), hess[idx[left]].sum()
                GR, HR = G - GL, H - HL
                gain = 0.5 * (GL * GL / (HL + lam) + GR * GR / (HR + lam)
                              - G * G / (H + lam))
                if gain > best[0] + 1e-12:
                    best = (gain, j, float(t))
        if best[1] is None:
            return leaf
        _, j, t = best
        left = X[idx, j] <= t
        return {"j": j, "t": t,
                "l": build(idx[left], lvl + 1),
                "r": build(idx[~left], lvl + 1)}

    return build(np.arange(m), 0)


def _gbdt_tree_predict(tree: dict, X: np.ndarray) -> np.ndarray:
    out = np.empty(len(X))
    stack = [(tree, np.arange(len(X)))]
    while stack:
        node, idx = stack.pop()
        if "w" in node:
            out[idx] = node["w"]
        else:
            left = X[idx, node["j"]] <= node["t"]
            stack.append((node["l"], idx[left]))
            stack.append((node["r"], idx[~left]))
    return out


def gbdt_fit_predict(X: np.ndarray, y: np.ndarray, n_rounds: int = 50,
                     depth: int = 3, lr: float = 0.3, lam: float = 1.0
                     ) -> np.ndarray:
    """Deterministic gradient-boosted trees with logistic loss — the
    re-derived stand-in for xgboost's XGBClassifier (exact greedy splits,
    second-order gain, L2 leaf regularization; no subsampling / column
    sampling, so the fit is reproducible bit-for-bit). Returns in-sample
    scores (log-odds margin)."""
    margin = np.zeros(len(y))
    for _ in range(n_rounds):
        p = 1.0 / (1.0 + np.exp(-margin))
        grad = p - y
        hess = p * (1 - p)
        tree = _gbdt_tree_fit(X, grad, hess, depth, lam)
        margin = margin + lr * _gbdt_tree_predict(tree, X)
    return margin


def xgbod_scores(x: np.ndarray, labels: np.ndarray, window_size: int,
                 step: int = 1, n_rounds: int = 50) -> tuple:
    """XGBOD core (PyodXGBOD.py:323 — Zhao & Hryniewicki 2018, "XGBOD:
    improving supervised outlier detection with unsupervised
    representation learning"): augment the raw windows with transformed
    outlier scores (TOS) from unsupervised base detectors, then fit a
    supervised boosted-tree classifier on the labels; score = the
    classifier margin. Base detectors here: knn (k-th NN distance), hbos
    via loda single-bin analogue — we use knn + loda + autoreg residual
    scores, the quadratic-free trio of this module. xgboost's exact
    implementation is replaced by the deterministic `gbdt_fit_predict`
    (documented deviation — same loss, same split gain, no stochastic
    subsampling). A window's label = max of its member labels."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 2:
        return np.zeros(m), lefts
    # per-window supervision: anomalous if any member point is labeled
    wl = np.array([labels[i : i + window_size].max() for i in lefts],
                  dtype=float)
    # TOS features from unsupervised cores (align autoreg's shorter output)
    knn_s, _ = knn_scores(x, window_size, step)
    loda_s, _ = loda_scores(x, window_size, step)
    ar_s, ar_lefts = autoreg_scores(x, window_size, step)
    ar_full = np.zeros(m)
    ar_full[np.searchsorted(lefts, ar_lefts)] = ar_s
    F = np.column_stack([mat, knn_s, loda_s, ar_full])
    return gbdt_fit_predict(F, wl, n_rounds=n_rounds), lefts


def _project_capped_simplex(v: np.ndarray, cap: float) -> np.ndarray:
    """Euclidean projection of v onto {0 <= a <= cap, sum(a) = 1} via
    bisection on the shift τ in a_i = clip(v_i − τ, 0, cap) —
    deterministic, no RNG."""
    lo = v.min() - cap - 1.0
    hi = v.max() + 1.0
    for _ in range(100):
        tau = 0.5 * (lo + hi)
        s = np.clip(v - tau, 0.0, cap).sum()
        if s > 1.0:
            lo = tau
        else:
            hi = tau
    return np.clip(v - 0.5 * (lo + hi), 0.0, cap)


def ocsvm_scores(x: np.ndarray, window_size: int, step: int = 1,
                 nu: float = 0.5, n_iter: int = 300) -> tuple:
    """One-class SVM core (PyodOCSVM.py:197 → pyod.models.ocsvm →
    sklearn OneClassSVM, RBF kernel, Schölkopf et al. 2001): solve the
    dual  min ½ αᵀQα  s.t. 0 ≤ α ≤ 1/(νm), Σα = 1  with deterministic
    PROJECTED GRADIENT descent (libsvm's SMO working-set heuristics are
    not reproduced — documented deviation; at convergence both reach the
    same unique strictly-convex optimum for PD kernels):

      Q_ij    = exp(−γ·‖x_i − x_j‖²),  γ = 1/(w·Var(X)) (sklearn 'scale')
      step    = 1/L with L = the Gershgorin row-sum bound on λmax(Q)
      ρ       = mean_{0<α_i<cap} (Qα)_i   (margin support vectors)
      score_i = ρ − (Qα)_i               (pyod convention: −decision)

    O(m²) kernel matrix — quadratic kernel, bounded-group contract
    applies."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 2:
        return np.zeros(m), lefts
    var = mat.var()
    gamma = 1.0 / (mat.shape[1] * var) if var > 0 else 1.0
    sq = (mat**2).sum(1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2 * (mat @ mat.T), 0)
    Q = np.exp(-gamma * d2)
    cap = 1.0 / (nu * m)
    if cap * m < 1.0:  # infeasible ν (can't happen for ν ≤ 1)
        cap = 1.0 / m
    alpha = np.full(m, 1.0 / m)
    alpha = _project_capped_simplex(alpha, cap)
    L = float(np.abs(Q).sum(axis=1).max())  # Gershgorin bound on λmax
    lr = 1.0 / L
    for _ in range(n_iter):
        grad = Q @ alpha
        alpha = _project_capped_simplex(alpha - lr * grad, cap)
    f = Q @ alpha
    margin = (alpha > 1e-10) & (alpha < cap - 1e-10)
    rho = float(f[margin].mean()) if margin.any() else float(f.mean())
    return rho - f, lefts


_CORES["ocsvm"] = ocsvm_scores
_QUADRATIC.add("ocsvm")


def _kmeans(X: np.ndarray, k: int, seed: int = 0, iters: int = 50):
    """Lloyd k-means with STRIDED deterministic init (centers = points at
    indices ⌊c·m/k⌋) — the engine contract; sklearn's n_init=10 k-means++
    stream is not reproduced (documented deviation), and a data-length-
    independent init formula is what lets the DuckDB oracle twin
    (queries._cblof_sql) replay the identical Lloyd iterations in SQL.
    `seed` is retained for API compatibility but unused. Empty clusters
    are reseeded to the point farthest from its center (never fires on
    the registered test data — the twin omits this branch and documents
    it)."""
    m = len(X)
    centers = X[[(c * m) // k for c in range(k)]].astype(float)
    labels = np.full(len(X), -1)
    for _ in range(iters):
        d2 = ((X[:, None, :] - centers[None]) ** 2).sum(axis=2)
        new = d2.argmin(axis=1)
        for c in range(k):
            if not (new == c).any():
                new[d2[np.arange(len(X)), new].argmax()] = c
        if (new == labels).all():
            break
        labels = new
        for c in range(k):
            centers[c] = X[labels == c].mean(axis=0)
    return labels, centers


def cblof_scores(x: np.ndarray, window_size: int, step: int = 1,
                 n_clusters: int = 8, alpha: float = 0.9, beta: float = 5.0,
                 seed: int = 0) -> tuple:
    """CBLOF core (PyodCBLOF.py:199 → pyod.models.cblof, use_weights=False):
    k-means over flattened windows; clusters sorted by size; the large/small
    boundary is the first index where the size cumsum ≥ αm AND/OR the
    size ratio ≥ β (pyod's intersect-then-fallback rule); score = distance
    to own centroid for large-cluster points, distance to the NEAREST
    large-cluster centroid for small-cluster points."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 1:
        return np.zeros(m), lefts
    k = min(n_clusters, m)
    labels, centers = _kmeans(mat, k, seed)
    sizes = np.bincount(labels, minlength=k)
    order = np.argsort(-sizes, kind="stable")
    alpha_list, beta_list = [], []
    for i in range(1, k):
        if sizes[order[:i]].sum() >= m * alpha:
            alpha_list.append(i)
        if sizes[order[i - 1]] >= beta * max(sizes[order[i]], 1):
            beta_list.append(i)
    inter = [i for i in alpha_list if i in beta_list]
    thr = (inter or alpha_list or beta_list or [k])[0]
    large = order[:thr]
    d_large = np.sqrt(
        np.maximum(
            ((mat[:, None, :] - centers[large][None]) ** 2).sum(axis=2), 0
        )
    )
    own = np.sqrt(((mat - centers[labels]) ** 2).sum(axis=1))
    is_large = np.isin(labels, large)
    return np.where(is_large, own, d_large.min(axis=1)), lefts


def cof_scores(x: np.ndarray, window_size: int, step: int = 1,
               n_neighbors: int = 5) -> tuple:
    """COF core (PyodCOF.py:133 → pyod.models.cof; Tang, Chen, Fu & Cheung
    2002, "Enhancing effectiveness of outlier detections for low density
    patterns"): for each window, build the set-based nearest path (SBN
    trail) over its k+1 neighborhood — cost of step j = min distance from
    the j-th trail point to any earlier trail point; average chaining
    distance = weighted sum with weights 2(k+1-j)/((k+1)k); COF =
    ac_dist(p)·k / Σ ac_dist over p's k nearest neighbors. O(m²) distance
    matrix — quadratic kernel, bounded-group contract applies."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m <= 2:
        return np.ones(m), lefts
    sq = (mat**2).sum(1)
    d = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * (mat @ mat.T), 0))
    np.fill_diagonal(d, 0.0)
    k = min(n_neighbors, m - 1)
    w = 2.0 * (k - np.arange(k)) / ((k + 1) * k)  # j = 1..k → 2(k+1-j)/((k+1)k)
    ac = np.empty(m)
    trails = np.empty((m, k + 1), dtype=int)
    for i in range(m):
        p = np.argsort(d[i], kind="stable")[: k + 1]  # self first (d=0)
        trails[i] = p
        cost = np.empty(k)
        for j in range(k):
            cost[j] = d[p[j + 1]][p[: j + 1]].min()
        ac[i] = float((w * cost).sum())
    denom = ac[trails[:, 1:]].sum(axis=1)
    denom[denom == 0] = 1.0
    return ac * k / denom, lefts


def sod_scores(x: np.ndarray, window_size: int, step: int = 1,
               n_neighbors: int = 10, ref_set: int = 5,
               alpha: float = 0.8) -> tuple:
    """SOD core (PyodSOD.py:125 → pyod.models.sod; Kriegel, Kröger,
    Schubert & Zimek 2009, "Outlier detection in axis-parallel subspaces
    of high dimensional data"): for each window p,

      1. kNN by Euclidean distance (k = n_neighbors, self excluded),
      2. SNN similarity sim(p, q) = |kNN(p) ∩ kNN(q)|,
      3. reference set R(p) = `ref_set` points of highest SNN similarity
         (ties broken by index — deterministic),
      4. relevant subspace = dims whose variance over R(p) is below
         alpha · (mean per-dim variance of R(p)),
      5. score = sqrt(Σ_relevant (p − mean(R))² / |relevant|)
         (distance to the axis-parallel reference hyperplane, normalized
         by the subspace dimensionality; 0 if no dim qualifies).

    O(m²) distance + SNN matrices — quadratic kernel, bounded-group
    contract applies."""
    mat, lefts = _windows(x, window_size, step)
    m, w = mat.shape if len(mat) else (0, window_size)
    if m <= 2:
        return np.zeros(m), lefts
    k = min(n_neighbors, m - 1)
    r = min(ref_set, m - 1)
    sq = (mat**2).sum(1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2 * (mat @ mat.T), 0)
    np.fill_diagonal(d2, np.inf)
    # kNN index lists (stable argsort → deterministic under ties)
    knn = np.argsort(d2, axis=1, kind="stable")[:, :k]
    member = np.zeros((m, m), dtype=bool)
    np.put_along_axis(member, knn, True, axis=1)
    snn = member.astype(np.int32) @ member.astype(np.int32).T
    np.fill_diagonal(snn, -1)  # self never enters its own reference set
    scores = np.empty(m)
    for i in range(m):
        # top-r by SNN similarity, index-ascending among ties
        order = np.lexsort((np.arange(m), -snn[i]))[:r]
        ref = mat[order]
        means = ref.mean(0)
        # one-pass E[x²]−E[x]² (not np.var's two-pass): the SQL oracle
        # twin aggregates the same Σx, Σx² sums, so the variance → rel-dim
        # threshold comparison sees identical values in both engines
        variances = (ref**2).mean(0) - means**2
        var_expect = alpha * variances.sum() / w
        rel = variances < var_expect
        nrel = int(rel.sum())
        if nrel == 0:
            scores[i] = 0.0
        else:
            diff = mat[i] - means
            scores[i] = float(np.sqrt((diff[rel] ** 2).sum() / nrel))
    return scores, lefts


def _gmm_em(Z: np.ndarray, k: int, iters: int = 30,
            reg: float = 1e-6) -> tuple:
    """Full-covariance Gaussian mixture fit by EM with DETERMINISTIC
    initialization (responsibilities from the strided-init `_kmeans`
    labels — no RNG), the closed-form replacement for DAGMM's estimation
    network: the paper's training objective drives the estimation net's
    softmax γ toward the posterior responsibilities of exactly this
    mixture (gmm.py:28-57 computes φ, μ, Σ from γ the same way EM's
    M-step does). Returns (phi, mu, chol(Sigma) list)."""
    m, d = Z.shape
    labels, _ = _kmeans(Z, k)
    gamma = np.zeros((m, k))
    gamma[np.arange(m), labels] = 1.0
    phi = gamma.mean(axis=0)
    mu = np.zeros((k, d))
    covs = np.zeros((k, d, d))
    for _ in range(iters):
        # M-step (gmm.py:28-57: phi = mean gamma, mu/Sigma gamma-weighted)
        nk = gamma.sum(axis=0) + 1e-12
        phi = nk / m
        mu = (gamma.T @ Z) / nk[:, None]
        for c in range(k):
            zc = Z - mu[c]
            covs[c] = (gamma[:, c][:, None] * zc).T @ zc / nk[c]
            covs[c] += reg * np.eye(d)
        # E-step: responsibilities via the same Cholesky log-density
        logp = np.zeros((m, k))
        for c in range(k):
            L = np.linalg.cholesky(covs[c])
            sol = np.linalg.solve(L, (Z - mu[c]).T)
            logdet = 2.0 * np.log(np.diag(L)).sum()
            logp[:, c] = np.log(phi[c] + 1e-12) - 0.5 * (
                (sol**2).sum(axis=0) + d * np.log(2.0 * np.pi) + logdet
            )
        mx = logp.max(axis=1, keepdims=True)
        w = np.exp(logp - mx)
        gamma = w / w.sum(axis=1, keepdims=True)
    chols = [np.linalg.cholesky(covs[c]) for c in range(k)]
    return phi, mu, chols


def dagmm_scores(x: np.ndarray, window_size: int, step: int = 1,
                 n_latent: int = 1, n_comp: int = 2) -> tuple:
    """DAGMM core (DAGMM.py:138 → core/dagmm/dagmm.py), re-derived in
    closed form: the compression net is a linear AE — optimal at the
    top-k PCA subspace (same argument as ae_scores) — and the estimation
    net + GMM layer is an EM-fit Gaussian mixture over the DAGMM feature
    vector z = [z_c, loss_E, loss_C] (compression_net.py:64-85: relative
    Euclidean distance dist/(|x|+1e-3) and cosine dissimilarity
    0.5·(1−x·x̂/(|x||x̂|+1e-3))). Score = the reference's sample energy
    E(z) = −logsumexp_k[log φ_k − ½(vᵀv + d·log2π + log det Σ_k)] with
    triangular-solved v (gmm.py:92-123, the log-sum-exp + Cholesky
    formulation verbatim in numpy). Deterministic: SVD compression,
    strided k-means init, fixed EM iterations — the documented deviation
    from the reference is replacing joint SGD training of the two nets
    with their closed-form optima."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m < max(4, n_comp + 2):
        return np.zeros(m), lefts
    mu0, sd0 = mat.mean(0), mat.std(0)
    sd0[sd0 == 0] = 1.0
    X = (mat - mu0) / sd0
    _, _, vt = np.linalg.svd(X, full_matrices=False)
    k = min(n_latent, vt.shape[0])
    z_c = X @ vt[:k].T
    x_dash = z_c @ vt[:k]
    min_val = 1e-3
    norm_x = np.sqrt((X**2).sum(axis=1))
    norm_xd = np.sqrt((x_dash**2).sum(axis=1))
    dist = np.sqrt(((X - x_dash) ** 2).sum(axis=1))
    dot = (X * x_dash).sum(axis=1)
    loss_e = dist / (norm_x + min_val)
    loss_c = 0.5 * (1.0 - dot / (norm_x * norm_xd + min_val))
    Z = np.column_stack([z_c, loss_e, loss_c])
    phi, mug, chols = _gmm_em(Z, n_comp)
    d = Z.shape[1]
    logits = np.zeros((m, n_comp))
    for c in range(n_comp):
        sol = np.linalg.solve(chols[c], (Z - mug[c]).T)
        logdet = 2.0 * np.log(np.diag(chols[c])).sum()
        logits[:, c] = np.log(phi[c] + 1e-12) - 0.5 * (
            (sol**2).sum(axis=0) + d * np.log(2.0 * np.pi) + logdet
        )
    mx = logits.max(axis=1)
    energy = -(mx + np.log(np.exp(logits - mx[:, None]).sum(axis=1)))
    return energy, lefts


def vae_scores(x: np.ndarray, window_size: int, step: int = 1,
               n_components: int = 2) -> tuple:
    """VAE core (PyodVAE.py:303 → pyod.models.vae reconstruction-error
    scoring), re-derived in closed form: a linear-Gaussian VAE's optimum
    is probabilistic PCA (Tipping & Bishop 1999) — W spans the top-k
    principal subspace scaled by (λ_i − σ²)^½ and σ² is the mean
    discarded eigenvalue. Score = the marginal negative log-likelihood
    −log N(z; 0, WWᵀ + σ²I) per standardized window (the VAE's ELBO gap
    is zero at the linear optimum, so the ELBO-based outlier score
    reduces to exactly this marginal). Deterministic: one SVD, no
    sampling — the documented deviation is replacing the SGD-trained
    encoder/decoder pair with the closed-form pPCA solution."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m < 3:
        return np.zeros(m), lefts
    mu0, sd0 = mat.mean(0), mat.std(0)
    sd0[sd0 == 0] = 1.0
    Z = (mat - mu0) / sd0
    d = Z.shape[1]
    _, s, vt = np.linalg.svd(Z, full_matrices=False)
    lam = (s**2) / max(m - 1, 1)
    k = min(n_components, len(lam) - 1)  # always < len(lam): lam[k:] nonempty
    sigma2 = max(float(lam[k:].mean()), 1e-9)
    W = vt[:k].T * np.sqrt(np.maximum(lam[:k] - sigma2, 0.0))
    C = W @ W.T + sigma2 * np.eye(d)
    L = np.linalg.cholesky(C)
    sol = np.linalg.solve(L, Z.T)
    logdet = 2.0 * np.log(np.diag(L)).sum()
    nll = 0.5 * ((sol**2).sum(axis=0) + d * np.log(2.0 * np.pi) + logdet)
    return nll, lefts


def _gan_train(Z: np.ndarray, n_generators: int = 1, epochs: int = 30,
               lr: float = 0.01, seed: int = 0) -> np.ndarray:
    """Shared adversarial-training loop for the GAAL pair: ``n_generators``
    seeded 2-layer MLP generators (uniform noise → relu hidden → linear
    window space) against one shared 2-layer sigmoid discriminator
    (hidden width ceil(sqrt(m)), mirroring pyod's create_discriminator
    shape). Full-batch Adam, hand-written backprop, fixed epoch budget —
    fully deterministic for a fixed seed. Returns D(x) ∈ (0,1) per row of
    ``Z`` (probability the window looks like REAL data)."""
    m, d = Z.shape
    rng = np.random.default_rng(seed)
    hd = max(2, int(np.ceil(np.sqrt(m))))
    b1, b2, eps = 0.9, 0.999, 1e-8

    def mk(shape, scale):
        return rng.normal(0, scale, shape)

    # discriminator: d -> hd relu -> 1 sigmoid
    D = [mk((d, hd), 1 / np.sqrt(d)), np.zeros(hd),
         mk((hd, 1), 1 / np.sqrt(hd)), np.zeros(1)]
    # generators: d -> d relu -> d linear (pyod latent_size = data dim)
    Gs = [[mk((d, d), 1 / np.sqrt(d)), np.zeros(d),
           mk((d, d), 1 / np.sqrt(d)), np.zeros(d)]
          for _ in range(n_generators)]
    states = {id(p): (np.zeros_like(p), np.zeros_like(p))
              for net in [D, *Gs] for p in net}

    def adam(p, g, t):
        mm, vv = states[id(p)]
        mm += (1 - b1) * (g - mm)
        vv += (1 - b2) * (g * g - vv)
        p -= lr * (mm / (1 - b1**t)) / (np.sqrt(vv / (1 - b2**t)) + eps)

    def d_forward(X):
        H = np.maximum(X @ D[0] + D[1], 0.0)
        p = 1.0 / (1.0 + np.exp(-(H @ D[2] + D[3])))
        return H, p.ravel()

    def g_forward(G, noise):
        Hg = np.maximum(noise @ G[0] + G[1], 0.0)
        return Hg, Hg @ G[2] + G[3]

    n_fake = max(1, m // n_generators)
    for ep in range(1, epochs + 1):
        noises = [rng.uniform(0, 1, (n_fake, d)) for _ in Gs]
        fakes = [g_forward(G, nz)[1] for G, nz in zip(Gs, noises)]
        # --- discriminator step: real -> 1, generated -> 0 (BCE) ---
        Xb = np.vstack([Z, *fakes])
        yb = np.concatenate([np.ones(m), np.zeros(n_fake * len(Gs))])
        H, p = d_forward(Xb)
        dz2 = ((p - yb) / len(yb))[:, None]          # dBCE/dlogit
        gW2, gb2 = H.T @ dz2, dz2.sum(0)
        dH = (dz2 @ D[2].T) * (H > 0)
        gW1, gb1 = Xb.T @ dH, dH.sum(0)
        for p_, g_ in zip(D, [gW1, gb1, gW2.reshape(D[2].shape), gb2]):
            adam(p_, g_, ep)
        # --- generator steps: push D(G(z)) -> 1 through a FROZEN D ---
        for G, nz in zip(Gs, noises):
            Hg, fake = g_forward(G, nz)
            Hd = np.maximum(fake @ D[0] + D[1], 0.0)
            pd_ = 1.0 / (1.0 + np.exp(-(Hd @ D[2] + D[3]))).ravel()
            dzD = ((pd_ - 1.0) / n_fake)[:, None]
            dX = (dzD @ D[2].T) * (Hd > 0) @ D[0].T  # dBCE/dfake
            gW2g, gb2g = Hg.T @ dX, dX.sum(0)
            dHg = (dX @ G[2].T) * (Hg > 0)
            gW1g, gb1g = nz.T @ dHg, dHg.sum(0)
            for p_, g_ in zip(G, [gW1g, gb1g, gW2g, gb2g]):
                adam(p_, g_, ep)
    return d_forward(Z)[1]


def sogaal_scores(x: np.ndarray, window_size: int, step: int = 1,
                  epochs: int = 30, seed: int = 0) -> tuple:
    """SO-GAAL core (PyodSoGaal.py:172 → pyod.models.so_gaal, Liu et al.
    TKDE 2019 "Generative Adversarial Active Learning for Unsupervised
    Outlier Detection"): a single generator learns to synthesize
    potential outliers from uniform noise while a discriminator separates
    them from the data; after training, windows the discriminator is
    LEAST confident are real score highest. Re-derived as a seeded numpy
    MLP pair with full-batch Adam (deterministic — the documented
    deviation from the keras/SGD reference, same class as lstmod_scores);
    score orientation follows the UODBase contract (higher = more
    anomalous), i.e. 1 − D(x)."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m < 4:
        return np.zeros(m), lefts
    mu, sd = mat.mean(0), mat.std(0)
    sd[sd == 0] = 1.0
    return 1.0 - _gan_train((mat - mu) / sd, 1, epochs, seed=seed), lefts


def mogaal_scores(x: np.ndarray, window_size: int, step: int = 1,
                  n_generators: int = 3, epochs: int = 30,
                  seed: int = 0) -> tuple:
    """MO-GAAL core (PyodMoGaal.py:213 → pyod.models.mo_gaal): the
    multi-objective variant fights mode collapse by training k
    sub-generators against one shared discriminator, each with its own
    noise stream, so the synthesized outliers cover multiple regions of
    the data. Same deterministic numpy training harness as SO-GAAL
    (_gan_train with k generator towers); score = 1 − D(x)."""
    mat, lefts = _windows(x, window_size, step)
    m = len(mat)
    if m < 4:
        return np.zeros(m), lefts
    mu, sd = mat.mean(0), mat.std(0)
    sd[sd == 0] = 1.0
    k = max(1, min(n_generators, m // 2))
    return 1.0 - _gan_train((mat - mu) / sd, k, epochs, seed=seed), lefts


_CORES["ae"] = ae_scores
_CORES["cblof"] = cblof_scores
_CORES["cof"] = cof_scores
_CORES["sod"] = sod_scores
_CORES["dagmm"] = dagmm_scores
_CORES["vae"] = vae_scores
_CORES["sogaal"] = sogaal_scores
_CORES["mogaal"] = mogaal_scores
_QUADRATIC.add("cof")
_QUADRATIC.add("sod")


def detect_sequence(
    df: DataFrame,
    key_col: str,
    window_size: int = 10,
    contamination: float = 0.1,
    keys: list[str] | None = None,
    order_cols: list[str] | None = None,
    max_group_size: int = 100_000,
    **params,
) -> DataFrame:
    """DeepLog frame contract: per group, integer-encode the categorical
    `key_col` stream (sorted-unique order — deterministic), train
    `deeplog_scores` and emit one row per window position with
    score = 1 − P(actual next key), percentile threshold, label."""
    keys = keys or []
    order_cols = order_cols or ["timestamp"]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_group_size:
            gk = {k: pdf[k].iloc[0] for k in keys}
            raise ValueError(
                f"detect_sequence: group {gk} has {len(pdf)} rows > "
                f"{max_group_size}; re-key by a time-bounded key"
            )
        pdf = pdf.sort_values(order_cols)
        vocab = {k: i for i, k in enumerate(sorted(pdf[key_col].unique()))}
        ks = pdf[key_col].map(vocab).to_numpy(int)
        scores, lefts = deeplog_scores(ks, window_size, **params)
        if len(scores):
            th = np.percentile(scores, 100 * (1 - contamination))
            labels = (scores > th).astype(int)
        else:
            th, labels = 0.0, np.array([], int)
        out = pd.DataFrame(
            {
                "seg_id": np.arange(len(scores)),
                "left_ind": lefts,
                "right_ind": np.minimum(lefts + window_size, len(ks)),
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


def detect_supervised(
    df: DataFrame,
    value_col: str,
    label_col: str,
    window_size: int = 10,
    step: int = 1,
    contamination: float = 0.1,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    max_group_size: int = MAX_QUADRATIC_GROUP,
    **params,
) -> DataFrame:
    """Supervised windowed detection (XGBOD frame contract): per series,
    train `xgbod_scores` on the point-level labels and emit one row per
    window with margin score + percentile-thresholded label — the same
    output shape as detect(). Uses the kNN TOS feature, so the
    bounded-group contract applies (O(m²) per group)."""
    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_group_size:
            gk = {k: pdf[k].iloc[0] for k in keys}
            raise ValueError(
                f"detect_supervised: group {gk} has {len(pdf)} rows > "
                f"max_group_size={max_group_size}; re-key by a "
                "time-bounded key, e.g. (series, day)"
            )
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(float)
        y = pdf[label_col].to_numpy(float)
        scores, lefts = xgbod_scores(x, y, window_size, step, **params)
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


def detect_multivariate(
    df: DataFrame,
    value_cols: list[str],
    method: str = "autoreg",
    window_size: int = 10,
    step: int = 1,
    contamination: float = 0.1,
    combination: str = "average",
    weights: list[float] | None = None,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    standardize: bool = True,
    **params,
) -> DataFrame:
    """Multivariate windowed detection — core.MultiAutoRegOD semantics
    (MultiAutoRegOD.py:17-120): run the univariate core per dimension,
    z-standardize the per-dimension score matrix (MultiAutoRegOD.py:150-152,
    combo standardizer = StandardScaler, ddof=0 — without it a large-scale
    dimension dominates the combination), combine per-window scores by
    weighted 'average' / 'maximization' / 'median', then threshold the
    COMBINED score with the CollectiveBase percentile rule. Works with any
    registered core (autoreg/pca/knn/lof/iforest/abod/loda), matching the
    reference's per-dimension fit."""
    kern = _CORES[method]
    keys = keys or []
    wts = np.asarray(weights if weights is not None else [1.0] * len(value_cols),
                     float)
    wts = wts / wts.sum()

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        per_dim, lefts = [], None
        for c in value_cols:
            s, lefts = kern(pdf[c].to_numpy(float), window_size, step, **params)
            per_dim.append(s)
        S = np.stack(per_dim) if per_dim else np.empty((0, 0))
        if standardize and S.size:
            mu, sd = S.mean(axis=1, keepdims=True), S.std(axis=1, keepdims=True)
            S = (S - mu) / np.where(sd == 0, 1.0, sd)
        if combination == "average":
            scores = (S * wts[:, None]).sum(axis=0)
        elif combination == "maximization":
            scores = S.max(axis=0)
        elif combination == "median":
            scores = np.median(S, axis=0)
        else:
            raise ValueError(combination)
        n = len(pdf)
        if len(scores):
            th = np.percentile(scores, 100 * (1 - contamination))
            labels = (scores > th).astype(int)
        else:
            th, labels = 0.0, np.array([], int)
        out = pd.DataFrame({
            "seg_id": np.arange(len(scores)),
            "left_ind": lefts if lefts is not None else [],
            "right_ind": np.minimum(
                (lefts if lefts is not None else np.array([], int))
                + window_size, n),
            "score": scores, "threshold": th, "label": labels,
        })
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, "seg_id", "left_ind", "right_ind", "score",
                    "threshold", "label"]]

    key_fields = "".join(f"`{k}` string, " for k in keys)
    schema = (f"{key_fields}seg_id long, left_ind long, right_ind long, "
              "score double, threshold double, label int")
    return grouped_apply(df, keys, fn, schema)
