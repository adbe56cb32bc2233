"""Temporal Regularized Matrix Factorization (TRMF).

Engine-native re-derivation of TRMFPrimitive (tods/feature_analysis/
TRMF.py:162-230), implemented from the published objective (Yu, Rao &
Dhillon, NIPS 2016, "Temporal regularized matrix factorization for
high-dimensional time series prediction"):

    min_{F,X,W}  ||Y − F·X||²_obs
               + λ_f ||F||²
               + λ_x Σ_t ||x_t − Σ_{l∈lags} W_l ∘ x_{t−l}||²  + η ||X||²
               + λ_w (||W||² + α ||1 − Σ_l W_l||²)

Y is (n_series × T); F embeds series, X embeds time points, W holds
per-factor autoregressive lag weights. Solved by alternating minimization
(closed-form ridge blocks for F and W, Lipschitz-stepped gradient for the
time-coupled X block) with deterministic seeded init — the reproducible
engine contract (the reference's third-party implementation inherits
numpy's global RNG and uses fixed-step gradient descent).

Spark shape: TRMF is inherently MULTI-series (one factorization couples
all series in a group), so the operator pivots the group's series into one
(n_series × T) matrix inside a single grouped-map Arrow batch. Group size
is bounded by the grouping key (e.g. a tenant / metric family at engine
scale); factorizing 10^12 rows means many independent bounded groups, not
one giant matrix — exactly how the cascade bounds its digests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tods_spark.operators._util import grouped_apply


def trmf_factorize(
    Y: np.ndarray,
    lags: tuple[int, ...] = (1,),
    K: int = 2,
    lambda_f: float = 1.0,
    lambda_x: float = 1.0,
    lambda_w: float = 1.0,
    alpha: float = 1000.0,
    eta: float = 1.0,
    max_iter: int = 200,
    x_inner_steps: int = 5,
    seed: int = 0,
):
    """Alternating-minimization TRMF; returns (F, X, W). F and W have
    closed-form ridge solutions per block; the time-coupled X subproblem is
    minimized with Lipschitz-stepped gradient descent (x_inner_steps per
    outer iteration) — each update never increases the objective, so the
    whole loop is a descent method. Missing values in Y may be passed as
    NaN — they are masked out of the data term (the paper's Ω-restricted
    loss), which is what makes TRMF usable for gap-ridden series."""
    Y = np.asarray(Y, float)
    n, T = Y.shape
    lags = tuple(int(l) for l in lags)
    L = len(lags)
    mask = ~np.isnan(Y)
    Yz = np.where(mask, Y, 0.0)
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, K)) * 0.1
    X = rng.standard_normal((K, T)) * 0.1
    W = np.full((K, L), 1.0 / L)
    m = max(lags)
    full = mask.all()

    def ar_resid():
        # R[:, t] = X[:, t] - sum_l W_l * X[:, t-l], defined for t >= max lag
        R = X[:, m:].copy()
        for i, l in enumerate(lags):
            R -= W[:, i: i + 1] * X[:, m - l: T - l]
        return R

    eyeK = np.eye(K)
    for _ in range(max_iter):
        # ---- F: ridge least squares (rows decouple; masked rows solve
        # their own normal equations over observed columns)
        if full:
            G = X @ X.T + lambda_f * eyeK
            F = np.linalg.solve(G, X @ Yz.T).T
        else:
            for i in range(n):
                obs = mask[i]
                Xo = X[:, obs]
                G = Xo @ Xo.T + lambda_f * eyeK
                F[i] = np.linalg.solve(G, Xo @ Yz[i, obs])
        # ---- X: Lipschitz-stepped gradient on the joint quadratic
        lip = 2.0 * (
            float(np.linalg.eigvalsh(F.T @ F)[-1])
            + lambda_x * (1.0 + float((W**2).sum(axis=1).max())) * (1 + L)
            + eta * lambda_x
        )
        step = 1.0 / max(lip, 1e-12)
        for _ in range(x_inner_steps):
            E = np.where(mask, F @ X - Yz, 0.0)
            R = ar_resid()
            gX = 2 * (F.T @ E) + 2 * eta * lambda_x * X
            gX[:, m:] += 2 * lambda_x * R
            for i, l in enumerate(lags):
                gX[:, m - l: T - l] -= 2 * lambda_x * W[:, i: i + 1] * R
            X -= step * gX
        # ---- W: per-factor ridge with the sum-to-one pull (closed form:
        # (λ_x AᵀA + λ_w(I + α·11ᵀ)) w = λ_x Aᵀx + λ_w α 1)
        for k in range(K):
            A = np.stack([X[k, m - l: T - l] for l in lags], axis=1)
            lhs = (lambda_x * (A.T @ A)
                   + lambda_w * (np.eye(L) + alpha * np.ones((L, L))))
            rhs = lambda_x * (A.T @ X[k, m:]) + lambda_w * alpha * np.ones(L)
            W[k] = np.linalg.solve(lhs, rhs)
    return F, X, W


def trmf_objective(Y, F, X, W, lags=(1,), lambda_f=1.0, lambda_x=1.0,
                   lambda_w=1.0, alpha=1000.0, eta=1.0) -> float:
    """The exact objective value (used by tests to assert descent)."""
    Y = np.asarray(Y, float)
    mask = ~np.isnan(Y)
    m = max(lags)
    R = X[:, m:].copy()
    for i, l in enumerate(lags):
        R -= W[:, i: i + 1] * X[:, m - l: X.shape[1] - l]
    data = float((((F @ X) - np.where(mask, Y, 0.0))[mask] ** 2).sum())
    return (
        data
        + lambda_f * float((F**2).sum())
        + lambda_x * (float((R**2).sum()) + eta * float((X**2).sum()))
        + lambda_w * (float((W**2).sum())
                      + alpha * float(((1.0 - W.sum(axis=1)) ** 2).sum()))
    )


def trmf_embed(
    df: DataFrame,
    value_col: str,
    series_col: str,
    order_col: str = "timestamp",
    keys: list[str] | None = None,
    lags: tuple[int, ...] = (1,),
    K: int = 2,
    max_iter: int = 200,
    **params,
) -> DataFrame:
    """Per-group TRMF: pivot the group's series into (n_series × T), run
    trmf_factorize, emit one row per series with its K-dim embedding (the
    reference's F matrix rows). Series shorter than the group's T are
    NaN-padded and masked (Ω-restricted loss)."""
    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        piv = pdf.pivot_table(index=series_col, columns=order_col,
                              values=value_col, aggfunc="first")
        piv = piv.sort_index()
        Fm, _, _ = trmf_factorize(piv.to_numpy(float), lags=lags, K=K,
                                  max_iter=max_iter, **params)
        out = pd.DataFrame({series_col: piv.index.astype(str)})
        for i in range(K):
            out[f"series_latent_{i}"] = Fm[:, i]
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, series_col,
                    *(f"series_latent_{i}" for i in range(K))]]

    key_fields = "".join(f"`{k}` string, " for k in keys)
    lat = ", ".join(f"series_latent_{i} double" for i in range(K))
    schema = f"{key_fields}`{series_col}` string, {lat}"
    return grouped_apply(df, keys, fn, schema)
