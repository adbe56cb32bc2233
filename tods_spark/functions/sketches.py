"""Mergeable quantile digest for cross-tier re-aggregation.

The cascade (1m → 1h → 1d) must MERGE per-window quantile state, not
recompute from raw (SURVEY.md §4: "quantile sketches across tiers"). Spark's
`approx_percentile` can't re-aggregate from stored state, so each rollup
window carries a fixed-size inverse-CDF grid:

    qdigest = [Q(0), Q(1/K), ..., Q(1)]   (K+1 doubles, K=64 default)

Building from raw values is an exact quantile evaluation (1m windows are
small). Merging digests is a weighted quantile of the reconstructed samples:
each digest contributes its K+1 grid points with weight count/(K+1). The
result is again a K+1 grid, so merging is associative enough for tier
cascades; max rank error per merge level is O(1/K) (~1.6% at K=64),
documented here as the engine's sketch error bound.

All kernels are vectorized numpy invoked from pandas/Arrow UDFs — no per-row
Python (driver rule).
"""

from __future__ import annotations

import numpy as np

K_DEFAULT = 64


def digest_from_values(values: np.ndarray, k: int = K_DEFAULT) -> np.ndarray:
    """Adaptive digest: EXACT sorted sample while n ≤ k+1 (zero error — the
    common case for 1m windows), inverse-CDF grid above that (rank error
    ≤ 1/k). Variable-length array<double>; `digest_quantile` evaluates both
    forms identically (linspace interp over a sorted sample IS numpy's
    linear quantile)."""
    v = np.asarray(values, dtype=np.float64)
    if v.size == 0:
        return np.full(k + 1, np.nan)
    if v.size <= k + 1:
        return np.sort(v)
    return np.quantile(v, np.linspace(0.0, 1.0, k + 1))


def merge_digests(
    digests: list[np.ndarray] | np.ndarray,
    counts: np.ndarray,
    k: int = K_DEFAULT,
) -> np.ndarray:
    """Weighted merge of inverse-CDF grids → new grid of the same size."""
    ds, ws, exact = [], [], True
    total = 0.0
    for d, c in zip(digests, np.asarray(counts, dtype=np.float64)):
        d = np.asarray(d, dtype=np.float64)
        if d.size == 0 or np.isnan(d).all() or c <= 0:
            continue
        ds.append(d)
        ws.append(np.full(d.size, c / d.size))
        total += c
        if d.size != int(c):
            exact = False
    if not ds:
        return np.full(k + 1, np.nan)
    x = np.concatenate(ds)
    w = np.concatenate(ws)
    order = np.argsort(x, kind="stable")
    x, w = x[order], w[order]
    if exact and x.size <= k + 1:
        # every point is a raw sample and the merge still fits: stay exact
        return x
    cw = np.cumsum(w)
    # numpy linear-quantile rank convention: first point rank 0, last rank 1
    denom = cw[-1] - w[-1]
    ranks = (cw - w) / denom if denom > 0 else np.zeros_like(cw)
    grid = np.linspace(0.0, 1.0, k + 1)
    return np.interp(grid, ranks, x)


def digest_quantile(digest: np.ndarray, p: float) -> float:
    """Evaluate quantile p from a stored grid."""
    d = np.asarray(digest, dtype=np.float64)
    grid = np.linspace(0.0, 1.0, d.size)
    return float(np.interp(p, grid, d))
