"""Seasonal-trend decomposition + scalers (SURVEY.md §2.5 scaler family,
§2.8 decomposition).

* ``seasonal_decompose`` — TimeSeriesSeasonalityTrendDecompositionPrimitive
  (tods/feature_analysis/TimeSeriesSeasonalityTrendDecomposition.py:309-340):
  statsmodels seasonal_decompose(model='additive', two-sided): trend =
  centered moving average of width `period` (even periods use the 2×m
  convention), seasonal = per-phase mean of the detrended series (demeaned),
  resid = y − trend − seasonal. Expressed with Catalyst window frames + a
  phase groupBy — NO UDF (the reference's trend edge-backfill of period/2
  NaNs is replicated with first/last non-null fills only when
  `backfill=True`).

* ``standard_scale`` — SKStandardScalerPrimitive (SKStandardScaler.py:152):
  (v − mean)/std_pop per column, global two-pass: one agg row broadcast back.

* ``axiswise_scale`` — SKAxiswiseScaler (SKAxiswiseScaler.py:99-111):
  sklearn.preprocessing.scale along axis 0 (same as standard) or axis 1
  (row-wise over the listed columns — a pure expression).

* ``quantile_transform`` — SKQuantileTransformer (SKQuantileTransformer.py:161):
  empirical-CDF map to uniform via percent_rank (the n→∞ limit of sklearn's
  1000-quantile grid; exact parity with sklearn interpolation is pinned in
  tests at the rank level).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def seasonal_decompose(
    df: DataFrame,
    value_col: str,
    period: int,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> DataFrame:
    keys = keys or []
    w = Window.partitionBy(*keys).orderBy(order_col)
    rn = F.row_number().over(w) - 1
    half = period // 2
    if period % 2 == 1:
        trend = F.avg(value_col).over(w.rowsBetween(-half, half))
    else:
        # even period: 2×m centered MA = avg of two adjacent m-windows
        t1 = F.avg(value_col).over(w.rowsBetween(-half, half - 1))
        t2 = F.avg(value_col).over(w.rowsBetween(-half + 1, half))
        trend = (t1 + t2) / 2
    # statsmodels two_sided: trend undefined for the first/last half rows
    n = F.count(F.lit(1)).over(
        Window.partitionBy(*keys).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    trend = F.when((rn >= half) & (rn < n - half), trend)
    step1 = df.withColumn("__rn__", rn).withColumn("trend", trend)
    detr = step1.withColumn("__detr__", F.col(value_col) - F.col("trend"))
    phase_means = (
        detr.withColumn("__phase__", F.col("__rn__") % period)
        .groupBy(*keys, "__phase__")
        .agg(F.avg("__detr__").alias("__pmean__"))
    )
    grand = phase_means.groupBy(*keys).agg(F.avg("__pmean__").alias("__gmean__"))
    on = keys if keys else None
    joined = detr.withColumn("__phase__", F.col("__rn__") % period)
    joined = (
        joined.join(F.broadcast(phase_means), [*keys, "__phase__"])
        if keys
        else joined.join(F.broadcast(phase_means), "__phase__")
    )
    joined = (
        joined.join(F.broadcast(grand), keys) if keys
        else joined.crossJoin(F.broadcast(grand))
    )
    out = joined.withColumn(
        "seasonal", F.col("__pmean__") - F.col("__gmean__")
    ).withColumn(
        "resid", F.col(value_col) - F.col("trend") - F.col("seasonal")
    )
    return out.drop("__rn__", "__detr__", "__phase__", "__pmean__", "__gmean__")


def standard_scale(
    df: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
    with_mean: bool = True,
    with_std: bool = True,
) -> DataFrame:
    """Two-pass global scaler: agg row joined back (broadcast — one row per
    key group), suffix `_scaled`. std is POPULATION (sklearn convention)."""
    keys = keys or []
    aggs = []
    for c in value_cols:
        aggs += [F.avg(c).alias(f"__m_{c}__"), F.stddev_pop(c).alias(f"__s_{c}__")]
    stats = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    joined = df.join(F.broadcast(stats), keys) if keys else df.crossJoin(
        F.broadcast(stats)
    )
    for c in value_cols:
        e = F.col(c).cast("double")
        if with_mean:
            e = e - F.col(f"__m_{c}__")
        if with_std:
            s = F.col(f"__s_{c}__")
            e = F.when(s > 0, e / s).otherwise(e)
        joined = joined.withColumn(f"{c}_scaled", e)
    drop = [f"__m_{c}__" for c in value_cols] + [f"__s_{c}__" for c in value_cols]
    return joined.drop(*drop)


def axiswise_scale_rows(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """Row-wise (axis=1) standardization across the listed columns — a pure
    expression (mean/std across k columns per row)."""
    k = len(value_cols)
    mean = sum(F.col(c).cast("double") for c in value_cols) / k
    var = sum((F.col(c).cast("double") - mean) ** 2 for c in value_cols) / k
    std = F.sqrt(var)
    out = df
    for c in value_cols:
        out = out.withColumn(
            f"{c}_scaled",
            F.when(std > 0, (F.col(c) - mean) / std).otherwise(F.col(c) - mean),
        )
    return out


def truncated_svd(
    df: DataFrame,
    value_cols: list[str],
    n_components: int = 2,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> DataFrame:
    """SKTruncatedSVDPrimitive (tods/feature_analysis/SKTruncatedSVD.py:166):
    project the feature columns onto the top-k right singular vectors of the
    UNCENTERED matrix (sklearn TruncatedSVD semantics), emitting
    `svd_0..svd_{k-1}`. Per-group exact SVD via numpy inside a grouped-map
    Arrow UDF; sign convention fixed by making each component's
    largest-|loading| positive (sklearn svd_flip)."""
    import numpy as np
    import pandas as pd

    from tods_spark.operators._util import grouped_apply

    keys = keys or []
    k = n_components

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        X = pdf[value_cols].to_numpy(float)
        u, s, vt = np.linalg.svd(X, full_matrices=False)
        kk = min(k, vt.shape[0])
        # svd_flip: deterministic signs
        signs = np.sign(vt[np.arange(kk), np.abs(vt[:kk]).argmax(axis=1)])
        proj = X @ (vt[:kk] * signs[:, None]).T
        for i in range(kk):
            pdf[f"svd_{i}"] = proj[:, i]
        for i in range(kk, k):
            pdf[f"svd_{i}"] = 0.0
        return pdf

    new_cols = ", ".join(f"svd_{i} double" for i in range(k))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + new_cols
    return grouped_apply(df, keys, fn, schema)


def quantile_transform_uniform(
    df: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """Empirical-CDF map to U[0,1] via percent_rank — suffix `_qt`."""
    keys = keys or []
    out = df
    for c in value_cols:
        w = Window.partitionBy(*keys).orderBy(c)
        out = out.withColumn(f"{c}_qt", F.percent_rank().over(w))
    return out


def nmf_factorize(V: np.ndarray, rank: int, n_iter: int = 200,
                  seed: int = 0, tol: float = 1e-9):
    """Non-negative matrix factorization V ≈ W·H by Lee-Seung euclidean
    multiplicative updates — the engine-native core of
    NonNegativeMatrixFactorizationPrimitive (tods/feature_analysis/
    NonNegativeMatrixFactorization.py:187-198, nimfa.Nmf with the default
    euclidean update / Frobenius objective). Deterministic seeded uniform
    init (nimfa seed='random_vcol' is RNG-dependent; a fixed seed is the
    reproducible engine contract)."""
    V = np.asarray(V, float)
    m, n = V.shape
    rng = np.random.default_rng(seed)
    W = rng.uniform(0.1, 1.0, (m, rank))
    H = rng.uniform(0.1, 1.0, (rank, n))
    eps = 1e-12
    prev = np.inf
    for _ in range(n_iter):
        H *= (W.T @ V) / (W.T @ W @ H + eps)
        W *= (V @ H.T) / (W @ (H @ H.T) + eps)
        obj = float(((V - W @ H) ** 2).sum())
        if prev - obj < tol * max(prev, 1.0):
            break
        prev = obj
    return W, H


def nmf_windows(
    df: DataFrame,
    value_col: str,
    rank: int = 3,
    window_size: int = 10,
    step: int = 5,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    n_iter: int = 200,
    seed: int = 0,
) -> DataFrame:
    """Per-series NMF over the sliding-window matrix (rows = windows,
    columns = in-window positions — the same matrix the reference feeds
    nimfa after SubsequenceSegmentation): one grouped-map Arrow batch per
    series, output one row per window with its rank-d latent vector
    (reference `row_latent_vector_*` columns). Values are shifted to be
    non-negative per series (NMF requires V ≥ 0); the shift is returned so
    the factorization remains interpretable."""
    keys = keys or []

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(float)
        shift = min(0.0, float(x.min())) if len(x) else 0.0
        x = x - shift
        n = len(x)
        lefts = np.arange(0, max(n - window_size + 1, 0), step)
        if not len(lefts):
            out = pd.DataFrame({"seg_id": [], "left_ind": [], "shift": []})
            for i in range(rank):
                out[f"row_latent_vector_{i}"] = []
        else:
            V = np.stack([x[i: i + window_size] for i in lefts])
            W, _ = nmf_factorize(V, rank, n_iter=n_iter, seed=seed)
            out = pd.DataFrame({"seg_id": np.arange(len(lefts)),
                                "left_ind": lefts,
                                "shift": shift})
            for i in range(rank):
                out[f"row_latent_vector_{i}"] = W[:, i]
        for k in keys:
            out[k] = pdf[k].iloc[0] if len(pdf) else None
        return out[[*keys, "seg_id", "left_ind", "shift",
                    *(f"row_latent_vector_{i}" for i in range(rank))]]

    from tods_spark.operators._util import grouped_apply

    key_fields = "".join(f"`{k}` string, " for k in keys)
    lat = ", ".join(f"row_latent_vector_{i} double" for i in range(rank))
    schema = f"{key_fields}seg_id long, left_ind long, shift double, {lat}"
    return grouped_apply(df, keys, fn, schema)
