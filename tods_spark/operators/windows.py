"""Reference-parity window statistics (SURVEY.md §2.5).

Two frame conventions, replicated exactly:

* ``moving_average`` — CENTERED width-3 rolling mean, partial at the edges
  (``rolling(3, min_periods=1, center=True).mean()``); the reference
  hardcodes 3 and ignores its window_size hyperparam
  (tods/timeseries_processing/MovingAverageTransformer.py:198).

* ``stat_window`` — TRAILING frame of width w with edge BACKFILL
  ``out[:w-1] = out[w-1]`` (tods/feature_analysis/StatisticalMean.py:308-326
  and 19 siblings). ``window_size=-1`` means whole-series (full aggregate
  broadcast to every row).

Everything is expressed as Catalyst window frames (Tungsten WindowExec,
whole-stage codegen) — zero Python in the hot path. The only UDF-backed stat
is median-absolute-deviation (two nested medians don't fit one frame agg).

Output naming follows the reference: ``<col>_<stat>`` suffixes, and the
scipy-backed stats round to 4 decimals exactly where the reference does
(StatisticalSkew.py:326, StatisticalKurtosis.py:324, StatisticalGmean.py:330,
StatisticalHmean.py:328, StatisticalVariation.py:326, StatisticalAbsEnergy.py:325,
StatisticalMedianAbsoluteDeviation.py:327).

Scale notes: frames are per (keys) partition ordered by ``order_col``; the
single shuffle is the partitionBy. Unbounded whole-series frames on a giant
single series would funnel into one task — for the engine's use the series
key is (source, doc_id) or a tier window, both bounded. The backfill needs
the value at row w, fetched with an unbounded-frame ``max(when(rn==w, x))``
— one extra window pass, same shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

_ROUND4 = {"skew", "kurtosis", "variation", "gmean", "hmean",
           "abs_energy", "median_absolute_deviation"}


def _frame_agg(stat: str, v: Column, w, frame_w: int) -> Column:
    """Aggregate `stat` of column v over the trailing row frame `w`."""
    if stat == "mean":
        return F.avg(v).over(w)
    if stat == "median":
        return F.percentile(v, F.lit(0.5)).over(w)
    if stat == "maximum":
        return F.max(v).over(w)
    if stat == "minimum":
        return F.min(v).over(w)
    if stat == "std":
        # np.std ddof=0 (StatisticalStd.py:324)
        return F.coalesce(F.stddev_pop(v).over(w), F.lit(0.0))
    if stat == "var":
        return F.coalesce(F.var_pop(v).over(w), F.lit(0.0))
    if stat == "skew":
        # scipy.stats.skew bias=True == population g1 == Spark skewness
        return F.skewness(v).over(w)
    if stat == "kurtosis":
        # scipy Fisher excess kurtosis, bias=True == Spark kurtosis
        return F.kurtosis(v).over(w)
    if stat == "variation":
        # scipy.stats.variation = std_pop / mean
        return F.stddev_pop(v).over(w) / F.avg(v).over(w)
    if stat == "vec_sum":
        return F.sum(v).over(w)
    if stat == "abs_sum":
        return F.sum(F.abs(v)).over(w)
    if stat == "abs_energy":
        return F.sum(v * v).over(w)
    if stat == "mean_abs":
        return F.avg(F.abs(v)).over(w)
    if stat == "gmean":
        # scipy.stats.gmean limit semantics: a zero in the window ->
        # log(0) = -inf -> exp(mean) = 0.0 (zeros appear in real buckets —
        # sf0.1 exposed them; ANSI Spark would error on log(0)); a
        # NEGATIVE value -> nan (scipy emits nan with an invalid-value
        # warning — 0.0 would silently fabricate a result). The CASE
        # cannot short-circuit a window aggregate, so the INNER log is
        # made total (non-positives mapped to a dummy 1.0 the outer
        # guards discard).
        safe = F.when(v > 0, v).otherwise(F.lit(1.0))
        return (
            F.when(F.min(v).over(w) < 0, F.lit(float("nan")))
            .when(F.min(v).over(w) == 0, F.lit(0.0))
            .otherwise(F.exp(F.avg(F.log(safe)).over(w)))
        )
    if stat == "hmean":
        # scipy.stats.hmean: zero element -> 1/0 = inf -> n/inf = 0.0;
        # negative element -> scipy raises ValueError — as an engine
        # column that maps to nan, not an exception
        safe = F.when(v != 0, v).otherwise(F.lit(1.0))
        return (
            F.when(F.min(v).over(w) < 0, F.lit(float("nan")))
            .when(F.min(v).over(w) == 0, F.lit(0.0))
            .otherwise(F.count(v).over(w) / F.sum(F.lit(1.0) / safe).over(w))
        )
    if stat == "mean_temporal_derivative":
        # np.mean(np.diff(window)) == (last - first) / (w-1), telescoping
        return (F.last(v).over(w) - F.first(v).over(w)) / F.lit(frame_w - 1)
    if stat == "median_absolute_deviation":
        # scipy.stats.median_absolute_deviation: 1.4826 * median(|x - med(x)|)
        @F.pandas_udf("double")
        def _mad(arrs: pd.Series) -> pd.Series:
            def mad(a):
                a = np.asarray(a, float)
                return 1.4826 * float(np.median(np.abs(a - np.median(a))))
            return arrs.map(mad)

        return _mad(F.collect_list(v).over(w))
    raise ValueError(f"unknown stat {stat!r}")


STATS = [
    "mean", "median", "maximum", "minimum", "std", "var", "skew", "kurtosis",
    "variation", "vec_sum", "abs_sum", "abs_energy", "mean_abs", "gmean",
    "hmean", "mean_temporal_derivative", "mean_abs_temporal_derivative",
    "willison_amplitude", "median_absolute_deviation",
]


def stat_window(
    df: DataFrame,
    value_cols: list[str],
    stat: str = "mean",
    window_size: int = -1,
    keys: list[str] | None = None,
    order_col: str | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Trailing-window statistic with reference edge backfill.

    window_size=-1 → whole-series aggregate on every row (the reference sets
    window := len(X), StatisticalMean.py:317-318).
    """
    keys = keys or []
    part = Window.partitionBy(*keys)
    if order_col is not None:
        base = part.orderBy(order_col)
    else:
        # reference operates in given row order; callers that care pass an
        # explicit order column — for parity on literal fixtures we make one.
        df = df.withColumn("__row__", F.monotonically_increasing_id())
        base = part.orderBy("__row__")

    out_cols = []
    for c in value_cols:
        v = F.col(c).cast("double")
        name = f"{c}_{stat}"
        if stat == "zero_crossing":
            # indicator x[i]*x[i-1] < 0, no window (StatisticalZeroCrossing.py:315)
            e = F.when(v * F.lag(v).over(base) < 0, 1.0).otherwise(0.0)
            out_cols.append(e.alias(name))
            continue

        if stat == "willison_amplitude":
            # indicator |x[i]-x[i-1]|>t with x[-1]:=0, then trailing-window
            # SUM of the indicator (StatisticalWillisonAmplitude.py:312-338)
            ind = F.when(
                F.abs(v - F.lag(v, 1, 0.0).over(base)) > threshold, 1.0
            ).otherwise(0.0)
            df = df.withColumn(f"__ind_{c}__", ind)
            v2 = F.col(f"__ind_{c}__")
            w_eff = window_size
            if w_eff == -1:
                e = F.sum(v2).over(base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
                out_cols.append(e.alias(name))
                continue
            frame = base.rowsBetween(-(w_eff - 1), 0)
            raw = F.sum(v2).over(frame)
            out_cols.append(_backfill(raw, base, w_eff).alias(name))
            continue

        if stat == "mean_abs_temporal_derivative":
            # mean of |diff| inside the trailing window: w-1 diffs
            # (StatisticalMeanAbsTemporalDerivative.py:307-324)
            d = F.abs(v - F.lag(v).over(base))
            df = df.withColumn(f"__d_{c}__", d)
            v2 = F.col(f"__d_{c}__")
            if window_size == -1:
                e = F.avg(v2).over(base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
                out_cols.append(e.alias(name))
                continue
            frame = base.rowsBetween(-(window_size - 2), 0)
            raw = F.avg(v2).over(frame)
            out_cols.append(_backfill(raw, base, window_size).alias(name))
            continue

        if window_size == -1:
            frame = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            e = _frame_agg(stat, v, frame, 0)
            if stat == "mean_temporal_derivative":
                # whole-series: (last-first)/(n-1)
                n = F.count(v).over(frame)
                e = (F.last(v).over(frame) - F.first(v).over(frame)) / (n - 1)
            if stat in _ROUND4:
                e = F.round(e + F.lit(1e-9), 4) + F.lit(0.0)  # nudge + -0.0 fix: see queries._r4
            out_cols.append(e.alias(name))
            continue

        frame = base.rowsBetween(-(window_size - 1), 0)
        raw = _frame_agg(stat, v, frame, window_size)
        if stat in _ROUND4:
            raw = F.round(raw + F.lit(1e-9), 4) + F.lit(0.0)  # nudge + -0.0 fix: see queries._r4
        out_cols.append(_backfill(raw, base, window_size).alias(name))

    result = df.select("*", *out_cols)
    return result.drop("__row__", *[f"__ind_{c}__" for c in value_cols],
                       *[f"__d_{c}__" for c in value_cols])


def _backfill(raw: Column, base, w: int) -> Column:
    """Reference edge rule out[:w-1] = out[w-1]: rows before the first full
    window take the first full window's value (StatisticalMean.py:326)."""
    rn = F.row_number().over(base)
    full_part = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    at_w = F.max(F.when(rn == w, raw)).over(full_part)
    return F.when(rn < w, F.coalesce(at_w, raw)).otherwise(raw)


def moving_average(
    df: DataFrame,
    value_cols: list[str],
    keys: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Centered rolling mean, width 3, partial edges — exact semantics of
    MovingAverageTransformerPrimitive (MovingAverageTransformer.py:198):
    pandas rolling(3, min_periods=1, center=True).mean()."""
    keys = keys or []
    part = Window.partitionBy(*keys)
    if order_col is not None:
        base = part.orderBy(order_col)
    else:
        df = df.withColumn("__row__", F.monotonically_increasing_id())
        base = part.orderBy("__row__")
    frame = base.rowsBetween(-1, 1)
    out = df.select(
        "*",
        *[
            F.avg(F.col(c).cast("double")).over(frame).alias(f"{c}_moving_average")
            for c in value_cols
        ],
    )
    return out.drop("__row__")
