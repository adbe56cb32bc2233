"""Golden + randomized parity tests for the window-stat family
(FIXTURES.md F1/F2; reference kernels cited in tods_spark/operators/windows.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tods_spark.operators import windows as W

from . import oracle


def _spark_col(spark, values, fn, colname):
    pdf = pd.DataFrame({"idx": range(len(values)), "value": values})
    df = spark.createDataFrame(pdf)
    out = fn(df).orderBy("idx").toPandas()
    return out[colname].to_numpy()


def test_moving_average_golden_f1(spark):
    # tods/tests/timeseries_processing/test_MovingAverageTransform.py:13-14,55
    got = _spark_col(
        spark,
        [100.0, 200.0, 300.0, 400.0, 500.0],
        lambda df: W.moving_average(df, ["value"], order_col="idx"),
        "value_moving_average",
    )
    np.testing.assert_allclose(got, [150.0, 200.0, 300.0, 400.0, 450.0])


def test_stat_mean_golden_f2(spark):
    # tods/tests/feature_analysis/test_StatisticalMean.py:54,61-69
    pdf = pd.DataFrame(
        {"idx": range(4), "values": [1.0, 2.0, 3.0, 4.0], "b": [1.0, 4.0, 5.0, 6.0]}
    )
    df = spark.createDataFrame(pdf)
    out = (
        W.stat_window(df, ["values", "b"], "mean", window_size=2, order_col="idx")
        .orderBy("idx")
        .toPandas()
    )
    np.testing.assert_allclose(out["values_mean"], [1.5, 1.5, 2.5, 3.5])
    np.testing.assert_allclose(out["b_mean"], [2.5, 2.5, 4.5, 5.5])


@pytest.mark.parametrize("stat", W.STATS)
@pytest.mark.parametrize("w", [2, 5, -1])
def test_stat_window_matches_oracle(spark, stat, w):
    rng = np.random.default_rng(7)
    vals = rng.uniform(0.5, 10.0, 40)  # positive: gmean/hmean need > 0
    if stat == "willison_amplitude":
        vals = rng.normal(0, 1, 40)
    expect = oracle.stat_window(vals, stat, w, threshold=0.5)
    got = _spark_col(
        spark,
        vals,
        lambda df: W.stat_window(
            df, ["value"], stat, window_size=w, order_col="idx", threshold=0.5
        ),
        f"value_{stat}",
    )
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-8)


def test_zero_crossing(spark):
    vals = [1.0, -2.0, 3.0, 4.0, -5.0, 0.0, 2.0]
    expect = oracle.stat_window(vals, "zero_crossing", -1)
    got = _spark_col(
        spark,
        vals,
        lambda df: W.stat_window(df, ["value"], "zero_crossing", order_col="idx"),
        "value_zero_crossing",
    )
    np.testing.assert_allclose(got, expect)


def test_stat_window_partitioned_by_key(spark):
    """Backfill + frames are per series key, independent across keys."""
    rng = np.random.default_rng(3)
    frames = []
    for k in ["a", "b", "c"]:
        v = rng.uniform(1, 5, 17)
        frames.append(pd.DataFrame({"k": k, "idx": range(17), "value": v}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf).repartition(8)
    out = (
        W.stat_window(df, ["value"], "mean", window_size=4, keys=["k"], order_col="idx")
        .orderBy("k", "idx")
        .toPandas()
    )
    for k, g in pdf.groupby("k"):
        expect = oracle.stat_window(g["value"].to_numpy(), "mean", 4)
        got = out[out.k == k].sort_values("idx")["value_mean"].to_numpy()
        np.testing.assert_allclose(got, expect, rtol=1e-9)
