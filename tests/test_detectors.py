"""Detector cores: planted anomalies must surface as top scores; AutoReg
residuals match a hand-rolled OLS; threshold rule matches CollectiveBase."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tods_spark.operators import detectors as DET


def _series_with_spike(n=300, spike_at=200, seed=1):
    rng = np.random.default_rng(seed)
    x = np.sin(np.arange(n) / 6.0) * 5 + rng.normal(0, 0.2, n)
    x[spike_at] += 15.0
    return x


@pytest.mark.parametrize("method", ["autoreg", "pca", "knn"])
def test_detectors_find_planted_spike(spark, method):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    out = (
        DET.detect(spark.createDataFrame(pdf), "value", method,
                   window_size=12, contamination=0.02)
        .orderBy("seg_id")
        .toPandas()
    )
    # the flagged windows must cluster around the spike
    flagged = out[out.label == 1]
    assert len(flagged) > 0
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any(), method
    # threshold matches the CollectiveBase percentile rule
    th = np.percentile(out["score"], 98)
    np.testing.assert_allclose(out["threshold"].iloc[0], th, rtol=1e-9)


def test_autoreg_matches_numpy_ols(spark):
    x = _series_with_spike(n=120, spike_at=80)
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    out = (
        DET.detect(spark.createDataFrame(pdf), "value", "autoreg",
                   window_size=8, step=2)
        .orderBy("seg_id")
        .toPandas()
    )
    scores, lefts = DET.autoreg_scores(x, 8, 2)
    np.testing.assert_array_equal(out["left_ind"], lefts)
    np.testing.assert_allclose(out["score"], scores, rtol=1e-9)


def test_detectors_per_key_grouping(spark):
    frames = []
    for k in ("a", "b"):
        x = _series_with_spike(seed=ord(k))
        frames.append(pd.DataFrame({"k": k, "timestamp": range(len(x)), "value": x}))
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True)).repartition(4)
    out = DET.detect(df, "value", "knn", window_size=10, keys=["k"]).toPandas()
    assert set(out["k"]) == {"a", "b"}
    # per-key thresholds are independent
    assert out.groupby("k")["threshold"].nunique().eq(1).all()
