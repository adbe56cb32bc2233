"""Pipeline-builder API: config → lazy transform chain (reference entry
point B analogue)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tods_spark.api import build_pipeline

from . import oracle


def test_build_pipeline_end_to_end(spark):
    rng = np.random.default_rng(13)
    frames = []
    for k in ("s1", "s2"):
        frames.append(
            pd.DataFrame(
                {"source": k, "timestamp": np.arange(50, dtype=float),
                 "value": rng.normal(10, 2, 50)}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)

    pipe = build_pipeline(
        {
            "keys": ["source"],
            "order_col": "timestamp",
            "timeseries_processing": [
                {"op": "moving_average", "cols": ["value"]},
            ],
            "feature_analysis": [
                {"op": "stat_window", "stat": "mean", "cols": ["value"],
                 "window_size": 5},
            ],
            "detection": {"score_col": "value_mean", "contamination": 0.1},
        }
    )
    out = pipe(df).orderBy("source", "timestamp").toPandas()
    assert {"value_moving_average", "value_mean", "label", "threshold"} <= set(
        out.columns
    )
    for k, g in pdf.groupby("source"):
        sub = out[out.source == k]
        np.testing.assert_allclose(
            sub["value_moving_average"], oracle.moving_average(g["value"]),
            rtol=1e-9,
        )
        np.testing.assert_allclose(
            sub["value_mean"], oracle.stat_window(g["value"], "mean", 5),
            rtol=1e-9,
        )
        scores = sub["value_mean"].to_numpy()
        th = np.percentile(scores, 90)
        np.testing.assert_allclose(sub["threshold"].iloc[0], th, rtol=1e-12)
        np.testing.assert_array_equal(sub["label"], (scores > th).astype(int))


def test_default_feature_stage(spark):
    pdf = pd.DataFrame({"timestamp": range(10), "value": range(10)})
    pipe = build_pipeline({"order_col": "timestamp"})
    out = pipe(spark.createDataFrame(pdf))
    assert "value_maximum" in out.columns  # reference default (utils.py:46-53)
