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


def test_detector_core_as_detection_stage(spark):
    """The reference's out-of-the-box default pipeline ends in pyod_ae
    (utils.py:46-53); the engine pipeline can name any detector core —
    method='ae' — as the detection stage and the planted spike is
    flagged."""
    rng = np.random.default_rng(21)
    vals = np.sin(np.arange(240) / 5.0) * 3 + rng.normal(0, 0.2, 240)
    vals[150] += 20.0
    pdf = pd.DataFrame({"source": "s1", "timestamp": np.arange(240.0),
                        "value": vals})
    pipe = build_pipeline(
        {
            "keys": ["source"],
            "order_col": "timestamp",
            "timeseries_processing": [],
            "feature_analysis": [],
            "detection": {"method": "ae", "value_col": "value",
                          "window_size": 12, "contamination": 0.02},
        }
    )
    out = pipe(spark.createDataFrame(pdf)).toPandas()
    assert {"seg_id", "left_ind", "right_ind", "score", "threshold",
            "label"} <= set(out.columns)
    flagged = out[out.label == 1]
    assert ((flagged.left_ind <= 150) & (flagged.right_ind >= 150)).any()


def test_pipeline_save_load_round_trip(spark, tmp_path):
    """save_fitted_pipeline/load_fitted_pipeline analogue: a saved config
    rebuilds a pipeline that produces identical results."""
    from tods_spark.api import load_pipeline, save_pipeline

    cfg = {
        "keys": ["source"], "order_col": "timestamp",
        "timeseries_processing": [{"op": "moving_average", "cols": ["value"]}],
        "feature_analysis": [],
        "detection": {"score_col": "value_moving_average",
                      "contamination": 0.1},
    }
    pdf = pd.DataFrame({
        "source": "s1", "timestamp": np.arange(40.0),
        "value": np.sin(np.arange(40) / 3.0),
    })
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "pipe.json")
    save_pipeline(cfg, path)
    a = build_pipeline(cfg)(df).orderBy("timestamp").toPandas()
    b = load_pipeline(path)(df).orderBy("timestamp").toPandas()
    pd.testing.assert_frame_equal(a, b)
