"""Pipeline-builder API — the engine analogue of the reference's
``build_pipeline(config)`` / sk_interface entry points (tods/utils.py:187-279;
tods/sk_interface/base.py:23-75; SURVEY.md §3 entry points B/C).

The reference assembles a D3M pipeline JSON (dataset_to_dataframe →
column_parser → extract_columns → [timeseries_processing…] →
[feature_analysis…] → one detection stage → construct_predictions) and
executes it eagerly step by step. Here a config maps to a CHAIN OF LAZY
DATAFRAME TRANSFORMS — the "pipeline" IS the Catalyst logical plan, and
Catalyst's optimizer replaces the reference's (absent) planner.

    pipe = build_pipeline({
        "keys": ["source"], "order_col": "ts",
        "timeseries_processing": [
            {"op": "moving_average", "cols": ["value"]},
            {"op": "smoothing", "method": "holt_smoothing", "cols": ["value"]},
        ],
        "feature_analysis": [
            {"op": "stat_window", "stat": "mean", "cols": ["value"], "window_size": 5},
            {"op": "spectral", "method": "spectral_residual", "cols": ["value"]},
        ],
        "detection": {"score_col": "value_mean", "contamination": 0.1},
    })
    labeled = pipe(df)        # lazy; one optimized plan end to end

Default stages mirror the reference's defaults (statistical_maximum +
threshold detection — tods/utils.py:46-53) when a stage list is omitted.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

from tods_spark.operators import (
    decompose,
    detection,
    gapfill,
    segmentation,
    smoothing,
    spectral,
    validation,
    windows,
)

DEFAULT_FEATURE = {"op": "stat_window", "stat": "maximum", "window_size": 3}


def _stage(cfg: dict, keys, order_col):
    op = cfg["op"]
    cols = cfg.get("cols", ["value"])
    if op == "moving_average":
        return lambda df: windows.moving_average(df, cols, keys=keys,
                                                 order_col=order_col)
    if op == "stat_window":
        return lambda df: windows.stat_window(
            df, cols, cfg.get("stat", "mean"),
            window_size=cfg.get("window_size", 3), keys=keys,
            order_col=order_col, threshold=cfg.get("threshold", 0.0),
        )
    if op == "smoothing":
        return lambda df: smoothing.smooth(
            df, cols, cfg.get("method", "simple_exponential_smoothing"),
            keys=keys, order_col=order_col,
        )
    if op == "spectral":
        return lambda df: spectral.spectral_transform(
            df, cols, cfg.get("method", "spectral_residual"), keys=keys,
            order_col=order_col,
        )
    if op == "decompose":
        return lambda df: decompose.seasonal_decompose(
            df, cols[0], cfg.get("period", 3), keys=keys, order_col=order_col
        )
    if op == "scale":
        return lambda df: decompose.standard_scale(df, cols, keys=keys)
    if op == "segment":
        return lambda df: segmentation.segment_sql(
            df, cols, cfg.get("window_size", 3), cfg.get("step", 1),
            keys=keys, order_col=order_col,
        )
    if op == "dedup":
        return lambda df: validation.dedup_timestamps(
            df, ts_col=order_col, keep=cfg.get("keep", "first"),
            value_cols=tuple(cols), keys=tuple(keys),
        )
    if op == "gap_fill":
        return lambda df: gapfill.continuity_impute(
            df, ts_col=order_col, value_cols=tuple(cols),
            label_col=cfg.get("label_col"), interval=cfg.get("interval", 1.0),
            keys=tuple(keys),
        )
    if op == "sort":
        return lambda df: validation.sort_by_time(df, ts_col=order_col,
                                                  keys=tuple(keys))
    raise ValueError(f"unknown pipeline op {op!r}")


def save_pipeline(config: dict, path: str) -> None:
    """Persist a pipeline as its config JSON — the engine analogue of the
    reference's save_fitted_pipeline (tods/utils.py:432-482, joblib of the
    fitted runtime). A Catalyst pipeline is a PLAN, not a fitted model, so
    the config (plus the engine version executing it) IS the artifact;
    per-partition state lives in the checkpoint table, not the pipeline."""
    import json
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"format": "tods_spark.pipeline/1", "config": config}, f,
                  indent=2, sort_keys=True)


def load_pipeline(path: str):
    """Rebuild the callable pipeline from a saved config
    (load_fitted_pipeline analogue, tods/utils.py:484-537)."""
    import json

    with open(path) as f:
        doc = json.load(f)
    if doc.get("format") != "tods_spark.pipeline/1":
        raise ValueError(f"not a tods_spark pipeline file: {path}")
    return build_pipeline(doc["config"])


def build_pipeline(config: dict):
    """config → callable(DataFrame) → DataFrame (lazy, single plan)."""
    keys = config.get("keys", [])
    order_col = config.get("order_col", "timestamp")
    stages = []
    for cfg in config.get("timeseries_processing", []):
        stages.append(_stage(cfg, keys, order_col))
    # default stage only when the key is ABSENT (an explicit [] means none)
    feats = config.get("feature_analysis")
    if feats is None:
        feats = [DEFAULT_FEATURE]
    for cfg in feats:
        stages.append(_stage(cfg, keys, order_col))
    det = config.get("detection")
    if det:
        method = det.get("method")
        if method:
            # a detector CORE as the detection stage (the reference's
            # default pipeline ends in pyod_ae — method="ae" here)
            from tods_spark.operators import detectors

            stages.append(
                lambda df: detectors.detect(
                    df, det.get("value_col", det.get("score_col", "value")),
                    method,
                    window_size=det.get("window_size", 10),
                    contamination=det.get("contamination", 0.1),
                    keys=keys, order_col=order_col,
                    **det.get("params", {}),
                )
            )
        else:
            stages.append(
                lambda df: detection.scores_to_labels(
                    df, score_col=det["score_col"],
                    contamination=det.get("contamination", 0.1),
                    keys=keys or None,
                )
            )

    def pipeline(df: DataFrame) -> DataFrame:
        return reduce(lambda acc, fn: fn(acc), stages, df)

    return pipeline
