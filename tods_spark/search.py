"""Brute-force pipeline search — the engine analogue of the reference's
AutoML entry point D (tods/searcher/brute_force_search.py:10-75 +
primitive_python_paths grid, :79-157).

The reference enumerates the cross-product of primitive choices
(timeseries_processing × feature_analysis × detection_algorithm ×
contamination), evaluates each assembled D3M pipeline on labeled data, and
ranks by the negated first metric (_rank_first_metric, :159-167; errored
pipelines rank 1 = worst). Here each candidate is a `build_pipeline`
config — one lazy Catalyst plan — and scoring is one confusion-matrix
aggregate (`detection.evaluate_labels`), so a search over N configs costs
N small Spark jobs and zero driver-side data movement.

Row alignment for windowed detector cores follows the reference's
convention (e.g. MultiAutoRegOD.py:157-159: window scores are prepended
with `window_size` zeros to land back in row space), i.e. row rn carries
the label of the window with left index rn − window_size; rows before the
first full window are labeled 0.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window, functions as F

from tods_spark.api import build_pipeline
from tods_spark.operators import detection

# a compact engine-native default mirroring the reference grid's shape
# (primitive_python_paths): smoothing choices × window-stat choices ×
# detector choices × contamination grid
DEFAULT_SPACE = {
    "timeseries_processing": [
        [],
        [{"op": "moving_average", "cols": ["value"]}],
    ],
    "feature_analysis": [
        [{"op": "stat_window", "stat": "mean", "cols": ["value"],
          "window_size": 5}],
        [{"op": "stat_window", "stat": "std", "cols": ["value"],
          "window_size": 5}],
    ],
    "detection": [
        {"score_col": "value_mean"},   # threshold rule on the feature
        {"method": "autoreg", "value_col": "value", "window_size": 10},
        {"method": "knn", "value_col": "value", "window_size": 10},
    ],
    "contamination": [0.05, 0.1],
}


def generate_configs(space: dict | None = None) -> list[dict]:
    """Cross-product of the stage choices → build_pipeline configs.
    Detection entries naming a score_col are paired only with feature
    stages that produce that column (the reference's assembler likewise
    wires the detector to the previous step's output)."""
    space = space or DEFAULT_SPACE
    configs = []
    for ts, feat, det, cont in itertools.product(
        space["timeseries_processing"], space["feature_analysis"],
        space["detection"], space["contamination"],
    ):
        det = dict(det)
        det["contamination"] = cont
        if "score_col" in det and not any(
            f"{c}_{f.get('stat', '')}" == det["score_col"]
            for f in feat if f.get("op") == "stat_window"
            for c in f.get("cols", [])
        ):
            continue
        configs.append({
            "timeseries_processing": list(ts),
            "feature_analysis": list(feat),
            "detection": det,
        })
    return configs


def _row_space_labels(out: DataFrame, det: dict, keys: list[str],
                      order_col: str) -> DataFrame:
    """Predicted labels per input row. Threshold detection is already
    row-aligned; windowed cores map window left_ind → row left_ind + w
    (reference zero-padding convention), earlier rows predict 0."""
    if "method" not in det:
        return out.select(*keys, order_col, F.col("label").alias("pred"))
    w = det.get("window_size", 10)
    return out.select(
        *keys,
        (F.col("left_ind") + w).alias("__rn__"),
        F.col("label").alias("pred"),
    )


def evaluate_pipeline(
    df: DataFrame,
    config: dict,
    truth_col: str,
    metric: str = "f1_macro",
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> dict:
    """Reference entry point A (`evaluate_pipeline(dataset, pipeline,
    metric)`, README.md:64-84): run ONE pipeline config on labeled data and
    return its score — the single-pipeline form of brute_force_search, same
    row alignment and ranking conventions."""
    res = brute_force_search(
        df, truth_col,
        space={"timeseries_processing": [config.get("timeseries_processing", [])],
               "feature_analysis": [config.get("feature_analysis", [])],
               "detection": [dict(config["detection"])],
               "contamination": [config["detection"].get("contamination", 0.1)]},
        metric=metric, keys=keys, order_col=order_col,
    )
    return res[0]


def brute_force_search(
    df: DataFrame,
    truth_col: str,
    space: dict | None = None,
    metric: str = "f1_macro",
    keys: list[str] | None = None,
    order_col: str = "timestamp",
    max_pipelines: int | None = None,
) -> list[dict]:
    """Evaluate every config in the space on labeled data; return
    [{config, status, score, rank}] sorted best-first (rank = −score,
    errored pipelines rank 1 — _rank_first_metric semantics)."""
    keys = keys or []
    configs = generate_configs(space)
    if max_pipelines is not None:
        configs = configs[:max_pipelines]

    w_rn = Window.partitionBy(*keys).orderBy(order_col) if keys else (
        Window.orderBy(order_col)
    )
    base = df.withColumn("__rn__", F.row_number().over(w_rn) - 1)
    truth = base.select(*keys, "__rn__", F.col(truth_col).alias("__truth__"))

    results = []
    for cfg in configs:
        det = cfg["detection"]
        try:
            out = build_pipeline({**cfg, "keys": keys,
                                  "order_col": order_col})(df)
            if "method" in det:
                pred = _row_space_labels(out, det, keys, order_col)
                joined = truth.join(pred, [*keys, "__rn__"], "left")
            else:
                pred = out.select(*keys, order_col,
                                  F.col("label").alias("pred"))
                joined = truth.join(
                    base.select(*keys, "__rn__", order_col), [*keys, "__rn__"]
                ).join(pred, [*keys, order_col])
            labeled = joined.select(
                F.col("__truth__").alias("ground_truth"),
                F.coalesce("pred", F.lit(0)).alias("label"),
            )
            row = detection.evaluate_labels(labeled).collect()[0]
            score = float(row[metric])
            results.append({"config": cfg, "status": "COMPLETED",
                            "score": score, "rank": -score})
        except Exception as e:  # noqa: BLE001 — reference ranks errors worst
            results.append({"config": cfg, "status": "ERRORED",
                            "score": None, "rank": 1.0,
                            "error": f"{type(e).__name__}: {e}"})
    results.sort(key=lambda r: r["rank"])
    return results
