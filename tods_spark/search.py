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


# ---------------------------------------------------------------------------
# Two-phase tuning searcher — engine analogue of the reference's
# RaySearcher (tods/searcher/searcher.py:55-140): phase 1 searches
# primitive COMBINATIONS (ray.tune over the primitive search space ==
# brute_force_search here), phase 2 samples HYPERPARAMETERS around the
# best primitive config (ray.tune num_samples == a seeded deterministic
# sampler here — no RNG service in the engine, so reproducibility wins
# over nevergrad parity, documented deviation).
# ---------------------------------------------------------------------------

#: default hyperparameter ranges per detection kind, mirroring the
#: reference's hyperparam_searchspace() which tunes the primitive's
#: TuningParameter fields around the phase-1 winner
DEFAULT_HYPERPARAM_SPACE = {
    "window_size": ("int", 5, 30),
    "contamination": ("float", 0.01, 0.25),
}


def _sample_hyperparams(space: dict, n: int, seed: int) -> list[dict]:
    """Deterministic stratified samples: each axis is swept over n evenly
    spaced quantiles with a seeded per-axis offset, then zipped with a
    seeded permutation per axis (a cheap latin-hypercube — covers every
    axis's range even at small n, and two runs with the same seed emit
    the same trials)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cols = {}
    for name, (kind, lo, hi) in space.items():
        q = (np.arange(n) + rng.uniform(0, 1, n)) / n
        q = q[rng.permutation(n)]
        vals = lo + q * (hi - lo)
        cols[name] = (
            np.rint(vals).astype(int) if kind == "int" else np.round(vals, 4)
        )
    return [
        {name: (int(v[i]) if v.dtype.kind == "i" else float(v[i]))
         for name, v in cols.items()}
        for i in range(n)
    ]


def tune_search(
    df: DataFrame,
    truth_col: str,
    space: dict | None = None,
    config: dict | None = None,
    hyperparam_space: dict | None = None,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> dict:
    """Two-phase search (searcher.py:68-140 semantics):

    phase 1 — exhaustive primitive-combination search over `space`
    (`use_all_combinations=True` ≡ the full cross-product grid;
    brute_force_search already ranks errored pipelines worst);

    phase 2 — unless `ignore_hyperparameters`, `num_samples`
    deterministic latin-hypercube samples of `hyperparam_space` applied
    to the phase-1 winner's detection stage, evaluated identically.

    `config` accepts the reference's knobs: num_samples (default 8),
    mode ('max' for scores like F1, 'min' for error metrics), metric,
    ignore_hyperparameters, plus an engine-side `seed`. Returns
    {best_config, best_score, phase1, phase2} — phase2 is [] when
    skipped."""
    cfg = {
        "num_samples": 8, "mode": "max", "metric": "f1_macro",
        "ignore_hyperparameters": False, "seed": 42,
    }
    cfg.update(config or {})
    sign = -1.0 if cfg["mode"] == "max" else 1.0

    phase1 = brute_force_search(
        df, truth_col, space=space, metric=cfg["metric"], keys=keys,
        order_col=order_col,
    )
    if cfg["mode"] == "min":
        done = [r for r in phase1 if r["status"] == "COMPLETED"]
        done.sort(key=lambda r: r["score"])
        phase1 = done + [r for r in phase1 if r["status"] != "COMPLETED"]
    best = next((r for r in phase1 if r["status"] == "COMPLETED"), None)
    if best is None:
        return {"best_config": None, "best_score": None,
                "phase1": phase1, "phase2": []}
    result = {"best_config": best["config"], "best_score": best["score"],
              "phase1": phase1, "phase2": []}
    det = best["config"]["detection"]
    if cfg["ignore_hyperparameters"] or "method" not in det:
        return result

    hspace = hyperparam_space or DEFAULT_HYPERPARAM_SPACE
    trials = _sample_hyperparams(hspace, cfg["num_samples"], cfg["seed"])
    phase2 = []
    for hp in trials:
        trial_det = {**det, **{k: v for k, v in hp.items()
                               if k != "contamination"}}
        trial_cfg = {
            **best["config"],
            "detection": {**trial_det,
                          "contamination": hp.get(
                              "contamination",
                              trial_det.get("contamination", 0.1))},
        }
        try:
            r = evaluate_pipeline(df, trial_cfg, truth_col,
                                  metric=cfg["metric"], keys=keys,
                                  order_col=order_col)
            phase2.append({"config": trial_cfg, "hyperparams": hp,
                           "status": r["status"], "score": r["score"],
                           "rank": sign * (r["score"] or 0.0)
                           if r["status"] == "COMPLETED" else 1.0})
        except Exception as e:  # noqa: BLE001 — rank errors worst
            phase2.append({"config": trial_cfg, "hyperparams": hp,
                           "status": "ERRORED", "score": None, "rank": 1.0,
                           "error": f"{type(e).__name__}: {e}"})
    # errored trials sort strictly after every completed one (the rank
    # sentinel 1.0 is an attainable completed rank — e.g. mode='min'
    # with a metric value of exactly 1.0 — so status breaks the tie)
    phase2.sort(key=lambda r: (r["status"] != "COMPLETED", r["rank"]))
    result["phase2"] = phase2
    top2 = next((r for r in phase2 if r["status"] == "COMPLETED"), None)
    if top2 is not None and (
        (cfg["mode"] == "max" and top2["score"] >= best["score"])
        or (cfg["mode"] == "min" and top2["score"] <= best["score"])
    ):
        result["best_config"] = top2["config"]
        result["best_score"] = top2["score"]
    return result
