"""Brute-force pipeline search (reference entry point D,
brute_force_search.py:10-75): grid enumeration, metric ranking, error
handling."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tods_spark.search import brute_force_search, generate_configs


def _labeled_series(n=400, seed=2):
    rng = np.random.default_rng(seed)
    v = np.sin(np.arange(n) / 7.0) * 2 + rng.normal(0, 0.15, n)
    truth = np.zeros(n, int)
    for pos in (120, 250, 330):
        v[pos] += 12.0
        truth[pos] = 1
    return pd.DataFrame({
        "source": "s1", "timestamp": np.arange(float(n)),
        "value": v, "is_anomaly": truth,
    })


def test_generate_configs_cross_product():
    cfgs = generate_configs()
    # score_col-style detection pairs only with the stat that produces it:
    # 2 ts × (1 feat for threshold + 2 feats × 2 cores) × 2 contaminations
    assert len(cfgs) == 2 * (1 + 4) * 2
    assert all({"timeseries_processing", "feature_analysis", "detection"}
               <= set(c) for c in cfgs)
    assert cfgs == generate_configs()  # deterministic enumeration


def test_search_ranks_by_metric_and_flags_errors(spark):
    df = spark.createDataFrame(_labeled_series())
    space = {
        "timeseries_processing": [[]],
        "feature_analysis": [
            [{"op": "stat_window", "stat": "mean", "cols": ["value"],
              "window_size": 3}],
        ],
        "detection": [
            {"method": "autoreg", "value_col": "value", "window_size": 10},
            {"score_col": "value_mean"},
            {"method": "no_such_core", "value_col": "value"},  # ERRORs
        ],
        "contamination": [0.01],
    }
    res = brute_force_search(df, "is_anomaly", space, keys=["source"],
                             order_col="timestamp")
    assert len(res) == 3
    # sorted best-first: completed pipelines before the errored one
    assert [r["rank"] for r in res] == sorted(r["rank"] for r in res)
    assert res[-1]["status"] == "ERRORED" and res[-1]["rank"] == 1.0
    completed = [r for r in res if r["status"] == "COMPLETED"]
    assert len(completed) == 2
    # the sparse-contamination detectors find the 3 planted anomalies well
    assert completed[0]["score"] > 0.6  # f1_macro >> chance
    assert completed[0]["score"] == -completed[0]["rank"]


def test_evaluate_pipeline_single_config(spark):
    """Entry point A: one config in, one scored result out."""
    from tods_spark.search import evaluate_pipeline

    df = spark.createDataFrame(_labeled_series())
    res = evaluate_pipeline(
        df,
        {"timeseries_processing": [],
         "feature_analysis": [],
         "detection": {"method": "autoreg", "value_col": "value",
                       "window_size": 10, "contamination": 0.01}},
        truth_col="is_anomaly", keys=["source"], order_col="timestamp",
    )
    assert res["status"] == "COMPLETED"
    assert res["score"] > 0.6


def test_tune_search_two_phase_improves_or_keeps_best(spark):
    """RaySearcher analogue (searcher.py:55-140): phase 1 picks the best
    primitive combination, phase 2 samples hyperparameters around it with
    a seeded deterministic sampler. The returned best_config must score at
    least as well as the phase-1 winner, and a re-run with the same seed
    must reproduce the identical trial list and scores."""
    from tods_spark.search import tune_search

    df = spark.createDataFrame(_labeled_series())
    space = {
        "timeseries_processing": [[]],
        "feature_analysis": [[]],
        "detection": [
            {"method": "autoreg", "value_col": "value", "window_size": 10},
        ],
        "contamination": [0.05],
    }
    cfg = {"num_samples": 4, "mode": "max", "metric": "f1_macro",
           "seed": 7}
    res = tune_search(df, "is_anomaly", space=space, config=cfg,
                      keys=["source"], order_col="timestamp")
    p1_best = next(r for r in res["phase1"] if r["status"] == "COMPLETED")
    assert res["best_score"] >= p1_best["score"]
    assert len(res["phase2"]) == 4
    hp = [t["hyperparams"] for t in res["phase2"]]
    assert all({"window_size", "contamination"} <= set(h) for h in hp)

    res2 = tune_search(df, "is_anomaly", space=space, config=cfg,
                       keys=["source"], order_col="timestamp")
    assert [t["hyperparams"] for t in res2["phase2"]] == hp
    assert [t["score"] for t in res2["phase2"]] == [
        t["score"] for t in res["phase2"]]


def test_tune_search_ignore_hyperparameters_skips_phase2(spark):
    from tods_spark.search import tune_search

    df = spark.createDataFrame(_labeled_series())
    res = tune_search(
        df, "is_anomaly",
        space={"timeseries_processing": [[]], "feature_analysis": [[]],
               "detection": [{"method": "autoreg", "value_col": "value",
                              "window_size": 10}],
               "contamination": [0.05]},
        config={"ignore_hyperparameters": True},
        keys=["source"], order_col="timestamp",
    )
    assert res["phase2"] == []
    assert res["best_config"]["detection"]["method"] == "autoreg"
