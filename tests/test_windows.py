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


def test_system_wise_voting_golden(spark):
    """Majority-voting reduction vs a literal numpy replay of
    SystemWiseDetection.py:376-415 (pad-to-longest, trailing |sum| windows,
    vote to argmax per step, order-statistic threshold)."""
    import numpy as np
    import pandas as pd

    from tods_spark.operators.detection import system_wise_voting

    rng = np.random.default_rng(11)
    series = {"s1": rng.normal(0, 1, 40), "s2": rng.normal(0, 3, 35),
              "s3": rng.normal(0, 1, 38)}
    pdf = pd.concat([
        pd.DataFrame({"system_id": k, "timestamp": range(len(v)), "score": v})
        for k, v in series.items()
    ], ignore_index=True)
    w, c = 4, 0.3
    got = (
        system_wise_voting(spark.createDataFrame(pdf), window_size=w,
                           contamination=c, method="sum")
        .orderBy("system_id").toPandas()
    )

    max_n = max(len(v) for v in series.values())
    mat = []
    for k in sorted(series):
        v = np.abs(series[k])
        padded = np.concatenate([v, np.full(max_n - len(v), v[-1])])
        mat.append([padded[i - w + 1:i + 1].sum()
                    for i in range(w - 1, max_n)])
    mat = np.asarray(mat)
    votes = (mat == mat.max(axis=0)[None, :]).astype(int).sum(axis=1)
    ranking = np.sort(votes)
    th = ranking[int((1 - c) * len(ranking))]
    exp_labels = (votes > th).astype(int)
    np.testing.assert_array_equal(got["votes"], votes)
    np.testing.assert_array_equal(got["label"], exp_labels)


def test_evaluate_labels_metric_block(spark):
    """P/R/F1/micro/macro/F-beta vs hand-computed sklearn formulas."""
    import pandas as pd

    from tods_spark.operators.detection import evaluate_labels

    truth = [1, 1, 1, 0, 0, 0, 0, 1]
    pred = [1, 0, 1, 1, 0, 0, 0, 0]
    pdf = pd.DataFrame({"ground_truth": truth, "label": pred})
    row = evaluate_labels(spark.createDataFrame(pdf), beta=2.0).collect()[0]
    # tp=2 fp=1 fn=2 tn=3
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (2, 1, 2, 3)
    p1, r1 = 2 / 3, 2 / 4
    p0, r0 = 3 / 5, 3 / 4
    f1_1 = 2 * p1 * r1 / (p1 + r1)
    f1_0 = 2 * p0 * r0 / (p0 + r0)
    assert abs(row["precision"] - p1) < 1e-12
    assert abs(row["recall"] - r1) < 1e-12
    assert abs(row["f1"] - f1_1) < 1e-12
    assert abs(row["f1_micro"] - 5 / 8) < 1e-12
    assert abs(row["f1_macro"] - (f1_1 + f1_0) / 2) < 1e-12
    b2 = 4.0
    fb = ((1 + b2) * p1 * r1 / (b2 * p1 + r1)
          + (1 + b2) * p0 * r0 / (b2 * p0 + r0)) / 2
    assert abs(row["f_beta"] - fb) < 1e-12


def test_hbos_density_scores(spark):
    """HBOS: a sample in a dense bin must score lower than one in a sparse
    bin; scores equal log2(1/(density+alpha)) exactly."""
    import numpy as np
    import pandas as pd

    from tods_spark.operators.detection import hbos_scores

    vals = np.concatenate([np.full(90, 5.0), np.array([100.0] * 2)])
    pdf = pd.DataFrame({"value": vals, "i": range(len(vals))})
    out = hbos_scores(spark.createDataFrame(pdf), "value", n_bins=10,
                      alpha=0.1).toPandas()
    lo, hi, n = 5.0, 100.0, 92
    width = (hi - lo) / 10
    dense = np.log2(1 / (90 / n / width + 0.1))
    sparse = np.log2(1 / (2 / n / width + 0.1))
    got = out.set_index("i")["hbos_score"]
    np.testing.assert_allclose(got.loc[0], dense, rtol=1e-12)
    np.testing.assert_allclose(got.loc[91], sparse, rtol=1e-12)
    assert sparse > dense


def test_hbos_constant_group_is_finite(spark):
    """A key group with constant values (hi == lo → zero bin width) gets
    np.histogram's unit-width single-bin semantics: density 1.0, score
    log2(1/(1+alpha)) — finite, not inf/null."""
    import numpy as np
    import pandas as pd

    from tods_spark.operators.detection import hbos_scores

    pdf = pd.DataFrame({
        "value": [7.0] * 5 + [1.0, 2.0, 3.0],
        "k": ["const"] * 5 + ["vary"] * 3,
    })
    out = hbos_scores(spark.createDataFrame(pdf), "value", keys=["k"],
                      n_bins=10, alpha=0.1).toPandas()
    const = out[out["k"] == "const"]["hbos_score"]
    assert np.isfinite(out["hbos_score"]).all()
    np.testing.assert_allclose(const, np.log2(1 / 1.1), rtol=1e-12)


def test_nmf_factorizes_and_reconstructs(spark):
    """NMF core: W,H non-negative, reconstruction error small on a true
    low-rank non-negative matrix; Spark windowed operator is deterministic
    and matches the local kernel."""
    import numpy as np
    import pandas as pd

    from tods_spark.operators.decompose import nmf_factorize, nmf_windows

    rng = np.random.default_rng(3)
    Wt = rng.uniform(0, 1, (40, 2))
    Ht = rng.uniform(0, 1, (2, 8))
    V = Wt @ Ht
    W, H = nmf_factorize(V, rank=2, n_iter=500)
    assert (W >= 0).all() and (H >= 0).all()
    rel = ((V - W @ H) ** 2).sum() / (V ** 2).sum()
    assert rel < 1e-3

    x = rng.uniform(0, 5, 60)
    pdf = pd.DataFrame({"timestamp": range(60), "value": x})
    out = (
        nmf_windows(spark.createDataFrame(pdf), "value", rank=2,
                    window_size=8, step=4)
        .orderBy("seg_id").toPandas()
    )
    # local replay: same windows, same seed → identical latent vectors
    lefts = np.arange(0, 60 - 8 + 1, 4)
    Vloc = np.stack([x[i:i + 8] for i in lefts])
    Wloc, _ = nmf_factorize(Vloc, 2)
    np.testing.assert_array_equal(out["left_ind"], lefts)
    np.testing.assert_allclose(out["row_latent_vector_0"], Wloc[:, 0], rtol=1e-12)
    np.testing.assert_allclose(out["row_latent_vector_1"], Wloc[:, 1], rtol=1e-12)


def test_trmf_descends_and_reconstructs(spark):
    """TRMF: objective strictly decreases under the gradient steps; a true
    low-rank AR(1) panel is recovered well enough to beat the mean
    baseline; Spark operator returns one embedding row per series and is
    deterministic vs the local kernel."""
    import numpy as np
    import pandas as pd

    from tods_spark.operators.trmf import (trmf_embed, trmf_factorize,
                                           trmf_objective)

    rng = np.random.default_rng(5)
    K, n, T = 2, 6, 120
    Xt = np.zeros((K, T))
    Xt[:, 0] = rng.standard_normal(K)
    for t in range(1, T):
        Xt[:, t] = 0.95 * Xt[:, t - 1] + 0.1 * rng.standard_normal(K)
    Ft = rng.standard_normal((n, K))
    Y = Ft @ Xt + 0.01 * rng.standard_normal((n, T))

    F0, X0, W0 = trmf_factorize(Y, max_iter=0)
    F1, X1, W1 = trmf_factorize(Y, max_iter=300)
    o0 = trmf_objective(Y, F0, X0, W0)
    o1 = trmf_objective(Y, F1, X1, W1)
    assert o1 < o0
    # reconstruction beats the per-series mean baseline
    sse = ((Y - F1 @ X1) ** 2).sum()
    sse_mean = ((Y - Y.mean(axis=1, keepdims=True)) ** 2).sum()
    assert sse < 0.5 * sse_mean

    # masked loss: NaNs don't poison the fit
    Ym = Y.copy()
    Ym[0, :10] = np.nan
    Fm, Xm, Wm = trmf_factorize(Ym, max_iter=100)
    assert np.isfinite(Fm).all() and np.isfinite(Xm).all()

    # Spark operator parity
    rows = []
    for s in range(n):
        for t in range(T):
            rows.append({"series": f"s{s}", "t": t, "v": Y[s, t]})
    out = (
        trmf_embed(spark.createDataFrame(pd.DataFrame(rows)), "v", "series",
                   order_col="t", max_iter=50)
        .orderBy("series").toPandas()
    )
    assert len(out) == n
    Floc, _, _ = trmf_factorize(Y, max_iter=50)
    np.testing.assert_allclose(out["series_latent_0"], Floc[:, 0], rtol=1e-9)
