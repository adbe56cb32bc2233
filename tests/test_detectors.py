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


def test_quadratic_kernel_group_guard(spark):
    """The O(m²) kernels refuse an unbounded group with a re-keying hint
    instead of building an m×m distance matrix (scale contract)."""
    n = 50
    pdf = pd.DataFrame({"timestamp": range(n), "value": np.sin(np.arange(n))})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="max_group_size.*re-key"):
        DET.detect(sdf, "value", "knn", window_size=5,
                   max_group_size=10).count()
    # linear kernels are not guarded by default
    assert DET.detect(sdf, "value", "autoreg", window_size=5).count() > 0
    # and an explicitly raised guard admits the group
    assert DET.detect(sdf, "value", "knn", window_size=5,
                      max_group_size=1000).count() > 0


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


def test_lof_finds_planted_spike(spark):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    out = (
        DET.detect(spark.createDataFrame(pdf), "value", "lof",
                   window_size=12, contamination=0.02)
        .orderBy("seg_id")
        .toPandas()
    )
    flagged = out[out.label == 1]
    assert len(flagged) > 0
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any()


def test_lof_matches_hand_computed():
    """LOF on a planar fixture with one clear outlier: inliers in a tight
    cluster score ~1, the far point scores >> 1; exact values checked
    against a literal implementation of the Breunig et al. definitions."""
    # window_size=1 makes windows the points themselves
    x = np.array([0.0, 0.1, 0.2, 0.05, 0.15, 5.0])
    scores, lefts = DET.lof_scores(x, window_size=1, step=1, n_neighbors=2)
    np.testing.assert_array_equal(lefts, np.arange(6))

    # literal reference implementation
    pts = x[:, None]
    d = np.abs(pts - pts.T).astype(float)
    np.fill_diagonal(d, np.inf)
    k = 2
    kdist = np.sort(d, axis=1)[:, k - 1]
    ref = np.empty(6)
    for p in range(6):
        nb = np.where(d[p] <= kdist[p] + 1e-12)[0]
        lrd_p = len(nb) / sum(max(kdist[o], d[p, o]) for o in nb)
        lrds = []
        for o in nb:
            nb_o = np.where(d[o] <= kdist[o] + 1e-12)[0]
            lrds.append(len(nb_o) / sum(max(kdist[q], d[o, q]) for q in nb_o))
        ref[p] = np.mean(lrds) / lrd_p
    np.testing.assert_allclose(scores, ref, rtol=1e-9)
    assert scores[-1] > 5 and (scores[:-1] < 2).all()


def test_iforest_finds_planted_spike(spark):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    out = (
        DET.detect(spark.createDataFrame(pdf), "value", "iforest",
                   window_size=12, contamination=0.02)
        .orderBy("seg_id")
        .toPandas()
    )
    flagged = out[out.label == 1]
    assert len(flagged) > 0
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any()


def test_iforest_score_properties():
    """iForest invariants: scores in (0,1); an isolated far point scores
    higher than clustered points; deterministic for a fixed seed."""
    rng = np.random.default_rng(2)
    x = np.concatenate([rng.normal(0, 0.1, 120), [25.0], rng.normal(0, 0.1, 40)])
    s1, lefts = DET.iforest_scores(x, window_size=1, step=1, n_trees=50)
    s2, _ = DET.iforest_scores(x, window_size=1, step=1, n_trees=50)
    np.testing.assert_array_equal(s1, s2)
    assert (s1 > 0).all() and (s1 < 1).all()
    assert s1[120] > s1[:120].max() and s1[120] > s1[121:].max()


@pytest.mark.parametrize("method", ["abod", "loda"])
def test_abod_loda_find_planted_spike(spark, method):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    out = (
        DET.detect(spark.createDataFrame(pdf), "value", method,
                   window_size=12, contamination=0.02)
        .orderBy("seg_id")
        .toPandas()
    )
    flagged = out[out.label == 1]
    assert len(flagged) > 0
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any()


def test_abod_outlier_has_low_angle_variance():
    """The geometric invariant: a point far outside a cluster sees its
    neighbors under a narrow cone (small angle variance → highest −var
    score)."""
    rng = np.random.default_rng(4)
    x = np.concatenate([rng.normal(0, 0.1, 60), [30.0]])
    s, _ = DET.abod_scores(x, window_size=1, step=1, n_neighbors=8)
    assert s[-1] == s.max()


def test_loda_deterministic_and_flags_outlier():
    rng = np.random.default_rng(6)
    x = np.concatenate([rng.normal(5, 0.5, 100), [50.0], rng.normal(5, 0.5, 50)])
    s1, _ = DET.loda_scores(x, window_size=1, step=1)
    s2, _ = DET.loda_scores(x, window_size=1, step=1)
    np.testing.assert_array_equal(s1, s2)
    assert s1[100] == s1.max()


def test_ae_scores_equal_pca_residual():
    """Linear-AE score == Euclidean residual from the top-k principal
    subspace of the standardized windows (hand-computed fixture), and the
    planted spike surfaces as the top score."""
    x = _series_with_spike(seed=11)
    scores, lefts = DET.ae_scores(x, window_size=10, n_components=2)
    mat = np.stack([x[i : i + 10] for i in range(len(x) - 9)])
    mu, sd = mat.mean(0), mat.std(0)
    Z = (mat - mu) / sd
    _, _, vt = np.linalg.svd(Z, full_matrices=False)
    R = Z - (Z @ vt[:2].T) @ vt[:2]
    np.testing.assert_allclose(scores, np.sqrt((R**2).sum(1)), rtol=1e-9)
    top = scores.argmax()
    assert lefts[top] <= 200 <= lefts[top] + 10


def test_cblof_small_cluster_scores():
    """CBLOF (use_weights=False): points in the large cluster score their
    own-centroid distance; the isolated small-cluster point scores its
    distance to the nearest LARGE centroid."""
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.normal(0, 0.05, 200), [30.0], rng.normal(0, 0.05, 40)])
    scores, lefts = DET.cblof_scores(x, window_size=1, n_clusters=4, seed=0)
    # windows containing the 30.0 point are the far small cluster
    spike = np.where(lefts == 200)[0][0]
    assert scores[spike] == scores.max()
    assert scores[spike] > 20  # ~ distance from 30 to the dense centroid
    assert np.median(scores) < 1.0  # dense points score own-center distance


def test_cof_matches_independent_sbn_trail():
    """COF parity vs an independent greedy set-based-nearest-trail builder
    (different construction: incremental set expansion with explicit min
    tracking, not the argsort-path formula)."""
    rng = np.random.default_rng(7)
    X = np.concatenate([rng.normal(0, 1, 40), [12.0], rng.normal(0, 1, 10)])
    scores, lefts = DET.cof_scores(X, window_size=1, n_neighbors=5)

    mat = X.reshape(-1, 1)
    m, k = len(mat), 5
    d = np.abs(mat - mat.T)
    ac = np.empty(m)
    nbrs = []
    for i in range(m):
        order = np.argsort(d[i], kind="stable")[: k + 1]
        nbrs.append(order[1:])
        trail = [order[0]]
        total = 0.0
        for j, nxt in enumerate(order[1:], start=1):
            edge = min(d[nxt][t] for t in trail)
            total += (2.0 * (k + 1 - j) / ((k + 1) * k)) * edge
            trail.append(nxt)
        ac[i] = total
    exp = np.array([ac[i] * k / ac[nbrs[i]].sum() for i in range(m)])
    np.testing.assert_allclose(scores, exp, rtol=1e-9)
    assert scores[40] == scores.max()  # planted outlier


def test_ae_cblof_cof_detect_spark(spark):
    """The three new cores run through detect() end-to-end and flag the
    planted spike."""
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    sdf = spark.createDataFrame(pdf)
    for method in ("ae", "cblof", "cof"):
        out = DET.detect(sdf, "value", method, window_size=12,
                         contamination=0.02).toPandas()
        flagged = out[out.label == 1]
        assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any(), method


def test_multivariate_detect_combines_dimensions(spark):
    """MultiAutoRegOD semantics: per-dimension scores are z-standardized
    (MultiAutoRegOD.py:150-152, combo standardizer) and the combined score
    equals the weighted average (resp. max / median) of the standardized
    per-dimension univariate scores."""
    x = _series_with_spike(seed=3)
    y = _series_with_spike(seed=8, spike_at=120)
    pdf = pd.DataFrame({"timestamp": range(len(x)), "a": x, "b": y})
    sdf = spark.createDataFrame(pdf)

    sa, lefts = DET.autoreg_scores(x, 10, 1)
    sb, _ = DET.autoreg_scores(y, 10, 1)
    sa = (sa - sa.mean()) / sa.std()
    sb = (sb - sb.mean()) / sb.std()
    for comb, exp in [
        ("average", 0.25 * sa + 0.75 * sb),
        ("maximization", np.maximum(sa, sb)),
        ("median", np.median(np.stack([sa, sb]), axis=0)),
    ]:
        out = (
            DET.detect_multivariate(
                sdf, ["a", "b"], "autoreg", window_size=10,
                combination=comb,
                weights=[1, 3] if comb == "average" else None,
            )
            .orderBy("seg_id").toPandas()
        )
        np.testing.assert_allclose(out["score"], exp, rtol=1e-9, err_msg=comb)
        th = np.percentile(exp, 90)
        np.testing.assert_allclose(out["threshold"].iloc[0], th, rtol=1e-9)


def test_sod_matches_independent_reimplementation():
    """SOD parity vs an independent per-point set-based construction
    (python set intersections for SNN, explicit loops — not the boolean
    matrix-multiply the kernel uses)."""
    rng = np.random.default_rng(11)
    X = np.concatenate([rng.normal(0, 1, 50), [9.0], rng.normal(0, 1, 9)])
    k, r, alpha = 10, 5, 0.8
    scores, lefts = DET.sod_scores(X, window_size=1, n_neighbors=k,
                                   ref_set=r, alpha=alpha)

    mat = X.reshape(-1, 1)
    m, w = mat.shape
    d = np.abs(mat - mat.T) ** 2
    np.fill_diagonal(d, np.inf)
    knn = [set(np.argsort(d[i], kind="stable")[:k].tolist()) for i in range(m)]
    exp = np.empty(m)
    for i in range(m):
        sims = np.array(
            [len(knn[i] & knn[j]) if j != i else -1 for j in range(m)]
        )
        top = sorted(range(m), key=lambda j: (-sims[j], j))[:r]
        ref = mat[top]
        means = ref.mean(0)
        variances = (ref**2).mean(0) - means**2
        rel = variances < alpha * variances.sum() / w
        if rel.sum() == 0:
            exp[i] = 0.0
        else:
            exp[i] = np.sqrt(((mat[i] - means)[rel] ** 2).sum() / rel.sum())
    np.testing.assert_allclose(scores, exp, rtol=1e-12)
    assert scores[50] == scores.max()  # planted outlier


def test_sod_detect_spark(spark):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    sdf = spark.createDataFrame(pdf)
    out = DET.detect(sdf, "value", "sod", window_size=12,
                     contamination=0.02).toPandas()
    flagged = out[out.label == 1]
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any()


def test_ocsvm_dual_kkt_and_planted_outlier():
    """Projected-gradient OCSVM: the solution satisfies the dual
    constraints (box + simplex), margin SVs sit near the decision
    boundary (KKT), and the planted far point scores highest."""
    rng = np.random.default_rng(13)
    X = np.concatenate([rng.normal(0, 1, 120), [14.0], rng.normal(0, 1, 30)])
    scores, lefts = DET.ocsvm_scores(X, window_size=1, nu=0.5)
    assert scores[120] == scores.max()

    # re-derive the dual internals to check KKT on the same problem
    mat = X.reshape(-1, 1)
    m = len(mat)
    var = mat.var(); gamma = 1.0 / (1 * var)
    d2 = (mat - mat.T) ** 2
    Q = np.exp(-gamma * d2)
    cap = 1.0 / (0.5 * m)
    alpha = np.full(m, 1.0 / m)
    L = float(np.abs(Q).sum(axis=1).max())
    for _ in range(300):
        alpha = DET._project_capped_simplex(alpha - (1.0 / L) * (Q @ alpha), cap)
    assert abs(alpha.sum() - 1.0) < 1e-9
    assert alpha.min() >= -1e-12 and alpha.max() <= cap + 1e-12
    f = Q @ alpha
    margin = (alpha > 1e-10) & (alpha < cap - 1e-10)
    if margin.any():
        # margin SVs share (approximately) the same decision value rho
        assert f[margin].std() < 1e-2 * max(abs(f[margin].mean()), 1e-12) + 1e-4


def test_ocsvm_deterministic_and_spark(spark):
    x = _series_with_spike()
    s1, _ = DET.ocsvm_scores(x, window_size=12)
    s2, _ = DET.ocsvm_scores(x, window_size=12)
    np.testing.assert_array_equal(s1, s2)
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    sdf = spark.createDataFrame(pdf)
    out = DET.detect(sdf, "value", "ocsvm", window_size=12,
                     contamination=0.02).toPandas()
    flagged = out[out.label == 1]
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any()


def test_capped_simplex_projection_is_optimal():
    """Variational inequality check: p = proj(v) satisfies
    (v - p)·(q - p) <= 0 for every feasible q — with random feasible
    points this certifies p is the Euclidean projection."""
    rng = np.random.default_rng(21)
    for _ in range(20):
        m = rng.integers(3, 40)
        cap = float(rng.uniform(1.5 / m, 3.0 / m))
        v = rng.normal(0, 1, m)
        p = DET._project_capped_simplex(v, cap)
        assert abs(p.sum() - 1.0) < 1e-9
        assert p.min() >= -1e-12 and p.max() <= cap + 1e-12
        for _ in range(30):
            q = rng.uniform(0, cap, m)
            q = q / q.sum()
            if q.max() > cap:  # renormalization may exceed the cap
                continue
            assert float((v - p) @ (q - p)) <= 1e-8


def test_gbdt_separates_and_reduces_loss():
    """The deterministic GBDT drives logistic loss down monotonically on
    a separable problem and ranks the positive class on top."""
    rng = np.random.default_rng(31)
    X = np.vstack([rng.normal(0, 1, (80, 3)), rng.normal(4, 1, (20, 3))])
    y = np.concatenate([np.zeros(80), np.ones(20)])

    def logloss(margin):
        p = 1.0 / (1.0 + np.exp(-margin))
        p = np.clip(p, 1e-12, 1 - 1e-12)
        return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())

    losses = []
    margin = np.zeros(len(y))
    for _ in range(20):
        p = 1.0 / (1.0 + np.exp(-margin))
        tree = DET._gbdt_tree_fit(X, p - y, p * (1 - p), 3, 1.0)
        margin = margin + 0.3 * DET._gbdt_tree_predict(tree, X)
        losses.append(logloss(margin))
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
    full = DET.gbdt_fit_predict(X, y, n_rounds=20)
    # every positive outranks every negative on separable data
    assert full[y == 1].min() > full[y == 0].max()
    np.testing.assert_array_equal(full, DET.gbdt_fit_predict(X, y, n_rounds=20))


def test_xgbod_uses_supervision_to_beat_weak_features(spark):
    """XGBOD with point labels pinpoints the labeled anomaly; the run
    through detect_supervised flags the planted window."""
    x = _series_with_spike()
    labels = np.zeros(len(x))
    labels[200] = 1.0
    scores, lefts = DET.xgbod_scores(x, labels, window_size=12)
    top = scores.argmax()
    assert lefts[top] <= 200 <= lefts[top] + 12

    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x,
                        "lab": labels})
    sdf = spark.createDataFrame(pdf)
    out = DET.detect_supervised(sdf, "value", "lab", window_size=12,
                                contamination=0.05).toPandas()
    flagged = out[out.label == 1]
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any()


def test_lstmod_learns_and_flags_spike():
    """The numpy LSTM forecaster trains (loss on a predictable signal
    drops well below the naive mean-predictor baseline) and the planted
    spike has the largest residual."""
    rng = np.random.default_rng(41)
    t = np.arange(260)
    x = np.sin(t / 6.0) * 5 + rng.normal(0, 0.2, len(t))
    x[200] += 12.0
    scores, lefts = DET.lstmod_scores(x, window_size=12)
    top = scores.argmax()
    assert lefts[top] <= 200 <= lefts[top] + 12
    # predictability: median residual far below series std (mean predictor)
    assert np.median(scores) < 0.5 * x.std()
    s2, _ = DET.lstmod_scores(x, window_size=12)
    np.testing.assert_array_equal(scores, s2)


def test_telemanom_threshold_isolates_anomalous_errors():
    """The dynamic threshold lands between the normal error mass and the
    planted extreme errors (Hundman et al. selection rule)."""
    rng = np.random.default_rng(43)
    e = np.abs(rng.normal(0, 1, 500))
    e[100], e[300] = 15.0, 18.0
    th = DET.telemanom_threshold(e)
    assert e[e >= th].size == 2  # exactly the planted anomalies
    assert th > np.percentile(e, 99) * 0.5


def test_lstmod_detect_spark(spark):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    sdf = spark.createDataFrame(pdf)
    out = DET.detect(sdf, "value", "lstmod", window_size=12,
                     contamination=0.02).toPandas()
    flagged = out[out.label == 1]
    assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any()
    out2 = DET.detect(sdf, "value", "lstmod", window_size=12,
                      thresholding="telemanom").toPandas()
    assert (out2.threshold > 0).all()


def test_deeplog_learns_cyclic_key_grammar():
    """On a strictly cyclic key sequence with one corrupted step, the
    trained next-key model assigns near-1 probability to the lawful next
    key and the corrupted position has the top anomaly score."""
    seq = np.tile([0, 1, 2, 3], 80).astype(int)
    seq[201] = 0  # corrupt: lawful value at 201 is (201 % 4) = 1
    scores, lefts = DET.deeplog_scores(seq, window_size=8)
    top = scores.argmax()
    assert lefts[top] + 8 == 201  # the window whose NEXT key is corrupted
    # lawful steps are confidently predicted
    lawful = np.delete(scores, np.where(lefts + 8 == 201))
    assert np.median(lawful) < 0.05
    s2, _ = DET.deeplog_scores(seq, window_size=8)
    np.testing.assert_array_equal(scores, s2)


def test_deeplog_detect_sequence_spark(spark):
    seq = np.tile([0, 1, 2], 60).astype(int)
    seq[90] = 2  # out-of-grammar
    pdf = pd.DataFrame({"timestamp": range(len(seq)),
                        "k": [f"key{v}" for v in seq],
                        "grp": "g"})
    sdf = spark.createDataFrame(pdf)
    out = DET.detect_sequence(sdf, "k", window_size=6, keys=["grp"],
                              order_cols=["timestamp"],
                              contamination=0.05).toPandas()
    flagged = out[out.label == 1]
    assert ((flagged.left_ind + 6) == 90).any()


def test_dagmm_energy_flags_spike_and_is_deterministic():
    """DAGMM closed-form core: the spike window carries the top mixture
    energy, and repeated fits are bitwise identical (strided k-means init
    + fixed EM iterations, no RNG)."""
    x = _series_with_spike()
    s, lefts = DET.dagmm_scores(x, 12)
    s2, _ = DET.dagmm_scores(x, 12)
    np.testing.assert_array_equal(s, s2)
    top = lefts[np.argsort(s)[-6:]]
    assert any(l <= 200 < l + 12 for l in top)


def test_vae_ppca_nll_flags_spike_and_is_deterministic():
    """pPCA marginal NLL (the linear-VAE optimum): spike window has top
    score; deterministic (single SVD, no sampling)."""
    x = _series_with_spike()
    s, lefts = DET.vae_scores(x, 12)
    s2, _ = DET.vae_scores(x, 12)
    np.testing.assert_array_equal(s, s2)
    top = lefts[np.argsort(s)[-6:]]
    assert any(l <= 200 < l + 12 for l in top)


def test_dagmm_vae_detect_spark(spark):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    sdf = spark.createDataFrame(pdf)
    for method in ("dagmm", "vae"):
        out = DET.detect(sdf, "value", method, window_size=12,
                         contamination=0.02).toPandas()
        flagged = out[out.label == 1]
        assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any(), method


def test_sogaal_mogaal_flag_spike_and_are_deterministic():
    """GAAL pair: repeated fits are bitwise identical (seeded numpy GAN,
    full-batch Adam) and the spike window reaches the top of the
    1 − D(x) score ranking."""
    x = _series_with_spike()
    for core in (DET.sogaal_scores, DET.mogaal_scores):
        s, lefts = core(x, 12)
        s2, _ = core(x, 12)
        np.testing.assert_array_equal(s, s2)
        top = lefts[np.argsort(s)[-6:]]
        assert any(l <= 200 < l + 12 for l in top), core.__name__


def test_sogaal_detect_spark(spark):
    x = _series_with_spike()
    pdf = pd.DataFrame({"timestamp": range(len(x)), "value": x})
    sdf = spark.createDataFrame(pdf)
    for method in ("sogaal", "mogaal"):
        out = DET.detect(sdf, "value", method, window_size=12,
                         contamination=0.02).toPandas()
        flagged = out[out.label == 1]
        assert ((flagged.left_ind <= 200) & (flagged.right_ind >= 200)).any(), method


def test_gan_discriminator_backprop_matches_finite_differences():
    """The hand-written BCE backprop used by detectors._gan_train's
    discriminator step (transcribed expressions: dz2 = (p-y)/n, relu
    mask, layer-1 chain) agrees with central finite differences of the
    BCE loss to ~1e-9 — guards the gradient derivation itself, the part
    a spike test can't distinguish from luck."""
    rng = np.random.default_rng(3)
    m, d, hd = 12, 4, 5
    Z = rng.normal(0, 1, (m, d))
    W1, b1 = rng.normal(0, 0.5, (d, hd)), rng.normal(0, 0.1, hd)
    W2, b2 = rng.normal(0, 0.5, (hd, 1)), rng.normal(0, 0.1, 1)
    y = np.concatenate([np.ones(m // 2), np.zeros(m - m // 2)])

    def loss(W1, b1, W2, b2):
        H = np.maximum(Z @ W1 + b1, 0.0)
        p = 1.0 / (1.0 + np.exp(-(H @ W2 + b2).ravel()))
        return -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()

    H = np.maximum(Z @ W1 + b1, 0.0)
    p = 1.0 / (1.0 + np.exp(-(H @ W2 + b2).ravel()))
    dz2 = ((p - y) / m)[:, None]
    gW2 = H.T @ dz2
    dH = (dz2 @ W2.T) * (H > 0)
    gW1 = Z.T @ dH

    eps = 1e-6
    for G, W, setter in (
        (gW1, W1, lambda Wv: loss(Wv, b1, W2, b2)),
        (gW2, W2, lambda Wv: loss(W1, b1, Wv, b2)),
    ):
        num = np.zeros_like(W)
        for idx in np.ndindex(W.shape):
            Wp, Wm = W.copy(), W.copy()
            Wp[idx] += eps
            Wm[idx] -= eps
            num[idx] = (setter(Wp) - setter(Wm)) / (2 * eps)
        np.testing.assert_allclose(num, G, atol=1e-8)
