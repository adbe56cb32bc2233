"""Matrix profile: brute-force parity + discord discovery."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tods_spark.operators import matrix_profile as MP


def _brute(x, m):
    n = len(x)
    k = n - m + 1
    excl = int(np.ceil(m / 4))
    subs = np.stack([x[i : i + m] for i in range(k)])
    mu = subs.mean(1, keepdims=True)
    sd = subs.std(1, keepdims=True)
    sd = np.maximum(sd, 1e-7)
    z = (subs - mu) / sd
    prof = np.full(k, np.inf)
    for i in range(k):
        d = np.sqrt(np.maximum(((z[i] - z) ** 2).sum(1), 0))
        lo, hi = max(0, i - excl), min(k, i + excl + 1)
        d[lo:hi] = np.inf
        prof[i] = d.min()
    return prof


def test_matrix_profile_matches_bruteforce():
    rng = np.random.default_rng(2)
    x = np.sin(np.arange(180) / 7.0) + rng.normal(0, 0.1, 180)
    prof, _ = MP.matrix_profile_series(x, 16)
    expect = _brute(x, 16)
    np.testing.assert_allclose(prof, expect, rtol=1e-5, atol=1e-5)


def test_matrix_profile_finds_discord(spark):
    rng = np.random.default_rng(4)
    x = np.tile(np.sin(np.arange(20) / 3.0), 12) + rng.normal(0, 0.05, 240)
    x[120:130] = rng.normal(0, 2.0, 10)  # a discord: pattern break
    pdf = pd.DataFrame({"k": "s", "timestamp": range(len(x)), "value": x})
    out = (
        MP.matrix_profile(spark.createDataFrame(pdf), "value", 20, keys=["k"])
        .orderBy("seg_id")
        .toPandas()
    )
    top = out.nlargest(5, "profile")["seg_id"].to_numpy()
    assert ((top >= 100) & (top <= 131)).any(), top
