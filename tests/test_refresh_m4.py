"""Incremental tier refresh (rollup.refresh_tier) and M4 downsampling
(downsample.m4_downsample): incremental == full-recompute parity, new /
empty late-batch edges, tie-break determinism, and the plan shapes the
scale claims rest on (tier side broadcast-only; M4 as a pure aggregate —
no Window, no Sort)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tods_spark.operators import downsample as DS
from tods_spark.operators import rollup


def _events(n=3000, seed=3):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-02-01")
    return pd.DataFrame(
        {
            "event_id": np.arange(n),
            "event_type": rng.choice(["a", "b", "c"], n, p=[0.7, 0.2, 0.1]),
            "ts": base
            + pd.to_timedelta(rng.integers(0, 5 * 86400, n), "s"),
            "value": rng.normal(10, 4, n).round(2),
        }
    )


STATE = ["cnt", "sum_n_tok", "min_n_tok", "max_n_tok", "sum_sq_n_tok"]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["event_type", "window_start"]).reset_index(
        drop=True
    )
    for c in ("sum_n_tok", "avg_n_tok", "sum_sq_n_tok"):
        pdf[c] = pdf[c].round(6)
    return pdf


def test_refresh_equals_full_recompute(spark):
    """The invariant that makes mid-stream refresh safe: merging the late
    batch's partials into the on-time tier row-for-row equals the tier
    computed from ALL rows."""
    pdf = _events()
    df = spark.createDataFrame(pdf)
    on_time = df.filter(F.col("event_id") % 11 != 0)
    late = df.filter(F.col("event_id") % 11 == 0)  # ~9% late
    tier = rollup.rollup_raw(on_time, "1h", value_col="value",
                             keys=("event_type",))
    got = rollup.refresh_tier(tier, late, "1h", value_col="value",
                              keys=("event_type",)).toPandas()
    full = rollup.rollup_raw(df, "1h", value_col="value",
                             keys=("event_type",)).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(full))


def test_refresh_creates_unseen_windows_and_keys(spark):
    """A late batch whose (key, window) pairs the tier has never seen —
    including a brand-new key — inserts rows rather than merging."""
    pdf = _events(800)
    df = spark.createDataFrame(pdf)
    cut = pd.Timestamp("2024-02-03")
    early = df.filter(F.col("ts") < F.lit(cut))
    late = df.filter(F.col("ts") >= F.lit(cut)).withColumn(
        "event_type", F.lit("zz_new")
    )
    tier = rollup.rollup_raw(early, "1h", value_col="value",
                             keys=("event_type",))
    got = rollup.refresh_tier(tier, late, "1h", value_col="value",
                              keys=("event_type",)).toPandas()
    full = rollup.rollup_raw(
        early.unionByName(late), "1h", value_col="value",
        keys=("event_type",)
    ).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(full))
    assert (got.event_type == "zz_new").any()


def test_refresh_empty_late_batch_is_identity(spark):
    pdf = _events(500)
    df = spark.createDataFrame(pdf)
    tier = rollup.rollup_raw(df, "1h", value_col="value",
                             keys=("event_type",))
    got = rollup.refresh_tier(
        tier, df.filter(F.lit(False)), "1h", value_col="value",
        keys=("event_type",)
    ).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(tier.toPandas()))


def test_refresh_tier_side_never_shuffles(spark):
    """Scale claim: every join touching the stored tier is a broadcast
    hash join — the plan has no SortMergeJoin and no exchange whose
    input is the tier scan (only the late batch's aggregate shuffles)."""
    pdf = _events(500)
    df = spark.createDataFrame(pdf)
    tier = rollup.rollup_raw(
        df.filter(F.col("event_id") % 7 != 0), "1h", value_col="value",
        keys=("event_type",)
    )
    out = rollup.refresh_tier(
        tier, df.filter(F.col("event_id") % 7 == 0), "1h",
        value_col="value", keys=("event_type",)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_m4_matches_pandas(spark):
    pdf = _events(2000, seed=9)
    got = (
        DS.m4_downsample(spark.createDataFrame(pdf), bucket="6 hours")
        .toPandas()
        .sort_values(["event_type", "bucket_start"])
        .reset_index(drop=True)
    )
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["bucket_start"] = pdf.ts.dt.floor("6h")
    exp = (
        pdf.groupby(["event_type", "bucket_start"])
        .agg(
            cnt=("value", "size"),
            v_min=("value", "min"),
            v_max=("value", "max"),
            v_first=("value", "first"),
            v_last=("value", "last"),
        )
        .reset_index()
        .sort_values(["event_type", "bucket_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns], exp, check_dtype=False
    )


def test_m4_tie_break_on_equal_timestamps(spark):
    """Rows sharing a timestamp resolve first/last by event_id — the
    determinism the oracle twin and idempotent re-runs need."""
    t = pd.Timestamp("2024-02-01 03:00:00")
    pdf = pd.DataFrame(
        {
            "event_id": [5, 1, 9],
            "event_type": ["a"] * 3,
            "ts": [t, t, t],
            "value": [50.0, 10.0, 90.0],
        }
    )
    got = DS.m4_downsample(
        spark.createDataFrame(pdf), bucket="6 hours"
    ).toPandas()
    assert got.v_first.iloc[0] == 10.0  # event_id 1
    assert got.v_last.iloc[0] == 90.0  # event_id 9


def test_m4_plan_is_pure_aggregate(spark):
    """M4's scale shape: partial+final aggregation (map-side combine, one
    exchange), no Window over raw. Default (tie-safe) path may plan
    SortAggregate (struct buffer); the tie_col=None fast path must plan
    pure HashAggregate."""
    pdf = _events(500)
    out = DS.m4_downsample(spark.createDataFrame(pdf), bucket="6 hours")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min_by" in plan  # map-side combine before the exchange
    assert plan.count("Exchange") == 1
    fast = DS.m4_downsample(
        spark.createDataFrame(pdf), bucket="6 hours", tie_col=None
    )
    fplan = fast._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in fplan and "SortAggregate" not in fplan


def test_m4_fast_path_matches_default_on_unique_ts(spark):
    pdf = _events(1500, seed=21).drop_duplicates(subset=["ts"])
    df = spark.createDataFrame(pdf)
    a = (
        DS.m4_downsample(df, bucket="6 hours")
        .toPandas()
        .sort_values(["event_type", "bucket_start"])
        .reset_index(drop=True)
    )
    b = (
        DS.m4_downsample(df, bucket="6 hours", tie_col=None)
        .toPandas()
        .sort_values(["event_type", "bucket_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
