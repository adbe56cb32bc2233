"""As-of join (operators/asof.py): golden parity with pandas merge_asof,
closed-window semantics, inner-asof drop rule, and the plan shape
(big side never sorts/shuffles — BroadcastHashJoin)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tods_spark.operators import asof as ASOF


def _frames(n=400, keys=("a", "b", "c"), seed=11):
    """Random events over ~3 days + an hourly tier per key with gaps."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "event_type": rng.choice(keys, n),
            "ts": base + pd.to_timedelta(rng.integers(0, 72 * 3600, n), "s"),
            "value": rng.normal(size=n).round(4),
        }
    )
    rows = []
    for ki, k in enumerate(keys):
        for h in range(2, 70):
            if (h + ki) % 5 == 0:
                continue  # gaps: forward-fill must carry the last point
            rows.append(
                {
                    "event_type": k,
                    "window_start": base + pd.Timedelta(hours=h),
                    "cnt": int(h * 10 + ki),
                    "avg_value": round(float(np.sin(h + ki)), 4),
                }
            )
    return ev, pd.DataFrame(rows)


def _expected(ev: pd.DataFrame, tier: pd.DataFrame) -> pd.DataFrame:
    ev = ev.copy()
    ev["_h"] = ev.ts.dt.floor("h") - pd.Timedelta(hours=1)
    out = []
    for k, g in ev.groupby("event_type"):
        t = tier[tier.event_type == k].sort_values("window_start")
        m = pd.merge_asof(
            g.sort_values("_h"),
            t.rename(
                columns={
                    "window_start": "asof_window_start",
                    "cnt": "asof_cnt",
                    "avg_value": "asof_avg_value",
                }
            ).drop(columns=["event_type"]),
            left_on="_h",
            right_on="asof_window_start",
            direction="backward",
        )
        out.append(m.dropna(subset=["asof_window_start"]))  # inner as-of
    return (
        pd.concat(out)
        .drop(columns=["_h"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def test_asof_matches_merge_asof(spark):
    ev, tier = _frames()
    got = (
        ASOF.asof_enrich(
            spark.createDataFrame(ev),
            spark.createDataFrame(tier),
            keys=("event_type",),
            value_cols=("cnt", "avg_value"),
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = _expected(ev, tier)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[["event_id", "asof_window_start", "asof_cnt", "asof_avg_value"]],
        exp[["event_id", "asof_window_start", "asof_cnt", "asof_avg_value"]],
        check_dtype=False,
    )


def test_asof_drops_pre_tier_events(spark):
    """Events whose closed hour precedes the key's first tier point drop
    (inner as-of) — and an event INSIDE hour h must read hour h-1."""
    base = pd.Timestamp("2024-03-01")
    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "event_type": ["a"] * 3,
            # closed hours: 01:00 (< first tier pt -> drop), 02:00, 03:00
            "ts": [
                base + pd.Timedelta("2h30min"),
                base + pd.Timedelta("3h15min"),
                base + pd.Timedelta("4h"),
            ],
            "value": [1.0, 2.0, 3.0],
        }
    )
    tier = pd.DataFrame(
        {
            "event_type": ["a", "a"],
            "window_start": [base + pd.Timedelta(hours=2),
                             base + pd.Timedelta(hours=3)],
            "cnt": [10, 20],
            "avg_value": [0.5, 0.7],
        }
    )
    got = (
        ASOF.asof_enrich(
            spark.createDataFrame(ev),
            spark.createDataFrame(tier),
            keys=("event_type",),
            value_cols=("cnt", "avg_value"),
        )
        .toPandas()
        .sort_values("event_id")
    )
    assert got.event_id.tolist() == [1, 2]
    assert got.asof_cnt.tolist() == [10, 20]


def test_asof_plan_broadcasts_tier(spark):
    """The raw side must reach the join without an exchange or sort: the
    grid (tier side) ends up broadcast — statically (size estimate under
    autoBroadcastJoinThreshold) or by AQE at runtime — so the executed
    plan is scan → project → BroadcastHashJoin on the big side. The grid
    deliberately carries NO broadcast hint (its size grows with keys ×
    calendar span; a hard hint would bypass AQE's limit), so the FINAL
    adaptive plan is what's asserted."""
    ev, tier = _frames()
    df = ASOF.asof_enrich(
        spark.createDataFrame(ev),
        spark.createDataFrame(tier),
        keys=("event_type",),
        value_cols=("cnt", "avg_value"),
    )
    df.collect()  # finalize AQE re-planning before reading the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_unbounded_matches_bounded_and_merge_asof(spark):
    """The unbounded-key variant returns exactly the bounded variant's
    rows on the same input (same backward-as-of semantics, different
    physical shape), and therefore also matches the pandas merge_asof
    golden; its plan never windows or sorts the raw side (no Window whose
    input is the un-aggregated events — asserted via the audit's check
    #20 on the registered per-user query)."""
    ev, tier = _frames()
    cols = ["event_id", "asof_window_start", "asof_cnt", "asof_avg_value"]
    got = (
        ASOF.asof_enrich_unbounded(
            spark.createDataFrame(ev),
            spark.createDataFrame(tier),
            keys=("event_type",),
            value_cols=("cnt", "avg_value"),
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = _expected(ev, tier)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[cols], exp[cols], check_dtype=False
    )


def test_asof_step_must_be_single_unit(spark):
    """A multi-unit step ('6 hours') would compute lookup buckets off the
    tier grid and silently drop events — both variants must refuse it."""
    import pytest

    ev, tier = _frames(n=20)
    for fn in (ASOF.asof_enrich, ASOF.asof_enrich_unbounded):
        with pytest.raises(ValueError, match="1 <unit>"):
            fn(
                spark.createDataFrame(ev),
                spark.createDataFrame(tier),
                keys=("event_type",),
                step="6 hours",
                value_cols=("cnt", "avg_value"),
            )
