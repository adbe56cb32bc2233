"""M4 visualization downsampling (Jugel et al., "M4: A Visualization-
Oriented Time Series Data Aggregation", PVLDB 7(10), 2014).

Per (key, time-bucket) the op keeps exactly the four points a pixel-
perfect line rendering needs — min, max, first, last of the value — so a
10^12-point series serves a w-pixel chart from 4·w·keys rows with zero
rendering error (the paper's result: M4 is the minimal error-free
line-chart aggregation). This is the serving-side complement of the
rollup tiers: tiers feed analytics, M4 feeds dashboards over raw.

Generalizes the reference's resample-downsample
(tods/data_processing/TimeIntervalTransform.py:148-169 — mean-only) to
the error-free rendering aggregate set.

Scale shape: ONE shuffle on (keys, bucket) and every aggregate is
algebraic — min/max trivially, first/last via Spark's min_by/max_by —
so partials combine map-side and shuffle volume is one row per (key,
bucket) per task regardless of raw size. Two physical variants:
  * tie_col set (default, exact): min_by orders by a (ts, tie) struct;
    struct aggregation buffers aren't Tungsten-mutable, so Catalyst
    plans partial+final SortAggregate — same shuffle volume, plus a
    per-partition sort (a constant factor, not a scale cliff);
  * tie_col=None (fast path): orders by unix_micros(ts) alone — a
    primitive bigint buffer, pure partial+final HashAggregate in
    whole-stage codegen. Correct whenever timestamps are unique at
    microsecond grain within a (key, bucket); pick this at 10^12 rows.
No window functions over raw, no per-row Python in either variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def m4_downsample(
    df: DataFrame,
    bucket: str = "6 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    tie_col: str | None = "event_id",
) -> DataFrame:
    """min/max/first/last of ``value_col`` per (keys, tumbling bucket).

    ``tie_col`` makes first/last deterministic when two rows share a
    timestamp (min_by/max_by on the (ts, tie) struct — lexicographic
    struct ordering): required for the exact-value oracle twin and for
    idempotent re-runs. Pass ``tie_col=None`` for the hash-aggregate
    fast path (ts-only ordering — see module docstring).
    """
    v = F.col(value_col).cast("double")
    order = (
        F.struct(F.col(ts_col), F.col(tie_col))
        if tie_col is not None
        else F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    return (
        df.groupBy(*keys, F.window(ts_col, bucket).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.min_by(v, order).alias("v_first"),
            F.max_by(v, order).alias("v_last"),
        )
        .select(
            *keys,
            F.col("w.start").alias("bucket_start"),
            "cnt",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
        )
    )
