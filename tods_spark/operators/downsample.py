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


def counter_increase(
    df: DataFrame,
    bucket: str = "6 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    tie_col: str = "event_id",
) -> DataFrame:
    """Prometheus-style ``increase()`` over a cumulative counter, per
    (keys, tumbling bucket), with counter-reset detection: the increase
    is the sum of positive adjacent-sample deltas in ts order (a
    negative delta is a counter RESET — a restarted process — and
    contributes 0, not a negative), and the delta across each bucket
    boundary (first sample of the bucket vs last sample of the previous
    bucket) is attributed to the LATER bucket.

    Adjacent-sample deltas are inherently sequential per key — the naive
    encoding is a lag window over ALL samples per key, a per-key global
    sort. Two-phase split instead (the pack_sequences pattern):
      1. WITHIN each (keys, bucket): one shuffle groups the bucket's
         samples; a codegen'd sorted-array fold computes the in-bucket
         increase, reset count, and boundary samples (v_first/v_last).
         Per-group cost is bounded by samples-per-bucket — a cadence
         contract (e.g. 1 sample/15 s => <= 5760 rows per 1d bucket),
         the same calendar-boundedness the rollup tiers rely on.
      2. ACROSS buckets: a lag window over the BUCKET table only
         (|keys| x |calendar buckets| rows, tier-sized) adds the
         boundary delta against the previous EXISTING bucket — at
         series start (no predecessor at all) the boundary contributes
         0. Note the cross-GAP case deliberately differs from
         Prometheus's staleness cutoff: a cumulative counter that went
         quiet and resumed higher DID increase by that amount, so the
         delta across empty buckets is credited (and a lower resume
         still counts as one reset). The DuckDB twin lags over the same
         bucket table, so parity is exact.

    Output: keys, bucket_start, n_samples, increase, n_resets,
    v_first, v_last.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    samp = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tie_col).alias("tie"),
        v.alias("v"),
    )
    per_bucket = (
        df.groupBy(*keys, F.window(ts_col, bucket).alias("w"))
        .agg(F.sort_array(F.collect_list(samp)).alias("_s"))
        .select(
            *keys,
            F.col("w.start").alias("bucket_start"),
            F.size("_s").alias("n_samples"),
            F.element_at("_s", 1)["v"].alias("v_first"),
            F.element_at("_s", -1)["v"].alias("v_last"),
            F.aggregate(
                F.slice(F.col("_s"), 2, F.greatest(F.size("_s") - 1, F.lit(0))),
                F.struct(
                    F.element_at("_s", 1)["v"].alias("prev"),
                    F.lit(0.0).alias("inc"),
                    F.lit(0).alias("resets"),
                ),
                lambda a, x: F.struct(
                    x["v"].alias("prev"),
                    (a["inc"] + F.greatest(x["v"] - a["prev"], F.lit(0.0)))
                    .alias("inc"),
                    (a["resets"]
                     + F.when(x["v"] < a["prev"], 1).otherwise(0))
                    .alias("resets"),
                ),
            ).alias("_acc"),
        )
        .select(
            *keys, "bucket_start", "n_samples", "v_first", "v_last",
            F.col("_acc.inc").alias("_in_inc"),
            F.col("_acc.resets").alias("_in_resets"),
        )
    )
    w = Window.partitionBy(*keys).orderBy("bucket_start")
    prev_last = F.lag("v_last").over(w)
    boundary = F.when(
        prev_last.isNull(), F.lit(0.0)
    ).otherwise(F.greatest(F.col("v_first") - prev_last, F.lit(0.0)))
    boundary_reset = F.when(
        prev_last.isNotNull() & (F.col("v_first") < prev_last), 1
    ).otherwise(0)
    return per_bucket.select(
        *keys,
        "bucket_start",
        "n_samples",
        (F.col("_in_inc") + boundary).alias("increase"),
        (F.col("_in_resets") + boundary_reset).alias("n_resets"),
        "v_first",
        "v_last",
    )


def value_histogram(
    df: DataFrame,
    bucket: str = "1 day",
    bins: int = 8,
    lo: float = 0.0,
    hi: float = 40.0,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Fixed-bin value histogram per (keys, tumbling bucket) — the
    density/heatmap serving aggregate (each bucket renders as a column
    of shaded bins; the fixed [lo, hi) grid makes buckets comparable
    across time and keys, which data-dependent quantile bins would not).

    Bin rule: floor((v - lo) / width) clamped to [0, bins-1] — values
    below `lo` land in bin 0, values >= `hi` in the top bin (standard
    histogram edge convention for monitoring heatmaps). Output is one
    row per (keys, bucket, bin) with its count — the exploded form
    joins/filters naturally and twins exactly in SQL.

    Scale shape: a pure partial+final hash aggregate on (keys, bucket,
    bin) — the bin id widens the group key the same way the vocabulary
    widens n-gram aggregates, so a hot key spreads over bins x buckets;
    shuffle volume is one row per populated (key, bucket, bin) per task.
    Empty bins are omitted (serving layers coalesce(0) on read): at
    10^12 rows emitting zero rows for empty cells would multiply the
    output by bins for no information.
    """
    width = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    bin_id = F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(bins - 1),
    )
    return (
        df.groupBy(
            *keys,
            F.window(ts_col, bucket).alias("w"),
            bin_id.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *keys, F.col("w.start").alias("bucket_start"), "bin", "cnt"
        )
    )


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Session windows: group each key's events into sessions separated
    by inactivity gaps >= ``gap`` (Spark's native `session_window` —
    a merging window aggregate, not a tumbling one). Emits one row per
    session: start/end, event count, value sum, duration seconds.

    Scale shape: `session_window` is ONE shuffle on the keys followed by
    a per-key in-partition sort-merge of candidate sessions — the same
    physical cost as any keyed aggregate plus a bounded per-group sort.
    The session key here is (user_id): a high-cardinality UNIFORM key
    (10^9 users spread over all reducers), not the skewed `source` — a
    hot single key would need the gap-island two-phase split instead
    (the counter_increase pattern); per-user event counts are bounded by
    human behavior, so per-group cost is small by construction. The
    same expression works under Structured Streaming with a watermark
    (merging-session state store) — batch/stream parity like rollup.

    Sessionization is net-new vs the reference (TODS has no session
    semantics); it is the standard first step of behavioral training
    data (user trajectories -> sequence examples)."""
    v = F.col(value_col).cast("double")
    return (
        df.groupBy(*keys, F.session_window(ts_col, gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(v).alias("sum_value"),
        )
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
            (
                F.unix_micros(F.col("sw.end").cast("timestamp"))
                - F.unix_micros(F.col("sw.start").cast("timestamp"))
            ).alias("duration_us"),
        )
    )
