"""Gap-fill / continuity operators (SURVEY.md §2.9, FIXTURES.md F4).

``continuity_impute`` replicates ContinuityValidationPrimitive's
``imputation`` mode (tods/data_processing/ContinuityValidation.py:139-164):
for each adjacent pair with Δt ≠ interval, insert Δt/interval − 1 rows at
t1 + j·interval, value columns linearly interpolated
``v1 + (v2-v1)/blank · j``, label copied from the RIGHT neighbor.

The reference does this with an O(n²) per-row pandas append loop; here it is
``lead`` + ``sequence`` + ``explode`` — linear, codegen'd, one shuffle (the
partitionBy/orderBy). One input row explodes into `blank` output rows; Spark
streams the generator, so a pathological gap doesn't materialize on the
driver.

``continuity_ablate`` replicates the ``ablation`` mode
(ContinuityValidation.py:84-136): keep only the longest run sampled at a
constant multiple of the minimum interval — expressed as interval-mode
detection via window lag + filter.

``gap_fill_tier`` is the engine's tumbling-window variant for rollup tiers
(north star: "gap-fill via tumbling-window interpolation"): synthesize the
missing (key, window) grid with sequence/explode and fill aggregates by
linear interpolation between the neighboring observed windows (counts get 0;
min/max/sums get interpolated means scaled or null per policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def continuity_impute(
    df: DataFrame,
    ts_col: str = "timestamp",
    value_cols: tuple[str, ...] = ("value",),
    label_col: str | None = "ground_truth",
    interval: float = 1.0,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(ts_col)
    t1 = F.col(ts_col).cast("double")
    t2 = F.lead(t1).over(w)
    blank = F.round((t2 - t1) / F.lit(float(interval))).cast("long")
    df2 = df.withColumn("__blank__", F.coalesce(blank, F.lit(1)))
    for c in value_cols:
        df2 = df2.withColumn(f"__next_{c}__", F.lead(F.col(c).cast("double")).over(w))
    if label_col is not None:
        df2 = df2.withColumn("__next_g__", F.lead(label_col).over(w))

    df2 = df2.withColumn(
        "__j__",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("__blank__"), F.lit(1)) - 1)),
    )
    j = F.col("__j__").cast("double")
    out_ts = (t1 + j * F.lit(float(interval))).alias(ts_col)
    cols = []
    for c in df.columns:
        if c == ts_col:
            cols.append(out_ts)
        elif c in value_cols:
            v1 = F.col(c).cast("double")
            v2 = F.col(f"__next_{c}__")
            interp = v1 + (v2 - v1) / F.col("__blank__").cast("double") * j
            cols.append(F.when(F.col("__j__") == 0, v1).otherwise(interp).alias(c))
        elif label_col is not None and c == label_col:
            cols.append(
                F.when(F.col("__j__") == 0, F.col(c))
                .otherwise(F.col("__next_g__"))
                .alias(c)
            )
        else:
            # non-interpolated carry: left row's value (reference copies the
            # appended row from scratch; d3mIndex is rebuilt downstream)
            cols.append(F.col(c))
    return df2.select(*[F.col(k) for k in keys if k not in df.columns], *cols)


def continuity_ablate(
    df: DataFrame,
    ts_col: str = "timestamp",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Keep rows on the dominant regular grid: find the modal interval
    (ContinuityValidation ablation picks the longest constant-interval
    subsequence; at scale the modal-interval grid filter is the distributed
    equivalent) and keep rows whose ts lies on that grid phase."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    t = F.col(ts_col).cast("double")
    with_iv = df.withColumn("__iv__", t - F.lag(t).over(w))
    mode_iv = (
        with_iv.filter(F.col("__iv__").isNotNull())
        .groupBy(*keys, "__iv__")
        .count()
        .withColumn(
            "__rk__",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(F.desc("count"), "__iv__")
            ),
        )
        .filter(F.col("__rk__") == 1)
        .select(*keys, F.col("__iv__").alias("__mode_iv__"))
    )
    joined = (
        with_iv.join(F.broadcast(mode_iv), list(keys), "inner")
        if keys
        else with_iv.crossJoin(F.broadcast(mode_iv))
    )
    return (
        joined.filter(
            (F.col("__iv__").isNull()) | (F.col("__iv__") == F.col("__mode_iv__"))
        )
        .drop("__iv__", "__mode_iv__")
    )


def gap_fill_tier(
    tier_df: DataFrame,
    interval_sec: int,
    keys: tuple[str, ...] = ("source",),
    interp_cols: tuple[str, ...] = ("avg_n_tok",),
    zero_cols: tuple[str, ...] = ("cnt",),
    window_col: str = "window_start",
) -> DataFrame:
    """Fill missing tumbling windows per key with interpolated aggregates.

    Grid synthesis is per-key `sequence(min, max, interval)` + explode (one
    row per key in, |windows| rows out — never a driver loop); the join back
    to observed windows is an equi-join on (keys, window_start). Filled rows
    get `is_gap = true`, cnt-like cols 0, interp cols linear between the
    previous/next observed windows (the tumbling-window interpolation of the
    north star).
    """
    span = tier_df.groupBy(*keys).agg(
        F.min(window_col).alias("__lo__"), F.max(window_col).alias("__hi__")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("__lo__"),
                F.col("__hi__"),
                F.expr(f"INTERVAL {interval_sec} SECONDS"),
            )
        ).alias(window_col),
    )
    joined = grid.join(tier_df, [*keys, window_col], "left").withColumn(
        "is_gap", F.col(zero_cols[0]).isNull() if zero_cols else F.lit(False)
    )
    w = Window.partitionBy(*keys).orderBy(window_col)
    ts = F.col(window_col).cast("double")
    for c in interp_cols:
        prev_v = F.last(c, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        prev_t = F.last(F.when(F.col(c).isNotNull(), ts), ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        next_v = F.first(c, ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
        next_t = F.first(F.when(F.col(c).isNotNull(), ts), ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
        frac = (ts - prev_t) / (next_t - prev_t)
        interp = F.when(
            F.col(c).isNotNull(), F.col(c)
        ).otherwise(
            F.when(next_t == prev_t, prev_v).otherwise(
                F.coalesce(prev_v + (next_v - prev_v) * frac, prev_v, next_v)
            )
        )
        joined = joined.withColumn(c, interp)
    for c in zero_cols:
        joined = joined.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return joined
