"""Detection-algorithm plumbing (SURVEY.md §2.10): the engine-side parts of
TODS's UODBasePrimitive / CollectiveBase / SystemWiseDetection / Ensemble —
windowing, score thresholding, label alignment, score reduction, metric
evaluation. The wrapped estimators themselves (pyod/keras models) are
consumers of these frames: a fitted model broadcast inside a predict
pandas UDF (out of scope for the sandbox — no pyod/keras — but the frame
contract is exactly what `scores_to_labels` consumes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def window_indices(
    df: DataFrame,
    window_size: int,
    step: int,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> DataFrame:
    """left/right window bounds per subsequence: left = arange(0, n, step),
    right = min(left + window_size, n) — UODBasePrimitive.py:238-241."""
    keys = keys or []
    w = Window.partitionBy(*keys).orderBy(order_col)
    n = F.count(F.lit(1)).over(
        Window.partitionBy(*keys).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    rn = F.row_number().over(w) - 1
    return (
        df.withColumn("__rn__", rn)
        .withColumn("__n__", n)
        .filter(F.col("__rn__") % step == 0)
        .select(
            *keys,
            (F.col("__rn__") / step).cast("long").alias("seg_id"),
            F.col("__rn__").alias("left_ind"),
            F.least(F.col("__rn__") + window_size, F.col("__n__")).alias(
                "right_ind"
            ),
        )
    )


def scores_to_labels(
    df: DataFrame,
    score_col: str = "score",
    contamination: float = 0.1,
    keys: list[str] | None = None,
) -> DataFrame:
    """threshold = percentile(scores, 100·(1-contamination)); label =
    score > threshold — CollectiveBase.py:329-345 (exact percentile, linear
    interpolation, matching numpy.percentile)."""
    keys = keys or []
    th = (
        df.groupBy(*keys).agg(
            F.percentile(score_col, F.lit(1 - contamination)).alias("__th__")
        )
        if keys
        else df.agg(
            F.percentile(score_col, F.lit(1 - contamination)).alias("__th__")
        )
    )
    joined = df.join(F.broadcast(th), keys) if keys else df.crossJoin(
        F.broadcast(th)
    )
    return joined.withColumn(
        "label", (F.col(score_col) > F.col("__th__")).cast("int")
    ).withColumnRenamed("__th__", "threshold")


def system_wise_scores(
    df: DataFrame,
    score_col: str = "score",
    method: str = "max",
    system_col: str = "system_id",
    window_size: int = 3,
    order_col: str = "timestamp",
) -> DataFrame:
    """Per-system score reduction — SystemWiseDetection.py:307-364:
    max/avg of |score|, or sliding-window sum/max variants (the per-system
    max over a trailing window of |score| sums)."""
    a = F.abs(F.col(score_col))
    if method == "max":
        return df.groupBy(system_col).agg(F.max(a).alias("system_score"))
    if method == "avg":
        return df.groupBy(system_col).agg(F.avg(a).alias("system_score"))
    if method in ("sliding_window_sum", "sliding_window_max"):
        w = (
            Window.partitionBy(system_col)
            .orderBy(order_col)
            .rowsBetween(-(window_size - 1), 0)
        )
        inner = F.sum(a).over(w) if method == "sliding_window_sum" else F.max(a).over(w)
        return (
            df.withColumn("__sw__", inner)
            .groupBy(system_col)
            .agg(F.max("__sw__").alias("system_score"))
        )
    raise ValueError(method)


def ensemble_scores(
    df: DataFrame,
    score_cols: list[str],
    method: str = "mean",
    threshold: float = 0.05,
) -> DataFrame:
    """Combine detector scores and binarize at the fixed 0.05 default —
    Ensemble.py:115,190-208."""
    cols = [F.col(c).cast("double") for c in score_cols]
    if method == "max":
        comb = F.greatest(*cols)
    elif method == "min":
        comb = F.least(*cols)
    elif method == "mean":
        comb = sum(cols) / len(cols)
    else:
        raise ValueError(method)
    return df.withColumn("ensemble_score", comb).withColumn(
        "ensemble_label", (comb > threshold).cast("int")
    )


def evaluate_labels(
    df: DataFrame, truth_col: str = "ground_truth", pred_col: str = "label"
) -> DataFrame:
    """precision/recall/F1 from a confusion-matrix aggregate —
    tods/utils.py:665-722 metric block, one pass."""
    t, p = F.col(truth_col), F.col(pred_col)
    agg = df.agg(
        F.sum(F.when((t == 1) & (p == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((t == 0) & (p == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((t == 1) & (p == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((t == 0) & (p == 0), 1).otherwise(0)).alias("tn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return agg.select(
        "tp", "fp", "fn", "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    )
