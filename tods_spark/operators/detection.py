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


def system_wise_voting(
    df: DataFrame,
    score_col: str = "score",
    system_col: str = "system_id",
    window_size: int = 3,
    order_col: str = "timestamp",
    method: str = "sum",
    contamination: float = 0.1,
) -> DataFrame:
    """SystemWiseDetection majority-voting reductions
    (SystemWiseDetection.py:376-444, majority_voting_sliding_window_sum/max):

      1. align systems to the longest series (pad trailing with the last
         value — reference `column_value[len:] = actual[-1]`);
      2. per system, per trailing window of `window_size` from index w-1:
         score = sum (or max) of |values| in the window;
      3. at each aligned time step the system(s) holding the max score get
         one vote;
      4. votes per system; threshold = sorted(votes)[int((1-c)·S)];
         label = votes > threshold.

    All set-based: row_number + sequence/explode padding, one trailing-frame
    window agg, a groupBy-max + equi-join for the votes, and an order-
    statistic join for the threshold. No driver-side loops — system count S
    and time length bound every stage."""
    a = F.abs(F.col(score_col))
    w_ord = Window.partitionBy(system_col).orderBy(order_col)
    base = (
        df.withColumn("rn", F.row_number().over(w_ord))
        .select(F.col(system_col).alias("sys"), F.col("rn"), a.alias("av"))
    )
    sz = base.groupBy("sys").agg(F.max("rn").alias("n"))
    max_n = sz.agg(F.max("n").alias("max_n"))
    # trailing pad: one row per missing index, value = the system's last
    last = base.join(sz, "sys").filter(F.col("rn") == F.col("n")).select(
        "sys", F.col("av").alias("lv"), "n"
    )
    pad = (
        last.crossJoin(F.broadcast(max_n))
        .filter(F.col("n") < F.col("max_n"))
        .select(
            "sys",
            F.explode(
                F.sequence(F.col("n") + 1, F.col("max_n"))
            ).alias("rn"),
            F.col("lv").alias("av"),
        )
    )
    allr = base.select("sys", "rn", "av").unionByName(pad)
    frame = (
        Window.partitionBy("sys").orderBy("rn")
        .rowsBetween(-(window_size - 1), 0)
    )
    inner = F.sum("av").over(frame) if method == "sum" else F.max("av").over(frame)
    scored = (
        allr.withColumn("s", inner)
        .filter(F.col("rn") >= window_size)
        .select("sys", "rn", "s")
    )
    mxs = scored.groupBy("rn").agg(F.max("s").alias("ms"))
    votes = (
        scored.join(mxs, "rn")
        .filter(F.col("s") == F.col("ms"))
        .groupBy("sys")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    votes_all = (
        sz.select("sys")
        .join(votes, "sys", "left")
        .select("sys", F.coalesce("votes", F.lit(0)).alias("votes"))
    )
    # threshold = 0-based order statistic int((1-c)·S) of the vote counts
    rk = votes_all.select(
        "votes",
        F.row_number().over(Window.orderBy("votes", "sys")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("S"),
    )
    th = rk.filter(
        F.col("r") - 1 == F.floor((1 - contamination) * F.col("S")).cast("int")
    ).select(F.col("votes").alias("t"))
    return votes_all.crossJoin(F.broadcast(th)).select(
        F.col("sys").alias(system_col),
        "votes",
        F.when(F.col("votes") > F.col("t"), 1).otherwise(0).alias("label"),
    )


def hbos_scores(
    df: DataFrame,
    value_col: str = "value",
    keys: list[str] | None = None,
    n_bins: int = 10,
    alpha: float = 0.1,
) -> DataFrame:
    """HBOS core (PyodHBOS.py:127 → pyod.models.hbos): equal-width
    histogram per key group, density-normalized; score = log2(1/(density
    + alpha)) at the sample's bin. Pure Catalyst: one min/max agg, one bin
    groupBy, two joins on low-cardinality keys — fully SQL-expressible, so
    the oracle twin recomputes it exactly (identical IEEE expressions give
    identical bins)."""
    keys = keys or []
    v = F.col(value_col).cast("double")
    rng = df.groupBy(*keys).agg(
        F.min(v).alias("__lo__"),
        F.max(v).alias("__hi__"),
        F.count(F.lit(1)).alias("__n__"),
    )
    joined = df.join(F.broadcast(rng), keys) if keys else df.crossJoin(
        F.broadcast(rng)
    )
    width = (F.col("__hi__") - F.col("__lo__")) / n_bins
    # try_divide: a constant group has width 0 and lands in bin 0 via the
    # coalesce below (ANSI mode raises on plain division by zero)
    bin_ = F.least(
        F.floor(F.try_divide(v - F.col("__lo__"), width)).cast("int"),
        F.lit(n_bins - 1),
    )
    binned = joined.withColumn("bin", F.coalesce(bin_, F.lit(0)))
    hist = binned.groupBy(*keys, "bin").agg(F.count(F.lit(1)).alias("__cnt__"))
    # constant group (hi == lo): np.histogram uses range (v-0.5, v+0.5), i.e.
    # ONE unit-width bin holding all mass — density 1.0, not inf/null
    out = binned.join(hist, [*keys, "bin"]).withColumn(
        "density",
        F.when(width > 0, F.col("__cnt__") / F.col("__n__") / width)
        .otherwise(F.lit(1.0)),
    )
    return out.withColumn(
        "hbos_score",
        F.log2(1.0 / (F.col("density") + F.lit(alpha))),
    ).drop("__lo__", "__hi__", "__n__", "__cnt__")


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
    df: DataFrame, truth_col: str = "ground_truth", pred_col: str = "label",
    beta: float = 1.0,
) -> DataFrame:
    """Full metric block from ONE confusion-matrix aggregate —
    tods/utils.py:665-722 (get_evaluate_metric):
      * precision / recall — binary, positive class (sklearn defaults);
      * f1 — binary F1 of the positive class;
      * f1_micro — sklearn f1_score(average='micro'): for single-label
        binary data this equals accuracy (the reference's 'F1' metric);
      * f1_macro — mean of the per-class F1s (reference 'F1_MACRO');
      * f_beta — fbeta_score(average='macro', beta) (reference 'F_beta').
    Zero divisions resolve to 0, matching sklearn's zero_division=0."""
    t, p = F.col(truth_col), F.col(pred_col)
    agg = df.agg(
        F.sum(F.when((t == 1) & (p == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((t == 0) & (p == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((t == 1) & (p == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((t == 0) & (p == 0), 1).otherwise(0)).alias("tn"),
    )

    def _safe(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    prec1 = _safe(F.col("tp"), F.col("tp") + F.col("fp"))
    rec1 = _safe(F.col("tp"), F.col("tp") + F.col("fn"))
    prec0 = _safe(F.col("tn"), F.col("tn") + F.col("fn"))
    rec0 = _safe(F.col("tn"), F.col("tn") + F.col("fp"))
    b2 = float(beta) ** 2

    def _fb(pr, rc, b2_):
        return _safe((1 + b2_) * pr * rc, b2_ * pr + rc)

    f1_1, f1_0 = _fb(prec1, rec1, 1.0), _fb(prec0, rec0, 1.0)
    total = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    return agg.select(
        "tp", "fp", "fn", "tn",
        prec1.alias("precision"),
        rec1.alias("recall"),
        f1_1.alias("f1"),
        _safe(F.col("tp") + F.col("tn"), total).alias("f1_micro"),
        ((f1_1 + f1_0) / 2).alias("f1_macro"),
        ((_fb(prec1, rec1, b2) + _fb(prec0, rec0, b2)) / 2).alias("f_beta"),
    )
