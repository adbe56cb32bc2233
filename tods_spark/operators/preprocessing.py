"""Column-level preprocessing (SURVEY.md §2.2):

* ``parse_columns`` — ColumnParserPrimitive
  (tods/data_processing/ColumnParser.py:23-37,153-205): cast string columns
  to boolean / int / float / datetime / float-vector per a declared type
  map (the reference routes on semantic types; Spark uses explicit schemas).
* ``categorical_to_binary`` — CategoricalToBinaryPrimitive
  (tods/data_processing/CategoricalToBinary.py:78-86): one-hot columns
  `<col>_<value>` incl. a NaN dummy, as `when()` expressions from a
  collected distinct-value list (bounded cardinality by contract).
* ``impute`` — SKImputerPrimitive (tods/data_processing/SKImputer.py:60-82):
  mean / median / most_frequent / constant per column, one stats pass +
  coalesce.
* ``filter_nan_tail_columns`` — ColumnFilterPrimitive
  (tods/data_processing/ColumnFilter.py:124-145): drop columns whose LAST
  row is NaN (the reference uses it to strip filter/derivative columns that
  end in NaN).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_CAST = {
    "int": "bigint",
    "integer": "bigint",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
    "str": "string",
}


def parse_columns(df: DataFrame, type_map: dict[str, str]) -> DataFrame:
    """type_map: col → {'int','float','boolean','datetime','float_vector'}."""
    out = df
    for c, t in type_map.items():
        if t == "datetime":
            out = out.withColumn(c, F.to_timestamp(c))
        elif t == "float_vector":
            # FloatVector semantic type: comma-separated floats in one cell
            out = out.withColumn(
                c, F.split(F.col(c), ",").try_cast("array<double>")
            )
        else:
            # try_cast: malformed cells -> null (ANSI cast would throw),
            # matching the reference's coerce-with-NaN parsing behavior
            out = out.withColumn(c, F.col(c).try_cast(_CAST[t]))
    return out


def categorical_to_binary(df: DataFrame, col: str,
                          max_categories: int = 64) -> DataFrame:
    vals = [
        r[0]
        for r in df.select(col).distinct().limit(max_categories + 1).collect()
    ]
    assert len(vals) <= max_categories, f"{col}: too many categories"
    out = df
    for v in sorted([v for v in vals if v is not None], key=str):
        out = out.withColumn(
            f"{col}_{v}", F.when(F.col(col) == v, 1).otherwise(0)
        )
    if any(v is None for v in vals):  # NaN dummy (pd.get_dummies(dummy_na))
        out = out.withColumn(
            f"{col}_nan", F.when(F.col(col).isNull(), 1).otherwise(0)
        )
    return out


def impute(
    df: DataFrame,
    cols: list[str],
    strategy: str = "mean",
    fill_value=None,
) -> DataFrame:
    if strategy == "constant":
        return df.fillna({c: fill_value for c in cols})
    aggs = []
    for c in cols:
        if strategy == "mean":
            aggs.append(F.avg(c).alias(c))
        elif strategy == "median":
            aggs.append(F.percentile(c, F.lit(0.5)).alias(c))
        elif strategy == "most_frequent":
            aggs.append(F.mode(c).alias(c))
        else:
            raise ValueError(strategy)
    stats = df.agg(*aggs).collect()[0].asDict()
    return df.fillna({c: stats[c] for c in cols if stats[c] is not None})


def filter_nan_tail_columns(
    df: DataFrame, candidate_cols: list[str], order_col: str
) -> DataFrame:
    """Drop candidate columns whose value in the LAST row (by order_col) is
    NaN/null — one tail probe, no full scan of the column."""
    last = (
        df.orderBy(F.desc(order_col)).select(*candidate_cols).limit(1).collect()
    )
    drop = []
    if last:
        row = last[0].asDict()
        drop = [
            c
            for c in candidate_cols
            if row[c] is None
            or (isinstance(row[c], float) and math.isnan(row[c]))
        ]
    return df.drop(*drop)


def stratified_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    n_salt: int = 64,
) -> DataFrame:
    """Deterministic exactly-k-per-stratum sample — the data-mixture
    selection step of a pretraining pipeline ("take k docs per source").
    Selection order is md5(id) within each stratum: stable across runs,
    partitionings, and engines (no RNG, no sample() nondeterminism).
    Strata with fewer than k rows keep all rows.

    Scale (two-phase top-k, TakeOrderedAndProject-style): a naive
    row_number over Window.partitionBy(strata) sorts a whole stratum on
    ONE reducer — with the engine's 70%-heavy ``source`` key that is
    0.7·corpus through a single task (the rollup "skew bomb",
    rollup.py:20-23). Instead phase 1 ranks within (stratum, salt) —
    ``n_salt`` bounded partitions per stratum, each keeping only its k
    smallest md5 ranks — and phase 2 re-ranks the ≤ k·n_salt survivors
    per stratum. The per-salt top-k of each stratum is a superset of its
    global top-k, so the selection (and the emitted ``sample_rank``,
    which phase 2 recomputes over survivors) is EXACTLY the global
    md5-rank semantics; only the heavy sort is gone. Phase-2 state is
    k·n_salt rows per stratum — metadata-sized at any corpus scale."""
    from pyspark.sql import Window

    order = [
        F.md5(F.col(id_col).cast("string")).asc(),
        F.col(id_col).asc(),
    ]
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_salt))
    local_rk = F.row_number().over(
        Window.partitionBy(strata_col, "_salt").orderBy(*order)
    )
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lrk", local_rk)
        .filter(F.col("_lrk") <= k)
    )
    rk = F.row_number().over(Window.partitionBy(strata_col).orderBy(*order))
    return (
        survivors.withColumn("sample_rank", rk)
        .filter(F.col("sample_rank") <= k)
        .drop("_salt", "_lrk")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    len_col: str = "n_chars",
    keys: tuple[str, ...] = ("source",),
    order_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Token-stream packing: assign each document the training chunk its
    stream offset falls in when documents are concatenated in
    ``order_col`` order within each key group (GPT-style pretraining
    packs one continuous stream per shard and cuts every ``budget``
    tokens — bin = floor(start_offset / budget)). Emits the running
    offset and bin id per document. ``order_col`` must be numeric (the
    engine contract: dense int64 doc ids) so contiguous id ranges form
    order-preserving buckets.

    Scale (two-phase distributed prefix sum): a running-sum window over
    Window.partitionBy(keys) alone funnels the whole key group through
    ONE reducer's sort — fatal on the 70%-heavy ``source``. Instead:
    stage 1 computes the within-bucket running sum per
    (keys, floor(order/bucket_width)) — bounded partitions of ≤
    bucket_width docs each, parallel across the hot source; stage 2
    aggregates one total per bucket (map-side combined), prefix-scans
    the bucket-totals table (tiny: id_range/bucket_width rows per key —
    ~10^6 at 10^12 docs with the default width) and broadcast-joins each
    bucket's starting offset back. start = bucket_offset +
    within_bucket_running − len. Identical output to the single-window
    form; no sort anywhere exceeds bucket_width rows."""
    from pyspark.sql import Window

    bucket = F.floor(F.col(order_col) / F.lit(bucket_width)).cast("long")
    base = df.withColumn("_pb", bucket)
    w_in = (
        Window.partitionBy(*keys, "_pb")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.withColumn(
        "_run_in", F.sum(F.col(len_col)).over(w_in).cast("long")
    )
    totals = base.groupBy(*keys, "_pb").agg(
        F.sum(len_col).cast("long").alias("_bt")
    )
    w_pre = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_pb").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_boff", F.coalesce(F.sum("_bt").over(w_pre), F.lit(0)).cast("long")
    ).drop("_bt")
    out = base.join(F.broadcast(offsets), [*keys, "_pb"])
    start = (F.col("_boff") + F.col("_run_in") - F.col(len_col)).cast("long")
    return (
        out.withColumn("start_offset", start)
        .withColumn(
            "pack_bin",
            F.floor(F.col("start_offset") / F.lit(budget)).cast("long"),
        )
        .drop("_pb", "_run_in", "_boff")
    )


def source_mixture_weights(
    df: DataFrame,
    tau: float = 0.7,
    size_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus source (the
    GPT-3/Pile mixture recipe: weight_s proportional to size_s^tau,
    tau<1 upweights small sources; tau=1 is natural sampling).

    Output: one row per source with n_docs, total size, the natural
    share, and the tau-scaled mixture weight (both normalized to sum 1).

    Scale shape: one partial+final hash aggregate keyed by `source`
    (bounded cardinality — sources are a curated list, not data-scale),
    then a broadcast single-row totals join. No window, no collect; the
    70%-skewed hot source combines map-side like any algebraic agg."""
    per = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).cast("double").alias("size_total"),
    )
    pw = per.withColumn("w_raw", F.pow(F.col("size_total"), F.lit(float(tau))))
    tot = pw.agg(
        F.sum("w_raw").alias("w_tot"), F.sum("size_total").alias("sz_tot")
    )
    return (
        pw.join(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            F.col("size_total").cast("long").alias("size_total"),
            (F.col("size_total") / F.col("sz_tot")).alias("natural_share"),
            (F.col("w_raw") / F.col("w_tot")).alias("mixture_weight"),
        )
    )
