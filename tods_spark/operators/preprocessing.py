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
) -> DataFrame:
    """Deterministic exactly-k-per-stratum sample — the data-mixture
    selection step of a pretraining pipeline ("take k docs per source").
    Selection order is md5(id) within each stratum: stable across runs,
    partitionings, and engines (no RNG, no sample() nondeterminism).
    Strata with fewer than k rows keep all rows.

    Scale: one hash-partitioned window per stratum — rank state is
    per-stratum, never global; a hot stratum is one reducer's sort of
    its own rows (salt the stratum upstream if a single stratum exceeds
    an executor)."""
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            F.md5(F.col(id_col).cast("string")).asc(),
            F.col(id_col).asc(),
        )
    )
    return (
        df.withColumn("sample_rank", rk)
        .filter(F.col("sample_rank") <= k)
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    len_col: str = "n_chars",
    keys: tuple[str, ...] = ("source",),
    order_col: str = "doc_id",
) -> DataFrame:
    """Token-stream packing: assign each document the training chunk its
    stream offset falls in when documents are concatenated in
    ``order_col`` order within each key group (GPT-style pretraining
    packs one continuous stream per shard and cuts every ``budget``
    tokens — bin = floor(start_offset / budget)). Emits the running
    offset and bin id per document.

    Scale: a running-sum window per key group — linear state, bounded by
    the group (one source-shard), no global ordering anywhere."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(len_col)).over(w)
    start = (running - F.col(len_col)).cast("long")
    return (
        df.withColumn("start_offset", start)
        .withColumn("pack_bin", F.floor(start / F.lit(budget)).cast("long"))
    )
