"""Subsequence segmentation (SURVEY.md §2.5, FIXTURES.md F7).

Replicates SubsequenceSegmentationPrimitive
(tods/timeseries_processing/SubsequenceSegmentation.py:359-446):
``valid_len = ceil(n/step)``; the series is zero-padded with ``window_size``
rows at the tail; output row i = ``X[i*step : i*step+w, :]`` flattened
column-major (order='F') into w·k columns ``output_0..output_{w·k-1}``.

Two implementations:

* ``segment_sql`` — pure Catalyst: a row frame ``collect_list`` per column
  over ``rowsBetween(0, w-1)``, zero-padded with ``concat``/``slice`` array
  ops, rows kept where ``(row_number-1) % step == 0``. No Python at all;
  window exec + codegen'd array expressions. Preferred at scale: the only
  shuffle is the per-series partitionBy.

* ``segment_pandas`` — grouped-map Arrow UDF running the numpy kernel per
  series, used as a cross-check and for callers that want the matrix in one
  batch (e.g. detector scoring).

Output schema: keys + ``seg_id`` (0-based subsequence index) + ``output``
(array<double>, the F-order flattened w·k values). The reference's separate
``output_i`` scalar columns are a pivot of this array; keeping it as an array
is the columnar-friendly form (and what the detection plumbing consumes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def segment_sql(
    df: DataFrame,
    value_cols: list[str],
    window_size: int,
    step: int = 1,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> DataFrame:
    keys = keys or []
    w = Window.partitionBy(*keys).orderBy(order_col)
    frame = w.rowsBetween(0, window_size - 1)
    rn = F.row_number().over(w)
    cnt = F.count(F.lit(1)).over(
        Window.partitionBy(*keys).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    # per-column trailing-forward slice, zero-padded to window_size
    arrays = []
    for c in value_cols:
        a = F.collect_list(F.col(c).cast("double")).over(frame)
        pad = F.array_repeat(F.lit(0.0), window_size)
        padded = F.slice(F.concat(a, pad), 1, window_size)
        arrays.append(padded)
    flat = F.flatten(F.array(*arrays))  # column-major == per-column concat
    out = (
        df.withColumn("__rn__", rn)
        .withColumn("__n__", cnt)
        .withColumn("output", flat)
        .filter((F.col("__rn__") - 1) % step == 0)
        .select(
            *keys,
            (((F.col("__rn__") - 1) / step).cast("long")).alias("seg_id"),
            "output",
        )
    )
    return out


def segment_pandas(
    df: DataFrame,
    value_cols: list[str],
    window_size: int,
    step: int = 1,
    keys: list[str] | None = None,
    order_col: str = "timestamp",
) -> DataFrame:
    keys = keys or ["__g__"]
    add_dummy = "__g__" in keys
    if add_dummy:
        df = df.withColumn("__g__", F.lit(0))
    key_fields = ", ".join(f"{k} string" for k in keys) if not add_dummy else "__g__ int"
    schema = f"{key_fields}, seg_id long, output array<double>"

    def seg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        X = pdf[value_cols].to_numpy(dtype=float)
        n, k = X.shape
        valid_len = int(np.ceil(n / step))
        Xp = np.vstack([X, np.zeros((window_size, k))])
        rows = []
        for i in range(valid_len):
            rows.append(Xp[i * step : i * step + window_size, :].flatten(order="F"))
        out = pd.DataFrame({"seg_id": np.arange(valid_len), "output": rows})
        for kcol in keys:
            out[kcol] = pdf[kcol].iloc[0]
        return out[[*keys, "seg_id", "output"]]

    res = df.groupBy(*keys).applyInPandas(seg, schema=schema)
    return res.drop("__g__") if add_dummy else res
