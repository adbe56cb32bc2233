"""Shared helper: grouped-map applyInPandas with an optional synthetic key
(the reference operates on a single whole-frame series; Spark needs a
grouping key — callers without one get a constant key, which is fine for
parity fixtures and wrong at scale, so engine paths always pass real keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_apply(df: DataFrame, keys: list[str], fn, schema: str) -> DataFrame:
    if keys:
        return df.groupBy(*keys).applyInPandas(fn, schema=schema)
    with_key = df.withColumn("__g__", F.lit(0))

    def drop_key(pdf):
        return fn(pdf.drop(columns="__g__"))

    return with_key.groupBy("__g__").applyInPandas(drop_key, schema=schema)
