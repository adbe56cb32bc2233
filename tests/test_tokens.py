"""Per-position token stats (SQL vs scale path vs pandas oracle) and the
bitwise token-equality invariant across repartitions (BASELINE.json)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tods_spark.datagen import gen_pandas, token_table
from tods_spark.operators import tokens as TK


def _oracle_position_stats(pdf: pd.DataFrame):
    rows = []
    for src, grp in pdf.groupby("source"):
        width = int(grp["n_tok"].max())
        cnt = np.zeros(width, np.int64)
        ssum = np.zeros(width, np.float64)
        mn = np.full(width, 10**9, np.int64)
        mx = np.full(width, -1, np.int64)
        for t in grp["tokens"]:
            a = np.asarray(t, np.int64)
            ln = len(a)
            cnt[:ln] += 1
            ssum[:ln] += a
            mn[:ln] = np.minimum(mn[:ln], a)
            mx[:ln] = np.maximum(mx[:ln], a)
        for p in range(width):
            rows.append((src, p, cnt[p], ssum[p], mn[p], mx[p], ssum[p] / cnt[p]))
    return pd.DataFrame(
        rows, columns=["source", "pos", "cnt", "sum_tok", "min_tok", "max_tok", "avg_tok"]
    ).sort_values(["source", "pos"]).reset_index(drop=True)


def test_position_stats_both_paths(spark):
    n = 800
    df = token_table(spark, n, partitions=6).cache()
    exp = _oracle_position_stats(gen_pandas(np.arange(n)))
    for fn in (TK.position_stats_sql, TK.position_stats):
        got = fn(df).orderBy("source", "pos").toPandas()
        assert len(got) == len(exp), fn.__name__
        np.testing.assert_array_equal(got["cnt"], exp["cnt"], err_msg=fn.__name__)
        np.testing.assert_allclose(got["sum_tok"], exp["sum_tok"])
        np.testing.assert_array_equal(got["min_tok"], exp["min_tok"])
        np.testing.assert_array_equal(got["max_tok"], exp["max_tok"])
        np.testing.assert_allclose(got["avg_tok"], exp["avg_tok"])
    df.unpersist()


def test_token_equality_invariant_across_shuffles(spark):
    df = token_table(spark, 600, partitions=4)
    shuffled = df.repartition(16, "source").sortWithinPartitions("n_tok")
    assert TK.verify_token_equality(df, shuffled) == 0
    # a corrupted copy is detected
    bad = shuffled.withColumn(
        "tokens",
        F.when(F.col("doc_id") == "doc-000000000007",
               F.slice("tokens", 1, 1)).otherwise(F.col("tokens")),
    )
    assert TK.verify_token_equality(df, bad) == 1
