"""Token-payload operators: per-position token statistics and token-level
invariant checks (north star: "per-position token stats"; nearest reference
analogue is axiswise scaling, tods/timeseries_processing/SKAxiswiseScaler.py:99-111).

Input: the F0 table (doc_id, tokens array<int32>, n_tok, source).

Two implementations with identical output:

* ``position_stats_sql`` — ``posexplode(tokens)`` + groupBy(keys, pos).
  Pure Catalyst, oracle-checkable, but the explode multiplies the row count
  by mean(n_tok) (~up to 2048×) BEFORE the shuffle — at 10^12 docs that is
  the bottleneck.

* ``position_stats`` (scale path) — two-level aggregation that never
  explodes: mapInPandas computes per-Arrow-batch PARTIAL stat arrays
  (count/sum/min/max per position, vectorized numpy over the ragged batch),
  emitting one fixed-width row per (key, batch); a tiny groupBy then merges
  partials. Shuffle volume = #batches × MAX_TOK ints instead of
  #docs × n_tok — a ~10^5× reduction at batch size 10k. This is the
  map-side-combine pattern expressed with Arrow UDFs.

``token_fingerprint`` / ``verify_token_equality`` implement the bitwise
token-array invariant (BASELINE.json input_hint): equality is checked by an
order-insensitive join on doc_id comparing xxhash64 of the serialized array —
no token payload ever crosses the wire for the check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAX_POS_DEFAULT = 2048


def position_stats_sql(
    df: DataFrame,
    keys: tuple[str, ...] = ("source",),
    tokens_col: str = "tokens",
    max_pos: int | None = None,
) -> DataFrame:
    ex = df.select(*keys, F.posexplode(tokens_col).alias("pos", "tok"))
    if max_pos is not None:
        ex = ex.filter(F.col("pos") < max_pos)
    return ex.groupBy(*keys, "pos").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("tok").cast("double")).alias("sum_tok"),
        F.min("tok").alias("min_tok"),
        F.max("tok").alias("max_tok"),
        (F.sum(F.col("tok").cast("double")) / F.count(F.lit(1))).alias("avg_tok"),
    )


def position_stats(
    df: DataFrame,
    keys: tuple[str, ...] = ("source",),
    tokens_col: str = "tokens",
    max_pos: int = MAX_POS_DEFAULT,
) -> DataFrame:
    """Explode-free per-position stats via partial-aggregate Arrow batches."""
    key_list = list(keys)
    partial_schema = (
        ", ".join(f"{k} string" for k in key_list)
        + ", cnt array<long>, sum_tok array<double>, "
        + "min_tok array<int>, max_tok array<int>"
    )

    def partials(batches):
        for pdf in batches:
            for kv, grp in pdf.groupby(key_list, sort=False):
                if not isinstance(kv, tuple):
                    kv = (kv,)
                toks = grp[tokens_col].to_numpy()
                lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                                   count=len(toks))
                lens = np.minimum(lens, max_pos)
                total = int(lens.sum())
                if total == 0:
                    continue
                flat = np.empty(total, dtype=np.int64)
                pos = np.empty(total, dtype=np.int64)
                off = 0
                for t, ln in zip(toks, lens):
                    flat[off : off + ln] = np.asarray(t[:ln], dtype=np.int64)
                    pos[off : off + ln] = np.arange(ln)
                    off += ln
                width = int(lens.max())
                cnt = np.bincount(pos, minlength=width)
                ssum = np.bincount(pos, weights=flat.astype(np.float64),
                                   minlength=width)
                order = np.lexsort((flat, pos))
                ps, fs = pos[order], flat[order]
                first = np.searchsorted(ps, np.arange(width), side="left")
                last = np.searchsorted(ps, np.arange(width), side="right") - 1
                mn = fs[first].astype(np.int32)
                mx = fs[last].astype(np.int32)
                yield pd.DataFrame(
                    {
                        **{k: [v] for k, v in zip(key_list, kv)},
                        "cnt": [cnt],
                        "sum_tok": [ssum],
                        "min_tok": [mn],
                        "max_tok": [mx],
                    }
                )

    part = df.select(*key_list, tokens_col).mapInPandas(
        partials, schema=partial_schema
    )

    merge_schema = (
        ", ".join(f"{k} string" for k in key_list)
        + ", pos int, cnt long, sum_tok double, min_tok int, max_tok int, avg_tok double"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        width = max(len(c) for c in pdf["cnt"])
        cnt = np.zeros(width, dtype=np.int64)
        ssum = np.zeros(width, dtype=np.float64)
        mn = np.full(width, np.iinfo(np.int32).max, dtype=np.int64)
        mx = np.full(width, np.iinfo(np.int32).min, dtype=np.int64)
        for c, s, lo, hi in zip(pdf["cnt"], pdf["sum_tok"], pdf["min_tok"], pdf["max_tok"]):
            ln = len(c)
            cnt[:ln] += np.asarray(c, dtype=np.int64)
            ssum[:ln] += np.asarray(s, dtype=np.float64)
            mn[:ln] = np.minimum(mn[:ln], np.asarray(lo, dtype=np.int64))
            mx[:ln] = np.maximum(mx[:ln], np.asarray(hi, dtype=np.int64))
        out = pd.DataFrame(
            {
                "pos": np.arange(width, dtype=np.int32),
                "cnt": cnt,
                "sum_tok": ssum,
                "min_tok": mn.astype(np.int32),
                "max_tok": mx.astype(np.int32),
                "avg_tok": ssum / np.maximum(cnt, 1),
            }
        )
        for k in key_list:
            out[k] = pdf[k].iloc[0]
        return out[[*key_list, "pos", "cnt", "sum_tok", "min_tok", "max_tok", "avg_tok"]]

    return part.groupBy(*key_list).applyInPandas(merge, schema=merge_schema)


def token_fingerprint(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """64-bit fingerprint of each token array (xxhash64 over the casted
    string form — stable across partitionings; used for cheap equality)."""
    return df.withColumn(
        "tok_fp", F.xxhash64(F.col(tokens_col).cast("array<int>"))
    )


def verify_token_equality(
    a: DataFrame, b: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> int:
    """Order-insensitive bitwise equality check: join on doc_id, compare
    array fingerprints AND arrays; returns number of mismatching docs (0 =
    invariant holds). Runs distributed; only counts cross the driver."""
    fa = token_fingerprint(a.select(id_col, tokens_col), tokens_col).select(
        id_col, F.col("tok_fp").alias("fp_a"), F.col(tokens_col).alias("t_a")
    )
    fb = token_fingerprint(b.select(id_col, tokens_col), tokens_col).select(
        id_col, F.col("tok_fp").alias("fp_b"), F.col(tokens_col).alias("t_b")
    )
    j = fa.join(fb, id_col, "full")
    bad = j.filter(
        F.col("fp_a").isNull()
        | F.col("fp_b").isNull()
        | (F.col("fp_a") != F.col("fp_b"))
        | (F.col("t_a") != F.col("t_b"))
    )
    return bad.count()
