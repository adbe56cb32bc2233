"""Deterministic synthetic token-table generator (FIXTURES.md F0).

Schema per BASELINE.json input_hint:
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string
plus a derived event-time column ``ts`` (deterministic function of the doc
index, with injected duplicate timestamps and gaps to exercise dedup and
gap-fill).

Every field is a pure vectorized-numpy function of the doc index ``i`` and the
seed (splitmix64 counter-based hashing), so generation is:
  * partition-order independent — the same rows come out no matter how Spark
    splits `spark.range(n)` across executors (critical for the bitwise
    token-equality invariant across shuffles/repartitions);
  * identically computable in the pandas oracle (tests call the same
    ``gen_pandas`` kernel), giving bitwise token-array parity for free.

At cluster scale this generator is embarrassingly parallel: `spark.range(n)`
splits the index space; `mapInPandas` produces Arrow batches with zero
shuffle. 10^12 docs is just a bigger range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB = 50257
MAX_TOK = 2048
EPOCH0 = 1_600_000_000  # 2020-09-13T12:26:40Z
SOURCES = np.array(["web", "code", "books", "wiki", "chat"])
# heavy `web` key (~70%) by construction to force skew handling
SOURCE_CDF = np.array([0.70, 0.80, 0.88, 0.95, 1.00])

SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def gen_pandas(indices: np.ndarray, seed: int = 42, cadence_s: int = 7) -> pd.DataFrame:
    """Generate rows for the given doc indices. Pure function of (i, seed,
    cadence_s). `cadence_s` sets the base inter-doc spacing — 7 s for the
    parity fixtures (FIXTURES.md F0), smaller for dense bench tables."""
    i = np.asarray(indices, dtype=np.uint64)
    s = np.uint64(seed)

    # n_tok: log-uniform-ish in [1, MAX_TOK] (Zipf-flavored length skew)
    u_len = _u01(i * np.uint64(0x9E3779B1) + s)
    n_tok = np.minimum(
        np.floor(np.exp(u_len * np.log(MAX_TOK))).astype(np.int64), MAX_TOK
    ).astype(np.int32)

    # source: skewed categorical
    u_src = _u01(i * np.uint64(0xC2B2AE35) + s + np.uint64(1))
    src_idx = np.searchsorted(SOURCE_CDF, u_src, side="left")
    source = SOURCES[np.minimum(src_idx, len(SOURCES) - 1)]

    # ts: ~7s cadence with deterministic jitter; every 97th doc repeats the
    # previous second (duplicates), and every 211th jumps 10 min (gaps).
    def _ts(idx: np.ndarray) -> np.ndarray:
        base = idx.astype(np.int64) * cadence_s
        jitter = (
            _splitmix64(idx + s + np.uint64(2)) % np.uint64(min(5, cadence_s))
        ).astype(np.int64)
        gaps = (idx.astype(np.int64) // 211) * 600
        return EPOCH0 + base + jitter + gaps

    ts_sec = _ts(i)
    # every 97th doc repeats the PREVIOUS doc's exact timestamp (duplicate
    # injection for the dedup operators — computed from i-1, so it stays a
    # pure function of the row index)
    dup_mask = (i % np.uint64(97)) == np.uint64(96)
    ts_sec = np.where(dup_mask, _ts(i - np.uint64(1)), ts_sec)

    # tokens: token j of doc i = splitmix64(i*PRIME + j + seed') % VOCAB
    total = int(n_tok.sum())
    doc_rep = np.repeat(i, n_tok)
    starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    pos = np.arange(total, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), n_tok
    )
    flat = (
        _splitmix64(doc_rep * np.uint64(0x85EBCA77) + pos + s + np.uint64(3))
        % np.uint64(VOCAB)
    ).astype(np.int32)
    bounds = np.cumsum(n_tok)[:-1]
    tokens = np.split(flat, bounds)

    return pd.DataFrame(
        {
            "doc_id": np.char.add("doc-", np.char.zfill(i.astype("U12"), 12)),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
            "ts": pd.to_datetime(ts_sec, unit="s"),
        }
    )


def token_table(spark, n_docs: int, seed: int = 42, partitions: int | None = None,
                cadence_s: int = 7):
    """Distributed token table: spark.range → mapInPandas, zero shuffle."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            yield gen_pandas(pdf["id"].to_numpy(np.uint64), seed, cadence_s)

    return rng.mapInPandas(gen, schema=SCHEMA)
