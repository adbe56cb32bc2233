"""Gorilla codec: bitwise round-trip property tests + Spark pack/unpack +
size assertion (SURVEY.md §7 Phase 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from tods_spark.datagen import token_table
from tods_spark.functions import gorilla
from tods_spark.operators import compression
from tods_spark.operators.rollup import rollup_raw


def _roundtrip(ts, vals):
    blob = gorilla.encode_series(np.asarray(ts, np.int64), np.asarray(vals, float))
    ts2, vals2 = gorilla.decode_series(blob)
    np.testing.assert_array_equal(np.asarray(ts, np.int64), ts2)
    # bitwise equality, NaN-safe
    np.testing.assert_array_equal(
        np.asarray(vals, float).view(np.uint64), vals2.view(np.uint64)
    )
    return blob


def test_roundtrip_regular_series():
    ts = 1_600_000_000 + 60 * np.arange(1440)
    vals = np.sin(np.arange(1440) / 10.0) * 100 + 500
    blob = _roundtrip(ts, vals)
    # regular timestamps compress to ~1 bit each; values vary → still < 16B
    assert len(blob) < 1440 * 16 * 0.8


def test_roundtrip_constant_values():
    ts = np.arange(0, 1000 * 60, 60) + 5
    vals = np.full(1000, 42.5)
    blob = _roundtrip(ts, vals)
    assert len(blob) < 1000 * 2  # ~2 bits/point + header


def test_roundtrip_edge_cases():
    _roundtrip([7], [1.23])
    _roundtrip([], [])
    _roundtrip([1, 2], [0.0, -0.0])
    _roundtrip([0, 10**15, 2 * 10**15 + 3], [np.inf, -np.inf, np.nan])
    # full-64-bit xor (length == 64 path)
    _roundtrip([1, 2], [np.float64(0.0), np.frombuffer(b"\xff" * 8, np.float64)[0]])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_roundtrip_property(pairs):
    ts = np.sort(np.array([p[0] for p in pairs], np.int64))
    vals = np.array([p[1] for p in pairs], float)
    _roundtrip(ts, vals)


def test_spark_pack_unpack_roundtrip(spark):
    raw = token_table(spark, 3000, partitions=5)
    t1m = rollup_raw(raw, "1m").cache()
    packed = compression.pack_tier(t1m, value_col="avg_n_tok", chunk="1 day")
    unpacked = compression.unpack_tier(packed, value_col="avg_n_tok")
    a = t1m.select("source", "window_start", "avg_n_tok").orderBy(
        "source", "window_start"
    ).toPandas()
    b = unpacked.orderBy("source", "window_start").toPandas()
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["source"].values, b["source"].values)
    np.testing.assert_array_equal(
        a["window_start"].values.astype("datetime64[s]"),
        b["window_start"].values.astype("datetime64[s]"),
    )
    np.testing.assert_array_equal(
        a["avg_n_tok"].to_numpy().view(np.uint64),
        b["avg_n_tok"].to_numpy().view(np.uint64),
    )
    rep = compression.compression_report(packed).collect()[0]
    assert rep["points"] == len(a)
    assert rep["bytes_per_point"] < 16.0
    t1m.unpersist()
