"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.12 — net-new engine capability; the reference is batch-only).

The flagship is a STREAMING twin of the SES smoothing recurrence
(operators/smoothing.ses_fitted): recurrences carry their level across
micro-batches in GroupState, so an unbounded stream produces exactly the
values the batch operator produces on the concatenated input — the parity
test drives the same rows through both paths and asserts bitwise equality.

Ordering contract: within a key, rows must arrive in event-time order
across micro-batches (Kafka per-key ordering / file-source lexicographic
order); each batch is additionally sorted on the timestamp column before
folding, so intra-batch disorder is absorbed. Cross-batch disorder is a
watermark/reconciliation concern — same story as the streaming rollup
(late rows are reconciled by the batch re-rollup via the checkpoint
table).

State is O(1) per key (the smoothing level + a started flag) — no growth,
no timeout needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_ses(
    stream_df: DataFrame,
    value_col: str = "v",
    ts_col: str = "window_start",
    key_col: str = "event_type",
    alpha: float = 0.2,
) -> DataFrame:
    """Streaming SES fittedvalues (SimpleExponentialSmoothing.py:186
    semantics, statsmodels legacy init l0 = y0):

        fitted[0] = y0;  fitted[t] = l_{t-1};  l_t = α·y_t + (1−α)·l_{t-1}

    One GroupState row per key: (level, started). Emits one output row per
    input row in append mode."""
    out_schema = (
        f"`{key_col}` string, `{ts_col}` timestamp, "
        f"`{value_col}` double, `{value_col}_ses` double"
    )
    state_schema = "level double, started boolean"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            level, started = state.get
        else:
            level, started = 0.0, False
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, y in zip(pdf[ts_col], pdf[value_col]):
                y = float(y)
                if not started:
                    level, started, fitted = y, True, y
                else:
                    fitted = level
                    level = alpha * y + (1 - alpha) * level
                rows.append((key[0], ts, y, fitted))
        state.update((level, started))
        yield pd.DataFrame(
            rows, columns=[key_col, ts_col, value_col, f"{value_col}_ses"]
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_stat_window(
    stream_df: DataFrame,
    value_col: str = "v",
    ts_col: str = "window_start",
    key_col: str = "event_type",
    stat: str = "mean",
    window_size: int = 5,
    threshold: float | None = None,
) -> DataFrame:
    """Streaming trailing-window statistic + fixed-threshold label — the
    online twin of ``windows.stat_window`` (Statistical*.py semantics) for
    unbounded streams. State per key = the last window_size−1 values
    (O(w), no growth). Causality note: the batch operator backfills the
    first w−1 rows with out[w−1] (needs FUTURE values); the stream emits
    the partial-window stat there instead, and the parity contract is
    rows t ≥ w−1, where both paths compute the identical full-window
    trailing stat. `threshold` (if given) appends the binarize label the
    reference's Statistical ops expose."""
    import numpy as np

    fns = {"mean": np.mean, "maximum": np.max, "minimum": np.min,
           "vec_sum": np.sum, "std": lambda a: np.std(a),
           "abs_energy": lambda a: float((np.asarray(a) ** 2).sum())}
    kern = fns[stat]
    out_schema = (
        f"`{key_col}` string, `{ts_col}` timestamp, "
        f"`{value_col}` double, `{value_col}_{stat}` double"
        + (", label int" if threshold is not None else "")
    )
    state_schema = "buf array<double>"

    def fn(key, pdfs, state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, y in zip(pdf[ts_col], pdf[value_col]):
                y = float(y)
                buf.append(y)
                if len(buf) > window_size:
                    buf.pop(0)
                sv = float(kern(np.asarray(buf)))
                row = [key[0], ts, y, sv]
                if threshold is not None:
                    row.append(int(sv > threshold))
                rows.append(tuple(row))
        state.update((buf[-(window_size - 1):] if window_size > 1 else [],))
        cols = [key_col, ts_col, value_col, f"{value_col}_{stat}"]
        if threshold is not None:
            cols.append("label")
        yield pd.DataFrame(rows, columns=cols)

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_stateful_stream_from_parquet(
    spark,
    src_dir: str,
    schema,
    query_name: str = "ses_stream",
    value_col: str = "v",
    ts_col: str = "window_start",
    key_col: str = "event_type",
    alpha: float = 0.2,
) -> DataFrame:
    """Drive the stateful SES synchronously over a parquet directory, one
    file per micro-batch (sandbox harness — the cross-batch state carry is
    exactly what the parity test exercises)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_ses(stream, value_col=value_col, ts_col=ts_col,
                        key_col=key_col, alpha=alpha)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
