"""As-of join: enrich a raw event stream with the most recent rolled-up
point at or before each row's timestamp — the serving pattern for
continuous aggregates ("attach the last CLOSED hourly aggregate to every
incoming event"). Spark has no ASOF JOIN operator (DuckDB/kdb do); this
implements it as a composition Catalyst can optimize instead of a
per-row lookup.

No reference analogue (TODS joins are exact-key Denormalize); the op is
the tier-serving half of the rollup engine (operators/rollup.py).

Design (dense-grid forward-fill + equi-join — the distributed as-of):
  1. the rolled-up tier is expanded to a DENSE per-key hourly grid
     (sequence(min_hour, max_hour) per key) and forward-filled with
     `last(..., ignorenulls)` — the window runs over the TIER table
     only, whose per-key cardinality is bounded by calendar time
     (exactly the boundedness argument gap_fill_tier relies on,
     gapfill.py), never over the raw stream;
  2. each raw row computes the hour it should read (`date_trunc('hour',
     ts) - 1 hour`: the last CLOSED window — the current hour's
     aggregate is still accumulating in a streaming deployment) and
     equi-joins the grid on (key, hour).
The big side therefore never sorts and never shuffles: the grid is
hours x keys (broadcastable for bounded key sets; AQE picks
broadcast-hash at runtime), so the plan is scan -> project ->
BroadcastHashJoin. A range join or a window over the raw stream — the
naive as-of encodings — would shuffle and sort 10^12 rows; this shape
moves only the tier.

For UNBOUNDED key sets (per-doc as-of at 10^12 keys) the same two-phase
split applies bucketed: grid per (key-bucket, hour) with per-bucket
boundary carry — the pack_sequences prefix-sum pattern (preprocessing
.py); not needed for the engine's bounded event_type/source keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_enrich(
    events: DataFrame,
    tier: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    time_col: str = "ts",
    tier_time_col: str = "window_start",
    step: str = "1 hour",
    value_cols: tuple[str, ...] = ("cnt", "avg_value"),
) -> DataFrame:
    """Attach to every event row the latest tier point whose
    ``tier_time_col`` <= the event's last closed ``step`` boundary.
    Events before their key's first tier point are dropped (inner as-of,
    DuckDB `ASOF JOIN` semantics). Output columns: the event row plus
    ``asof_<tier_time_col>`` and ``asof_<v>`` for each value column."""
    kl = list(keys)
    bounds = tier.groupBy(*kl).agg(
        F.min(tier_time_col).alias("_lo"), F.max(tier_time_col).alias("_hi")
    )
    grid = bounds.select(
        *kl,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("_hour"),
    )
    g = grid.join(
        tier.withColumnRenamed(tier_time_col, "_hour"), [*kl, "_hour"], "left"
    )
    w = (
        Window.partitionBy(*kl)
        .orderBy("_hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    present = F.col(value_cols[0]).isNotNull()
    ff = g.select(
        *kl,
        "_hour",
        F.last(F.when(present, F.col("_hour")), ignorenulls=True)
        .over(w)
        .alias(f"asof_{tier_time_col}"),
        *[
            F.last(v, ignorenulls=True).over(w).alias(f"asof_{v}")
            for v in value_cols
        ],
    )
    unit = step.split()[-1].rstrip("s")  # "1 hour" -> "hour"
    # Clamp each event's lookup hour to the key's LAST tier point: an
    # event arriving after the final rollup still reads that final point
    # (merge_asof/ASOF-JOIN backward semantics); only events BEFORE the
    # key's first point drop (inner as-of). bounds is one row per key —
    # broadcast, no shuffle on the big side.
    ev = events.join(F.broadcast(bounds.select(*kl, "_hi")), kl).withColumn(
        "_hour",
        F.least(
            F.date_trunc(unit, F.col(time_col)) - F.expr(f"INTERVAL {step}"),
            F.col("_hi"),
        ),
    ).drop("_hi")
    return ev.join(F.broadcast(ff), [*kl, "_hour"], "inner").drop("_hour")
