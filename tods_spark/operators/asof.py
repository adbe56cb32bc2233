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

For UNBOUNDED key sets (per-doc/per-user as-of at 10^12 keys) the grid
cannot be built per key × calendar (keys × hours explodes) nor
broadcast: `asof_enrich_unbounded` instead derives each tier point's
VALIDITY INTERVAL with a window over the TIER ONLY (per-key rows are
bounded by points-per-key), clamps the last interval to the key's event
horizon (one hash-agg over events), explodes intervals to a sparse
step-aligned grid, and equi-joins events to it. The raw side is never
windowed and never sorted outside the join exchange — one shuffle on
(key, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _step_unit(step: str) -> str:
    """'1 hour' -> 'hour', asserting the step is exactly ONE calendar
    unit: the event-side lookup bucket is date_trunc(unit) - step, which
    lands on the tier's sequence(...) grid only when step == 1 unit
    ('6 hours' or '15 minutes' would fall off-grid and the final inner
    join would silently drop events instead of erroring)."""
    parts = step.split()
    if len(parts) != 2 or parts[0] != "1":
        raise ValueError(
            f"asof step must be exactly '1 <unit>' (got {step!r}): "
            "date_trunc-based lookup buckets only align with the tier "
            "grid for single-unit steps"
        )
    return parts[1].rstrip("s")


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
    unit = _step_unit(step)
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
    # no broadcast hint on the grid: its size is keys × calendar span, so
    # a hard hint would bypass AQE's size threshold and risk the broadcast
    # limit / driver memory on long retention horizons — AQE picks
    # broadcast-hash at runtime whenever the grid is actually small
    return ev.join(ff, [*kl, "_hour"], "inner").drop("_hour")


def asof_enrich_unbounded(
    events: DataFrame,
    tier: DataFrame,
    keys: tuple[str, ...] = ("user_id",),
    time_col: str = "ts",
    tier_time_col: str = "window_start",
    step: str = "1 hour",
    value_cols: tuple[str, ...] = ("cnt", "avg_value"),
) -> DataFrame:
    """As-of enrich for UNBOUNDED key sets (per-user / per-doc at 10^12
    keys), same semantics as `asof_enrich` (backward as-of against the
    last CLOSED `step` window; events before their key's first tier point
    drop — inner as-of).

    Shape (nothing dense, nothing broadcast, no window over the raw
    side):
      1. each TIER point's validity interval [t_i, t_{i+1} - step] via
         `lead` — a window over the tier only, per-key cardinality
         bounded by points-per-key (the rollup already collapsed raw
         rows);
      2. the last interval is clamped to the key's event horizon
         (max lookup bucket), a single hash-agg over events with one
         output row per key — and keys with no events produce no grid;
      3. intervals explode to a SPARSE step-aligned grid: one row per
         (key, bucket) actually covered between the key's first point
         and its last event — Σ_k span_k buckets, the distributed
         equivalent of the bounded variant's keys × hours grid;
      4. events compute their lookup bucket (projection only) and
         equi-join the grid on (key, bucket).
    The raw side's only exchange is the final join's hash partitioning;
    keys are high-cardinality and uniform, so no salting is needed (AQE
    skew-join covers pathological keys).
    """
    kl = list(keys)
    unit = _step_unit(step)
    step_iv = F.expr(f"INTERVAL {step}")
    ev = events.withColumn(
        "_hour", F.date_trunc(unit, F.col(time_col)) - step_iv
    )
    ev_hi = ev.groupBy(*kl).agg(F.max("_hour").alias("_ev_hi"))
    w = Window.partitionBy(*kl).orderBy(tier_time_col)
    iv = (
        tier.join(ev_hi, kl, "inner")
        .withColumn("_next", F.lead(tier_time_col).over(w))
        .withColumn(
            "_end",
            F.least(
                F.coalesce(F.col("_next") - step_iv, F.col("_ev_hi")),
                F.col("_ev_hi"),
            ),
        )
        .filter(F.col("_end") >= F.col(tier_time_col))
    )
    grid = iv.select(
        *kl,
        F.col(tier_time_col).alias(f"asof_{tier_time_col}"),
        *[F.col(v).alias(f"asof_{v}") for v in value_cols],
        F.explode(
            F.sequence(tier_time_col, "_end", step_iv)
        ).alias("_hour"),
    )
    return ev.join(grid, [*kl, "_hour"], "inner").drop("_hour")
