"""Retention policy: per-tier partition expiry (the "retention" of the
rollup+downsample+retention engine — BASELINE.json north star).

Semantics: each tier keeps a sliding horizon of day-partitions (e.g. raw
7 days, 1m 30 days, 1h 365 days, 1d forever). Expiry is PARTITION DROP, not
row delete — O(#partitions) metadata work, no data rewrite, matching
Iceberg's `expire_snapshots` + partition-predicate delete shape. The expiry
is recorded in the checkpoint log so lineage shows when data left each tier.

The cascade makes this safe: a dropped raw partition's information persists
in the coarser tiers (algebraic aggregates + merged digests), which is the
entire point of rollup-based retention.
"""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta
from pathlib import Path

from tods_spark.plans.checkpoint import CheckpointLog
from tods_spark.sources.storage import PartitionedTable

DEFAULT_HORIZON_DAYS = {"raw": 7, "1m": 30, "1h": 365, "1d": None,
                        "1w": None}


def expire_partitions(
    table: PartitionedTable,
    tier: str,
    now: datetime,
    horizon_days: int | None,
    ckpt: CheckpointLog | None = None,
    partition_col: str = "part_key",
    job_id: str = "retention",
) -> list[str]:
    """Drop day-partitions older than now - horizon. Returns dropped keys."""
    if horizon_days is None:
        return []
    cutoff = (now - timedelta(days=horizon_days)).strftime("%Y-%m-%d")
    dropped = []
    root = Path(table.path)
    if not root.exists():
        return []
    for child in sorted(root.iterdir()):
        if not child.name.startswith(f"{partition_col}="):
            continue
        key = child.name.split("=", 1)[1]
        if key < cutoff:
            shutil.rmtree(child)
            dropped.append(key)
            if ckpt is not None:
                ckpt.mark(
                    job_id=job_id, tier=tier, partition=key, rows_in=0,
                    rows_out=0, fingerprint=0, status="expired",
                )
    return dropped
