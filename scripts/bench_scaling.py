"""Two-parallelism scaling bench (BASELINE.md protocol): the IDENTICAL
rollup-cascade job over the same parquet token table at local[8] vs
local[32] in fresh JVMs; report points/sec at both and the scaling
efficiency (throughput_32 / throughput_8) / 4.

Methodology notes (sandbox realities, recorded for BENCH/BASELINE.md):
  * input is a parquet table generated ONCE (untimed setup) — the timed job
    is scan → 1m rollup (+digest) → 1h → 1d → gap-fill → Gorilla pack,
    i.e. the engine, not the synthetic generator;
  * one warm-up run per JVM before the timed runs: this kernel serializes
    first-touch page faults globally (~1 GB/s total across all processes),
    so cold-start allocation cost is a property of the sandbox kernel, not
    of the engine or its scaling;
  * best of `repeats` timed runs per level.

Usage: python scripts/bench_scaling.py [n_docs] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

SETUP = r"""
import sys
sys.path.insert(0, "/root/repo")
from tods_spark.session import get_spark
from tods_spark.datagen import token_table
spark = get_spark(app_name="scaling_setup", cores=8)
token_table(spark, int(sys.argv[2]), cadence_s=1).write.mode("overwrite").parquet(sys.argv[1])
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tods_spark.session import get_spark
from tods_spark.operators.rollup import AGG_COLS, full_cascade
from tods_spark.operators import compression, gapfill

path, cores, repeats, rep = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                             int(sys.argv[4]))
spark = get_spark(app_name=f"scaling_{cores}", cores=cores)

import os, tempfile
from tods_spark.operators.rollup import rollup_cascade, rollup_raw

def job():
    # logical replication: R time-shifted copies of the same parquet input.
    # Windows don't collide across copies, so compute scales linearly with R
    # while setup cost stays at one table write; both parallelism levels see
    # the identical input.
    base = spark.read.parquet(path)
    parts = [base]
    for k in range(1, rep):
        parts.append(base.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {k*24} DAYS")))
    raw = parts[0]
    for p_ in parts[1:]:
        raw = raw.unionByName(p_)
    with tempfile.TemporaryDirectory() as td:
        t1m_path = os.path.join(td, "tier_1m.parquet")
        rollup_raw(raw, "1m", with_digest=True).write.mode("overwrite").parquet(t1m_path)
        t1m = spark.read.parquet(t1m_path)
        rows = {"1m": t1m.count()}
        t1h = rollup_cascade(t1m, "1m", "1h")
        rows["1h"] = t1h.count()
        rows["1d"] = rollup_cascade(t1h, "1h", "1d").count()
        gapfill.gap_fill_tier(t1m, 60).count()
        packed = compression.pack_tier(t1m, value_col="avg_n_tok")
        packed.agg(F.sum("n_points")).collect()
    return sum(rows[t] for t in ("1m", "1h", "1d")) * len(AGG_COLS)

points = job()  # warm-up: JVM JIT, python workers, page-fault arena
best = None
for _ in range(repeats):
    t0 = time.time()
    job()
    sec = time.time() - t0
    best = sec if best is None or sec < best else best
print(json.dumps({"cores": cores, "sec": best, "points": points,
                  "pps": points / best}))
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "tokens.parquet")
        subprocess.run([sys.executable, "-c", SETUP, path, str(n_docs)],
                       check=True, capture_output=True, text=True)
        results = {}
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, "-c", WORKER, path, str(cores),
                 str(repeats), str(rep)],
                capture_output=True, text=True, check=True,
            )
            results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
            print(json.dumps(results[cores]), flush=True)
    eff = (results[32]["pps"] / results[8]["pps"]) / 4
    print(
        json.dumps(
            {
                "n_docs": n_docs, "replication": rep,
                "pps_local8": round(results[8]["pps"], 1),
                "pps_local32": round(results[32]["pps"], 1),
                "speedup_8_to_32": round(results[32]["pps"] / results[8]["pps"], 3),
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
