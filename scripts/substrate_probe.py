"""60-second substrate probe: is THIS host currently in the degraded
regime? (No Spark — safe to run before committing to a 60-minute paired
scaling session.)

Two micro-benchmarks at two worker counts (2 vs 8 processes):

  * warm  — hashlib.sha256 over a reused buffer (pure CPU, warm pages):
            measures scheduler/steal interference. Healthy: scale2to8
            near 4 (this kernel typically 3.0-3.9).
  * fault — touch fresh 64 MiB per worker (first-touch page faults):
            measures the globally-serialized fault path. Healthy: ~1.5-2x;
            degraded: < 1 (more workers = LESS total throughput).

Output: one JSON line with per-mode aggregate throughput at both widths,
the 2->8 scaling ratio (ideal 4.0), and load1 before/after. Compare with
BENCH/BASELINE.md "environment ceiling" and the session F/G/H records.

Usage: python scripts/substrate_probe.py [seconds_per_cell]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time


def _warm_worker(stop_at: float, out) -> None:
    buf = b"x" * (1 << 20)
    n = 0
    while time.time() < stop_at:
        hashlib.sha256(buf).digest()
        n += 1
    out.put(n)


def _fault_worker(stop_at: float, out) -> None:
    n = 0
    page = 4096
    while time.time() < stop_at:
        b = bytearray(64 << 20)  # fresh 64 MiB
        for i in range(0, len(b), page):
            b[i] = 1
        del b
        n += 1
    out.put(n)


def run_cell(worker, nproc: int, seconds: float) -> float:
    out = mp.Queue()
    stop_at = time.time() + seconds
    procs = [mp.Process(target=worker, args=(stop_at, out))
             for _ in range(nproc)]
    t0 = time.time()
    for p in procs:
        p.start()
    total = sum(out.get() for _ in procs)
    for p in procs:
        p.join()
    return total / (time.time() - t0)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    load_before = os.getloadavg()[0]
    result = {"seconds_per_cell": seconds, "load1_before": round(load_before, 2)}
    for mode, worker in (("warm", _warm_worker), ("fault", _fault_worker)):
        r2 = run_cell(worker, 2, seconds)
        r8 = run_cell(worker, 8, seconds)
        result[f"{mode}_tput_2"] = round(r2, 1)
        result[f"{mode}_tput_8"] = round(r8, 1)
        result[f"{mode}_scale_2to8"] = round(r8 / r2, 2)
    result["load1_after"] = round(os.getloadavg()[0], 2)
    # verdict heuristic calibrated on sessions C-H: a quiet healthy host
    # shows warm scale >= 3.0; the degraded regime shows < 2.5 (steal /
    # convoy) and/or fault scale < 1.0
    result["degraded"] = bool(
        result["warm_scale_2to8"] < 2.5 or result["fault_scale_2to8"] < 0.8
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
