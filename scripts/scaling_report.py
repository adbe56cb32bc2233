"""Summarize a scaling-session JSONL (scripts/bench_scaling.py output).

Reports BOTH efficiency estimators, because they answer the question with
different robustness to single-box noise:

  * pair-median: median over pairs of (pps_hi/pps_lo)/factor — the
    protocol's historical headline (rounds 3-5). A ratio of two noisy
    measurements is noisier than either; kept for cross-round continuity.
  * throughput-median: (median pps_hi / median pps_lo)/factor over the
    session's clean pairs — BASELINE.md's own formula ("throughput_32 /
    throughput_8 / 4") applied to the session's central tendency; robust
    to the within-JVM outliers (GC / page-cache stalls) that produce the
    0.3-and-1.5 per-pair swings the round-5 record documents.

Clean pair = both runs gated at start AND externally-uncontaminated
during the run (the JSONL's own flags — nothing is filtered on the
efficiency value itself).

Usage: python scripts/scaling_report.py BENCH/scaling_rX_sessionY.jsonl [factor]
"""

from __future__ import annotations

import json
import statistics
import sys


def report(path: str, factor: float = 4.0) -> dict:
    pairs = []
    for ln in open(path):
        try:
            rec = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "pair" in rec and "efficiency" in rec:
            pairs.append(rec)
    clean = [
        p for p in pairs
        if p.get("gated_lo") and p.get("gated_hi")
        and not p.get("contaminated")
    ]
    use = clean or pairs

    def med(key):
        return statistics.median(p[key] for p in use)

    pair_med = med("efficiency")
    thr_med = (med("pps_hi") / med("pps_lo")) / factor
    out = {
        "file": path,
        "pairs_total": len(pairs),
        "pairs_clean": len(clean),
        "pair_median_efficiency": round(pair_med, 3),
        "median_pps_lo": round(med("pps_lo"), 1),
        "median_pps_hi": round(med("pps_hi"), 1),
        "throughput_median_efficiency": round(thr_med, 3),
        "pass_pair_median": pair_med >= 0.8,
        "pass_throughput_median": thr_med >= 0.8,
        "per_pair": [p["efficiency"] for p in pairs],
    }
    # Amdahl fit over the session's FAST STATES (min runtimes — the
    # convoy-free estimator): sec = s + p/cores with lo=2, hi=8 solves to
    # s (the per-run serial constant: driver job setup + the core-count-
    # invariant tier write) and p (single-core parallel work). The
    # convoy-free efficiency ((s+p/2)/(s+p/8))/4 is what the session
    # would measure with zero kernel-convoy noise; s bounds what run
    # length is needed for any target efficiency.
    t_lo = min(p["sec_lo"] for p in use)
    t_hi = min(p["sec_hi"] for p in use)
    p_par = (t_lo - t_hi) * 8 / 3
    s_ser = t_lo - p_par / 2
    out["amdahl"] = {
        "fast_sec_lo": round(t_lo, 1), "fast_sec_hi": round(t_hi, 1),
        "serial_s": round(s_ser, 1), "parallel_1core_s": round(p_par, 1),
        "convoy_free_efficiency": round((t_lo / t_hi) / 4, 3),
    }
    return out


if __name__ == "__main__":
    f = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    print(json.dumps(report(sys.argv[1], f), indent=2))
