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
    return out


if __name__ == "__main__":
    f = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    print(json.dumps(report(sys.argv[1], f), indent=2))
