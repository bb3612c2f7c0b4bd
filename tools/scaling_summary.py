"""Summarize a scaling-campaign JSONL (BENCH/scaling_runs_r3.jsonl) into
per-shape statistics with the honesty filter applied.

A strong-scaling sample is *clean* iff cpu_work_ratio (cpu-seconds big
leg / small leg) is within [0.90, 1.15]: both legs did the same work and
neither ate a co-tenant storm.  Outside that band the efficiency number
measures WHICH leg was robbed, not how the pipeline scales.  For weak
mode (4x corpus on the big leg) the ideal ratio is 4.0; clean band
[3.6, 4.6].

Usage: python tools/scaling_summary.py [path.jsonl]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def clean_band(mode: str) -> tuple[float, float]:
    return (3.6, 4.6) if mode == "weak" else (0.90, 1.15)


def summarize(path: str) -> dict:
    groups: dict[tuple, list[dict]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            groups[(r["mode"], tuple(r["levels"]), tuple(r["n_files"]))].append(r)
    out = {}
    for key, rows in sorted(groups.items()):
        mode, levels, n_files = key
        lo_b, hi_b = clean_band(mode)
        clean = [r for r in rows
                 if r.get("cpu_work_ratio") and lo_b <= r["cpu_work_ratio"] <= hi_b]
        effs = sorted(r["scaling_efficiency"] for r in clean)
        out[f"{mode} {levels[0]}->{levels[1]} files={n_files[0]}/{n_files[1]}"] = {
            "samples": len(rows),
            "clean": len(clean),
            "clean_eff": effs,
            "best_clean_eff": effs[-1] if effs else None,
            "median_clean_eff": effs[len(effs) // 2] if effs else None,
            "best_any_eff": max(r["scaling_efficiency"] for r in rows),
        }
    return out


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_runs_r3.jsonl"
    print(json.dumps(summarize(path), indent=2))
