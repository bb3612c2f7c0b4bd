"""Pair quiet-window probe samples into scaling-efficiency estimates.

Reads BENCH/probes.jsonl (written by tools/scaling_probe.py), takes the
min-wall sample per (cpus, files) configuration — min-of-N is the only
defensible statistic on a host with bursty co-tenant load — and prints
strong scaling (8→32 CPUs, same corpus) and weak scaling (8→32 CPUs on a
4× corpus) efficiencies plus the underlying samples.

    python tools/probe_pairs.py [path-to-probes.jsonl]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "probes.jsonl")
    best: dict[tuple[int, int], dict] = {}
    counts: dict[tuple[int, int], int] = {}
    for line in open(path):
        r = json.loads(line)
        if "result" not in r or "value" not in r.get("result", {}):
            continue
        key = (int(r["level"]), int(r.get("n_files") or r["result"]["n_files"]))
        counts[key] = counts.get(key, 0) + 1
        if key not in best or r["result"]["value"] < best[key]["result"]["value"]:
            best[key] = r

    def tput(key):
        return key[1] / best[key]["result"]["value"]

    out = {"samples": {f"{c}cpu@{n}": counts[(c, n)] for c, n in sorted(counts)},
           "best_wall": {f"{c}cpu@{n}": best[(c, n)]["result"]["value"]
                         for c, n in sorted(best)}}
    if (8, 50000) in best and (32, 50000) in best:
        out["strong_efficiency_8to32"] = round(
            tput((32, 50000)) / (4 * tput((8, 50000))), 3)
    if (8, 50000) in best and (32, 200000) in best:
        out["weak_efficiency_8to32"] = round(
            tput((32, 200000)) / (4 * tput((8, 50000))), 3)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
