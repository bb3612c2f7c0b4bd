"""One clean scaling sample per invocation.

The host's co-tenant load contaminates any back-to-back 8-vs-32
comparison (load routinely jumps 1 → 16 mid-run), so this probe takes
ONE level per call — alternating levels across calls via a state file —
and only when the 1-minute load average is below the threshold at start.
Results append to BENCH/probes.jsonl with the load before/after, stage
breakdown and utime/stime split; pair up quiet samples offline to
compute efficiency.

    python tools/scaling_probe.py [--max-load 3.0] [--files 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(REPO, "BENCH", ".probe_state")
OUT = os.path.join(REPO, "BENCH", "probes.jsonl")
# (num_cpus, n_files): strong-scaling pair at 50k, plus the weak-scaling
# leg (4x CPUs on 4x corpus) — pair quiet samples offline
LEVELS = [(8, 50000), (32, 50000), (32, 200000)]


def load1() -> float:
    return os.getloadavg()[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-load", type=float, default=3.0)
    ap.add_argument("--files", type=int, default=100000)
    args = ap.parse_args()
    l0 = load1()
    if l0 >= args.max_load:
        print(json.dumps({"skipped": True, "load1": l0}))
        return 0
    try:
        idx = int(open(STATE).read().strip())
    except Exception:
        idx = 0
    level, n_files = LEVELS[idx % len(LEVELS)]
    os.makedirs(os.path.dirname(STATE), exist_ok=True)
    with open(STATE, "w") as f:
        f.write(str(idx + 1))
    env = dict(os.environ, RAY_GRAFT_CPUS=str(level),
               RAYINDEX_BENCH_BUILD_ONLY="1",
               RAYINDEX_BENCH_FILES=str(n_files))
    os.sync()
    time.sleep(5)
    t0 = time.time()
    run = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, cwd=REPO)
    l1 = load1()
    try:
        payload = json.loads(run.stdout.strip().splitlines()[-1])
    except Exception:
        payload = {"error": run.stderr[-500:]}
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "level": level,
        "n_files": n_files,
        "load1_before": round(l0, 2),
        "load1_after": round(l1, 2),
        "wall_total": round(time.time() - t0, 1),
        "result": payload,
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
