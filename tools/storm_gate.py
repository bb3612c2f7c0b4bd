"""Bus-storm-aware launcher for official scaling pairs.

The co-tenant interference that censors (8,32) pairs is MEMORY-BUS
pressure, which is invisible in the load average (the host's other
guests don't show up in /proc/loadavg), so the campaign's load gate
cannot detect it.  This gate measures what actually matters: aggregate
multi-threaded memory bandwidth, via N concurrent numpy memcpy workers
— the same resource the 32-wide build leg needs.  When the probe
reaches ``--min-gbps`` (calibrate once in a known-clean window), the
storm is off and ONE official pair launches; otherwise sleep and
re-probe.  Results append to the same official BENCH jsonl as always —
the gate only decides WHEN to sample, never which samples to keep
(the pre-registered cpu_work_ratio filter still judges cleanliness).

    python tools/storm_gate.py [--min-gbps 20] [--probe-threads 16]
        [--max-wait-min 120] [--shape 8,32:200000 | --query]
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_bandwidth(threads: int = 16, mb: int = 256,
                    reps: int = 3) -> float:
    """Aggregate copy bandwidth (GB/s) of ``threads`` concurrent memcpy
    workers — min-of-reps to dodge one-off scheduler hiccups is wrong
    here; we want the TYPICAL value, so take the median."""
    src = [np.ones(mb * 1024 * 1024 // 8, np.float64) for _ in range(threads)]
    dst = [np.empty_like(s) for s in src]

    def copy(i: int) -> float:
        t0 = time.perf_counter()
        np.copyto(dst[i], src[i])
        return time.perf_counter() - t0

    rates = []
    with cf.ThreadPoolExecutor(threads) as ex:
        for _ in range(reps):
            t0 = time.perf_counter()
            list(ex.map(copy, range(threads)))
            wall = time.perf_counter() - t0
            rates.append(threads * mb / 1024 / wall)
    return float(np.median(rates))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-gbps", type=float, default=20.0,
                    help="clean-window threshold; calibrate by running "
                         "--probe-only in a window where a pair measured "
                         "clean")
    ap.add_argument("--probe-threads", type=int, default=16)
    ap.add_argument("--max-wait-min", type=float, default=120.0)
    ap.add_argument("--sleep-s", type=float, default=120.0)
    ap.add_argument("--shape", default="8,32:200000")
    ap.add_argument("--query", action="store_true",
                    help="run bench.py --scaling-query instead of a "
                         "build pair")
    ap.add_argument("--probe-only", action="store_true")
    args = ap.parse_args()

    deadline = time.time() + args.max_wait_min * 60
    while True:
        gbps = probe_bandwidth(args.probe_threads)
        load = os.getloadavg()[0]
        print(json.dumps({"probe_gbps": round(gbps, 1),
                          "loadavg_1m": round(load, 2),
                          "clean": gbps >= args.min_gbps}), flush=True)
        if args.probe_only:
            return 0
        if gbps >= args.min_gbps and load < 4.0:
            break
        if time.time() > deadline:
            print(json.dumps({"gave_up_after_min": args.max_wait_min}),
                  flush=True)
            return 1
        time.sleep(args.sleep_s)

    if args.query:
        env = dict(os.environ, RAYINDEX_BENCH_PIN="1")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--scaling-query"], env=env, capture_output=True, text=True)
        lines = (out.stdout.strip().splitlines()
                 if out.returncode == 0 and out.stdout else [])
        if lines:
            line = lines[-1]
            with open(os.path.join(REPO, "BENCH",
                                   "query_scaling_r3.jsonl"), "a") as f:
                f.write(line + "\n")
            print(line, flush=True)
        else:
            print(json.dumps({"bench_failed": True,
                              "returncode": out.returncode}), flush=True)
    else:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "scaling_campaign.py"),
             "--iters", "1", "--max-load", "4.5", "--shape", args.shape])
    return 0


if __name__ == "__main__":
    sys.exit(main())
