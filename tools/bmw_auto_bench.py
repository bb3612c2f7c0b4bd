"""Mixed-workload TAAT vs block-max vs auto routing benchmark.

Builds a CLUSTERED synthetic corpus (rare terms concentrated in narrow
doc-id ranges — the layout repo/time-ordered ingest produces) plus
uniform hot terms, then times a mixed query workload under
algorithm=taat, =bmw, and =auto.  The claim under test: auto matches the
best algorithm PER QUERY CLASS (bmw on prunable clustered queries, taat
on unprunable uniform ones) instead of a global config choosing one.

    python tools/bmw_auto_bench.py [n_docs]

Prints one JSON line; results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayindex.build import build_index
    from rayindex.config import BuildConfig, SearchConfig
    from rayindex.searcher import IndexReader

    work = "/tmp/rayindex_bmw_auto"
    src = os.path.join(work, "src")
    idx = os.path.join(work, f"idx_{n}")
    if not os.path.exists(os.path.join(idx, "finalize.done.json")):
        shutil.rmtree(idx, ignore_errors=True)
        os.makedirs(src, exist_ok=True)
        rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
        n_clusters = 16
        span = n // n_clusters
        for i in range(n):
            body = (f"alpha beta gamma delta epsilon zeta fill{i % 29} "
                    f"pad{i % 13} mid{i % 211}")
            c = i // span
            if i % span < span // 50:  # rare term: first 2% of its cluster
                body += f" nugget{c}"
            rows["repo"].append(f"r{c}")
            rows["path"].append(f"f{i:06d}.py")
            rows["commit"].append("c")
            rows["lang"].append("py")
            rows["content"].append(body)
        pq.write_table(pa.table(rows), os.path.join(src, "docs.parquet"))
        build_index(src, idx, BuildConfig(num_shards=8,
                                          tokenize_batch_size=512))
    r = IndexReader(idx)

    clustered = [f"nugget{c} alpha beta gamma" for c in range(16)]
    uniform = ["alpha beta gamma delta", "beta delta epsilon zeta",
               "alpha epsilon zeta beta", "gamma delta zeta alpha"] * 4
    workload = {"clustered": clustered, "uniform": uniform,
                "mixed": clustered + uniform}

    out: dict = {"metric": "bmw_auto_routing", "n_docs": n, "ms_per_q": {}}
    for algo in ("taat", "bmw", "auto"):
        cfg = SearchConfig(scorer="bm25", algorithm=algo)
        for name, qs in workload.items():
            for q in qs:  # warm posting cache out of the timing
                r.search(q, k=10, search_cfg=cfg)
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                for q in qs:
                    r.search(q, k=10, search_cfg=cfg)
            out["ms_per_q"][f"{algo}/{name}"] = round(
                (time.perf_counter() - t0) / (reps * len(qs)) * 1000, 3)
    # identity spot check across algorithms — same docs, scores equal to
    # 1e-9 (the repo's rank-identity tolerance: taat and the segment sweep
    # accumulate term weights in different order → last-ulp float drift)
    for q in workload["mixed"][:6]:
        base = r.search(q, k=10, search_cfg=SearchConfig(algorithm="taat"))
        for algo in ("bmw", "auto"):
            got = r.search(q, k=10, search_cfg=SearchConfig(algorithm=algo))
            assert [d for d, _ in got] == [d for d, _ in base], (q, algo)
            assert all(abs(gs - bs) < 1e-9
                       for (_, gs), (_, bs) in zip(got, base)), (q, algo)
    out["identity"] = "ok"
    m = out["ms_per_q"]
    out["auto_vs_best_mixed"] = round(
        m["auto/mixed"] / min(m["taat/mixed"], m["bmw/mixed"]), 3)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
