"""Benchmark harness — prints ONE JSON line with headline timings.

    python bench.py              # full run on $GRAFT_SF_DIR (default sf0.1)
    python bench.py --scaling    # same build at num_cpus=8 and 32 in fresh
                                 # processes; reports throughput + efficiency

Headline = full inverted-index build over the documents table (ingest →
tokenize/chunk → salted groupby merge → shard write) + batch BM25 top-10
query evaluation through the searcher actor pool, plus the training-data
pipelines (minhash near-dup, knn, windowed aggregate) as components.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from rayindex.config import AnalyzerConfig, BuildConfig, SearchConfig
    from rayindex.datapipe.ann import knn_brute
    from rayindex.datapipe.dedup import minhash_candidates
    from rayindex.datapipe.windows import tumbling_window
    from rayindex.engine import adapt_documents, build_index
    from rayindex.searcher import search_dataset

    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_files = pq.ParquetFile(docs_path).metadata.num_rows
    timings: dict[str, float] = {}

    # -- headline: index build (fresh dir, no resume credit) ----------------
    out = f"/tmp/rayindex_bench_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    analyzer = AnalyzerConfig(mode="ascii")
    cfg = BuildConfig(analyzer=analyzer, num_shards=max(8, num_cpus),
                      tokenize_batch_size=512)
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(docs_path, columns=["doc_id", "text", "lang", "source"])
    ds = adapt_documents(ds, repo_col="source", path_col="doc_id",
                         lang_col="lang", content_col="text")
    build_index(ds, out, cfg, input_token=f"bench:{docs_path}")
    timings["build_sec"] = time.perf_counter() - t0

    # -- batch query evaluation via searcher actor pool ---------------------
    base_terms = ["scan", "merge", "window", "spark", "customer", "group",
                  "stream", "table", "join", "filter", "vector", "hash"]
    qtexts = []
    for i in range(200):
        k = 1 + i % 4
        qtexts.append(" ".join(base_terms[(i + j) % len(base_terms)] for j in range(k)))
    qtexts += ['"table scan"', "scan AND customer", "#3(spark,customer)"] * 5
    qs = pa.table({
        "query_id": pa.array(range(len(qtexts)), pa.int64()),
        "query": pa.array(qtexts),
        "k": pa.array([10] * len(qtexts), pa.int32()),
    })
    scfg = SearchConfig(scorer="bm25", algorithm="bmw")
    t0 = time.perf_counter()
    res = search_dataset(qs, out, search_cfg=scfg, analyzer=analyzer,
                         concurrency=min(8, num_cpus), batch_size=32)
    n_results = res.count()
    timings["query_sec"] = time.perf_counter() - t0
    timings["query_ms_per_q"] = timings["query_sec"] / len(qtexts) * 1000

    # -- training-data pipelines -------------------------------------------
    t0 = time.perf_counter()
    dds = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
    minhash_candidates(dds, num_perm=64, bands=16).count()
    timings["minhash_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["embedding"])
    queries = np.stack([np.asarray(v, np.float32) for v in qt["embedding"].to_pylist()[:16]])
    eds = ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"])
    knn_brute(eds, queries, k=10)
    timings["knn_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    evs = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                columns=["user_id", "ts", "value"])
    tumbling_window(evs).count()
    timings["window_sec"] = time.perf_counter() - t0

    shutil.rmtree(out, ignore_errors=True)
    ray.shutdown()

    total = sum(v for k, v in timings.items() if k.endswith("_sec"))
    return {
        "metric": "rayindex_build_plus_query",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_files": int(n_files),
        "build_files_per_sec": round(n_files / timings["build_sec"], 1),
        "n_query_results": int(n_results),
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (the sandbox
    stand-in for N vs 4N nodes); efficiency = tput_32 / (4 × tput_8)."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    t8 = results[8]["queries"]["build_sec"]
    t32 = results[32]["queries"]["build_sec"]
    n = results[32]["n_files"]
    tput8, tput32 = n / t8, n / t32
    eff = tput32 / (4 * tput8)
    return {
        "metric": "rayindex_build_scaling",
        "build_sec_8cpu": round(t8, 3),
        "build_sec_32cpu": round(t32, 3),
        "files_per_sec_8cpu": round(tput8, 1),
        "files_per_sec_32cpu": round(tput32, 1),
        "scaling_efficiency": round(eff, 3),
        "total_sec_8cpu": results[8]["value"],
        "total_sec_32cpu": results[32]["value"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
