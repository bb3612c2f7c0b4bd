"""Benchmark harness — prints ONE JSON line with headline timings.

    python bench.py              # full run; components over $GRAFT_SF_DIR
    python bench.py --scaling    # headline build at num_cpus=8 and 32 in
                                 # fresh processes; reports files/sec at both
                                 # + scaling efficiency (the sandbox stand-in
                                 # for the N vs 4N cluster criterion)
    python bench.py --scaling-query  # steady-state query QPS through a
                                 # warmed searcher actor pool at the same two
                                 # levels over the IDENTICAL cached index

Headline = full inverted-index build (ingest → tokenize/chunk → salted
groupby merge → shard write) over the deterministic synthetic source-code
corpus (FIXTURES.md §1: repo/path/commit/lang/content; size via
$RAYINDEX_BENCH_FILES, default 50000 ≈ 400 MB of text — large enough that
compute, not fixed stage overhead, dominates at 32 CPUs), plus batch BM25
top-10 query evaluation through the searcher actor pool.  The driver-provided
sf tables feed the component benchmarks (minhash near-dup, knn, windows).

The corpus is generated once (distributed map_batches) and cached under
/tmp; generation is NOT part of the timed build.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# keep freed heap pages resident: this sandbox's VM reclaims free guest
# pages within ~45 s and re-faulting them costs ~0.1 ms/page (see
# _prewarm_memory), so glibc must neither mmap large blocks (freed →
# returned → reclaimed) nor trim the heap.  Set BEFORE ray.init so every
# raylet-spawned worker inherits it.
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
# NOTE: do NOT pin MALLOC_ARENA_MAX=1 here — measured on this host it makes
# the 32-worker build's kernel time explode (stime 46 s -> 193 s): with one
# arena, contended threads fall back to fresh mmap allocations and the
# first-touch fault tax returns.
# Searcher heap prefault ($RAYINDEX_PREFAULT_MB) defaults OFF: with the
# memory-lean decode + LRU posting cache, 8 actors x 384 MB of 0.1 ms
# first-touch faults cost ~60-90 s up front (measured cold query phase
# 100 s -> 34 s without it), vs one ~12 s first-hot-query fault that only
# happens if a pathological query arrives (pages then stay resident).
os.environ.setdefault("RAYINDEX_PREFAULT_MB", "0")

N_FILES = int(os.environ.get("RAYINDEX_BENCH_FILES", "100000"))
N_REPOS = max(10, N_FILES // 500)
# v2: plan emitted in (repo, path) order (sorted-source ingest layout)
CORPUS_DIR = f"/tmp/rayindex_bench_corpus_v2_{N_FILES}"


def _touch_mb(n_mb: int) -> int:
    import numpy as np

    a = np.ones(n_mb * 1024 * 1024 // 8)
    a[:: 4096 // 8] = 2.0
    return n_mb


def _prewarm_memory(target_gb: int | None = None) -> float:
    """Optional VM-global page-pool warmup (untimed; $RAYINDEX_PREWARM_GB,
    default off — the pool decays within ~1 min of idling, so the
    per-worker warmup in run_bench is the effective mitigation).

    On this sandbox the FIRST touch of any fresh guest-physical page costs
    ~0.15 ms (lazy VM paging): a process faulting its first 100 MB stalls
    ~15 s, while re-touching previously-faulted pages runs at full DRAM
    speed — measured 15.3 s vs 0.03 s for the identical 100 MB numpy
    allocation.  The pool is VM-global (a second process touching 1 GB
    after a first warmed it: 66 s → 1.3 s), so faulting ``target_gb``
    once makes every later worker/actor allocation fast.  Adaptive: a
    128 MB probe under 0.5 s means the pool is already warm → no-op.
    """
    import time as _t

    import numpy as np

    if target_gb is None:
        target_gb = int(os.environ.get("RAYINDEX_PREWARM_GB", "0"))
    if target_gb <= 0:
        return 0.0
    t0 = _t.perf_counter()
    probe = np.ones(128 * 1024 * 1024 // 8)
    probe[:: 4096 // 8] = 2.0
    dt = _t.perf_counter() - t0
    del probe
    if dt < 0.5:
        return 0.0
    import multiprocessing as mp

    n_procs = 16
    per = max(1, target_gb * 1024 // n_procs)
    t0 = _t.perf_counter()
    with mp.Pool(n_procs) as p:
        p.map(_touch_mb, [per] * n_procs)
    return _t.perf_counter() - t0


def _ray_cpu_seconds() -> float:
    """Aggregate utime+stime of this process plus every live local Ray
    process (workers, raylet, shuffle aggregators).  Used to report
    EFFECTIVE CORES (cpu_sec / wall_sec) alongside wall time: on this
    co-tenanted host, wall-clock scaling numbers are hostage to stolen
    cycles, while cpu-seconds counts only cycles we actually got — if
    cpu work is conserved across parallelism levels and effective cores
    track the level, the pipeline scales and the wall gap is the host's."""
    import glob as _g

    return sum(_ray_cpu_split())


from rayindex.checkpoint import CpuMonitor as _CpuMonitor  # noqa: E402
from rayindex.io import read_parquet_clean as _read_parquet  # noqa: E402


def _ray_cpu_split() -> tuple[float, float]:
    """(utime, stime) — stime isolates the kernel page-fault tax (fresh
    worker heaps fault at ~0.1 ms/page on this host)."""
    import glob as _g

    hz = os.sysconf("SC_CLK_TCK")
    me = str(os.getpid())
    utime = stime = 0.0
    for stat in _g.glob("/proc/[0-9]*/stat"):
        pid = stat.split("/")[2]
        try:
            raw = open(stat).read()
            # comm sits between the first "(" and the last ") " and
            # SURVIVES zombie state, unlike cmdline (a freshly-killed
            # ray:: worker has an empty cmdline but its utime/stime are
            # still in stat until the raylet reaps it — matching cmdline
            # only made deltas go negative when heavy workers died
            # between snapshots)
            comm = raw[raw.index("(") + 1:raw.rindex(") ")]
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            is_ray = (pid == me or comm.startswith("ray") or
                      b"ray::" in cmd or b"raylet" in cmd or b"ray/" in cmd)
            if not is_ray:
                continue
            parts = raw.rsplit(") ", 1)[1].split()
            utime += int(parts[11]) / hz
            stime += int(parts[12]) / hz
            if b"raylet" in cmd or comm == "raylet":
                # reaped worker jiffies migrate to the raylet's cutime/
                # cstime — without these, dying idle workers make deltas
                # NEGATIVE (their own counters vanish from /proc)
                utime += int(parts[13]) / hz
                stime += int(parts[14]) / hz
        except Exception:
            continue
    return utime, stime


def _ensure_corpus():
    import glob

    from rayindex import corpus

    marker = os.path.join(CORPUS_DIR, "_complete")
    if os.path.exists(marker):
        return
    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    ds = corpus.corpus_dataset(N_FILES, N_REPOS, parallelism=128)
    ds.write_parquet(CORPUS_DIR)
    with open(marker, "w") as f:
        f.write(str(len(glob.glob(os.path.join(CORPUS_DIR, "*.parquet")))))


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    prewarm_s = _prewarm_memory()

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # Ray Data logs a harmless "Failed to hash the schemas (for
    # deduplication): unhashable type: 'dict'" warning for tables that
    # carry dict-valued schema metadata (our stats footers) — silence it
    # so the bench tail isn't mistaken for a failure.
    import logging

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(logging.ERROR)

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from rayindex import corpus
    from rayindex.config import BuildConfig, SearchConfig
    from rayindex.datapipe.ann import knn_brute
    from rayindex.datapipe.dedup import minhash_candidates
    from rayindex.datapipe.windows import tumbling_window
    from rayindex.engine import build_index
    from rayindex.searcher import search_dataset

    build_only = os.environ.get("RAYINDEX_BENCH_BUILD_ONLY") == "1"
    timings: dict[str, float] = {"prewarm_sec": prewarm_s}
    _ensure_corpus()

    # untimed warmup: pre-spawn the worker pool (each worker pays the heavy
    # import once) and warm the page cache with one read, so the timed build
    # measures compute + shuffle, not process ramp-up
    def _warm(batch):
        import numpy as _np

        import rayindex.build  # noqa: F401  (heavy transitive imports)

        # fault ~64 MB of heap per worker once, untimed — with trim
        # disabled the pages stay resident for the worker's lifetime
        a = _np.ones(64 * 1024 * 1024 // 8)
        a[:: 4096 // 8] = 2.0
        return batch

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        _warm, batch_size=1).count()
    # warm the corpus PAGE CACHE, not just footers (count() reads only
    # metadata; a cold first content pass then lands inside the timed build)
    import pyarrow as _pa
    import pyarrow.compute as _pc

    _read_parquet(CORPUS_DIR, columns=["content"]).map_batches(
        lambda t: _pa.table({"b": [_pc.sum(_pc.binary_length(
            _pc.cast(t["content"], _pa.large_binary()))).as_py() or 0]}),
        batch_format="pyarrow", zero_copy_batch=True).count()
    if os.environ.get("RAYINDEX_BENCH_WARMBUILD", "1") == "1":
        # untimed 2k-file mini build: exercises the SAME shuffle operators
        # so their aggregator actors land on already-warmed idle worker
        # processes instead of faulting fresh heaps inside the timed build
        wout = f"/tmp/rayindex_bench_warmidx_{os.getpid()}"
        shutil.rmtree(wout, ignore_errors=True)
        wds = corpus.corpus_dataset(2000, 10, parallelism=num_cpus)
        build_index(wds, wout, BuildConfig(num_shards=8),
                    input_token="bench-warmbuild-2000")
        shutil.rmtree(wout, ignore_errors=True)

    # -- headline: index build over the code corpus (fresh dir, no resume) --
    out = os.path.join(os.environ.get("RAYINDEX_BENCH_OUTDIR", "/tmp"),
                       f"rayindex_bench_idx_{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    cfg = BuildConfig(num_shards=32, tokenize_batch_size=256,
                      **({"max_concurrent_merges": int(m)}
                         if (m := os.environ.get("RAYINDEX_BENCH_MERGES"))
                         else {}))
    t0 = time.perf_counter()
    with _CpuMonitor() as mon:
        res = build_index(CORPUS_DIR, out, cfg)
    timings["build_sec"] = time.perf_counter() - t0
    mu, ms = mon.totals()
    timings["build_cpu_sec"] = mu + ms
    timings["build_stime_sec"] = ms
    timings["build_effective_cores"] = timings["build_cpu_sec"] / timings["build_sec"]
    for name, st in res.stages.items():
        timings[f"build_{name}_sec"] = st.get("wall_s", 0.0)
        for sub in ("pass1_s", "pipeline_s"):
            if sub in st:
                timings[f"build_{name}_{sub}"] = st[sub]
        for sub, v in st.items():  # merge-tail phase profile (actor-seconds)
            if sub.startswith("splice_"):
                timings[f"build_{sub}"] = v

    if build_only:
        shutil.rmtree(out, ignore_errors=True)
        ray.shutdown()
        return {
            "metric": "rayindex_build_only",
            "value": round(timings["build_sec"], 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "n_files": N_FILES,
            "build_files_per_sec": round(N_FILES / timings["build_sec"], 1),
        }

    # -- batch query evaluation via searcher actor pool ---------------------
    qt = corpus.fixed_queries()
    base = ["def", "return", "import", "class", "self"] + [
        corpus._VOCAB[i] for i in (0, 1, 2, 5, 9, 20, 40, 100, 300, 900)
    ]
    extra = []
    for i in range(200):
        k = 1 + i % 4
        extra.append(" ".join(base[(i + j) % len(base)] for j in range(k)))
    qtexts = qt["query"].to_pylist() + extra
    qs = pa.table({
        "query_id": pa.array(range(len(qtexts)), pa.int64()),
        "query": pa.array(qtexts),
        "k": pa.array([10] * len(qtexts), pa.int32()),
    })
    # taat: the vectorized default (bmw — the segment-sweep block-max — is
    # exact too and skips decode on selective queries, but the synthetic
    # corpus makes every term dense, where TAAT wins; see BASELINE.md)
    scfg = SearchConfig(scorer="bm25", algorithm="taat")
    t0 = time.perf_counter()
    resq = search_dataset(qs, out, search_cfg=scfg,
                          concurrency=min(8, num_cpus), batch_size=32)
    n_results = resq.count()
    timings["query_sec"] = time.perf_counter() - t0
    timings["query_ms_per_q"] = timings["query_sec"] / len(qtexts) * 1000
    # steady-state single-reader latency: one warmed in-process IndexReader
    # over the same workload — what a long-lived searcher actor sees once
    # its one-time init (dict load + this host's page-fault tax) is paid
    from rayindex.searcher import IndexReader

    reader = IndexReader(out)
    for q in qtexts[:8]:
        reader.search(q, k=10, search_cfg=scfg)
    lat = np.empty(len(qtexts))
    t0 = time.perf_counter()
    for i, q in enumerate(qtexts):
        tq = time.perf_counter()
        reader.search(q, k=10, search_cfg=scfg)
        lat[i] = time.perf_counter() - tq
    timings["query_warm_sec"] = time.perf_counter() - t0
    timings["query_warm_ms_per_q"] = timings["query_warm_sec"] / len(qtexts) * 1000
    for p in (50, 95, 99):
        timings[f"query_warm_p{p}_ms"] = float(np.percentile(lat, p) * 1000)

    # -- index lifecycle over the freshly built index (informative keys;
    # NOT part of the headline total) ---------------------------------------
    from rayindex.compact import compact_index
    from rayindex.delete import delete_docs

    from rayindex.delete import tombstone_docs

    del_dir, cmp_dir, tmb_dir = out + "_del", out + "_cmp", out + "_tmb"
    for d in (del_dir, cmp_dir, tmb_dir):
        shutil.rmtree(d, ignore_errors=True)
    del_ids = np.arange(1, N_FILES + 1, 100, dtype=np.int64)
    # tombstone takedown: O(ids) + links, vs the eager re-encode below
    t0 = time.perf_counter()
    tombstone_docs(out, tmb_dir, doc_ids=del_ids)
    timings["tombstone_1pct_sec"] = time.perf_counter() - t0
    # warm query latency with the tombstone mask active (per-lookup
    # searchsorted overhead on every term's postings)
    rt = IndexReader(tmb_dir)
    for q in qtexts[:8]:
        rt.search(q, k=10, search_cfg=scfg)
    t0 = time.perf_counter()
    for q in qtexts:
        rt.search(q, k=10, search_cfg=scfg)
    timings["query_warm_tombstoned_ms_per_q"] = \
        (time.perf_counter() - t0) / len(qtexts) * 1000
    shutil.rmtree(tmb_dir, ignore_errors=True)
    t0 = time.perf_counter()
    delete_docs(out, del_dir,  # ~1% of docs: the GDPR-batch shape
                doc_ids=del_ids)
    timings["delete_1pct_sec"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    compact_index(del_dir, cmp_dir, cfg)
    timings["compact_sec"] = time.perf_counter() - t0
    shutil.rmtree(del_dir, ignore_errors=True)
    shutil.rmtree(cmp_dir, ignore_errors=True)

    # -- training-data pipelines over the driver's sf tables ----------------
    docs_path = os.path.join(sf_dir, "documents.parquet")
    t0 = time.perf_counter()
    dds = _read_parquet(docs_path, columns=["doc_id", "text"])
    minhash_candidates(dds, num_perm=64, bands=16).count()
    timings["minhash_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q16 = pq.read_table(emb_path, columns=["embedding"])["embedding"].to_pylist()[:16]
    queries = np.stack([np.asarray(v, np.float32) for v in q16])
    eds = _read_parquet(emb_path, columns=["vec_id", "embedding"])
    knn_brute(eds, queries, k=10)
    timings["knn_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    evs = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                                columns=["user_id", "ts", "value"])
    tumbling_window(evs).count()
    timings["window_sec"] = time.perf_counter() - t0

    # passage-level dup profile (winnowing) over the docs table
    from rayindex.datapipe.spans import duplicate_span_stats

    t0 = time.perf_counter()
    duplicate_span_stats(dds, k=4, window=4).count()
    timings["winnow_sec"] = time.perf_counter() - t0

    # quality-filter family: Gopher repetition + bigram-LM xent +
    # benchmark decontamination over the docs table
    from rayindex.datapipe.lm import bigram_model, score_xent
    from rayindex.datapipe.spans import benchmark_gram_set, decontaminate
    from rayindex.datapipe.text import repetition_batch

    t0 = time.perf_counter()
    dds.map_batches(repetition_batch, batch_format="pyarrow",
                    zero_copy_batch=True).count()
    timings["repetition_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    mref, _ = bigram_model(dds)
    score_xent(dds, mref).count()
    timings["lm_xent_sec"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    import pyarrow.dataset as pads
    bench_docs = _read_parquet(docs_path, columns=["doc_id", "text"],
                               filter=pads.field("doc_id") < 100)
    grams = benchmark_gram_set(bench_docs, n=13)
    decontaminate(dds, grams, n=13).count()
    timings["decontam_sec"] = time.perf_counter() - t0

    # the composed curation chain (all gates one pass + dedup groupby)
    from rayindex.datapipe.curate import curate

    t0 = time.perf_counter()
    curate(dds, grams, decontam_n=13).count()
    timings["curate_sec"] = time.perf_counter() - t0

    shutil.rmtree(out, ignore_errors=True)
    ray.shutdown()

    total = timings["build_sec"] + timings["query_sec"] + timings["minhash_sec"] \
        + timings["knn_sec"] + timings["window_sec"]
    return {
        "metric": "rayindex_build_plus_query",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_files": N_FILES,
        "build_files_per_sec": round(N_FILES / timings["build_sec"], 1),
        "n_query_results": int(n_results),
    }


QIDX_DIR = f"/tmp/rayindex_bench_qidx_v1_{N_FILES}"


def _ensure_query_index() -> str:
    """Build the query-bench index once (untimed) and cache it under /tmp —
    the build is byte-deterministic across parallelism levels, so every
    scaling leg queries the IDENTICAL artifact."""
    marker = os.path.join(QIDX_DIR, "_complete")
    if os.path.exists(marker):
        return QIDX_DIR
    _ensure_corpus()
    shutil.rmtree(QIDX_DIR, ignore_errors=True)
    from rayindex.config import BuildConfig
    from rayindex.engine import build_index

    build_index(CORPUS_DIR, QIDX_DIR,
                BuildConfig(num_shards=32, tokenize_batch_size=256))
    with open(marker, "w") as f:
        f.write("ok")
    return QIDX_DIR


def _query_texts(n: int) -> list[str]:
    """Deterministic workload: the fixed query set plus generated 1–4-term
    queries.  $RAYINDEX_BENCH_QUERY_MIX picks the vocabulary profile:

    - ``dense``: head-of-zipf terms (``def``/``return``/rank<1000) that
      occur in nearly EVERY synthetic doc — every query streams
      full-corpus postings, a pure DRAM-bandwidth stress.
    - ``selective``: mid/tail terms (rank 200+) with short postings — the
      CPU-bound shape of real query logs, where most terms are selective.
    - ``mixed`` (default): 1 dense query in 5, selective otherwise.
    """
    from rayindex import corpus

    mix = os.environ.get("RAYINDEX_BENCH_QUERY_MIX", "mixed")
    out = list(corpus.fixed_queries()["query"].to_pylist())
    dense = ["def", "return", "import", "class", "self"] + [
        corpus._VOCAB[i] for i in (0, 1, 2, 5, 9, 20, 40, 100, 300, 900)
    ]
    sel = [corpus._VOCAB[(211 + 97 * j) % 4800 + 200] for j in range(64)]
    i = 0
    while len(out) < n:
        k = 1 + i % 4
        base = dense if (mix == "dense" or (mix == "mixed" and i % 5 == 0)) \
            else sel
        out.append(" ".join(base[(i + j) % len(base)] for j in range(k)))
        i += 1
    return out[:n]


def run_query_bench() -> dict:
    """One leg of query-throughput scaling: steady-state QPS through a pool
    of ``num_cpus`` warmed searcher actors over the cached index.  Actor
    init (dict attach, page faults) and index build are untimed; the timed
    region is pure query serving with dynamic per-actor dispatch."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # Ray Data logs a harmless "Failed to hash the schemas (for
    # deduplication): unhashable type: 'dict'" warning for tables that
    # carry dict-valued schema metadata (our stats footers) — silence it
    # so the bench tail isn't mistaken for a failure.
    import logging

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(logging.ERROR)
    from rayindex.config import SearchConfig
    from rayindex.searcher import Searcher, build_shared_state

    idx = _ensure_query_index()
    n_q = int(os.environ.get("RAYINDEX_BENCH_QUERIES", "16384"))
    bsz = int(os.environ.get("RAYINDEX_BENCH_QUERY_BATCH", "32"))
    texts = _query_texts(n_q)
    batches = []
    for s in range(0, n_q, bsz):
        chunk = texts[s:s + bsz]
        batches.append(pa.table({
            "query_id": pa.array(range(s, s + len(chunk)), pa.int64()),
            "query": pa.array(chunk),
            "k": pa.array([10] * len(chunk), pa.int32()),
        }))

    class _QueryActor(Searcher):
        def run(self, batch) -> int:
            return self.__call__(batch).num_rows

        def warm(self, bs) -> int:
            n = self.prefault()  # Lucene-style mmap preload, untimed
            for b in bs:
                self.__call__(b)
            return n

    scfg = SearchConfig(scorer="bm25", algorithm="taat")
    shared = build_shared_state(idx)
    QA = ray.remote(num_cpus=1)(_QueryActor)
    actors = [QA.remote(idx, search_cfg=scfg, shared_state=shared)
              for _ in range(num_cpus)]
    # untimed warm: every actor prefaults the shard blobs (PTE population +
    # readahead — the once-per-replica startup cost a serving fleet pays
    # before taking traffic) and serves the FULL workload once, so the
    # timed region below measures steady-state serving: hot posting cache
    # for repeated terms, page-cache-resident positional decode for phrase
    # terms (positions are decoded per query by design).
    ray.get([a.warm.remote(batches) for a in actors])

    passes = int(os.environ.get("RAYINDEX_BENCH_QUERY_PASSES", "16"))
    work = [b for _ in range(passes) for b in batches]
    t0 = time.perf_counter()
    with _CpuMonitor() as mon:
        it = iter(work)
        pending: dict = {}
        for a in actors:
            for _ in range(2):
                b = next(it, None)
                if b is None:
                    break
                pending[a.run.remote(b)] = a
        n_rows = 0
        while pending:
            done, _ = ray.wait(list(pending.keys()), num_returns=1)
            a = pending.pop(done[0])
            n_rows += ray.get(done[0])
            b = next(it, None)
            if b is not None:
                pending[a.run.remote(b)] = a
    wall = time.perf_counter() - t0
    n_served = n_q * passes
    mu, ms = mon.totals()
    ray.shutdown()
    return {
        "metric": "rayindex_query_only",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": {"query_sec": round(wall, 3),
                    "query_cpu_sec": round(mu + ms, 1),
                    "query_stime_sec": round(ms, 1),
                    "query_ms_per_q": round(wall / n_served * 1000, 3)},
        "num_cpus": num_cpus,
        "n_queries": n_served,
        "distinct_queries": n_q,
        "passes": passes,
        "qps": round(n_served / wall, 1),
        "n_result_rows": int(n_rows),
    }


def run_scaling_query() -> dict:
    """Query-throughput scaling: the same fixed workload served at two
    actor-pool sizes in fresh processes over the IDENTICAL cached index.
    Serving is embarrassingly parallel (no shuffle, no merge tail), so this
    isolates the query path's N→4N contract from the build's."""
    reps = int(os.environ.get("RAYINDEX_BENCH_REPS", "2"))
    lo, hi = (int(x) for x in
              os.environ.get("RAYINDEX_BENCH_LEVELS", "8,32").split(","))
    results: dict[int, dict] = {}
    for rep in range(reps):
        for ncpu in (lo, hi):
            os.sync()
            time.sleep(5)
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            qcmd = [sys.executable, os.path.abspath(__file__), "--query-bench"]
            if os.environ.get("RAYINDEX_BENCH_PIN") == "1":  # see run_scaling
                qcmd = ["taskset", "-c", f"0-{ncpu - 1}"] + qcmd
            out = subprocess.run(qcmd, env=env, capture_output=True,
                                 text=True, check=True)
            r = json.loads(out.stdout.strip().splitlines()[-1])
            best = results.get(ncpu)
            if best is None or r["qps"] > best["qps"]:
                results[ncpu] = r
    r_lo, r_hi = results[lo], results[hi]
    factor = hi / lo
    cpu_lo = r_lo["queries"]["query_cpu_sec"]
    cpu_hi = r_hi["queries"]["query_cpu_sec"]
    ec_lo = cpu_lo / r_lo["queries"]["query_sec"]
    ec_hi = cpu_hi / r_hi["queries"]["query_sec"]
    return {
        "metric": "rayindex_query_scaling",
        "mode": "query-strong",
        "n_queries": r_lo["n_queries"],
        "levels": [lo, hi],
        f"qps_{lo}cpu": r_lo["qps"],
        f"qps_{hi}cpu": r_hi["qps"],
        f"ms_per_q_{lo}cpu": r_lo["queries"]["query_ms_per_q"],
        f"ms_per_q_{hi}cpu": r_hi["queries"]["query_ms_per_q"],
        "scaling_efficiency": round(r_hi["qps"] / (factor * r_lo["qps"]), 3),
        f"cpu_sec_{lo}cpu": round(cpu_lo, 1),
        f"cpu_sec_{hi}cpu": round(cpu_hi, 1),
        f"effective_cores_{lo}cpu": round(ec_lo, 2),
        f"effective_cores_{hi}cpu": round(ec_hi, 2),
        "cpu_work_ratio": round(cpu_hi / cpu_lo, 3) if cpu_lo else None,
        "effective_core_scaling": (round(ec_hi / (factor * ec_lo), 3)
                                   if ec_lo else None),
        "rows_equal": r_lo["n_result_rows"] == r_hi["n_result_rows"],
        "pinned": os.environ.get("RAYINDEX_BENCH_PIN") == "1",
    }


def run_scaling() -> dict:
    """Same headline build at two parallelism levels in fresh processes (the
    sandbox stand-in for N vs 4N nodes); efficiency = tput_32 / (4·tput_8)."""
    # the sandbox is a shared host with bursty background load — take the
    # min over repetitions per level so co-tenant noise doesn't masquerade
    # as (anti-)scaling
    reps = int(os.environ.get("RAYINDEX_BENCH_REPS", "2"))
    lo, hi = (int(x) for x in os.environ.get("RAYINDEX_BENCH_LEVELS", "8,32").split(","))
    # RAYINDEX_BENCH_WEAK=1 → weak scaling: corpus size grows with the
    # parallelism level (the multi-node mental model: 4N nodes ingest 4x
    # the corpus; ideal throughput still scales by 4, so the efficiency
    # formula below is unchanged).  Strong scaling (same corpus at both
    # levels) is the default.
    weak = os.environ.get("RAYINDEX_BENCH_WEAK") == "1"
    base_files = int(os.environ.get("RAYINDEX_BENCH_FILES", "50000"))
    load_at_start = float(open("/proc/loadavg").read().split()[0])
    try:  # code provenance: lets the sample census split by revision
        import subprocess
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)),
                             timeout=10).stdout.strip() or None
    except Exception:
        rev = None
    results = {}
    # INTERLEAVE the levels (lo, hi, lo, hi, ...) rather than grouping them:
    # later runs are systematically slower on this host (writeback pressure,
    # page-cache eviction of the corpus), so grouped ordering biases
    # whichever level runs second.  Between runs: sync + settle.  Per level:
    # min over reps.
    for rep in range(reps):
        for ncpu in (lo, hi):
            os.sync()
            time.sleep(10)
            n_files = base_files * (ncpu // lo) if weak else base_files
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       RAYINDEX_BENCH_BUILD_ONLY="1",
                       RAYINDEX_BENCH_FILES=str(n_files))
            cmd = [sys.executable, os.path.abspath(__file__)]
            # RAYINDEX_BENCH_PIN=1 → pin the ENTIRE leg (driver, raylet,
            # workers, num_cpus=0 actors, idle workers) to exactly `ncpu`
            # logical CPUs.  Without it, a "num_cpus=8" leg runs its
            # unaccounted threads (merger actors, raylet, driver) on FREE
            # host cores and measures 9-13 effective cores — a machine
            # ~1.5x its nominal size, which systematically understates
            # lo→hi efficiency.  Pinning makes "parallelism level N" mean
            # an N-core machine, the thing the N-node proxy claims.
            if os.environ.get("RAYINDEX_BENCH_PIN") == "1":
                cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
            out = subprocess.run(cmd, env=env, capture_output=True,
                                 text=True, check=True)
            r = json.loads(out.stdout.strip().splitlines()[-1])
            best = results.get(ncpu)
            if best is None or r["queries"]["build_sec"] < best["queries"]["build_sec"]:
                results[ncpu] = r
    t_lo = results[lo]["queries"]["build_sec"]
    t_hi = results[hi]["queries"]["build_sec"]
    cpu_lo = results[lo]["queries"].get("build_cpu_sec", 0.0)
    cpu_hi = results[hi]["queries"].get("build_cpu_sec", 0.0)
    n_lo, n_hi = results[lo]["n_files"], results[hi]["n_files"]
    tput_lo, tput_hi = n_lo / t_lo, n_hi / t_hi
    factor = hi / lo
    ec_lo = cpu_lo / t_lo if t_lo else 0.0
    ec_hi = cpu_hi / t_hi if t_hi else 0.0
    return {
        "metric": "rayindex_build_scaling",
        "mode": "weak" if weak else "strong",
        "n_files": [n_lo, n_hi],
        "levels": [lo, hi],
        f"build_sec_{lo}cpu": round(t_lo, 3),
        f"build_sec_{hi}cpu": round(t_hi, 3),
        f"files_per_sec_{lo}cpu": round(tput_lo, 1),
        f"files_per_sec_{hi}cpu": round(tput_hi, 1),
        "scaling_efficiency": round(tput_hi / (factor * tput_lo), 3),
        # host-noise-robust evidence: cpu work conservation + core usage
        f"cpu_sec_{lo}cpu": round(cpu_lo, 1),
        f"cpu_sec_{hi}cpu": round(cpu_hi, 1),
        f"effective_cores_{lo}cpu": round(ec_lo, 2),
        f"effective_cores_{hi}cpu": round(ec_hi, 2),
        "cpu_work_ratio": round(cpu_hi / cpu_lo, 3) if cpu_lo else None,
        "effective_core_scaling": round(ec_hi / (factor * ec_lo), 3) if ec_lo else None,
        # merge-tail attribution per leg (the one intentionally
        # DRAM-capped stage; see _ShardMerger)
        **{f"shards_sec_{lvl}cpu": results[lvl]["queries"].get(
            "build_shards_sec") for lvl in (lo, hi)},
        **{f"splice_crit_s_{lvl}cpu": results[lvl]["queries"].get(
            "build_splice_crit_s") for lvl in (lo, hi)},
        # provenance for the sample census: where artifacts landed (disk vs
        # tmpfs — the shared single-box disk is the one resource a real 4N
        # cluster would multiply) and ambient load when the pair STARTED
        # (at pair end the 1-minute average is dominated by our own legs)
        "outdir": os.environ.get("RAYINDEX_BENCH_OUTDIR", "/tmp"),
        "loadavg_1m": load_at_start,
        "rev": rev,
        "pinned": os.environ.get("RAYINDEX_BENCH_PIN") == "1",
    }


if __name__ == "__main__":
    if "--scaling-query" in sys.argv:
        print(json.dumps(run_scaling_query()))
    elif "--query-bench" in sys.argv:
        print(json.dumps(run_query_bench()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
