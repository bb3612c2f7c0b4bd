"""The index build pipeline — Ray-Data-first.

Replaces the reference's single-threaded chain (stream TSV → per-doc dict
update → 60k-doc segment spill → manual pairwise merge → byte-offset hash →
TF-conversion → VB compression; /root/reference/indexing/main.py:7-29 and
SURVEY.md §3.1) with checkpointed stages:

1. **ingest+tokenize (fused)**  pass 0 reads only the (repo, path) key
   columns per row-group unit; when the boundary keys prove the source
   globally sorted (the common layout), doc ids are positional (1-based
   over ALL rows — an oversize row leaves an id hole) and ONE task per
   unit run re-reads its rows, writes doc-ordered doc-store parts,
   sha256-stamps each row (the ingest invariant), tokenizes, and spools
   per-batch *posting chunks* — one delta+VB-encoded row per (term, fine
   doc block) — as Arrow-IPC files (one record batch per shard run, the
   shard map in the schema metadata).  Content never enters the object
   store.  Unsorted sources fall back to a key sort (keys only — never
   content) plus ONE range-partition content exchange.
2. **shards**   each shard's merge is an independent task that mmaps the
   spool files, random-accesses ONLY its record batches via the IPC
   footer, byte-splices its fine blocks (never decoding a posting
   stream; blob bytes are gathered per chunk, never passed through
   Table.take/combine_chunks) and writes one memory-mappable blob file +
   Arrow term dictionary, atomically, with a per-shard manifest
   (per-partition resume).  No posting byte ever crosses the object
   store; concurrency is capped at 8/node (DRAM-bound splicing).
3. **stats / finalize**   doc_stats + collection_stats from parquet
   footers alone; dense doc-meta bins written OVERLAPPED with the
   merges.  All bulk output goes through rayindex/io.py::direct_write
   (O_DIRECT — the page-cache write-allocation tax on virtualized hosts
   is ~0.15 ms per 4 KiB page and grows with writer concurrency).

Every stage is skipped on resume when its ``.done.json`` fingerprint
matches (rayindex/checkpoint.py).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from rayindex import analysis, codec, schema
from rayindex.io import (AsyncFileWriter, direct_write, direct_write_table,
                         keep_heap_resident, serialize_table)
from rayindex.checkpoint import (BuildCheckpoint, StageResult,
                                 atomic_write_bytes, fingerprint_of)
from rayindex.config import BuildConfig


# sub-phase wall timings for the most recent fused ingest+tokenize stage
# (diagnostic only — lets the scaling probe attribute chunks-stage time to
# pass-1 key sort vs the streaming exchange→tokenize pipeline)
_SUBPHASE: dict[str, float] = {}


def term_shard(term: str, num_shards: int) -> int:
    """Stable shard assignment (zlib.crc32 is platform/run stable, unlike
    Python's salted hash())."""
    return zlib.crc32(term.encode()) % num_shards


# ---------------------------------------------------------------------------
# stage 1: ingest
# ---------------------------------------------------------------------------


def _sha256_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256 read straight off the Arrow data buffer (memoryview
    slices) — ``to_pylist`` would materialize every content byte as a
    Python str first, doubling the stage's allocation traffic (and on this
    sandbox every freshly-faulted page costs ~0.1 ms)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    arr = texts.cast(pa.large_binary()) if texts.type != pa.large_binary() else texts
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    # buffers()[1] offsets are absolute into the data buffer (no rebase);
    # the offsets array itself still needs the arr.offset slice
    offs = np.frombuffer(arr.buffers()[1], np.int64, n + 1, arr.offset * 8)
    data = memoryview(arr.buffers()[2] or b"")
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        out = [hashlib.sha256(data[offs[i]:offs[i + 1]]).hexdigest()
               if valid[i] else None for i in range(n)]
    else:
        out = [hashlib.sha256(data[offs[i]:offs[i + 1]]).hexdigest()
               for i in range(n)]
    return pa.array(out, pa.string())


@ray.remote
def _block_len(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _assign_ids_and_verify(t: pa.Table, offset: int, verify: bool) -> pa.Table:
    """Add dense doc_id = offset+1.. and assert the post-shuffle content still
    hashes to the pre-shuffle sha256 (the per-row ingest invariant)."""
    if t.num_rows == 0:
        # Ray's sort can emit empty boundary blocks with an EMPTY schema
        return pa.table({f.name: pa.array([], f.type) for f in schema.DOC_STORE},
                        schema=schema.DOC_STORE)
    ids = pa.array(np.arange(offset + 1, offset + 1 + t.num_rows, dtype=np.int64))
    sha = _sha256_batch(t["content"])
    if verify:
        pre = t["sha_pre"]
        eq = pc.all(pc.equal(sha, pre)).as_py()
        if not eq:
            bad = pc.filter(t["path"], pc.invert(pc.equal(sha, pre))).to_pylist()[:5]
            raise ValueError(f"ingest sha256 mismatch after shuffle for paths {bad}")
    t = t.drop_columns(["sha_pre"])
    t = t.append_column("doc_id", ids).append_column("content_sha256", sha)
    cols = ["doc_id", "repo", "path", "commit", "lang", "content", "content_sha256"]
    return t.select([c for c in cols if c in t.column_names])


def _ingest_units(source: str) -> list[tuple[str, int]]:
    """(file, row_group) work units — row-group granularity keeps a
    single-giant-file corpus parallel."""
    files = sorted(glob.glob(os.path.join(source, "*.parquet")))
    if not files:
        files = [source]
    units: list[tuple[str, int]] = []
    for f in files:
        try:
            n_rg = pq.ParquetFile(f).num_row_groups
        except Exception:
            n_rg = 1
        units.extend((f, rg) for rg in range(max(n_rg, 1)))
    return units


def _unit_key_col(t: pa.Table):
    """(repo, path) joined with \\x00 — below all valid UTF-8, so the
    joined key's byte order equals (repo, path) tuple order."""
    return pc.binary_join_element_wise(
        pc.fill_null(t["repo"], ""), pc.fill_null(t["path"], ""), "\x00")


@ray.remote
def _unit_bounds(first_unit: int, units: list[tuple[str, int]]) -> pa.Table:
    """Pass 0: per-unit layout summary from the KEY COLUMNS ONLY (repo,
    path — a few KB per row group; content is not read).  One row per
    unit: (n total rows, first/last boundary key, within-unit
    sortedness).  When the driver can chain the boundary keys it proves
    the source globally (repo, path)-sorted and the whole key sort —
    and pass 1's content read — are skipped."""
    su, sn, sf, sl, sk = [], [], [], [], []
    for off, (path, rg) in enumerate(units):
        t = pq.ParquetFile(path).read_row_group(rg, columns=["repo", "path"])
        key = _unit_key_col(t)
        n = t.num_rows
        ok = True
        if n > 1:
            ok = bool(pc.all(pc.greater_equal(
                key.slice(1), key.slice(0, n - 1))).as_py())
        su.append(first_unit + off)
        sn.append(n)
        sf.append(key[0].as_py() if n else "")
        sl.append(key[n - 1].as_py() if n else "")
        sk.append(ok)
    return pa.table({
        "unit_idx": pa.array(su, pa.int64()),
        "n": pa.array(sn, pa.int64()),
        "first_key": pa.array(sf, pa.string()),
        "last_key": pa.array(sl, pa.string()),
        "sorted": pa.array(sk, pa.bool_()),
    })


@ray.remote
def _unit_keys(first_unit: int, units: list[tuple[str, int]]) -> pa.Table:
    """Pass 1 (unsorted sources only): key + content-sha rows for a RUN of
    units.  Content is read once (for the invariant hash) and DISCARDED —
    only (repo, path, sha, provenance) rows enter the sort.  Rows are NOT
    oversize-filtered here: doc ids are assigned over ALL rows (oversize
    rows leave id holes downstream), which keeps id assignment identical
    between the direct and exchange paths.  Batching several units per
    task keeps the block count feeding the key sort small (Ray sorts
    degrade with hundreds of tiny input blocks)."""
    parts = []
    for off, (path, rg) in enumerate(units):
        t = pq.ParquetFile(path).read_row_group(rg, columns=["repo", "path", "content"])
        sha = _sha256_batch(t["content"])
        parts.append(pa.table({
            "repo": t["repo"],
            "path": t["path"],
            "sha": sha,
            "unit_idx": pa.array(np.full(t.num_rows, first_unit + off, np.int64)),
            "row_idx": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        }))
    return pa.concat_tables(parts)



@ray.remote
def _attach_rank(t: pa.Table, offset: int) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({
            "unit_idx": pa.array([], pa.int64()),
            "row_idx": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "sha": pa.array([], pa.string()),
        })
    return pa.table({
        "unit_idx": t["unit_idx"],
        "row_idx": t["row_idx"],
        "doc_id": pa.array(np.arange(offset + 1, offset + 1 + t.num_rows,
                                     dtype=np.int64)),
        "sha": t["sha"],
    })


# docs per doc-store output partition: large enough that downstream
# tokenize batches see contiguous doc runs (compact fine blocks), small
# enough that a failed ingest resumes at fine granularity
_DOC_STORE_PART_DOCS = 4096


def _resolve_auto_shards(cfg: BuildConfig, n_docs: int) -> BuildConfig:
    """num_shards=0 → ~100k docs per shard: keeps every reducer's group
    (and each searcher actor's dictionary share) bounded as the corpus
    grows — deterministic for a given input, so resume re-resolves the
    same value."""
    if cfg.num_shards != 0:
        return cfg
    import dataclasses

    return dataclasses.replace(
        cfg, num_shards=int(min(1 << 14, max(8, -(-n_docs // 100_000)))))


def _ingest_ranked(source: str, cfg: BuildConfig):
    """Pass 1 of the key-only ingest →
    ``(units, ranked_refs, n_docs, metas)``.

    FAST CASE: per-unit summaries (boundary keys + within-unit sortedness,
    computed task-side) prove the source is already globally sorted by
    (repo, path); doc ids then follow from a cumsum over unit counts and
    ``metas`` carries the direct work units — no key ever enters a sort
    (the Ray sort barrier only runs for unsorted sources), and
    ``ranked_refs`` is None.

    Otherwise doc ids are assigned by sorting a (repo, path, sha,
    provenance) KEY table — the content column never enters the SORT and
    is never pinned (``metas`` is None)."""
    t0 = time.perf_counter()
    units = _ingest_units(source)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_key_tasks = int(os.environ.get("RAYINDEX_KEY_TASKS", "0")) or ncpu * 4
    per_task = max(1, -(-len(units) // n_key_tasks))
    spans = list(range(0, len(units), per_task))
    if os.environ.get("RAYINDEX_FORCE_EXCHANGE") != "1":
        # pass 0: metadata-only layout proof (no content read)
        summaries = pa.concat_tables(ray.get(
            [_unit_bounds.remote(i, units[i:i + per_task]) for i in spans]))
        summaries = summaries.take(pc.sort_indices(summaries["unit_idx"]))
        ns = summaries["n"].to_numpy()
        firsts = summaries["first_key"].to_pylist()
        lasts = summaries["last_key"].to_pylist()
        oks = summaries["sorted"].to_numpy(zero_copy_only=False)
        globally_sorted = bool(oks.all()) if oks.size else True
        prev = None
        if globally_sorted:
            for f, l, n in zip(firsts, lasts, ns.tolist()):
                if n == 0:
                    continue
                if prev is not None and f < prev:
                    globally_sorted = False
                    break
                prev = l
        if globally_sorted:
            offs = np.cumsum(ns) - ns  # doc ids are 1-based
            uids = summaries["unit_idx"].to_numpy()
            metas = [(int(u), units[int(u)][0], units[int(u)][1],
                      int(off) + 1, int(n), (f, l))
                     for u, off, n, f, l in zip(uids, offs, ns.tolist(),
                                                firsts, lasts)
                     if n > 0]
            _SUBPHASE["pass1_s"] = round(time.perf_counter() - t0, 3)
            return units, None, int(ns.sum()), metas
    key_refs = [_unit_keys.remote(i, units[i:i + per_task]) for i in spans]
    keys = ray.data.from_arrow_refs(key_refs)
    # Coalesce before sorting: the key table is tiny (no content), but
    # Ray's sort exchanges O(blocks x partitions) sub-blocks — feeding it
    # ncpu*4 scan blocks makes sort overhead grow with CLUSTER SIZE for
    # identical data (measured +28 cpu-s at 32 vs 8 cpus).  Scan wide,
    # sort narrow.
    if len(key_refs) > ncpu:
        keys = keys.repartition(max(8, ncpu))
    # (unit, row) in the sort key makes duplicate (repo, path) rows
    # deterministic too
    keys = keys.sort(["repo", "path", "unit_idx", "row_idx"])
    refs = keys.materialize().to_arrow_refs()
    counts = ray.get([_block_len.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    ranked_refs = [_attach_rank.remote(r, int(off))
                   for r, off, n in zip(refs, offsets, counts) if n > 0]
    _SUBPHASE["pass1_s"] = round(time.perf_counter() - t0, 3)
    return units, ranked_refs, int(sum(counts)), None


def _write_empty_doc_store(out: str) -> None:
    pa_empty = pa.table({f.name: pa.array([], f.type) for f in schema.DOC_STORE},
                        schema=schema.DOC_STORE)
    pq.write_table(pa_empty, os.path.join(out, "part-000000.parquet"))


@ray.remote
def _write_units_direct(metas: list[tuple[int, str, int, int, int, str]],
                        out: str, max_bytes: int, verify: bool,
                        emit: bool, tok_cfg: BuildConfig | None = None,
                        doc_stats_dir: str | None = None,
                        chunks_dir: str | None = None) -> pa.Table:
    """Shuffle-free doc-store write for one run of doc-contiguous units:
    re-read each source row group, re-verify the pass-1 sha digest, assign
    doc_id = first_doc + row, write doc-ordered parts.  Content moves
    source → this task → part file, never through a groupby exchange
    (the exchange's wall time is flat in CPU count on page-fault-bound
    hosts — it was the build's scaling ceiling).

    With ``tok_cfg`` set, the task ALSO tokenizes its rows and spools the
    posting chunks right here (returning only tiny count rows): the
    content bytes then never enter the object store at all.  Measured
    motivation: at 200k files x 32 workers, emitting content through
    plasma into a separate tokenize stage cost 1,378 s of kernel time
    (the host supplies fresh pages at a fixed rate; every plasma object
    and every worker heap is a fresh first-touch) vs 17 s at 8 workers —
    full task fusion removes the allocation entirely and tokenizes the
    bytes while they are still cache-warm from the part write."""
    emit_cols = ["doc_id", "content", "lang", "repo"]
    # spool dir stays None on the instance: chunk tables are buffered here
    # and flushed per task (fewer, larger spool record batches — the merge
    # pays per-chunk gather overhead, so 4x fewer chunks is a direct win)
    tok = (TokenizeToChunks(tok_cfg, doc_stats_dir, None)
           if tok_cfg is not None else None)
    pending: list[pa.Table] = []
    pending_rows = 0
    pending_bytes = 0
    flush_idx = 0
    task_key = f"{metas[0][3]:012d}" if metas else "empty"
    spooled: list[str] = []
    # overlapped output: doc-store parts and spool files are written by a
    # background thread while this thread tokenizes the next unit
    # (os.write releases the GIL); aw.close() below is the durability
    # barrier before any spool name is published to the driver
    aw = AsyncFileWriter()

    def flush() -> None:
        nonlocal pending, pending_rows, pending_bytes, flush_idx
        if pending:
            spooled.append(_spool_chunks(pa.concat_tables(pending), chunks_dir,
                                         f"{task_key}-{flush_idx:03d}", aw))
            pending = []
            pending_rows = 0
            pending_bytes = 0
            flush_idx += 1

    outs = []
    for unit, path, rg, first_doc, n, bounds in metas:
        t = pq.ParquetFile(path).read_row_group(rg)
        if t.num_rows != n:
            raise ValueError(
                f"ingest unit {unit}: {n} pass-0 rows vs {t.num_rows} "
                "source rows — source changed between passes")
        if verify and n:
            key = _unit_key_col(t)
            fk, lk = key[0].as_py(), key[n - 1].as_py()
            ok = n <= 1 or bool(pc.all(pc.greater_equal(
                key.slice(1), key.slice(0, n - 1))).as_py())
            if not ok or (fk, lk) != tuple(bounds):
                raise ValueError(
                    f"ingest unit {unit}: key layout changed between "
                    "passes — source modified during ingest")
        # ids are assigned over ALL rows BEFORE the oversize filter, so an
        # oversize row leaves an id hole: id assignment is positional and
        # identical between the direct and exchange paths (and needs no
        # content read in pass 0/1)
        ids = pa.array(np.arange(first_doc, first_doc + n, dtype=np.int64))
        t = t.append_column("doc_id", ids)
        keep = pc.less_equal(
            pc.binary_length(pc.cast(t["content"], pa.large_binary())), max_bytes)
        t = t.filter(pc.fill_null(keep, False))
        sha2 = _sha256_batch(t["content"])
        t = t.append_column("content_sha256", sha2)
        cols = ["doc_id", "repo", "path", "commit", "lang", "content",
                "content_sha256"]
        t = t.select([c for c in cols if c in t.column_names])
        kept = t.num_rows
        kept_ids = t["doc_id"].to_numpy()
        # slice on absolute doc boundaries so part sizes stay ~uniform even
        # for a single giant row group
        lo = first_doc
        while lo < first_doc + n:
            hi = min(((lo // _DOC_STORE_PART_DOCS) + 1) * _DOC_STORE_PART_DOCS,
                     first_doc + n)
            s = int(np.searchsorted(kept_ids, lo, side="left"))
            e = int(np.searchsorted(kept_ids, hi, side="left"))
            if e > s:
                g = t.slice(s, e - s)
                tmp = os.path.join(out, f"part-u{unit:06d}-{lo:09d}.parquet.tmp-{os.getpid()}")
                aw.submit(tmp, [serialize_table(g, pq.write_table)],
                          os.path.join(out, f"part-u{unit:06d}-{lo:09d}.parquet"))
            lo = hi
        if tok is not None:
            tcols = t.select([c for c in emit_cols if c in t.column_names])
            bs = tok_cfg.tokenize_batch_size
            rows = 0
            for lo2 in range(0, tcols.num_rows, bs):
                ct = tok(tcols.slice(lo2, bs))
                if ct.num_rows:
                    pending.append(ct)
                    pending_rows += ct.num_rows
                    pending_bytes += ct.nbytes
                    rows += ct.num_rows
                # memory-size estimator (A9): bound the task heap by rows
                # AND measured bytes — large docs blow the byte cap long
                # before the row cap
                if (pending_rows >= tok_cfg.spool_flush_rows
                        or pending_bytes >= tok_cfg.spool_flush_bytes):
                    flush()
            outs.append(pa.table({"n": pa.array([kept], pa.int64()),
                                  "rows": pa.array([rows], pa.int64())}))
        elif emit:
            outs.append(t.select([c for c in emit_cols if c in t.column_names]))
        else:
            outs.append(pa.table({"n": pa.array([kept], pa.int64())}))
    flush()
    # durability barrier: joins the writer thread and re-raises its first
    # error — after this every part/spool submitted above is on disk under
    # its final name.  (On an exception above, the task fails and Ray
    # retries it; names are deterministic and bytes idempotent, so a
    # straggling write from the failed attempt is byte-identical.)
    aw.close()
    if not outs:
        if tok is not None:
            return pa.table({"n": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        return (pa.table({c: pa.array([], schema.DOC_STORE.field(c).type)
                          for c in emit_cols}) if emit
                else pa.table({"n": pa.array([], pa.int64())}))
    res = pa.concat_tables(outs)
    if tok is not None and spooled:
        # spool names ride back on the count table so the driver can feed
        # merger actors incrementally (no directory-scan races)
        res = res.replace_schema_metadata(
            {b"rayindex_spools": "\x00".join(spooled).encode()})
    return res


def _doc_exchange(units, ranked_refs, out: str, cfg: BuildConfig,
                  emit: bool, metas=None) -> ray.data.Dataset:
    """Pass 2 of the key-only ingest.

    FAST PATH (shuffle-free): when pass 1's unit summaries proved the
    source globally sorted by (repo, path) — the common layout — the
    caller passes ``metas`` and content never enters an exchange at all:
    one task per unit run re-reads its row groups, re-verifies the pass-1
    sha digest, assigns doc_id = first_doc + row, and writes doc-ordered
    parts.  This removes the build's
    scaling ceiling — the content groupby's wall time is FLAT in CPU
    count on page-fault-bound hosts (~16 s for 400 MB at both 8 and 32
    CPUs, measured), because every content byte takes several extra trips
    through freshly-faulted object-store and reducer heaps.

    GENERAL PATH (one exchange): otherwise content moves through exactly
    ONE range-partition exchange (``groupby(doc_id // part_docs)`` — hash
    partitioning on an int key, no comparison sort, streaming/spillable)
    so the doc store lands GLOBALLY DOC-ORDERED in fixed-range partitions:
    downstream tokenize batches see contiguous doc runs, which is what
    keeps fine-block rows compact (a source-unit-partitioned store
    scatters doc ids across every batch and degenerates the posting
    combiner — measured 8× build cost).  The re-read content's sha256 must
    equal the pass-1 hash (the ingest invariant, held ACROSS two
    independent reads).

    ``emit=True`` makes each writer ALSO return its doc-ordered rows
    (doc_id, content, lang, repo) so tokenization can consume them straight
    from the object store — fusing the two stages removes the doc-store
    write → read-back round trip from the build's critical path."""
    if metas is not None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        per_task = max(1, -(-len(metas) // (ncpu * 4)))
        refs = [_write_units_direct.remote(
                    metas[i:i + per_task], out, cfg.max_content_bytes,
                    cfg.verify_sha256, emit)
                for i in range(0, len(metas), per_task)]
        return ray.data.from_arrow_refs(refs)
    ranked = ray.data.from_arrow_refs(ranked_refs)
    verify = cfg.verify_sha256
    max_bytes = cfg.max_content_bytes

    def attach(group: pa.Table) -> pa.Table:
        """Map-side (content stays local): join ids onto the source unit's
        rows by provenance, verify the invariant, emit full rows."""
        if group.num_rows == 0:
            return pa.table(
                {f.name: pa.array([], f.type) for f in schema.DOC_STORE},
                schema=schema.DOC_STORE)
        ui = int(group["unit_idx"][0].as_py())
        path, rg = units[ui]
        t = pq.ParquetFile(path).read_row_group(rg)
        order = pc.sort_indices(group["row_idx"])
        g = group.take(order)
        if g.num_rows != t.num_rows:
            raise ValueError(
                f"ingest unit {ui}: {g.num_rows} key rows vs {t.num_rows} "
                "source rows — source changed between passes")
        sha2 = _sha256_batch(t["content"])
        if verify and not pc.all(pc.equal(sha2, g["sha"])).as_py():
            raise ValueError(
                f"ingest sha256 mismatch re-reading unit {ui} (pass-1 hash "
                "vs write-pass content)")
        t = t.append_column("doc_id", g["doc_id"]).append_column(
            "content_sha256", sha2)
        # ids were joined over ALL rows; the oversize filter runs AFTER, so
        # oversize rows leave doc-id holes — identical to the direct path
        keep = pc.less_equal(
            pc.binary_length(pc.cast(t["content"], pa.large_binary())), max_bytes)
        t = t.filter(pc.fill_null(keep, False))
        cols = ["doc_id", "repo", "path", "commit", "lang", "content",
                "content_sha256"]
        return t.select([c for c in cols if c in t.column_names])

    def add_range(t: pa.Table) -> pa.Table:
        rng = pc.divide(t["doc_id"], pa.scalar(_DOC_STORE_PART_DOCS, pa.int64()))
        return t.append_column("out_part", pc.cast(rng, pa.int64()))

    emit_cols = ["doc_id", "content", "lang", "repo"]

    def write_range(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            if emit:
                return pa.table({c: pa.array([], schema.DOC_STORE.field(c).type)
                                 for c in emit_cols})
            return pa.table({"n": pa.array([], pa.int64())})
        part = int(group["out_part"][0].as_py())
        g = group.take(pc.sort_indices(group["doc_id"]))
        g = g.drop_columns(["out_part"])
        tmp = os.path.join(out, f"part-{part:06d}.parquet.tmp-{os.getpid()}")
        direct_write_table(tmp, g, pq.write_table)
        os.replace(tmp, os.path.join(out, f"part-{part:06d}.parquet"))
        if emit:
            return g.select([c for c in emit_cols if c in g.column_names])
        return pa.table({"n": pa.array([g.num_rows], pa.int64())})

    return (ranked.groupby("unit_idx")
                  .map_groups(attach, batch_format="pyarrow")
                  .map_batches(add_range, batch_format="pyarrow",
                               zero_copy_batch=True)
                  .groupby("out_part")
                  .map_groups(write_range, batch_format="pyarrow"))


def _stage_ingest_files(source: str, out: str, cfg: BuildConfig) -> dict[str, Any]:
    """Key-only ingest for file sources (unfused resume path)."""
    units, ranked_refs, n_docs, metas = _ingest_ranked(source, cfg)
    if not ranked_refs and not metas:
        _write_empty_doc_store(out)
        return {"n_docs": 0, "n_blocks": 0}
    rows = _doc_exchange(units, ranked_refs, out, cfg, emit=False,
                         metas=metas)
    n_docs = int(rows.to_pandas()["n"].sum())
    return {"n_docs": n_docs, "n_blocks": len(units)}


def _stage_ingest_tokenize(source: str, doc_store_out: str, chunks_out: str,
                           doc_stats_dir: str, cfg: BuildConfig,
                           shard_dir: str | None = None,
                           fingerprint: str | None = None):
    """Fused file-source ingest + tokenize: ONE streaming pipeline from the
    ranked keys through the content exchange into posting chunks.  The
    doc-store part files are written by the same range writers whose output
    feeds tokenization, so the doc_store write overlaps tokenize compute
    and the content is never read back from disk.  Returns
    (metrics, resolved_cfg, merge_pool) — num_shards auto-resolution
    happens here because n_docs is known right after the key sort, before
    any shard assignment.  On the direct path a _MergePool is created and
    fed each task's spool files AS THE TASK COMPLETES, so the shard stage's
    spool gather (file opens + page-in) overlaps ingest instead of running
    on the build's critical tail."""
    shutil.rmtree(doc_store_out, ignore_errors=True)
    os.makedirs(doc_store_out, exist_ok=True)
    shutil.rmtree(doc_stats_dir, ignore_errors=True)
    os.makedirs(doc_stats_dir, exist_ok=True)
    units, ranked_refs, n_docs, metas = _ingest_ranked(source, cfg)
    cfg = _resolve_auto_shards(cfg, n_docs)
    metrics = {"n_docs": n_docs, "n_blocks": len(units)}
    if not ranked_refs and not metas:
        _write_empty_doc_store(doc_store_out)
        return metrics, cfg, None  # no spool files → every shard written empty
    t1 = time.perf_counter()
    pool = None
    if metas is not None:
        # FULLY fused direct path: each task re-reads its units, writes the
        # doc-store parts, and tokenizes + spools the same bytes in-heap.
        # Content never enters the object store (see _write_units_direct);
        # only tiny (n, rows) count tables come back.
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        per_task = max(1, -(-len(metas) // (ncpu * 4)))
        refs = [_write_units_direct.remote(
                    metas[i:i + per_task], doc_store_out,
                    cfg.max_content_bytes, cfg.verify_sha256, False,
                    cfg, doc_stats_dir, chunks_out)
                for i in range(0, len(metas), per_task)]
        if shard_dir is not None and fingerprint is not None:
            pool = _MergePool(shard_dir, fingerprint, cfg)
        cons = (_SpoolConsolidator(pool, cfg)
                if pool is not None and cfg.spool_consolidate_group > 0
                else None)
        pending = list(refs)
        rows_sum = 0
        while pending:
            done, pending = ray.wait(pending, num_returns=1)
            t = ray.get(done[0])
            if pool is not None:
                md = (t.schema.metadata or {}).get(b"rayindex_spools", b"")
                if md:
                    names = md.decode().split("\x00")
                    if cons is not None:
                        cons.add(names)
                    else:
                        pool.feed(names)
            if t.num_rows:
                rows_sum += int(pc.sum(t["rows"]).as_py() or 0)
        if cons is not None:
            cons.drain()
        metrics["n_chunk_rows"] = rows_sum
    else:
        ds = _doc_exchange(units, ranked_refs, doc_store_out, cfg, emit=True)
        ds = ds.map_batches(
            TokenizeToChunks(cfg, doc_stats_dir, chunks_out),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.tokenize_batch_size,
        )
        mat = ds.materialize()  # tiny: one summary row per tokenize batch
        metrics["n_chunk_rows"] = int(mat.sum("rows") or 0)
        if os.environ.get("RAYINDEX_PIPE_STATS") == "1":  # diagnostic
            print(mat.stats(), flush=True)
    _SUBPHASE["pipeline_s"] = round(time.perf_counter() - t1, 3)
    metrics.update(_SUBPHASE)
    return metrics, cfg, pool


def _stage_ingest(ds: ray.data.Dataset, out: str, cfg: BuildConfig) -> dict[str, Any]:
    max_bytes = cfg.max_content_bytes

    def prep(t: pa.Table) -> pa.Table:
        # oversize filter — the reference drops rows with title/url >= 1000
        # chars (/root/reference/indexing/index_builder/index_build.py:147-148);
        # for code the knob is max content bytes.
        keep = pc.less_equal(pc.binary_length(pc.cast(t["content"], pa.large_binary())), max_bytes)
        t = t.filter(pc.fill_null(keep, False))
        return t.append_column("sha_pre", _sha256_batch(t["content"]))

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.sort(["repo", "path"])
    # Deterministic dense doc_id: Dataset has no zip_with_index, so drop to
    # block refs (objects stay in the object store — no driver materialize):
    # per-block row counts → cumulative offsets → per-block assignment task.
    # materialize once so to_arrow_refs / schema probes don't re-run the sort
    refs = ds.materialize().to_arrow_refs()
    counts = ray.get([_block_len.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    new_refs = [
        _assign_ids_and_verify.remote(r, int(off), cfg.verify_sha256)
        for r, off, n in zip(refs, offsets, counts)
        if n > 0  # sort emits empty boundary blocks; drop them here
    ]
    out_ds = ray.data.from_arrow_refs(new_refs)
    out_ds.write_parquet(out)
    return {"n_docs": int(sum(counts)), "n_blocks": len(counts)}


# ---------------------------------------------------------------------------
# stage 2: tokenize → posting chunks (+ doc-stat side table)
# ---------------------------------------------------------------------------


class TokenizeToChunks:
    """Stateful map_batches callable: analyzer config + stem cache live for
    the actor's lifetime (the reference rebuilt its whole Preprocessing
    object per document, /root/reference/indexing/index_builder/index_build.py:178).

    When ``doc_stats_dir`` is set, each batch side-writes its per-doc stats
    (doc_id, n_tokens, lang, repo) as an idempotently-named parquet part —
    the doc-stats table falls out of the tokenize pass for free instead of
    a separate scan of the chunks table (reference doc_sizes.json,
    /root/reference/indexing/index_builder/index_build.py:181-183).

    When ``chunks_spool_dir`` is set, the posting-chunk rows NEVER enter the
    object store: each batch writes ONE Arrow-IPC file with one record batch
    per shard run (shard ids in the schema metadata), and the shard merge
    mmaps the file and random-accesses ONLY its shard's record batch through
    the IPC footer.  Compared to the previous ``write_parquet(partition_cols
    =["shard"])`` exchange this removes (a) a full plasma round trip of
    every posting byte, (b) snappy decode of already-VB-compressed blobs,
    and (c) ~350-row parquet row groups whose per-group overhead was ~70%
    of the merge's read cost (measured: 12-file shard partition read 150 ms
    vs 34 ms as one file).  File count is O(batches) — at larger corpora
    raise ``tokenize_batch_size`` or consolidate spools per node."""

    def __init__(self, cfg: BuildConfig, doc_stats_dir: str | None = None,
                 chunks_spool_dir: str | None = None):
        self.cfg = cfg
        self.doc_stats_dir = doc_stats_dir
        self.chunks_spool_dir = chunks_spool_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # batches may stitch blocks out of order — sort so doc runs ascend
        order = pc.sort_indices(batch["doc_id"])
        batch = batch.take(order)
        doc_ids = batch["doc_id"].to_numpy()
        n_rows = batch.num_rows
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * n_rows
        repos = batch["repo"].to_pylist() if "repo" in batch.column_names else [None] * n_rows

        # the content column goes in AS ARROW: all-ASCII batches tokenize
        # on the C++ fast path without materializing Python strings
        counts, g_doc, g_terms, g_tfs, pos_flat = analysis.tokenize_docs_grouped(
            batch["content"], cfg.analyzer
        )
        if counts.size and int(counts.max()) >= (1 << 26):
            # positions must fit the query-time (doc, pos) composite key
            # space (scoring._POS_SHIFT); raise at build time, not as a
            # silent corruption at query time
            bad = doc_ids[int(np.argmax(counts))]
            raise ValueError(
                f"doc {bad} has {int(counts.max())} token positions "
                f">= 2^26; raise max_content_bytes guard or scoring._POS_SHIFT")

        n_docs_batch = doc_ids.size
        R = cfg.fine_block_docs
        if g_terms.size:
            # regroup (doc, term) rows into per-(term, fine block) runs of
            # ascending docs — fully vectorized; blobs are cut from ONE
            # whole-stream VB pass per stream (codec.vb_encode_split).
            # Fine blocks are doc-range keyed (doc // fine_block_docs), so
            # every downstream merge is a metadata aggregate + byte splice:
            # the shard writer never decodes a posting stream.
            term_codes, term_uniques = pd.factorize(g_terms, sort=True)
            g_starts = np.cumsum(g_tfs) - g_tfs  # position-slice start per group
            order2 = np.lexsort((g_doc, term_codes))
            sorted_codes = term_codes[order2]
            t_docs = doc_ids[g_doc[order2]]
            t_tfs = g_tfs[order2]
            t_dls = counts[g_doc[order2]]
            t_blk = t_docs // R
            seg_starts = np.flatnonzero(np.concatenate([[True],
                (sorted_codes[1:] != sorted_codes[:-1])
                | (t_blk[1:] != t_blk[:-1])]))
            seg_ends = np.append(seg_starts[1:], sorted_codes.size)
            terms = [term_uniques[c] for c in sorted_codes[seg_starts]]

            first = t_docs[seg_starts]
            last = t_docs[seg_ends - 1]
            nd = seg_ends - seg_starts
            cf = np.add.reduceat(t_tfs, seg_starts)
            max_tf = np.maximum.reduceat(t_tfs, seg_starts)
            min_dl = np.minimum.reduceat(t_dls, seg_starts)

            doc_blobs = codec.vb_encode_split(
                codec.segmented_delta_encode(t_docs, seg_starts), seg_starts)
            tf_blobs = codec.vb_encode_split(t_tfs.astype(np.uint64), seg_starts)

            if cfg.keep_positions and pos_flat.size:
                # gather positions into the (term, doc) sorted order
                lens = t_tfs
                offs = np.repeat(np.cumsum(lens) - lens, lens)
                src = np.repeat(g_starts[order2], lens) + np.arange(lens.sum()) - offs
                pos_sorted = pos_flat[src]
                grp_starts = np.cumsum(lens) - lens  # per-(term,doc) segments
                pos_deltas = codec.segmented_delta_encode(pos_sorted, grp_starts)
                # fine-block boundaries in position-value space
                seg_pos_starts = grp_starts[seg_starts]
                pos_blobs = codec.vb_encode_split(pos_deltas, seg_pos_starts)
            else:
                pos_blobs = [b""] * len(terms)

            n_t = len(terms)
            chunk_tbl = {
                "term": terms,
                "range_id": (first // cfg.doc_range_size).astype(np.int64),
                "shard": np.asarray(
                    [term_shard(t, cfg.num_shards) for t in terms], np.int32),
                "block_id": t_blk[seg_starts].astype(np.int64),
                "first_doc": first,
                "last_doc": last,
                "n_docs": nd.astype(np.int64),
                "cf": cf.astype(np.int64),
                "max_tf": max_tf.astype(np.int32),
                "min_dl": min_dl.astype(np.int32),
                "doc_blob": doc_blobs,
                "tf_blob": tf_blobs,
                "pos_blob": pos_blobs,
            }
        else:
            n_t = 0
            chunk_tbl = {k: [] for k in (
                "term", "range_id", "shard", "block_id", "first_doc", "last_doc",
                "n_docs", "cf", "max_tf", "min_dl", "doc_blob", "tf_blob",
                "pos_blob")}

        if self.doc_stats_dir is not None and n_docs_batch:
            # idempotent name: doc ranges are disjoint across batches, and a
            # retried/speculative task re-emits byte-identical content under
            # the same name (atomic replace)
            stats_tbl = pa.table({
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "repo": pa.array(repos, pa.string()),
            })
            # stamp the part's token sum into the footer so the stats stage
            # aggregates from metadata alone (never re-reads data pages)
            stats_tbl = stats_tbl.replace_schema_metadata(
                {b"rayindex_total_tokens": str(int(counts.sum())).encode()})
            name = f"ds-{int(doc_ids[0]):012d}-{int(doc_ids[-1]):012d}.parquet"
            tmp = os.path.join(self.doc_stats_dir, f".{name}.tmp-{os.getpid()}")
            direct_write_table(tmp, stats_tbl, pq.write_table)
            os.replace(tmp, os.path.join(self.doc_stats_dir, name))

        cols = {
            "term": pa.array(list(chunk_tbl["term"]), pa.string()),
            "range_id": pa.array(
                np.asarray(chunk_tbl["range_id"], np.int64)),
            "shard": pa.array(np.asarray(chunk_tbl["shard"], np.int32)),
            "doc_blob": pa.array(
                list(chunk_tbl["doc_blob"]), pa.large_binary()),
            "tf_blob": pa.array(
                list(chunk_tbl["tf_blob"]), pa.large_binary()),
            "pos_blob": pa.array(
                list(chunk_tbl["pos_blob"]), pa.large_binary()),
        }
        for name, dtype in (("block_id", pa.int64()),
                            ("first_doc", pa.int64()), ("last_doc", pa.int64()),
                            ("n_docs", pa.int64()), ("cf", pa.int64()),
                            ("max_tf", pa.int32()), ("min_dl", pa.int32())):
            cols[name] = pa.array(
                np.asarray(chunk_tbl[name], dtype.to_pandas_dtype()))
        chunks = pa.table(cols, schema=schema.POSTING_CHUNKS)
        if self.chunks_spool_dir is None:
            return chunks
        if chunks.num_rows:
            self._spool(chunks, int(doc_ids[0]))
        return pa.table({"rows": pa.array([chunks.num_rows], pa.int64())})

    def _spool(self, chunks: pa.Table, first_doc: int) -> None:
        _spool_chunks(chunks, self.chunks_spool_dir, f"{first_doc:012d}")


def _spool_chunks(chunks: pa.Table, spool_dir: str, name_key: str,
                  aw: AsyncFileWriter | None = None) -> str:
    """One IPC spool file: record batch i holds shard runs[i]; the shard
    list rides in the schema metadata so a merge task can read only its
    own batches (mmap + footer random access).  Idempotent name (name_key
    derives from disjoint doc ranges; a retried task re-emits identical
    bytes under the same name, atomic replace)."""
    order = pc.sort_indices(chunks["shard"])
    chunks = chunks.take(order).combine_chunks()
    shards = chunks["shard"].to_numpy()
    run_starts = (np.flatnonzero(np.concatenate(
        [[True], shards[1:] != shards[:-1]]))
        if shards.size else np.zeros(0, np.int64))
    run_ends = np.append(run_starts[1:], shards.size)
    shard_list = ",".join(str(int(s)) for s in shards[run_starts])
    sch = schema.POSTING_CHUNKS.with_metadata(
        {b"rayindex_shards": shard_list.encode()})
    name = f"part-{name_key}.arrow"
    tmp = os.path.join(spool_dir, f".{name}.tmp-{os.getpid()}")
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, sch) as writer:
        for s, e in zip(run_starts.tolist(), run_ends.tolist()):
            writer.write_batch(
                chunks.slice(s, e - s).to_batches()[0])
    final = os.path.join(spool_dir, name)
    if aw is not None:
        # overlapped write: the name is returned immediately, but the
        # caller only publishes spool names after aw.close() succeeds
        aw.submit(tmp, [sink.getvalue()], final)
    else:
        direct_write(tmp, [sink.getvalue()])
        os.replace(tmp, final)
    return final


@ray.remote
def _consolidate_spools(files: list[str], out_dir: str, key: str) -> str:
    """Repackage K spool files into ONE, record batches copied VERBATIM
    (zero decode — the merge is batching-invariant, so index bytes are
    unchanged) and ordered shard-major so each merger actor's batches sit
    contiguously in the combined file.  Crash safety: the combined file
    lands by atomic rename CARRYING ITS SOURCE NAMES in the schema
    metadata (``rayindex_consolidated_from``) BEFORE the sources are
    unlinked — a crash between rename and unlink leaves duplicates that
    the resume scan (_resume_spool_files) drops by that metadata."""
    final = os.path.join(out_dir, f"part-{key}-cons.arrow")
    if os.path.exists(final) and not all(os.path.exists(f) for f in files):
        # a prior attempt already consolidated (and removed some sources)
        # but its return value was lost — the combined file is complete
        # (atomic rename) so just re-return it
        return final
    entries: list[tuple[int, int, int]] = []  # (shard, file_idx, batch_idx)
    readers = []
    for fi, f in enumerate(files):
        # sources are O_DIRECT-written (never in page cache): readahead
        # before mmap or every batch copy faults 4 KiB synchronously
        try:
            fd = os.open(f, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_WILLNEED)
            finally:
                os.close(fd)
        except OSError:
            pass
        reader = pa.ipc.open_file(pa.memory_map(f))
        readers.append(reader)
        raw = (reader.schema.metadata or {}).get(b"rayindex_shards", b"")
        if not raw:
            continue
        for bi, s in enumerate(raw.decode().split(",")):
            entries.append((int(s), fi, bi))
    entries.sort()  # shard-major; (file_idx, batch_idx) tiebreak is
    # deterministic because the caller passes files sorted
    sch = schema.POSTING_CHUNKS.with_metadata({
        b"rayindex_shards": ",".join(str(e[0]) for e in entries).encode(),
        b"rayindex_consolidated_from": "\x00".join(
            os.path.basename(f) for f in files).encode()})
    tmp = f"{final}.tmp-{os.getpid()}"
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, sch) as w:
        for _, fi, bi in entries:
            w.write_batch(readers[fi].get_batch(bi))
    direct_write(tmp, [sink.getvalue()])
    os.replace(tmp, final)
    del readers  # drop the mmaps before unlinking their files
    for f in files:
        try:
            os.remove(f)
        except OSError:
            pass
    return final


def _resume_spool_files(chunks_path: str) -> list[str]:
    """Directory scan for the resume/exchange merge path, dropping any
    source spool that a consolidated file already contains (a crash
    between the consolidator's rename and its source unlinks leaves
    both on disk; feeding both would double postings)."""
    files = sorted(glob.glob(os.path.join(chunks_path, "*.arrow")))
    consolidated = [f for f in files if f.endswith("-cons.arrow")]
    if not consolidated:
        return files
    absorbed: set[str] = set()
    for f in consolidated:
        md = pa.ipc.open_file(pa.memory_map(f)).schema.metadata or {}
        raw = md.get(b"rayindex_consolidated_from", b"")
        absorbed.update(raw.decode().split("\x00") if raw else [])
    return [f for f in files if os.path.basename(f) not in absorbed]


class _SpoolConsolidator:
    """Driver-side grouping of completed spool names into consolidation
    tasks, preserving the incremental overlap with ingest: groups launch
    as soon as G names (or the byte cap) accumulate, and ready combined
    files are fed to the merger pool opportunistically via ray.wait."""

    def __init__(self, pool: "_MergePool", cfg: BuildConfig):
        self.pool = pool
        self.group = cfg.spool_consolidate_group
        self.byte_cap = cfg.spool_consolidate_bytes
        self.buf: list[str] = []
        self.buf_bytes = 0
        self.refs: list = []
        self.seq = 0

    def _launch(self) -> None:
        if self.buf:
            self.refs.append(_consolidate_spools.remote(
                sorted(self.buf), os.path.dirname(self.buf[0]),
                f"c{self.seq:06d}"))
            self.seq += 1
            self.buf, self.buf_bytes = [], 0

    def add(self, names: list[str]) -> None:
        for n in names:
            self.buf.append(n)
            try:
                self.buf_bytes += os.path.getsize(n)
            except OSError:
                pass
            if len(self.buf) >= self.group or self.buf_bytes >= self.byte_cap:
                self._launch()
        # feed whatever consolidations finished while ingest ran
        if self.refs:
            done, self.refs = ray.wait(self.refs, num_returns=len(self.refs),
                                       timeout=0)
            if done:
                self.pool.feed(ray.get(list(done)))

    def drain(self) -> None:
        # tail smaller than a group still consolidates (one small task)
        # so the merge NEVER re-opens unconsolidated stragglers
        self._launch()
        if self.refs:
            self.pool.feed(ray.get(self.refs))
            self.refs = []


@ray.remote
def _tokenize_parts(paths: list[str], cfg: BuildConfig,
                    doc_stats_dir: str | None, spool_dir: str) -> int:
    """Unfused/resume tokenize: read doc-store parts, tokenize, spool —
    content stays in this task's heap (no object-store round trip)."""
    tok = TokenizeToChunks(cfg, doc_stats_dir, None)
    pending: list[pa.Table] = []
    rows = 0
    pending_rows = 0
    pending_bytes = 0
    first_key = None

    def flush() -> None:
        nonlocal pending, pending_rows, pending_bytes, first_key
        if pending:
            _spool_chunks(pa.concat_tables(pending), spool_dir,
                          f"{first_key:012d}")
        pending, pending_rows, pending_bytes, first_key = [], 0, 0, None

    for p in paths:
        t = pq.read_table(
            p, columns=[c for c in ("doc_id", "content", "lang", "repo")
                        if c in pq.read_schema(p).names])
        for lo in range(0, t.num_rows, cfg.tokenize_batch_size):
            ct = tok(t.slice(lo, cfg.tokenize_batch_size))
            if ct.num_rows:
                if first_key is None:
                    first_key = int(t["doc_id"][lo].as_py())
                pending.append(ct)
                rows += ct.num_rows
                pending_rows += ct.num_rows
                pending_bytes += ct.nbytes
                # same bounded-heap estimator as the fused path (A9) —
                # a task holding many doc-store parts must not accumulate
                # the whole run's posting chunks in memory (spool names
                # stay idempotent: first doc_id of the flushed span)
                if (pending_rows >= cfg.spool_flush_rows
                        or pending_bytes >= cfg.spool_flush_bytes):
                    flush()
    flush()
    return rows


def _stage_chunks(doc_store: str, out: str, cfg: BuildConfig,
                  doc_stats_dir: str | None = None) -> dict[str, Any]:
    if doc_stats_dir is not None:
        # doc_stats is a product of this stage: wipe any stale parts (the
        # stats stage itself runs with clear=False and only aggregates)
        shutil.rmtree(doc_stats_dir, ignore_errors=True)
        os.makedirs(doc_stats_dir, exist_ok=True)
    # one task per group of doc-store parts: read → tokenize → spool, all
    # in the task heap (same object-store-free shape as the fused path)
    parts = sorted(glob.glob(os.path.join(doc_store, "*.parquet")))
    if not parts:
        return {"n_chunk_rows": 0}
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    per_task = max(1, -(-len(parts) // (ncpu * 4)))
    refs = [_tokenize_parts.remote(parts[i:i + per_task], cfg,
                                   doc_stats_dir, out)
            for i in range(0, len(parts), per_task)]
    return {"n_chunk_rows": int(sum(ray.get(refs)))}


# ---------------------------------------------------------------------------
# stage 3: salted two-phase fine-block merge → shard files
#
# Every row is a (term, fine block) part; fine blocks are doc-range keyed
# (block_id = doc // fine_block_docs) so ALL merging is (a) metadata
# aggregation (max/min/sum keyed by block_id — order independent, hence
# canonical under any batching) and (b) byte splicing of VB streams, where
# only each non-leading part's first value is re-encoded as a delta bridge.
# No stage ever decodes a posting stream (the round-1 whole-shard decode —
# the DRAM-bandwidth hotspot behind writer anti-scaling — is gone); the
# one exception is the rare interleaved-parts repair, which decodes only
# the affected fine block (< fine_block_docs postings).
# ---------------------------------------------------------------------------




def _vb_head_lens(data: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Byte length of the first VB value at each ``starts`` offset —
    vectorized scan for the terminating high bit (values are <= 10 bytes)."""
    h = np.zeros(starts.size, np.int64)
    rem = np.ones(starts.size, bool)
    for i in range(10):
        if not rem.any():
            break
        idx = np.flatnonzero(rem)
        b = data[starts[idx] + i]
        done = (b & 0x80) != 0
        h[idx[done]] = i + 1
        rem[idx[done]] = False
    if rem.any():
        raise ValueError("malformed VB stream: no terminating byte in 10")
    return h


def _ragged_copy(dst: np.ndarray, dst_starts: np.ndarray, src: np.ndarray,
                 src_starts: np.ndarray, lens: np.ndarray) -> None:
    """Vectorized multi-slice copy: dst[ds:ds+l] = src[ss:ss+l] per piece."""
    lens = np.asarray(lens, np.int64)
    nz = lens > 0
    if not nz.any():
        return
    d0 = np.asarray(dst_starts, np.int64)[nz]
    s0 = np.asarray(src_starts, np.int64)[nz]
    ln = lens[nz]
    base = np.cumsum(ln) - ln
    off = np.arange(int(ln.sum()), dtype=np.int64) - np.repeat(base, ln)
    dst[np.repeat(d0, ln) + off] = src[np.repeat(s0, ln) + off]


def _binary_column_view(g: pa.Table, name: str) -> tuple[memoryview, np.ndarray]:
    """(data memoryview, value offsets) of a single-chunk binary column —
    the data buffer is the row-order concatenation of all cells."""
    arr = g[name]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()  # [validity, offsets, data]
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs_all = np.frombuffer(bufs[1], off_dtype)
    # offsets are absolute positions into the data buffer, so a slice view
    # needs no rebasing even when arr.offset != 0
    offs = offs_all[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    return memoryview(bufs[2] or b""), offs


class _BlobChunks:
    """Per-chunk zero-copy access to a (possibly chunked) binary column:
    lets the shard merge gather row slices straight from the mmap'd IPC
    spool buffers into an output stream — no ``combine_chunks`` and no
    ``Table.take`` pass over the posting bytes (each of which copied EVERY
    blob byte; together they were half the merge's DRAM traffic)."""

    def __init__(self, col):
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        self.data: list[np.ndarray] = []
        self.offs: list[np.ndarray] = []
        sizes = []
        for ch in chunks:
            bufs = ch.buffers()
            od = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
            offs_all = np.frombuffer(bufs[1], od) if bufs[1] is not None else np.zeros(1, od)
            self.offs.append(
                offs_all[ch.offset: ch.offset + len(ch) + 1].astype(np.int64))
            self.data.append(np.frombuffer(bufs[2] or b"", np.uint8))
            sizes.append(len(ch))
        self.bounds = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

    def row_lens(self) -> np.ndarray:
        """Byte length per row, original row order."""
        return np.concatenate([o[1:] - o[:-1] for o in self.offs]) \
            if self.offs else np.zeros(0, np.int64)

    def _by_chunk(self, rows: np.ndarray):
        cid = np.searchsorted(self.bounds, rows, side="right") - 1
        order = np.argsort(cid, kind="stable")
        cid_sorted = cid[order]
        for k in range(len(self.data)):
            lo = np.searchsorted(cid_sorted, k, side="left")
            hi = np.searchsorted(cid_sorted, k, side="right")
            if lo < hi:
                yield k, order[lo:hi]

    def gather(self, rows: np.ndarray, dst: np.ndarray, dst_starts: np.ndarray,
               lens: np.ndarray, head_skip: np.ndarray | None = None) -> None:
        """dst[dst_starts[i]:+lens[i]] = row bytes of ``rows[i]`` (skipping
        ``head_skip[i]`` leading bytes), gathered chunk by chunk."""
        for k, sel in self._by_chunk(rows):
            local = rows[sel] - self.bounds[k]
            src_starts = self.offs[k][local]
            if head_skip is not None:
                src_starts = src_starts + head_skip[sel]
            _ragged_copy(dst, dst_starts[sel], self.data[k], src_starts,
                         lens[sel])

    def head_lens(self, rows: np.ndarray) -> np.ndarray:
        """Byte length of the first VB value of each row's blob."""
        out = np.zeros(rows.size, np.int64)
        for k, sel in self._by_chunk(rows):
            local = rows[sel] - self.bounds[k]
            out[sel] = _vb_head_lens(self.data[k], self.offs[k][local])
        return out


def _repair_interleaved(g: pa.Table, codes: np.ndarray,
                        overlap: np.ndarray) -> pa.Table:
    """Decode-merge fine blocks whose parts interleave (batches straddling
    block boundaries).  Only the affected fine blocks (< fine_block_docs
    postings each) are decoded; everything else passes through untouched.
    Returns an UNSORTED table (caller re-sorts)."""
    blk = g["block_id"].to_numpy()
    fb_change = np.concatenate([[True], (codes[1:] != codes[:-1])
                                | (blk[1:] != blk[:-1])])
    fb_id = np.cumsum(fb_change) - 1
    bad_fb = np.unique(fb_id[overlap])
    sel = np.isin(fb_id, bad_fb)
    good = g.filter(pa.array(~sel))
    # fb_id is non-decreasing (rows sorted by term, block) → per-block row
    # spans come from two searchsorted calls, not a per-block scan
    fb_starts = np.searchsorted(fb_id, bad_fb, side="left")
    fb_ends = np.searchsorted(fb_id, bad_fb, side="right")

    doc_mv, doc_offs = _binary_column_view(g, "doc_blob")
    tf_mv, tf_offs = _binary_column_view(g, "tf_blob")
    pos_mv, pos_offs = _binary_column_view(g, "pos_blob")
    nd_all = g["n_docs"].to_numpy()
    mdl_all = g["min_dl"].to_numpy()
    rows: dict[str, list] = {k: [] for k in (
        "term", "range_id", "shard", "block_id", "first_doc", "last_doc",
        "n_docs", "cf", "max_tf", "min_dl", "doc_blob", "tf_blob", "pos_blob")}
    for s, e in zip(fb_starts.tolist(), fb_ends.tolist()):
        nd = nd_all[s:e].astype(np.int64)
        doc_ids = codec.segmented_delta_decode(
            codec.vb_decode(doc_mv[doc_offs[s]:doc_offs[e]]), nd)
        tfs = codec.vb_decode(tf_mv[tf_offs[s]:tf_offs[e]]).astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        d_sorted = doc_ids[order]
        if d_sorted.size > 1 and not (np.diff(d_sorted) > 0).all():
            raise ValueError("duplicate doc_id across parts of one fine block")
        tf_sorted = tfs[order]
        pos_blob = b""
        pos_all = pos_mv[pos_offs[s]:pos_offs[e]]
        if len(pos_all):
            pos_vals = codec.segmented_delta_decode(codec.vb_decode(pos_all), tfs)
            starts = np.cumsum(tfs) - tfs
            lens = tfs[order]
            offs = np.repeat(np.cumsum(lens) - lens, lens)
            src = np.repeat(starts[order], lens) + np.arange(int(lens.sum())) - offs
            pos_sorted = pos_vals[src]
            seg_starts = np.cumsum(lens) - lens
            pos_blob = codec.vb_encode(
                codec.segmented_delta_encode(pos_sorted, seg_starts))
        rows["term"].append(g["term"][s].as_py())
        rows["range_id"].append(g["range_id"][s].as_py())
        rows["shard"].append(g["shard"][s].as_py())
        rows["block_id"].append(g["block_id"][s].as_py())
        rows["first_doc"].append(int(d_sorted[0]))
        rows["last_doc"].append(int(d_sorted[-1]))
        rows["n_docs"].append(int(d_sorted.size))
        rows["cf"].append(int(tf_sorted.sum()))
        rows["max_tf"].append(int(tf_sorted.max()))
        rows["min_dl"].append(int(mdl_all[s:e].min()))
        rows["doc_blob"].append(codec.vb_encode(codec.delta_encode(d_sorted)))
        rows["tf_blob"].append(codec.vb_encode(tf_sorted.astype(np.uint64)))
        rows["pos_blob"].append(pos_blob)
    rep = pa.table(
        {
            "term": pa.array(rows["term"], pa.string()),
            "range_id": pa.array(rows["range_id"], pa.int64()),
            "shard": pa.array(rows["shard"], pa.int32()),
            "block_id": pa.array(rows["block_id"], pa.int64()),
            "first_doc": pa.array(rows["first_doc"], pa.int64()),
            "last_doc": pa.array(rows["last_doc"], pa.int64()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "cf": pa.array(rows["cf"], pa.int64()),
            "max_tf": pa.array(rows["max_tf"], pa.int32()),
            "min_dl": pa.array(rows["min_dl"], pa.int32()),
            "doc_blob": pa.array(rows["doc_blob"], pa.large_binary()),
            "tf_blob": pa.array(rows["tf_blob"], pa.large_binary()),
            "pos_blob": pa.array(rows["pos_blob"], pa.large_binary()),
        },
        schema=schema.POSTING_CHUNKS,
    )
    return pa.concat_tables([good, rep]).combine_chunks()


class _FineView:
    """Sorted fine-block rows of one reducer group, with canonical block
    grouping and the spliced doc stream assembled in one vectorized pass.

    ``block_size=None``: one output group per fine block (phase-1 part
    merge).  ``block_size=B``: fine blocks are coalesced into dict blocks
    of ~B postings via the canonical per-term cumsum rule — group
    boundaries depend only on the fine-block sequence (doc-range keyed),
    never on upstream batching, so artifacts stay byte-identical under any
    parallelism.  Doc streams restart their delta chain (absolute value)
    exactly at group starts; every internal part boundary gets a bridge
    delta — producing bytes identical to encoding the whole group at once.
    """

    def __init__(self, group: pa.Table, block_size: int | None):
        _t0 = time.perf_counter()
        g = group
        sort_keys = [("term", "ascending"), ("block_id", "ascending"),
                     ("first_doc", "ascending")]

        def comb(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        # Sort ONLY the permutation — metadata columns are permuted as numpy
        # arrays and blob bytes are gathered straight from the (mmap'd) chunk
        # buffers below; the posting bytes never pass through Table.take or
        # combine_chunks (each copied every blob byte — together half the
        # merge's DRAM traffic).  The sort itself runs string comparisons
        # only over the UNIQUE terms (dictionary ranks), then one integer
        # lexsort over the rows.
        term_comb = comb(g["term"])
        denc = pc.dictionary_encode(term_comb)
        rank = np.empty(len(denc.dictionary), np.int64)
        rank[pc.sort_indices(denc.dictionary).to_numpy()] = np.arange(
            len(denc.dictionary))
        key_term = rank[denc.indices.to_numpy()]
        first_o = comb(g["first_doc"]).to_numpy()
        blk_o = comb(g["block_id"]).to_numpy()
        perm = np.lexsort((first_o, blk_o, key_term))
        n = perm.size
        codes = key_term[perm]
        first = first_o[perm]
        last = comb(g["last_doc"]).to_numpy()[perm]
        overlap = np.zeros(n, bool)
        if n > 1:
            overlap[1:] = (codes[1:] == codes[:-1]) & (first[1:] <= last[:-1])
        if overlap.any():
            # rare slow path (parts of one fine block with overlapping doc
            # ranges): materialize sorted, decode-repair those blocks only
            g = g.take(pa.array(perm)).combine_chunks()
            for _ in range(3):
                codes = pc.dictionary_encode(comb(g["term"])).indices.to_numpy()
                first = g["first_doc"].to_numpy()
                last = g["last_doc"].to_numpy()
                n = codes.size
                overlap = np.zeros(n, bool)
                if n > 1:
                    overlap[1:] = (codes[1:] == codes[:-1]) & (first[1:] <= last[:-1])
                if not overlap.any():
                    break
                g = _repair_interleaved(g, codes, overlap)
                g = g.take(pc.sort_indices(g, sort_keys=sort_keys)).combine_chunks()
            else:
                raise RuntimeError("interleave repair did not converge")
            term_comb = comb(g["term"])
            perm = np.arange(n, dtype=np.int64)
        self.g = g
        blk = comb(g["block_id"]).to_numpy()[perm]
        nd = comb(g["n_docs"]).to_numpy()[perm]
        cf = comb(g["cf"]).to_numpy()[perm]

        def cs(a: np.ndarray) -> np.ndarray:
            return np.concatenate([[0], np.cumsum(a)])

        # fine-block runs (consecutive rows, same (term, block_id))
        if n:
            fb_change = np.concatenate([[True], (codes[1:] != codes[:-1])
                                        | (blk[1:] != blk[:-1])])
        else:
            fb_change = np.zeros(0, bool)
        fb_row_start = np.flatnonzero(fb_change)
        fb_row_end = np.append(fb_row_start[1:], n)
        cs_nd = cs(nd)
        fb_n = cs_nd[fb_row_end] - cs_nd[fb_row_start]
        fb_code = codes[fb_row_start]
        # canonical per-term posting cumsum over fine blocks
        t_change = (np.concatenate([[True], fb_code[1:] != fb_code[:-1]])
                    if fb_code.size else np.zeros(0, bool))
        tstart_idx = np.flatnonzero(t_change)
        cum = np.cumsum(fb_n)
        base_vals = np.where(tstart_idx > 0, cum[np.maximum(tstart_idx - 1, 0)], 0)
        fb_per_term = np.diff(np.append(tstart_idx, fb_code.size))
        base = np.repeat(base_vals, fb_per_term)
        cum_in_term = cum - base
        if block_size:
            fb_grp = (cum_in_term - 1) // block_size
            grp_change_fb = t_change | np.concatenate(
                [[True], fb_grp[1:] != fb_grp[:-1]]) if fb_code.size else t_change
        else:
            grp_change_fb = np.ones(fb_code.size, bool)
        grp_change_row = np.zeros(n, bool)
        grp_change_row[fb_row_start[grp_change_fb]] = True
        grp_start = np.flatnonzero(grp_change_row)
        grp_end = np.append(grp_start[1:], n)
        self.grp_start, self.grp_end = grp_start, grp_end
        self.n_groups = grp_start.size
        # per-group metadata (order-independent aggregates)
        self.g_first = first[grp_start]
        self.g_last = last[np.maximum(grp_end - 1, 0)] if n else np.zeros(0, np.int64)
        self.g_n = cs_nd[grp_end] - cs_nd[grp_start]
        cs_cf = cs(cf)
        self.g_cf = cs_cf[grp_end] - cs_cf[grp_start]
        if n:
            self.g_mtf = np.maximum.reduceat(
                comb(g["max_tf"]).to_numpy()[perm], grp_start)
            self.g_mdl = np.minimum.reduceat(
                comb(g["min_dl"]).to_numpy()[perm], grp_start)
        else:
            self.g_mtf = np.zeros(0, np.int32)
            self.g_mdl = np.zeros(0, np.int32)
        self.g_blk = blk[grp_start]
        # term runs over groups
        gcodes = codes[grp_start]
        self.tg_start = np.flatnonzero(np.concatenate([[True], gcodes[1:] != gcodes[:-1]])
                                       ) if gcodes.size else np.zeros(0, np.int64)
        self.tg_end = np.append(self.tg_start[1:], self.n_groups)
        self.n_terms = self.tg_start.size
        self.run_terms = term_comb.take(
            pa.array(perm[grp_start[self.tg_start]], pa.int64())).to_pylist()

        # --- assemble the output streams (chunk-direct ragged gathers) ----
        _t1 = time.perf_counter()
        self.t_sort = _t1 - _t0
        # One Arrow ``take`` per stream: a single C++ memcpy pass that lands
        # the blob bytes contiguously in SORTED row order.  For tf/pos the
        # taken data buffer IS the output stream verbatim; only the doc
        # stream needs further surgery (strip each internal row's absolute
        # VB head, splice in a bridge delta), done with boolean-mask
        # compress/scatter passes.  The previous per-byte int64 fancy-index
        # gather moved ~18 bytes of DRAM traffic per payload byte and was
        # 85% of the merge tail (measured: 50 of 57 actor-seconds at 200k
        # docs / 32 shards).
        perm_arr = pa.array(perm, pa.int64())

        def taken(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
            arr = col.take(perm_arr)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            bufs = arr.buffers()  # [validity, offsets, data]
            od = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            offs_all = (np.frombuffer(bufs[1], od) if bufs[1] is not None
                        else np.zeros(1, od))
            offs = offs_all[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
            data = np.frombuffer(bufs[2] or b"", np.uint8)
            if offs.size and offs[0]:
                # rebase so offs index ``data`` from 0 (sliced parent array)
                data = data[offs[0]:]
                offs = offs - offs[0]
            return arr, data, offs

        _doc_arr, doc_np, doc_offs = taken(g["doc_blob"])
        _tf_arr, tf_np, tf_offs = taken(g["tf_blob"])
        _pos_arr, pos_np, pos_offs = taken(g["pos_blob"])
        row_len = np.diff(doc_offs)        # sorted row order
        internal = np.ones(n, bool)
        internal[grp_start] = False
        iidx = np.flatnonzero(internal)
        heads = np.zeros(n, np.int64)
        bridge_len_row = np.zeros(n, np.int64)
        bridge_start_row = np.zeros(n, np.int64)
        if iidx.size:
            heads[iidx] = _vb_head_lens(doc_np, doc_offs[iidx])
            bridge_vals = (first[iidx] - last[iidx - 1]).astype(np.uint64)
            bout, bends = codec._vb_encode_arr(bridge_vals)
            bstart = np.zeros(iidx.size, np.int64)
            bstart[1:] = bends[:-1] + 1
            bridge_len_row[iidx] = bends - bstart + 1
            bridge_start_row[iidx] = bstart
        else:
            bout = np.zeros(0, np.uint8)
        bodyB_len = row_len - heads
        out_len = bridge_len_row + bodyB_len
        out_start = np.cumsum(out_len) - out_len
        total = int(out_len.sum())
        out = np.empty(total, np.uint8)
        # body bytes: drop internal heads from the taken buffer (boolean
        # compress), then scatter into the non-bridge output positions
        m = int(doc_offs[-1]) if doc_offs.size else 0
        keep = np.ones(m, bool)
        if iidx.size:
            hl = heads[iidx]
            hsum = int(hl.sum())
            if hsum:
                hbase = np.cumsum(hl) - hl
                hidx = (np.repeat(doc_offs[iidx], hl)
                        + np.arange(hsum, dtype=np.int64) - np.repeat(hbase, hl))
                keep[hidx] = False
        if bout.size:
            bmask = np.zeros(total, bool)
            bsum = int(bridge_len_row.sum())
            bbase = np.cumsum(bridge_len_row) - bridge_len_row
            boff = np.arange(bsum, dtype=np.int64) - np.repeat(bbase[iidx],
                                                               bridge_len_row[iidx])
            bpos = np.repeat(out_start[iidx], bridge_len_row[iidx]) + boff
            bmask[bpos] = True
            out[bpos] = bout[np.repeat(bridge_start_row[iidx],
                                       bridge_len_row[iidx]) + boff]
            out[~bmask] = doc_np[:m][keep]
        else:
            out[:] = doc_np[:m][keep]
        self.doc_stream = out
        cs_out = cs(out_len)
        self.g_doc_start = cs_out[grp_start]
        self.g_doc_len = cs_out[grp_end] - cs_out[grp_start]
        # tf/pos: the taken buffers are the streams; keep the arrays alive
        # via the memoryview -> ndarray -> Arrow buffer chain
        self._tf_mv = memoryview(tf_np[: int(tf_offs[-1]) if tf_offs.size else 0])
        self.g_tf_start = tf_offs[grp_start]
        self.g_tf_len = tf_offs[grp_end] - tf_offs[grp_start]
        self._pos_mv = memoryview(pos_np[: int(pos_offs[-1]) if pos_offs.size else 0])
        self.g_pos_start = pos_offs[grp_start]
        self.g_pos_len = pos_offs[grp_end] - pos_offs[grp_start]
        self.t_gather = time.perf_counter() - _t1



class WriteShard:
    """Phase-2 reducer: receives every fine-block row of one shard,
    coalesces fine blocks into canonical dict blocks (bridge splice — no
    posting decode anywhere), and writes the shard blob + term dictionary
    atomically.  The blob file is the mmap target at query time — the
    engine's replacement for the reference's JSON-lines index +
    word2byte.json seek/read pair
    (/root/reference/indexing/index_hasher/index_hasher.py:44-65).

    Block metadata (first/last/n/max_tf/min_dl + per-stream byte offsets)
    falls out of the fine rows' aggregates: min_dl was computed at tokenize
    time where doc lengths were local, so this stage needs NO doc-length
    broadcast and touches each output byte exactly once (one vectorized
    gather + sequential file write)."""

    def __init__(self, shard_dir: str, fingerprint: str, block_size: int):
        self.shard_dir = shard_dir
        self.fingerprint = fingerprint
        self.block_size = block_size
        # phase accounting for the merge tail (the one stage that cannot
        # overlap ingest): view = lexsort + ragged gathers (DRAM-bound),
        # write = blob O_DIRECT, dict = term-dictionary parquet.
        # *_st_s / *_mf siblings split out kernel time and minor faults
        # per phase (getrusage deltas) — the host charges ~0.1 ms per
        # first-touch page, so kernel time is where scale bugs surface.
        self.timings = {"view_s": 0.0, "view_sort_s": 0.0,
                        "view_gather_s": 0.0, "meta_s": 0.0,
                        "write_s": 0.0, "dict_s": 0.0,
                        "view_st_s": 0.0, "write_st_s": 0.0,
                        "dict_st_s": 0.0, "view_mf": 0.0,
                        "write_mf": 0.0, "dict_mf": 0.0}

    def __call__(self, group: pa.Table) -> pa.Table:
        empty = pa.table({"shard": pa.array([], pa.int64()),
                          "n_terms": pa.array([], pa.int64()),
                          "bytes": pa.array([], pa.int64()),
                          "skipped": pa.array([], pa.bool_())})
        if group.num_rows == 0:  # Ray may hand the UDF an empty block
            return empty
        shard_id = int(group["shard"][0].as_py())
        if BuildCheckpoint.shard_is_done(self.shard_dir, shard_id, self.fingerprint):
            m = json.load(open(BuildCheckpoint.shard_manifest_path(self.shard_dir, shard_id)))
            return pa.table({"shard": [shard_id], "n_terms": [m["n_terms"]],
                             "bytes": [m["bytes"]], "skipped": [True]})
        import resource as _res

        def _ru() -> tuple[float, float]:
            r = _res.getrusage(_res.RUSAGE_SELF)
            return r.ru_stime, r.ru_minflt

        _r0 = _ru()
        _t0 = time.perf_counter()
        v = _FineView(group, block_size=self.block_size)
        _t1 = time.perf_counter()
        _r1 = _ru()
        self.timings["view_s"] += _t1 - _t0
        self.timings["view_sort_s"] += v.t_sort
        self.timings["view_gather_s"] += v.t_gather
        self.timings["view_st_s"] += _r1[0] - _r0[0]
        self.timings["view_mf"] += _r1[1] - _r0[1]
        tg_s, tg_e = v.tg_start, v.tg_end
        nt = v.n_terms

        def cs(a: np.ndarray) -> np.ndarray:
            return np.concatenate([[0], np.cumsum(a)])

        cgn = cs(v.g_n)
        df = cgn[tg_e] - cgn[tg_s]
        cgc = cs(v.g_cf)
        cf = cgc[tg_e] - cgc[tg_s]
        mtf = (np.maximum.reduceat(v.g_mtf, tg_s) if nt
               else np.zeros(0, np.int32))
        cdl = cs(v.g_doc_len)
        dlen = cdl[tg_e] - cdl[tg_s]
        ctl = cs(v.g_tf_len)
        tlen = ctl[tg_e] - ctl[tg_s]
        cpl = cs(v.g_pos_len)
        plen = cpl[tg_e] - cpl[tg_s]
        rec = dlen + tlen + plen
        rec_start = np.concatenate([[0], np.cumsum(rec)[:-1]])
        # per-block byte offsets RELATIVE to the term's stream starts
        grp_per_term = tg_e - tg_s
        boff_doc = v.g_doc_start - np.repeat(v.g_doc_start[tg_s], grp_per_term)
        boff_tf = v.g_tf_start - np.repeat(v.g_tf_start[tg_s], grp_per_term)
        boff_pos = v.g_pos_start - np.repeat(v.g_pos_start[tg_s], grp_per_term)
        loff = pa.array(np.append(tg_s, v.n_groups).astype(np.int32))

        def lst(vals: np.ndarray, typ) -> pa.ListArray:
            return pa.ListArray.from_arrays(loff, pa.array(vals.astype(typ.to_pandas_dtype()), typ))

        dict_table = pa.table(
            {
                "term": pa.array(v.run_terms, pa.string()),
                "df": pa.array(df.astype(np.int64)),
                "cf": pa.array(cf.astype(np.int64)),
                "max_tf": pa.array(mtf.astype(np.int32)),
                "doc_off": pa.array(rec_start),
                "doc_len": pa.array(dlen),
                "tf_off": pa.array(rec_start + dlen),
                "tf_len": pa.array(tlen),
                "pos_off": pa.array(rec_start + dlen + tlen),
                "pos_len": pa.array(plen),
                "block_first": lst(v.g_first, pa.int64()),
                "block_last": lst(v.g_last, pa.int64()),
                "block_n": lst(v.g_n, pa.int32()),
                "block_max_tf": lst(v.g_mtf, pa.int32()),
                "block_min_dl": lst(v.g_mdl, pa.int32()),
                "block_doc_boff": lst(boff_doc, pa.int64()),
                "block_tf_boff": lst(boff_tf, pa.int64()),
                "block_pos_boff": lst(boff_pos, pa.int64()),
            },
            schema=schema.TERM_DICT,
        )
        _t2 = time.perf_counter()
        self.timings["meta_s"] += _t2 - _t1
        # stream the blob file record by record — per-term memoryview slices
        # of the assembled doc stream and the (contiguous) tf/pos buffers
        doc_view = memoryview(v.doc_stream)
        tdoc_start = v.g_doc_start[tg_s]
        ttf_start = v.g_tf_start[tg_s]
        tpos_start = v.g_pos_start[tg_s]
        bin_path = os.path.join(self.shard_dir, f"shard_{shard_id:05d}.bin")
        tmp_path = bin_path + f".tmp-{os.getpid()}"
        class _RecordStream:
            # re-iterable (not a one-shot generator) so direct_write's
            # buffered fallback can restart after a mid-stream O_DIRECT
            # failure without materializing 3*n_terms memoryviews
            def __iter__(self):
                for t in range(nt):
                    yield doc_view[tdoc_start[t]:tdoc_start[t] + dlen[t]]
                    yield v._tf_mv[ttf_start[t]:ttf_start[t] + tlen[t]]
                    yield v._pos_mv[tpos_start[t]:tpos_start[t] + plen[t]]

        _r2 = _ru()
        direct_write(tmp_path, _RecordStream())
        os.replace(tmp_path, bin_path)
        _t3 = time.perf_counter()
        _r3 = _ru()
        self.timings["write_s"] += _t3 - _t2
        self.timings["write_st_s"] += _r3[0] - _r2[0]
        self.timings["write_mf"] += _r3[1] - _r2[1]
        total_bytes = int(rec.sum())
        tmp = os.path.join(self.shard_dir, f"shard_{shard_id:05d}.dict.parquet.tmp-{os.getpid()}")
        direct_write_table(tmp, dict_table, pq.write_table)
        os.replace(tmp, os.path.join(self.shard_dir, f"shard_{shard_id:05d}.dict.parquet"))
        _r4 = _ru()
        self.timings["dict_s"] += time.perf_counter() - _t3
        self.timings["dict_st_s"] += _r4[0] - _r3[0]
        self.timings["dict_mf"] += _r4[1] - _r3[1]
        BuildCheckpoint.write_shard_manifest(
            self.shard_dir, shard_id, self.fingerprint,
            {"n_terms": int(nt), "bytes": total_bytes},
        )
        return pa.table({"shard": [shard_id], "n_terms": [int(nt)],
                         "bytes": [total_bytes], "skipped": [False]})


def _write_empty_shard(shard_dir: str, sid: int, fingerprint: str) -> None:
    """A shard with no terms still needs (empty) files for the searcher."""
    atomic_write_bytes(os.path.join(shard_dir, f"shard_{sid:05d}.bin"), b"")
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in schema.TERM_DICT}, schema=schema.TERM_DICT
    )
    tmp = os.path.join(shard_dir, f"shard_{sid:05d}.dict.parquet.tmp-{os.getpid()}")
    pq.write_table(empty, tmp)
    os.replace(tmp, os.path.join(shard_dir, f"shard_{sid:05d}.dict.parquet"))
    BuildCheckpoint.write_shard_manifest(shard_dir, sid, fingerprint,
                                         {"n_terms": 0, "bytes": 0})


def _touch_batch_pages(batch: pa.RecordBatch) -> None:
    """Fault in every page backing ``batch``'s buffers (one strided read
    per 4 KiB page).  Spool batches are zero-copy views into an mmap'd IPC
    file; without an explicit touch their data pages would only fault at
    splice time — i.e. on the build's critical tail.  Touching them as the
    spool lands moves the disk read + first-touch page tax into the ingest
    window, where it overlaps tokenize compute."""
    for arr in batch.columns:
        for buf in arr.buffers():
            if buf is not None and buf.size:
                np.frombuffer(buf, np.uint8)[::4096].sum()


@ray.remote(num_cpus=0)
class _ShardMerger:
    """Owns a set of shard ids end to end: collects their record batches
    from spool files as the files land (``add_spools``), then splices and
    writes each owned shard (``finish``).

    Two scale properties vs the old one-task-per-shard merge:

    - File opens are O(actors × spool_files), not O(shards × spool_files):
      each actor opens a spool once and extracts ALL its owned shards'
      batches through the IPC footer (with auto-sharding at ~100k
      docs/shard the old shape grew quadratically with corpus size).
    - The gather overlaps ingest: fed incrementally from completed
      tokenize tasks, the actor pages in its byte ranges while other CPUs
      are still tokenizing, so the post-barrier merge stage is left with
      only the (DRAM-bound) splice + write.

    ``num_cpus=0``: the actor is reactive and mostly idle during ingest —
    reserving a CPU per actor would starve the tokenize tasks at small
    cluster sizes (8 actors would consume ALL slots of an 8-CPU node).
    Splice concurrency is still bounded by the ACTOR COUNT
    (= max_concurrent_merges, the per-node DRAM-bandwidth annotation)."""

    def __init__(self, shard_dir: str, fingerprint: str, block_size: int,
                 shard_ids: list[int]):
        self.shard_dir = shard_dir
        self.fingerprint = fingerprint
        self.block_size = block_size
        self.shard_ids = list(shard_ids)
        # finish() may launch before the shards stage formally begins
        # (overlapped with the stats stage) — the dir must exist by then
        os.makedirs(shard_dir, exist_ok=True)
        self.parts: dict[int, list[pa.RecordBatch]] = {
            int(s): [] for s in shard_ids}
        # Route Arrow allocations (the splice's ``take`` outputs) through
        # malloc so they reuse the prefaulted heap below; Arrow's default
        # pool returns pages to the OS, which would refault per shard.
        pa.set_memory_pool(pa.system_memory_pool())
        keep_heap_resident()
        # A BACKGROUND thread touches incoming spool pages (GIL-releasing
        # libc memcmp) so the mmap'd file reads + first-touch page tax land
        # in the ingest window instead of on the splice's critical tail.
        # The work is SPECULATIVE: finish() sets _stop so a toucher that
        # didn't fit the ingest window (fast 32-CPU legs) abandons instead
        # of serializing the merge tail — the splice then faults the
        # untouched remainder lazily (zero-sum, just later).  NOTE: an
        # earlier variant also pre-memset'ed a heap arena sized to the
        # splice's allocations; measured on the 200k corpus it cost ~180
        # asymmetric cpu-seconds at an 8-CPU leg (the memset completes only
        # where ingest is slow) for ~2 s of 32-leg tail — removed.
        # keep_heap_resident() still makes the FIRST shard's splice pages
        # serve every later shard on the actor.
        import queue as _q
        import threading as _th
        self._touchq: "_q.Queue" = _q.Queue()
        self._stop = False
        self._toucher = _th.Thread(target=self._touch_loop, daemon=True)
        self._toucher.start()

    def _touch_loop(self) -> None:
        try:
            import ctypes
            libc = ctypes.CDLL(None, use_errno=True)
            libc.memcmp.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_size_t]
            libc.memcmp.restype = ctypes.c_int

            def fault_batch(b: pa.RecordBatch) -> None:
                for arr in b.columns:
                    for buf in arr.buffers():
                        if buf is not None and buf.size:
                            libc.memcmp(buf.address, buf.address, buf.size)
        except Exception:  # pragma: no cover - non-glibc fallback
            fault_batch = _touch_batch_pages
        while True:
            item = self._touchq.get()
            try:
                if item is not None and not self._stop:
                    fault_batch(item)
            except Exception:
                pass
            finally:
                self._touchq.task_done()
            if item is None:
                return

    def add_spools(self, files: list[str]) -> None:
        for f in files:
            # Queue ASYNC readahead for the whole spool before mapping it.
            # Spools are written O_DIRECT (no page cache), so without this
            # every later access — the toucher's memcmp AND the splice's
            # take() — faults 4 KiB at a time through a synchronous disk
            # read; measured on this host that path moves ~40 MB/s while
            # fadvise(WILLNEED) + warm faults move the same bytes 26x
            # faster (0.39 s vs 10.0 s for a cold 400 MB file).  This was
            # the dominant superlinearity in the 800k-doc weak-scaling leg
            # (splice_view kernel time 2.3 s -> 157 s from 200k to 800k).
            if os.environ.get("RAYINDEX_SPOOL_FADVISE", "1") != "0":
                try:
                    _fd = os.open(f, os.O_RDONLY)
                    try:
                        os.posix_fadvise(_fd, 0, 0, os.POSIX_FADV_WILLNEED)
                    finally:
                        os.close(_fd)
                except OSError:
                    pass
            # no context manager: the returned batches are zero-copy views
            # into the mapping, which must outlive this call (the reader /
            # batches hold the reference; GC unmaps when dropped)
            reader = pa.ipc.open_file(pa.memory_map(f))
            raw = (reader.schema.metadata or {}).get(b"rayindex_shards", b"")
            if not raw:
                continue
            for i, s in enumerate(raw.decode().split(",")):
                sid = int(s)
                if sid in self.parts:
                    b = reader.get_batch(i)
                    self.parts[sid].append(b)
                    self._touchq.put(b)

    def finish(self) -> tuple[list[dict], dict]:
        # Abandon any spool-touch work still in flight (it stopped being
        # useful the moment splicing can start).  The join bounds at one
        # in-flight batch touch, not the whole backlog.
        self._stop = True
        if self._toucher.is_alive():
            self._touchq.put(None)
            self._toucher.join(timeout=300.0)
        t_start = time.perf_counter()
        out = []
        writer = WriteShard(self.shard_dir, self.fingerprint, self.block_size)
        tbl_s = 0.0
        for sid in self.shard_ids:
            parts = self.parts.pop(sid, [])
            if BuildCheckpoint.shard_is_done(self.shard_dir, sid,
                                             self.fingerprint):
                m = json.load(open(BuildCheckpoint.shard_manifest_path(
                    self.shard_dir, sid)))
                out.append({"shard": sid, "n_terms": m["n_terms"],
                            "bytes": m["bytes"]})
                continue
            if not parts:
                _write_empty_shard(self.shard_dir, sid, self.fingerprint)
                out.append({"shard": sid, "n_terms": 0, "bytes": 0})
                continue
            t0 = time.perf_counter()
            t = pa.Table.from_batches(parts, schema=schema.POSTING_CHUNKS)
            tbl_s += time.perf_counter() - t0
            r = writer(t)  # chunked ok — blobs gathered per chunk
            out.append({"shard": sid,
                        "n_terms": int(r["n_terms"][0].as_py()),
                        "bytes": int(r["bytes"][0].as_py())})
        timings = {"tbl_s": round(tbl_s, 3),
                   "wall_s": round(time.perf_counter() - t_start, 3),
                   **{k: round(s, 3) for k, s in writer.timings.items()}}
        return out, timings


class _MergePool:
    """Driver-side handle on the shard-merger actors.

    The wide exchange already happened THROUGH THE FILESYSTEM: the tokenize
    stage writes posting chunks as shard-run-partitioned IPC spools, so the
    merge is embarrassingly parallel over shard ids.  No sort/groupby
    shuffle moves posting bytes through the object store (measured on the
    bench host: the plasma exchange cost 60–94 s of kernel time at 32
    workers for a 50k-doc corpus).  On a multi-node cluster the same layout
    runs against shared storage and stays resumable per shard (each actor
    skips completed shards via their manifests).

    Skew: shard count auto-scales with corpus size (~100k docs/shard), a
    hot TERM's bytes stay inside one shard but are only ever byte-spliced,
    never decoded (the doc-range fine-block layout makes every merge a
    metadata aggregate + splice); if a single term ever dwarfs its shard,
    the doc-range keying supports splitting the shard into range sub-files
    without changing the dictionary format."""

    def __init__(self, shard_dir: str, fingerprint: str, cfg: BuildConfig):
        # cap splice concurrency by the CLUSTER's CPU count too: the
        # num_cpus=0 merger actors bypass Ray's slot accounting, so
        # without this a 2-slot cluster would still run 8 concurrent
        # splicers — 4 cores of merge work on a "2-CPU cluster", which
        # breaks both the DRAM-cap rationale (8 per NODE) and any
        # fixed-cluster-size scaling measurement
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n = max(1, min(cfg.num_shards, cfg.max_concurrent_merges, ncpu))
        self.actors = [
            _ShardMerger.remote(shard_dir, fingerprint, cfg.block_size,
                                list(range(a, cfg.num_shards, n)))
            for a in range(n)
        ]
        self.num_shards = cfg.num_shards
        self._pending: list = []
        self._finish_refs: list | None = None

    def feed(self, files: list[str]) -> None:
        if files:
            self._pending += [a.add_spools.remote(list(files))
                              for a in self.actors]

    def begin_finish(self) -> None:
        """Launch the splices WITHOUT waiting: actor method ordering
        guarantees every fed add_spools runs first, so the caller can
        overlap the (driver-side) stats stage with the merge work."""
        if self._finish_refs is None:
            self._finish_refs = [a.finish.remote() for a in self.actors]

    def finish(self) -> dict[str, Any]:
        self.begin_finish()
        t0 = time.perf_counter()
        ray.get(self._pending)
        feed_drain_s = time.perf_counter() - t0
        self._pending = []
        parts = ray.get(self._finish_refs)
        stats = [s for part, _ in parts for s in part]
        timings = [t for _, t in parts]
        self.shutdown()
        return {
            "n_terms": int(sum(s["n_terms"] for s in stats)),
            "index_bytes": int(sum(s["bytes"] for s in stats)),
            "shards": int(self.num_shards),
            # merge-tail phase profile: sums are total actor-seconds across
            # the pool; splice_crit_s is the slowest actor (critical path)
            "splice_crit_s": round(max((t["wall_s"] for t in timings),
                                       default=0.0), 3),
            "splice_feed_drain_s": round(feed_drain_s, 3),
            **{f"splice_{k}": round(sum(t.get(k, 0.0) for t in timings), 3)
               for k in ("tbl_s", "view_s", "view_sort_s", "view_gather_s",
                         "meta_s", "write_s", "dict_s",
                         "view_st_s", "write_st_s", "dict_st_s",
                         "view_mf", "write_mf", "dict_mf")},
        }

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
        self._pending = []


def _stage_shards(chunks_path: str, shard_dir: str, cfg: BuildConfig,
                  fingerprint: str, pool: _MergePool | None = None) -> dict[str, Any]:
    """Merge + write every shard (see _MergePool).  ``pool`` is the
    already-fed merger pool from the fused build path (spool gather
    overlapped with ingest); without one — resume paths, exchange-path
    builds — a fresh pool is fed from a directory scan here."""
    if pool is None:
        files = _resume_spool_files(chunks_path)
        pool = _MergePool(shard_dir, fingerprint, cfg)
        pool.feed(files)
    return pool.finish()


# ---------------------------------------------------------------------------
# stage 4: doc_stats + collection_stats
# ---------------------------------------------------------------------------


def _part_stats(paths: list[str]) -> tuple[int, int]:
    """(n_docs, total_tokens) of doc_stats parts from their parquet footers
    alone — the tokenize stage stamps each part's token sum into the file's
    key-value metadata, so this never touches a data page."""
    n = tok = 0
    for p in paths:
        md = pq.read_metadata(p)
        n += md.num_rows
        kv = md.metadata or {}
        if b"rayindex_total_tokens" in kv:
            tok += int(kv[b"rayindex_total_tokens"])
        else:  # part from an older build: fall back to a column read
            t = pq.read_table(p, columns=["n_tokens"], use_threads=False)
            tok += pc.sum(t["n_tokens"]).as_py() or 0
    return n, tok


def _stage_stats(out: str) -> dict[str, Any]:
    """Aggregate N / l_tot from the doc_stats parts the tokenize stage
    side-wrote (reference computes them at app startup,
    /root/reference/search/retrieval/retrieval_helpers/helpers.py:229-230).
    Footer-only: each part carries its own (num_rows, token sum), so the
    aggregate reads metadata, not data — driver-side below a threshold,
    a small Ray map over file paths beyond it (at 10^12 docs the part
    list itself is large)."""
    doc_stats_dir = os.path.join(out, "doc_stats")
    os.makedirs(doc_stats_dir, exist_ok=True)
    files = [os.path.join(doc_stats_dir, f)
             for f in sorted(os.listdir(doc_stats_dir))
             if f.endswith(".parquet")]
    if not files:
        return {"n_docs": 0, "total_tokens": 0}
    if len(files) <= 1024:
        n, tok = _part_stats(files)
        return {"n_docs": n, "total_tokens": tok}
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    agg = ray.data.from_items(
        [{"path": f} for f in files],
        override_num_blocks=min(len(files), ncpu * 2),
    ).map_batches(
        lambda t: pa.table(dict(zip(
            ("n", "tok"),
            (pa.array([v], pa.int64())
             for v in _part_stats(t["path"].to_pylist()))))),
        batch_format="pyarrow",
    ).to_pandas()
    return {"n_docs": int(agg["n"].sum()), "total_tokens": int(agg["tok"].sum())}


def _write_doc_meta_bins(stats_dir: str) -> dict[str, Any]:
    """Dense doc-indexed binary side tables: ``doc_len.bin`` (int64) and
    ``lang_codes.bin`` (int32, code+1 so a hole is 0 and the file stays
    SPARSE — no full-width fill pass) plus ``lang_vocab.json``.

    Readers mmap these instead of materializing an O(n_docs) doc-length
    array per process: the OS page cache keeps ONE copy per node and only
    the touched ranges ever load — at 10^12 docs a dense in-heap table is
    impossible, an mmap of the same table is just an address range.
    Written fragment-by-fragment (doc_stats partitions are doc-ordered),
    so builder memory stays bounded by one partition."""
    import glob as _g
    import json
    import re

    parts = sorted(_g.glob(os.path.join(stats_dir, "doc_stats", "*.parquet")))
    max_doc = -1
    for p in parts:
        # parts are doc-ordered and named ds-{first:012d}-{last:012d}; the
        # max doc comes from the names alone (no data pass).  Fall back to
        # reading the column for foreign part names.
        m = re.match(r"ds-\d{12}-(\d{12})\.parquet$", os.path.basename(p))
        if m:
            max_doc = max(max_doc, int(m.group(1)))
            continue
        t = pq.read_table(p, columns=["doc_id"])
        if t.num_rows:
            max_doc = max(max_doc, int(t["doc_id"][t.num_rows - 1].as_py()))
    size = max_doc + 1 if max_doc >= 0 else 1
    dl = np.memmap(os.path.join(stats_dir, "doc_len.bin"), np.int64,
                   mode="w+", shape=(size,))
    lc = np.memmap(os.path.join(stats_dir, "lang_codes.bin"), np.int32,
                   mode="w+", shape=(size,))
    vocab: dict[str, int] = {}
    for p in parts:
        t = pq.read_table(p, columns=["doc_id", "n_tokens", "lang"])
        if t.num_rows == 0:
            continue
        ids = t["doc_id"].to_numpy()
        dl[ids] = t["n_tokens"].to_numpy()
        enc = t["lang"].combine_chunks().dictionary_encode()
        local = np.asarray(
            [vocab.setdefault(v, len(vocab)) for v in enc.dictionary.to_pylist()],
            np.int32)
        lc[ids] = local[enc.indices.to_numpy(zero_copy_only=False)] + 1
    dl.flush()
    lc.flush()
    with open(os.path.join(stats_dir, "lang_vocab.json"), "w") as f:
        json.dump(sorted(vocab, key=vocab.get), f)
    return {"doc_meta_rows": size}


def _stage_finalize(stats_dir: str, out: str, n_docs: int, total_tokens: int,
                    n_terms: int,
                    bins_meta: dict[str, Any] | None = None,
                    doc_space: int | None = None) -> dict[str, Any]:
    cs = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "total_tokens": pa.array([total_tokens], pa.int64()),
            "avg_dl": pa.array([total_tokens / n_docs if n_docs else 0.0], pa.float64()),
            "n_terms": pa.array([n_terms], pa.int64()),
        },
        schema=schema.COLLECTION_STATS,
    )
    if doc_space is not None:
        # doc-space size = count of ASSIGNED doc ids (1..doc_space), holes
        # from the oversize filter included — what an appended increment's
        # ids must be rebased by (merge.py).  Footer metadata, not a column:
        # the collection_stats row stays oracle-comparable.
        cs = cs.replace_schema_metadata(
            {b"rayindex_doc_space": str(int(doc_space)).encode()})
    pq.write_table(cs, os.path.join(stats_dir, "collection_stats.parquet"))
    # bins_meta: already written concurrently with the shard merge
    meta = bins_meta if bins_meta is not None else _write_doc_meta_bins(stats_dir)
    return {"n_terms": n_terms, **meta}


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@dataclass
class BuildResult:
    out_dir: str
    fingerprint: str
    stages: dict[str, Any] = field(default_factory=dict)

    @property
    def doc_store(self) -> str:
        return os.path.join(self.out_dir, "doc_store")

    @property
    def shard_dir(self) -> str:
        return os.path.join(self.out_dir, "shards")


def _input_token(source) -> str:
    if isinstance(source, str):
        files = sorted(glob.glob(os.path.join(source, "*.parquet"))) or [source]
        sizes = [str(os.path.getsize(f)) for f in files if os.path.exists(f)]
        return "|".join([*files, *sizes])
    return f"dataset:{id(source)}"


def build_index(
    source: str | ray.data.Dataset,
    out_dir: str,
    cfg: BuildConfig | None = None,
    *,
    input_token: str | None = None,
) -> BuildResult:
    """Build a full positional BM25 index under ``out_dir``.

    ``source`` is a Parquet path/dir or a Dataset with the documents schema
    (repo, path, commit, lang, content).  Resumable: stages whose checkpoint
    fingerprint matches are skipped; within the shard stage, completed shards
    are skipped individually.

    Pass ``input_token`` (any stable string identifying the input, e.g.
    "corpus:small:seed7") when ``source`` is a Dataset — without it a resumed
    build cannot prove lineage and will rebuild from scratch.
    """
    cfg = cfg or BuildConfig()
    token = input_token or _input_token(source)
    fp = fingerprint_of(cfg.fingerprint(), token)
    ckpt = BuildCheckpoint(out_dir, fp)
    result = BuildResult(out_dir=out_dir, fingerprint=fp)

    doc_store = os.path.join(out_dir, "doc_store")
    chunks = os.path.join(out_dir, "chunks")
    shard_dir = os.path.join(out_dir, "shards")

    def ingest(d):
        if isinstance(source, str):
            # file sources get the key-only ingest: doc ids from a sort of
            # (repo, path, sha) keys; content never enters a shuffle
            return _stage_ingest_files(source, d, cfg)
        return _stage_ingest(source, d, cfg)

    stats_dir = os.path.join(out_dir, "stats")

    doc_stats_dir = os.path.join(stats_dir, "doc_stats")
    resolved: dict[str, Any] = {}
    if (isinstance(source, str) and not ckpt.is_done("doc_store")
            and not ckpt.is_done("chunks")):
        # fused fresh build: ingest exchange streams straight into tokenize
        # (no doc_store read-back).  The doc_store marker is written first,
        # so a crash between the two leaves a resumable doc_store and the
        # unfused chunks path below picks it up.

        def fused(d):
            m, rcfg, pool = _stage_ingest_tokenize(source, doc_store, d,
                                                   doc_stats_dir, cfg,
                                                   shard_dir=shard_dir,
                                                   fingerprint=fp)
            resolved["cfg"] = rcfg
            resolved["pool"] = pool
            ckpt.mark_done("doc_store", m)
            return m

        r2 = ckpt.run_stage("chunks", fused)
        cfg = resolved.get("cfg") or _resolve_auto_shards(
            cfg, r2.metrics.get("n_docs", 0))
        r1 = StageResult("doc_store", skipped=r2.skipped, wall_s=0.0,
                         metrics=dict(r2.metrics))
    else:
        r1 = ckpt.run_stage("doc_store", ingest)
        cfg = _resolve_auto_shards(cfg, r1.metrics.get("n_docs", 0))
        r2 = ckpt.run_stage(
            "chunks",
            lambda d: _stage_chunks(doc_store, d, cfg, doc_stats_dir))
    # start the shard splices NOW — they depend only on the fed spools, so
    # they overlap the (driver-side, footer-only) stats stage and the
    # doc-meta-bin thread below
    if resolved.get("pool") is not None and not ckpt.is_done("shards"):
        resolved["pool"].begin_finish()
    # clear=False: the doc_stats parts under stats/ were side-written by the
    # tokenize stage (which wipes them itself on re-run); this stage only
    # aggregates N / l_tot from them
    r3 = ckpt.run_stage("stats", lambda d: _stage_stats(d), clear=False)
    # The doc-meta bins depend only on doc_stats (complete after the chunks
    # stage), not on the shard merge — overlap their IO with the DRAM-bound
    # merges in a driver thread (parquet read + memmap store release the
    # GIL).  On crash the finalize stage just redoes them (idempotent).
    bins_box: dict[str, Any] = {}
    bins_thread = None
    if not ckpt.is_done("finalize"):
        import threading

        def _bins():
            try:
                bins_box["meta"] = _write_doc_meta_bins(stats_dir)
            except BaseException as exc:  # surfaced at finalize join
                bins_box["err"] = exc

        bins_thread = threading.Thread(target=_bins, daemon=True)
        bins_thread.start()
    # clear=False: completed shards are skipped via their own manifests
    pool = resolved.get("pool")
    r4 = ckpt.run_stage(
        "shards",
        lambda d: _stage_shards(chunks, d, cfg, fp, pool=pool),
        clear=False)
    if r4.skipped and pool is not None:
        pool.shutdown()  # actors were fed but the stage was already done

    def finalize(d):
        if bins_thread is not None:
            bins_thread.join()
        if "err" in bins_box:
            raise bins_box["err"]
        return _stage_finalize(
            stats_dir, d,
            r3.metrics.get("n_docs", 0), r3.metrics.get("total_tokens", 0),
            r4.metrics.get("n_terms", 0),
            bins_meta=bins_box.get("meta"),
            # ingest-stage count = rows BEFORE the oversize filter (ids are
            # assigned over all rows), i.e. the assigned doc-id space
            doc_space=r1.metrics.get("n_docs"),
        )

    r5 = ckpt.run_stage("finalize", finalize)

    result.stages = {r.name: {"skipped": r.skipped, **r.metrics}
                     for r in (r1, r2, r3, r4, r5)}
    ckpt.write_build_manifest({
        "config": cfg.fingerprint(),
        "input_token_sha": hashlib.sha256(token.encode()).hexdigest()[:16],
        "stages": result.stages,
    })
    return result


if __name__ == "__main__":  # pragma: no cover — `ray job submit` entry
    import sys

    from rayindex.cli import main_build

    sys.exit(main_build())
