"""The index build pipeline — Ray-Data-first.

Replaces the reference's single-threaded chain (stream TSV → per-doc dict
update → 60k-doc segment spill → manual pairwise merge → byte-offset hash →
TF-conversion → VB compression; /root/reference/indexing/main.py:7-29 and
SURVEY.md §3.1) with four checkpointed Dataset stages:

1. **ingest**   read Parquet → oversize filter → sha256(content) →
                global sort by (repo, path) → dense 1-based doc_id
                assignment (deterministic under any parallelism) → re-verify
                sha256 after the shuffle (the ingest invariant) → doc store.
2. **chunks**   ``map_batches`` tokenize (zero-copy Arrow in) → per-batch
                pre-aggregated *posting chunks*: one delta+VB-encoded row per
                (term, batch doc-run), plus per-doc stat rows.  This is the
                combiner that makes the groupby shuffle move compressed
                blobs, not raw (term, doc, pos) rows.
3. **shards**   salted two-phase posting merge: ``groupby(term, range_id)``
                (phase 1 — a hot term like ``def`` never lands on a single
                reducer) then ``groupby(shard)`` (phase 2) which byte-splices
                each term's range-chunks and writes one memory-mappable blob
                file + Arrow term dictionary per shard, atomically, with a
                per-shard manifest (per-partition resume).
4. **stats**    doc_stats + collection_stats tables.

Every stage is skipped on resume when its ``.done.json`` fingerprint
matches (rayindex/checkpoint.py).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
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
from rayindex.checkpoint import BuildCheckpoint, atomic_write_bytes, fingerprint_of
from rayindex.config import BuildConfig


def term_shard(term: str, num_shards: int) -> int:
    """Stable shard assignment (zlib.crc32 is platform/run stable, unlike
    Python's salted hash())."""
    return zlib.crc32(term.encode()) % num_shards


def _shuffle_read_blocks(path: str) -> int:
    """Block count for a read that FEEDS A SHUFFLE: Ray's sort-based groupby
    degrades badly with hundreds of tiny input blocks (each sort partition
    exchanges with every input block), so coalesce small inputs to roughly
    64 MiB per block, floored at the CPU count for parallelism."""
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(ncpu, total // (64 << 20) + 1)


# ---------------------------------------------------------------------------
# stage 1: ingest
# ---------------------------------------------------------------------------


def _sha256_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pa.array(
        [hashlib.sha256(t.encode()).hexdigest() if t is not None else None
         for t in texts.to_pylist()],
        pa.string(),
    )


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
# stage 2: tokenize → posting chunks (+ doc-stat rows)
# ---------------------------------------------------------------------------

_CHUNK_NULLS = {
    "first_doc": 0, "last_doc": 0, "n_docs": 0, "cf": 0, "max_tf": 0,
}


class TokenizeToChunks:
    """Stateful map_batches callable: analyzer config + stem cache live for
    the actor's lifetime (the reference rebuilt its whole Preprocessing
    object per document, /root/reference/indexing/index_builder/index_build.py:178)."""

    def __init__(self, cfg: BuildConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # batches may stitch blocks out of order — sort so doc runs ascend
        order = pc.sort_indices(batch["doc_id"])
        batch = batch.take(order)
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["content"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(texts)
        repos = batch["repo"].to_pylist() if "repo" in batch.column_names else [None] * len(texts)

        counts, g_doc, g_terms, g_tfs, pos_flat = analysis.tokenize_docs_grouped(
            texts, cfg.analyzer
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
        if g_terms.size:
            # regroup (doc, term) rows into per-term runs of ascending docs —
            # fully vectorized; blobs are cut from ONE whole-stream VB pass
            # per stream (codec.vb_encode_split).  Block-max metadata is NOT
            # computed here: the shard writer recomputes it canonically.
            term_codes, term_uniques = pd.factorize(g_terms, sort=True)
            g_starts = np.cumsum(g_tfs) - g_tfs  # position-slice start per group
            order2 = np.lexsort((g_doc, term_codes))
            sorted_codes = term_codes[order2]
            t_docs = doc_ids[g_doc[order2]]
            t_tfs = g_tfs[order2]
            term_starts = np.flatnonzero(
                np.concatenate([[True], sorted_codes[1:] != sorted_codes[:-1]])
            )
            term_ends = np.append(term_starts[1:], sorted_codes.size)
            terms = [term_uniques[c] for c in sorted_codes[term_starts]]

            first = t_docs[term_starts]
            last = t_docs[term_ends - 1]
            nd = term_ends - term_starts
            cf = np.add.reduceat(t_tfs, term_starts)
            max_tf = np.maximum.reduceat(t_tfs, term_starts)

            doc_blobs = codec.vb_encode_split(
                codec.segmented_delta_encode(t_docs, term_starts), term_starts)
            tf_blobs = codec.vb_encode_split(t_tfs.astype(np.uint64), term_starts)

            if cfg.keep_positions and pos_flat.size:
                # gather positions into the (term, doc) sorted order
                lens = t_tfs
                offs = np.repeat(np.cumsum(lens) - lens, lens)
                src = np.repeat(g_starts[order2], lens) + np.arange(lens.sum()) - offs
                pos_sorted = pos_flat[src]
                grp_starts = np.cumsum(lens) - lens  # per-(term,doc) segments
                pos_deltas = codec.segmented_delta_encode(pos_sorted, grp_starts)
                # term boundaries in position-value space
                term_pos_starts = grp_starts[term_starts]
                pos_blobs = codec.vb_encode_split(pos_deltas, term_pos_starts)
            else:
                pos_blobs = [b""] * len(terms)

            n_t = len(terms)
            chunk_tbl = {
                "term": terms,
                "range_id": (first // cfg.doc_range_size).astype(np.int64),
                "shard": np.asarray(
                    [term_shard(t, cfg.num_shards) for t in terms], np.int32),
                "first_doc": first,
                "last_doc": last,
                "n_docs": nd.astype(np.int64),
                "cf": cf.astype(np.int64),
                "max_tf": max_tf.astype(np.int32),
                "doc_blob": doc_blobs,
                "tf_blob": tf_blobs,
                "pos_blob": pos_blobs,
            }
        else:
            n_t = 0
            chunk_tbl = {k: [] for k in (
                "term", "range_id", "shard", "first_doc", "last_doc", "n_docs",
                "cf", "max_tf", "doc_blob", "tf_blob", "pos_blob")}

        n = n_t + n_docs_batch
        cols = {
            "term": pa.array(
                list(chunk_tbl["term"]) + [None] * n_docs_batch, pa.string()),
            "range_id": pa.array(
                np.concatenate([np.asarray(chunk_tbl["range_id"], np.int64),
                                np.zeros(n_docs_batch, np.int64)])),
            "shard": pa.array(
                np.concatenate([np.asarray(chunk_tbl["shard"], np.int32),
                                np.full(n_docs_batch, -1, np.int32)])),
            "doc_blob": pa.array(
                list(chunk_tbl["doc_blob"]) + [b""] * n_docs_batch, pa.large_binary()),
            "tf_blob": pa.array(
                list(chunk_tbl["tf_blob"]) + [b""] * n_docs_batch, pa.large_binary()),
            "pos_blob": pa.array(
                list(chunk_tbl["pos_blob"]) + [b""] * n_docs_batch, pa.large_binary()),
            "block_last": pa.array([[]] * n, pa.list_(pa.int64())),
            "block_max_tf": pa.array([[]] * n, pa.list_(pa.int32())),
            "block_min_dl": pa.array([[]] * n, pa.list_(pa.int32())),
            "doc_id": pa.array(
                [None] * n_t + doc_ids.tolist(), pa.int64()),
            "n_tokens": pa.array(
                [None] * n_t + counts.tolist(), pa.int64()),
            "lang": pa.array([None] * n_t + langs, pa.string()),
            "repo": pa.array([None] * n_t + repos, pa.string()),
        }
        for name, dtype in (("first_doc", pa.int64()), ("last_doc", pa.int64()),
                            ("n_docs", pa.int64()), ("cf", pa.int64()),
                            ("max_tf", pa.int32())):
            cols[name] = pa.array(
                np.concatenate([np.asarray(chunk_tbl[name],
                                           dtype.to_pandas_dtype()),
                                np.zeros(n_docs_batch, dtype.to_pandas_dtype())]))
        return pa.table(cols, schema=schema.POSTING_CHUNKS)


def _stage_chunks(doc_store: str, out: str, cfg: BuildConfig) -> dict[str, Any]:
    cols = ["doc_id", "content", "lang", "repo"]
    ds = ray.data.read_parquet(doc_store, columns=cols)
    ds = ds.map_batches(
        TokenizeToChunks(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.tokenize_batch_size,
    )
    ds.write_parquet(out)
    return {}


# ---------------------------------------------------------------------------
# stage 3: salted two-phase merge → shard files
# ---------------------------------------------------------------------------


_EMPTY_CHUNKS = None


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


def _empty_chunks_table() -> pa.Table:
    global _EMPTY_CHUNKS
    if _EMPTY_CHUNKS is None:
        _EMPTY_CHUNKS = pa.table(
            {f.name: pa.array([], f.type) for f in schema.POSTING_CHUNKS},
            schema=schema.POSTING_CHUNKS,
        )
    return _EMPTY_CHUNKS


class _SortedChunkView:
    """Column view over a chunk table sorted by (term, first_doc), with
    per-term run boundaries and run aggregates precomputed vectorized."""

    def __init__(self, group: pa.Table):
        idx = pc.sort_indices(
            group, sort_keys=[("term", "ascending"), ("first_doc", "ascending")]
        )
        g = group.take(idx).combine_chunks()
        first = g["first_doc"].to_numpy()
        last = g["last_doc"].to_numpy()
        n_docs = g["n_docs"].to_numpy()
        cf = g["cf"].to_numpy()
        max_tf = g["max_tf"].to_numpy()
        # term run boundaries via dictionary codes (no python string compares)
        codes = pc.dictionary_encode(g["term"]).combine_chunks().indices.to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], codes[1:] != codes[:-1]]))
        ends = np.append(starts[1:], codes.size)
        self.starts = starts
        self.ends = ends
        self.n_runs = starts.size
        all_terms = g["term"]
        self.run_terms = all_terms.take(pa.array(starts)).to_pylist()
        # run aggregates, vectorized
        self.r_first = first[starts]
        # max, not last-row: under overlapping ranges the chunk with the
        # largest first_doc need not have the largest last_doc
        self.r_last = np.maximum.reduceat(last, starts)
        cs_nd = np.concatenate([[0], np.cumsum(n_docs)])
        cs_cf = np.concatenate([[0], np.cumsum(cf)])
        self.r_nd = cs_nd[ends] - cs_nd[starts]
        self.r_cf = cs_cf[ends] - cs_cf[starts]
        self.r_maxtf = np.maximum.reduceat(max_tf, starts)
        # per-run monotonicity: within a run, chunk i must start after chunk
        # i-1 ends (the normal case — contiguous upstream batches)
        ok = np.ones(codes.size, bool)
        ok[1:] = (first[1:] > last[:-1]) | (codes[1:] != codes[:-1])
        bad_rows = ~ok
        self.run_disjoint = np.ones(self.n_runs, bool)
        if bad_rows.any():
            cs_bad = np.concatenate([[0], np.cumsum(bad_rows)])
            self.run_disjoint = (cs_bad[ends] - cs_bad[starts]) == 0
        # python-int copies for the per-run splice loop
        self.first_l = first.tolist()
        self.last_l = last.tolist()
        # zero-copy access to the blob columns: after take+combine the
        # binary column's data buffer IS the row-order concatenation, so a
        # term run's tf/pos stream is ONE buffer slice — no per-row bytes
        # objects, no join
        self._doc_mv, self._doc_offs = _binary_column_view(g, "doc_blob")
        self._tf_mv, self._tf_offs = _binary_column_view(g, "tf_blob")
        self._pos_mv, self._pos_offs = _binary_column_view(g, "pos_blob")
        self.shard = g["shard"].to_numpy()
        self.range_id = g["range_id"].to_numpy()
        self._chunk_nd = n_docs
        self._chunk_cf = cf
        self._chunk_mtf = max_tf

    def doc_blob_at(self, i: int) -> memoryview:
        return self._doc_mv[self._doc_offs[i] : self._doc_offs[i + 1]]

    def _slice(self, mv: memoryview, offs: np.ndarray, s: int, e: int) -> memoryview:
        return mv[offs[s] : offs[e]]

    def run_blobs(self, r: int) -> tuple[bytes, bytes, bytes]:
        """Merged (doc, tf, pos) blobs for run ``r``.

        Fast path (disjoint ascending ranges): byte-splice — only each
        subsequent chunk's first doc value is re-encoded as a delta against
        the previous chunk's last doc; tf/pos streams concatenate as-is.
        Overlap fallback: full decode / interleave / re-encode.
        """
        s, e = int(self.starts[r]), int(self.ends[r])
        tf_run = self._slice(self._tf_mv, self._tf_offs, s, e)
        pos_run = self._slice(self._pos_mv, self._pos_offs, s, e)
        if e - s == 1:
            return self.doc_blob_at(s), tf_run, pos_run
        if self.run_disjoint[r]:
            first_l, last_l = self.first_l, self.last_l
            doc_parts = [self.doc_blob_at(s)]
            ap = doc_parts.append
            for i in range(s + 1, e):
                b = self.doc_blob_at(i)
                head = codec.vb_first_value_len(b)
                ap(codec.vb_encode_one(first_l[i] - last_l[i - 1]))
                ap(b[head:])
            return b"".join(doc_parts), tf_run, pos_run
        return self._merge_overlapping(s, e)

    def _merge_overlapping(self, s: int, e: int) -> tuple[bytes, bytes, bytes]:
        """Overlap fallback (batches straddling block boundaries interleave
        doc ranges): decode ALL the run's chunks in one vectorized pass,
        argsort by doc, re-encode once.  Positions are re-gathered into the
        new doc order through an index map — no per-chunk python decode."""
        nd = self._chunk_nd[s:e].astype(np.int64)
        doc_ids = codec.segmented_delta_decode(
            codec.vb_decode(self._slice(self._doc_mv, self._doc_offs, s, e)), nd)
        tfs = codec.vb_decode(
            self._slice(self._tf_mv, self._tf_offs, s, e)).astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        doc_sorted = doc_ids[order]
        if doc_sorted.size > 1 and not (np.diff(doc_sorted) > 0).all():
            raise ValueError("duplicate doc_id across chunks of one term")
        tf_sorted = tfs[order]
        doc_blob = codec.vb_encode(codec.delta_encode(doc_sorted))
        tf_blob = codec.vb_encode(tf_sorted.astype(np.uint64))
        pos_blob = b""
        pos_all = self._slice(self._pos_mv, self._pos_offs, s, e)
        if len(pos_all):
            pos_vals = codec.segmented_delta_decode(codec.vb_decode(pos_all), tfs)
            # gather each doc's position run into the sorted order
            starts = np.cumsum(tfs) - tfs
            lens = tfs[order]
            offs = np.repeat(np.cumsum(lens) - lens, lens)
            src = np.repeat(starts[order], lens) + np.arange(int(lens.sum())) - offs
            pos_sorted = pos_vals[src]
            seg_starts = np.cumsum(lens) - lens
            pos_blob = codec.vb_encode(
                codec.segmented_delta_encode(pos_sorted, seg_starts))
        return doc_blob, tf_blob, pos_blob


def _merge_shard_range(group: pa.Table) -> pa.Table:
    """Phase-1 reducer over a (shard, range_id) group: merge every term's
    chunks within the doc range.  Grouping by (shard, range) instead of
    (term, range) keeps the same skew bound — a hot term's postings stay
    spread across ranges — while making the number of Ray groups small and
    the per-term work a tight in-memory loop.  Block metadata is emitted
    empty: the shard writer recomputes it canonically from the final merged
    streams."""
    if group.num_rows == 0:  # Ray may hand the UDF an empty block
        return _empty_chunks_table()
    v = _SortedChunkView(group)
    doc_blobs, tf_blobs, pos_blobs = [], [], []
    for r in range(v.n_runs):
        db, tb, pb = v.run_blobs(r)
        doc_blobs.append(db)
        tf_blobs.append(tb)
        pos_blobs.append(pb)
    n = v.n_runs
    return pa.table(
        {
            "term": pa.array(v.run_terms, pa.string()),
            "range_id": pa.array(v.range_id[v.starts].astype(np.int64)),
            "shard": pa.array(v.shard[v.starts].astype(np.int32)),
            "first_doc": pa.array(v.r_first.astype(np.int64)),
            "last_doc": pa.array(v.r_last.astype(np.int64)),
            "n_docs": pa.array(v.r_nd.astype(np.int64)),
            "cf": pa.array(v.r_cf.astype(np.int64)),
            "max_tf": pa.array(v.r_maxtf.astype(np.int32)),
            "doc_blob": pa.array(doc_blobs, pa.large_binary()),
            "tf_blob": pa.array(tf_blobs, pa.large_binary()),
            "pos_blob": pa.array(pos_blobs, pa.large_binary()),
            "block_last": pa.array([[]] * n, pa.list_(pa.int64())),
            "block_max_tf": pa.array([[]] * n, pa.list_(pa.int32())),
            "block_min_dl": pa.array([[]] * n, pa.list_(pa.int32())),
            "doc_id": pa.array([None] * n, pa.int64()),
            "n_tokens": pa.array([None] * n, pa.int64()),
            "lang": pa.array([None] * n, pa.string()),
            "repo": pa.array([None] * n, pa.string()),
        },
        schema=schema.POSTING_CHUNKS,
    )


class WriteShard:
    """Phase-2 reducer: receives every range-chunk of one shard, merges per
    term (byte-splice), and writes the shard blob + term dictionary
    atomically.  The blob file is the mmap target at query time — the
    engine's replacement for the reference's JSON-lines index +
    word2byte.json seek/read pair
    (/root/reference/indexing/index_hasher/index_hasher.py:44-65).

    Block-max metadata is recomputed canonically here (every
    ``block_size`` postings of the FINAL merged list) so the artifact is
    byte-identical regardless of upstream batch/partition boundaries; doc
    lengths come from a ``ray.put`` broadcast of the doc_stats column —
    one object read per reducer, not re-shipped per batch.  (At 10^12-doc
    scale this array would be sharded by doc range instead; the layout
    already supports that since reducers see ascending doc runs.)"""

    def __init__(self, shard_dir: str, fingerprint: str, block_size: int,
                 doc_len_ref):
        self.shard_dir = shard_dir
        self.fingerprint = fingerprint
        self.block_size = block_size
        self.doc_len_ref = doc_len_ref
        self._doc_len = None

    @property
    def doc_len(self) -> np.ndarray:
        if self._doc_len is None:
            self._doc_len = ray.get(self.doc_len_ref)
        return self._doc_len

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
        v = _SortedChunkView(group)
        bs = self.block_size
        # merge every term's chunks (byte-splice fast path)
        doc_blobs, tf_blobs, pos_blobs = [], [], []
        for r in range(v.n_runs):
            db, tb, pb = v.run_blobs(r)
            doc_blobs.append(db)
            tf_blobs.append(tb)
            pos_blobs.append(pb)
        # ONE vectorized decode of the whole shard's doc/tf streams for the
        # canonical block-max metadata (per-term nd gives the segmentation)
        r_nd = v.r_nd.astype(np.int64)
        doc_ids = codec.segmented_delta_decode(
            codec.vb_decode(b"".join(doc_blobs)), r_nd)
        tfs = codec.vb_decode(b"".join(tf_blobs)).astype(np.int64)
        dls = self.doc_len[doc_ids]
        term_val_starts = np.cumsum(r_nd) - r_nd
        # ragged per-term blocks, computed globally: blocks tile the value
        # stream contiguously, so one reduceat covers every term's blocks
        nb = (r_nd + bs - 1) // bs
        nb = np.maximum(nb, 1)
        blk_term = np.repeat(np.arange(v.n_runs), nb)
        within = (np.arange(int(nb.sum())) - np.repeat(np.cumsum(nb) - nb, nb)) * bs
        blk_starts = term_val_starts[blk_term] + within
        blk_ends = np.minimum(blk_starts + bs, (term_val_starts + r_nd)[blk_term])
        block_last_all = doc_ids[np.maximum(blk_ends, 1) - 1]
        block_maxtf_all = np.maximum.reduceat(tfs, blk_starts) if tfs.size else np.zeros(0, np.int64)
        block_mindl_all = np.minimum.reduceat(dls, blk_starts) if dls.size else np.zeros(0, np.int64)
        blk_offsets = np.concatenate([[0], np.cumsum(nb)]).astype(np.int32)
        # byte offsets into the shard blob, vectorized
        dlen = np.fromiter(map(len, doc_blobs), np.int64, v.n_runs)
        tlen = np.fromiter(map(len, tf_blobs), np.int64, v.n_runs)
        plen = np.fromiter(map(len, pos_blobs), np.int64, v.n_runs)
        rec = dlen + tlen + plen
        rec_start = np.concatenate([[0], np.cumsum(rec)[:-1]])
        dict_table = pa.table(
            {
                "term": pa.array(v.run_terms, pa.string()),
                "df": pa.array(r_nd),
                "cf": pa.array(v.r_cf.astype(np.int64)),
                "max_tf": pa.array(v.r_maxtf.astype(np.int32)),
                "doc_off": pa.array(rec_start),
                "doc_len": pa.array(dlen),
                "tf_off": pa.array(rec_start + dlen),
                "tf_len": pa.array(tlen),
                "pos_off": pa.array(rec_start + dlen + tlen),
                "pos_len": pa.array(plen),
                "block_last": pa.ListArray.from_arrays(
                    pa.array(blk_offsets), pa.array(block_last_all.astype(np.int64))),
                "block_max_tf": pa.ListArray.from_arrays(
                    pa.array(blk_offsets), pa.array(block_maxtf_all.astype(np.int32))),
                "block_min_dl": pa.ListArray.from_arrays(
                    pa.array(blk_offsets), pa.array(block_mindl_all.astype(np.int32))),
            },
            schema=schema.TERM_DICT,
        )
        # stream the blob file record by record — no whole-shard join in heap
        bin_path = os.path.join(self.shard_dir, f"shard_{shard_id:05d}.bin")
        tmp_path = bin_path + f".tmp-{os.getpid()}"
        with open(tmp_path, "wb", buffering=4 << 20) as f:
            for db, tb, pb in zip(doc_blobs, tf_blobs, pos_blobs):
                f.write(db)
                f.write(tb)
                f.write(pb)
        os.replace(tmp_path, bin_path)
        total_bytes = int(rec.sum())
        tmp = os.path.join(self.shard_dir, f"shard_{shard_id:05d}.dict.parquet.tmp-{os.getpid()}")
        pq.write_table(dict_table, tmp)
        os.replace(tmp, os.path.join(self.shard_dir, f"shard_{shard_id:05d}.dict.parquet"))
        n_terms = v.n_runs
        BuildCheckpoint.write_shard_manifest(
            self.shard_dir, shard_id, self.fingerprint,
            {"n_terms": n_terms, "bytes": total_bytes},
        )
        return pa.table({"shard": [shard_id], "n_terms": [n_terms],
                         "bytes": [total_bytes], "skipped": [False]})


def _stage_shards(chunks_path: str, shard_dir: str, cfg: BuildConfig,
                  fingerprint: str, stats_dir: str,
                  multi_range: bool) -> dict[str, Any]:
    # broadcast the doc-length table once (block-min-dl recompute)
    ds_t = pq.read_table(os.path.join(stats_dir, "doc_stats"),
                         columns=["doc_id", "n_tokens"])
    ids = ds_t["doc_id"].to_numpy()
    doc_len = np.zeros(int(ids.max()) + 1 if len(ids) else 1, np.int64)
    doc_len[ids] = ds_t["n_tokens"].to_numpy()
    doc_len_ref = ray.put(doc_len)

    ds = ray.data.read_parquet(chunks_path, filter=pc.is_valid(pc.field("term")),
                               override_num_blocks=_shuffle_read_blocks(chunks_path))
    # phase 1 (salted two-phase merge): (shard, range_id) groups keep hot
    # terms spread across reducers, bounded per doc range.  With a single
    # range (corpus smaller than doc_range_size) the shard writer's own
    # per-term merge does identical work, so the extra shuffle is skipped —
    # the two-phase path engages exactly when the data is big enough to
    # need it.
    if multi_range:
        ds = ds.groupby(["shard", "range_id"]).map_groups(
            _merge_shard_range, batch_format="pyarrow"
        )
    # phase 2: all of a shard's terms on one reducer; byte-splice merge + write
    writer = WriteShard(shard_dir, fingerprint, cfg.block_size, doc_len_ref)

    def write_shard(group: pa.Table) -> pa.Table:
        return writer(group)

    # shard writers are memory-bandwidth bound (whole-shard decode + blob
    # concatenation): more than ~8 concurrent writers thrash the cache and
    # ANTI-scale (measured 52.6s → 15.0s at 32 CPUs with an 8-writer cap),
    # so reserve proportionally more CPUs per task on bigger machines
    task_cpus = max(1, int(ray.cluster_resources().get("CPU", 8)) // 8)
    res = ds.groupby("shard").map_groups(write_shard, batch_format="pyarrow",
                                         num_cpus=task_cpus)
    stats = res.to_pandas()
    # shards with no terms still need (empty) files for the searcher
    present = set(stats["shard"].tolist())
    for sid in range(cfg.num_shards):
        if sid not in present:
            atomic_write_bytes(os.path.join(shard_dir, f"shard_{sid:05d}.bin"), b"")
            empty = pa.table(
                {f.name: pa.array([], f.type) for f in schema.TERM_DICT}, schema=schema.TERM_DICT
            )
            pq.write_table(empty, os.path.join(shard_dir, f"shard_{sid:05d}.dict.parquet"))
            BuildCheckpoint.write_shard_manifest(shard_dir, sid, fingerprint,
                                                 {"n_terms": 0, "bytes": 0})
    return {
        "n_terms": int(stats["n_terms"].sum()),
        "index_bytes": int(stats["bytes"].sum()),
        "shards": int(cfg.num_shards),
    }


# ---------------------------------------------------------------------------
# stage 4: doc_stats + collection_stats
# ---------------------------------------------------------------------------


def _stage_stats(chunks_path: str, out: str) -> dict[str, Any]:
    ds = ray.data.read_parquet(
        chunks_path,
        columns=["term", "doc_id", "n_tokens", "lang", "repo"],
        filter=pc.is_null(pc.field("term")),
    )
    ds = ds.map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "lang", "repo"]),
        batch_format="pyarrow",
    )
    doc_stats_dir = os.path.join(out, "doc_stats")
    os.makedirs(doc_stats_dir, exist_ok=True)
    ds.write_parquet(doc_stats_dir)
    # pre-aggregate per batch, then sum the tiny partials on the driver
    agg = ds.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "tok": pa.array([pc.sum(t["n_tokens"]).as_py() or 0], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    return {"n_docs": int(agg["n"].sum()), "total_tokens": int(agg["tok"].sum())}


def _stage_finalize(stats_dir: str, out: str, n_docs: int, total_tokens: int,
                    n_terms: int) -> dict[str, Any]:
    cs = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "total_tokens": pa.array([total_tokens], pa.int64()),
            "avg_dl": pa.array([total_tokens / n_docs if n_docs else 0.0], pa.float64()),
            "n_terms": pa.array([n_terms], pa.int64()),
        },
        schema=schema.COLLECTION_STATS,
    )
    pq.write_table(cs, os.path.join(stats_dir, "collection_stats.parquet"))
    return {"n_terms": n_terms}


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
            # the ingest read feeds the global sort — coalesce tiny files
            ds = ray.data.read_parquet(
                source, override_num_blocks=_shuffle_read_blocks(source))
        else:
            ds = source
        return _stage_ingest(ds, d, cfg)

    stats_dir = os.path.join(out_dir, "stats")

    r1 = ckpt.run_stage("doc_store", ingest)
    r2 = ckpt.run_stage("chunks", lambda d: _stage_chunks(doc_store, d, cfg))
    r3 = ckpt.run_stage("stats", lambda d: _stage_stats(chunks, d))
    multi_range = r1.metrics.get("n_docs", 0) > cfg.doc_range_size
    # clear=False: completed shards are skipped via their own manifests
    r4 = ckpt.run_stage(
        "shards",
        lambda d: _stage_shards(chunks, d, cfg, fp, stats_dir, multi_range),
        clear=False)
    r5 = ckpt.run_stage(
        "finalize",
        lambda d: _stage_finalize(
            stats_dir, d,
            r3.metrics.get("n_docs", 0), r3.metrics.get("total_tokens", 0),
            r4.metrics.get("n_terms", 0),
        ),
    )

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
