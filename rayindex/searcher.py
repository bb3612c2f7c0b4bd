"""Query serving: memory-mapped shard readers + stateful searcher actors.

The reference serves queries from Django process-lifetime class attributes
(word2byte maps + seek/read per term,
/root/reference/search/retrieval/retrieval_execution/retrieval_execution.py:49-51,
/root/reference/search/retrieval/retrieval_helpers/index_loader.py:71-128).
Here the equivalent state — term dictionaries, doc-length table, collection
stats, mmap'd shard blobs — is loaded once per **searcher actor**
(``__init__``), and batches of queries flow through the actor pool via
``Dataset.map_batches(Searcher, concurrency=N)``.  A per-term lookup is a
dict hit + a zero-copy mmap slice, mirroring the reference's byte-range
"mini index" trick but without JSON decode.

Scale note: each actor here loads the full term dictionary of every shard
(fine at sandbox scale).  On a real multi-node cluster, searchers would own
disjoint shard subsets (``hash(term) % num_shards``) and the driver would
scatter a query to the owners and merge partial top-k — the partitioning key
is already in the artifact layout to allow exactly that.
"""

from __future__ import annotations

import glob
import mmap
import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rayindex import codec, schema
from rayindex.config import AnalyzerConfig, SearchConfig
from rayindex.query import parse_query
from rayindex.scoring import MiniIndexProvider, Posting, Stats, search_parsed


def _live_mask(docs: np.ndarray, deleted: np.ndarray | None
               ) -> np.ndarray | None:
    """Boolean mask of docs NOT in the sorted tombstone array, or None when
    nothing is masked (the common case — zero-copy fast path).  O(p log d)
    with O(n_deleted) memory: scale-safe where a doc-space bitmap is not
    (10^12-doc spaces)."""
    if deleted is None or deleted.size == 0 or docs.size == 0:
        return None
    idx = np.searchsorted(deleted, docs)
    hit = idx < deleted.size
    hit[hit] = deleted[idx[hit]] == docs[hit]
    return ~hit if hit.any() else None


class LazyPosting:
    """Block-addressable postings of one term: nothing is decoded up front.
    Dict blocks store their absolute first doc + per-stream byte offsets,
    so any single block decodes standalone — block-max WAND skips (and
    never touches) pruned blocks, and positional fetch decodes only the
    blocks containing candidate docs."""

    __slots__ = ("df", "cf", "max_tf", "block_first", "block_last", "block_n",
                 "block_max_tf", "block_min_dl", "_buf",
                 "_doc_off", "_doc_len", "_tf_off", "_tf_len",
                 "_pos_off", "_pos_len", "_boff_doc", "_boff_tf", "_boff_pos",
                 "deleted")

    def __init__(self) -> None:
        self.deleted = None  # sorted tombstone ids, set by lookup_lazy

    @property
    def n_blocks(self) -> int:
        return self.block_last.size

    def _block_span(self, boff: np.ndarray, base: int, total: int, b: int
                    ) -> tuple[int, int]:
        s = base + int(boff[b])
        e = base + (int(boff[b + 1]) if b + 1 < boff.size else total)
        return s, e

    def block_docs_tfs(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        """One block's (docs, tfs), with tombstoned docs masked out.  NB:
        ``block_positions`` needs the UNFILTERED tfs to delimit the
        position stream — raw-decode via ``_block_span`` if you need
        both on a tombstoned index."""
        s, e = self._block_span(self._boff_doc, self._doc_off, self._doc_len, b)
        docs = codec.delta_decode(codec.vb_decode(self._buf[s:e]))
        s, e = self._block_span(self._boff_tf, self._tf_off, self._tf_len, b)
        tfs = codec.vb_decode(self._buf[s:e]).astype(np.int64)
        live = _live_mask(docs, self.deleted)
        if live is not None:
            docs, tfs = docs[live], tfs[live]
        return docs, tfs

    def block_positions(self, b: int, tfs: np.ndarray) -> np.ndarray:
        s, e = self._block_span(self._boff_pos, self._pos_off, self._pos_len, b)
        return codec.decode_positions(self._buf[s:e], tfs)

    def decode_blocks(self, bsel: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Decode several blocks in ONE vectorized pass (per-block
        vb_decode overhead dominates when many small blocks are needed).
        Returns (docs, tfs, starts, counts): block ``bsel[i]``'s run is
        ``docs[starts[i] : starts[i] + counts[i]]``.  Tombstoned docs are
        dropped (counts reflect survivors); block upper bounds in the
        dict can only over-estimate after deletes, so WAND pruning on the
        stale metadata stays exact."""
        ends_d = np.append(self._boff_doc[1:], self._doc_len)
        doc_bytes = b"".join(
            self._buf[self._doc_off + int(self._boff_doc[b]):
                      self._doc_off + int(ends_d[b])] for b in bsel)
        ends_t = np.append(self._boff_tf[1:], self._tf_len)
        tf_bytes = b"".join(
            self._buf[self._tf_off + int(self._boff_tf[b]):
                      self._tf_off + int(ends_t[b])] for b in bsel)
        bn = self.block_n[bsel]
        docs = codec.segmented_delta_decode(codec.vb_decode(doc_bytes), bn)
        tfs = codec.vb_decode(tf_bytes).astype(np.int64)
        live = _live_mask(docs, self.deleted)
        if live is not None:
            starts = np.cumsum(bn) - bn
            bn = (np.add.reduceat(live, starts) if docs.size
                  else bn * 0)
            docs, tfs = docs[live], tfs[live]
        return docs, tfs, np.cumsum(bn) - bn, bn


class _RangedBlob:
    """Byte-range access over an fsspec file: every ``buf[s:e]`` becomes a
    ranged ``cat_file`` read — the object-store serving path (the
    reference fetches posting byte ranges from GCS the same way,
    /root/reference/search/retrieval/retrieval_helpers/index_loader.py:13-69).
    No full-file fetch ever happens; ``reads`` records (start, stop) for
    tests to assert that."""

    __slots__ = ("fs", "path", "size", "reads")

    def __init__(self, fs, path: str, size: int):
        self.fs = fs
        self.path = path
        self.size = size
        self.reads: list[tuple[int, int]] = []

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, sl: slice) -> bytes:
        s = int(sl.start or 0)
        e = self.size if sl.stop is None else int(sl.stop)
        self.reads.append((s, e))
        if e <= s:
            return b""
        return self.fs.cat_file(self.path, start=s, end=e)


class _RangedBinArray:
    """Doc-indexed fixed-dtype side table (``doc_len.bin``,
    ``lang_codes.bin``) on object storage, served by BYTE-RANGE reads:
    ``arr[docs]`` fetches only the 16 KiB chunks containing the requested
    elements (deduplicated, LRU-cached) — a remote reader never
    materializes the O(n_docs) table.  ``reads`` records ranges for tests
    to assert no full fetch happens."""

    _CHUNK = 16384
    _CACHE_CHUNKS = 256  # ≤ 4 MB resident per array

    def __init__(self, fs, path: str, dtype):
        self.fs = fs
        self.path = path
        self.dtype = np.dtype(dtype)
        self.nbytes = fs.size(path)
        self.size = self.nbytes // self.dtype.itemsize
        self.reads: list[tuple[int, int]] = []
        from collections import OrderedDict

        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()

    def __len__(self) -> int:
        return self.size

    @property
    def shape(self):
        return (self.size,)

    def _chunk(self, c: int) -> np.ndarray:
        buf = self._cache.get(c)
        if buf is not None:
            self._cache.move_to_end(c)
            return buf
        s = c * self._CHUNK
        e = min(s + self._CHUNK, self.nbytes)
        self.reads.append((s, e))
        buf = np.frombuffer(self.fs.cat_file(self.path, start=s, end=e),
                            self.dtype)
        self._cache[c] = buf
        while len(self._cache) > self._CACHE_CHUNKS:
            self._cache.popitem(last=False)
        return buf

    def __getitem__(self, idx):
        if isinstance(idx, slice):  # full/span scan (lang-filter path)
            start, stop, step = idx.indices(self.size)
            out = self.read_span(start, stop)
            return out[::step] if step != 1 else out
        ids = np.asarray(idx, np.int64)
        scalar = ids.ndim == 0
        ids = np.atleast_1d(ids)
        per = self._CHUNK // self.dtype.itemsize
        out = np.empty(ids.size, self.dtype)
        cid = ids // per
        for c in np.unique(cid).tolist():
            sel = cid == c
            out[sel] = self._chunk(int(c))[ids[sel] - c * per]
        return out[0] if scalar else out

    def read_span(self, start: int, stop: int) -> np.ndarray:
        isz = self.dtype.itemsize
        s, e = start * isz, min(stop * isz, self.nbytes)
        if e <= s:
            return np.zeros(0, self.dtype)
        self.reads.append((s, e))
        return np.frombuffer(self.fs.cat_file(self.path, start=s, end=e),
                             self.dtype)


def _shard_id_of(path: str) -> int:
    name = os.path.basename(path)
    return int(name.split("_")[1].split(".")[0])


_PREFAULTED = False


def _prefault_heap() -> None:
    """One-time per-process heap pre-fault ($RAYINDEX_PREFAULT_MB, default
    off).  On hosts with lazy VM paging, the FIRST touch of a fresh heap
    page costs ~0.1-0.5 ms; a hot positional query allocating ~100 MB of
    decode arrays then pays seconds of fault time instead of the ~0.1 s of
    arithmetic.  Touching the pages once at reader init (with glibc trim
    disabled so they stay resident) moves that cost out of the query path.
    (Do NOT combine with MALLOC_ARENA_MAX=1: measured on this host, one
    arena shared by a worker's threads overflows contended allocations to
    fresh mmaps and the fault tax returns — the prefault alone is the
    effective mitigation.)"""
    global _PREFAULTED
    if _PREFAULTED:
        return
    _PREFAULTED = True
    mb = int(os.environ.get("RAYINDEX_PREFAULT_MB", "0"))
    if mb <= 0:
        return
    a = np.ones(mb * 1024 * 1024 // 8)
    a[:: 4096 // 8] = 2.0
    del a


def _find_row(cols: dict[str, Any], needle: bytes) -> int | None:
    """Binary search over a shard dict's sorted utf-8 term bytes (Arrow
    large_binary offsets + data shared zero-copy through plasma — no
    per-actor Python vocab dict).  Sortedness holds because the shard
    writer factorizes terms with sort=True, and numpy's str order =
    code-point order = utf-8 byte order."""
    offs = cols["term_offs"]
    data = cols["term_data"]
    lo, hi = 0, offs.size - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if data[offs[mid]:offs[mid + 1]].tobytes() < needle:
            lo = mid + 1
        else:
            hi = mid
    if lo < offs.size - 1 and data[offs[lo]:offs[lo + 1]].tobytes() == needle:
        return lo
    return None


def _fs_of(index_dir: str):
    if "://" in index_dir:
        import fsspec

        return fsspec.core.url_to_fs(index_dir)[0]
    return None


def _read_parquet(fs, path: str, columns=None) -> pa.Table:
    if fs is not None:
        with fs.open(path, "rb") as f:
            return pq.read_table(f, columns=columns)
    return pq.read_table(path, columns=columns)


def _strip(uri: str) -> str:
    import fsspec

    return fsspec.core.url_to_fs(uri)[1].rstrip("/")


def _load_docmeta(fs, index_dir: str) -> tuple[dict, pa.Table]:
    """(collection_stats row, doc_stats table) for one build."""
    if fs is not None:
        stats_root = _strip(index_dir) + "/stats"
        cs = _read_parquet(fs, stats_root + "/collection_stats.parquet").to_pylist()[0]
        parts = sorted(fs.glob(stats_root + "/doc_stats/*.parquet"))
        ds_t = pa.concat_tables(
            [_read_parquet(fs, p, ["doc_id", "n_tokens", "lang"]) for p in parts])
    else:
        stats_dir = os.path.join(index_dir, "stats")
        cs = pq.read_table(os.path.join(stats_dir, "collection_stats.parquet")).to_pylist()[0]
        ds_t = pq.read_table(os.path.join(stats_dir, "doc_stats"),
                             columns=["doc_id", "n_tokens", "lang"])
    return cs, ds_t


class IndexReader(MiniIndexProvider):
    """Loads one build's artifacts; serves per-term postings zero-copy from
    a local mmap, or by byte-range reads when ``index_dir`` is a URI
    (``file://``, ``s3://``, ... — anything fsspec resolves): the index on
    object storage is queryable without downloading the blobs.

    ``shard_subset`` restricts the reader to the given shard ids (the
    sharded-actor ownership split: each actor owns ``crc32(term) %
    num_shards`` subsets and out-of-subset terms simply miss).

    ``shared_state`` (from :func:`build_shared_state`) attaches
    pre-loaded dictionaries instead of re-reading parquet — the state is
    all numpy arrays, so actors on one node read it ZERO-COPY from the
    object store (`ray.put` once, N searcher actors attach in ~ms with no
    per-actor vocab copy)."""

    _BLOCK_COLS = ("block_first", "block_last", "block_n", "block_max_tf",
                   "block_min_dl", "block_doc_boff", "block_tf_boff",
                   "block_pos_boff")

    def __init__(self, index_dir: str, shard_subset: set[int] | None = None,
                 shared_state: dict | None = None):
        _prefault_heap()
        self.index_dir = index_dir
        self._remote = "://" in index_dir
        self._fs = _fs_of(index_dir)
        state = (shared_state if shared_state is not None
                 else self.load_state(index_dir, shard_subset))
        self._attach(state)

    @staticmethod
    def load_state(index_dir: str, shard_subset: set[int] | None = None) -> dict:
        """Everything a reader needs except blob handles, as numpy arrays
        and small scalars (plasma-shareable; see ``build_shared_state``)."""
        fs = _fs_of(index_dir)
        if fs is not None:
            shard_dir = _strip(index_dir) + "/shards"
            all_paths = sorted(fs.glob(shard_dir + "/*.dict.parquet"))
        else:
            shard_dir = os.path.join(index_dir, "shards")
            all_paths = sorted(glob.glob(os.path.join(shard_dir, "*.dict.parquet")))
        num_shards_total = len(all_paths)
        dict_paths = (all_paths if shard_subset is None else
                      [p for p in all_paths if _shard_id_of(p) in shard_subset])
        dicts: list[dict[str, Any]] = []
        bin_sizes: list[int] = []
        for dict_path in dict_paths:
            t = _read_parquet(fs, dict_path)
            cols: dict[str, Any] = {
                "df": t["df"].to_numpy(),
                "cf": t["cf"].to_numpy(),
                "max_tf": t["max_tf"].to_numpy(),
                "doc_off": t["doc_off"].to_numpy(),
                "doc_len": t["doc_len"].to_numpy(),
                "tf_off": t["tf_off"].to_numpy(),
                "tf_len": t["tf_len"].to_numpy(),
                "pos_off": t["pos_off"].to_numpy(),
                "pos_len": t["pos_len"].to_numpy(),
            }
            # sorted utf-8 term bytes for binary search (no python dict)
            term = t["term"].combine_chunks().cast(pa.large_binary())
            n = len(term)
            cols["term_offs"] = (np.frombuffer(term.buffers()[1], np.int64,
                                               n + 1, term.offset * 8)
                                 if n else np.zeros(1, np.int64))
            cols["term_data"] = np.frombuffer(term.buffers()[2] or b"", np.uint8)
            # flatten the ragged block-metadata lists ONCE (offsets+values);
            # per-lookup .as_py() conversion is 100x slower for hot terms
            for name in IndexReader._BLOCK_COLS:
                arr = t[name].combine_chunks()
                cols[f"{name}_off"] = arr.offsets.to_numpy()
                cols[f"{name}_val"] = arr.values.to_numpy()
            dicts.append(cols)
            bin_path = dict_path.replace(".dict.parquet", ".bin")
            bin_sizes.append(fs.size(bin_path) if fs is not None
                             else os.path.getsize(bin_path))
        state: dict[str, Any] = {
            "num_shards_total": num_shards_total,
            "shard_ids": [_shard_id_of(p) for p in dict_paths],
            "bin_names": [os.path.basename(p).replace(".dict.parquet", ".bin")
                          for p in dict_paths],
            "bin_sizes": bin_sizes,
            "dicts": dicts,
        }
        # tombstones: sorted deleted-id array (O(n_deleted), loaded fully
        # even remotely — takedown sets are tiny next to the index)
        if fs is not None:
            tomb = _strip(index_dir) + "/stats/tombstones.bin"
            if fs.exists(tomb):
                with fs.open(tomb, "rb") as f:
                    state["tombstones"] = np.frombuffer(f.read(), np.int64)
        else:
            tomb = os.path.join(index_dir, "stats", "tombstones.bin")
            if os.path.exists(tomb):
                state["tombstones"] = np.fromfile(tomb, np.int64)
        if fs is not None:
            stats_root = _strip(index_dir) + "/stats"
            dl_bin = stats_root + "/doc_len.bin"
            has_bins = fs.exists(dl_bin)
        else:
            stats_root = os.path.join(index_dir, "stats")
            dl_bin = os.path.join(stats_root, "doc_len.bin")
            has_bins = os.path.exists(dl_bin)
        if has_bins:
            # doc-meta bins exist: carry only PATHS — a local reader mmaps
            # them (the OS page cache shares one copy per node), a REMOTE
            # reader serves them by byte-range reads (_RangedBinArray); in
            # both cases only touched doc ranges ever load.  A dense
            # in-heap doc_len is O(n_docs) PER PROCESS — impossible at
            # corpus scale.
            import json

            if fs is not None:
                with fs.open(stats_root + "/lang_vocab.json") as f:
                    lang_uniq = json.load(f)
                cs = _read_parquet(
                    fs, stats_root + "/collection_stats.parquet").to_pylist()[0]
            else:
                with open(os.path.join(stats_root, "lang_vocab.json")) as f:
                    lang_uniq = json.load(f)
                cs = (pq.read_table(os.path.join(stats_root,
                                                 "collection_stats.parquet"))
                      .to_pylist()[0])
            state.update({
                "n_docs": cs["n_docs"],
                "total_tokens": cs["total_tokens"],
                "doc_meta_dir": stats_root,
                "doc_meta_remote": fs is not None,
                "lang_uniq": lang_uniq,
            })
            return state
        # fallback (pre-bin index): materialize from parquet
        cs, ds_t = _load_docmeta(fs, index_dir)
        doc_ids = ds_t["doc_id"].to_numpy()
        doc_len = np.zeros(int(doc_ids.max()) + 1 if len(doc_ids) else 1, np.int64)
        doc_len[doc_ids] = ds_t["n_tokens"].to_numpy()
        enc = ds_t["lang"].combine_chunks().dictionary_encode()
        lang_codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int32)
        state.update({
            "n_docs": cs["n_docs"],
            "total_tokens": cs["total_tokens"],
            "doc_len": doc_len,
            "doc_ids": doc_ids,
            "lang_codes": lang_codes,
            "lang_uniq": enc.dictionary.to_pylist(),
        })
        return state

    def _attach(self, state: dict) -> None:
        self._deleted = state.get("tombstones")
        self.shard_ids = list(state["shard_ids"])
        self._num_shards_total = state["num_shards_total"]
        self._slot_of = {sid: slot for slot, sid in enumerate(self.shard_ids)}
        self._dicts = state["dicts"]
        self._files: list[mmap.mmap | bytes | _RangedBlob] = []
        for name, size in zip(state["bin_names"], state["bin_sizes"]):
            if self._remote:
                bin_path = _strip(self.index_dir) + "/shards/" + name
                self._files.append(_RangedBlob(self._fs, bin_path, size)
                                   if size else b"")
            else:
                bin_path = os.path.join(self.index_dir, "shards", name)
                if size:
                    f = open(bin_path, "rb")
                    m = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
                    # advise-only readahead (Lucene MMapDirectory setPreload
                    # analog): one syscall starts ASYNC population of the
                    # mapping, so a cold query finds pages mid-flight
                    # instead of faulting them serially (O_DIRECT writes
                    # leave nothing in the page cache).  Unlike prefault()
                    # this touches no pages — init stays O(1).
                    if hasattr(m, "madvise"):
                        try:
                            m.madvise(mmap.MADV_WILLNEED)
                        except OSError:  # pragma: no cover
                            pass
                    self._files.append(m)
                else:
                    self._files.append(b"")
        meta_dir = state.get("doc_meta_dir")
        if meta_dir is not None:
            if state.get("doc_meta_remote"):
                # object-store index: byte-range access, never a full fetch
                doc_len = _RangedBinArray(self._fs, meta_dir + "/doc_len.bin",
                                          np.int64)
                self._lang_codes = _RangedBinArray(
                    self._fs, meta_dir + "/lang_codes.bin", np.int32)
            else:
                # local doc-indexed bins: mmap (shared page cache, lazy load)
                doc_len = np.memmap(os.path.join(meta_dir, "doc_len.bin"),
                                    np.int64, mode="r")
                self._lang_codes = np.memmap(
                    os.path.join(meta_dir, "lang_codes.bin"), np.int32, mode="r")
            self._lang_docs = None  # dense: allowed = flatnonzero(code match)
            self._lang_plus1 = True
        else:
            doc_len = state["doc_len"]
            self._lang_docs = state["doc_ids"]
            self._lang_codes = state["lang_codes"]
            self._lang_plus1 = False
        self.stats = Stats(n_docs=state["n_docs"],
                           total_tokens=state["total_tokens"],
                           doc_len=doc_len)
        self._lang_uniq = {v: i for i, v in enumerate(state["lang_uniq"])}
        self._lang_cache: dict[str, np.ndarray] = {}
        from collections import OrderedDict

        self._post_cache: "OrderedDict[str, Posting]" = OrderedDict()
        self._post_cache_bytes = 0
        self._post_cache_budget = (
            int(os.environ.get("RAYINDEX_POSTING_CACHE_MB", "128")) << 20)

    def prefault(self) -> int:
        """Fault every page of the local shard blobs (and doc-meta bins)
        into this process's page tables — the Lucene
        ``MMapDirectory.setPreload`` startup warm.  A serving fleet calls
        this once per replica before taking traffic so first-touch page
        faults (disk readahead + PTE population) never land inside a
        query; on this host the lazy-VM fault tax is ~0.1 ms/page, so a
        cold hot-term phrase query would otherwise stall for seconds.
        No-op for remote (byte-range) blobs.  Returns bytes touched."""
        touched = 0
        sink = np.int64(0)
        for buf in self._files:
            if isinstance(buf, mmap.mmap) and len(buf):
                if hasattr(buf, "madvise"):
                    buf.madvise(mmap.MADV_WILLNEED)
                arr = np.frombuffer(buf, np.uint8)
                sink += int(arr[::4096].sum()) + int(arr[-1])
                touched += arr.nbytes
        for m in (self.stats.doc_len, self._lang_codes):
            if isinstance(m, np.memmap) and m.size:
                v = m.view(np.uint8)
                sink += int(v[::4096].astype(np.int64).sum())
                touched += v.nbytes
        self._prefault_sink = int(sink)  # defeat dead-code elimination
        return touched

    def allowed_for_lang(self, lang: str) -> np.ndarray:
        """Doc set for a metadata filter (the reference's date2doc analog,
        /root/reference/indexing/index_builder/index_build.py:94-99)."""
        hit = self._lang_cache.get(lang)
        if hit is None:
            code = self._lang_uniq.get(lang, -1)
            if self._lang_docs is None:
                # dense doc-indexed codes (stored +1, 0 = absent doc);
                # an unknown lang (code -1) must NOT match the holes
                if code < 0:
                    hit = np.zeros(0, np.int64)
                else:
                    lc = self._lang_codes
                    codes = (lc.read_span(0, len(lc))
                             if isinstance(lc, _RangedBinArray)
                             else np.asarray(lc))
                    # remote: a lang filter inherently scans every doc's
                    # code once (4 B/doc ranged read); the resulting doc
                    # set is cached per lang below
                    hit = np.flatnonzero(codes == code + 1).astype(np.int64)
            else:
                hit = np.sort(
                    self._lang_docs[self._lang_codes == code]).astype(np.int64)
            self._lang_cache[lang] = hit
        return hit

    @property
    def n_terms(self) -> int:
        return sum(int(d["term_offs"].size - 1) for d in self._dicts)

    def _find(self, term: str) -> tuple[int, int] | None:
        from rayindex.build import term_shard

        if not self._num_shards_total:
            return None
        slot = self._slot_of.get(term_shard(term, self._num_shards_total))
        if slot is None:
            return None
        row = _find_row(self._dicts[slot], term.encode())
        return None if row is None else (slot, row)

    def contains(self, term: str) -> bool:
        return self._find(term) is not None

    def iter_terms(self):
        """Yield (term, cf) over the whole vocabulary (spellcheck dict).
        Decodes each shard's term bytes through ONE Arrow array build
        (C-speed) instead of a per-row Python slice+decode loop."""
        for d in self._dicts:
            offs, data, cf = d["term_offs"], d["term_data"], d["cf"]
            n = offs.size - 1
            if n <= 0:
                continue
            terms = pa.Array.from_buffers(
                pa.large_utf8(), n,
                [None, pa.py_buffer(np.ascontiguousarray(offs)),
                 pa.py_buffer(np.ascontiguousarray(data))]).to_pylist()
            yield from zip(terms, (int(c) for c in cf))

    def _blocks(self, d: dict, name: str, row: int) -> np.ndarray:
        off = d[f"{name}_off"]
        return d[f"{name}_val"][off[row] : off[row + 1]]

    def lookup(self, term: str, need_positions: bool) -> Posting | None:
        """Full posting decode.  Positionless results are served from a
        bounded per-reader LRU (``$RAYINDEX_POSTING_CACHE_MB``, default
        128): real query streams repeat hot terms constantly, and a hot
        term's (docs, tfs) decode is the whole cost of a TAAT term query.
        Cached Postings are shared — callers treat them as immutable
        (every scoring path already does)."""
        if not need_positions:
            cached = self._post_cache.get(term)
            if cached is not None:
                self._post_cache.move_to_end(term)
                return cached
        hit = self._find(term)
        if hit is None:
            return None
        sid, row = hit
        d = self._dicts[sid]
        buf = self._files[sid]
        doc_blob = buf[d["doc_off"][row] : d["doc_off"][row] + d["doc_len"][row]]
        tf_blob = buf[d["tf_off"][row] : d["tf_off"][row] + d["tf_len"][row]]
        # delta chains restart (absolute value) at every block start
        block_n = np.asarray(self._blocks(d, "block_n", row), np.int64)
        docs = codec.segmented_delta_decode(codec.vb_decode(doc_blob), block_n)
        tfs = codec.vb_decode(tf_blob).astype(np.int64)
        positions = None
        if need_positions:
            pos_blob = buf[d["pos_off"][row] : d["pos_off"][row] + d["pos_len"][row]]
            positions = codec.decode_positions(pos_blob, tfs)
        df_override = None
        live = _live_mask(docs, self._deleted)
        if live is not None:
            # tombstoned docs masked out; df stays the dict's pre-delete
            # value (stale-stats-until-compact — WAND reads the same df)
            df_override = int(d["df"][row])
            if positions is not None:
                starts = np.cumsum(tfs) - tfs
                sel = np.flatnonzero(live)
                lens = tfs[sel]
                base = np.cumsum(lens) - lens
                take = np.arange(int(lens.sum()), dtype=np.int64)
                take += np.repeat(starts[sel] - base, lens)
                positions = positions[take]
            docs, tfs = docs[live], tfs[live]
        p = Posting(
            docs=docs,
            tfs=tfs,
            positions=positions,
            df_override=df_override,
            block_last=np.asarray(self._blocks(d, "block_last", row), np.int64),
            block_max_tf=np.asarray(self._blocks(d, "block_max_tf", row), np.int64),
            block_min_dl=np.asarray(self._blocks(d, "block_min_dl", row), np.int64),
        )
        if not need_positions and self._post_cache_budget > 0:
            nbytes = docs.nbytes + tfs.nbytes
            self._post_cache[term] = p
            self._post_cache_bytes += nbytes
            while self._post_cache_bytes > self._post_cache_budget and self._post_cache:
                _, old = self._post_cache.popitem(last=False)
                self._post_cache_bytes -= old.docs.nbytes + old.tfs.nbytes
        return p

    def lookup_lazy(self, term: str) -> LazyPosting | None:
        """Zero-decode handle for block-at-a-time access (WAND, positional
        subset fetch) — only dict metadata is touched here."""
        hit = self._find(term)
        if hit is None:
            return None
        sid, row = hit
        d = self._dicts[sid]
        lp = LazyPosting()
        lp.df = int(d["df"][row])
        lp.cf = int(d["cf"][row])
        lp.max_tf = int(d["max_tf"][row])
        lp.block_first = np.asarray(self._blocks(d, "block_first", row), np.int64)
        lp.block_last = np.asarray(self._blocks(d, "block_last", row), np.int64)
        lp.block_n = np.asarray(self._blocks(d, "block_n", row), np.int64)
        lp.block_max_tf = np.asarray(self._blocks(d, "block_max_tf", row), np.int64)
        lp.block_min_dl = np.asarray(self._blocks(d, "block_min_dl", row), np.int64)
        lp._buf = self._files[sid]
        lp._doc_off = int(d["doc_off"][row])
        lp._doc_len = int(d["doc_len"][row])
        lp._tf_off = int(d["tf_off"][row])
        lp._tf_len = int(d["tf_len"][row])
        lp._pos_off = int(d["pos_off"][row])
        lp._pos_len = int(d["pos_len"][row])
        lp._boff_doc = self._blocks(d, "block_doc_boff", row)
        lp._boff_tf = self._blocks(d, "block_tf_boff", row)
        lp._boff_pos = self._blocks(d, "block_pos_boff", row)
        lp.deleted = self._deleted
        return lp

    def fetch_positions(self, term: str, docs: np.ndarray) -> Posting | None:
        """Postings restricted to ``docs``, with positions — decoding ONLY
        the blocks that contain candidate docs (phrase/proximity queries
        over rare-∩-hot term pairs skip the hot term's posting mass)."""
        lp = self.lookup_lazy(term)
        if lp is None:
            return None
        docs = np.asarray(docs, np.int64)
        live = _live_mask(docs, self._deleted)
        if live is not None:
            docs = docs[live]
        empty = np.zeros(0, np.int64)
        if docs.size == 0 or lp.n_blocks == 0:
            return Posting(docs=empty, tfs=empty.copy(), positions=empty.copy())
        bsel = np.unique(np.searchsorted(lp.block_last, docs, side="left"))
        bsel = bsel[bsel < lp.n_blocks]
        if bsel.size == 0:
            return Posting(docs=empty, tfs=empty.copy(), positions=empty.copy())
        # gather the selected blocks' byte ranges (cheap slice loop), then
        # decode everything in ONE vectorized pass per stream
        buf = lp._buf

        def spans(boff: np.ndarray, base: int, total: int) -> list[tuple[int, int]]:
            ends = np.append(boff[1:], total)
            return [(base + int(boff[b]), base + int(ends[b])) for b in bsel]

        doc_bytes = b"".join(buf[s:e] for s, e in
                             spans(lp._boff_doc, lp._doc_off, lp._doc_len))
        tf_bytes = b"".join(buf[s:e] for s, e in
                            spans(lp._boff_tf, lp._tf_off, lp._tf_len))
        bn = lp.block_n[bsel]
        docs_all = codec.segmented_delta_decode(codec.vb_decode(doc_bytes), bn)
        tfs_all = codec.vb_decode(tf_bytes).astype(np.int64)
        mask = np.isin(docs_all, docs, assume_unique=True)
        sel = np.flatnonzero(mask)
        if sel.size == 0:
            return Posting(docs=empty, tfs=empty.copy(), positions=empty.copy())
        pos_bytes = b"".join(buf[s:e] for s, e in
                             spans(lp._boff_pos, lp._pos_off, lp._pos_len))
        pos_all = codec.decode_positions(pos_bytes, tfs_all)
        if sel.size == docs_all.size:
            # every decoded doc is a candidate (hot term, broad candidate
            # set) — skip the O(total positions) subset gather
            return Posting(docs=docs_all, tfs=tfs_all, positions=pos_all)
        starts = np.cumsum(tfs_all) - tfs_all
        lens = tfs_all[sel]
        base = np.cumsum(lens) - lens
        # single repeat + in-place add: the gather index is arange shifted
        # by each selected doc's (source start - dest start)
        take = np.arange(int(lens.sum()), dtype=np.int64)
        take += np.repeat(starts[sel] - base, lens)
        return Posting(docs=docs_all[sel], tfs=lens, positions=pos_all[take])

    def fetch_positions_many(self, term_docs) -> list["Posting | None"]:
        """Sequential local counterpart of the pool's batched positional
        fetch (same signature, so snippet/phrase helpers take either)."""
        return [self.fetch_positions(t, d) for t, d in term_docs]

    # -- convenience --------------------------------------------------------

    def search(self, query: str, k: int | None = None,
               search_cfg: SearchConfig | None = None,
               analyzer: AnalyzerConfig | None = None,
               scorer: str | None = None,
               lang: str | None = None) -> list[tuple[int, float]]:
        cfg = search_cfg or SearchConfig()
        allowed = None
        if lang is not None:
            allowed = self.allowed_for_lang(lang)
            if allowed.size == 0:
                return []
        q = parse_query(query, analyzer or AnalyzerConfig())
        docs, scores = search_parsed(self, q, self.stats, cfg, k=k, scorer=scorer,
                                     allowed=allowed)
        return list(zip(docs.tolist(), scores.tolist()))


def build_shared_state(index_dir: str):
    """Load the index's dictionaries/stats ONCE and ``ray.put`` them:
    searcher actors attach zero-copy (the state is all numpy arrays) —
    N actors on a node share ONE plasma copy of the vocab + doc tables
    instead of each parsing every dict parquet in ``__init__``."""
    import ray

    return ray.put(IndexReader.load_state(index_dir))


class Searcher:
    """Actor-pool callable for batch query evaluation:
    ``queries_ds.map_batches(Searcher, fn_constructor_kwargs=..., concurrency=N)``.

    State (term dicts, mmaps, stats) loads once per actor in ``__init__``
    — or attaches zero-copy when ``shared_state`` (a ``build_shared_state``
    ObjectRef) is passed; each ``__call__`` scores a batch of query rows
    and emits result rows (query_id, rank, doc_id, score).
    """

    def __init__(self, index_dir: str,
                 search_cfg: SearchConfig | None = None,
                 analyzer: AnalyzerConfig | None = None,
                 shared_state=None):
        if shared_state is not None:
            import ray

            if isinstance(shared_state, ray.ObjectRef):
                shared_state = ray.get(shared_state)
        self.reader = IndexReader(index_dir, shared_state=shared_state)
        self.cfg = search_cfg or SearchConfig()
        self.analyzer = analyzer or AnalyzerConfig()

    def prefault(self) -> int:
        """Startup page warm (see ``IndexReader.prefault``)."""
        return self.reader.prefault()

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs_out, scores_out = [], [], [], []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else [None] * batch.num_rows
        langs = (batch["lang"].to_pylist() if "lang" in batch.column_names
                 else [None] * batch.num_rows)
        for qid, qtext, k, lang in zip(batch["query_id"].to_pylist(),
                                       batch["query"].to_pylist(), ks, langs):
            allowed = self.reader.allowed_for_lang(lang) if lang else None
            q = parse_query(qtext, self.analyzer)
            docs, scores = search_parsed(self.reader, q, self.reader.stats,
                                         self.cfg, k=int(k) if k else None,
                                         allowed=allowed)
            n = docs.size
            qids.extend([qid] * n)
            ranks.extend(range(1, n + 1))
            docs_out.extend(docs.tolist())
            scores_out.extend(scores.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs_out, pa.int64()),
                "score": pa.array(scores_out, pa.float64()),
            },
            schema=schema.RESULTS,
        )


def search_dataset(queries, index_dir: str,
                   search_cfg: SearchConfig | None = None,
                   analyzer: AnalyzerConfig | None = None,
                   concurrency: int = 4, batch_size: int = 64,
                   shared_state=None):
    """Evaluate a query Dataset against the index with a searcher actor pool.

    The index dictionaries are loaded ONCE on the driver and broadcast
    through the object store (``build_shared_state``) — each actor attaches
    zero-copy instead of parsing every dict parquet itself.  Pass an
    existing ``shared_state`` ref to reuse across calls."""
    import ray.data

    if isinstance(queries, pa.Table):
        queries = ray.data.from_arrow(queries)
    if shared_state is None:
        shared_state = build_shared_state(index_dir)
    # a single-block query table would feed only ONE actor — split it so
    # the whole pool draws work
    queries = queries.repartition(concurrency * 4)
    return queries.map_batches(
        Searcher,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "search_cfg": search_cfg,
            "analyzer": analyzer,
            "shared_state": shared_state,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscaling (min=1): a fixed pool can claim every CPU of a small
        # session and starve upstream task pools
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class _ShardActor:
    """Actor body: owns a disjoint shard subset's dictionaries + blobs,
    plus the (mmap'd / ranged) doc-meta bins — enough state to score any
    query whose terms all live in its subset."""

    def __init__(self, index_dir: str, shard_ids: list[int]):
        self.r = IndexReader(index_dir, shard_subset=set(shard_ids))

    def postings(self, term: str, need_positions: bool):
        p = self.r.lookup(term, need_positions)
        return None if p is None else (p.docs, p.tfs, p.positions)

    def postings_many(self, terms: list[str], need_positions: bool) -> list:
        """One message for ALL of a query's terms on this owner (the
        per-term round trips were the pool's latency floor)."""
        return [self.postings(t, need_positions) for t in terms]

    def rank_partials(self, terms: list[str], scorer: str,
                      cfg: SearchConfig) -> list:
        """Per-term (docs, w) PARTIAL SCORES for additive scorers: the
        doc-length gather and the weight kernel run here, next to the
        postings; the wire carries one float per posting instead of
        (tfs + a driver-side doc_len dependency).  Weight kernels are
        elementwise, so driver-side accumulation over any candidate set
        is bit-identical to local scoring (scoring.rank_singles_pre)."""
        from rayindex.scoring import w_bm25, w_reference

        weight_fn = w_reference if scorer == "reference" else w_bm25
        out = []
        for t in terms:
            p = self.r.lookup(t, need_positions=False)
            if p is None:
                out.append(None)
                continue
            dls = np.asarray(self.r.stats.doc_len[p.docs], np.float64)
            w = weight_fn(p.tfs.astype(np.float64), dls, p.df,
                          self.r.stats, cfg)
            out.append((p.docs, w))
        return out

    def positions_for(self, term: str, docs: np.ndarray):
        p = self.r.fetch_positions(term, docs)
        return None if p is None else (p.docs, p.tfs, p.positions)

    def positions_for_many(self, term_docs: list) -> list:
        return [self.positions_for(t, d) for t, d in term_docs]

    def contains(self, term: str) -> bool:
        return self.r.contains(term)

    def search_local(self, query: str, k, cfg, analyzer, scorer, lang):
        """Full query evaluation on this owner — valid whenever EVERY term
        of the query routes to this actor's shard subset (then its reader
        sees exactly the postings the full reader would).  Returns top-k
        (docs, scores): per-query transport is k rows, not postings."""
        return self.r.search(query, k=k, search_cfg=cfg, analyzer=analyzer,
                             scorer=scorer, lang=lang)


class ShardedSearchPool(MiniIndexProvider):
    """Distributed index memory: ``num_actors`` Ray actors each own a
    disjoint subset of the shards (``crc32(term) % num_shards`` routes
    every term to exactly one owner — the partitioning key baked into the
    artifact layout), the driver scatters per-term posting fetches to the
    owners and runs the scoring kernels locally.  Results are identical
    to the single-reader path BY CONSTRUCTION for every query kind,
    because only posting transport is distributed, never scoring
    semantics.  This is the multi-node serving shape: no actor holds more
    than its shards' dictionaries (the round-1 every-actor-loads-
    everything scale ceiling), and adding actors shrinks per-actor memory
    linearly.  On a real cluster the per-term fetch for hot terms would
    additionally push partial TAAT scoring into the owners; the transport
    here ships decoded numpy arrays through the object store (zero-copy
    reads)."""

    def __init__(self, index_dir: str, num_actors: int = 2,
                 num_cpus: float = 1.0):
        import ray

        from rayindex.build import term_shard

        self._term_shard = term_shard
        fs = _fs_of(index_dir)
        if fs is not None:
            paths = sorted(fs.glob(_strip(index_dir) + "/shards/*.dict.parquet"))
        else:
            paths = sorted(glob.glob(os.path.join(index_dir, "shards", "*.dict.parquet")))
        shard_ids = [_shard_id_of(p) for p in paths]
        self.num_shards = len(shard_ids)
        num_actors = max(1, min(num_actors, self.num_shards))
        parts: list[list[int]] = [[] for _ in range(num_actors)]
        for i, sid in enumerate(shard_ids):
            parts[i % num_actors].append(sid)
        actor_cls = ray.remote(num_cpus=num_cpus)(_ShardActor)
        self.actors = [actor_cls.remote(index_dir, ids) for ids in parts]
        self._owner_i: dict[int, int] = {}
        for ai, ids in enumerate(parts):
            for sid in ids:
                self._owner_i[sid] = ai
        # doc metadata: NEVER materialized driver-side — the doc-meta bins
        # are mmap'd locally / byte-ranged on object storage, exactly like
        # the shard owners' readers (pre-bin indexes fall back to parquet)
        if fs is not None:
            stats_root = _strip(index_dir) + "/stats"
            has_bins = fs.exists(stats_root + "/doc_len.bin")
        else:
            stats_root = os.path.join(index_dir, "stats")
            has_bins = os.path.exists(os.path.join(stats_root, "doc_len.bin"))
        if has_bins:
            import json

            if fs is not None:
                cs = _read_parquet(
                    fs, stats_root + "/collection_stats.parquet").to_pylist()[0]
                with fs.open(stats_root + "/lang_vocab.json") as f:
                    lang_uniq = json.load(f)
                doc_len = _RangedBinArray(fs, stats_root + "/doc_len.bin",
                                          np.int64)
                self._lang_codes = _RangedBinArray(
                    fs, stats_root + "/lang_codes.bin", np.int32)
            else:
                cs = pq.read_table(os.path.join(
                    stats_root, "collection_stats.parquet")).to_pylist()[0]
                with open(os.path.join(stats_root, "lang_vocab.json")) as f:
                    lang_uniq = json.load(f)
                doc_len = np.memmap(os.path.join(stats_root, "doc_len.bin"),
                                    np.int64, mode="r")
                self._lang_codes = np.memmap(
                    os.path.join(stats_root, "lang_codes.bin"), np.int32,
                    mode="r")
            self._lang_docs = None
            self._lang_uniq = {v: i for i, v in enumerate(lang_uniq)}
        else:  # pre-bin index fallback
            cs, ds_t = _load_docmeta(fs, index_dir)
            doc_ids = ds_t["doc_id"].to_numpy()
            doc_len = np.zeros(int(doc_ids.max()) + 1 if len(doc_ids) else 1,
                               np.int64)
            doc_len[doc_ids] = ds_t["n_tokens"].to_numpy()
            self._lang_docs = doc_ids
            enc = ds_t["lang"].combine_chunks().dictionary_encode()
            self._lang_fallback_codes = enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int32)
            self._lang_uniq = {v: i for i, v in
                               enumerate(enc.dictionary.to_pylist())}
        self.stats = Stats(n_docs=cs["n_docs"], total_tokens=cs["total_tokens"],
                           doc_len=doc_len)
        self._lang_cache: dict[str, np.ndarray] = {}
        # per-search posting cache, filled by one batched scatter per query
        self._qcache: dict[tuple[str, bool], Posting | None] = {}
        # observability for transport-shape tests: rows shipped per path
        self.metrics = {"delegated": 0, "partial_terms": 0,
                        "posting_terms": 0, "posting_rows": 0}

    def _actor_of(self, term: str):
        return self.actors[self._owner_i[self._term_shard(term, self.num_shards)]]

    @staticmethod
    def _posting(res) -> Posting | None:
        return None if res is None else Posting(docs=res[0], tfs=res[1],
                                                positions=res[2])

    def prefetch(self, terms: list[str], need_positions: bool) -> None:
        """ONE scatter for all of a query's terms: group by owner, one
        ``postings_many`` round per owner in parallel (the old per-term
        blocking ``ray.get`` serialized a round trip per term)."""
        import ray

        todo: dict[int, list[str]] = {}
        for t in dict.fromkeys(terms):
            if (t, need_positions) not in self._qcache:
                todo.setdefault(
                    self._owner_i[self._term_shard(t, self.num_shards)],
                    []).append(t)
        if not todo:
            return
        refs = [(ts, self.actors[ai].postings_many.remote(ts, need_positions))
                for ai, ts in todo.items()]
        for ts, ref in refs:
            for t, res in zip(ts, ray.get(ref)):
                p = self._posting(res)
                self._qcache[(t, need_positions)] = p
                if p is not None:
                    self.metrics["posting_terms"] += 1
                    self.metrics["posting_rows"] += int(p.docs.size)

    def lookup(self, term: str, need_positions: bool) -> Posting | None:
        import ray

        key = (term, need_positions)
        if key in self._qcache:
            return self._qcache[key]
        if not need_positions and (term, True) in self._qcache:
            return self._qcache[(term, True)]
        p = self._posting(ray.get(
            self._actor_of(term).postings.remote(term, need_positions)))
        self._qcache[key] = p
        if p is not None:
            self.metrics["posting_terms"] += 1
            self.metrics["posting_rows"] += int(p.docs.size)
        return p

    def contains(self, term: str) -> bool:
        import ray

        for key in ((term, False), (term, True)):
            if key in self._qcache:
                return self._qcache[key] is not None
        return ray.get(self._actor_of(term).contains.remote(term))

    def fetch_positions(self, term: str, docs: np.ndarray) -> Posting | None:
        import ray

        return self._posting(ray.get(self._actor_of(term).positions_for.remote(
            term, np.asarray(docs, np.int64))))

    def fetch_positions_many(self, term_docs) -> list[Posting | None]:
        """Batched positional fetch: one round per owner, in parallel."""
        import ray

        groups: dict[int, list[int]] = {}
        for i, (t, _) in enumerate(term_docs):
            groups.setdefault(
                self._owner_i[self._term_shard(t, self.num_shards)],
                []).append(i)
        out: list = [None] * len(term_docs)
        refs = [(idxs, self.actors[ai].positions_for_many.remote(
                    [(term_docs[i][0], np.asarray(term_docs[i][1], np.int64))
                     for i in idxs]))
                for ai, idxs in groups.items()]
        for idxs, ref in refs:
            for i, res in zip(idxs, ray.get(ref)):
                out[i] = self._posting(res)
        return out

    def allowed_for_lang(self, lang: str) -> np.ndarray:
        hit = self._lang_cache.get(lang)
        if hit is None:
            code = self._lang_uniq.get(lang, -1)
            if self._lang_docs is None:
                if code < 0:
                    hit = np.zeros(0, np.int64)
                else:
                    lc = self._lang_codes
                    codes = (lc.read_span(0, len(lc))
                             if isinstance(lc, _RangedBinArray)
                             else np.asarray(lc))
                    hit = np.flatnonzero(codes == code + 1).astype(np.int64)
            else:
                hit = np.sort(self._lang_docs[
                    self._lang_fallback_codes == code]).astype(np.int64)
            self._lang_cache[lang] = hit
        return hit

    def search(self, query: str, k: int | None = None,
               search_cfg: SearchConfig | None = None,
               analyzer: AnalyzerConfig | None = None,
               scorer: str | None = None,
               lang: str | None = None) -> list[tuple[int, float]]:
        import ray

        from rayindex.query import TermsQuery
        from rayindex.scoring import query_terms, rank_singles_pre

        cfg = search_cfg or SearchConfig()
        analyzer = analyzer or AnalyzerConfig()
        eff_scorer = scorer or cfg.scorer
        q = parse_query(query, analyzer)
        terms = query_terms(q)
        owners = {self._owner_i[self._term_shard(t, self.num_shards)]
                  for t in terms}
        self._qcache = {}
        if len(owners) == 1:
            # every term lives on one owner → ship the QUERY to the data:
            # full evaluation there, k result rows back (covers every
            # single-term query, however hot the term)
            self.metrics["delegated"] += 1
            ai = next(iter(owners))
            return ray.get(self.actors[ai].search_local.remote(
                query, k, search_cfg, analyzer, scorer, lang))
        allowed = None
        if lang is not None:
            allowed = self.allowed_for_lang(lang)
            if allowed.size == 0:
                return []
        if (isinstance(q, TermsQuery) and eff_scorer in ("bm25", "reference")
                and all(len(p) == 1 for p in q.parts if p)):
            # multi-owner additive rank query: owners compute per-term
            # (docs, w) partials in ONE parallel round; the driver merges —
            # bit-identical to local TAAT (elementwise weight kernels),
            # with no tfs / doc-length transport
            singles = [p[0] for p in q.parts if p]
            todo: dict[int, list[str]] = {}
            for t in dict.fromkeys(singles):
                todo.setdefault(
                    self._owner_i[self._term_shard(t, self.num_shards)],
                    []).append(t)
            refs = [(ts, self.actors[ai].rank_partials.remote(
                        ts, eff_scorer, cfg))
                    for ai, ts in todo.items()]
            pw: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for ts, ref in refs:
                for t, res in zip(ts, ray.get(ref)):
                    if res is not None:
                        pw[t] = res
            self.metrics["partial_terms"] += len(pw)
            r = rank_singles_pre(pw, eff_scorer, self.stats, cfg,
                                 allowed=allowed)
            if r is None:
                return []
            from rayindex.scoring import _top

            cap = cfg.top_k
            docs, scores = _top(r, min(k or cap, cap))
            return list(zip(docs.tolist(), scores.tolist()))
        # general path (phrases, boolean, proximity, lm/vsm): batch the
        # term fetches into one scatter, then run the standard kernels
        self.prefetch(terms, need_positions=False)
        docs, scores = search_parsed(self, q, self.stats, cfg, k=k,
                                     scorer=scorer, allowed=allowed)
        self._qcache = {}
        return list(zip(docs.tolist(), scores.tolist()))


def fetch_doc_metadata(index_dir: str, doc_ids: list[int]) -> pa.Table:
    """Top-k → doc-store join (the reference's Postgres in_bulk lookup,
    /root/reference/search/retrieval/retrieval_helpers/helpers.py:176-179):
    k is tiny, so this is a broadcast semi-join = parquet row filter."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    dset = pads.dataset(os.path.join(index_dir, "doc_store"))
    return dset.to_table(
        columns=["doc_id", "repo", "path", "commit", "lang"],
        filter=pc.field("doc_id").isin(doc_ids),
    )
