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


class LazyPosting:
    """Block-addressable postings of one term: nothing is decoded up front.
    Dict blocks store their absolute first doc + per-stream byte offsets,
    so any single block decodes standalone — block-max WAND skips (and
    never touches) pruned blocks, and positional fetch decodes only the
    blocks containing candidate docs."""

    __slots__ = ("df", "cf", "max_tf", "block_first", "block_last", "block_n",
                 "block_max_tf", "block_min_dl", "_buf",
                 "_doc_off", "_doc_len", "_tf_off", "_tf_len",
                 "_pos_off", "_pos_len", "_boff_doc", "_boff_tf", "_boff_pos")

    @property
    def n_blocks(self) -> int:
        return self.block_last.size

    def _block_span(self, boff: np.ndarray, base: int, total: int, b: int
                    ) -> tuple[int, int]:
        s = base + int(boff[b])
        e = base + (int(boff[b + 1]) if b + 1 < boff.size else total)
        return s, e

    def block_docs_tfs(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        s, e = self._block_span(self._boff_doc, self._doc_off, self._doc_len, b)
        docs = codec.delta_decode(codec.vb_decode(self._buf[s:e]))
        s, e = self._block_span(self._boff_tf, self._tf_off, self._tf_len, b)
        tfs = codec.vb_decode(self._buf[s:e]).astype(np.int64)
        return docs, tfs

    def block_positions(self, b: int, tfs: np.ndarray) -> np.ndarray:
        s, e = self._block_span(self._boff_pos, self._pos_off, self._pos_len, b)
        return codec.decode_positions(self._buf[s:e], tfs)

    def decode_blocks(self, bsel: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Decode several blocks in ONE vectorized pass (per-block
        vb_decode overhead dominates when many small blocks are needed).
        Returns (docs, tfs, starts, counts): block ``bsel[i]``'s run is
        ``docs[starts[i] : starts[i] + counts[i]]``."""
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


def _shard_id_of(path: str) -> int:
    name = os.path.basename(path)
    return int(name.split("_")[1].split(".")[0])


class IndexReader(MiniIndexProvider):
    """Loads one build's artifacts; serves per-term postings zero-copy from
    a local mmap, or by byte-range reads when ``index_dir`` is a URI
    (``file://``, ``s3://``, ... — anything fsspec resolves): the index on
    object storage is queryable without downloading the blobs.

    ``shard_subset`` restricts the reader to the given shard ids (the
    sharded-actor ownership split: each actor owns ``crc32(term) %
    num_shards`` subsets and out-of-subset terms simply miss)."""

    _BLOCK_COLS = ("block_first", "block_last", "block_n", "block_max_tf",
                   "block_min_dl", "block_doc_boff", "block_tf_boff",
                   "block_pos_boff")

    def __init__(self, index_dir: str, shard_subset: set[int] | None = None):
        self.index_dir = index_dir
        self._remote = "://" in index_dir
        if self._remote:
            import fsspec

            self._fs, root = fsspec.core.url_to_fs(index_dir)
            shard_dir = root.rstrip("/") + "/shards"
            dict_paths = sorted(self._fs.glob(shard_dir + "/*.dict.parquet"))
        else:
            self._fs = None
            shard_dir = os.path.join(index_dir, "shards")
            dict_paths = sorted(glob.glob(os.path.join(shard_dir, "*.dict.parquet")))
        if shard_subset is not None:
            dict_paths = [p for p in dict_paths if _shard_id_of(p) in shard_subset]
        self.shard_ids = [_shard_id_of(p) for p in dict_paths]
        self._files: list[mmap.mmap | bytes | _RangedBlob] = []
        self._lookup: dict[str, tuple[int, int]] = {}  # term -> (slot, row)
        self._dicts: list[dict[str, np.ndarray]] = []
        for sid, dict_path in enumerate(dict_paths):
            t = self._read_parquet(dict_path)
            cols = {
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
            # flatten the ragged block-metadata lists ONCE (offsets+values);
            # per-lookup .as_py() conversion is 100x slower for hot terms
            for name in self._BLOCK_COLS:
                arr = t[name].combine_chunks()
                cols[f"{name}_off"] = arr.offsets.to_numpy()
                cols[f"{name}_val"] = arr.values.to_numpy()
            self._dicts.append(cols)
            for row, term in enumerate(t["term"].to_pylist()):
                self._lookup[term] = (sid, row)
            bin_path = dict_path.replace(".dict.parquet", ".bin")
            if self._remote:
                size = self._fs.size(bin_path)
                self._files.append(_RangedBlob(self._fs, bin_path, size)
                                   if size else b"")
            else:
                size = os.path.getsize(bin_path)
                if size:
                    f = open(bin_path, "rb")
                    self._files.append(mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ))
                else:
                    self._files.append(b"")
        if self._remote:
            stats_dir = index_dir.rstrip("/") + "/stats"
            cs = self._read_parquet(
                self._strip(stats_dir) + "/collection_stats.parquet").to_pylist()[0]
            ds_t = self._read_parquet_dir(
                self._strip(stats_dir) + "/doc_stats",
                columns=["doc_id", "n_tokens", "lang"])
        else:
            stats_dir = os.path.join(index_dir, "stats")
            cs = pq.read_table(os.path.join(stats_dir, "collection_stats.parquet")).to_pylist()[0]
            ds_t = pq.read_table(os.path.join(stats_dir, "doc_stats"),
                                 columns=["doc_id", "n_tokens", "lang"])
        doc_ids = ds_t["doc_id"].to_numpy()
        doc_len = np.zeros(int(doc_ids.max()) + 1 if len(doc_ids) else 1, np.int64)
        doc_len[doc_ids] = ds_t["n_tokens"].to_numpy()
        self.stats = Stats(
            n_docs=cs["n_docs"], total_tokens=cs["total_tokens"], doc_len=doc_len
        )
        self._doc_ids_sorted = np.sort(doc_ids)
        # columnar lang table (arrays, not a per-doc python dict)
        self._lang_docs = doc_ids
        self._lang_vals = np.asarray(ds_t["lang"].to_pylist(), object)
        self._lang_cache: dict[str, np.ndarray] = {}

    def _strip(self, uri: str) -> str:
        import fsspec

        return fsspec.core.url_to_fs(uri)[1].rstrip("/")

    def _read_parquet(self, path: str, columns=None) -> pa.Table:
        if self._remote:
            with self._fs.open(path, "rb") as f:
                return pq.read_table(f, columns=columns)
        return pq.read_table(path, columns=columns)

    def _read_parquet_dir(self, root: str, columns=None) -> pa.Table:
        parts = sorted(self._fs.glob(root.rstrip("/") + "/*.parquet"))
        return pa.concat_tables([self._read_parquet(p, columns) for p in parts])

    def allowed_for_lang(self, lang: str) -> np.ndarray:
        """Doc set for a metadata filter (the reference's date2doc analog,
        /root/reference/indexing/index_builder/index_build.py:94-99)."""
        hit = self._lang_cache.get(lang)
        if hit is None:
            hit = np.sort(self._lang_docs[self._lang_vals == lang]).astype(np.int64)
            self._lang_cache[lang] = hit
        return hit

    @property
    def n_terms(self) -> int:
        return len(self._lookup)

    def contains(self, term: str) -> bool:
        return term in self._lookup

    def _blocks(self, d: dict, name: str, row: int) -> np.ndarray:
        off = d[f"{name}_off"]
        return d[f"{name}_val"][off[row] : off[row + 1]]

    def lookup(self, term: str, need_positions: bool) -> Posting | None:
        hit = self._lookup.get(term)
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
        return Posting(
            docs=docs,
            tfs=tfs,
            positions=positions,
            block_last=np.asarray(self._blocks(d, "block_last", row), np.int64),
            block_max_tf=np.asarray(self._blocks(d, "block_max_tf", row), np.int64),
            block_min_dl=np.asarray(self._blocks(d, "block_min_dl", row), np.int64),
        )

    def lookup_lazy(self, term: str) -> LazyPosting | None:
        """Zero-decode handle for block-at-a-time access (WAND, positional
        subset fetch) — only dict metadata is touched here."""
        hit = self._lookup.get(term)
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
        return lp

    def fetch_positions(self, term: str, docs: np.ndarray) -> Posting | None:
        """Postings restricted to ``docs``, with positions — decoding ONLY
        the blocks that contain candidate docs (phrase/proximity queries
        over rare-∩-hot term pairs skip the hot term's posting mass)."""
        lp = self.lookup_lazy(term)
        if lp is None:
            return None
        docs = np.asarray(docs, np.int64)
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
        take = (np.repeat(starts[sel], lens)
                + np.arange(int(lens.sum())) - np.repeat(base, lens))
        return Posting(docs=docs_all[sel], tfs=lens, positions=pos_all[take])

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


class Searcher:
    """Actor-pool callable for batch query evaluation:
    ``queries_ds.map_batches(Searcher, fn_constructor_kwargs=..., concurrency=N)``.

    State (term dicts, mmaps, stats) loads once per actor in ``__init__``;
    each ``__call__`` scores a batch of query rows and emits result rows
    (query_id, rank, doc_id, score).
    """

    def __init__(self, index_dir: str,
                 search_cfg: SearchConfig | None = None,
                 analyzer: AnalyzerConfig | None = None):
        self.reader = IndexReader(index_dir)
        self.cfg = search_cfg or SearchConfig()
        self.analyzer = analyzer or AnalyzerConfig()

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
                   concurrency: int = 4, batch_size: int = 64):
    """Evaluate a query Dataset against the index with a searcher actor pool."""
    import ray.data

    if isinstance(queries, pa.Table):
        queries = ray.data.from_arrow(queries)
    # a single-block query table would feed only ONE actor — split it so
    # the whole pool draws work
    queries = queries.repartition(concurrency * 4)
    return queries.map_batches(
        Searcher,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "search_cfg": search_cfg,
            "analyzer": analyzer,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class _ShardActor:
    """Actor body: owns a disjoint shard subset's dictionaries + blobs."""

    def __init__(self, index_dir: str, shard_ids: list[int]):
        self.r = IndexReader(index_dir, shard_subset=set(shard_ids))

    def postings(self, term: str, need_positions: bool):
        p = self.r.lookup(term, need_positions)
        return None if p is None else (p.docs, p.tfs, p.positions)

    def positions_for(self, term: str, docs: np.ndarray):
        p = self.r.fetch_positions(term, docs)
        return None if p is None else (p.docs, p.tfs, p.positions)

    def contains(self, term: str) -> bool:
        return self.r.contains(term)


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
        if "://" in index_dir:
            import fsspec

            fs, root = fsspec.core.url_to_fs(index_dir)
            paths = sorted(fs.glob(root.rstrip("/") + "/shards/*.dict.parquet"))
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
        self._owner: dict[int, Any] = {}
        for actor, ids in zip(self.actors, parts):
            for sid in ids:
                self._owner[sid] = actor
        # collection + doc metadata stay driver-side (small tables)
        probe = IndexReader.__new__(IndexReader)
        probe._remote = "://" in index_dir
        if probe._remote:
            import fsspec

            probe._fs = fsspec.core.url_to_fs(index_dir)[0]
        else:
            probe._fs = None
        if probe._remote:
            stats_root = probe._strip(index_dir) + "/stats"
            cs = probe._read_parquet(stats_root + "/collection_stats.parquet").to_pylist()[0]
            ds_t = probe._read_parquet_dir(stats_root + "/doc_stats",
                                           columns=["doc_id", "n_tokens", "lang"])
        else:
            stats_dir = os.path.join(index_dir, "stats")
            cs = pq.read_table(os.path.join(stats_dir, "collection_stats.parquet")).to_pylist()[0]
            ds_t = pq.read_table(os.path.join(stats_dir, "doc_stats"),
                                 columns=["doc_id", "n_tokens", "lang"])
        doc_ids = ds_t["doc_id"].to_numpy()
        doc_len = np.zeros(int(doc_ids.max()) + 1 if len(doc_ids) else 1, np.int64)
        doc_len[doc_ids] = ds_t["n_tokens"].to_numpy()
        self.stats = Stats(n_docs=cs["n_docs"], total_tokens=cs["total_tokens"],
                           doc_len=doc_len)
        self._lang_docs = doc_ids
        self._lang_vals = np.asarray(ds_t["lang"].to_pylist(), object)
        self._lang_cache: dict[str, np.ndarray] = {}

    def _actor(self, term: str):
        return self._owner[self._term_shard(term, self.num_shards)]

    def lookup(self, term: str, need_positions: bool) -> Posting | None:
        import ray

        res = ray.get(self._actor(term).postings.remote(term, need_positions))
        if res is None:
            return None
        return Posting(docs=res[0], tfs=res[1], positions=res[2])

    def contains(self, term: str) -> bool:
        import ray

        return ray.get(self._actor(term).contains.remote(term))

    def fetch_positions(self, term: str, docs: np.ndarray) -> Posting | None:
        import ray

        res = ray.get(self._actor(term).positions_for.remote(
            term, np.asarray(docs, np.int64)))
        if res is None:
            return None
        return Posting(docs=res[0], tfs=res[1], positions=res[2])

    def allowed_for_lang(self, lang: str) -> np.ndarray:
        hit = self._lang_cache.get(lang)
        if hit is None:
            hit = np.sort(self._lang_docs[self._lang_vals == lang]).astype(np.int64)
            self._lang_cache[lang] = hit
        return hit

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
