"""Query-time federation over several indexes — search a base index plus
delta indexes WITHOUT physically merging them.

This completes the incremental-ingest lifecycle: new documents land in a
small delta index (a fresh ``build_index`` over just the new rows),
deletes are tombstones (rayindex/delete.py), and queries federate over
[base, delta...] until a maintenance window runs ``merge``/``compact``.
The reference has no analog (it rebuilds and swaps the whole index,
/root/reference/indexing/main.py); Lucene-style segment searching is the
public prior art.

Identity contract (the gate in tests/test_federate.py):
``FederatedReader([A, B]).search(q) == IndexReader(merge(A, B)).search(q)``
— rank-identical with equal scores — because federation rebases doc ids
by the SAME cumulative doc-space offsets the offline merge uses
(merge._doc_space footers), and BM25/LM statistics are pure sums:
N = ΣN_i, l_tot = Σl_tot_i, df(t) = Σdf_i(t), cf(t) = Σcf_i(t), and a
term's federated posting list is the offset-rebased concatenation of its
sub-lists (doc ranges are disjoint and ascending in index order, so the
concatenation is already sorted).

Scale shape: a FederatedReader is dict-state only — sub-readers keep
their shards mmap'd / ranged; nothing is copied or re-encoded.  Inside a
``ShardedSearchPool`` actor each sub-index's shard subset federates the
same way (the pool passes the reader factory through).  Tombstones are
honored per sub-index (sub lookups mask deleted docs and keep the
pre-delete df, identical to the stale-stats-until-compact semantics of a
single index).
"""
from __future__ import annotations

import numpy as np

from rayindex.config import AnalyzerConfig, SearchConfig
from rayindex.scoring import MiniIndexProvider, Posting, Stats


class _FederatedDocLen:
    """Lazy concat of per-index doc_len arrays: global id → (sub, local)
    routing on fancy indexing — sub arrays stay mmap'd, nothing is
    copied (a materialized concat would be O(doc space) driver memory)."""

    def __init__(self, arrays, offsets: np.ndarray):
        self.arrays = arrays
        self.offsets = offsets  # int64, one per sub-index (0-led)

    def __getitem__(self, idx):
        idx = np.asarray(idx, np.int64)
        scalar = idx.ndim == 0
        idx = np.atleast_1d(idx)
        sub = np.searchsorted(self.offsets, idx, side="left") - 1  # ids are
        # 1-based: sub i owns (off_i, off_{i+1}], so equal-to-offset
        # ids belong to the PREVIOUS sub-index
        out = np.zeros(idx.size, np.int64)
        for s in np.unique(sub):
            m = sub == s
            out[m] = np.asarray(self.arrays[s][idx[m] - self.offsets[s]])
        return out[0] if scalar else out


class _FederatedLazy:
    """Block-addressable view over the sub-indexes' LazyPostings: block
    metadata is the rebased concatenation, block decodes route to the
    owning sub-lazy — block-max WAND and candidate-restricted positional
    fetch work unchanged (scoring only consumes this interface)."""

    def __init__(self, lps, offsets):
        self._lps = lps            # [(sub_idx, LazyPosting)]
        self._off = offsets
        self.df = sum(lp.df for _, lp in lps)
        self.cf = sum(lp.cf for _, lp in lps)
        self.max_tf = max(lp.max_tf for _, lp in lps)
        self.block_first = np.concatenate(
            [lp.block_first + offsets[s] for s, lp in lps])
        self.block_last = np.concatenate(
            [lp.block_last + offsets[s] for s, lp in lps])
        self.block_n = np.concatenate([lp.block_n for _, lp in lps])
        self.block_max_tf = np.concatenate([lp.block_max_tf for _, lp in lps])
        self.block_min_dl = np.concatenate([lp.block_min_dl for _, lp in lps])
        # global block index → (owner position, local block index)
        counts = np.array([lp.n_blocks for _, lp in lps], np.int64)
        self._owner_start = np.cumsum(counts) - counts

    @property
    def n_blocks(self) -> int:
        return self.block_last.size

    def _route(self, b: int) -> tuple[int, int]:
        o = int(np.searchsorted(self._owner_start, b, side="right")) - 1
        return o, b - int(self._owner_start[o])

    def block_docs_tfs(self, b: int):
        o, lb = self._route(b)
        s, lp = self._lps[o]
        docs, tfs = lp.block_docs_tfs(lb)
        return docs + self._off[s], tfs

    def block_positions(self, b: int, tfs: np.ndarray) -> np.ndarray:
        o, lb = self._route(b)
        return self._lps[o][1].block_positions(lb, tfs)

    def decode_blocks(self, bsel: np.ndarray):
        owners = np.searchsorted(self._owner_start, bsel, side="right") - 1
        # decode per owner, then reassemble runs in bsel order
        runs: dict[int, tuple] = {}
        for o in np.unique(owners):
            m = owners == o
            s, lp = self._lps[int(o)]
            local = bsel[m] - self._owner_start[o]
            d, t, st, cn = lp.decode_blocks(local)
            runs[int(o)] = (d + self._off[s], t, st, cn, np.flatnonzero(m))
        n = bsel.size
        counts = np.zeros(n, np.int64)
        pieces_d: list = [None] * n
        pieces_t: list = [None] * n
        for d, t, st, cn, pos in runs.values():
            for j, p in enumerate(pos):
                lo = int(st[j])
                pieces_d[p] = d[lo:lo + int(cn[j])]
                pieces_t[p] = t[lo:lo + int(cn[j])]
                counts[p] = cn[j]
        docs = (np.concatenate(pieces_d) if n else np.zeros(0, np.int64))
        tfs = (np.concatenate(pieces_t) if n else np.zeros(0, np.int64))
        return docs, tfs, np.cumsum(counts) - counts, counts


class FederatedReader(MiniIndexProvider):
    """Search over [base, delta, ...] as if they were one merged index
    (module docstring: identity with ``merge.merge_many``)."""

    def __init__(self, index_dirs: list[str], readers=None):
        from rayindex.merge import _doc_space
        from rayindex.searcher import IndexReader

        if len(index_dirs) < 1:
            raise ValueError("need at least one index")
        self.index_dirs = list(index_dirs)
        self.readers = (readers if readers is not None
                        else [IndexReader(d) for d in index_dirs])
        spaces = np.array([_doc_space(d) for d in index_dirs], np.int64)
        self.offsets = np.concatenate([[0], np.cumsum(spaces)[:-1]])
        self.stats = Stats(
            n_docs=sum(r.stats.n_docs for r in self.readers),
            total_tokens=sum(r.stats.total_tokens for r in self.readers),
            doc_len=_FederatedDocLen([r.stats.doc_len for r in self.readers],
                                     self.offsets))

    # -- routing helpers -------------------------------------------------

    def route(self, docs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(sub_index, local_doc_id) per global doc — for metadata joins."""
        docs = np.asarray(docs, np.int64)
        sub = np.searchsorted(self.offsets, docs, side="left") - 1
        return sub, docs - self.offsets[sub]

    # -- MiniIndexProvider -----------------------------------------------

    def contains(self, term: str) -> bool:
        return any(r.contains(term) for r in self.readers)

    def iter_terms(self):
        """(term, cf) over the federated vocabulary — cf summed across
        sub-indexes (the spellcheck frequency dict must see collection-
        global counts, same as after a merge)."""
        agg: dict[str, int] = {}
        for r in self.readers:
            for t, cf in r.iter_terms():
                agg[t] = agg.get(t, 0) + cf
        yield from agg.items()

    def fetch_doc_metadata(self, doc_ids) -> "object":
        """Doc-store metadata for GLOBAL doc ids — routed per sub-index,
        doc_id column rebased back to the federated space."""
        import pyarrow as pa

        from rayindex.searcher import fetch_doc_metadata

        ids = np.asarray(doc_ids, np.int64)
        sub, local = self.route(ids)
        tables = []
        for i, d in enumerate(self.index_dirs):
            m = sub == i
            if not m.any():
                continue
            t = fetch_doc_metadata(d, local[m].tolist())
            col = t.column("doc_id").to_numpy() + int(self.offsets[i])
            t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                             pa.array(col, pa.int64()))
            tables.append(t)
        return pa.concat_tables(tables) if tables else None

    def lookup(self, term: str, need_positions: bool) -> Posting | None:
        parts = []
        df = 0
        for i, r in enumerate(self.readers):
            p = r.lookup(term, need_positions)
            if p is None:
                continue
            df += p.df
            parts.append((i, p))
        if not parts:
            return None
        docs = np.concatenate([p.docs + self.offsets[i] for i, p in parts])
        tfs = np.concatenate([p.tfs for _, p in parts])
        pos = (np.concatenate([p.positions for _, p in parts])
               if need_positions and all(p.positions is not None
                                         for _, p in parts) else None)

        def cat(name):
            vals = [getattr(p, name) for _, p in parts]
            if any(v is None for v in vals):
                return None
            rebase = name == "block_last"
            return np.concatenate(
                [v + (self.offsets[i] if rebase else 0)
                 for (i, _), v in zip(parts, vals)])

        return Posting(docs=docs, tfs=tfs, positions=pos,
                       block_last=cat("block_last"),
                       block_max_tf=cat("block_max_tf"),
                       block_min_dl=cat("block_min_dl"),
                       df_override=(df if df != docs.size else None))

    def lookup_lazy(self, term: str):
        lps = [(i, lp) for i, r in enumerate(self.readers)
               if (lp := r.lookup_lazy(term)) is not None and lp.n_blocks]
        if not lps:
            return None
        return _FederatedLazy(lps, self.offsets)

    def fetch_positions(self, term: str, docs: np.ndarray) -> Posting | None:
        sub, local = self.route(np.asarray(docs, np.int64))
        parts = []
        for i, r in enumerate(self.readers):
            m = sub == i
            if not m.any():
                continue
            p = r.fetch_positions(term, local[m])
            if p is not None and p.docs.size:
                parts.append((i, p))
        if not parts:
            return None
        return Posting(
            docs=np.concatenate([p.docs + self.offsets[i] for i, p in parts]),
            tfs=np.concatenate([p.tfs for _, p in parts]),
            positions=np.concatenate([p.positions for _, p in parts]))

    def allowed_for_lang(self, lang: str) -> np.ndarray:
        return np.concatenate(
            [r.allowed_for_lang(lang) + self.offsets[i]
             for i, r in enumerate(self.readers)])

    # -- the reference request flow over the federation -------------------

    def search(self, query: str, k: int | None = None,
               search_cfg: SearchConfig | None = None,
               analyzer: AnalyzerConfig | None = None,
               scorer: str | None = None,
               lang: str | None = None) -> list[tuple[int, float]]:
        from rayindex.query import parse_query
        from rayindex.scoring import search_parsed

        cfg = search_cfg or SearchConfig()
        allowed = None
        if lang is not None:
            allowed = self.allowed_for_lang(lang)
            if allowed.size == 0:
                return []
        q = parse_query(query, analyzer or AnalyzerConfig())
        docs, scores = search_parsed(self, q, self.stats, cfg, k=k,
                                     scorer=scorer, allowed=allowed)
        return list(zip(docs.tolist(), scores.tolist()))
