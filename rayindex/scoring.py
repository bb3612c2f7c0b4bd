"""Vectorized query-time scoring over decoded posting lists.

Implements the same ranking semantics as rayindex.oracle (the executable
spec of the reference engine, see its module docstring for the
deterministic-izations) but numpy-vectorized, plus a block-max WAND
(Broder et al. 2003 WAND; Ding & Suel 2011 block-max refinement — public
algorithms) top-k path for the standard-BM25 scorer.

The two implementations are deliberately independent: the rank-identity test
gate (tests/test_rank_identity.py) compares engine output against the oracle
term-at-a-time loops, so a bug in either shows up as a mismatch.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass

import numpy as np

from rayindex.config import SearchConfig
from rayindex.oracle import consecutive_occ
from rayindex.query import (
    BooleanQuery,
    ProximityQuery,
    TermsQuery,
    separate_mix,
)


@dataclass
class Posting:
    """Decoded postings of one term: ascending doc_ids, parallel tfs, and
    (optionally lazily) per-doc position arrays."""

    docs: np.ndarray            # int64, ascending
    tfs: np.ndarray             # int64
    positions: np.ndarray | None = None   # flat, per-doc lengths == tfs
    block_last: np.ndarray | None = None  # int64 per block
    block_max_tf: np.ndarray | None = None
    block_min_dl: np.ndarray | None = None

    @property
    def df(self) -> int:
        return int(self.docs.size)

    def pos_slices(self) -> np.ndarray:
        """Start offset of each doc's run in the flat position stream."""
        return np.cumsum(self.tfs) - self.tfs

    def positions_of(self, idx: int) -> list[int]:
        s = int(np.sum(self.tfs[:idx]))
        return self.positions[s : s + int(self.tfs[idx])].tolist()


@dataclass
class Stats:
    n_docs: int
    total_tokens: int
    doc_len: np.ndarray  # int64, indexed by doc_id (index 0 unused)

    @property
    def avg_dl(self) -> float:
        return self.total_tokens / self.n_docs if self.n_docs else 0.0


class MiniIndexProvider:
    """Anything that can serve per-term postings (shard reader, dict, ...)."""

    def lookup(self, term: str, need_positions: bool) -> Posting | None:  # pragma: no cover
        raise NotImplementedError

    def contains(self, term: str) -> bool:
        """Vocabulary membership — override with an O(1) dict hit where
        possible; the default pays a full posting decode."""
        return self.lookup(term, need_positions=False) is not None

    def fetch_positions(self, term: str, docs: np.ndarray) -> Posting | None:
        """Postings restricted to ``docs``, with positions.  Providers with
        block-addressable storage override this to decode only the blocks
        containing candidate docs (searcher.IndexReader.fetch_positions);
        the default decodes everything and subsets."""
        p = self.lookup(term, need_positions=True)
        if p is None:
            return None
        docs = np.asarray(docs, np.int64)
        mask = np.isin(p.docs, docs, assume_unique=True)
        sel = np.flatnonzero(mask)
        lens = p.tfs[sel]
        starts = np.cumsum(p.tfs) - p.tfs
        base = np.cumsum(lens) - lens
        take = (np.repeat(starts[sel], lens)
                + np.arange(int(lens.sum())) - np.repeat(base, lens))
        return Posting(docs=p.docs[sel], tfs=lens, positions=p.positions[take])


# ---------------------------------------------------------------------------
# term weights (vectorized over a term's matching candidate subset)
# ---------------------------------------------------------------------------


def idf_robertson(n_docs: int, df: int) -> float:
    return math.log(1 + ((n_docs - df + 0.5) / (df + 0.5)))


def w_reference(tfs: np.ndarray, dls: np.ndarray, df: int, stats: Stats,
                cfg: SearchConfig) -> np.ndarray:
    idf = idf_robertson(stats.n_docs, df)
    d = dls / stats.avg_dl
    return idf * (tfs / (cfg.ref_k * d + tfs + 0.5))


def w_bm25(tfs: np.ndarray, dls: np.ndarray, df: int, stats: Stats,
           cfg: SearchConfig) -> np.ndarray:
    idf = idf_robertson(stats.n_docs, df)
    norm = cfg.k1 * (1 - cfg.b + cfg.b * dls / stats.avg_dl)
    return idf * (tfs * (cfg.k1 + 1)) / (tfs + norm)


def bm25_upper_bound(max_tf: int, min_dl: int, df: int, stats: Stats,
                     cfg: SearchConfig) -> float:
    """BM25 increases in tf and decreases in dl → (max_tf, min_dl) bounds."""
    return float(w_bm25(np.asarray([max_tf], np.float64),
                        np.asarray([min_dl], np.float64), df, stats, cfg)[0])


# ---------------------------------------------------------------------------
# candidate generation (reference J6 intersection→union relax)
# ---------------------------------------------------------------------------


def candidates_reference(postings: dict[str, Posting], relax: int,
                         allowed: np.ndarray | None = None) -> np.ndarray | None:
    if not postings:
        return None

    def filt(a: np.ndarray) -> np.ndarray:
        return np.intersect1d(a, allowed, assume_unique=True) if allowed is not None else a

    values = [p.docs for _, p in sorted(postings.items())]
    if len(values) > 1:
        i0 = values[0]
        for v in values[1:]:
            i0 = np.intersect1d(i0, v, assume_unique=True)
        i0 = filt(i0)
        if i0.size >= relax:
            return i0
        half = len(values) // 2
        i1 = values[0]
        for v in values[1:half]:
            i1 = np.intersect1d(i1, v, assume_unique=True)
        i2 = values[half]
        for v in values[half + 1 :]:
            i2 = np.intersect1d(i2, v, assume_unique=True)
        i1, i2 = filt(i1), filt(i2)
        if np.union1d(i1, i2).size >= relax:
            return np.union1d(i0, np.union1d(i1, i2))
        out = values[0]
        for v in values[1:]:
            out = np.union1d(out, v)
        return filt(out)
    return filt(values[0])


def union_docs(postings: dict[str, Posting],
               allowed: np.ndarray | None = None) -> np.ndarray | None:
    if not postings:
        return None
    out = None
    for _, p in sorted(postings.items()):
        out = p.docs if out is None else np.union1d(out, p.docs)
    if allowed is not None and out is not None:
        out = np.intersect1d(out, allowed, assume_unique=True)
    return out


# ---------------------------------------------------------------------------
# ranking paths
# ---------------------------------------------------------------------------


def _accumulate(cand: np.ndarray, postings: dict[str, Posting], stats: Stats,
                weight_fn, cfg: SearchConfig, term_mult: dict[str, float] | None = None
                ) -> np.ndarray:
    """Term-at-a-time accumulation of weights into the candidate array."""
    acc = np.zeros(cand.size, np.float64)
    for term in sorted(postings):
        p = postings[term]
        idx = np.searchsorted(cand, p.docs)
        idx_c = np.clip(idx, 0, cand.size - 1)
        hit = cand[idx_c] == p.docs
        tgt = idx_c[hit]
        tfs = p.tfs[hit].astype(np.float64)
        dls = stats.doc_len[p.docs[hit]].astype(np.float64)
        w = weight_fn(tfs, dls, p.df, stats, cfg)
        if term_mult:
            w = w * term_mult.get(term, 1.0)
        acc[tgt] += w
    return acc


def rank_singles(provider: MiniIndexProvider, singles: list[str], scorer: str,
                 stats: Stats, cfg: SearchConfig,
                 fixed_docs: np.ndarray | None = None,
                 allowed: np.ndarray | None = None
                 ) -> tuple[np.ndarray, np.ndarray] | None:
    postings = {}
    for t in set(singles):
        p = provider.lookup(t, need_positions=False)
        if p is not None:
            postings[t] = p
    if not postings:
        if fixed_docs is not None and scorer in ("reference", "bm25"):
            # oracle semantics (oracle.py:204,217): with a fixed boolean doc
            # set, all-OOV single operands score every fixed doc 0.0 rather
            # than killing the result
            fd = np.sort(np.asarray(fixed_docs, np.int64))
            return fd, np.zeros(fd.size)
        return None
    if scorer == "vsm":
        allowed = None  # reference VSM has no date/metadata filtering
    if fixed_docs is not None:
        cand = np.sort(np.asarray(fixed_docs, np.int64))
    elif scorer in ("bm25", "vsm"):
        # bm25: standard union semantics (WAND-prunable).  vsm: the oracle
        # spec scores the plain union of posting lists (oracle.py:283) — the
        # intersection-relax path does NOT apply
        cand = union_docs(postings, allowed)
    else:
        cand = candidates_reference(postings, cfg.candidate_relax, allowed)
    if cand is None or cand.size == 0:
        return None if fixed_docs is None else (np.zeros(0, np.int64), np.zeros(0))

    if scorer in ("reference", "bm25"):
        weight_fn = w_reference if scorer == "reference" else w_bm25
        scores = _accumulate(cand, postings, stats, weight_fn, cfg)
        return cand, scores
    if scorer in ("lm", "lm-dirichlet"):
        pyp = scorer == "lm"
        mu = cfg.lm_mu if pyp else 1089.0
        g = cfg.lm_g
        l_c = stats.total_tokens
        qtf = {t: singles.count(t) for t in set(singles)}
        acc = np.zeros(cand.size, np.float64)
        for term in sorted(postings):
            p = postings[term]
            cf = p.df  # reference df-as-cf quirk (language_model.py:26,45)
            idx = np.searchsorted(cand, p.docs)
            idx_c = np.clip(idx, 0, cand.size - 1)
            hit = cand[idx_c] == p.docs
            tgt = idx_c[hit]
            tfs = p.tfs[hit].astype(np.float64)
            if pyp:
                dtf = np.maximum(tfs - g * tfs**g, 0.0)
                w = qtf[term] * np.log((dtf * l_c) / (mu * cf) + 1)
            else:
                w = qtf[term] * np.log((tfs / mu) * (l_c / cf) + 1)
            # oracle iterates the query WITH duplicates: each duplicate
            # re-adds the qtf-weighted term score → total factor qtf²
            acc[tgt] += w * qtf[term]
        dls = stats.doc_len[cand].astype(np.float64)
        lq = len(singles)
        if pyp:
            d_ld = np.maximum(dls - g * dls**g, 0.0)
            prior = lq * np.log(1 - d_ld / (dls + mu))
        else:
            prior = lq * np.log(mu / (dls + mu))
        return cand, acc + prior
    if scorer == "vsm":
        return _rank_vsm(cand, postings, singles, stats)
    raise ValueError(f"unknown scorer {scorer!r}")


def _rank_vsm(cand: np.ndarray, postings: dict[str, Posting], query: list[str],
              stats: Stats) -> tuple[np.ndarray, np.ndarray]:
    n = stats.n_docs
    dot = np.zeros(cand.size)
    dmag2 = np.zeros(cand.size)
    qmag2 = 0.0
    for term in query:  # with duplicates, as the spec iterates
        p = postings.get(term)
        if p is None:
            continue
        df = p.df
        w_q = (1 + math.log10(query.count(term))) * math.log10(n / df)
        qmag2 += w_q * w_q
        idx = np.searchsorted(cand, p.docs)
        idx_c = np.clip(idx, 0, cand.size - 1)
        hit = cand[idx_c] == p.docs
        tgt = idx_c[hit]
        w_d = np.zeros(cand.size)
        if df < n:
            ww = (1 + np.log10(p.tfs[hit].astype(np.float64))) * math.log10((n - df) / df)
            w_d[tgt] = np.maximum(ww, 0.0)
        dot += w_d * w_q
        dmag2 += w_d * w_d
    mag = np.sqrt(dmag2) * math.sqrt(qmag2)
    scores = np.divide(dot, mag, out=np.zeros_like(dot), where=mag > 0)
    return cand, scores


# composite (doc, position) key space for vectorized positional ops: the
# low _POS_SHIFT bits hold the 1-based token position, the high bits the
# doc_id.  67M positions covers the 8 MiB content cap even with the 'code'
# analyzer's ~3× sub-token expansion (≤ ~25M positions for a cap-sized
# file); the build asserts per-doc token counts stay under the limit
# (build.TokenizeToChunks), and _pos_keys guards the doc_id head-room.
_POS_SHIFT = 26
_POS_MASK = (1 << _POS_SHIFT) - 1
_MAX_POS_DOC = 1 << (63 - _POS_SHIFT)


def _pos_keys(p: Posting) -> np.ndarray:
    if p.docs.size and int(p.docs[-1]) >= _MAX_POS_DOC:
        raise ValueError(
            f"doc_id {int(p.docs[-1])} overflows the (doc,pos) key space; "
            "remap candidate doc_ids to a dense range before positional ops")
    doc_rep = np.repeat(p.docs, p.tfs)
    return (doc_rep << _POS_SHIFT) | p.positions.astype(np.int64)


def _pair_adjacency(pa_: Posting, pb: Posting) -> tuple[np.ndarray, np.ndarray]:
    """Docs and counts of adjacent occurrences (pos in A, pos+1 in B),
    vectorized across every document at once."""
    inter = np.intersect1d(_pos_keys(pa_) + 1, _pos_keys(pb), assume_unique=True)
    if inter.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    docs = inter >> _POS_SHIFT
    u, counts = np.unique(docs, return_counts=True)
    return u, counts


def _phrase_tf(ps: list[Posting], inter: np.ndarray) -> dict[int, int]:
    """Per-doc phrase counts — a vectorized equivalent of
    oracle.consecutive_occ, derived from its run structure:

    The kernel walks the sorted union of all terms' positions; within a
    maximal run of step-1 gaps (a gap > 1 resets the counter), each
    adjacent pair whose term labels are (t, t+1) increments the counter,
    and every time the counter reaches n_terms-1 it emits one occurrence
    and resets.  Non-matching step-1 pairs neither increment nor reset, so
    the per-run contribution is exactly ``matches_in_run // (n_terms-1)``
    — including the reference's quirk that REPEATED pair types can satisfy
    a run.  Equivalence is property-tested against the loop kernel in
    tests/test_scoring_kernels.py."""
    tot = len(ps)
    keys = [_pos_keys(p) for p in ps]
    labels = [np.full(k.size, i, np.int64) for i, k in enumerate(keys)]
    allk = np.concatenate(keys)
    alll = np.concatenate(labels)
    if allk.size < 2:
        return {}
    order = np.argsort(allk, kind="stable")
    k = allk[order]
    lab = alll[order]
    # doc boundaries imply key gaps >= 2**_POS_SHIFT > 1, so same-doc is free
    gap1 = (k[1:] - k[:-1]) == 1
    match = gap1 & (lab[1:] == lab[:-1] + 1)
    run_id = np.cumsum(~gap1)
    m_per_run = np.bincount(run_id[match], minlength=int(run_id[-1]) + 1 if run_id.size else 1)
    # run_id is non-decreasing → run starts via boundary scan, not unique()
    first_edge = np.flatnonzero(np.concatenate([[True], run_id[1:] != run_id[:-1]]))
    uruns = run_id[first_edge]
    hits = m_per_run[uruns] // (tot - 1)
    nz = hits > 0
    if not nz.any():
        return {}
    # doc of a run = doc of its first edge's RIGHT endpoint: the left
    # endpoint of a boundary edge still belongs to the previous doc/run
    run_docs = k[first_edge[nz] + 1] >> _POS_SHIFT
    docs_u, inv = np.unique(run_docs, return_inverse=True)
    per_doc = np.bincount(inv, weights=hits[nz]).astype(np.int64)
    keep = np.isin(docs_u, inter, assume_unique=True)
    return dict(zip(docs_u[keep].tolist(), per_doc[keep].tolist()))


def rank_phrases(provider: MiniIndexProvider, phrases: list[list[str]], scorer: str,
                 stats: Stats, cfg: SearchConfig,
                 fixed_docs: np.ndarray | None = None,
                 allowed: np.ndarray | None = None
                 ) -> tuple[np.ndarray, np.ndarray] | None:
    """Phrase ranking via positional intersection; same per-phrase
    ``return None`` semantics as the oracle (any empty phrase kills all).

    Doc lists intersect FIRST (positions untouched), then positions are
    fetched only for the intersection docs — on a block-addressable
    provider a hot term contributes only the blocks its rare co-terms
    survive in."""
    scores: dict[int, float] = {}
    mu = cfg.lm_mu
    for phrase in phrases:
        metas = [provider.lookup(t, need_positions=False) for t in phrase]
        if any(p is None for p in metas):
            return None
        inter = metas[0].docs
        for p in metas[1:]:
            inter = np.intersect1d(inter, p.docs, assume_unique=True)
        if allowed is not None:
            inter = np.intersect1d(inter, allowed, assume_unique=True)
        if inter.size == 0:
            return None
        ps = [provider.fetch_positions(t, inter) for t in phrase]
        tf = _phrase_tf(ps, inter)
        df = len(tf)
        target = np.sort(np.asarray(fixed_docs, np.int64)) if fixed_docs is not None else inter
        for doc in target.tolist():
            if doc in tf:
                dl = float(stats.doc_len[doc])
                if scorer == "reference":
                    idf = idf_robertson(stats.n_docs, df)
                    d = dl / stats.avg_dl
                    w = idf * (tf[doc] / (cfg.ref_k * d + tf[doc] + 0.5))
                elif scorer == "bm25":
                    idf = idf_robertson(stats.n_docs, df)
                    norm = cfg.k1 * (1 - cfg.b + cfg.b * dl / stats.avg_dl)
                    w = idf * (tf[doc] * (cfg.k1 + 1)) / (tf[doc] + norm)
                else:
                    w = math.log((tf[doc] / mu) * (stats.total_tokens / df) + 1)
                scores[doc] = scores.get(doc, 0.0) + w
    if not scores and fixed_docs is None:
        # all phrases matched docs but none consecutively: empty score dict
        return np.zeros(0, np.int64), np.zeros(0)
    docs = np.asarray(sorted(scores), np.int64)
    return docs, np.asarray([scores[d] for d in docs.tolist()])


def boolean_docs(provider: MiniIndexProvider, q: BooleanQuery, stats: Stats,
                 cfg: SearchConfig) -> np.ndarray:
    appear: dict[str, np.ndarray] = {}
    for operand in q.terms:
        if len(operand) == 1:
            p = provider.lookup(operand[0], need_positions=False)
            appear[operand[0]] = p.docs if p is not None else np.zeros(0, np.int64)
        else:
            appear[" ".join(operand) + " "] = _phrase_docs(provider, operand)
    names = list(appear.keys())
    ops = q.operators
    if not appear:  # bare-operator query like "AND" — no operands at all
        return np.zeros(0, np.int64)
    if len(ops) == 1:
        vals = list(appear.values())
        if ops[0] == "OR":
            out = vals[0]
            for v in vals[1:]:
                out = np.union1d(out, v)
        elif ops[0] == "AND":
            out = vals[0]
            for v in vals[1:]:
                out = np.intersect1d(out, v, assume_unique=True)
        else:  # NOT
            if len(vals) == 1:
                out = np.setdiff1d(np.arange(1, stats.n_docs + 1, dtype=np.int64),
                                   vals[0], assume_unique=True)
            else:
                out = vals[0]
                for v in vals[1:]:
                    out = np.setdiff1d(out, v, assume_unique=True)
    elif len(names) == 2:
        out = np.setdiff1d(appear[names[0]], appear[names[1]], assume_unique=True)
    else:
        groups: list[np.ndarray] = []
        i = 0
        while i < len(names):
            if i in q.paren_positions and i + 1 < len(names):
                a, b = appear[names[i]], appear[names[i + 1]]
                op = ops[i] if i < len(ops) else "OR"
                groups.append(
                    np.union1d(a, b) if op == "OR"
                    else np.intersect1d(a, b, assume_unique=True) if op == "AND"
                    else np.setdiff1d(a, b, assume_unique=True)
                )
                i += 2
            else:
                groups.append(appear[names[i]])
                i += 1
        main_ops = [ops[j] for j in range(len(ops)) if j not in q.paren_positions]
        acc = np.zeros(0, np.int64)
        for idx, op in enumerate(main_ops):
            if idx + 1 >= len(groups):
                break
            # empty accumulator restarts from groups[idx] (reference quirk)
            left = groups[idx] if acc.size == 0 else acc
            right = groups[idx + 1]
            acc = (np.union1d(left, right) if op == "OR"
                   else np.intersect1d(left, right) if op == "AND"
                   else np.setdiff1d(left, right))
        out = acc
    return out[: cfg.boolean_cap]


def _phrase_docs(provider: MiniIndexProvider, phrase: list[str]) -> np.ndarray:
    metas = [provider.lookup(t, need_positions=False) for t in phrase]
    if any(p is None for p in metas):
        return np.zeros(0, np.int64)
    inter = metas[0].docs
    for p in metas[1:]:
        inter = np.intersect1d(inter, p.docs, assume_unique=True)
    if inter.size == 0:
        return inter
    ps = [provider.fetch_positions(t, inter) for t in phrase]
    tf = _phrase_tf(ps, inter)
    return np.asarray(sorted(tf), np.int64)


def proximity_docs(provider: MiniIndexProvider, q: ProximityQuery) -> np.ndarray:
    """Docs where the two terms occur within |p1-p2| <= k — one vectorized
    pass over the composite (doc, pos) key space: for each occurrence of
    term1, only its two nearest term2 neighbours (by searchsorted) can be
    the closest in-document positions."""
    m1 = provider.lookup(q.terms[0], need_positions=False)
    m2 = provider.lookup(q.terms[1], need_positions=False)
    if m1 is None or m2 is None:
        return np.zeros(0, np.int64)
    # a proximity hit needs both terms in the same doc — restrict the
    # positional fetch to the doc intersection
    common = np.intersect1d(m1.docs, m2.docs, assume_unique=True)
    if common.size == 0:
        return np.zeros(0, np.int64)
    p1 = provider.fetch_positions(q.terms[0], common)
    p2 = provider.fetch_positions(q.terms[1], common)
    ka = _pos_keys(p1)
    kb = _pos_keys(p2)
    if ka.size == 0 or kb.size == 0:
        return np.zeros(0, np.int64)
    docs_a = ka >> _POS_SHIFT
    pos_a = ka & _POS_MASK
    hit = np.zeros(ka.size, bool)
    idx = np.searchsorted(kb, ka)
    for cand in (idx - 1, idx):
        valid = (cand >= 0) & (cand < kb.size)
        c = np.clip(cand, 0, kb.size - 1)
        same_doc = (kb[c] >> _POS_SHIFT) == docs_a
        close = np.abs((kb[c] & _POS_MASK) - pos_a) <= q.k
        hit |= valid & same_doc & close
    return np.unique(docs_a[hit])


# ---------------------------------------------------------------------------
# block-max WAND top-k (standard BM25, single-term OR queries)
# ---------------------------------------------------------------------------


class _TermCursor:
    """Posting cursor with O(1) amortized block-bound lookup and scalar BM25
    evaluation (idf and length-norm constants precomputed — the per-doc hot
    path is pure float arithmetic, no numpy object churn)."""

    __slots__ = ("docs", "tfs", "df", "idx", "n", "ub", "block_last",
                 "block_ub", "blk", "cur", "idf", "k1p1", "norm_c", "norm_dl")

    def __init__(self, p: Posting, stats: Stats, cfg: SearchConfig):
        self.docs = p.docs
        self.tfs = p.tfs
        self.df = p.df
        self.n = int(p.docs.size)
        self.idx = 0
        self.cur = int(p.docs[0]) if self.n else 1 << 62
        self.idf = idf_robertson(stats.n_docs, p.df)
        self.k1p1 = cfg.k1 + 1.0
        self.norm_c = cfg.k1 * (1 - cfg.b)
        self.norm_dl = cfg.k1 * cfg.b / stats.avg_dl
        if p.block_last is not None and len(p.block_last):
            self.block_last = p.block_last
            mt = np.asarray(p.block_max_tf, np.float64)
            md = np.asarray(p.block_min_dl, np.float64)
            self.block_ub = self.idf * (mt * self.k1p1) / (
                mt + self.norm_c + self.norm_dl * md)
        else:
            self.block_last = p.docs[-1:]
            self.block_ub = np.asarray([
                bm25_upper_bound(int(p.tfs.max()), int(stats.doc_len[p.docs].min()),
                                 p.df, stats, cfg)
            ])
        self.block_last = np.ascontiguousarray(self.block_last, np.int64)
        self.ub = float(self.block_ub.max())
        self.blk = 0

    def advance(self) -> None:
        self.idx += 1
        self.cur = int(self.docs[self.idx]) if self.idx < self.n else 1 << 62

    def seek(self, target: int) -> None:
        if self.cur < target:
            self.idx = int(np.searchsorted(self.docs, target, side="left"))
            self.cur = int(self.docs[self.idx]) if self.idx < self.n else 1 << 62

    def score_cur(self, dl: float) -> float:
        tf = float(self.tfs[self.idx])
        return self.idf * (tf * self.k1p1) / (tf + self.norm_c + self.norm_dl * dl)

    def cur_block_ub(self) -> float:
        # cursors only move forward → advance the block pointer monotonically
        bl = self.block_last
        b = self.blk
        last = bl.size - 1
        while b < last and bl[b] < self.cur:
            b += 1
        self.blk = b
        return float(self.block_ub[b])

    def cur_block_boundary(self) -> int:
        self.cur_block_ub()
        return int(self.block_last[self.blk])


class _LazyTermCursor:
    """Posting cursor over a block-addressable LazyPosting: blocks decode
    on first touch; seeks that land exactly on a block's first doc (the
    common case after a block-max skip) decode NOTHING — the skipped
    posting mass never leaves the mmap."""

    __slots__ = ("lp", "idx", "cur", "ub", "blk", "docs", "tfs",
                 "idf", "k1p1", "norm_c", "norm_dl", "block_last", "block_ub",
                 "nblocks", "df")

    def __init__(self, lp, stats: Stats, cfg: SearchConfig):
        self.lp = lp
        self.df = lp.df
        self.idf = idf_robertson(stats.n_docs, lp.df)
        self.k1p1 = cfg.k1 + 1.0
        self.norm_c = cfg.k1 * (1 - cfg.b)
        self.norm_dl = cfg.k1 * cfg.b / stats.avg_dl
        mt = lp.block_max_tf.astype(np.float64)
        md = lp.block_min_dl.astype(np.float64)
        self.block_ub = self.idf * (mt * self.k1p1) / (
            mt + self.norm_c + self.norm_dl * md)
        self.block_last = np.ascontiguousarray(lp.block_last, np.int64)
        self.nblocks = int(self.block_last.size)
        self.ub = float(self.block_ub.max()) if self.nblocks else 0.0
        self.blk = 0
        self.docs = None  # current block not decoded
        self.tfs = None
        self.idx = 0
        self.cur = int(lp.block_first[0]) if self.nblocks else 1 << 62

    def _load(self) -> None:
        if self.docs is None:
            self.docs, self.tfs = self.lp.block_docs_tfs(self.blk)

    def advance(self) -> None:
        self._load()
        self.idx += 1
        if self.idx < self.docs.size:
            self.cur = int(self.docs[self.idx])
            return
        self.blk += 1
        if self.blk >= self.nblocks:
            self.cur = 1 << 62
            return
        self.docs = None
        self.tfs = None
        self.idx = 0
        self.cur = int(self.lp.block_first[self.blk])

    def seek(self, target: int) -> None:
        if self.cur >= target:
            return
        b = self.blk + int(np.searchsorted(self.block_last[self.blk:], target,
                                           side="left"))
        if b >= self.nblocks:
            self.cur = 1 << 62
            return
        if b != self.blk:
            self.blk = b
            self.docs = None
            self.tfs = None
            self.idx = 0
            self.cur = int(self.lp.block_first[b])
            if self.cur >= target:
                return  # landed at (or past) the block start — no decode
        self._load()
        i = int(np.searchsorted(self.docs, target, side="left"))
        self.idx = i
        self.cur = int(self.docs[i])  # block_last[b] >= target ⇒ i in range

    def score_cur(self, dl: float) -> float:
        self._load()
        tf = float(self.tfs[self.idx])
        return self.idf * (tf * self.k1p1) / (tf + self.norm_c + self.norm_dl * dl)

    def cur_block_ub(self) -> float:
        return float(self.block_ub[self.blk])

    def cur_block_boundary(self) -> int:
        return int(self.block_last[self.blk])


def wand_topk(provider: MiniIndexProvider, terms: list[str], k: int,
              stats: Stats, cfg: SearchConfig) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND: exact top-k by (score desc, doc_id asc) for standard
    BM25 over the OR of ``terms``.  Prunes only on strict upper-bound <
    threshold, so results are identical to exhaustive TAAT.  On providers
    with block-addressable storage (lookup_lazy), pruned blocks are never
    even decoded."""
    cursors = []
    lazy = getattr(provider, "lookup_lazy", None)
    for t in set(terms):
        if lazy is not None:
            lp = lazy(t)
            if lp is not None and lp.n_blocks:
                cursors.append(_LazyTermCursor(lp, stats, cfg))
        else:
            p = provider.lookup(t, need_positions=False)
            if p is not None:
                cursors.append(_TermCursor(p, stats, cfg))
    if not cursors:
        return np.zeros(0, np.int64), np.zeros(0)
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    INF = 1 << 62
    doc_len = stats.doc_len
    ncur = len(cursors)
    while True:
        cursors.sort(key=lambda c: c.cur)
        if cursors[0].cur >= INF:
            break
        # pivot: first cursor where the prefix ub sum could beat threshold
        full = len(heap) >= k
        theta = heap[0][0] if full else -math.inf
        acc_ub = 0.0
        pivot = -1
        for i in range(ncur):
            c = cursors[i]
            if c.cur >= INF:
                break
            acc_ub += c.ub
            # >= not >: a doc scoring exactly theta can still win its tie
            # on smaller doc_id, so it must be evaluated, not pruned
            if not full or acc_ub >= theta:
                pivot = i
                break
        if pivot == -1:
            break  # no combination can beat theta
        pivot_doc = cursors[pivot].cur
        if pivot_doc >= INF:
            break
        # extend over cursors parked at the SAME doc beyond the pivot: they
        # contribute to pivot_doc's score, so the block bound must count them
        ext = pivot
        while ext + 1 < ncur and cursors[ext + 1].cur == pivot_doc:
            ext += 1
        if full:
            block_ub = 0.0
            for i in range(ext + 1):
                block_ub += cursors[i].cur_block_ub()
            if block_ub < theta:
                # skip to past the earliest block boundary, but never past
                # the next cursor's doc (where a new term becomes active and
                # the bound no longer holds)
                boundary = min(cursors[i].cur_block_boundary() for i in range(ext + 1))
                if ext + 1 < ncur and cursors[ext + 1].cur < INF:
                    boundary = min(boundary, cursors[ext + 1].cur - 1)
                target = max(boundary + 1, pivot_doc + 1)
                for i in range(ext + 1):
                    cursors[i].seek(target)
                continue
        if cursors[0].cur == pivot_doc:
            # fully evaluate pivot_doc
            score = 0.0
            dl = float(doc_len[pivot_doc])
            for c in cursors:
                if c.cur == pivot_doc:
                    score += c.score_cur(dl)
                    c.advance()
                elif c.cur > pivot_doc:
                    break
            item = (score, -pivot_doc)
            if not full:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
        else:
            for c in cursors:
                if c.cur < pivot_doc:
                    c.seek(pivot_doc)
    ranked = sorted(heap, key=lambda it: (-it[0], -it[1]))
    docs = np.asarray([-d for _, d in ranked], np.int64)
    scores = np.asarray([s for s, _ in ranked])
    return docs, scores


# ---------------------------------------------------------------------------
# top-level search (mirrors oracle.search)
# ---------------------------------------------------------------------------


def search_parsed(provider: MiniIndexProvider, q, stats: Stats, cfg: SearchConfig,
                  k: int | None = None, scorer: str | None = None,
                  allowed: np.ndarray | None = None
                  ) -> tuple[np.ndarray, np.ndarray]:
    scorer = scorer or cfg.scorer
    empty = (np.zeros(0, np.int64), np.zeros(0))
    # mini-index validity gate (oracle.search / reference
    # retrieval_execution.py:139-147): if NO query term exists in the
    # vocabulary, "no results" — including NOT queries whose boolean
    # universe would otherwise be non-empty
    if isinstance(q, ProximityQuery):
        _all_terms = list(q.terms)
    elif isinstance(q, BooleanQuery):
        _all_terms = [t for p in q.terms for t in p]
    else:
        _all_terms = [t for p in q.parts for t in p]
    if not any(provider.contains(t) for t in _all_terms):
        return empty
    if isinstance(q, ProximityQuery):
        # reference quirk: the proximity path bypasses the date filter
        docs = proximity_docs(provider, q)
        docs = docs[: (k or docs.size)]
        return docs, np.zeros(docs.size)
    if isinstance(q, BooleanQuery):
        docs = boolean_docs(provider, q, stats, cfg)
        if allowed is not None:
            docs = np.intersect1d(docs, allowed, assume_unique=True)
        singles = [p[0] for p in q.terms if len(p) == 1]
        phrases = [p for p in q.terms if len(p) > 1]
        if singles:
            r = rank_singles(provider, singles, scorer, stats, cfg, fixed_docs=docs)
        elif phrases:
            r = rank_phrases(provider, phrases, scorer, stats, cfg, fixed_docs=docs)
        else:
            r = None
        if r is None:
            return empty
        return _top(r, k or cfg.top_k)
    parts = [p for p in q.parts if p]
    singles, phrases = separate_mix(parts)
    # single-term queries: one vectorized pass over the posting list beats
    # doc-at-a-time traversal (no other terms to prune against)
    use_wand = (cfg.algorithm == "bmw" and scorer == "bm25"
                and len(set(singles)) > 1 and not phrases and allowed is None)
    if use_wand:
        return wand_topk(provider, singles, k or cfg.top_k, stats, cfg)
    t = (rank_singles(provider, singles, scorer, stats, cfg, allowed=allowed)
         if singles else None)
    p = (rank_phrases(provider, phrases, scorer, stats, cfg, allowed=allowed)
         if phrases else None)
    if t is not None and p is not None and t[0].size and p[0].size:
        docs = np.union1d(t[0], p[0])
        scores = np.zeros(docs.size)
        for src_docs, src_scores in (t, p):
            idx = np.searchsorted(docs, src_docs)
            scores[idx] += src_scores
        r = (docs, scores)
    elif t is not None and t[0].size:
        r = t
    elif p is not None and p[0].size:
        r = p
    else:
        return empty
    cap = 20 if scorer == "vsm" else cfg.top_k
    return _top(r, min(k or cap, cap))


def _top(r: tuple[np.ndarray, np.ndarray], k: int) -> tuple[np.ndarray, np.ndarray]:
    docs, scores = r
    if docs.size == 0:
        return docs, scores
    # (score desc, doc_id asc): docs ascending + stable mergesort on -score
    order = np.argsort(-scores, kind="stable")[:k]
    return docs[order], scores[order]
