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
    # dict df when it differs from docs.size — a tombstoned index serves
    # postings with deleted docs masked out but keeps the PRE-DELETE df
    # (stale-stats-until-compact semantics, so TAAT and block-max WAND
    # agree: WAND reads df from dict metadata it never re-derives)
    df_override: int | None = None

    @property
    def df(self) -> int:
        return int(self.docs.size) if self.df_override is None \
            else self.df_override

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

    def fetch_positions_many(self, term_docs) -> list["Posting | None"]:
        """Batched positional fetch — distributed providers override this
        to turn a phrase's per-term fetches into one scatter."""
        return [self.fetch_positions(t, d) for t, d in term_docs]


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


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``intersect1d(assume_unique=True)`` for ASCENDING unique arrays —
    binary-probes the smaller side into the larger instead of re-sorting
    the concatenation (posting doc lists are already sorted)."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0 or b.size == 0:
        return a[:0]
    idx = np.searchsorted(b, a)
    np.minimum(idx, b.size - 1, out=idx)
    return a[b[idx] == a]


def _union_sorted(arrays: list[np.ndarray]) -> np.ndarray:
    """``union1d`` over ascending unique int arrays: one radix (stable)
    sort of the concatenation + boundary dedup — no pairwise re-sorts."""
    cat = np.concatenate(arrays)
    if cat.size == 0:
        return cat
    cat.sort(kind="stable")
    keep = np.empty(cat.size, bool)
    keep[0] = True
    np.not_equal(cat[1:], cat[:-1], out=keep[1:])
    return cat[keep]


def candidates_reference(postings: dict[str, Posting], relax: int,
                         allowed: np.ndarray | None = None) -> np.ndarray | None:
    if not postings:
        return None

    def filt(a: np.ndarray) -> np.ndarray:
        return _intersect_sorted(a, allowed) if allowed is not None else a

    values = [p.docs for _, p in sorted(postings.items())]
    if len(values) > 1:
        i0 = values[0]
        for v in values[1:]:
            i0 = _intersect_sorted(i0, v)
        i0 = filt(i0)
        if i0.size >= relax:
            return i0
        half = len(values) // 2
        i1 = values[0]
        for v in values[1:half]:
            i1 = _intersect_sorted(i1, v)
        i2 = values[half]
        for v in values[half + 1 :]:
            i2 = _intersect_sorted(i2, v)
        i1, i2 = filt(i1), filt(i2)
        if _union_sorted([i1, i2]).size >= relax:
            return _union_sorted([i0, i1, i2])
        return filt(_union_sorted(values))
    return filt(values[0])


def union_docs(postings: dict[str, Posting],
               allowed: np.ndarray | None = None) -> np.ndarray | None:
    if not postings:
        return None
    out = _union_sorted([p.docs for _, p in sorted(postings.items())])
    if allowed is not None:
        out = _intersect_sorted(out, allowed)
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


def rank_singles_pre(postings_w: dict[str, tuple[np.ndarray, np.ndarray]],
                     scorer: str, stats: Stats, cfg: SearchConfig,
                     allowed: np.ndarray | None = None
                     ) -> tuple[np.ndarray, np.ndarray] | None:
    """rank_singles for PRE-WEIGHTED postings: ``postings_w[term] = (docs,
    w)`` where ``w[i]`` is the term's full per-doc score contribution,
    computed where the postings live (a shard-owner actor).  Because the
    weight kernels are elementwise, owner-side ``w`` equals the values
    ``_accumulate`` would compute on any candidate subset — accumulating
    ``w[hit]`` here is bit-identical to the local path, while the wire
    carries (docs, w) instead of postings + a driver-side doc-length
    gather.  bm25/reference only (lm/vsm weights depend on query-local
    tf counts)."""
    if not postings_w:
        return None
    meta = {t: Posting(docs=d, tfs=d[:0]) for t, (d, _) in postings_w.items()}
    if scorer == "bm25":
        cand = union_docs(meta, allowed)
    else:
        cand = candidates_reference(meta, cfg.candidate_relax, allowed)
    if cand is None or cand.size == 0:
        return None
    acc = np.zeros(cand.size, np.float64)
    for term in sorted(postings_w):
        docs, w = postings_w[term]
        idx = np.searchsorted(cand, docs)
        idx_c = np.clip(idx, 0, cand.size - 1)
        hit = cand[idx_c] == docs
        acc[idx_c[hit]] += w[hit]
    return cand, acc


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


def _phrase_tf(ps: list[Posting], inter: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
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
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    keys = [_pos_keys(p) for p in ps]
    labels = [np.full(k.size, i, np.int64) for i, k in enumerate(keys)]
    allk = np.concatenate(keys)
    alll = np.concatenate(labels)
    if allk.size < 2:
        return empty
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
        return empty
    # doc of a run = doc of its first edge's RIGHT endpoint: the left
    # endpoint of a boundary edge still belongs to the previous doc/run
    run_docs = k[first_edge[nz] + 1] >> _POS_SHIFT
    docs_u, inv = np.unique(run_docs, return_inverse=True)
    per_doc = np.bincount(inv, weights=hits[nz]).astype(np.int64)
    keep = np.isin(docs_u, inter, assume_unique=True)
    return docs_u[keep], per_doc[keep]


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
    mu = cfg.lm_mu
    acc_docs: np.ndarray | None = None
    acc_scores: np.ndarray | None = None
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
        ps = provider.fetch_positions_many([(t, inter) for t in phrase])
        tdocs, tcounts = _phrase_tf(ps, inter)
        df = int(tdocs.size)
        if fixed_docs is not None:
            target = np.sort(np.asarray(fixed_docs, np.int64))
            keep = np.isin(tdocs, target, assume_unique=True)
            tdocs, tcounts = tdocs[keep], tcounts[keep]
        if tdocs.size:
            tfv = tcounts.astype(np.float64)
            dlv = stats.doc_len[tdocs].astype(np.float64)
            if scorer == "reference":
                idf = idf_robertson(stats.n_docs, df)
                w = idf * (tfv / (cfg.ref_k * (dlv / stats.avg_dl) + tfv + 0.5))
            elif scorer == "bm25":
                idf = idf_robertson(stats.n_docs, df)
                norm = cfg.k1 * (1 - cfg.b + cfg.b * dlv / stats.avg_dl)
                w = idf * (tfv * (cfg.k1 + 1)) / (tfv + norm)
            else:
                w = np.log((tfv / mu) * (stats.total_tokens / df) + 1)
            if acc_docs is None:
                acc_docs, acc_scores = tdocs, w
            else:
                merged = np.union1d(acc_docs, tdocs)
                ms = np.zeros(merged.size)
                ms[np.searchsorted(merged, acc_docs)] += acc_scores
                ms[np.searchsorted(merged, tdocs)] += w
                acc_docs, acc_scores = merged, ms
    if acc_docs is None:
        # all phrases matched docs but none consecutively: empty score dict
        return np.zeros(0, np.int64), np.zeros(0)
    return acc_docs, acc_scores


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
    ps = provider.fetch_positions_many([(t, inter) for t in phrase])
    tdocs, _ = _phrase_tf(ps, inter)
    return tdocs


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
    p1, p2 = provider.fetch_positions_many(
        [(q.terms[0], common), (q.terms[1], common)])
    ka = _pos_keys(p1)
    kb = _pos_keys(p2)
    if ka.size == 0 or kb.size == 0:
        return np.zeros(0, np.int64)
    if ka.size > kb.size:
        ka, kb = kb, ka  # probe from the smaller side — |p1-p2| is symmetric
    # composite keys fold both checks into ONE subtraction: neighbours in
    # a DIFFERENT doc differ by >= 2^_POS_SHIFT >> k, so (same doc AND
    # |pos diff| <= k) ⟺ |key diff| <= k
    kdist = np.int64(q.k)
    idx = np.searchsorted(kb, ka)
    hit = np.zeros(ka.size, bool)
    doc_a = ka >> _POS_SHIFT
    # cheap same-doc mask on both neighbour probes: the |key diff| <= k
    # shortcut alone is only safe while per-doc position counts stay far
    # below 2^_POS_SHIFT; a doc filled to the cap would make cross-doc key
    # gaps as small as 1 and fabricate proximity hits
    right = idx < kb.size
    hit[right] = ((kb[idx[right]] - ka[right]) <= kdist) & \
                 ((kb[idx[right]] >> _POS_SHIFT) == doc_a[right])
    left = idx > 0
    hit[left] |= ((ka[left] - kb[idx[left] - 1]) <= kdist) & \
                 ((kb[idx[left] - 1] >> _POS_SHIFT) == doc_a[left])
    return np.unique(doc_a[hit])


# ---------------------------------------------------------------------------
# block-max top-k (standard BM25, multi-term OR queries)
# ---------------------------------------------------------------------------


def wand_topk(provider: MiniIndexProvider, terms: list[str], k: int,
              stats: Stats, cfg: SearchConfig) -> tuple[np.ndarray, np.ndarray]:
    """Exact BM25 top-k with block-level skipping — a vectorized
    segment-sweep over the doc-range-aligned block layout (the block-max
    idea of Ding & Suel 2011, restructured batch-wise instead of
    doc-at-a-time WAND, whose per-posting Python loop loses to vectorized
    TAAT by an order of magnitude).

    Every term's dict blocks tile the doc axis in ascending disjoint
    intervals; the union of all terms' block boundaries partitions the
    axis into segments on which Σ per-term block upper bounds is a valid
    score bound for every doc inside (a doc's postings for each term live
    in exactly one block, so each doc is fully scored within one
    segment).  Segments are processed in descending bound order with
    vectorized accumulation; once the running k-th best score strictly
    exceeds a segment's bound, all remaining segments are pruned — and
    their blocks are NEVER DECODED (LazyPosting byte slices stay in the
    mmap).  Prunes only on strict inequality and final-sorts by
    (score desc, doc asc), so results are identical to exhaustive TAAT.
    """
    empty = (np.zeros(0, np.int64), np.zeros(0))
    lazy = getattr(provider, "lookup_lazy", None)
    if lazy is None:
        r = rank_singles(provider, list(terms), "bm25", stats, cfg)
        return _top(r, k) if r is not None else empty
    infos = []
    k1p1 = cfg.k1 + 1.0
    norm_c = cfg.k1 * (1 - cfg.b)
    norm_dl = cfg.k1 * cfg.b / stats.avg_dl
    for t in set(terms):
        lp = lazy(t)
        if lp is None or lp.block_last.size == 0:
            continue
        idf = idf_robertson(stats.n_docs, lp.df)
        mt = lp.block_max_tf.astype(np.float64)
        md = lp.block_min_dl.astype(np.float64)
        ub = idf * (mt * k1p1) / (mt + norm_c + norm_dl * md)
        infos.append((lp, idf, ub))
    if not infos:
        return empty
    bounds = np.unique(np.concatenate(
        [lp.block_first for lp, _, _ in infos]
        + [lp.block_last + 1 for lp, _, _ in infos]))
    seg_start = bounds[:-1]
    seg_end = bounds[1:]
    nseg = seg_start.size
    total_ub = np.zeros(nseg)
    seg_blk: list[np.ndarray] = []
    for lp, idf, ub in infos:
        j = np.searchsorted(lp.block_last, seg_start, side="left")
        jj = np.minimum(j, lp.block_last.size - 1)
        covered = (j < lp.block_last.size) & (lp.block_first[jj] <= seg_start)
        total_ub += np.where(covered, ub[jj], 0.0)
        seg_blk.append(np.where(covered, jj, -1))
    order = np.argsort(-total_ub, kind="stable")
    doc_len = stats.doc_len
    caches: list[dict[int, tuple[np.ndarray, np.ndarray]]] = [{} for _ in infos]
    top_docs = np.zeros(0, np.int64)
    top_scores = np.zeros(0)
    theta = -math.inf
    # galloping chunks: tiny first chunks establish the threshold from the
    # highest-bound segments before any wide fan-out, then grow to
    # amortize per-chunk overhead once pruning has (or hasn't) engaged
    c0 = 0
    ch = 4
    while c0 < nseg:
        sel = order[c0:c0 + ch]
        c0 += ch
        ch = min(ch * 2, 128)
        full = top_docs.size >= k
        if full:
            if total_ub[sel[0]] < theta:
                break  # order is descending — nothing left can compete
            sel = sel[total_ub[sel] >= theta]
            if sel.size == 0:
                continue
        parts_docs: list[np.ndarray] = []
        parts_w: list[np.ndarray] = []
        for ti, (lp, idf, _ub) in enumerate(infos):
            cache = caches[ti]
            sb = seg_blk[ti][sel]
            live = sb >= 0
            if not live.any():
                continue
            missing = np.asarray(
                [b for b in np.unique(sb[live]).tolist() if b not in cache],
                np.int64)
            if missing.size:
                md, mt2, mst, mbn = lp.decode_blocks(missing)
                for i, b in enumerate(missing.tolist()):
                    s0, n0 = int(mst[i]), int(mbn[i])
                    cache[b] = (md[s0:s0 + n0], mt2[s0:s0 + n0])
            d_parts: list[np.ndarray] = []
            t_parts: list[np.ndarray] = []
            for s, b in zip(sel[live].tolist(), sb[live].tolist()):
                bd, bt = cache[b]
                lo = int(np.searchsorted(bd, seg_start[s], side="left"))
                hi = int(np.searchsorted(bd, seg_end[s], side="left"))
                if hi > lo:
                    d_parts.append(bd[lo:hi])
                    t_parts.append(bt[lo:hi])
            if not d_parts:
                continue
            dd = np.concatenate(d_parts)
            tf = np.concatenate(t_parts).astype(np.float64)
            dl = doc_len[dd].astype(np.float64)
            parts_docs.append(dd)
            parts_w.append(idf * (tf * k1p1) / (tf + norm_c + norm_dl * dl))
        if not parts_docs:
            continue
        all_docs = np.unique(np.concatenate(parts_docs))
        scores = np.zeros(all_docs.size)
        for dd, w in zip(parts_docs, parts_w):
            scores[np.searchsorted(all_docs, dd)] += w
        pool_d = np.concatenate([top_docs, all_docs])
        pool_s = np.concatenate([top_scores, scores])
        keep = np.lexsort((pool_d, -pool_s))[:k]
        top_docs = pool_d[keep]
        top_scores = pool_s[keep]
        if top_docs.size >= k:
            theta = float(top_scores.min())
    order2 = np.lexsort((top_docs, -top_scores))
    return top_docs[order2], top_scores[order2]


# ---------------------------------------------------------------------------
# top-level search (mirrors oracle.search)
# ---------------------------------------------------------------------------


def query_terms(q) -> list[str]:
    """Every term a parsed query touches (with duplicates) — the scatter
    list for batched posting prefetch and the validity-gate input."""
    if isinstance(q, ProximityQuery):
        return list(q.terms)
    if isinstance(q, BooleanQuery):
        return [t for p in q.terms for t in p]
    return [t for p in q.parts for t in p]


def auto_prefers_bmw(provider, terms, stats: Stats, cfg: SearchConfig) -> bool:
    """Per-query TAAT-vs-block-max routing from DICT METADATA alone (no
    posting decode): block-max pruning pays off only when segments exist
    where few terms are active and the active bounds sit far below the
    top-k threshold.  Estimate the MEAN segment bound as
    Σ_t coverage_t · mean(block bounds of t) — where ``coverage_t`` is the
    fraction of the query's doc axis the term's block ranges actually span
    (a scattered term covers ~everything and is unprunable however rare) —
    and compare against the threshold proxy max_t max(bound): prune-able
    ⟺ the average segment's bound falls well below what the strongest
    term alone can score.  Both failure modes route correctly: a uniform
    corpus (every term covers the axis, flat bounds) sums above the proxy
    → TAAT; a clustered rare term (narrow ranges, high idf) collapses the
    mean segment bound → bmw.  Wrong guesses cost only time — both
    algorithms are exact and identity-gated."""
    if not hasattr(provider, "lookup_lazy"):
        return False
    lps = [lp for lp in (provider.lookup_lazy(t) for t in set(terms))
           if lp is not None and lp.n_blocks]
    if not lps:
        return False
    total_blocks = sum(lp.n_blocks for lp in lps)
    if total_blocks < 64:
        return False  # tiny lists: one vectorized TAAT pass beats setup
    axis_lo = min(int(lp.block_first[0]) for lp in lps)
    axis_hi = max(int(lp.block_last[-1]) for lp in lps)
    axis = max(1, axis_hi - axis_lo + 1)
    mean_seg_bound = 0.0
    theta_proxy = 0.0
    for lp in lps:
        ub = w_bm25(lp.block_max_tf.astype(np.float64),
                    lp.block_min_dl.astype(np.float64), lp.df, stats, cfg)
        cover = min(1.0, float(
            (lp.block_last - lp.block_first + 1).sum()) / axis)
        mean_seg_bound += cover * float(ub.mean())
        theta_proxy = max(theta_proxy, float(ub.max()))
    return mean_seg_bound < 0.8 * theta_proxy


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
    _all_terms = query_terms(q)
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
    wand_ok = (scorer == "bm25" and len(set(singles)) > 1 and not phrases
               and allowed is None)
    use_wand = wand_ok and (
        cfg.algorithm == "bmw"
        or (cfg.algorithm == "auto"
            and auto_prefers_bmw(provider, singles, stats, cfg)))
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
    # (score desc, doc_id asc): docs ascending + stable sort on -score
    if docs.size > max(4 * k, 256):
        # exact top-k without a full argsort: partition on score, keep
        # EVERY kth-score tie (so tie-break by doc stays exact), then
        # stable-sort only the survivors
        part = np.argpartition(-scores, k - 1)
        kth = scores[part[k - 1]]
        sel = np.flatnonzero(scores >= kth)
        order = sel[np.argsort(-scores[sel], kind="stable")][:k]
    else:
        order = np.argsort(-scores, kind="stable")[:k]
    return docs[order], scores[order]
