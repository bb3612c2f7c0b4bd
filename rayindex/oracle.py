"""Oracle: a deliberately naive single-process engine — the executable spec.

Mirrors the reference's semantics structure-for-structure (dict positional
index built like index_extender, /root/reference/indexing/index_builder/
index_build.py:26-38; loop-based term-at-a-time scoring like
bm25_model.py/language_model.py/vsm_model.py) so the Ray engine can be tested
for rank identity against it.  Everything here is intentionally slow and
obvious; no numpy in the scoring paths.

Deterministic-izations of the reference (which iterates Python *sets* of
query terms, making multi-term rankings depend on PYTHONHASHSEED):

1. Query terms are processed in **sorted order** wherever the reference
   iterates a set (bm25_model.py:194 ``query = set(query)``; the
   ``split_list`` candidate-relax halves, helpers.py:196-198).
2. The reference computes idf in a loop and accidentally applies the *last*
   term's idf to every term (bm25_model.py:207 leaks into
   compute_document_scores at :275-287).  The spec uses **per-term idf** —
   the intended semantics, and the only deterministic choice.
3. Ties broken by (score desc, doc_id asc); the reference's stable sort
   leaves dict insertion order (helpers.py:133-135), which is
   set-iteration-dependent.
4. OOV terms: a phrase containing an out-of-vocabulary term matches nothing
   (the reference crashes on it, bm25_model.py phrase_rank positional fetch);
   an OOV boolean operand has an empty doc set (reference: KeyError).
5. Empty token-lists (all-stopword words) are dropped from the query parts
   (the reference's LM filters them, language_model.py:69-72; its BM25
   crashes on them).
"""

from __future__ import annotations

import math

import pyarrow as pa

from rayindex import analysis
from rayindex.config import AnalyzerConfig, SearchConfig
from rayindex.query import (
    BooleanQuery,
    ProximityQuery,
    TermsQuery,
    parse_query,
    separate_mix,
)


def consecutive_occ(position_lists: list[list[int]]) -> int:
    """Reference phrase-count kernel, reproduced exactly
    (/root/reference/search/retrieval/retrieval_helpers/helpers.py:96-115):
    count runs where adjacent sorted positions come from consecutive terms.
    Assumes a term does not repeat adjacently (reference comment :99)."""
    tot = len(position_lists)
    tot_app = sorted(sum(position_lists, []))
    count = 0
    consecutive = 0
    for i in range(len(tot_app) - 1):
        if tot_app[i + 1] - tot_app[i] == 1:
            for t in range(tot - 1):
                if tot_app[i] in position_lists[t] and tot_app[i + 1] in position_lists[t + 1]:
                    count += 1
                    if count == tot - 1:
                        consecutive += 1
                        count = 0
        else:
            count = 0
    return consecutive


class OracleEngine:
    """Builds the reference-shaped index from a documents table and answers
    queries with loop-based reference semantics."""

    def __init__(
        self,
        docs: pa.Table,
        analyzer: AnalyzerConfig | None = None,
        search: SearchConfig | None = None,
    ):
        self.analyzer = analyzer or AnalyzerConfig()
        self.cfg = search or SearchConfig()
        # docID assignment: dense 1-based in (repo, path) order — the
        # deterministic replacement for the reference's file read order
        # (index_build.py:130,199)
        langs = (docs["lang"].to_pylist() if "lang" in docs.column_names
                 else [None] * docs.num_rows)
        rows = sorted(
            zip(docs["repo"].to_pylist(), docs["path"].to_pylist(),
                docs["content"].to_pylist(), langs),
        )
        # index: {term: [df, {doc_id: [positions]}]} — reference shape
        # (/root/reference/indexing/index_writer/index_writer.py:5-8)
        self.index: dict[str, list] = {}
        self.doc_sizes: dict[int, int] = {}
        self.doc_meta: dict[int, tuple[str, str]] = {}
        self.doc_lang: dict[int, str | None] = {}
        for doc_id, (repo, path, content, lang) in enumerate(rows, start=1):
            tokens = analysis.tokenize_text(content or "", self.analyzer)
            self.doc_sizes[doc_id] = len(tokens)
            self.doc_meta[doc_id] = (repo, path)
            self.doc_lang[doc_id] = lang
            for pos, term in enumerate(tokens, start=1):
                if term not in self.index:
                    self.index[term] = [0, {}]
                entry = self.index[term]
                if doc_id not in entry[1]:
                    entry[0] += 1
                    entry[1][doc_id] = []
                entry[1][doc_id].append(pos)
        self.N = len(self.doc_sizes)
        self.l_tot = sum(self.doc_sizes.values())
        self.l_avg = self.l_tot / self.N if self.N else 0.0

    # -- posting access -----------------------------------------------------

    def _docs_of(self, term: str) -> list[int] | None:
        e = self.index.get(term)
        return list(e[1].keys()) if e else None

    def _tf(self, term: str, doc: int) -> int:
        e = self.index.get(term)
        if not e or doc not in e[1]:
            return 0
        return len(e[1][doc])

    # -- term weights -------------------------------------------------------

    def _w_reference(self, term: str, doc: int) -> float:
        """Reference BM25 variant (bm25_model.py:19-42): k=1.5, no b, +0.5
        in the denominator; idf = ln(1+(N-df+0.5)/(df+0.5)) per term."""
        tf = self._tf(term, doc)
        if tf == 0:
            return 0.0
        df = self.index[term][0]
        idf = math.log(1 + ((self.N - df + 0.5) / (df + 0.5)))
        d = self.doc_sizes[doc] / self.l_avg
        return idf * (tf / ((self.cfg.ref_k * d) + tf + 0.5))

    def _w_bm25(self, term: str, doc: int) -> float:
        """Standard BM25 (k1=1.2, b=0.75 per BASELINE.json), Robertson idf."""
        tf = self._tf(term, doc)
        if tf == 0:
            return 0.0
        df = self.index[term][0]
        idf = math.log(1 + ((self.N - df + 0.5) / (df + 0.5)))
        k1, b = self.cfg.k1, self.cfg.b
        norm = k1 * (1 - b + b * self.doc_sizes[doc] / self.l_avg)
        return idf * (tf * (k1 + 1)) / (tf + norm)

    def _w_phrase(self, scorer: str, doc: int, tf: int, df: int, mu: float) -> float:
        if scorer == "reference":
            idf = math.log(1 + ((self.N - df + 0.5) / (df + 0.5)))
            d = self.doc_sizes[doc] / self.l_avg
            return idf * (tf / ((self.cfg.ref_k * d) + tf + 0.5))
        if scorer == "bm25":
            idf = math.log(1 + ((self.N - df + 0.5) / (df + 0.5)))
            k1, b = self.cfg.k1, self.cfg.b
            norm = k1 * (1 - b + b * self.doc_sizes[doc] / self.l_avg)
            return idf * (tf * (k1 + 1)) / (tf + norm)
        # lm phrase weight (language_model.py:53-63)
        return math.log((tf / mu) * (self.l_tot / df) + 1)

    # -- candidate generation (reference J6 quirk) --------------------------

    def _candidates(self, terms_sorted: list[str],
                    allowed: set[int] | None = None) -> list[int] | None:
        """Intersection→pairwise-half→union relax (bm25_model.py:218-253 /
        language_model.py:147-229): AND first; under ``candidate_relax``
        docs, loosen.  ``allowed`` reproduces the date-filter semantics
        (generalized to metadata filters): each candidate set is
        intersected with the allowed docs BEFORE the relax thresholds are
        tested (bm25_model.py:210-232 date_bool branch)."""
        docs_in = {t: self._docs_of(t) for t in terms_sorted if self._docs_of(t) is not None}
        if not docs_in:
            return None

        def filt(s: set[int]) -> set[int]:
            return s & allowed if allowed is not None else s

        values = list(docs_in.values())
        relax = self.cfg.candidate_relax
        if len(values) > 1:
            i0 = filt(set.intersection(*map(set, values)))
            if len(i0) >= relax:
                return sorted(i0)
            half = len(values) // 2
            d1, d2 = values[:half], values[half:]
            i1 = filt(set.intersection(*map(set, d1)))
            i2 = filt(set.intersection(*map(set, d2)))
            if len(i1 | i2) >= relax:
                return sorted(i0 | i1 | i2)
            return sorted(filt(set.union(*map(set, values))))
        return sorted(filt(set(values[0])))

    # -- ranking paths ------------------------------------------------------

    def _rank_singles(self, singles: list[str], scorer: str,
                      fixed_docs: list[int] | None = None,
                      allowed: set[int] | None = None) -> dict[int, float] | None:
        if scorer in ("reference", "bm25"):
            terms = sorted(set(singles))
            if fixed_docs is not None:
                cand = sorted(fixed_docs)
            elif scorer == "bm25":
                # standard semantics: score the union (WAND-prunable)
                docs = [self._docs_of(t) for t in terms]
                docs = [d for d in docs if d is not None]
                if not docs:
                    return None
                u = set.union(*map(set, docs))
                cand = sorted(u & allowed if allowed is not None else u)
            else:
                cand = self._candidates(terms, allowed)
                if cand is None:
                    return None
            w = self._w_reference if scorer == "reference" else self._w_bm25
            return {doc: sum(w(t, doc) for t in terms) for doc in cand}
        if scorer in ("lm", "lm-dirichlet"):
            return self._rank_lm(singles, pyp=(scorer == "lm"), fixed_docs=fixed_docs,
                                 allowed=allowed)
        if scorer == "vsm":
            # the reference VSM path has no date handling (vsm_model.py) —
            # metadata filters intentionally don't apply
            return self._rank_vsm(singles, fixed_docs=fixed_docs)
        raise ValueError(f"unknown scorer {scorer!r}")

    def _rank_lm(self, query: list[str], pyp: bool,
                 fixed_docs: list[int] | None = None,
                 allowed: set[int] | None = None) -> dict[int, float] | None:
        """LM with Pitman-Yor (default, mu=1303 g=0.2) or Dirichlet
        (mu=1089) smoothing — language_model.py:18-51,231-257.  ``cf`` is
        df, reproducing the reference's A3 quirk (:26,45).  Terms iterate
        in sorted order INCLUDING duplicates (each duplicate re-adds its
        qtf-weighted score, as the reference's ``for term in query`` does)."""
        mu = self.cfg.lm_mu if pyp else 1089.0
        g = self.cfg.lm_g
        in_vocab = [t for t in query if t in self.index]
        if not in_vocab:
            return None
        if fixed_docs is not None:
            cand = sorted(fixed_docs)
        else:
            cand = self._candidates(sorted(set(query)), allowed)
            if cand is None:
                return None
        qtf = {t: query.count(t) for t in query}
        length_query = len(query)
        scores: dict[int, float] = {}
        for doc in cand:
            score = 0.0
            for term in sorted(query):
                if term not in self.index:
                    continue
                tf = self._tf(term, doc)
                cf = self.index[term][0]  # df-as-cf quirk
                if tf > 0:
                    if pyp:
                        dtf = max(tf - g * (tf ** g), 0.0)
                        score += qtf[term] * math.log((dtf * self.l_tot) / (mu * cf) + 1)
                    else:
                        score += qtf[term] * math.log((tf / mu) * (self.l_tot / cf) + 1)
            L_d = self.doc_sizes[doc]
            if pyp:
                d_ld = max(L_d - g * (L_d ** g), 0.0)
                prior = length_query * math.log(1 - (d_ld / (L_d + mu)))
            else:
                prior = length_query * math.log(mu / (L_d + mu))
            scores[doc] = prior + score
        return scores

    def _rank_vsm(self, query: list[str],
                  fixed_docs: list[int] | None = None) -> dict[int, float] | None:
        """VSM cosine (vsm_model.py:18-103).  The reference's vsm path is
        unreachable as written (it passes the nested query shape into dict
        lookups); the spec flattens to single terms, guards df==N and
        zero-magnitude vectors, and keeps the ≥0 clamp and log10 weights."""
        in_vocab = [t for t in query if t in self.index]
        if not in_vocab:
            return None
        if fixed_docs is not None:
            cand = sorted(fixed_docs)
        else:
            cand = sorted(set.union(*[set(self.index[t][1]) for t in set(in_vocab)]))
        scores: dict[int, float] = {}
        for doc in cand:
            dvec, qvec, dot = [], [], 0.0
            for term in query:
                if term not in self.index:
                    continue
                df = self.index[term][0]
                tf = self._tf(term, doc)
                if tf > 0 and df < self.N:
                    w_d = (1 + math.log10(tf)) * math.log10((self.N - df) / df)
                    w_d = max(w_d, 0.0)
                else:
                    w_d = 0.0
                w_q = (1 + math.log10(query.count(term))) * math.log10(self.N / df)
                dvec.append(w_d)
                qvec.append(w_q)
                dot += w_d * w_q
            mag = math.sqrt(sum(x * x for x in dvec)) * math.sqrt(sum(x * x for x in qvec))
            scores[doc] = dot / mag if mag > 0 else 0.0
        return scores

    def _rank_phrases(self, phrases: list[list[str]], scorer: str,
                      fixed_docs: list[int] | None = None,
                      allowed: set[int] | None = None) -> dict[int, float] | None:
        """bm25_model.py phrase_rank semantics, including the quirk that an
        empty intersection for ANY phrase discards all phrase scores
        (``return False`` mid-loop)."""
        mu = self.cfg.lm_mu
        scores: dict[int, float] = {}
        for phrase in phrases:
            docs_in = {t: self._docs_of(t) for t in phrase}
            if any(v is None for v in docs_in.values()):
                return None  # OOV term in phrase -> no phrase results (spec #4)
            inter_set = set.intersection(*map(set, docs_in.values())) if docs_in else set()
            if allowed is not None:  # date/metadata filter (bm25_model.py:334-339)
                inter_set &= allowed
            inter = sorted(inter_set)
            tf: dict[int, int] = {}
            df = 0
            for doc in inter:
                plist = [self.index[t][1][doc] for t in phrase]
                cons = consecutive_occ(plist)
                if cons > 0:
                    tf[doc] = cons
                    df += 1
            if not inter:
                return None  # reference returns False for the whole phrase set
            target = sorted(fixed_docs) if fixed_docs is not None else inter
            for doc in target:
                if doc in tf:
                    scores[doc] = scores.get(doc, 0.0) + self._w_phrase(scorer, doc, tf[doc], df, mu)
        return scores

    # -- boolean / proximity ------------------------------------------------

    def _phrase_docs(self, phrase: list[str]) -> list[int]:
        docs_in = {t: self._docs_of(t) for t in phrase}
        if any(v is None for v in docs_in.values()):
            return []
        inter = sorted(set.intersection(*map(set, docs_in.values()))) if docs_in else []
        out = []
        for doc in inter:
            if consecutive_occ([self.index[t][1][doc] for t in phrase]) > 0:
                out.append(doc)
        return out

    def _boolean_docs(self, q: BooleanQuery) -> list[int]:
        """apply_boolean_logic reproduced (boolean_retrieval.py:39-114):
        dict-keyed operand collapse, parenthesized-pair pre-grouping,
        left-fold of main operators, 500-doc cap."""
        appear: dict[str, list[int]] = {}
        for operand in q.terms:
            if len(operand) == 1:
                t = operand[0]
                appear[t] = self._docs_of(t) or []
            else:
                appear[" ".join(operand) + " "] = self._phrase_docs(operand)
        names = list(appear.keys())
        ops = q.operators
        all_docs = set(range(1, self.N + 1))
        if not appear:  # bare-operator query like "AND" — no operands
            return []
        if len(ops) == 1:
            vals = list(map(set, appear.values()))
            if ops[0] == "OR":
                out = sorted(set.union(*vals)) if vals else []
            elif ops[0] == "AND":
                out = sorted(set.intersection(*vals)) if vals else []
            else:  # NOT
                if len(appear) == 1:
                    out = sorted(all_docs - vals[0])
                else:
                    acc = vals[0]
                    for v in vals[1:]:
                        acc = acc - v
                    out = sorted(acc)
        elif len(names) == 2:
            out = sorted(set(appear[names[0]]) - set(appear[names[1]]))
        else:
            groups: list[set[int]] = []
            i = 0
            while i < len(names):
                if i in q.paren_positions and i + 1 < len(names):
                    a, b = set(appear[names[i]]), set(appear[names[i + 1]])
                    op = ops[i] if i < len(ops) else "OR"
                    groups.append(a | b if op == "OR" else a & b if op == "AND" else a - b)
                    i += 2
                else:
                    groups.append(set(appear[names[i]]))
                    i += 1
            main_ops = [ops[j] for j in range(len(ops)) if j not in q.paren_positions]
            acc: set[int] = set()
            for idx, op in enumerate(main_ops):
                if idx + 1 >= len(groups):
                    break
                # reference quirk (boolean_retrieval.py:97-113): an EMPTY
                # accumulator at any step restarts from groups[idx]
                left = groups[idx] if not acc else acc
                right = groups[idx + 1]
                acc = left | right if op == "OR" else left & right if op == "AND" else left - right
            out = sorted(acc)
        return out[: self.cfg.boolean_cap]

    def _proximity_docs(self, q: ProximityQuery) -> list[int]:
        e1, e2 = self.index.get(q.terms[0]), self.index.get(q.terms[1])
        if not e1 or not e2:
            return []
        common = sorted(set(e1[1]) & set(e2[1]))
        out = []
        for doc in common:
            p1, p2 = e1[1][doc], e2[1][doc]
            if any(abs(a - b) <= q.k for a in p1 for b in p2):
                out.append(doc)
        return out

    # -- public -------------------------------------------------------------

    def search(self, query: str, k: int | None = None, scorer: str | None = None,
               lang: str | None = None) -> list[tuple[int, float]]:
        """Returns [(doc_id, score)] ranked by (score desc, doc_id asc).

        ``lang`` is the engine's generalization of the reference's
        date-range filter (retrieval_execution.py:149-156): candidates are
        intersected with matching docs at the same points the reference
        applies ``date_ind``; an empty filter set short-circuits to no
        results; proximity and VSM ignore it (reference quirks)."""
        scorer = scorer or self.cfg.scorer
        allowed: set[int] | None = None
        if lang is not None:
            allowed = {d for d, lg in self.doc_lang.items() if lg == lang}
            if not allowed:
                return []
        q = parse_query(query, self.analyzer)
        # mini-index validity gate (retrieval_execution.py:139-147 +
        # views):  if NO query term exists in the vocabulary the reference
        # renders "no results" before any ranking path runs — including for
        # NOT queries whose boolean universe would otherwise be non-empty.
        if isinstance(q, ProximityQuery):
            all_terms = list(q.terms)
        elif isinstance(q, BooleanQuery):
            all_terms = [t for p in q.terms for t in p]
        else:
            all_terms = [t for p in q.parts for t in p]
        if not any(t in self.index for t in all_terms):
            return []
        if isinstance(q, ProximityQuery):
            docs = self._proximity_docs(q)
            return [(d, 0.0) for d in docs][: (k or len(docs))]
        if isinstance(q, BooleanQuery):
            docs = self._boolean_docs(q)
            if allowed is not None:  # language_model.py:168-171 equivalent
                docs = sorted(set(docs) & allowed)
            singles = [p[0] for p in q.terms if len(p) == 1]
            phrases = [p for p in q.terms if len(p) > 1]
            if singles:
                scores = self._rank_singles(singles, scorer, fixed_docs=docs) or {}
            elif phrases:
                scores = self._rank_phrases(phrases, scorer, fixed_docs=docs) or {}
            else:
                scores = {}
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
            return ranked[: (k or self.cfg.top_k)]
        parts = [p for p in q.parts if p]
        singles, phrases = separate_mix(parts)
        t_docs = self._rank_singles(singles, scorer, allowed=allowed) if singles else None
        p_docs = self._rank_phrases(phrases, scorer, allowed=allowed) if phrases else None
        if t_docs and p_docs:
            tot = {d: t_docs.get(d, 0.0) + p_docs.get(d, 0.0)
                   for d in set(t_docs) | set(p_docs)}
        elif t_docs:
            tot = t_docs
        elif p_docs:
            tot = p_docs
        else:
            return []
        cap = 20 if scorer == "vsm" else self.cfg.top_k
        ranked = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[: min(k or cap, cap)]
