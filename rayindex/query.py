"""Query classification and parsing → a small AST.

Reproduces the reference's dispatch and preprocessing semantics
(/root/reference/search/retrieval/retrieval_execution/retrieval_execution.py:53-94):

- proximity if the query starts ``#<digits>`` (helpers.py:182-185), parsed as
  ``#k(t1,t2)`` via ``re.findall('[a-zA-Z0-9]+')``
  (preprocessing.py:57-63) — terms are stemmed but NOT stopword-filtered;
- boolean if any of AND/OR/NOT appear (helpers.py:188-192), with
  whitespace-token scanning, parenthesis-position tracking, quoted-phrase
  grouping, and ``clean_term`` = strip-non-alpha + stem
  (preprocessing.py:88-113,127-130);
- phrase if a ``"`` is present: quoted phrases + residual single terms, each
  run through the full analysis chain (retrieval_execution.py:85-93);
- otherwise plain: each whitespace word through the full analysis chain
  (retrieval_execution.py:75-83; spellcheck intentionally omitted — SURVEY
  §2.2 M15, misleading on code identifiers).

Determinism notes (documented deviations from the reference, which is
nondeterministic across processes because it iterates Python *sets* of
strings): none needed at parse time — parsing itself is deterministic.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from rayindex import analysis
from rayindex.config import AnalyzerConfig

_PROX_HEAD = re.compile(r"^#(\d+)")
_PROX_PARTS = re.compile(r"[a-zA-Z0-9]+")
_BOOL_OPS = re.compile(r"(?=(AND|NOT|OR))")
_PHRASE = re.compile(r'"(.*?)"')
_NON_ALPHA = re.compile(r"[^a-zA-Z]+")


@dataclass
class ProximityQuery:
    k: int
    terms: list[str]


@dataclass
class BooleanQuery:
    # terms: one entry per operand — a 1-token list (single term) or an
    # n-token list (quoted phrase)
    terms: list[list[str]] = field(default_factory=list)
    operators: list[str] = field(default_factory=list)
    paren_positions: list[int] = field(default_factory=list)


@dataclass
class TermsQuery:
    """Plain or phrase query: list of token-lists (singletons and phrases),
    the reference's ``pre_processed_query`` shape."""

    parts: list[list[str]] = field(default_factory=list)


Query = ProximityQuery | BooleanQuery | TermsQuery


def _full_chain(text: str, cfg: AnalyzerConfig) -> list[str]:
    """apply_preprocessing equivalent — must be byte-identical to the build
    side (the engine shares analysis.tokenize_text; the reference keeps two
    hand-synced copies, helpers.py:49-58 vs preprocessing.py:115-124)."""
    return analysis.tokenize_text(text, cfg)


def clean_term(term: str, cfg: AnalyzerConfig) -> str:
    """Boolean-operand cleaner: strip non-alpha, lowercase, stem (reference
    preprocessing.py:127-130; nltk's stemmer lowercases implicitly)."""
    t = _NON_ALPHA.sub("", term).lower()
    if cfg.mode == "reference":
        t = analysis.stem_cached(t, cfg.stemmer)
    return t


def stem_only(term: str, cfg: AnalyzerConfig) -> str:
    """Proximity-term preprocessing: stem WITHOUT stopword removal
    (reference preprocessing.py:57-63)."""
    t = term.lower()
    if cfg.mode == "reference":
        t = analysis.stem_cached(t, cfg.stemmer)
    return t


def classify(query: str) -> str:
    if _PROX_HEAD.match(query):
        return "proximity"
    if _BOOL_OPS.findall(query):
        return "boolean"
    if '"' in query:
        return "phrase"
    return "term"


def parse_query(query: str, cfg: AnalyzerConfig | None = None) -> Query:
    cfg = cfg or AnalyzerConfig()
    kind = classify(query)
    if kind == "proximity":
        parts = _PROX_PARTS.findall(query)
        k = int(parts[0])
        return ProximityQuery(k=k, terms=[stem_only(t, cfg) for t in parts[1:3]])
    if kind == "boolean":
        ops = _BOOL_OPS.findall(query)
        terms: list[list[str]] = []
        parens: list[int] = []
        phrase: list[str] = []
        in_phrase = False
        i = 0
        for tok in query.split():
            if tok in ("AND", "OR", "NOT"):
                continue
            if "(" in tok:
                parens.append(i)
            has_quote = '"' in tok
            if has_quote and not in_phrase:
                in_phrase = True
                phrase = [clean_term(tok, cfg)]
            elif in_phrase:
                phrase.append(clean_term(tok, cfg))
                if has_quote:
                    in_phrase = False
                    terms.append(phrase)
            else:
                terms.append([clean_term(tok, cfg)])
            i += 1
        return BooleanQuery(terms=terms, operators=ops, paren_positions=parens)
    if kind == "phrase":
        found = _PHRASE.findall(query)
        residual = _PHRASE.sub("", query).split()
        parts = [p.strip() for p in (found + residual) if p and p.strip()]
        return TermsQuery(parts=[_full_chain(p, cfg) for p in parts])
    return TermsQuery(parts=[_full_chain(w, cfg) for w in query.split()])


def separate_mix(parts: list[list[str]]) -> tuple[list[str], list[list[str]]]:
    """Reference seperate_mix (helpers.py:332-348): 1-token sublists become
    single terms, longer ones phrases.  Empty sublists (all-stopword words)
    are dropped — the reference's LM filters them and its BM25 would crash
    on them (SURVEY §2.4 J6 note); dropping is the deterministic spec."""
    singles = [p[0] for p in parts if len(p) == 1]
    phrases = [p for p in parts if len(p) > 1]
    return singles, phrases
