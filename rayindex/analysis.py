"""Text analysis: tokenize → casefold → stopword-filter → stem, batched.

Semantics mirror the reference pipeline
(/root/reference/indexing/index_builder/helpers.py:49-58: ``tokenize →
case_folding → remove_stopwords → apply_stemming``; document tokenizer regex
``[¢£€\\w]+`` at helpers.py:29), re-expressed as a vectorized per-batch
kernel: one C-level regex pass per document, then numpy/pandas factorize +
lexsort to group token occurrences into per-(doc, term) postings with 1-based
positions over the *post-filter* token stream (positions are indexes into the
final preprocessed list, /root/reference/indexing/index_builder/index_build.py:26-38).

Analyzer modes (config.AnalyzerConfig):
- ``reference``: regex ``[¢£€\\w]+`` on raw text, lowercase, English stopword
  removal, Porter stem — reference document semantics.
- ``ascii``: ``[a-z0-9_]+`` over lowercased text, no stopwords/stemming.
  Exactly expressible as DuckDB ``regexp_extract_all(lower(text),
  '[a-z0-9_]+')`` — used for the SQL-oracle parity gate.
- ``code``: ``ascii`` plus snake_case/camelCase sub-token emission at the
  parent token's position (identifier-aware code search).

The stemmer term cache is a module-level dict: the vocabulary is tiny
relative to the token stream, so stemming cost is amortized to one stem per
distinct surface form per worker (the reference instead re-instantiated its
whole Preprocessing object per document,
/root/reference/indexing/index_builder/index_build.py:178).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayindex import porter
from rayindex.config import AnalyzerConfig

_REFERENCE_RE = re.compile(r"[¢£€\w]+")
_ASCII_RE = re.compile(r"[a-z0-9_]+")
_CODE_RAW_RE = re.compile(r"[A-Za-z0-9_]+")
_CAMEL_RE = re.compile(r"[a-z0-9]+|[A-Z][a-z0-9]*|[A-Z]+(?![a-z])")

# Standard English stopword list (Snowball project stop list, public domain —
# http://snowball.tartarus.org/algorithms/english/stop.txt).  Selectable via
# AnalyzerConfig.stopwords="snowball"; the default is the Glasgow IR list
# below, which is what the reference actually loads.
SNOWBALL_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves he him
his himself she her hers herself it its itself they them their theirs
themselves what which who whom this that these those am is are was were be
been being have has had having do does did doing would should could ought
i'm you're he's she's it's we're they're i've you've we've they've i'd you'd
he'd she'd we'd they'd i'll you'll he'll she'll we'll they'll isn't aren't
wasn't weren't hasn't haven't hadn't doesn't don't didn't won't wouldn't
shan't shouldn't can't cannot couldn't mustn't let's that's who's what's
here's there's when's where's why's how's a an the and but if or because as
until while of at by for with about against between into through during
before after above below to from up down in out on off over under again
further then once here there when where why how all any both each few more
most other some such no nor not only own same so than too very
""".split())


@lru_cache(maxsize=1)
def glasgow_stopwords() -> frozenset[str]:
    """The 570-word Glasgow IR stopword list (public resource,
    ir.dcs.gla.ac.uk; the reference loads the same list from its
    englishST.txt at indexing/index_builder/helpers.py:15-18) — the
    DEFAULT for reference-mode analysis so a user replaying reference
    queries gets the reference's exact post-stopword token stream.
    Stored as a restructured word-set data file under rayindex/data/."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "stopwords_glasgow.txt")
    return frozenset(open(path).read().split())


def stopword_set(cfg: AnalyzerConfig) -> frozenset[str]:
    return (SNOWBALL_STOPWORDS if cfg.stopwords == "snowball"
            else glasgow_stopwords())


# backwards-compatible alias (oracle/tests refer to the active default
# through stopword_set; STOPWORDS keeps the historical name pointing at
# the snowball list)
STOPWORDS = SNOWBALL_STOPWORDS

_STEM_CACHE: dict[tuple[str, str], str] = {}
_STEM_CACHE_MAX = 1 << 20


def stem_cached(token: str, mode: str = "nltk") -> str:
    key = (mode, token)
    s = _STEM_CACHE.get(key)
    if s is None:
        s = porter.stem(token, mode)
        if len(_STEM_CACHE) < _STEM_CACHE_MAX:
            _STEM_CACHE[key] = s
    return s


def tokenize_text(text: str, cfg: AnalyzerConfig) -> list[str]:
    """Full analysis chain for one document → final token list (build + query
    sides share this function, which the reference only achieves by keeping
    two hand-synced copies — helpers.py:49-58 vs preprocessing.py:115-124)."""
    if cfg.mode == "reference":
        stop = stopword_set(cfg)
        toks = [t.lower() for t in _REFERENCE_RE.findall(text)]
        toks = [t for t in toks if t not in stop]
        toks = [stem_cached(t, cfg.stemmer) for t in toks]
    elif cfg.mode == "ascii":
        toks = _ASCII_RE.findall(text.lower())
    elif cfg.mode == "code":
        # identifier-aware: keep the full (lowercased) token AND its
        # snake_case/camelCase sub-tokens, each occupying its own position.
        toks = []
        for raw in re.findall(r"[A-Za-z0-9_]+", text):
            low = raw.lower()
            toks.append(low)
            parts = [p.lower() for p in _CAMEL_RE.findall(raw.replace("_", " "))]
            if len(parts) > 1:
                toks.extend(parts)
    else:
        raise ValueError(f"unknown analyzer mode {cfg.mode!r}")
    if cfg.min_token_len > 1 or cfg.max_token_len < 64:
        toks = [t for t in toks if cfg.min_token_len <= len(t) <= cfg.max_token_len]
    return toks


@lru_cache(maxsize=8)
def _analyzer_fn(cfg: AnalyzerConfig):
    return lambda text: tokenize_text(text, cfg)


def _raw_tokens_arrow(content, cfg: AnalyzerConfig):
    """Arrow fast path for step 1 of tokenize_docs_grouped: raw-token
    extraction via RE2 split + dictionary-encode, entirely in C++.

    Validity per mode (the Python regexes are the semantics oracle;
    test_analysis pins fast path ≡ fallback on mixed corpora):

    - ``code``: ALWAYS — the token class ``[A-Za-z0-9_]+`` is pure ASCII,
      so every other codepoint is a separator in both engines.
    - ``reference``: when each row's non-ASCII chars are only ¢£€ — over
      that alphabet Python's ``[¢£€\\w]+`` reduces to the RE2-exact class
      ``[¢£€0-9A-Za-z_]+`` (general-unicode ``\\w`` needs Python's engine).
    - ``ascii``: all-ASCII rows only (``ascii_lower`` matches Python
      ``str.lower`` only there — e.g. U+0130 lowers INTO ascii 'i').

    Returns (codes int ndarray, uniques list[str], raw_counts int64
    ndarray) in document order, or None — caller falls back to the Python
    regex path."""
    if not isinstance(content, (pa.Array, pa.ChunkedArray)):
        return None
    arr = (content.combine_chunks()
           if isinstance(content, pa.ChunkedArray) else content)
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        return None
    if len(arr) == 0:
        return np.zeros(0, np.int64), [], np.zeros(0, np.int64)

    def _all_ascii(a) -> bool:
        # nulls tokenize to [] on both paths; exclude them from the test
        return bool(pc.all(pc.fill_null(pc.string_is_ascii(a), True)).as_py())

    if cfg.mode == "code":
        pat = "[^0-9A-Za-z_]+"
    elif cfg.mode == "reference":
        if not _all_ascii(arr) and not _all_ascii(
                pc.replace_substring_regex(arr, pattern="[¢£€]+",
                                           replacement="")):
            return None
        pat = "[^¢£€0-9A-Za-z_]+"
    elif cfg.mode == "ascii":
        if not _all_ascii(arr):
            return None
        arr = pc.ascii_lower(arr)
        pat = "[^a-z0-9_]+"
    else:
        return None
    lists = pc.split_pattern_regex(arr, pattern=pat)
    offs = np.asarray(lists.offsets)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    vals = lists.flatten()
    # split leaves empty pieces at row edges where separators touch them —
    # drop them and fix the per-row counts
    vlen = pc.binary_length(vals).to_numpy(zero_copy_only=False)
    emt = vlen == 0
    raw_counts = lens
    if emt.any():
        row_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        raw_counts = lens - np.bincount(row_of[emt], minlength=lens.size)
        vals = vals.filter(pa.array(~emt))
    if len(vals) == 0:
        return np.zeros(0, np.int64), [], raw_counts
    denc = vals.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    uniques = denc.dictionary.to_pylist()
    return codes, uniques, raw_counts


def tokenize_docs_grouped(
    texts, cfg: AnalyzerConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch of documents and group occurrences per (doc, term).

    Returns (n_tokens_per_doc, doc_idx, terms, tfs, pos_flat):
    - ``n_tokens_per_doc``: int64[n_docs] — final token count per doc.
    - ``doc_idx``: int64[n_groups] — batch-local doc index of each group.
    - ``terms``: object[n_groups] — the term of each group.
    - ``tfs``: int64[n_groups].
    - ``pos_flat``: int64[sum tfs] — ascending 1-based positions, concatenated
      group after group (groups ordered by (doc_idx, first occurrence... ) —
      ordered by (doc, term code) which is deterministic).
    """
    n_docs = len(texts)
    zcounts = np.zeros(n_docs, np.int64)
    z = np.zeros(0, np.int64)
    # 1. RAW tokens per doc.  All-ASCII Arrow batches take the C++ fast
    # path (RE2 split + dictionary encode, no Python string ever built for
    # a token occurrence); otherwise one C-level regex pass per document.
    # Either way the per-token Python work (lower / stopword test / stem)
    # runs below on the batch's UNIQUE surface forms instead of the full
    # occurrence stream (~30-100x fewer Python-level operations; the
    # stream is reconstructed by vectorized expansion).  Semantics stay
    # token-for-token identical to tokenize_text (test_analysis asserts
    # both paths).
    fast = _raw_tokens_arrow(texts, cfg)
    if fast is not None:
        codes, uniques, raw_counts = fast
        if int(raw_counts.sum()) == 0:
            return zcounts, z, np.zeros(0, object), z, z
    else:
        if not isinstance(texts, list):
            texts = texts.to_pylist()
        if cfg.mode == "reference":
            raw_lists = [_REFERENCE_RE.findall(t) if t else [] for t in texts]
        elif cfg.mode == "ascii":
            raw_lists = [_ASCII_RE.findall(t.lower()) if t else [] for t in texts]
        elif cfg.mode == "code":
            raw_lists = [_CODE_RAW_RE.findall(t) if t else [] for t in texts]
        else:
            raise ValueError(f"unknown analyzer mode {cfg.mode!r}")
        raw_counts = np.fromiter((len(l) for l in raw_lists), np.int64, n_docs)
        total_raw = int(raw_counts.sum())
        if total_raw == 0:
            return zcounts, z, np.zeros(0, object), z, z
        flat: list[str] = []
        for l in raw_lists:
            flat.extend(l)
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    # 2. expansion of each unique surface form → 0..k final tokens
    if cfg.mode == "reference":
        stop = stopword_set(cfg)
        stemmer = cfg.stemmer
        finals: list[list[str]] = []
        for u in uniques:
            lu = u.lower()
            finals.append([] if lu in stop else [stem_cached(lu, stemmer)])
    elif cfg.mode == "ascii":
        finals = [[u] for u in uniques]
    else:  # code: full lowercased token + snake/camel sub-tokens
        finals = []
        for u in uniques:
            exp = [u.lower()]
            parts = [p.lower() for p in _CAMEL_RE.findall(u.replace("_", " "))]
            if len(parts) > 1:
                exp.extend(parts)
            finals.append(exp)
    if cfg.min_token_len > 1 or cfg.max_token_len < 64:
        lo, hi = cfg.min_token_len, cfg.max_token_len
        finals = [[t for t in fl if lo <= len(t) <= hi] for fl in finals]
    exp_len = np.fromiter((len(f) for f in finals), np.int64, len(finals))
    flat_fin = [t for fl in finals for t in fl]
    if not flat_fin:
        return zcounts, z, np.zeros(0, object), z, z
    fin_codes_u, fin_uniques = pd.factorize(
        np.asarray(flat_fin, dtype=object), sort=True)
    exp_off = np.cumsum(exp_len) - exp_len
    # 3. vectorized occurrence expansion (raw order == final stream order)
    occ_len = exp_len[codes]
    counts = np.bincount(np.repeat(np.arange(n_docs, dtype=np.int64),
                                   raw_counts),
                         weights=occ_len, minlength=n_docs).astype(np.int64)
    total = int(occ_len.sum())
    if total == 0:
        return counts, z, np.zeros(0, object), z, z
    occ_cs = np.cumsum(occ_len) - occ_len
    within = np.arange(total, dtype=np.int64) - np.repeat(occ_cs, occ_len)
    tok_codes = fin_codes_u[np.repeat(exp_off[codes], occ_len) + within]
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    doc_starts = np.cumsum(counts) - counts
    pos = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, counts) + 1
    # 4. group occurrences per (doc, term code)
    order = np.lexsort((tok_codes, doc_idx))  # stable: positions ascend
    sd, sc, sp = doc_idx[order], tok_codes[order], pos[order]
    newgrp = np.empty(total, bool)
    newgrp[0] = True
    np.not_equal(sd[1:], sd[:-1], out=newgrp[1:])
    np.logical_or(newgrp[1:], sc[1:] != sc[:-1], out=newgrp[1:])
    starts = np.flatnonzero(newgrp)
    tfs = np.diff(np.append(starts, total))
    g_doc = sd[starts]
    g_terms = np.asarray(fin_uniques, dtype=object)[sc[starts]]
    return counts, g_doc, g_terms, tfs, sp
