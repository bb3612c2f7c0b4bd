"""Query-side spell correction (reference M15 + J5).

Re-expresses the reference's pyspellchecker usage
(/root/reference/search/retrieval/retrieval_helpers/helpers.py:231,
spellcheck_query :236-270, apply_spellchecking :319-330) as a Norvig
edit-distance-1/2 corrector (public algorithm, norvig.com/spell-correct)
over an INJECTABLE frequency dictionary, with the NYSE ticker table
generalized to an alias map:

- alias hit        → replaced by its expansion (ticker → company name)
- protected term   → returned verbatim (the reference also skips terms
  contained in any company name and finance abbreviations)
- known term       → returned verbatim
- otherwise        → the known edit-1 candidate with the highest
  frequency, else edit-2, else the term itself.  Ties break
  (frequency desc, term asc) — deterministic, unlike dict order.

The default dictionary for an index is its own term dictionary weighted
by collection frequency (``from_index``), so corpus identifiers are
never "corrected" away — the failure mode that justified round 1's
omission on code corpora.
"""

from __future__ import annotations

import string

_LETTERS = string.ascii_lowercase + string.digits + "_"

_OPERATORS = {"AND", "OR", "NOT"}


def _edits1(word: str) -> set[str]:
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = [a + b[1:] for a, b in splits if b]
    transposes = [a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1]
    replaces = [a + c + b[1:] for a, b in splits if b for c in _LETTERS]
    inserts = [a + c + b for a, b in splits for c in _LETTERS]
    return set(deletes + transposes + replaces + inserts)


class SpellChecker:
    """Deterministic Norvig corrector over (term -> frequency)."""

    def __init__(self, freq: dict[str, int],
                 aliases: dict[str, str] | None = None,
                 protected: set[str] | None = None):
        self.freq = freq
        self.aliases = aliases or {}
        self.protected = protected or set()
        # terms appearing inside any alias expansion are kept verbatim
        # (reference: term contained in a company Name, helpers.py:323-327)
        self._alias_words = {w for name in self.aliases.values()
                             for w in name.lower().split()}

    @classmethod
    def from_index(cls, reader, aliases: dict[str, str] | None = None,
                   protected: set[str] | None = None) -> "SpellChecker":
        """Frequency dictionary = the index's own vocabulary weighted by
        collection frequency (cf)."""
        freq = {term: cf for term, cf in reader.iter_terms()}
        return cls(freq, aliases=aliases, protected=protected)

    def _known(self, words) -> list[str]:
        return [w for w in words if w in self.freq]

    def correction(self, term: str) -> str:
        if term in self.aliases:
            return self.aliases[term]
        if term in self.protected or term.lower() in self._alias_words:
            return term
        if term in self.freq:
            return term
        for cand_set in (self._known(_edits1(term)),
                         self._known(e2 for e1 in _edits1(term)
                                     for e2 in _edits1(e1))):
            if cand_set:
                return min(cand_set, key=lambda w: (-self.freq[w], w))
        return term

    def correct_query(self, query: str) -> tuple[str, bool]:
        """Word-wise correction of a query string (spellcheck_query
        semantics: split on whitespace, correct each token, report
        whether anything changed).  Boolean operators, quoted phrase
        punctuation and proximity syntax pass through untouched."""
        out = []
        for tok in query.split():
            if (tok in _OPERATORS or tok.startswith(("#", '"', "("))
                    or tok.endswith(('"', ")"))):
                out.append(tok)
            else:
                out.append(self.correction(tok))
        corrected = " ".join(out)
        return corrected, corrected != " ".join(query.split())


def suggest_terms(index_dir: str, prefix: str, k: int = 10):
    """Prefix autocomplete over the index vocabulary: top-k terms with
    ``prefix``, most-frequent (cf) first, ties broken by term — the
    search-box suggest the reference's UI would want next to its
    spellchecker.  Shard dicts are term-sorted parquet, so each shard
    contributes only its prefix RANGE (predicate-pushdown read of the
    term/cf columns: row groups outside the range never load); one Ray
    task per shard, the driver merges k-per-shard candidates.  Returns a
    pyarrow Table (rank, term, cf)."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    hi = prefix[:-1] + chr(ord(prefix[-1]) + 1) if prefix else None

    def shard_prefix(path: str):
        flt = (pads.field("term") >= prefix)
        if hi is not None:
            flt = flt & (pads.field("term") < hi)
        t = pads.dataset(path).to_table(columns=["term", "cf"], filter=flt)
        if t.num_rows == 0:
            return None
        # k best per shard is enough for a global top-k merge
        order = pc.sort_indices(t, sort_keys=[("cf", "descending"),
                                              ("term", "ascending")])
        return t.take(order.slice(0, k))

    task = ray.remote(num_cpus=1)(shard_prefix)
    parts = [p for p in ray.get([
        task.remote(f) for f in sorted(glob.glob(
            os.path.join(index_dir, "shards", "*.dict.parquet")))])
        if p is not None]
    if not parts:
        return pa.table({"rank": pa.array([], pa.int32()),
                         "term": pa.array([], pa.string()),
                         "cf": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    order = pc.sort_indices(t, sort_keys=[("cf", "descending"),
                                          ("term", "ascending")])
    t = t.take(order.slice(0, k))
    return pa.table({
        "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int32)),
        "term": t["term"],
        "cf": t["cf"],
    })
