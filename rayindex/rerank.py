"""Post-scoring rerank hook — the reference's title/recency rerank (F9/K6),
made deterministic and pluggable.

The reference multiplies each top-100 score by 1.10 per title word that
appears in the query and by a recency weight ``linspace(1.40, 0.8, 100)``
indexed by days-since-publication, using WALL-CLOCK today
(/root/reference/search/retrieval/retrieval_helpers/helpers.py:147-173) —
nondeterministic by design and therefore excluded from the rank-identity
gate (SURVEY §7.5.7).  This implementation takes ``today`` as an argument
(testable) and generalizes "title" to any per-doc text field (for a code
corpus: the file path).  Off by default everywhere.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

RECENCY_WEIGHTS = np.linspace(1.40, 0.8, 100)


def rerank_results(
    results: list[tuple[int, float]],
    doc_meta: dict[int, dict],
    query_terms: set[str],
    *,
    today: _dt.date | None = None,
    title_field: str = "path",
    date_field: str | None = None,
    title_weight: float = 1.10,
) -> list[tuple[int, float]]:
    """Apply the reference's multiplicative rerank to (doc_id, score) pairs.

    - per whitespace word of ``doc_meta[doc][title_field]`` (lowercased)
      found in ``query_terms``: score ×= title_weight  (reference loops
      per title word, so repeated matches stack — reproduced);
    - if ``date_field`` and ``today`` given and the doc is 0..99 days old:
      score ×= RECENCY_WEIGHTS[days_old].

    Returns pairs re-sorted by (score desc, doc_id asc).
    """
    out = []
    for doc_id, score in results:
        meta = doc_meta.get(doc_id, {})
        s = score
        title = str(meta.get(title_field) or "")
        for word in title.lower().split():
            if word in query_terms:
                s *= title_weight
        if date_field and today is not None:
            d = meta.get(date_field)
            if d is not None:
                days = (today - d).days
                if 0 <= days < RECENCY_WEIGHTS.size:
                    s *= float(RECENCY_WEIGHTS[days])
        out.append((doc_id, s))
    return sorted(out, key=lambda p: (-p[1], p[0]))
