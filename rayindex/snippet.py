"""Result snippets: for each (query, result doc) emit the token window
around the FIRST occurrence of any query term — the result-page preview
every search UI renders.  The reference renders whole articles from its
DB join (/root/reference/search/retrieval/views.py); a snippet is that
join plus a deterministic window rule, so it stays SQL-oracle-able:
index positions are 1-based ranks in the raw lowercased ascii token list
(the postings_probe gate proves it), hence

    snippet = ' '.join(tokens[max(p-w, 1) .. min(p+w, dl)])

computes identically from the index (positions come from the lazy
candidate-restricted positional fetch — only blocks holding result docs
decode) and from DuckDB list slicing over ``regexp_extract_all``.

Scale shape: k docs per query — the content fetch is the top-k
broadcast semi-join (fetch_doc_metadata's rule), positions decode only
the result docs' blocks, nothing scans the corpus."""
from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

_ASCII = re.compile(r"[a-z0-9_]+")


def _first_positions(reader, terms: list[str],
                     doc_ids: np.ndarray) -> dict[int, int]:
    """doc → min position of ANY of ``terms`` in it (docs without any
    term are absent)."""
    first: dict[int, int] = {}
    for p in reader.fetch_positions_many([(t, doc_ids) for t in terms]):
        if p is None or p.df == 0:
            continue
        starts = p.pos_slices()
        for i in range(p.df):
            d = int(p.docs[i])
            v = int(p.positions[int(starts[i])])  # per-doc positions ascend
            if d not in first or v < first[d]:
                first[d] = v
    return first


def doc_snippets(index_dir: str, reader, terms: list[str],
                 doc_ids: np.ndarray, window: int = 2) -> dict[int, str]:
    """doc → snippet string for the given result docs."""
    first = _first_positions(reader, terms, np.asarray(doc_ids, np.int64))
    if not first:
        return {}
    dset = pads.dataset(os.path.join(index_dir, "doc_store"))
    t = dset.to_table(columns=["doc_id", "content"],
                      filter=pc.field("doc_id").isin(list(first)))
    out: dict[int, str] = {}
    for d, content in zip(t["doc_id"].to_pylist(),
                          t["content"].to_pylist()):
        toks = _ASCII.findall((content or "").lower())
        p = first[d]  # 1-based
        lo = max(p - window, 1)
        hi = min(p + window, len(toks))
        out[d] = " ".join(toks[lo - 1:hi])
    return out
