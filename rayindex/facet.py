"""Faceted search: count the documents matching a boolean query per
metadata value (lang, repo, …) — the aggregation panel every search UI
puts beside results.  The reference joins result docIDs to its Postgres
article table per request (/root/reference/search/retrieval/views.py +
models.py); here the facet is computed from index-side state:

- ``lang`` (and any column with a dense doc-indexed bin): a pure
  ``np.bincount`` over the mmap'd ``lang_codes.bin`` slice of the match
  set — O(matches) work, no table scan, no shuffle.  This is the path a
  serving node takes per query.
- any other doc-store column: one Ray Data pass over doc-store parts
  with the sorted match-id array broadcast via ``ray.put`` (membership =
  two searchsorted calls per batch), per-batch partial counts combined
  by a tiny ``groupby(facet).sum`` — matches never leave the object
  store as rows, only (value, count) partials do.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from rayindex.config import AnalyzerConfig, SearchConfig


def _match_docs(index_dir: str, query: str,
                analyzer: AnalyzerConfig) -> np.ndarray:
    from rayindex.query import BooleanQuery, ProximityQuery, parse_query
    from rayindex.scoring import boolean_docs
    from rayindex.searcher import IndexReader

    r = IndexReader(index_dir)
    q = parse_query(query, analyzer)
    if isinstance(q, BooleanQuery):
        # facets summarize the FULL match set — the serving-path boolean
        # result cap (K5, 500) must not silently truncate the counts
        return np.sort(boolean_docs(r, q, r.stats,
                                    SearchConfig(boolean_cap=1 << 62)))
    if isinstance(q, ProximityQuery):
        # proximity facets count the candidate union of the window terms
        # (same relaxation the ranked path applies before the window test)
        terms = set(q.terms)
    else:
        # plain query: facet over every doc matching ANY query term (the
        # ranked search's candidate-union semantics)
        terms = {t for part in q.parts for t in part}
    hits = [p.docs for p in (r.lookup(t, need_positions=False)
                             for t in terms) if p is not None]
    if not hits:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(hits))


def facet_counts(index_dir: str, query: str, facet_col: str = "lang",
                 analyzer: AnalyzerConfig | None = None,
                 top_n: int | None = None) -> pa.Table:
    """(facet value, n_docs) over the docs matching a boolean ``query``
    (AND/OR/NOT, phrases).  Returns a pyarrow Table sorted by value.

    ``top_n``: cap the result to the N most frequent values via a NATIVE
    ``sort(descending).limit(top_n)`` on the counts Dataset (returned in
    count-descending order, value ascending on ties).  Without it, ALL
    distinct values land on the driver — fine for enum-like columns
    (lang), unbounded for ``repo``-like columns at scale; pass top_n for
    those."""
    analyzer = analyzer or AnalyzerConfig()
    docs = _match_docs(index_dir, query, analyzer)
    if facet_col == "lang":
        codes = np.memmap(os.path.join(index_dir, "stats",
                                       "lang_codes.bin"), np.int32, mode="r")
        with open(os.path.join(index_dir, "stats", "lang_vocab.json")) as f:
            vocab = json.load(f)
        hit = np.bincount(codes[docs], minlength=len(vocab) + 1)[1:]
        nz = np.flatnonzero(hit)
        vals = [vocab[i] for i in nz]
        if top_n is not None:
            order = np.lexsort((np.asarray(vals, object), -hit[nz]))[:top_n]
        else:
            order = np.argsort(np.asarray(vals, object))
        return pa.table({
            "lang": pa.array([vals[i] for i in order], pa.string()),
            "n_docs": pa.array(hit[nz][order].astype(np.int64)),
        })
    return _facet_generic(index_dir, docs, facet_col, top_n)


def _facet_generic(index_dir: str, docs: np.ndarray,
                   facet_col: str, top_n: int | None = None) -> pa.Table:
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    ids_ref = ray.put(docs)

    def partial(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) \
            else ids_ref
        b = batch["doc_id"].to_numpy()
        hit = np.searchsorted(ids, b, "left") != np.searchsorted(ids, b,
                                                                 "right")
        if not hit.any():
            return pa.table({facet_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = batch[facet_col].filter(pa.array(hit)) \
            .combine_chunks().dictionary_encode()
        n = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                        minlength=len(enc.dictionary))
        return pa.table({facet_col: enc.dictionary,
                         "n": pa.array(n.astype(np.int64))})

    ds = ray.data.read_parquet(
        os.path.join(index_dir, "doc_store"), columns=["doc_id", facet_col])
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(facet_col).aggregate(Sum("n")))
    if top_n is not None:
        # native top-N: the full distinct-value set never reaches the
        # driver — only top_n rows do
        out = out.sort(["sum(n)", facet_col],
                       descending=[True, False]).limit(top_n)
        rows = out.take_all()
    else:
        rows = sorted(out.take_all(), key=lambda r: r[facet_col])
    return pa.table({
        facet_col: pa.array([r[facet_col] for r in rows], pa.string()),
        "n_docs": pa.array([int(r["sum(n)"]) for r in rows], pa.int64()),
    })
