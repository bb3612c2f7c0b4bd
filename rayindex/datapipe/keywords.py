"""TF-IDF keyword extraction over a documents table.

The classic per-document salient-term operator (used for tagging,
faceting, weak labeling in training-data pipelines), Ray-Data-first:

- **df pass**: one ``map_batches`` emits per-batch partial document
  frequencies (distinct (doc, term) pairs combined within the batch), a
  native ``groupby(term)`` sums them — the only shuffle, carrying one
  row per distinct batch term.
- **score pass**: map-only.  The (vocab, df, tie-break rank) table ships
  once via ``ray.put``; each batch computes per-(doc, term) counts with
  one ``np.unique`` over packed dictionary codes, maps to the global
  vocab with vectorized ``pc.index_in``, and takes the per-doc top-k via
  a single ``np.lexsort`` — no Python per row.

Score: ``tf × (ln((N+1)/(df+1)) + 1)`` (raw term count × smoothed idf,
the sklearn ``TfidfTransformer(smooth_idf=True)`` convention) with ties
broken (score desc, term asc) — deterministic and reproducible in SQL.

Scale contract: the broadcast df table is the corpus vocabulary.  At
100-TB scale pass ``min_df`` to prune the hapax tail (most of the table;
pruned terms score with df=0 smoothing) or swap the broadcast for a
bucketed join on ``hash(term)``; both passes are otherwise unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .text import _flat_tokens

__all__ = ["document_frequencies", "tfidf_topk"]


def document_frequencies(ds, text_col: str = "text"):
    """Global (term, df) Dataset: df = number of documents containing the
    term at least once."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        codes, _, doc_of, _, vocab = _flat_tokens(batch[text_col])
        if codes.size == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        K = len(vocab)
        pairs = np.unique(doc_of * K + codes)
        cnt = np.bincount((pairs % K).astype(np.int64), minlength=K)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "term": pc.take(vocab, pa.array(nz)),
            "df": pa.array(cnt[nz].astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("term").aggregate(Sum("df", alias_name="df")))


def tfidf_topk(ds, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id", min_df: int = 1):
    """Per-doc top-``k`` terms by tf-idf: returns a Dataset of
    (id, rank, term, score) rows (rank 1-based; docs with no tokens emit
    no rows).  ``min_df`` prunes the broadcast df table — pruned terms
    score with the df=0 smoothing floor."""
    n_docs = ds.count()
    dft = document_frequencies(ds, text_col).to_pandas()
    if min_df > 1:
        dft = dft[dft["df"] >= min_df]
    vocab = pa.array(dft["term"].to_numpy(object), pa.string())
    dfs = dft["df"].to_numpy(np.int64)
    # tie-break rank = position in the lexicographically sorted vocab
    order = np.argsort(dft["term"].to_numpy(object), kind="stable")
    rank_of = np.empty(len(dft), np.int64)
    rank_of[order] = np.arange(len(dft))
    model = ray.put((vocab, dfs, rank_of, n_docs))

    def score(batch: pa.Table) -> pa.Table:
        gvocab, gdf, grank, N = ray.get(model)
        codes, _, doc_of, _, bvocab = _flat_tokens(batch[text_col])
        empty = pa.table({
            id_col: pa.array([], batch[id_col].type),
            "rank": pa.array([], pa.int32()),
            "term": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
        })
        if codes.size == 0:
            return empty
        Kb = len(bvocab)
        key = doc_of * Kb + codes
        upairs, tf = np.unique(key, return_counts=True)
        p_doc = (upairs // Kb).astype(np.int64)
        p_code = (upairs % Kb).astype(np.int64)
        gid = pc.index_in(bvocab, value_set=gvocab).to_numpy(
            zero_copy_only=False)
        gid = np.where(np.isnan(gid.astype(np.float64)), -1,
                       gid).astype(np.int64)[p_code]
        df_term = np.where(gid >= 0, gdf[np.maximum(gid, 0)], 0)
        idf = np.log((N + 1.0) / (df_term + 1.0)) + 1.0
        sc = tf.astype(np.float64) * idf
        if (gid < 0).any():
            # tie-break for terms outside the pruned vocab: fall back to
            # the batch-dictionary sort order, past every global rank
            brank = np.argsort(np.argsort(
                np.asarray(bvocab.to_pylist(), object), kind="stable"))
            trank = np.where(gid >= 0, grank[np.maximum(gid, 0)],
                             len(gdf) + brank[p_code])
        else:  # unpruned vocab (min_df=1): every term has a global rank
            trank = grank[gid]
        sel = np.lexsort((trank, -sc, p_doc))
        first = np.searchsorted(p_doc[sel], np.unique(p_doc))
        within = np.arange(sel.size) - np.repeat(
            first, np.diff(np.append(first, sel.size)))
        top = sel[within < k]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[p_doc[top]]),
            "rank": pa.array((within[within < k] + 1).astype(np.int32)),
            "term": pc.take(bvocab, pa.array(p_code[top])),
            "score": pa.array(sc[top]),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
