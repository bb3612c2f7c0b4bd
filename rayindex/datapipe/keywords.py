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

Scale contract — two code paths, auto-routed on the measured vocabulary
size (the ``value_quantiles`` routing pattern, stats.py):

- **broadcast** (vocab ≤ ``vocab_cap``): the (vocab, df) table ships
  once via ``ray.put``; scoring is map-only, zero joins.
- **bucketed** (vocab > ``vocab_cap``, or forced): the df table NEVER
  reaches the driver.  A (doc, term, tf) triple pass feeds (a) a
  ``groupby(term).Count`` df table and (b) a distributed hash
  ``Dataset.join`` on ``term`` (left-outer, so ``min_df``-pruned terms
  keep the df=0 smoothing floor), then a bucketed
  ``groupby(hash(id)).map_groups`` takes the per-doc top-k.  Driver
  state: none beyond the routing count.  Both paths produce bitwise
  identical rows (same doubles, same tie ranks) — pytest-gated.

At 100-TB scale raise ``num_partitions`` with cluster size and pass
``min_df`` to shrink the joined df side (hapax terms are most of it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .text import _flat_tokens

__all__ = ["document_frequencies", "doc_term_tf", "tfidf_topk"]


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


def doc_term_tf(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, term, tf) Dataset — one row per distinct (doc, term) pair
    with its within-doc count.  Exact globally because a document's rows
    never split across batches."""

    def triples(batch: pa.Table) -> pa.Table:
        codes, _, doc_of, _, vocab = _flat_tokens(batch[text_col])
        if codes.size == 0:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        Kb = len(vocab)
        upairs, tf = np.unique(doc_of * Kb + codes, return_counts=True)
        p_doc = (upairs // Kb).astype(np.int64)
        p_code = (upairs % Kb).astype(np.int64)
        ids = batch[id_col].combine_chunks().take(pa.array(p_doc))
        return pa.table({id_col: ids,
                         "term": pc.take(vocab, pa.array(p_code)),
                         "tf": pa.array(tf.astype(np.int64))})

    return ds.map_batches(triples, batch_format="pyarrow",
                          zero_copy_batch=True)


def _join_partitions(requested: int | None) -> int:
    """Hash-join fan-out: ``None`` sizes to the cluster (one aggregator
    per core, capped) — a fixed large value deadlocks-by-contention on
    small clusters because every aggregator is an actor holding a CPU."""
    if requested is not None:
        return requested
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(64, cpus))


def _doc_bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable bucket assignment for doc ids (int: modulo; other: crc32)."""
    if ids.dtype.kind in "iu":
        return ids.astype(np.int64) % num_buckets
    import zlib

    import pandas as pd
    cat = pd.Categorical(ids)
    cb = np.asarray([zlib.crc32(str(c).encode()) % num_buckets
                     for c in cat.categories], np.int64)
    return cb[np.asarray(cat.codes, np.int64)]


def _tfidf_topk_bucketed(ds, k: int, text_col: str, id_col: str,
                         min_df: int, n_docs: int, num_partitions: int):
    """The no-driver-vocab path (module docstring): df via
    ``groupby(term).Count`` over the triple table, attached by a
    distributed left-outer hash join, per-doc top-k in bucketed
    reducers.  Bitwise-identical output to the broadcast path."""
    from ray.data.aggregate import Count

    triples = doc_term_tf(ds, text_col, id_col)
    dft = triples.groupby("term").aggregate(Count(alias_name="df"))
    if min_df > 1:
        dft = dft.map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], min_df)),
            batch_format="pyarrow", zero_copy_batch=True)
    joined = triples.join(dft, join_type="left_outer",
                          num_partitions=num_partitions, on=("term",))

    def score(batch: pa.Table) -> pa.Table:
        # left-outer null df = pruned/min_df-filtered term -> the df=0
        # smoothing floor, exactly the broadcast path's convention
        dfv = batch["df"].combine_chunks().fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((n_docs + 1.0) / (dfv + 1.0)) + 1.0
        b = _doc_bucket(
            batch[id_col].to_numpy(zero_copy_only=False), num_partitions)
        return pa.table({
            id_col: batch[id_col],
            "term": batch["term"],
            "score": pa.array(tf * idf),
            "_pruned": pa.array(dfv == 0),
            "_db": pa.array(b),
        })

    def topk(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        sc = g["score"].to_numpy(zero_copy_only=False)
        pr = g["_pruned"].to_numpy(zero_copy_only=False)
        enc = g["term"].combine_chunks().dictionary_encode()
        dvals = np.asarray(enc.dictionary.to_pylist(), object)
        drank = np.empty(len(dvals), np.int64)
        drank[np.argsort(dvals, kind="stable")] = np.arange(len(dvals))
        tcode = drank[enc.indices.to_numpy(zero_copy_only=False)
                      .astype(np.int64)]
        _, dcode = np.unique(ids, return_inverse=True)
        # tie order matches broadcast: score desc, in-vocab before
        # pruned, term asc within each class
        sel = np.lexsort((tcode, pr, -sc, dcode))
        dsorted = dcode[sel]
        first = np.searchsorted(dsorted, np.unique(dsorted))
        within = np.arange(sel.size) - np.repeat(
            first, np.diff(np.append(first, sel.size)))
        top = sel[within < k]
        return pa.table({
            id_col: pc.take(g[id_col].combine_chunks(), pa.array(top)),
            "rank": pa.array((within[within < k] + 1).astype(np.int32)),
            "term": pc.take(enc, pa.array(top)).cast(pa.string()),
            "score": pa.array(sc[top]),
        })

    return (joined.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_db")
            .map_groups(topk, batch_format="pyarrow"))


def tfidf_topk(ds, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id", min_df: int = 1,
               vocab_cap: int = 2_000_000, path: str | None = None,
               num_partitions: int | None = None):
    """Per-doc top-``k`` terms by tf-idf: returns a Dataset of
    (id, rank, term, score) rows (rank 1-based; docs with no tokens emit
    no rows).  ``min_df`` prunes the df table — pruned terms score with
    the df=0 smoothing floor.

    ``path``: ``None`` auto-routes — the vocabulary is counted
    DISTRIBUTED first and the driver-materializing broadcast path is
    only taken when it fits under ``vocab_cap``; ``"broadcast"`` /
    ``"bucketed"`` force a path (the bucketed path never counts, so
    forcing it skips the routing pass entirely)."""
    n_docs = ds.count()
    dfd = None
    if path is None:
        dfd = document_frequencies(ds, text_col).materialize()
        path = "broadcast" if dfd.count() <= vocab_cap else "bucketed"
    if path == "bucketed":
        return _tfidf_topk_bucketed(ds, k, text_col, id_col, min_df,
                                    n_docs, _join_partitions(num_partitions))
    if dfd is None:
        dfd = document_frequencies(ds, text_col)
    dft = dfd.to_pandas()
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
