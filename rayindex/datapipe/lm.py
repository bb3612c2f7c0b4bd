"""Corpus bigram language model for LM-based quality scoring.

The classic training-data filter (CCNet / Gopher style: score each
document by its cross-entropy under a corpus-level n-gram LM; outliers on
either end are junk or boilerplate), re-expressed Ray-Data-first:

- **train**: one ``map_batches`` pass emits within-batch-combined partial
  bigram counts ``(w1, w2, c)``; a native ``groupby(["w1","w2"])`` sum
  produces the global count table.  Context counts and vocabulary size
  derive from it.  The reference engine has no LM-scoring stage — this
  extends the repo's quality-filter family (text.quality_batch,
  text.repetition_batch).
- **score**: map-only.  The model (vocab, packed bigram keys, counts)
  ships once via ``ray.put``; every batch does vectorized
  ``pc.index_in`` vocab lookup + ``np.searchsorted`` bigram lookup —
  no Python per row or per token.

Per-doc score: cross-entropy in nats under add-alpha smoothing,
``H(d) = -(1/m) * sum ln((c(w1,w2)+a) / (ctx(w1)+a*V))`` over the doc's
``m`` consecutive token pairs (``ctx(w1) = sum_w2 c(w1,w2)``, ``V`` =
vocabulary size); docs with fewer than 2 tokens score 0.  Out-of-vocab
tokens (only possible when scoring off-corpus) get ``c=0`` / ``ctx=0``.

Scale contract — two scoring paths, auto-routed on the measured bigram
table size (the ``value_quantiles`` routing pattern, stats.py), composed
by :func:`lm_xent`:

- **broadcast** (table ≤ ``table_cap``): :func:`bigram_model` packs the
  counts once via ``ray.put``; scoring is map-only, zero joins.
- **bucketed** (table > ``table_cap``, or forced): the count table
  NEVER reaches the driver.  Per-doc distinct-bigram occurrence rows
  left-outer ``Dataset.join`` the pruned count table on (w1, w2) and
  the context table on (w1); per-pair log-prob contributions plus a
  zero row per document flow into one ``groupby(id)`` sum.  Driver
  state: the routing count and the scalar V.

Cross-path note: the bucketed path sums ``occ × lp`` per distinct
bigram where the broadcast path sums ``lp`` per occurrence in document
order — same value mathematically, last-ulp float differences possible
(pytest gates with tolerance; micro-unit-rounded outputs agree).
At 100-TB corpus scale raise ``min_count`` (hapax bigrams are most of
the table — it shrinks the joined side too) and ``num_partitions``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .text import _flat_tokens

__all__ = ["bigram_counts", "bigram_model", "score_xent",
           "score_xent_bucketed", "lm_xent", "perplexity_buckets",
           "top_bigrams"]


def bigram_counts(ds, text_col: str = "text"):
    """Global bigram count Dataset ``(w1, w2, c)`` over a documents table:
    within-batch combine first (np.unique over dictionary-code pairs), so
    the shuffle ships one row per DISTINCT batch bigram, not per token."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        codes, _, doc_of, _, vocab = _flat_tokens(batch[text_col])
        if codes.size < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        i = np.flatnonzero(doc_of[:-1] == doc_of[1:])
        K = len(vocab)
        key = codes[i] * K + codes[i + 1]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "w1": pc.take(vocab, pa.array(uk // K)),
            "w2": pc.take(vocab, pa.array(uk % K)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c")))


def bigram_model(ds, text_col: str = "text", min_count: int = 1,
                 counts_ds=None):
    """Train and package the model for broadcast: returns
    ``(model_ref, V)`` where ``model_ref`` is a ``ray.put`` handle to
    ``(vocab StringArray, packed sorted uint64 keys, bigram counts,
    per-vocab context counts, V)``.  ``V`` is the model vocabulary —
    every distinct token appearing in some bigram (w1 or w2 position),
    computed BEFORE pruning so smoothing mass is unaffected by
    ``min_count``; tokens occurring only in single-token documents are
    outside the model by definition.  ``counts_ds``: a precomputed
    :func:`bigram_counts` Dataset (avoids a second corpus scan when the
    caller already materialized it, e.g. :func:`lm_xent` routing)."""
    bt = (counts_ds if counts_ds is not None
          else bigram_counts(ds, text_col)).to_pandas()
    w1 = bt["w1"].to_numpy(object)
    w2 = bt["w2"].to_numpy(object)
    c = bt["c"].to_numpy(np.int64)
    vocab = pa.array(np.unique(np.concatenate([w1, w2])), pa.string()) \
        if len(bt) else pa.array([], pa.string())
    V = len(vocab)
    g1 = pc.index_in(pa.array(w1, pa.string()),
                     value_set=vocab).to_numpy(zero_copy_only=False)
    g2 = pc.index_in(pa.array(w2, pa.string()),
                     value_set=vocab).to_numpy(zero_copy_only=False)
    # context counts over the FULL table, then prune the bigram rows
    ctx = np.zeros(V, np.int64)
    if len(bt):
        np.add.at(ctx, g1.astype(np.int64), c)
    keep = c >= min_count
    packed = g1[keep].astype(np.uint64) * np.uint64(V) \
        + g2[keep].astype(np.uint64)
    order = np.argsort(packed)
    model = (vocab, packed[order], c[keep][order], ctx, V)
    return ray.put(model), V


def score_xent(ds, model_ref, alpha: float = 0.1, text_col: str = "text",
               id_col: str = "doc_id"):
    """Map-only per-doc cross-entropy under the broadcast bigram model:
    returns a Dataset of ``(id, n_bigrams, xent)`` (nats; 0 when the doc
    has < 2 tokens)."""

    def score(batch: pa.Table) -> pa.Table:
        vocab, packed, cnts, ctx, V = ray.get(model_ref)
        codes, _, doc_of, n_docs, bvocab = _flat_tokens(batch[text_col])
        m = np.zeros(n_docs, np.int64)
        h = np.zeros(n_docs, np.float64)
        if codes.size >= 2 and V:
            gid = pc.index_in(bvocab, value_set=vocab).to_numpy(
                zero_copy_only=False)
            gid = np.where(np.isnan(gid.astype(np.float64)), -1,
                           gid).astype(np.int64)
            g = gid[codes]
            i = np.flatnonzero(doc_of[:-1] == doc_of[1:])
            g1, g2 = g[i], g[i + 1]
            c = np.zeros(i.size, np.float64)
            ok = (g1 >= 0) & (g2 >= 0)
            if ok.any():
                pk = g1[ok].astype(np.uint64) * np.uint64(V) \
                    + g2[ok].astype(np.uint64)
                pos = np.searchsorted(packed, pk)
                pos = np.minimum(pos, max(len(packed) - 1, 0))
                hit = (packed[pos] == pk) if len(packed) else \
                    np.zeros(pk.size, bool)
                c_ok = np.zeros(pk.size, np.float64)
                c_ok[hit] = cnts[pos[hit]]
                c[ok] = c_ok
            ctxc = np.where(g1 >= 0, ctx[np.maximum(g1, 0)], 0) \
                .astype(np.float64)
            lp = np.log((c + alpha) / (ctxc + alpha * V))
            pd_doc = doc_of[i]
            m = np.bincount(pd_doc, minlength=n_docs).astype(np.int64)
            s = np.bincount(pd_doc, weights=lp, minlength=n_docs)
            mf = m.astype(np.float64)
            h = np.divide(-s, mf, out=np.zeros_like(mf), where=mf > 0)
        return pa.table({
            id_col: batch[id_col],
            "n_bigrams": pa.array(m),
            "xent": pa.array(h),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def score_xent_bucketed(ds, alpha: float = 0.1, text_col: str = "text",
                        id_col: str = "doc_id", min_count: int = 1,
                        num_partitions: int | None = None, counts_ds=None):
    """The no-driver-table scoring path (module docstring): per-doc
    distinct-bigram occurrence rows left-outer hash-join the pruned
    count table on (w1, w2) and the context table on (w1); one
    ``groupby(id)`` sum (seeded with a zero row per doc so short docs
    emit ``(id, 0, 0.0)``) finishes.  Trains AND scores the corpus —
    the bucketed analog of ``bigram_model`` + ``score_xent``."""
    from ray.data.aggregate import Count, Sum

    from .keywords import _join_partitions

    P = _join_partitions(num_partitions)
    bc = counts_ds if counts_ds is not None else bigram_counts(ds, text_col)
    bc = bc.materialize()  # feeds V, ctx, pruned counts — scan it once
    # V: distinct tokens in the model vocabulary (either position),
    # BEFORE pruning — distributed count, never a driver vocab list
    vocab_n = (bc.select_columns(["w1"]).rename_columns({"w1": "w"})
               .union(bc.select_columns(["w2"]).rename_columns({"w2": "w"}))
               .groupby("w").aggregate(Count(alias_name="n")))
    V = vocab_n.count()
    ctxd = bc.groupby("w1").aggregate(Sum("c", alias_name="ctxc"))
    bcp = bc
    if min_count > 1:
        bcp = bc.map_batches(
            lambda t: t.filter(pc.greater_equal(t["c"], min_count)),
            batch_format="pyarrow", zero_copy_batch=True)

    def pair_rows(batch: pa.Table) -> pa.Table:
        codes, _, doc_of, _, vocab = _flat_tokens(batch[text_col])
        if codes.size < 2:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "occ": pa.array([], pa.int64())})
        i = np.flatnonzero(doc_of[:-1] == doc_of[1:])
        K = np.int64(len(vocab))
        key = (doc_of[i] * K + codes[i]) * K + codes[i + 1]
        uk, occ = np.unique(key, return_counts=True)
        d = uk // (K * K)
        w1c = (uk // K) % K
        w2c = uk % K
        ids = batch[id_col].combine_chunks().take(pa.array(d))
        return pa.table({id_col: ids,
                         "w1": pc.take(vocab, pa.array(w1c)),
                         "w2": pc.take(vocab, pa.array(w2c)),
                         "occ": pa.array(occ.astype(np.int64))})

    pairs = ds.map_batches(pair_rows, batch_format="pyarrow",
                           zero_copy_batch=True)
    j = (pairs.join(bcp, join_type="left_outer", num_partitions=P,
                    on=("w1", "w2"))
         .join(ctxd, join_type="left_outer", num_partitions=P,
               on=("w1",)))

    def contrib(batch: pa.Table) -> pa.Table:
        occ = batch["occ"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c0 = batch["c"].combine_chunks().fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        x0 = batch["ctxc"].combine_chunks().fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lp = np.log((c0 + alpha) / (x0 + alpha * V))
        return pa.table({id_col: batch[id_col],
                         "s": pa.array(occ * lp),
                         "m": pa.array(occ.astype(np.int64))})

    def zero_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({id_col: batch[id_col],
                         "s": pa.array(np.zeros(n)),
                         "m": pa.array(np.zeros(n, np.int64))})

    agg = (j.map_batches(contrib, batch_format="pyarrow",
                         zero_copy_batch=True)
           .union(ds.map_batches(zero_rows, batch_format="pyarrow",
                                 zero_copy_batch=True))
           .groupby(id_col)
           .aggregate(Sum("s", alias_name="s"), Sum("m", alias_name="m")))

    def finish(batch: pa.Table) -> pa.Table:
        m = batch["m"].combine_chunks().fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = batch["s"].combine_chunks().fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        mf = m.astype(np.float64)
        h = np.divide(-s, mf, out=np.zeros_like(mf), where=mf > 0)
        return pa.table({id_col: batch[id_col],
                         "n_bigrams": pa.array(m),
                         "xent": pa.array(h)})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def lm_xent(ds, alpha: float = 0.1, min_count: int = 1,
            text_col: str = "text", id_col: str = "doc_id",
            table_cap: int = 5_000_000, path: str | None = None,
            num_partitions: int | None = None):
    """Train + score composed, auto-routed (module docstring): the
    bigram table is counted DISTRIBUTED first and the
    driver-materializing broadcast path is only taken when it fits
    under ``table_cap``; ``path`` forces (forcing ``"bucketed"`` skips
    the routing pass).  Returns the ``(id, n_bigrams, xent)`` Dataset
    of :func:`score_xent`."""
    bc = None
    if path is None:
        bc = bigram_counts(ds, text_col).materialize()
        path = "broadcast" if bc.count() <= table_cap else "bucketed"
    if path == "bucketed":
        return score_xent_bucketed(ds, alpha, text_col, id_col, min_count,
                                   num_partitions, counts_ds=bc)
    model_ref, _ = bigram_model(ds, text_col, min_count, counts_ds=bc)
    return score_xent(ds, model_ref, alpha, text_col, id_col)


def perplexity_buckets(ds, n_buckets: int = 3, alpha: float = 0.1,
                       min_count: int = 1, text_col: str = "text",
                       id_col: str = "doc_id",
                       table_cap: int = 5_000_000,
                       path: str | None = None):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4: cut
    the corpus into head/middle/tail by LM perplexity; the head is the
    classic pretraining-quality slice).  Composes the verified pieces:
    :func:`lm_xent` scores every doc, scores are micro-rounded to int
    micro-nats (the corpus float-exactness convention, so the cuts and
    labels are integer-exact and SQL-reproducible), the ``n_buckets-1``
    cut values come from the EXACT distributed quantiles of
    ``stats.value_quantiles`` (driver holds the cut values only), and a
    map-only pass labels each doc ``0 = head (lowest cross-entropy) …
    n_buckets-1 = tail``.  Ties AT a cut go to the lower bucket
    (strict ``>``).  Returns (id, xent_micro, bucket int32)."""
    from .stats import value_quantiles

    scored = lm_xent(ds, alpha, min_count, text_col, id_col,
                     table_cap, path)

    def micro(batch: pa.Table) -> pa.Table:
        x = batch["xent"].to_numpy(zero_copy_only=False) \
            .astype(np.float64) * 1e6
        xm = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
        return pa.table({id_col: batch[id_col], "xent_micro": pa.array(xm)})

    # one row of two ints per doc: cheap to pin, and it feeds both the
    # quantile pass and the labeling pass (lm scoring runs once)
    mds = scored.map_batches(micro, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    qs = tuple(j / n_buckets for j in range(1, n_buckets))
    cuts = np.sort(value_quantiles(mds, "xent_micro", qs)["value"]
                   .to_numpy(np.int64))

    def label(batch: pa.Table) -> pa.Table:
        xm = batch["xent_micro"].to_numpy(zero_copy_only=False)
        b = (xm[:, None] > cuts[None, :]).sum(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    return mds.map_batches(label, batch_format="pyarrow",
                           zero_copy_batch=True)


def top_bigrams(ds, n: int = 20, text_col: str = "text"):
    """Corpus-wide top-``n`` bigram collocations by count (ties: w1 asc,
    w2 asc) — the n-gram-resource view of :func:`bigram_counts`.  The
    cut is a NATIVE ``sort(descending).limit(n)``: the full count table
    never reaches the driver, only ``n`` rows do."""
    return (bigram_counts(ds, text_col)
            .sort(["c", "w1", "w2"], descending=[True, False, False])
            .limit(n))
