"""Sequence packing for LLM pretraining — concatenate every document's
token stream in doc order and cut it into fixed-length training
sequences (the GPT-style "concat and chunk" pack), emitting which span
of which document lands in which sequence.

The hard part at scale is the GLOBAL PREFIX SUM of token counts: each
doc's start offset in the virtual concatenated stream depends on every
doc before it.  Classic two-level scan, Ray-Data-shaped:

  1. one ``map_batches`` pass counts tokens per doc (no shuffle),
  2. a ``groupby(range_id).sum`` over coarse id ranges produces O(ranges)
     partial sums; the driver prefix-sums THAT (ranges ~1M docs each, so
     driver state is thousands of ints at 10^9 docs, never O(n_docs)),
  3. the broadcast (range → base offset) table re-enters a
     ``groupby(range_id).map_groups`` pass where each range computes its
     in-range cumsum and cuts chunk spans vectorized.

One shuffle total (the range groupby), driver holds only range bases.
Output rows: (chunk_id, doc_id, tok_start, tok_len) — a doc crossing a
chunk boundary emits one row per chunk it touches; the final partial
chunk is kept.  Deterministic: doc order is id order, token counts match
the ascii-oracle rule, so the whole packing is SQL-expressible (window
cumsum + generate_series — see __ray_entry__ sequence_pack oracle).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayindex.datapipe.text import token_count_batch

_RANGE_DOCS = 1 << 20  # ids per prefix-sum range (~1M docs)


def _chunk_spans(ids: np.ndarray, counts: np.ndarray, bases: np.ndarray,
                 seq_len: int) -> pd.DataFrame:
    """Vectorized span cut for docs with global start offsets ``bases``:
    doc i covers chunks [bases[i]//L .. (bases[i]+counts[i]-1)//L]."""
    keep = counts > 0
    ids, counts, bases = ids[keep], counts[keep], bases[keep]
    c0 = bases // seq_len
    c1 = (bases + counts - 1) // seq_len
    reps = (c1 - c0 + 1).astype(np.int64)
    doc_rep = np.repeat(np.arange(ids.size), reps)
    # chunk index within each doc's run: 0..reps-1
    run_off = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
    chunk = c0[doc_rep] + run_off
    seg_start = np.maximum(chunk * seq_len - bases[doc_rep], 0)
    seg_end = np.minimum((chunk + 1) * seq_len - bases[doc_rep],
                         counts[doc_rep])
    return pd.DataFrame({
        "chunk_id": chunk.astype(np.int64),
        "doc_id": ids[doc_rep],
        "tok_start": seg_start.astype(np.int64),
        "tok_len": (seg_end - seg_start).astype(np.int64),
    })


def pack_sequences(ds, seq_len: int, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   range_docs: int = _RANGE_DOCS):
    """Pack a documents Dataset into fixed-``seq_len`` training sequences
    (ascii token rule); returns a Dataset of
    (chunk_id, doc_id, tok_start, tok_len)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def count(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch, text_col=text_col, id_col=id_col)
        rng = pa.compute.divide(t[id_col], pa.scalar(range_docs, pa.int64()))
        return t.select([id_col, "n_tokens"]).append_column("range_id", rng)

    counts = ds.map_batches(count, batch_format="pyarrow")
    counts = counts.materialize()  # consumed twice: range sums + packing
    sums = counts.groupby("range_id").aggregate(Sum("n_tokens")).take_all()
    sums.sort(key=lambda r: r["range_id"])
    range_ids = np.asarray([r["range_id"] for r in sums], np.int64)
    totals = np.asarray([r["sum(n_tokens)"] for r in sums], np.int64)
    base_of = dict(zip(range_ids.tolist(),
                       (np.cumsum(totals) - totals).tolist()))
    bases_ref = ray.put(base_of)

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(bases_ref) if isinstance(
            bases_ref, ray.ObjectRef) else bases_ref
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy(np.int64)
        n = g["n_tokens"].to_numpy(np.int64)
        base = bases[int(g["range_id"].iloc[0])] + (np.cumsum(n) - n)
        return _chunk_spans(ids, n, base, seq_len)

    return counts.groupby("range_id").map_groups(pack, batch_format="pandas")


def chunk_documents(ds, window: int = 64, stride: int = 48,
                    text_col: str = "text", id_col: str = "doc_id"):
    """RAG-style sliding-window chunking: split each document's token
    stream into overlapping windows of ``window`` tokens advancing by
    ``stride`` (the retrieval-corpus preparation step; overlap =
    window − stride keeps boundary context retrievable).

    Map-only and fully vectorized: chunk starts come from one
    repeat/cumsum ladder over per-doc token counts, chunk text is
    rebuilt with one gather + ``pc.binary_join_element_wise``-free
    ListArray join — no Python per chunk.  Chunk ``j`` of a doc with
    ``n`` tokens covers ``[j·stride, min(j·stride + window, n))``;
    ``j`` runs to ``(n − window + stride − 1) // stride`` when
    ``n > window`` (every token covered, last chunk may be short), 0
    otherwise.  Token-less docs emit nothing.  Output: (id, chunk_id,
    start_tok, n_tokens, chunk_text) with space-joined ascii tokens —
    the same reconstruction contract as spans.dedup_substrings."""
    import pyarrow.compute as pc

    from .text import _flat_tokens

    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")

    def chunk(batch: pa.Table) -> pa.Table:
        codes, _, doc_of, n_docs, vocab = _flat_tokens(batch[text_col])
        empty = pa.table({
            id_col: pa.array([], batch[id_col].type),
            "chunk_id": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
        if codes.size == 0:
            return empty
        n = np.bincount(doc_of, minlength=n_docs)  # tokens per doc
        nz = np.flatnonzero(n)
        nn = n[nz]
        doc_start = np.concatenate([[0], np.cumsum(n)])[nz]
        jmax = np.where(nn > window,
                        (nn - window + stride - 1) // stride, 0)
        n_chunks = jmax + 1
        ch_doc = np.repeat(np.arange(nz.size), n_chunks)
        grp_start = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        within = np.arange(ch_doc.size) - np.repeat(grp_start, n_chunks)
        start = within * stride
        clen = np.minimum(window, nn[ch_doc] - start)
        # gather: token index ladder per chunk
        offs = np.concatenate([[0], np.cumsum(clen)])
        idx = (np.arange(offs[-1]) - np.repeat(offs[:-1], clen)
               + np.repeat(doc_start[ch_doc] + start, clen))
        toks = pc.take(vocab, pa.array(codes[idx]))
        la = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), toks)
        txt = pc.binary_join(la, " ")
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[nz[ch_doc]]),
            "chunk_id": pa.array(within.astype(np.int64)),
            "start_tok": pa.array(start.astype(np.int64)),
            "n_tokens": pa.array(clen.astype(np.int64)),
            "chunk_text": txt,
        })

    return ds.map_batches(chunk, batch_format="pyarrow",
                          zero_copy_batch=True)
