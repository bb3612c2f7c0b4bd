"""Winnowing fingerprints + duplicated-passage statistics.

Whole-document near-dup (MinHash / SimHash / n-gram Jaccard,
datapipe/dedup.py) misses PARTIAL duplication — a license header, a
README pasted into a thousand repos, one copied function — which is
what actually poisons training data at the passage level (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better").
The classic substring-fingerprint algorithm is winnowing (Schleimer,
Wilkerson, Aiken, SIGMOD 2003 — the MOSS fingerprint): hash every
k-token gram (Karp-Rabin over FNV-1a token hashes), slide a w-gram
window, keep each window's minimum gram hash (leftmost on ties).
Guarantee: any duplicated token run of length ≥ w+k-1 tokens shares at
least one selected fingerprint between the copies; selected density is
~2/(w+1) per token, so downstream exchanges carry O(tokens/w)
(doc_id, pos, fp) rows — never text.

Scale shape: extraction is a stateless ``map_batches`` pass (numpy
sliding-window argmin per doc); duplicate detection is ONE
``groupby(fp)`` over the fingerprint rows; the per-doc duplication
profile is ONE ``groupby(doc_id)`` over the tagged rows.  No driver
state; a hot fingerprint (the license header) is one uint64 group whose
rows are (id, count) pairs, not documents.

Bit-reproducible in SQL: token hashes are FNV-1a (the ``th`` CTE twin
in __ray_entry__), gram hashes Karp-Rabin base 1000003 mod 2**64, the
window pick is the leftmost minimum — see oracle_sql()'s
winnow_fingerprints / winnow_dup_stats.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayindex.datapipe.text import _ASCII, hash_token

_B = np.uint64(1000003)


def _gram_hashes(hs: np.ndarray, k: int) -> np.ndarray:
    """Karp-Rabin hash of every k-gram of ``hs`` (uint64 wraparound),
    vectorized over positions: Horner over the k lanes."""
    m = hs.size - k + 1
    g = np.zeros(m, np.uint64)
    for j in range(k):
        g = g * _B + hs[j:j + m]
    return g


def winnow_batch(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 4,
                 window: int = 4) -> pa.Table:
    """Per-doc winnowing picks as (id, pos, fp) rows; ``pos`` is the
    1-based gram index (token index of the gram's first token).  Docs
    with fewer than k tokens emit no rows."""
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_id, out_pos, out_fp = [], [], []
    np_err = np.seterr(over="ignore")  # uint64 wraparound IS the hash ring
    for did, t in zip(ids, texts):
        toks = _ASCII.findall(t.lower()) if t else []
        if len(toks) < k:
            continue
        hs = np.fromiter((hash_token(x) for x in toks), np.uint64, len(toks))
        g = _gram_hashes(hs, k)
        if g.size <= window:
            pos = np.asarray([int(np.argmin(g))])
        else:
            win = np.lib.stride_tricks.sliding_window_view(g, window)
            pos = np.unique(np.arange(win.shape[0]) + win.argmin(axis=1))
        out_id.append(np.full(pos.size, did, ids.dtype))
        out_pos.append(pos + 1)
        out_fp.append(g[pos])
    np.seterr(**np_err)
    cat = (lambda parts, dt: np.concatenate(parts) if parts
           else np.empty(0, dt))
    return pa.table({
        id_col: pa.array(cat(out_id, ids.dtype)),
        "pos": pa.array(cat(out_pos, np.int64).astype(np.int64)),
        "fp": pa.array(cat(out_fp, np.uint64)),
    })


def winnow_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 4, window: int = 4):
    """Dataset of winnowing fingerprints (id_col, pos, fp)."""
    return ds.map_batches(
        lambda b: winnow_batch(b, text_col, id_col, k, window),
        batch_format="pyarrow", zero_copy_batch=True)


def duplicate_span_stats(ds, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 4,
                         window: int = 4):
    """Per-doc duplicated-passage profile: (id_col, n_fps, n_dup_fps)
    where n_dup_fps counts this doc's fingerprints that also occur in at
    least one OTHER doc.  n_dup_fps/n_fps is the doc's copied-content
    fraction — the passage-level filter signal whole-doc near-dup can't
    produce.  Two native groupby exchanges over O(tokens/window) rows;
    docs with < k tokens (no grams) emit no row."""
    import pandas as pd

    fps = winnow_fingerprints(ds, text_col, id_col, k, window)

    def tag(g: pd.DataFrame) -> pd.DataFrame:
        # one fingerprint's global occurrence list -> tagged (doc, dup)
        dup = g[id_col].nunique() > 1
        return pd.DataFrame({id_col: g[id_col], "dup": dup})

    def prof(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: [g[id_col].iloc[0]],
            "n_fps": np.asarray([len(g)], np.int64),
            "n_dup_fps": np.asarray([int(g["dup"].sum())], np.int64),
        })

    return (fps.groupby("fp").map_groups(tag, batch_format="pandas")
               .groupby(id_col).map_groups(prof, batch_format="pandas"))
