"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shapes follow the scale playbook:
- exact: content hash per batch (map_batches) → ``groupby(hash)`` keep first
  — one shuffle of (hash, id) pairs, never of content.
- MinHash-LSH: shingle→minhash signature per batch → explode to
  (band_id, band_hash, doc_id) rows → ``groupby(band)`` emits candidate
  pairs → exact-Jaccard verify on the pair list.  Only signatures and
  short id-lists shuffle.
- SimHash: 64-bit signature per doc, map-only; near-dup = hamming ≤ t by
  banding the 64 bits the same way.
- embedding cosine near-dup lives in rayindex.datapipe.ann.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from rayindex.datapipe.text import hash_token

_ASCII = re.compile(r"[a-z0-9_]+")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """One row per distinct text: (doc_id = min id of the group, n_dups).

    Equivalent SQL: SELECT min(doc_id) doc_id, count(*) n_dups
    FROM documents GROUP BY text.
    """

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256((x or "").encode()).hexdigest() for x in t[text_col].to_pylist()]
        return pa.table({id_col: t[id_col], "h": pa.array(hs, pa.string())})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: [int(g[id_col].min())],
            "n_dups": [len(g)],
        })

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
        .select_columns([id_col, "n_dups"])
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def _shingles(text: str, k: int) -> np.ndarray:
    toks = _ASCII.findall(text.lower()) if text else []
    if len(toks) < k:
        joined = " ".join(toks)
        return np.asarray([hash_token(joined)], np.uint64) if toks else np.zeros(0, np.uint64)
    hs = np.fromiter((hash_token(t) for t in toks), np.uint64, len(toks))
    B = np.uint64(1000003)
    out = hs[: len(hs) - k + 1].copy()
    for i in range(1, k):
        out = out * B + hs[i : len(hs) - k + 1 + i]
    return np.unique(out)


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    MP = (1 << 61) - 1
    a = rng.integers(1, MP, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MP, size=num_perm, dtype=np.uint64)
    return a, b, np.uint64(MP)


class MinHasher:
    """Actor-pool stage: permutation parameters generated once per actor."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b, self.MP = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if sh.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        # (a*x + b) mod p, min over shingles, vectorized perm × shingle
        x = sh.astype(np.uint64)[None, :]
        vals = (self.a[:, None] * x + self.b[:, None]) % self.MP
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
        })


def minhash_candidates(ds, num_perm: int = 128, bands: int = 32,
                       shingle_k: int = 5, text_col: str = "text",
                       id_col: str = "doc_id"):
    """LSH banding: docs sharing any band bucket become candidate pairs.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduplicated.
    """
    rows_per_band = num_perm // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=4, num_cpus=1,
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        ids, band_ids, band_hash, sig_out = [], [], [], []
        for i in range(t.num_rows):
            sig = np.asarray(t["sig"][i].as_py(), np.uint64)
            doc = t[id_col][i].as_py()
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(doc)
                band_ids.append(b)
                band_hash.append(h)
                sig_out.append(sig.tolist())
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hash, pa.string()),
            "sig": pa.array(sig_out, pa.list_(pa.uint64())),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "est_jaccard": pd.Series([], dtype="float64")})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        sigs = [np.asarray(s, np.uint64) for s in g["sig"].tolist()]
        a_out, b_out, est = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
                est.append(float(np.mean(sigs[i] == sigs[j])))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "est_jaccard": est})

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # candidate pairs can surface from several bands → dedup on (a, b)
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(dedup_pairs, batch_format="pandas")


def exact_jaccard(text_a: str, text_b: str, shingle_k: int = 5) -> float:
    a, b = _shingles(text_a, shingle_k), _shingles(text_b, shingle_k)
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash over ascii tokens (Charikar 2002): sign of the
    weighted bit-vote per bit position."""
    out = []
    for t in batch[text_col].to_pylist():
        toks = _ASCII.findall(t.lower()) if t else []
        if not toks:
            out.append(0)
            continue
        hs = np.fromiter((hash_token(x) for x in toks), np.uint64, len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(i)
        out.append(int(sig))
    return pa.table({
        id_col: batch[id_col],
        "simhash": pa.array(np.asarray(out, np.uint64)),
    })


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
