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
    """Universal-hash parameters over the Mersenne prime 2^31-1.  Shingle
    hashes are folded to 32 bits before permuting so a*x+b stays < 2^63 and
    the mod is exact in uint64 arithmetic (a 61-bit prime would overflow the
    multiply and silently break the collision-probability ≈ Jaccard
    guarantee)."""
    rng = np.random.default_rng(seed)
    MP = (1 << 31) - 1
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
        # fold shingle hashes to 32 bits, then (a*x + b) mod 2^31-1 — every
        # intermediate fits uint64 exactly (a < 2^31, x < 2^32 → a*x < 2^63)
        x = ((sh ^ (sh >> np.uint64(32))) & np.uint64(0xFFFFFFFF))[None, :]
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

    Shuffle shape: signatures explode to (band_id, band_bytes, doc_id, sig)
    rows and group by ``band_id`` ONLY — a handful of large groups (Ray's
    per-group overhead sinks thousands-of-tiny-buckets layouts); bucket
    detection inside the group is a vectorized pandas duplicated() mask.
    The raw band bytes are the bucket key (exact — no hash collisions).
    """
    rows_per_band = num_perm // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=4, num_cpus=1,
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "band_id": pa.array([], pa.int32()),
                "band_key": pa.array([], pa.binary()),
                "sig": pa.array([], pa.list_(pa.uint64())),
            })
        sig_col = t["sig"].combine_chunks()
        mat = sig_col.values.to_numpy(zero_copy_only=False).reshape(n, num_perm)
        mat = np.ascontiguousarray(mat)
        ids = np.repeat(t[id_col].to_numpy(), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        keys = [
            mat[i, b * rows_per_band : (b + 1) * rows_per_band].tobytes()
            for i in range(n) for b in range(bands)
        ]
        sig_rows = np.repeat(mat, bands, axis=0)  # full signature per band row
        offsets = np.arange(n * bands + 1, dtype=np.int32) * num_perm
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_key": pa.array(keys, pa.binary()),
            "sig": pa.ListArray.from_arrays(pa.array(offsets), pa.array(sig_rows.ravel())),
        })

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "est_jaccard": pd.Series([], dtype="float64")})
        if len(g) < 2:
            return empty
        dup_mask = g.duplicated("band_key", keep=False)
        if not dup_mask.any():
            return empty
        g = g[dup_mask]
        a_out, b_out, est = [], [], []
        for _, bucket in g.groupby("band_key", sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.sort_values(id_col)
            ids = bucket[id_col].tolist()
            bsigs = [np.asarray(s, np.uint64) for s in bucket["sig"].tolist()]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    est.append(float(np.mean(bsigs[i] == bsigs[j])))
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "est_jaccard": est})

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("band_id")
        .map_groups(band_pairs, batch_format="pandas")
    )

    # candidates are rare by construction → one small partition dedups them
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["doc_a", "doc_b"]).drop_duplicates(["doc_a", "doc_b"])

    return pairs.repartition(1).map_batches(dedup_pairs, batch_format="pandas")


def verify_candidates(ds, pairs_ds, shingle_k: int = 5, text_col: str = "text",
                      id_col: str = "doc_id", min_jaccard: float = 0.0):
    """Exact n-gram Jaccard verification of LSH candidate pairs.

    The candidate list is small by construction (LSH collisions only), so
    it is collected and ``ray.put`` once; the verification pass re-reads
    only the candidate docs' texts (broadcast id-set semi-join filter
    inside map_batches — no shuffle) and computes exact shingle Jaccard on
    the driver over the gathered texts.  Returns a pyarrow table
    (doc_a, doc_b, jaccard) filtered to ``min_jaccard``.
    """
    import pyarrow.compute as pc

    pairs = pairs_ds.to_pandas() if hasattr(pairs_ds, "to_pandas") else pairs_ds
    if len(pairs) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    needed = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))

    def pick(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(needed, pa.int64()))
        return t.filter(mask).select([id_col, text_col])

    texts_df = ds.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    texts = dict(zip(texts_df[id_col], texts_df[text_col]))
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        j = exact_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
        if j >= min_jaccard:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(j)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


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
