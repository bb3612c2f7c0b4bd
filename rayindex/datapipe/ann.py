"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact cosine top-k.  The query matrix is ``ray.put``
  once and read inside each map_batches task (broadcast, not re-shipped
  per batch); each batch does one numpy matmul; per-batch top-k partials
  are reduced on the driver (k × n_queries rows — tiny).
- ``knn_ivf``: IVF (inverted-file) variant — k-means-lite centroids on a
  sample, batches route vectors to their nearest centroid, queries probe
  ``nprobe`` lists.  Approximate; the scale path when brute force's
  O(N·d) per query is too slow.
- ``cosine_neardup``: all-pairs cosine ≥ threshold via the same broadcast
  trick per block (candidate near-duplicate pairs by embedding).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(batch: pa.Table, col: str, dtype=np.float32) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(dtype)
    n = len(arr)
    return flat.reshape(n, -1)


def knn_brute(ds, queries: np.ndarray, k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id",
              dtype=np.float32):
    """Exact cosine top-k: returns (query_id, rank, vec_id, cos_sim) table.

    Ties broken (cos_sim desc, vec_id asc) — deterministic.  ``dtype``:
    float32 halves memory traffic at scale; float64 for bit-stable
    comparison against double-precision oracles.
    """
    q = _normalize(np.ascontiguousarray(queries, dtype))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = _normalize(_batch_matrix(batch, vec_col, dtype))
        ids = batch[id_col].to_numpy()
        sims = qm @ vecs.T  # (n_queries, batch)
        nq = sims.shape[0]
        kk = min(k, sims.shape[1])
        # per-query partial top-k with (sim desc, id asc) tie-break
        order = np.lexsort((ids[None, :].repeat(nq, 0), -sims), axis=1)[:, :kk]
        rows_q = np.repeat(np.arange(nq), kk)
        sel = order.ravel()
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            id_col: pa.array(ids[sel], pa.int64()),
            "cos_sim": pa.array(sims[rows_q, sel].astype(np.float64)),
        })

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096).to_pandas()
    out_q, out_rank, out_id, out_sim = [], [], [], []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows(), start=1):
            out_q.append(int(qid))
            out_rank.append(r)
            out_id.append(int(row[id_col]))
            out_sim.append(float(row["cos_sim"]))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_rank, pa.int32()),
        id_col: pa.array(out_id, pa.int64()),
        "cos_sim": pa.array(out_sim, pa.float64()),
    })


def train_centroids(ds, n_centroids: int = 16, vec_col: str = "embedding",
                    sample_rows: int = 2048, iters: int = 8, seed: int = 7) -> np.ndarray:
    """k-means-lite on a driver-side sample (centroid table is tiny)."""
    sample = ds.limit(sample_rows).to_pandas()
    m = _normalize(np.stack([np.asarray(v, np.float32) for v in sample[vec_col]]))
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(cents.shape[0]):
            mask = assign == c
            if mask.any():
                cents[c] = m[mask].mean(axis=0)
        cents = _normalize(cents)
    return cents


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF approximate top-k: route each vector to its nearest centroid
    (map-only), score only batches' vectors belonging to the ``nprobe``
    centroids closest to each query."""
    cents = train_centroids(ds, n_centroids, vec_col)
    q = _normalize(np.ascontiguousarray(queries, np.float32))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    state = ray.put((q, cents, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qm, cm, pr = ray.get(state)
        vecs = _normalize(_batch_matrix(batch, vec_col))
        ids = batch[id_col].to_numpy()
        assign = (vecs @ cm.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sims = vecs[mask] @ qm[qi]
            sub_ids = ids[mask]
            kk = min(k, sims.size)
            order = np.lexsort((sub_ids, -sims))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(sub_ids[order].tolist())
            out_sim.extend(sims[order].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "cos_sim": pa.array(out_sim, pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=4096).to_pandas()
    out_q, out_rank, out_id, out_sim = [], [], [], []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows(), start=1):
            out_q.append(int(qid))
            out_rank.append(r)
            out_id.append(int(row[id_col]))
            out_sim.append(float(row["cos_sim"]))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_rank, pa.int32()),
        id_col: pa.array(out_id, pa.int64()),
        "cos_sim": pa.array(out_sim, pa.float64()),
    })


def cosine_neardup(ds, threshold: float = 0.9, vec_col: str = "embedding",
                   id_col: str = "vec_id", dtype=np.float32):
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) with
    id_a < id_b and cos_sim >= threshold.

    The normalized matrix is broadcast once (`ray.put`); each batch does one
    matmul against it and keeps its upper-triangle hits — O(N·B) per batch,
    no shuffle.  At 10^9+ vectors this becomes IVF/LSH bucketing first
    (route vectors to centroid buckets, compare within buckets) — the
    brute pass here is the exact small/medium-scale tool and the verifier
    for bucketed variants.
    """
    full = ds.to_pandas()  # broadcast side; caller guarantees it fits
    ids_all = full[id_col].to_numpy()
    mat = _normalize(np.stack([np.asarray(v, dtype) for v in full[vec_col]]))
    state = ray.put((ids_all, mat))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        aids, amat = ray.get(state)
        vecs = _normalize(_batch_matrix(batch, vec_col, dtype))
        bids = batch[id_col].to_numpy()
        sims = vecs @ amat.T  # (batch, N)
        hit_b, hit_a = np.nonzero(sims >= threshold)
        ga, gb = aids[hit_a], bids[hit_b]
        keep = gb < ga  # strict: emit each unordered pair once, (small, large)
        return pa.table({
            "id_a": pa.array(gb[keep], pa.int64()),
            "id_b": pa.array(ga[keep], pa.int64()),
            "cos_sim": pa.array(sims[hit_b[keep], hit_a[keep]].astype(np.float64)),
        })

    return ds.map_batches(batch_pairs, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=2048)
