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
    # flatten() (not .values) respects ListArray slice offsets — a
    # zero-copy sliced batch's .values still spans the parent buffer
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
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
                           zero_copy_batch=True, batch_size=4096)
    return _merge_topk_distributed(parts, k, id_col)


def train_centroids(ds, n_centroids: int = 16, vec_col: str = "embedding",
                    sample_rows: int = 2048, iters: int = 8, seed: int = 7,
                    normalize: bool = True) -> np.ndarray:
    """k-means-lite on a driver-side sample (centroid table is tiny).

    The sample is a seeded ``random_sample`` across ALL blocks — a
    ``limit()`` would take the first blocks only and bias the centroids to
    whatever slice of the corpus happens to sort first.  ``normalize``:
    spherical variant (unit vectors, max-dot assignment) for cosine
    pipelines; False = plain L2 Lloyd on the raw sample — the right
    scale when seeding an L2 :func:`kmeans_fit` (e.g. PQ subspaces)."""
    n_total = ds.count()
    frac = min(1.0, (4.0 * sample_rows) / max(n_total, 1))
    sample = ds.random_sample(frac, seed=seed).limit(sample_rows).to_pandas()
    if len(sample) == 0:
        sample = ds.limit(sample_rows).to_pandas()
    m = np.stack([np.asarray(v, np.float32) for v in sample[vec_col]])
    if normalize:
        m = _normalize(m)
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        if normalize:
            assign = (m @ cents.T).argmax(axis=1)
        else:
            assign = (((m * m).sum(1, keepdims=True) - 2.0 * (m @ cents.T)
                       + (cents * cents).sum(1))).argmin(axis=1)
        for c in range(cents.shape[0]):
            mask = assign == c
            if mask.any():
                cents[c] = m[mask].mean(axis=0)
        if normalize:
            cents = _normalize(cents)
    return cents


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id", centroids: np.ndarray | None = None,
            normalize: bool = True, dtype=np.float32):
    """IVF approximate top-k: route each vector to its nearest centroid
    (map-only), score only batches' vectors belonging to the ``nprobe``
    centroids closest to each query.

    ``centroids``: pinned coarse centroids skip the (seeded, float)
    sample training — the deterministic-fixture hook that makes the
    operator SQL-oracle-able.  ``normalize=False`` scores raw dot
    products instead of cosine (with integer-valued inputs every
    distance is integer-exact, so argmax/ties reproduce bit-for-bit in
    any engine); the output column keeps the ``cos_sim`` name either
    way.  Probe/assign ties break toward the lowest centroid id
    (stable sort)."""
    if centroids is not None:
        cents = np.ascontiguousarray(centroids, dtype)
        if normalize:
            cents = _normalize(cents)
    else:
        cents = train_centroids(ds, n_centroids, vec_col,
                                normalize=normalize).astype(dtype)
    q = np.ascontiguousarray(queries, dtype)
    if normalize:
        q = _normalize(q)
    probe = np.argsort(-(q @ cents.T), axis=1,
                       kind="stable")[:, :nprobe]  # (nq, nprobe)
    state = ray.put((q, cents, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qm, cm, pr = ray.get(state)
        vecs = _batch_matrix(batch, vec_col, dtype)
        if normalize:
            vecs = _normalize(vecs)
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
                           zero_copy_batch=True, batch_size=4096)
    return _merge_topk_distributed(parts, k, id_col)


def kmeans_fit(ds, k: int = 8, n_iter: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id", metric: str = "l2",
               init: str = "sample", seed: int = 7, tol: float = 1e-7,
               dtype=np.float64):
    """Distributed Lloyd's k-means over an embedding column.

    Per iteration: ONE streaming ``map_batches`` pass emits at most ``k``
    partial rows per batch (cluster id, vector sum, count, inertia
    partial); a ``groupby("cid").map_groups`` sum reduces them
    cluster-side, so the driver only ever holds the k × d centroid matrix
    — vectors never leave the cluster and nothing scales with block
    count.  ``metric="l2"`` is classic Lloyd (squared-Euclidean inertia);
    ``"cosine"`` is spherical k-means (rows and centroids L2-normalized,
    assignment by max dot, inertia = Σ(1 − cos)).

    ``init="sample"`` seeds from a cross-block seeded sample (the scale
    default); ``"first"`` uses the ``k`` lowest-``id_col`` vectors —
    fully deterministic, the variant the DuckDB oracle twin reproduces;
    an ``np.ndarray`` is used verbatim as the (k × d) seed matrix.
    Stops early when every centroid moves < ``tol`` (L∞).  Returns
    ``(centroids, info)`` with ``info = {"n_iter", "inertia"(history),
    "converged"}``."""
    if isinstance(init, np.ndarray):
        cents = np.ascontiguousarray(init, dtype)
    elif init == "first":
        head = ds.sort(id_col).limit(k).to_pandas()
        cents = np.stack([np.asarray(v, dtype) for v in head[vec_col]])
    else:
        cents = train_centroids(ds, k, vec_col, seed=seed,
                                normalize=metric == "cosine").astype(dtype)
    if metric == "cosine":
        cents = _normalize(cents)
    k = cents.shape[0]

    def partials_fn(cents_now: np.ndarray):
        ref = ray.put(cents_now)

        def partials(batch: pa.Table) -> pa.Table:
            cm = ray.get(ref)
            x = _batch_matrix(batch, vec_col, dtype)
            if metric == "cosine":
                x = _normalize(x)
                sims = x @ cm.T
                assign = sims.argmax(axis=1)
                loss = 1.0 - sims[np.arange(len(x)), assign]
            else:
                d2 = ((x * x).sum(1, keepdims=True) - 2.0 * (x @ cm.T)
                      + (cm * cm).sum(1))
                assign = d2.argmin(axis=1)
                loss = np.maximum(d2[np.arange(len(x)), assign], 0.0)
            cids = np.unique(assign)
            sums = np.zeros((cids.size, x.shape[1]), np.float64)
            for j, c in enumerate(cids):  # k rows, not n rows
                sums[j] = x[assign == c].sum(0)
            n = np.bincount(assign, minlength=k)[cids]
            li = np.bincount(assign, weights=loss, minlength=k)[cids]
            return pa.table({
                "cid": pa.array(cids.astype(np.int32)),
                "psum": pa.array(list(sums)),
                "n": pa.array(n.astype(np.int64)),
                "pinertia": pa.array(li.astype(np.float64)),
            })
        return partials

    def reduce_group(df):
        import pandas as pd
        return pd.DataFrame({
            "cid": [df["cid"].iloc[0]],
            "psum": [np.add.reduce([np.asarray(v) for v in df["psum"]])],
            "n": [int(df["n"].sum())],
            "pinertia": [float(df["pinertia"].sum())],
        })

    history, converged, it = [], False, 0
    for it in range(1, n_iter + 1):
        rows = (ds.map_batches(partials_fn(cents), batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("cid").map_groups(reduce_group,
                                           batch_format="pandas")
                .take_all())  # ≤ k rows
        new = cents.copy()
        inertia = 0.0
        for r in rows:
            c = int(r["cid"])
            new[c] = np.asarray(r["psum"], np.float64) / max(int(r["n"]), 1)
            inertia += float(r["pinertia"])
        if metric == "cosine":
            new = _normalize(new)
        history.append(inertia)
        shift = np.abs(new - cents).max()
        cents = new.astype(dtype)
        if shift < tol:
            converged = True
            break
    return cents, {"n_iter": it, "inertia": history, "converged": converged}


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id", metric: str = "l2",
                  dtype=np.float64):
    """Map-only cluster assignment against a fixed centroid matrix:
    returns a Dataset of (id, cluster, dist) — ``dist`` is squared L2
    (or ``1 − cos``), ties broken toward the lowest cluster id (argmin
    semantics, matching the SQL twin's ``ORDER BY d, cid LIMIT 1``)."""
    cm0 = np.ascontiguousarray(centroids, dtype)
    ref = ray.put(_normalize(cm0) if metric == "cosine" else cm0)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        x = _batch_matrix(batch, vec_col, dtype)
        if metric == "cosine":
            x = _normalize(x)
            sims = x @ cm.T
            a = sims.argmax(axis=1)
            d = 1.0 - sims[np.arange(len(x)), a]
        else:
            d2 = ((x * x).sum(1, keepdims=True) - 2.0 * (x @ cm.T)
                  + (cm * cm).sum(1))
            a = d2.argmin(axis=1)
            d = np.maximum(d2[np.arange(len(x)), a], 0.0)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int32)),
            "dist": pa.array(d.astype(np.float64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def semdedup(ds, k: int = 4, threshold: float = 0.95, n_iter: int = 1,
             init="first", vec_col: str = "embedding",
             id_col: str = "vec_id", dtype=np.float64):
    """SemDeDup (Abbas et al. 2023, "Semantic deduplication removes
    redundant web data"): cluster the embedding space with the
    distributed :func:`kmeans_fit`, compute pairwise cosine ONLY within
    each cluster, connect pairs ≥ ``threshold`` and keep one canonical
    vector (lowest id) per semantic-duplicate component.  Returns one
    row per vector: ``(id, cluster int32, comp int64, keep int32)`` —
    ``comp`` is the component representative (= own id for uniques).

    Scale shape: clustering is the streaming partial-sum loop (driver
    holds k × d floats); the all-pairs step is confined to one cluster
    per reducer — the whole point of SemDeDup is that k is chosen large
    enough (corpus_size / expected_cluster_size) that clusters are
    small, turning the quadratic all-pairs into k small tiles.
    Partitioning assumption: one cluster's vectors fit a task (raise
    ``k`` when they don't); duplicate components resolve through the
    same bucketed :func:`clusters.connected_components` the text
    near-dup family uses.  ``init="first"`` + ``n_iter=1`` is the
    deterministic fixture the SQL twin reproduces."""
    import pandas as pd

    from .clusters import connected_components

    cents, _ = kmeans_fit(ds, k=k, n_iter=n_iter, init=init, metric="l2",
                          vec_col=vec_col, id_col=id_col, dtype=dtype)
    ref = ray.put(np.ascontiguousarray(cents, np.float64))

    def prep(batch: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        x = _batch_matrix(batch, vec_col, np.float64)
        a, _ = _coarse_assign(x, cm)
        nx = _normalize(x)
        n, d = nx.shape
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * d)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int32)),
            "nvec": pa.ListArray.from_arrays(offsets, pa.array(nx.ravel())),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def cluster_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64")})
        if len(g) < 2 or id_col not in g.columns:
            return empty
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy(np.int64)
        m = np.stack([np.asarray(v, np.float64) for v in g["nvec"]])
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        hit = sims[ii, jj] >= threshold
        if not hit.any():
            return empty
        return pd.DataFrame({"doc_a": ids[ii[hit]],
                             "doc_b": ids[jj[hit]]})

    pairs = (prepped.groupby("cluster")
             .map_groups(cluster_pairs, batch_format="pandas"))
    # the (node -> comp) map covers DUP nodes only — a small fraction by
    # the SemDeDup premise — so it broadcasts once like the text
    # family's dedup_keep_canonical victim set (swap for a left-outer
    # hash join on id if a corpus ever has tens-of-percent dup rates)
    node_l, comp_l = [], []
    for b in connected_components(pairs) \
            .iter_batches(batch_format="pyarrow"):
        if b.num_rows and "node" in b.column_names:
            node_l.append(b["node"].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            comp_l.append(b["comp"].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
    if node_l:
        nodes = np.concatenate(node_l)
        cps = np.concatenate(comp_l)
        order = np.argsort(nodes)
        nodes, cps = nodes[order], cps[order]
    else:
        nodes = np.empty(0, np.int64)
        cps = nodes
    cref = ray.put((nodes, cps))

    def finish(batch: pa.Table) -> pa.Table:
        nds, cmp_ = ray.get(cref)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        comp = ids.copy()
        if nds.size:
            pos = np.minimum(np.searchsorted(nds, ids), nds.size - 1)
            hit = nds[pos] == ids
            comp[hit] = cmp_[pos[hit]]
        return pa.table({
            id_col: batch[id_col],
            "cluster": batch["cluster"],
            "comp": pa.array(comp),
            "keep": pa.array((comp == ids).astype(np.int32)),
        })

    return (prepped.select_columns([id_col, "cluster"])
            .map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True))


def _merge_topk_distributed(parts, k: int, id_col: str) -> pa.Table:
    """Distributed reduce of the per-batch top-k partials: a
    ``groupby(query_id).map_groups`` final top-k, so the DRIVER receives
    exactly n_queries × k rows — the partial set is O(n_blocks × q × k),
    unbounded in block count at corpus scale, and never leaves the
    cluster.  Ties broken (cos_sim desc, id asc) — deterministic."""
    import pandas as pd

    def topk_group(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["cos_sim", id_col],
                            ascending=[False, True]).head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int32)
        return df[["query_id", "rank", id_col, "cos_sim"]]

    out = parts.groupby("query_id") \
        .map_groups(topk_group, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32()),
                         id_col: pa.array([], pa.int64()),
                         "cos_sim": pa.array([], pa.float64())})
    out = out.sort_values(["query_id", "rank"])
    return pa.table({
        "query_id": pa.array(out["query_id"].to_numpy(np.int64)),
        "rank": pa.array(out["rank"].to_numpy(np.int32)),
        id_col: pa.array(out[id_col].to_numpy(np.int64)),
        "cos_sim": pa.array(out["cos_sim"].to_numpy(np.float64)),
    })


_PAIRS_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                           ("cos_sim", pa.float64())])


def _norm_pack(batch: pa.Table, vec_col: str, id_col: str, dtype) -> pa.Table:
    """Normalize a block's vectors once; store as a packed list column."""
    if batch.num_rows == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "nvec": pa.array([], pa.list_(pa.float64()))})
    mat = _normalize(_batch_matrix(batch, vec_col, dtype)).astype(np.float64)
    n, d = mat.shape
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * d)
    return pa.table({
        id_col: batch[id_col],
        "nvec": pa.ListArray.from_arrays(offsets, pa.array(mat.ravel())),
    })


@ray.remote
def _block_pair_hits(ta: pa.Table, tb: pa.Table, same: bool, threshold: float,
                     id_col: str, dtype) -> pa.Table:
    """Hits of one (block_i, block_j) tile of the similarity matrix."""
    if ta.num_rows == 0 or tb.num_rows == 0:
        return _PAIRS_SCHEMA.empty_table()
    ids_a = ta[id_col].to_numpy()
    ids_b = tb[id_col].to_numpy()
    ma = _batch_matrix(ta, "nvec", dtype)
    mb = _batch_matrix(tb, "nvec", dtype)
    sims = ma @ mb.T
    ii, jj = np.nonzero(sims >= threshold)
    ga, gb = ids_a[ii], ids_b[jj]
    keep = ga < gb if same else ga != gb
    lo = np.minimum(ga[keep], gb[keep])
    hi = np.maximum(ga[keep], gb[keep])
    return pa.table({
        "id_a": pa.array(lo, pa.int64()),
        "id_b": pa.array(hi, pa.int64()),
        "cos_sim": pa.array(sims[ii[keep], jj[keep]].astype(np.float64)),
    })


def cosine_neardup(ds, threshold: float = 0.9, vec_col: str = "embedding",
                   id_col: str = "vec_id", dtype=np.float32):
    """EXACT embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim)
    with id_a < id_b and cos_sim >= threshold.

    Distributed block-pair tiling: vectors are normalized once per block
    and pinned in the object store (the driver holds block REFS only, never
    the matrix); one Ray task per (i <= j) block pair does a single matmul
    over its tile and emits hits.  Exact all-pairs is inherently O(N²)
    compute — this distributes it without any driver-side materialization
    or full-matrix broadcast; at 10^9+ vectors use ``cosine_neardup_lsh``
    (hyperplane-bucketed candidates) and keep this as the verifier shape.
    The raw-task fan-out exists because the Dataset API has no
    self-cartesian operator; inputs/outputs stay Arrow blocks end to end.
    """
    import ray.data

    packed = ds.map_batches(_norm_pack, fn_kwargs={
        "vec_col": vec_col, "id_col": id_col, "dtype": dtype,
    }, batch_format="pyarrow", zero_copy_batch=True)
    refs = [r for r, n in zip(*_refs_with_counts(packed)) if n > 0]
    if not refs:
        return ray.data.from_arrow(_PAIRS_SCHEMA.empty_table())
    out = [
        _block_pair_hits.remote(refs[i], refs[j], i == j, threshold, id_col, dtype)
        for i in range(len(refs)) for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(out)


def _refs_with_counts(packed):
    """Block refs + per-block row counts of a materialized dataset."""
    mat = packed.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _n(t: pa.Table) -> int:
        return t.num_rows

    return refs, ray.get([_n.remote(r) for r in refs])


def cosine_neardup_lsh(ds, threshold: float = 0.9, nbits: int = 16,
                       bands: int = 8, vec_col: str = "embedding",
                       id_col: str = "vec_id", dtype=np.float32,
                       pair_buckets: int = 64, seed: int = 7):
    """Approximate near-dup pairs via random-hyperplane LSH: vectors whose
    sign patterns agree on at least one band become candidates; exact
    cosine is computed inside the candidate bucket, so every emitted pair
    is a TRUE >= threshold pair (precision 1.0) — recall < 1.0 for pairs
    whose signs differ in every band.  The scale path: shuffle volume is
    bands x (id, nvec) rows grouped by (band, pattern), never all-pairs.
    """
    import ray.data
    from rayindex.datapipe.dedup import _dedup_pairs

    first = ds.take(1)
    if not first:
        return ray.data.from_arrow(_PAIRS_SCHEMA.empty_table())
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, nbits)).astype(np.float64)
    width = nbits // bands
    h_ref = ray.put(H)

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "band_id": pa.array([], pa.int32()),
            "pattern": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int32()),
            "nvec": pa.array([], pa.list_(pa.float64())),
        })
        if batch.num_rows == 0:
            return empty
        hp = ray.get(h_ref)
        mat = _normalize(_batch_matrix(batch, vec_col, np.float64))
        bits = ((mat @ hp) >= 0).astype(np.int64)  # (n, nbits)
        n = mat.shape[0]
        pats = np.zeros((n, bands), np.int64)
        for b in range(bands):
            for w in range(width):
                pats[:, b] = (pats[:, b] << 1) | bits[:, b * width + w]
        d = mat.shape[1]
        offsets = pa.array((np.arange(n * bands + 1, dtype=np.int32) * d))
        nvec_rep = np.repeat(mat, bands, axis=0)
        return pa.table({
            id_col: pa.array(np.repeat(batch[id_col].to_numpy(), bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "pattern": pa.array(pats.ravel()),
            "bucket": pa.array((pats % pair_buckets).astype(np.int32).ravel()),
            "nvec": pa.ListArray.from_arrays(offsets, pa.array(nvec_rep.ravel())),
        })

    import pandas as pd

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "est_jaccard": pd.Series([], dtype="float64")})
        if len(g) < 2 or id_col not in g.columns:
            return empty
        a_out, b_out, s_out = [], [], []
        for _, grp in g.groupby("pattern", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy(np.int64)
            m = np.stack([np.asarray(v, np.float64) for v in grp["nvec"]])
            sims = m @ m.T
            ii, jj = np.triu_indices(len(ids), k=1)
            keep = sims[ii, jj] >= threshold
            a_out.extend(ids[ii[keep]].tolist())
            b_out.extend(ids[jj[keep]].tolist())
            s_out.extend(sims[ii[keep], jj[keep]].tolist())
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out,
                             "est_jaccard": np.asarray(s_out, np.float64)})

    pairs = (ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
               .groupby(["band_id", "bucket"])
               .map_groups(bucket_pairs, batch_format="pandas"))
    deduped = _dedup_pairs(pairs, pair_buckets)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"doc_a": "id_a", "doc_b": "id_b",
                                  "est_jaccard": "cos_sim"})

    return deduped.map_batches(rename, batch_format="pandas")


def pq_train(ds, m: int = 8, k: int = 16, vec_col: str = "embedding",
             id_col: str = "vec_id", n_iter: int = 10, seed: int = 7,
             dtype=np.float64):
    """Product-quantization codebooks (Jégou et al. 2011): split the
    d-dim space into ``m`` subspaces and train an independent ``k``-way
    k-means codebook per subspace with the DISTRIBUTED
    :func:`kmeans_fit` loop — each of the m × n_iter iterations is one
    streaming partial-sum pass, so training never materializes vectors
    and the driver holds m small (k × d/m) codebooks.  Returns an
    (m, k, d/m) ndarray.  ``d`` must divide evenly by ``m``."""

    def sub_view(lo: int, hi: int):
        def cut(batch: pa.Table) -> pa.Table:
            x = _batch_matrix(batch, vec_col, dtype)[:, lo:hi]
            return pa.table({
                id_col: batch[id_col],
                vec_col: pa.array(list(x.astype(dtype))),
            })
        return cut

    head = ds.limit(1).to_pandas()
    d = len(np.asarray(head[vec_col].iloc[0]))
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    w = d // m
    books = np.empty((m, k, w), np.float64)
    for s in range(m):
        sub = ds.map_batches(sub_view(s * w, (s + 1) * w),
                             batch_format="pyarrow", zero_copy_batch=True)
        cents, _ = kmeans_fit(sub, k=k, n_iter=n_iter, vec_col=vec_col,
                              id_col=id_col, metric="l2",
                              init="sample", seed=seed + s, dtype=dtype)
        books[s, :len(cents)] = cents
        if len(cents) < k:  # degenerate tiny corpus: pad with repeats
            books[s, len(cents):] = cents[-1]
    return books


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id", dtype=np.float64):
    """Map-only PQ encoding: each vector becomes ``m`` uint8 codes
    (nearest sub-centroid per subspace).  Output (id, codes list<uint8>)
    — 8 bytes/vector at m=8, a 32× compression of 64-dim float32."""
    cb = np.ascontiguousarray(codebooks, np.float64)
    ref = ray.put(cb)
    m, k, w = cb.shape

    def encode(batch: pa.Table) -> pa.Table:
        books = ray.get(ref)
        x = _batch_matrix(batch, vec_col, dtype)
        n = x.shape[0]
        codes = np.empty((n, m), np.uint8)
        for s in range(m):  # m small matmuls, vectorized over the batch
            xs = x[:, s * w:(s + 1) * w]
            d2 = ((xs * xs).sum(1, keepdims=True)
                  - 2.0 * (xs @ books[s].T)
                  + (books[s] * books[s]).sum(1))
            codes[:, s] = d2.argmin(axis=1)
        return pa.table({
            id_col: batch[id_col],
            "pq_codes": pa.array(list(codes)),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def knn_pq(codes_ds, queries: np.ndarray, codebooks: np.ndarray,
           k: int = 10, id_col: str = "vec_id"):
    """Asymmetric-distance (ADC) top-k over a PQ-encoded Dataset: per
    query build the (m, K) lookup table of exact query-to-sub-centroid
    squared distances once, then every batch scores vectors with pure
    table gathers + a row sum — no float vectors are ever read back.
    Returns (query_id, rank, vec_id, adc_dist), ties (dist asc, id asc).
    The per-batch partial top-k reduces through
    ``groupby(query_id).map_groups`` so the driver receives exactly
    q × k rows."""
    import pandas as pd

    cb = np.ascontiguousarray(codebooks, np.float64)
    m, K, w = cb.shape
    q = np.ascontiguousarray(queries, np.float64)
    nq = q.shape[0]
    # (nq, m, K) query LUTs: ||q_s - c_sk||^2
    luts = np.empty((nq, m, K), np.float64)
    for s in range(m):
        qs = q[:, s * w:(s + 1) * w]
        luts[:, s, :] = ((qs * qs).sum(1, keepdims=True)
                         - 2.0 * (qs @ cb[s].T)
                         + (cb[s] * cb[s]).sum(1))
    ref = ray.put(luts)

    def partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        arr = batch["pq_codes"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if hasattr(arr, "flatten"):  # plain list<uint8> (the native layout)
            # flatten() respects slice offsets; .values would not
            codes = arr.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.int64).reshape(len(arr), m)
        else:  # Ray tensor-extension array (e.g. after a pandas round-trip)
            codes = np.asarray(arr.to_numpy(zero_copy_only=False)) \
                .astype(np.int64).reshape(len(arr), m)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_d = [], [], []
        for qi in range(nq):
            # gather: dist[i] = sum_s lut[qi, s, codes[i, s]]
            d = lut[qi][np.arange(m)[None, :], codes].sum(axis=1)
            kk = min(k, d.size)
            order = np.lexsort((ids, d))[:kk]
            out_q.append(np.full(kk, qi, np.int64))
            out_id.append(ids[order])
            out_d.append(d[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id).astype(np.int64)),
            "adc_dist": pa.array(np.concatenate(out_d)),
        })

    parts = codes_ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=4096)
    return _merge_min_topk(parts, k, id_col, "adc_dist")


def _merge_min_topk(parts, k: int, id_col: str, val_col: str) -> pa.Table:
    """Distributed reduce of per-batch min-top-k partials (the ascending
    twin of :func:`_merge_topk_distributed`): ``groupby(query_id)`` final
    top-k, driver receives exactly q × k rows.  Ties (val asc, id asc)."""
    import pandas as pd

    def topk_group(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values([val_col, id_col],
                            ascending=[True, True]).head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int32)
        return df[["query_id", "rank", id_col, val_col]]

    out = parts.groupby("query_id") \
        .map_groups(topk_group, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32()),
                         id_col: pa.array([], pa.int64()),
                         val_col: pa.array([], pa.float64())})
    out = out.sort_values(["query_id", "rank"])
    return pa.table({
        "query_id": pa.array(out["query_id"].to_numpy(np.int64)),
        "rank": pa.array(out["rank"].to_numpy(np.int32)),
        id_col: pa.array(out[id_col].to_numpy(np.int64)),
        val_col: pa.array(out[val_col].to_numpy(np.float64)),
    })


def _coarse_assign(x: np.ndarray, cm: np.ndarray):
    """L2 coarse assignment: (assignments, residuals).  argmin ties break
    toward the lowest centroid id; with integer-valued inputs every
    distance is integer-exact (order-independent in doubles)."""
    d2 = ((x * x).sum(1, keepdims=True) - 2.0 * (x @ cm.T)
          + (cm * cm).sum(1))
    a = d2.argmin(axis=1)
    return a, x - cm[a]


def ivfpq_train(ds, n_centroids: int = 8, m: int = 8, k: int = 16,
                vec_col: str = "embedding", id_col: str = "vec_id",
                n_iter: int = 8, seed: int = 7, coarse_init="sample"):
    """Train the full IVF-PQ index (Jégou et al. 2011 §III: coarse
    quantizer + product codebooks over coarse RESIDUALS): distributed
    L2 :func:`kmeans_fit` for the ``n_centroids`` coarse centroids, then
    one residual map pass feeds the distributed per-subspace
    :func:`pq_train`.  Vectors never materialize; the driver holds the
    (n_centroids × d) and (m × k × d/m) matrices only.  Returns
    ``(coarse, codebooks)``."""
    coarse, _ = kmeans_fit(ds, k=n_centroids, n_iter=n_iter,
                           vec_col=vec_col, id_col=id_col, metric="l2",
                           init=coarse_init, seed=seed, dtype=np.float64)
    cref = ray.put(coarse)

    def residual(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        x = _batch_matrix(batch, vec_col, np.float64)
        _, r = _coarse_assign(x, cm)
        return pa.table({id_col: batch[id_col],
                         vec_col: pa.array(list(r))})

    res = ds.map_batches(residual, batch_format="pyarrow",
                         zero_copy_batch=True)
    books = pq_train(res, m=m, k=k, vec_col=vec_col, id_col=id_col,
                     n_iter=n_iter, seed=seed)
    return coarse, books


def ivfpq_encode(ds, coarse: np.ndarray, codebooks: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 dtype=np.float64):
    """Map-only IVF-PQ encode: ONE pass assigns each vector to its L2
    coarse list and PQ-encodes the residual — output
    ``(id, list_id int32, pq_codes list<uint8>)``, the inverted-file
    layout (partition the sink by ``list_id`` at scale)."""
    cb = np.ascontiguousarray(codebooks, np.float64)
    ref = ray.put((np.ascontiguousarray(coarse, np.float64), cb))
    m, K, w = cb.shape

    def encode(batch: pa.Table) -> pa.Table:
        cm, books = ray.get(ref)
        x = _batch_matrix(batch, vec_col, dtype)
        a, r = _coarse_assign(x, cm)
        codes = np.empty((len(x), m), np.uint8)
        for s in range(m):
            rs = r[:, s * w:(s + 1) * w]
            d2 = ((rs * rs).sum(1, keepdims=True)
                  - 2.0 * (rs @ books[s].T)
                  + (books[s] * books[s]).sum(1))
            codes[:, s] = d2.argmin(axis=1)
        return pa.table({
            id_col: batch[id_col],
            "list_id": pa.array(a.astype(np.int32)),
            "pq_codes": pa.array(list(codes)),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def knn_ivfpq(enc_ds, queries: np.ndarray, coarse: np.ndarray,
              codebooks: np.ndarray, k: int = 10, nprobe: int = 4,
              id_col: str = "vec_id"):
    """IVF-PQ search (Jégou et al. 2011's composed system — the shape a
    10⁹-vector corpus needs): each query probes its ``nprobe`` nearest
    coarse lists and scores ONLY vectors in them, by ADC over the
    per-(query, list) residual LUT — pure table gathers + a row sum, no
    float vectors read back.  The driver broadcasts the
    (nq × nprobe × m × K) LUT tensor once and receives exactly q × k
    rows.  Ties (dist asc, id asc); probe ties toward the lowest list
    id.  Returns (query_id, rank, vec_id, adc_dist)."""
    cb = np.ascontiguousarray(codebooks, np.float64)
    cm = np.ascontiguousarray(coarse, np.float64)
    m, K, w = cb.shape
    q = np.ascontiguousarray(queries, np.float64)
    nq = q.shape[0]
    d2q = ((q * q).sum(1, keepdims=True) - 2.0 * (q @ cm.T)
           + (cm * cm).sum(1))
    probe = np.argsort(d2q, axis=1, kind="stable")[:, :nprobe]
    luts = np.empty((nq, nprobe, m, K), np.float64)
    for qi in range(nq):
        for pi in range(nprobe):
            rq = q[qi] - cm[probe[qi, pi]]
            for s in range(m):
                rs = rq[s * w:(s + 1) * w]
                luts[qi, pi, s, :] = ((rs * rs).sum()
                                      - 2.0 * (cb[s] @ rs)
                                      + (cb[s] * cb[s]).sum(1))
    ref = ray.put((probe, luts))

    def partial(batch: pa.Table) -> pa.Table:
        pr, lut = ray.get(ref)
        arr = batch["pq_codes"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codes = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64).reshape(len(arr), m)
        lids = batch["list_id"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy()
        out_q, out_id, out_d = [], [], []
        for qi in range(nq):
            for pi in range(pr.shape[1]):
                mask = lids == pr[qi, pi]
                if not mask.any():
                    continue
                sub = codes[mask]
                d = lut[qi, pi][np.arange(m)[None, :], sub].sum(axis=1)
                sub_ids = ids[mask]
                kk = min(k, d.size)
                order = np.lexsort((sub_ids, d))[:kk]
                out_q.append(np.full(kk, qi, np.int64))
                out_id.append(sub_ids[order])
                out_d.append(d[order])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "adc_dist": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id).astype(np.int64)),
            "adc_dist": pa.array(np.concatenate(out_d)),
        })

    parts = enc_ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=4096)
    return _merge_min_topk(parts, k, id_col, "adc_dist")
