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

    Native ``aggregate(Min, Count)`` over the hash key — one sort-based
    shuffle of (hash, id) pairs with per-block combining, no per-distinct-
    hash pandas groups (millions of tiny map_groups calls at corpus scale).
    """
    from ray.data.aggregate import Count, Min

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256((x or "").encode()).hexdigest() for x in t[text_col].to_pylist()]
        return pa.table({id_col: t[id_col], "h": pa.array(hs, pa.string())})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))
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
        return self._permute_min(_shingles(text, self.k))

    def _permute_min(self, sh: np.ndarray) -> np.ndarray:
        if sh.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        # fold shingle hashes to 32 bits, then (a*x + b) mod 2^31-1 — every
        # intermediate fits uint64 exactly (a < 2^31, x < 2^32 → a*x < 2^63)
        x = ((sh ^ (sh >> np.uint64(32))) & np.uint64(0xFFFFFFFF))[None, :]
        vals = (self.a[:, None] * x + self.b[:, None]) % self.MP
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rayindex.datapipe.text import gram_hashes, hash_tokens_flat

        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col]
        flat, offs = hash_tokens_flat(texts)
        sigs = []
        short: list[int] = []  # 0 < n_tokens < k → joined-string fallback
        for di in range(len(offs) - 1):
            hs = flat[offs[di]:offs[di + 1]]
            if 0 < hs.size < self.k:
                short.append(di)
                sigs.append(None)
            else:
                sh = (np.unique(gram_hashes(hs, self.k))
                      if hs.size else np.zeros(0, np.uint64))
                sigs.append(self._permute_min(sh))
        if short:  # rare path keeps the scalar shingle semantics exactly
            st = texts.to_pylist() if not isinstance(texts, list) else texts
            for di in short:
                sigs[di] = self.signature(st[di])
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
        })


_EMPTY_PAIRS = {"doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "est_jaccard": pd.Series([], dtype="float64")}


def _dedup_pairs(pairs, pair_buckets: int,
                 extra_cols: tuple[tuple[str, str], ...] = (("est_jaccard", "float64"),)):
    """Distributed (doc_a, doc_b) pair dedup: hash-partition pairs into
    ``pair_buckets`` groups and drop duplicates inside each — every copy of
    a pair lands in the same group, no single-partition funnel."""
    cols = ["doc_a", "doc_b", *(c for c, _ in extra_cols)]
    dtypes = {"doc_a": "int64", "doc_b": "int64", **dict(extra_cols)}

    def _empty(with_pk: bool) -> pd.DataFrame:
        out = pd.DataFrame({c: pd.Series([], dtype=dtypes[c]) for c in cols})
        if with_pk:
            out["pk"] = pd.Series([], dtype="int64")
        return out

    def add_pk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "doc_a" not in df.columns:
            return _empty(with_pk=True)
        df = df.copy()
        df["pk"] = (df["doc_a"].to_numpy(np.int64) * 1000003
                    + df["doc_b"].to_numpy(np.int64)) % pair_buckets
        return df

    def drop_dups(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "doc_a" not in g.columns:
            return _empty(with_pk=False)
        return (g.sort_values(["doc_a", "doc_b"])
                 .drop_duplicates(["doc_a", "doc_b"])[cols])

    return (pairs.map_batches(add_pk, batch_format="pandas")
                 .groupby("pk")
                 .map_groups(drop_dups, batch_format="pandas"))


def minhash_candidates(ds, num_perm: int = 128, bands: int = 32,
                       shingle_k: int = 5, text_col: str = "text",
                       id_col: str = "doc_id", pair_buckets: int = 64):
    """LSH banding: docs sharing any band bucket become candidate pairs.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduplicated.

    Shuffle shape: signatures explode to (band_id, bucket, band_key,
    doc_id, sig) rows and group by ``(band_id, bucket)`` where ``bucket``
    is a hash of the band values mod ``pair_buckets`` — reducer
    parallelism is bands x pair_buckets and each reducer receives only its
    bucket's rows (grouping by band alone caps parallelism at ``bands``
    and ships a full corpus-width band to ONE reducer).  Docs with equal
    band values share a bucket by construction, so no candidates are lost;
    exact bucket membership inside the group still compares the raw
    ``band_key`` bytes (hash collisions only co-locate, never pair).
    Candidate pairs are deduplicated DISTRIBUTED via a second
    hash-partitioned groupby (no repartition(1) funnel).
    """
    rows_per_band = num_perm // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k,
                               "text_col": text_col, "id_col": id_col},
        # autoscaling (min=1): a fixed pool of 4 claims every CPU of a
        # 4-CPU session and starves the upstream read tasks (deadlock);
        # min=1 always leaves CPUs for the task pools
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "band_id": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int32()),
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
        # deterministic bucket = polynomial mix of the band's values — any
        # two docs with equal band values get the same bucket (doc-major
        # ravel matches the ids/band_ids layout)
        band_mat = mat.reshape(n, bands, rows_per_band)
        h = np.zeros((n, bands), np.uint64)
        for r in range(rows_per_band):
            h = h * np.uint64(1000003) + band_mat[:, :, r]
        buckets = (h % np.uint64(pair_buckets)).astype(np.int32).ravel()
        sig_rows = np.repeat(mat, bands, axis=0)  # full signature per band row
        offsets = np.arange(n * bands + 1, dtype=np.int32) * num_perm
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "bucket": pa.array(buckets, pa.int32()),
            "band_key": pa.array(keys, pa.binary()),
            "sig": pa.ListArray.from_arrays(pa.array(offsets), pa.array(sig_rows.ravel())),
        })

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(dict(_EMPTY_PAIRS))
        if len(g) < 2 or id_col not in g.columns:
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
            ids = bucket[id_col].to_numpy(np.int64)
            # vectorized pairwise signature agreement (the simhash_pairs
            # triu pattern): one matrix compare per bucket, no per-pair
            # Python loop
            sig_mat = np.stack([np.asarray(s, np.uint64)
                                for s in bucket["sig"].tolist()])
            ii, jj = np.triu_indices(len(ids), k=1)
            agree = (sig_mat[ii] == sig_mat[jj]).mean(axis=1)
            a_out.append(ids[ii])
            b_out.append(ids[jj])
            est.append(agree)
        if not a_out:
            return empty
        return pd.DataFrame({"doc_a": np.concatenate(a_out),
                             "doc_b": np.concatenate(b_out),
                             "est_jaccard": np.concatenate(est)})

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band_id", "bucket"])
        .map_groups(band_pairs, batch_format="pandas")
    )
    return _dedup_pairs(pairs, pair_buckets)


_VERIFIED_EMPTY = pa.table({"doc_a": pa.array([], pa.int64()),
                            "doc_b": pa.array([], pa.int64()),
                            "jaccard": pa.array([], pa.float64())})


def verify_candidates(ds, pairs_ds, shingle_k: int = 5, text_col: str = "text",
                      id_col: str = "doc_id", min_jaccard: float = 0.0,
                      num_partitions: int | None = None):
    """Exact n-gram Jaccard verification of LSH candidate pairs —
    distributed end to end.

    - The driver collects only the candidate *id set* (ints), which is
      ``ray.put`` once and read inside each shingling task (broadcast
      semi-join filter) — texts never reach the driver.
    - Shingle sets are computed only for candidate docs, then hash-joined
      onto the pair rows twice (doc_a side, doc_b side) — a shuffle of
      candidate shingle sets, never of the corpus.
    - Exact Jaccard runs vectorized inside ``map_batches`` where both
      sides' shingles are co-located.

    Returns a Dataset of (doc_a, doc_b, jaccard) filtered to
    ``min_jaccard``.
    """
    import ray
    import ray.data
    import pyarrow.compute as pc

    if isinstance(pairs_ds, pd.DataFrame):
        pairs_ds = ray.data.from_arrow(pa.Table.from_pandas(pairs_ds, preserve_index=False))
    elif isinstance(pairs_ds, pa.Table):
        pairs_ds = ray.data.from_arrow(pairs_ds)

    id_parts = pairs_ds.map_batches(
        lambda t: pa.table({"i": pc.unique(pa.chunked_array([
            t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()
        ]).combine_chunks())}),
        batch_format="pyarrow")
    needed: set[int] = set()
    for b in id_parts.iter_batches(batch_format="pyarrow"):
        needed.update(b["i"].to_pylist())
    if not needed:
        return ray.data.from_arrow(_VERIFIED_EMPTY)
    if num_partitions is None:
        # the candidate id-set is already driver-side: size the join shuffle
        # to it (8 aggregator actors per join are pure overhead for a few
        # hundred candidates; large candidate sets still fan out)
        num_partitions = max(2, min(64, len(needed) // 2000 + 1))
    needed_ref = ray.put(pa.array(sorted(needed), pa.int64()))

    def shingle_rows(t: pa.Table) -> pa.Table:
        vs = ray.get(needed_ref)
        sub = t.filter(pc.is_in(t[id_col], value_set=vs))
        shs = [_shingles(x, shingle_k) for x in sub[text_col].to_pylist()]
        # binary blobs, not list<uint64>: Acero hash joins reject list-typed
        # payload columns
        return pa.table({
            id_col: sub[id_col],
            "sh": pa.array([s.tobytes() for s in shs], pa.large_binary()),
        })

    sh = ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)

    def _side(side: str):
        return sh.map_batches(
            lambda t, s=side: pa.table({f"doc_{s}": t[id_col], f"sh_{s}": t["sh"]}),
            batch_format="pyarrow")

    j = pairs_ds.join(_side("a"), join_type="inner",
                      num_partitions=num_partitions, on=("doc_a",))
    j = j.join(_side("b"), join_type="inner",
               num_partitions=num_partitions, on=("doc_b",))

    def jac(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sh_a" not in t.column_names:
            return _VERIFIED_EMPTY
        out_a, out_b, out_j = [], [], []
        for a, b, sa, sb in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
                                t["sh_a"].to_pylist(), t["sh_b"].to_pylist()):
            aa = np.frombuffer(sa or b"", np.uint64)
            bb = np.frombuffer(sb or b"", np.uint64)
            if aa.size == 0 and bb.size == 0:
                jv = 1.0
            else:
                inter = np.intersect1d(aa, bb, assume_unique=True).size
                union = aa.size + bb.size - inter
                jv = inter / union if union else 0.0
            if jv >= min_jaccard:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(jv)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return j.map_batches(jac, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, min_jaccard: float = 0.5, shingle_k: int = 5,
                        text_col: str = "text", id_col: str = "doc_id",
                        pair_buckets: int = 64):
    """EXACT n-gram Jaccard similarity self-join: every pair of docs with
    shingle-set Jaccard >= ``min_jaccard`` (no LSH false negatives).

    Scale shape is the AllPairs/PPJoin prefix filter (Bayardo et al.,
    WWW'07), not an O(N^2) cross join:

    - Shingles carry a GLOBAL total order (their uint64 hash value;
      ``_shingles`` returns them sorted).  A doc with ``n`` shingles
      indexes only its first ``floor((1 - t) * n) + 1`` of them: if
      J(A, B) >= t, the intersection has > (1 - t)·|A| elements outside
      no prefix — i.e. both prefixes are guaranteed to share at least one
      shingle, so grouping prefix rows by shingle yields a COMPLETE
      candidate set while indexing only a (1 - t) fraction of the corpus'
      shingle mass.
    - Inside each shingle group, the standard length filter
      (min_size >= t * max_size, a necessary condition for J >= t) prunes
      pairs vectorized (triu matrix compare, no per-pair Python).
    - Candidate pairs dedup DISTRIBUTED (hash-partitioned groupby,
      ``_dedup_pairs``), then exact Jaccard runs through the same
      broadcast-filter + shingle hash-join used for LSH verification
      (``verify_candidates``) — texts never reach the driver.

    Returns a Dataset of (doc_a, doc_b, jaccard), doc_a < doc_b.
    Docs whose shingle set is empty (no tokens) never pair — matching the
    SQL oracle's shs-join semantics.
    """
    def prefix_rows(t: pa.Table) -> pa.Table:
        from rayindex.datapipe.text import gram_hashes, hash_tokens_flat

        ids = t[id_col].to_numpy(zero_copy_only=False)
        flat, offs = hash_tokens_flat(t[text_col])
        texts = None  # lazily materialized only for sub-k docs
        ids_out, sh_out, n_out = [], [], []
        np_err = np.seterr(over="ignore")
        for di, i in enumerate(ids):
            hs = flat[offs[di]:offs[di + 1]]
            if 0 < hs.size < shingle_k:  # rare: joined-string shingle
                if texts is None:
                    texts = t[text_col].to_pylist()
                s = _shingles(texts[di], shingle_k)
            else:
                s = (np.unique(gram_hashes(hs, shingle_k))
                     if hs.size else np.zeros(0, np.uint64))
            if s.size == 0:
                continue
            # required overlap alpha = ceil(t*n); prefix = n - alpha + 1.
            # The epsilon biases float error toward a LONGER prefix (extra
            # candidates are filtered later; a short prefix loses pairs).
            alpha = int(np.ceil(min_jaccard * s.size - 1e-9))
            p = s.size - max(alpha, 1) + 1
            pref = s[:p]
            ids_out.append(np.full(pref.size, i, np.int64))
            sh_out.append(pref)
            n_out.append(np.full(pref.size, s.size, np.int64))
        np.seterr(**np_err)
        if not ids_out:
            return pa.table({"sh": pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64()),
                             "n_sh": pa.array([], pa.int64())})
        return pa.table({"sh": pa.array(np.concatenate(sh_out)),
                         id_col: pa.array(np.concatenate(ids_out)),
                         "n_sh": pa.array(np.concatenate(n_out))})

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64")})
        if len(g) < 2 or id_col not in g.columns:
            return empty
        a_out, b_out = [], []
        for _, grp in g.groupby("sh", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(id_col)
            ids = grp[id_col].to_numpy(np.int64)
            sizes = grp["n_sh"].to_numpy(np.int64)
            ii, jj = np.triu_indices(len(ids), k=1)
            # length filter: J(A,B) <= min/max sizes, so require
            # min >= t * max (strictly necessary for J >= t)
            lo = np.minimum(sizes[ii], sizes[jj])
            hi = np.maximum(sizes[ii], sizes[jj])
            keep = lo >= min_jaccard * hi
            if keep.any():
                a_out.append(ids[ii][keep])
                b_out.append(ids[jj][keep])
        if not a_out:
            return empty
        return pd.DataFrame({"doc_a": np.concatenate(a_out),
                             "doc_b": np.concatenate(b_out)})

    def add_bucket(t: pa.Table) -> pa.Table:
        # reducer parallelism: shingle-hash mod pair_buckets (a group per
        # shingle would be millions of tiny groups; a single group would
        # funnel).  Equal shingles share a bucket by construction; the
        # group kernel still pairs only within equal ``sh``.
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], pa.int32()))
        sh = t["sh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (sh % np.uint64(pair_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    cand = (ds.map_batches(prefix_rows, batch_format="pyarrow",
                           zero_copy_batch=True)
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(group_pairs, batch_format="pandas"))
    cand = _dedup_pairs(cand, pair_buckets, extra_cols=())
    return verify_candidates(ds, cand, shingle_k=shingle_k,
                             text_col=text_col, id_col=id_col,
                             min_jaccard=min_jaccard)


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
    from rayindex.datapipe.text import hash_tokens_flat

    flat, offs = hash_tokens_flat(batch[text_col])
    out = []
    for di in range(len(offs) - 1):
        hs = flat[offs[di]:offs[di + 1]]
        if hs.size == 0:
            out.append(0)
            continue
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via the byte view."""
    return np.unpackbits(x.view(np.uint8)).reshape(x.size, 8 * 8).sum(axis=1)


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", pair_buckets: int = 64):
    """EXACT SimHash near-dup pairs: (doc_a, doc_b, hamming) with
    hamming(sig_a, sig_b) <= max_hamming, doc_a < doc_b, deduplicated.

    Banding with ``max_hamming + 1`` bands over the 64-bit signature: two
    signatures differing in <= t bits must agree exactly on at least one
    band (pigeonhole), so band-equality candidates are a SUPERSET of the
    true pairs and the in-group exact popcount filter makes the output
    exact — the same candidate→verify shape as MinHash-LSH, but closed
    under one operator.  Groups are (band_id, band value mod
    ``pair_buckets``); pair dedup is hash-partition distributed.
    """
    bands = max_hamming + 1
    widths = [64 // bands + (1 if i < 64 % bands else 0) for i in range(bands)]
    shifts = np.cumsum([0] + widths[:-1]).astype(np.uint64)

    sigs = ds.map_batches(simhash_batch,
                          fn_kwargs={"text_col": text_col, "id_col": id_col},
                          batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "band_id": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int32()),
                "bval": pa.array([], pa.uint64()),
                "sig": pa.array([], pa.uint64()),
            })
        sig = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy()
        out_id = np.repeat(ids, bands)
        out_band = np.tile(np.arange(bands, dtype=np.int32), n)
        bvals = np.empty((n, bands), np.uint64)
        for i, (s, w) in enumerate(zip(shifts, widths)):
            bvals[:, i] = (sig >> s) & np.uint64((1 << w) - 1)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "band_id": pa.array(out_band),
            "bucket": pa.array((bvals % np.uint64(pair_buckets))
                               .astype(np.int32).ravel()),
            "bval": pa.array(bvals.ravel()),
            "sig": pa.array(np.repeat(sig, bands)),
        })

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        if len(g) < 2 or id_col not in g.columns:
            return empty
        dup = g.duplicated("bval", keep=False)
        if not dup.any():
            return empty
        g = g[dup]
        a_out, b_out, h_out = [], [], []
        for _, bucket in g.groupby("bval", sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.sort_values(id_col)
            ids = bucket[id_col].to_numpy(np.int64)
            sg = bucket["sig"].to_numpy().astype(np.uint64)
            ii, jj = np.triu_indices(len(ids), k=1)
            hm = _popcount64(sg[ii] ^ sg[jj])
            keep = hm <= max_hamming
            a_out.extend(ids[ii[keep]].tolist())
            b_out.extend(ids[jj[keep]].tolist())
            h_out.extend(hm[keep].tolist())
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out,
                             "hamming": np.asarray(h_out, np.int64)})

    pairs = (sigs.map_batches(explode, batch_format="pyarrow")
                 .groupby(["band_id", "bucket"])
                 .map_groups(band_pairs, batch_format="pandas"))
    return _dedup_pairs(pairs, pair_buckets, extra_cols=(("hamming", "int64"),))
