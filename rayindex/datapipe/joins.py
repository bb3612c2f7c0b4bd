"""Relational joins Ray Data lacks as primitives, built scale-first.

Three shapes, three distribution strategies:

- ``asof_join`` — per-key "most recent right row at or before the left
  row's timestamp".  Needs per-key *ordered* access, so the one shuffle
  is ``groupby(key)`` and the kernel is a vectorized ``searchsorted``
  per group.  Partitioning assumption: one key's full history fits in a
  single group (salt/time-split a pathological key before calling).
- ``interval_join`` — per-key pairs where the right timestamp falls in
  ``[left_ts + lo, left_ts + hi]``.  The bounded window permits a
  bucketed hash join instead of a per-key group: both sides map to
  time buckets of width ``hi - lo`` (the left side to ≤2 buckets), a
  distributed ``Dataset.join`` co-locates (key, bucket), and an exact
  vectorized filter finishes.  No key ever needs to fit in one task, so
  hot keys don't skew — this is the 100-TB shape.
- ``semi_join`` / ``anti_join`` — broadcast filter joins: the small
  side's key set is ``ray.put`` ONCE and every ``map_batches`` task
  filters with ``pyarrow.compute.is_in`` against the shared ref.  The
  big side never shuffles.

Reference parity: the reference engine's only joins are in-process dict
lookups (docID → metadata, term → postings; SURVEY §2 J1–J6); these
operators generalize that to distributed event/fact tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US = 1_000_000


def _ts_us(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Any timestamp/int column → int64 epoch microseconds."""
    if pa.types.is_timestamp(col.type):
        col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    elif col.type != pa.int64():
        col = pc.cast(col, pa.int64())
    return col


def asof_join(left_ds, right_ds, key_col: str, left_ts_col: str,
              right_ts_col: str, left_cols: tuple[str, ...],
              right_cols: tuple[str, ...], tolerance_us: int | None = None):
    """Inner as-of join: for each left row, the single right row with the
    greatest ``right_ts <= left_ts`` for the same key; left rows with no
    prior right row are dropped (DuckDB ``ASOF JOIN`` semantics).

    Returns ``(key, *left_cols, left_ts, right_ts, *right_cols)`` with
    both timestamps as int64 epoch µs.  Requires unique ``(key,
    right_ts)`` on the right (pre-aggregate if not).  ``tolerance_us``
    additionally drops matches older than ``left_ts - tolerance_us``.

    One bucketed ``groupby(key % num_buckets)`` shuffle; each of the 64
    reducer calls runs ONE ``pd.merge_asof(by=key)`` C kernel over all
    of its keys — not one Python call per distinct key (a million-key
    join would otherwise pay a million tiny group calls; all rows of one
    key still land in one bucket, so matches are exact).
    """
    import pandas as pd

    l_payload = [c for c in left_cols if c != key_col]
    r_payload = [c for c in right_cols if c != key_col]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col], "__ts": _ts_us(t[left_ts_col]),
                "__side": pa.array(np.ones(t.num_rows, np.int8))}
        for c in l_payload:
            cols[c] = t[c]
        for c in r_payload:
            cols[c] = pa.nulls(t.num_rows, pa.float64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col], "__ts": _ts_us(t[right_ts_col]),
                "__side": pa.array(np.zeros(t.num_rows, np.int8))}
        for c in l_payload:
            cols[c] = pa.nulls(t.num_rows, pa.int64())
        for c in r_payload:
            cols[c] = pc.cast(t[c], pa.float64())
        return pa.table(cols)

    tagged = (left_ds.map_batches(tag_left, batch_format="pyarrow",
                                  zero_copy_batch=True)
              .union(right_ds.map_batches(tag_right, batch_format="pyarrow",
                                          zero_copy_batch=True)))

    empty = {key_col: pd.Series([], dtype="int64")}
    for c in l_payload:
        empty[c] = pd.Series([], dtype="int64")
    empty.update({"left_ts": pd.Series([], dtype="int64"),
                  "right_ts": pd.Series([], dtype="int64")})
    for c in r_payload:
        empty[c] = pd.Series([], dtype="float64")
    empty_df = pd.DataFrame(empty)

    num_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype.kind in "iu":
            b = keys.astype(np.int64) % num_buckets
        else:  # string keys: stable crc over the dictionary
            import zlib

            cat = pd.Categorical(keys)
            cb = np.asarray([zlib.crc32(str(c).encode()) % num_buckets
                             for c in cat.categories], np.int64)
            b = cb[cat.codes]
        return t.append_column("b", pa.array(b))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "__side" not in g.columns:
            return empty_df
        lmask = g["__side"].to_numpy() == 1
        L, R = g[lmask], g[~lmask]
        if L.empty or R.empty:
            return empty_df
        L = L.sort_values("__ts", kind="stable")
        R = R.sort_values("__ts", kind="stable")
        merged = pd.merge_asof(
            L[[key_col, "__ts", *l_payload]],
            R[[key_col, "__ts", *r_payload]].rename(
                columns={"__ts": "__rts"}),
            left_on="__ts", right_on="__rts", by=key_col,
            direction="backward", allow_exact_matches=True,
            tolerance=tolerance_us)
        merged = merged[merged["__rts"].notna()]
        if merged.empty:
            return empty_df
        out = {key_col: merged[key_col].to_numpy()}
        for c in l_payload:
            # the union fills this column with nulls on right rows, so
            # pandas widened it to float64; the left rows are exact ints
            out[c] = merged[c].to_numpy().astype(np.int64)
        out["left_ts"] = merged["__ts"].to_numpy().astype(np.int64)
        out["right_ts"] = merged["__rts"].to_numpy().astype(np.int64)
        for c in r_payload:
            out[c] = merged[c].to_numpy()
        return pd.DataFrame(out)

    return (tagged.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("b").map_groups(kernel, batch_format="pandas"))


def interval_join(left_ds, right_ds, key_col: str, left_ts_col: str,
                  right_ts_col: str, lo_us: int, hi_us: int,
                  left_id_col: str, right_id_col: str,
                  right_val_col: str | None = None,
                  num_partitions: int = 16):
    """Pairs ``(key, left_id, right_id[, right_val])`` where
    ``left_ts + lo_us <= right_ts <= left_ts + hi_us`` for the same key.

    Bucketed hash join: bucket width ``W = hi_us - lo_us`` means each
    left row's window overlaps at most 2 buckets, so the left explodes
    ≤2× to ``(key, bucket)``, the right maps to exactly one bucket, a
    distributed ``Dataset.join`` on the fused (key, bucket) id
    co-locates candidates, and an exact vectorized comparison filters.
    Skewed keys spread across buckets — no per-key group ever
    materializes.
    """
    W = int(hi_us - lo_us)
    if W <= 0:
        raise ValueError("hi_us must exceed lo_us")

    def fuse(key: np.ndarray, bucket: np.ndarray) -> np.ndarray:
        # collision-safe enough for a join key that is re-verified
        # exactly afterwards (splitmix-style mix of both words)
        x = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        x ^= bucket.astype(np.uint64) + np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(31)
        return (x & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)

    def explode_left(t: pa.Table) -> pa.Table:
        key = _ts_us(t[key_col]).to_numpy(zero_copy_only=False)
        ts = _ts_us(t[left_ts_col]).to_numpy(zero_copy_only=False)
        lid = t[left_id_col].to_numpy(zero_copy_only=False)
        b0 = (ts + lo_us) // W
        b1 = (ts + hi_us) // W
        n2 = b1 != b0  # window straddles two buckets
        key2 = np.concatenate([key, key[n2]])
        ts2 = np.concatenate([ts, ts[n2]])
        lid2 = np.concatenate([lid, lid[n2]])
        bk = np.concatenate([b0, b1[n2]])
        return pa.table({
            "__jk": pa.array(fuse(key2, bk)),
            "__lkey": pa.array(key2, pa.int64()),
            "__lts": pa.array(ts2, pa.int64()),
            left_id_col: pa.array(lid2),
        })

    def bucket_right(t: pa.Table) -> pa.Table:
        key = _ts_us(t[key_col]).to_numpy(zero_copy_only=False)
        ts = _ts_us(t[right_ts_col]).to_numpy(zero_copy_only=False)
        cols = {
            "__jk": pa.array(fuse(key, ts // W)),
            "__rkey": pa.array(key, pa.int64()),
            "__rts": pa.array(ts, pa.int64()),
            right_id_col: t[right_id_col],
        }
        if right_val_col is not None:
            cols[right_val_col] = pc.cast(t[right_val_col], pa.float64())
        return pa.table(cols)

    lt = left_ds.map_batches(explode_left, batch_format="pyarrow",
                             zero_copy_batch=True)
    rt = right_ds.map_batches(bucket_right, batch_format="pyarrow",
                              zero_copy_batch=True)
    j = lt.join(rt, join_type="inner", num_partitions=num_partitions,
                on=("__jk",))

    out_fields = [(key_col, pa.int64()), (left_id_col, pa.int64()),
                  (right_id_col, pa.int64()), ("right_ts", pa.int64())]
    if right_val_col is not None:
        out_fields.append((right_val_col, pa.float64()))
    empty = pa.table({n: pa.array([], t) for n, t in out_fields})

    def exact(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__rts" not in t.column_names:
            return empty
        lk = t["__lkey"].to_numpy()
        rk = t["__rkey"].to_numpy()
        lts = t["__lts"].to_numpy()
        rts = t["__rts"].to_numpy()
        keep = (lk == rk) & (rts >= lts + lo_us) & (rts <= lts + hi_us)
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        cols = {key_col: pa.array(lk[keep]),
                left_id_col: pc.take(t[left_id_col], idx).combine_chunks(),
                right_id_col: pc.take(t[right_id_col], idx).combine_chunks(),
                "right_ts": pa.array(rts[keep])}
        if right_val_col is not None:
            cols[right_val_col] = pc.take(t[right_val_col], idx).combine_chunks()
        return pa.table(cols)

    return j.map_batches(exact, batch_format="pyarrow")


def _key_set_ref(small, col: str):
    """Collect the small side's distinct keys driver-side and ``ray.put``
    them once; every filter task attaches to the same plasma object."""
    import ray
    import ray.data

    if isinstance(small, pa.Table):
        keys = pc.unique(small[col])
    else:
        parts = small.map_batches(
            lambda t: pa.table({col: pc.unique(t[col])}),
            batch_format="pyarrow")
        vals: set = set()
        for b in parts.iter_batches(batch_format="pyarrow"):
            vals.update(b[col].to_pylist())
        keys = pa.array(sorted(vals), pa.int64())
    return ray.put(keys)


def semi_join(big_ds, small, big_col: str, small_col: str | None = None,
              anti: bool = False):
    """Broadcast semi-join (``anti=True`` → anti-join): keep big-side rows
    whose ``big_col`` is (not) in the small side's ``small_col`` key set.

    The small side is reduced to its distinct keys (per-batch ``unique``
    partials, driver union), broadcast once via ``ray.put``, and the big
    side streams through a ``map_batches`` ``is_in`` filter — no shuffle
    of the big side, ever.
    """
    import ray

    ref = _key_set_ref(small, small_col or big_col)

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[big_col], value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return t.filter(mask)

    return big_ds.map_batches(filt, batch_format="pyarrow",
                              zero_copy_batch=True)


def anti_join(big_ds, small, big_col: str, small_col: str | None = None):
    """Broadcast anti-join; see :func:`semi_join`."""
    return semi_join(big_ds, small, big_col, small_col, anti=True)


def broadcast_join(big_ds, small: pa.Table, big_col: str, small_col: str,
                   payload_cols: tuple[str, ...]):
    """Broadcast enrich (lookup) join: append the small side's payload
    columns to every matching big-side row; non-matching rows drop
    (inner semantics).  The dimension-table pattern — the small side
    (unique on ``small_col``) is sorted driver-side and ``ray.put``
    ONCE; every task binary-searches its batch keys against the shared
    ref.  The big side never shuffles and never materializes.
    """
    import ray

    order = pc.sort_indices(small[small_col])
    small = small.take(order).combine_chunks()
    keys = small[small_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if keys.size > 1 and (keys[1:] == keys[:-1]).any():
        raise ValueError(f"small side is not unique on {small_col}")
    ref = ray.put((keys, {c: small[c] for c in payload_cols}))

    def enrich(t: pa.Table) -> pa.Table:
        k, payload = ray.get(ref)
        big = pc.cast(t[big_col], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k, big)
        idx_c = np.minimum(idx, k.size - 1)
        hit = (k[idx_c] == big) if k.size else np.zeros(big.size, bool)
        t = t.filter(pa.array(hit))
        take = pa.array(idx_c[hit], pa.int64())
        for c in payload_cols:
            t = t.append_column(c, pc.take(payload[c], take))
        return t

    return big_ds.map_batches(enrich, batch_format="pyarrow",
                              zero_copy_batch=True)
