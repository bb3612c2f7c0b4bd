"""Bloom-filter membership: build a compact bitset from a small key set,
broadcast it once, and filter a huge stream against it in map_batches.

The 100-TB use case is blocklist anti-filtering — drop training
documents whose id / url-hash appears in a benchmark-contamination or
takedown list: the blocklist side fits one node, the corpus side never
shuffles, and each task tests k bit probes per row against the
plasma-shared bitset.  Unlike the exact broadcast ``anti_join``
(joins.py:240-266), the Bloom form keeps working when the key set
outgrows an exact ``is_in`` value set (bits, not values: 10^9 keys at
10 bits/key is ~1.2 GB of bitset vs 8+ GB of raw int keys — and far
more for strings) at the price of a deterministic false-positive rate
(members are NEVER dropped by the anti filter; ~(1-e^{-kn/m})^k
non-members are).

Build-side scale shape: per-batch probe-position partials (unique'd
inside ``map_batches``), driver folds them into the m-bit bitset —
driver state is the bitset itself (the product), never the keys.

Determinism contract: probes use double hashing
``g_i = (h1 + i*h2) mod 2^64, masked to m-1`` (m a power of two) with
``h1 = mix64(fnv1a_u64(key))`` and ``h2 = mix64(h1 xor GOLDEN) | 1``
(odd => full-period stepping; Kirsch & Mitzenmacher 2006 show two
hashes suffice).  Every op is integer-exact with a DuckDB twin
(``__ray_entry__._mix64_sql_ctes``), so the filtered output — INCLUDING
exactly which false positives survive — is SQL-reproducible (oracle
entry ``bloom_filter_events``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayindex.datapipe.sampling import fnv1a_u64
from rayindex.datapipe.sketch import mix64

GOLDEN = 0x9E3779B97F4A7C15  # 2^64 / phi — the h2 decorrelation constant


def probe_positions(keys: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions for each key; see module determinism
    contract."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits={m_bits} must be a power of two")
    h1 = mix64(fnv1a_u64(keys))
    h2 = mix64(h1 ^ np.uint64(GOLDEN)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                & np.uint64(m_bits - 1))


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    """OR the positions into the packed bitset (duplicate words must
    accumulate — fancy-index ``|=`` keeps only the last write)."""
    np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))


def bloom_build(small, col: str, m_bits: int = 1 << 16,
                k: int = 4) -> np.ndarray:
    """Packed uint64 bitset (m_bits/64 words) of the small side's keys.
    ``small`` is a pa.Table or a Dataset; the Dataset path streams
    per-batch UNIQUE position partials back and folds them into the
    bitset — driver heap is O(m_bits), never O(keys)."""
    bits = np.zeros(m_bits // 64, np.uint64)
    if isinstance(small, pa.Table):
        v = small[col].combine_chunks().drop_null()
        if len(v):
            pos = np.unique(probe_positions(
                v.cast(pa.int64()).to_numpy(zero_copy_only=False), k, m_bits))
            _set_bits(bits, pos)
        return bits

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().drop_null()
        if not len(v):
            return pa.table({"pos": pa.array([], pa.int64())})
        pos = np.unique(probe_positions(
            v.cast(pa.int64()).to_numpy(zero_copy_only=False), k, m_bits))
        return pa.table({"pos": pa.array(pos.astype(np.int64))})

    parts = small.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    for b in parts.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            _set_bits(bits, b["pos"].to_numpy(
                zero_copy_only=False).astype(np.uint64))
    return bits


def bloom_contains(bits: np.ndarray, keys: np.ndarray,
                   k: int) -> np.ndarray:
    """Boolean membership mask: all k probe bits set."""
    m_bits = bits.size * 64
    pos = probe_positions(keys, k, m_bits)
    probe = (bits[(pos >> np.uint64(6)).astype(np.int64)]
             >> (pos & np.uint64(63))) & np.uint64(1)
    return probe.all(axis=1)


def bloom_filter(big_ds, small, big_col: str, small_col: str | None = None,
                 m_bits: int = 1 << 16, k: int = 4, anti: bool = True):
    """Filter the big side against a Bloom bitset of the small side's
    keys: ``anti=True`` (the blocklist shape) drops probable members —
    every true member is dropped, a deterministic ~(1-e^{-kn/m})^k of
    non-members go with them; ``anti=False`` keeps probable members.
    The bitset is ``ray.put`` once; the big side never shuffles."""
    import ray

    bits = bloom_build(small, small_col or big_col, m_bits, k)
    ref = ray.put(bits)

    def filt(t: pa.Table) -> pa.Table:
        col = t[big_col].combine_chunks()
        keys = col.fill_null(0).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        member = bloom_contains(ray.get(ref), keys, k)
        # a NULL key is never a member (matches the SQL twin, where the
        # NULL hash drops out of the probe join)
        member &= col.is_valid().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~member if anti else member))

    return big_ds.map_batches(filt, batch_format="pyarrow",
                              zero_copy_batch=True)
