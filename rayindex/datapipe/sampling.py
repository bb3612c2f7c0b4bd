"""Deterministic hash sampling for training-data mixing.

Sampling at 100 TB cannot use RNG state: a resumable/re-runnable
pipeline needs every row's keep/drop decision to be a pure function of
the row, identical across retries, cluster sizes and runs.  The
standard answer is key hashing — keep a row iff
``fnv1a64(key) % M < rate * M`` — which this module implements as a
single stateless ``map_batches`` filter pass (no shuffle, no driver
state, embarrassingly parallel), with per-stratum rates for mixture
weighting (e.g. upsample rare languages, downsample boilerplate-heavy
sources).

FNV-1a here runs over the key's 8 little-endian bytes, fully
vectorized in numpy (the same unrolled 8 steps are emitted as DuckDB
SQL by ``__ray_entry__._fnv64_id_sql`` for the value-hash oracle).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFF = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)
_MOD = 1_000_000  # sampling resolution: rates quantize to 1e-6


def fnv1a_u64(ids: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over each int64's 8 little-endian bytes."""
    x = ids.astype(np.uint64)
    h = np.full(x.shape, _FNV_OFF, np.uint64)
    with np.errstate(over="ignore"):
        for shift in range(0, 64, 8):
            b = (x >> np.uint64(shift)) & np.uint64(0xFF)
            h = (h ^ b) * _FNV_PRIME
    return h


def _thresholds(rate) -> int:
    t = int(round(float(rate) * _MOD))
    if not 0 <= t <= _MOD:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return t


def hash_sample(ds, rate: float, key_col: str = "doc_id"):
    """Keep each row iff ``fnv1a64(key) % 1e6 < rate * 1e6`` —
    deterministic, order-independent, resume-safe; one stateless
    ``map_batches`` pass, no shuffle."""
    thr = _thresholds(rate)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = fnv1a_u64(t[key_col].combine_chunks().cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(h % np.uint64(_MOD) < np.uint64(thr)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, rates: dict[str, float], strata_col: str,
                      default_rate: float = 1.0, key_col: str = "doc_id"):
    """Per-stratum deterministic sampling (training-mixture weighting):
    a row in stratum ``s`` survives iff ``fnv1a64(key) % 1e6 <
    rates.get(s, default_rate) * 1e6``.

    Same stateless single-pass shape as ``hash_sample``; the stratum →
    threshold lookup is vectorized through the batch's dictionary
    encoding (one dict probe per DISTINCT stratum value per batch, not
    per row)."""
    thr_map = {k: _thresholds(v) for k, v in rates.items()}
    default_thr = _thresholds(default_rate)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = fnv1a_u64(t[key_col].combine_chunks().cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
        enc = t[strata_col].combine_chunks().dictionary_encode()
        per_value = np.asarray(
            [thr_map.get(v, default_thr) for v in enc.dictionary.to_pylist()],
            np.uint64)
        thr = per_value[enc.indices.to_numpy(zero_copy_only=False)] \
            if len(per_value) else np.zeros(0, np.uint64)
        return t.filter(pa.array(h % np.uint64(_MOD) < thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def dataset_split(ds, weights: "dict[str, float]", key_col: str = "doc_id"):
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative-weight interval contains
    ``fnv1a64(key) % 1e6`` — order-independent, resume-safe, disjoint
    and exhaustive (weights must sum to 1 within 1e-9).  One stateless
    map-only pass adding a ``split`` column; the same key always lands
    in the same split across runs and machines, so leakage between
    splits is impossible by construction."""
    names = list(weights)
    w = np.asarray([weights[k] for k in names], np.float64)
    if abs(w.sum() - 1.0) > 1e-9:
        raise ValueError(f"weights sum to {w.sum()}, need 1.0")
    bounds = np.round(np.cumsum(w) * _MOD).astype(np.uint64)
    bounds[-1] = _MOD  # guard fp drift: last interval always closes
    arr = np.asarray(names, object)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("split", pa.array([], pa.string()))
        h = fnv1a_u64(t[key_col].combine_chunks().cast(pa.int64())
                      .to_numpy(zero_copy_only=False)) % np.uint64(_MOD)
        idx = np.searchsorted(bounds, h, side="right")
        return t.append_column("split",
                               pa.array(arr[idx].tolist(), pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
