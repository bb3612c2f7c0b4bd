"""Distinct-count operators: an exact distributed COUNT(DISTINCT) and a
HyperLogLog sketch whose register table is bit-reproducible in SQL.

Scale shapes:

- ``distinct_per_group`` — the pair-dedup combiner.  Stage 1 reduces
  each batch to its unique (group, value) pairs inside ``map_batches``
  (Arrow ``group_by`` — C kernel), so what shuffles is bounded by the
  number of DISTINCT pairs per batch, not rows.  Stage 2 dedupes pairs
  globally with one native multi-key groupby; stage 3 is a tiny
  single-key count.  Nothing ever holds a per-group value set in heap.

- ``hll_register_table`` — the mergeable-sketch combiner.  Stage 1
  folds each batch into at most ``2**p`` (bucket, rho) register rows
  (vectorized FNV-1a + ``np.maximum.at``); stage 2 merges partials with
  a native ``groupby(bucket).max`` — registers merge by elementwise
  max, the defining HLL property (Flajolet et al. 2007).  At any corpus
  size the shuffle moves O(tasks × 2**p) rows and the driver sees at
  most 2**p.

Determinism contract: the hash is FNV-1a over the value's 8
little-endian bytes (``rayindex.datapipe.sampling.fnv1a_u64``)
finalized with splitmix64 (``mix64`` — FNV alone is not
avalanche-grade, see its docstring) and ``rho`` is computed with
integer-only bit ops (smear + popcount — no float log2), so a DuckDB
oracle reproduces the REGISTER TABLE exactly: hash twins =
``__ray_entry__._fnv64_id_sql`` + ``_mulmod64_sql``, bit-length twin =
``bit_count`` of the bit-smeared remainder.  The float estimate is
derived driver-side from the (tiny, exact) register table and is gated
by a pytest accuracy bound instead of a hash match.

Reference analog: the reference engine keeps exact per-term df/cf
accumulators (search_engine indexer); a 100-TB corpus profile needs the
sketch form for ad-hoc cardinalities (distinct users, URLs, shingles)
where an exact two-level groupby is still fine for grouped reports but
a single merged 2**p-register sketch is what you'd persist per shard.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayindex.datapipe.sampling import fnv1a_u64


def distinct_per_group(ds, group_col: str, value_col: str):
    """(group, n_distinct) — exact distributed COUNT(DISTINCT value)
    per group; see module docstring for the combiner shape."""

    def unique_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([group_col, value_col])
        return t.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([])

    def rename(t: pa.Table) -> pa.Table:
        n = t["count()"].combine_chunks().cast(pa.int64())
        return pa.table({group_col: t[group_col], "n_distinct": n})

    return (ds.map_batches(unique_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby([group_col, value_col]).count()   # global pair dedup
              .select_columns([group_col])               # one row per pair
              .groupby(group_col).count()                # values per group
              .map_batches(rename, batch_format="pyarrow"))


def distinct_count(ds, col: str) -> int:
    """Exact distributed COUNT(DISTINCT col) — scalar convenience:
    per-batch unique combiner, one global groupby, driver sees only the
    row count."""

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([col])
        return t.select([col]).group_by([col]).aggregate([])

    return (ds.map_batches(uniq, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(col).count()
              .count())


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer on top of FNV-1a.  FNV alone is NOT
    avalanche-grade: on dense integer keys its register maxima come out
    systematically low (measured: 38k distinct sequential ids at p=12
    estimate 0.54× exact; with this finalizer 0.98×).  The finalizer has
    an exact DuckDB twin (``__ray_entry__._mulmod64_sql`` decomposes the
    64×64 multiply into 32-bit halves so HUGEINT never overflows)."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _rho_int(w: np.ndarray, width: int) -> np.ndarray:
    """rho = leading zeros of the ``width``-bit value + 1, integer-only:
    bit-smear then popcount gives bit_length; no float log2 (a value at
    an exact power-of-two boundary must not round across it)."""
    s = w.astype(np.uint64, copy=True)
    for sh in (1, 2, 4, 8, 16, 32):
        s |= s >> np.uint64(sh)
    # popcount via byte view (numpy<2 has no bitwise_count)
    bl = np.unpackbits(s.view(np.uint8)).reshape(s.size, 64).sum(
        axis=1).astype(np.int64)
    return width - bl + 1


def hll_register_table(ds, col: str, p: int = 12):
    """HyperLogLog registers of ``col``: Dataset of (bucket, rho) for
    the nonzero registers, bucket/rho int64.  Deterministic and exactly
    SQL-reproducible (module docstring)."""
    if not 4 <= p <= 18:
        raise ValueError(f"p={p} outside [4, 18]")
    width = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "rho": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        vals = t[col].combine_chunks()
        vals = vals.drop_null()
        if len(vals) == 0:
            return empty
        h = mix64(fnv1a_u64(
            vals.cast(pa.int64()).to_numpy(zero_copy_only=False)))
        bucket = (h >> np.uint64(width)).astype(np.int64)
        w = h & np.uint64((1 << width) - 1)
        rho = _rho_int(w, width)
        regs = np.zeros(1 << p, np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table({"bucket": nz.astype(np.int64),
                         "rho": regs[nz]})

    from ray.data.aggregate import Max

    return (ds.select_columns([col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("bucket")
              .aggregate(Max("rho", alias_name="rho")))


def hll_estimate(registers: pa.Table, p: int = 12) -> float:
    """Cardinality estimate from a (bucket, rho) register table —
    standard HLL harmonic mean with the small-range linear-counting
    correction (Flajolet et al. 2007).  Driver-side over ≤2**p rows."""
    m = 1 << p
    regs = np.zeros(m, np.int64)
    if registers.num_rows:
        b = registers["bucket"].to_numpy(zero_copy_only=False)
        r = registers["rho"].to_numpy(zero_copy_only=False)
        regs[b] = r
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.exp2(-regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """End-to-end approximate COUNT(DISTINCT col): distributed register
    build + merge, driver-side estimate.  Standard error ~1.04/sqrt(2**p)
    (~1.6% at p=12)."""
    return hll_estimate(_collect(hll_register_table(ds, col, p)), p)


def _collect(reg_ds) -> pa.Table:
    """Materialize the ≤2**p register rows as one Arrow table."""
    import pyarrow as _pa
    parts = [b for b in reg_ds.iter_batches(batch_format="pyarrow")]
    if not parts:
        return _pa.table({"bucket": _pa.array([], _pa.int64()),
                          "rho": _pa.array([], _pa.int64())})
    return _pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): approximate per-key
# frequency in fixed space — the heavy-hitter / frequency-capping
# primitive of a training-data pipeline (cap over-represented domains,
# boilerplate n-grams) when the exact value_counts histogram would be
# vocabulary-sized.  Combiner shape: per-batch partial (depth, cell)
# count grids (np.add.at — one d×w array per batch), merged by a native
# groupby sum; counts are exact integer sums over deterministic cell
# assignments, so the CELL TABLE gets a full rows+schema+hash DuckDB
# oracle (same double-hash probe scheme as bloom.py, same SQL twins).
# Estimates (min over depth rows) are derived driver-side from the tiny
# cell table and carry the classic one-sided guarantee:
# true <= est <= true + eps*N with eps = e/width w.h.p.
# ---------------------------------------------------------------------------


def cms_cell_table(ds, col: str, depth: int = 4, width: int = 512):
    """Count-min cell table of ``col``: Dataset of (depth, cell, cnt)
    for the nonzero cells; all int64.  ``width`` must be a power of two
    (cells are hash-masked, not mod'd — the SQL twin uses ``&``)."""
    if width & (width - 1):
        raise ValueError(f"width={width} must be a power of two")

    def partial(t: pa.Table) -> pa.Table:
        from rayindex.datapipe.bloom import probe_positions

        empty = pa.table({"depth": pa.array([], pa.int64()),
                          "cell": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        vals = t[col].combine_chunks().drop_null()
        if len(vals) == 0:
            return empty
        pos = probe_positions(
            vals.cast(pa.int64()).to_numpy(zero_copy_only=False),
            k=depth, m_bits=width)                      # (n, depth)
        grid = np.zeros((depth, width), np.int64)
        d_idx = np.broadcast_to(np.arange(depth), pos.shape)
        np.add.at(grid, (d_idx.ravel(), pos.astype(np.int64).ravel()), 1)
        dd, cc = np.nonzero(grid)
        return pa.table({"depth": pa.array(dd.astype(np.int64)),
                         "cell": pa.array(cc.astype(np.int64)),
                         "cnt": pa.array(grid[dd, cc])})

    from ray.data.aggregate import Sum

    return (ds.select_columns([col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["depth", "cell"])
              .aggregate(Sum("cnt", alias_name="cnt")))


def cms_estimate(cells: pa.Table, keys: np.ndarray, depth: int = 4,
                 width: int = 512) -> np.ndarray:
    """Frequency estimates (min over depth rows) for ``keys`` from a
    (depth, cell, cnt) table — driver-side over ≤depth×width cells."""
    from rayindex.datapipe.bloom import probe_positions

    grid = np.zeros((depth, width), np.int64)
    if cells.num_rows:
        grid[cells["depth"].to_numpy(zero_copy_only=False),
             cells["cell"].to_numpy(zero_copy_only=False)] = \
            cells["cnt"].to_numpy(zero_copy_only=False)
    pos = probe_positions(np.asarray(keys, np.int64), k=depth,
                          m_bits=width).astype(np.int64)
    return grid[np.arange(depth)[None, :], pos].min(axis=1)
