"""Windowed aggregates over an ordered event log.

Ray Data has no event-time windows; a tumbling window over (key, ts) is a
plain groupby on (key, window_id) with the window id computed per batch —
no per-key state needed for tumbling/fixed windows, so this stays a
pre-aggregated two-step: per-batch partial aggregates, then a small
``groupby().aggregate`` over partials (the combiner pattern — raw events
never shuffle twice).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def tumbling_window(ds, window_s: int = 3600, key_col: str = "user_id",
                    ts_col: str = "ts", val_col: str = "value"):
    """Per-key tumbling window: (key, window_start, n_events, sum_value,
    min_value, max_value).  window_start = floor(epoch/window)*window (s).
    """

    def add_window(t: pa.Table) -> pa.Table:
        # normalize the unit first: pandas-sourced columns arrive as ns,
        # parquet-sourced as µs
        epoch = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        win = pc.multiply(
            pc.divide(epoch, pa.scalar(window_s * 1_000_000, pa.int64())),
            pa.scalar(window_s, pa.int64()),
        )
        return pa.table({
            key_col: t[key_col],
            "window_start": win,
            val_col: t[val_col],
        })

    return (
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(val_col, alias_name="sum_value"),
            Min(val_col, alias_name="min_value"),
            Max(val_col, alias_name="max_value"),
        )
    )


def hopping_window(ds, window_s: int = 3600, hop_s: int = 900,
                   key_col: str = "user_id", ts_col: str = "ts",
                   val_col: str = "value"):
    """Per-key hopping (sliding) window: each event belongs to exactly
    ``window_s // hop_s`` overlapping windows; the expansion is a
    vectorized ``np.repeat`` inside ``map_batches`` (factor k, bounded
    and known), then the same native combiner aggregate as the tumbling
    window.  Requires ``window_s % hop_s == 0``.  Returns
    (key, window_start, n_events, sum_value)."""
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s

    def expand(t: pa.Table) -> pa.Table:
        epoch = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        base = epoch.to_numpy() // (hop_s * 1_000_000)  # hop bucket of ts
        n = t.num_rows
        # windows containing ts start at (base - j) * hop for j in 0..k-1
        j = np.tile(np.arange(k, dtype=np.int64), n)
        starts = (np.repeat(base, k) - j) * hop_s
        return pa.table({
            key_col: pc.take(t[key_col], pa.array(np.repeat(np.arange(n), k), pa.int64())).combine_chunks(),
            "window_start": pa.array(starts, pa.int64()),
            val_col: pc.take(t[val_col], pa.array(np.repeat(np.arange(n), k), pa.int64())).combine_chunks(),
        })

    return (
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(val_col, alias_name="sum_value"),
        )
    )


def sessionize(ds, gap_s: int = 1800, key_col: str = "user_id",
               ts_col: str = "ts", num_buckets: int = 64):
    """Session windows (gap-based): requires per-key ordering, so this IS
    a shuffle — but grouped by ``key % num_buckets``, not by raw key: the
    reducer runs ``num_buckets`` vectorized kernels (sort by (key, ts),
    session boundary = key change OR gap, reduceat-style slicing) instead
    of one pandas call per user — a million-user log would otherwise pay
    a million tiny group calls.  All of one key's events still land in
    one bucket, so sessions are exact.  Returns (key, session_start,
    session_end, n_events)."""
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype.kind in "iu":
            b = keys.astype(np.int64) % num_buckets
        else:  # string keys: stable FNV over the dictionary
            import zlib

            cat = pd.Categorical(keys)
            cb = np.asarray([zlib.crc32(str(c).encode()) % num_buckets
                             for c in cat.categories], np.int64)
            b = cb[cat.codes]
        return t.append_column("b", pa.array(b))

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or key_col not in g.columns:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="int64"),
                "session_end": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64")})
        g = g.sort_values([key_col, ts_col], kind="stable")
        keys = g[key_col].to_numpy()
        # normalize to ns first: parquet-sourced timestamps arrive as
        # datetime64[us] in pandas 2.x and astype(int64) would yield µs
        ts = (pd.to_datetime(g[ts_col]).astype("datetime64[ns]")
              .astype("int64").to_numpy() // 10**9)  # → s
        new = np.concatenate(
            [[True], (np.diff(ts) > gap_s) | (keys[1:] != keys[:-1])])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], ts.size) - 1
        return pd.DataFrame({
            key_col: keys[starts],
            "session_start": ts[starts].astype(np.int64),
            "session_end": ts[ends].astype(np.int64),
            "n_events": (np.append(starts[1:], ts.size)
                         - starts).astype(np.int64),
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("b")
              .map_groups(sessions_bucket, batch_format="pandas"))
