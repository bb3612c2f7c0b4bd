"""Per-group top-k selection — "keep the k best docs per domain/lang",
the selection step of quality-filtered training-data curation.

Scale shape: the classic top-k combiner.  Stage 1 is a stateless
``map_batches`` partial that reduces every batch to at most k rows PER
GROUP (vectorized pandas lexsort + ``groupby().head(k)`` — C kernels,
no per-group Python).  Only those partials shuffle: the exchange
carries O(k × groups × batches) rows, never the corpus.  Stage 2 is a
``groupby(group).map_groups`` final cut over ≤ k·batches rows per
group.  Determinism: ties break on ascending ``id_col``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def top_k_per_group(ds, group_col: str, order_col: str, k: int,
                    id_col: str = "doc_id", descending: bool = True):
    """Dataset of the k extreme rows per group, columns
    (group_col, id_col, order_col), ordering by ``order_col``
    (descending by default) with ascending ``id_col`` tie-break."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = [group_col, id_col, order_col]

    def _cut(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([group_col, order_col, id_col],
                               ascending=[True, not descending, True])
                  .groupby(group_col, sort=False).head(k)[cols])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or group_col not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in cols})
        return _cut(df)

    num_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[group_col].to_numpy(zero_copy_only=False)
        if len(keys) and keys.dtype.kind in "iu":
            b = keys.astype(np.int64) % num_buckets
        else:  # string groups: stable crc over the category dictionary
            import zlib

            cat = pd.Categorical(keys)
            cb = np.asarray([zlib.crc32(str(c).encode()) % num_buckets
                             for c in cat.categories], np.int64)
            b = cb[cat.codes] if len(keys) else np.empty(0, np.int64)
        return t.append_column("b", pa.array(b))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket holds MANY groups; _cut is group-wise already
        # (sort + groupby(group).head(k)), so this is one vectorized
        # kernel per bucket — not one Python call per distinct group
        if g.empty or group_col not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in cols})
        return _cut(g[cols])

    return (ds.map_batches(partial, batch_format="pandas")
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("b")
              .map_groups(final, batch_format="pandas"))
