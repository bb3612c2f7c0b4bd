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

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or group_col not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype="object")
                                 for c in cols})
        return _cut(g)

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby(group_col)
              .map_groups(final, batch_format="pandas"))
