"""Ranking comparison — reference parity for its results-diff tool
(/root/reference/search/retrieval/retrieval_results/compare_results.py:
16-33, which counts per-rank agreements between a BM25 and an LM run of
the same query and the position-independent overlap of the two result
sets).  Here it is a Dataset-native operator over ranked result tables
(query_id, rank, doc_id): per-query kernels run distributed via
``groupby(query_id).map_groups`` — rankings are k rows per query, so the
single shuffle key is the natural partition and no driver loop touches
results."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def compare_rankings(a, b, *, query_col: str = "query_id",
                     rank_col: str = "rank", doc_col: str = "doc_id"):
    """Per-query agreement of two rankings: ``same_position_count`` (docs
    equal at the same rank) and ``overlap_count`` (set intersection of
    the two result lists).  ``a``/``b`` are ``ray.data.Dataset`` or
    ``pyarrow.Table`` with (query_col, rank_col, doc_col); queries absent
    from BOTH sides emit no row.  Returns a Dataset of
    (query_id, same_position_count, overlap_count)."""
    import ray.data

    def to_ds(x, side: int):
        t = x if isinstance(x, pa.Table) else None
        if t is not None:
            t = t.select([query_col, rank_col, doc_col]).append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int8)))
            return ray.data.from_arrow(t)
        return x.select_columns([query_col, rank_col, doc_col]).add_column(
            "_side", lambda df: np.full(len(df), side, np.int8))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        ga = g[g["_side"] == 0].sort_values(rank_col)
        gb = g[g["_side"] == 1].sort_values(rank_col)
        n = min(len(ga), len(gb))
        same = int((ga[doc_col].to_numpy()[:n]
                    == gb[doc_col].to_numpy()[:n]).sum())
        overlap = int(np.intersect1d(ga[doc_col].to_numpy(),
                                     gb[doc_col].to_numpy()).size)
        return pd.DataFrame({query_col: [g[query_col].iloc[0]],
                             "same_position_count": [same],
                             "overlap_count": [overlap]})

    return (to_ds(a, 0).union(to_ds(b, 1))
            .groupby(query_col).map_groups(agg, batch_format="pandas"))
