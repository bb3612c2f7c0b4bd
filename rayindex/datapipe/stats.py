"""Corpus-profile statistics: exact distributed quantiles over a
discrete-valued column (doc lengths, quality scores, token counts).

Scale shape: the value-HISTOGRAM combiner.  Stage 1 reduces each batch to
(value, count) partials inside ``map_batches`` (np.unique — C kernel);
stage 2 is a native ``groupby(value).sum`` over partials.  What reaches
the driver is one row per DISTINCT value — for length-like columns that
is thousands of rows regardless of corpus size (a 10^12-doc corpus has
the same ~10^5 distinct lengths).  For genuinely continuous columns,
bin first (the histogram of quantized values bounds the quantile error
by the bin width); this module is the exact path for discrete domains.

Quantile definition: DuckDB's ``quantile_disc`` — the element at sorted
index ``max(ceil(q·N) − 1, 0)`` — so the SQL oracle can assert
bit-equality.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def value_counts(ds, col: str):
    """(value, n) per distinct value — histogram combiner (see module
    docstring)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or col not in t.column_names:
            return pa.table({col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v, c = np.unique(t[col].combine_chunks().cast(pa.int64())
                         .to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({col: pa.array(v), "n": pa.array(c.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(col)
              .aggregate(Sum("n", alias_name="n")))


def value_quantiles(ds, col: str, qs: tuple[float, ...]) -> pd.DataFrame:
    """Exact quantiles of an int-valued column: DataFrame (q, value)
    using the quantile_disc rule.  Driver state = the distinct-value
    histogram (small for discrete domains), never the rows."""
    hist = value_counts(ds, col).to_pandas()
    if hist.empty or col not in hist.columns:
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "value": pd.Series([], dtype="int64")})
    hist = hist.sort_values(col)
    vals = hist[col].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    out_v = []
    for q in qs:
        rank = max(int(np.ceil(q * n)), 1)  # 1-based rank of the element
        out_v.append(int(vals[np.searchsorted(cum, rank)]))
    return pd.DataFrame({"q": np.asarray(qs, np.float64),
                         "value": np.asarray(out_v, np.int64)})
