"""Corpus-profile statistics: exact distributed quantiles.

Two driver-bounded paths, dispatched by :func:`value_quantiles`:

- **Discrete (int) domains** — the value-HISTOGRAM combiner.  Stage 1
  reduces each batch to (value, count) partials inside ``map_batches``
  (np.unique — C kernel); stage 2 is a native ``groupby(value).sum``
  over partials.  What reaches the driver is one row per DISTINCT value
  — for length-like columns that is thousands of rows regardless of
  corpus size (a 10^12-doc corpus has the same ~10^5 distinct lengths).
  Guarded: if the distinct count exceeds ``distinct_cap`` (checked with
  a distributed ``count()`` BEFORE anything lands on the driver), the
  continuous path takes over.

- **Continuous (float / high-cardinality) domains** —
  :func:`float_quantiles`: iterative distributed histogram narrowing.
  Each round is ONE ``map_batches`` pass computing a fixed-width
  sub-histogram per still-active quantile (≤ ``bins`` buckets each),
  merged by a native groupby — driver state per round is
  ≤ n_quantiles × bins rows.  After ``narrow_iters`` rounds each
  quantile's candidate interval has width (hi−lo)/bins^iters; a final
  distributed pass collects the distinct values inside those slivers
  (grouped per quantile, reduced inside ``map_groups``) and picks the
  exact ranked element — one row per quantile reaches the driver.

Quantile definition (both paths): DuckDB's ``quantile_disc`` — the
element at sorted index ``max(ceil(q·N) − 1, 0)`` — so the SQL oracle
can assert bit-equality.
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


def value_quantiles(ds, col: str, qs: tuple[float, ...],
                    distinct_cap: int = 1_000_000) -> pd.DataFrame:
    """Exact quantiles of an int-valued column: DataFrame (q, value)
    using the quantile_disc rule.  Driver state = the distinct-value
    histogram (small for discrete domains), never the rows.

    Continuous / high-cardinality guard: a float-typed column routes
    straight to :func:`float_quantiles`; an int column whose distinct
    count (measured distributed, before any driver materialization)
    exceeds ``distinct_cap`` does too — so the driver histogram is
    bounded by construction, not by hope."""
    sch = ds.schema()
    ctype = dict(zip(sch.names, sch.types))[col]
    is_float = (pa.types.is_floating(ctype)
                if isinstance(ctype, pa.DataType)
                else np.issubdtype(np.dtype(ctype), np.floating))
    if is_float:
        out = float_quantiles(ds, col, qs)
        out["value"] = out["value"].astype("float64")
        return out
    hist_ds = value_counts(ds, col)
    if hist_ds.count() > distinct_cap:
        out = float_quantiles(ds, col, qs)
        out["value"] = out["value"].round().astype("int64")
        return out
    hist = hist_ds.to_pandas()
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


def _f64(t: pa.Table, col: str) -> np.ndarray:
    """Column as float64 with nulls → NaN (excluded by every mask)."""
    return (t[col].combine_chunks().cast(pa.float64())
            .to_numpy(zero_copy_only=False))


def float_quantiles(ds, col: str, qs: tuple[float, ...],
                    bins: int = 4096, narrow_iters: int = 2) -> pd.DataFrame:
    """Exact quantile_disc over a CONTINUOUS column with driver state
    bounded by construction (module docstring: iterative distributed
    histogram narrowing).  Per round the driver holds ≤ len(qs) × bins
    (key, count) rows; the final ranked element is picked inside a
    ``groupby(iq).map_groups`` task, so exactly one row per quantile
    lands on the driver.  After ``narrow_iters`` rounds each candidate
    sliver has width (hi−lo)/bins^iters — at the default 4096² ≈ 1.7e7×
    reduction the distinct values left inside are a handful even for
    dense float data."""
    from ray.data.aggregate import Max, Min, Sum

    nq = len(qs)
    if nq == 0:
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "value": pd.Series([], dtype="float64")})

    # pass 0: null-safe (n, lo, hi) — one-row-per-batch partials reduced
    # by native aggregates; one scalar dict reaches the driver.
    def span_partial(t: pa.Table) -> pa.Table:
        v = _f64(t, col)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([v.size], pa.int64()),
                         "mn": pa.array([float(v.min())]),
                         "mx": pa.array([float(v.max())])})

    span = (ds.map_batches(span_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .aggregate(Sum("n", alias_name="n"),
                         Min("mn", alias_name="lo"),
                         Max("mx", alias_name="hi")))
    n = int(span["n"] or 0)
    if n == 0:
        return pd.DataFrame({"q": np.asarray(qs, np.float64),
                             "value": np.full(nq, np.nan)})
    lo, hi = float(span["lo"]), float(span["hi"])
    qs_arr = np.asarray(qs, np.float64)
    res = np.maximum(np.ceil(qs_arr * n).astype(np.int64), 1)
    los = np.full(nq, lo)
    his = np.full(nq, hi)
    inc = np.ones(nq, bool)  # hi-inclusive (true while hi is the global max)

    for _ in range(narrow_iters):
        if not np.any(los < his):
            break
        edges = np.stack([np.linspace(los[i], his[i], bins + 1)
                          for i in range(nq)])
        elo, ehi, einc = los.copy(), his.copy(), inc.copy()

        def subhist(t: pa.Table) -> pa.Table:
            v = _f64(t, col)
            keys, cnts = [], []
            for i in range(nq):
                if elo[i] >= ehi[i]:
                    continue
                m = (v >= elo[i]) & ((v <= ehi[i]) if einc[i]
                                     else (v < ehi[i]))
                if not m.any():
                    continue
                idx = np.clip(np.searchsorted(edges[i], v[m], side="right")
                              - 1, 0, bins - 1)
                c = np.bincount(idx, minlength=bins)
                nz = np.nonzero(c)[0]
                keys.append(i * bins + nz)
                cnts.append(c[nz])
            if not keys:
                return pa.table({"key": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({"key": np.concatenate(keys).astype(np.int64),
                             "cnt": np.concatenate(cnts).astype(np.int64)})

        hist = (ds.map_batches(subhist, batch_format="pyarrow",
                               zero_copy_batch=True)
                  .groupby("key")
                  .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())
        key = hist["key"].to_numpy(np.int64)
        cnt = hist["cnt"].to_numpy(np.int64)
        for i in range(nq):
            if los[i] >= his[i]:
                continue
            sel = (key // bins) == i
            b, c = key[sel] % bins, cnt[sel]
            order = np.argsort(b)
            b, c = b[order], c[order]
            cum = c.cumsum()
            j = int(np.searchsorted(cum, res[i]))
            if j:
                res[i] -= int(cum[j - 1])
            bi = int(b[j])
            los[i], his[i] = edges[i][bi], edges[i][bi + 1]
            inc[i] = bool(einc[i] and bi == bins - 1)

    # final exact pass: distinct values inside each sliver → per-quantile
    # group → the residual-ranked element picked inside the group task.
    flo, fhi, finc, fres = los.copy(), his.copy(), inc.copy(), res.copy()

    def sliver(t: pa.Table) -> pa.Table:
        v = _f64(t, col)
        iqs, vals, cnts = [], [], []
        for i in range(nq):
            m = (v >= flo[i]) & ((v <= fhi[i]) if finc[i] else (v < fhi[i]))
            if not m.any():
                continue
            u, c = np.unique(v[m], return_counts=True)
            iqs.append(np.full(u.size, i, np.int64))
            vals.append(u)
            cnts.append(c.astype(np.int64))
        if not iqs:
            return pa.table({"iq": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"iq": np.concatenate(iqs),
                         "value": np.concatenate(vals),
                         "cnt": np.concatenate(cnts)})

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        i = int(df["iq"].iloc[0])
        g = df.groupby("value", sort=True)["cnt"].sum()
        cum = g.to_numpy().cumsum()
        j = int(np.searchsorted(cum, fres[i]))
        return pd.DataFrame({"iq": [i],
                             "value": [float(g.index.to_numpy()[j])]})

    picked = (ds.map_batches(sliver, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("iq")
                .map_groups(pick, batch_format="pandas").to_pandas())
    vals = np.full(nq, np.nan)
    vals[picked["iq"].to_numpy(np.int64)] = picked["value"].to_numpy()
    return pd.DataFrame({"q": qs_arr, "value": vals})
