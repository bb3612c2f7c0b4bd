"""Connected components over near-duplicate pair graphs, and the
canonical-doc dedup built on them.

The reference engine's dedup analogues end at PAIR lists; a web-scale
training-data pipeline needs the final step too: near-dup pairs →
connected COMPONENTS → keep ONE canonical doc per component (the
fuzzy-dedup shape of C4/RefinedWeb-style corpus preparation).

Scale shape
-----------
``connected_components`` is iterative min-label contraction expressed
entirely in Ray Data primitives: per round ONE ``groupby().aggregate(Min)``
over the edge endpoints and hash-bucketed equi-joins (``_map_col``) to
rewrite edges through the new labels.  The materialized state per round
is the label table (orig_node, label) and the contracted edge table —
two int64 columns over the *duplicate-candidate nodes only*; the corpus
never enters the loop and the driver holds nothing but per-round edge
counts (the convergence check).  Rounds are bounded by the pair-graph
diameter: LSH/banded candidate clusters are band-induced near-cliques
(every member shares a band bucket with most others), so real dup
graphs converge in 2–3 rounds.  For adversarially chained graphs the
alternating large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) gives O(log d) rounds at
the cost of two groupbys per round; the naive contraction is kept here
because dup-cluster diameters are tiny and the per-round shape is what
matters at 100 TB.

The equi-joins deliberately avoid ``Dataset.join``: Ray's hash-shuffle
join materializes EMPTY partitions as schema-less tables (its
ArrowBlockBuilder().build() of zero blocks), which poisons the Acero
key FieldRef whenever num_partitions exceeds the number of occupied
buckets — routine for the small, shrinking per-round tables here.
``_map_col`` instead buckets both sides by key hash and merges inside
each bucket group (vectorized ``pd.merge`` — many keys per call, never
per-key Python), the same reducer shape as dedup._dedup_pairs.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY_CC = pa.table({"node": pa.array([], pa.int64()),
                      "comp": pa.array([], pa.int64())})
_EMPTY_EDGES = pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})


def _canon_edges(t: pa.Table) -> pa.Table:
    """Canonicalize (a, b) -> (min, max), drop self-loops."""
    if t.num_rows == 0 or "doc_a" not in t.column_names:
        return _EMPTY_EDGES
    a = t["doc_a"].combine_chunks().cast(pa.int64())
    b = t["doc_b"].combine_chunks().cast(pa.int64())
    lo = pc.min_element_wise(a, b)
    hi = pc.max_element_wise(a, b)
    keep = pc.not_equal(lo, hi)
    return pa.table({"doc_a": lo.filter(keep), "doc_b": hi.filter(keep)})


def _force_cols(*names: str):
    """map_batches fn renaming a two-int64-column table to ``names`` with
    a FIXED schema even for the zero-column empty blocks aggregate
    partitions can emit."""
    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns < len(names):
            return pa.table({c: pa.array([], pa.int64()) for c in names})
        return pa.table({c: t.column(i).cast(pa.int64())
                         for i, c in enumerate(names)})
    return f


def _edge_min_labels(edges):
    """m(node) = min over the CLOSED neighborhood of node — one groupby
    over the exploded (node, candidate) messages of every edge."""
    from ray.data.aggregate import Min

    def msgs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return _EMPTY_CC.rename_columns(["node", "cand"])
        a = t["doc_a"].combine_chunks()
        b = t["doc_b"].combine_chunks()
        node = pa.chunked_array([a, b, a, b]).combine_chunks()
        cand = pa.chunked_array([b, a, a, b]).combine_chunks()
        return pa.table({"node": node, "cand": cand})

    return (edges.map_batches(msgs, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .groupby("node")
                 .aggregate(Min("cand", alias_name="comp"))
                 .map_batches(_force_cols("node", "comp"),
                              batch_format="pyarrow"))


def _map_col(tbl, m, buckets: int, keep_unmapped: bool):
    """Map ``tbl.k`` through ``m`` (node → comp), carrying ``tbl.v``:
    returns a Dataset (k = m[k] — or k itself when unmapped and
    ``keep_unmapped``, v = carried value).

    Hash-bucketed equi-join: both sides shuffle ONCE by key-hash bucket,
    then a vectorized ``pd.merge`` runs inside each bucket group (many
    keys per call).  Reducer parallelism = ``buckets``; no schema-less
    empty partitions (see module docstring)."""
    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns < 2:
                cols = {"k": [], "v": [], "s": [], "bk": []}
                return pa.table({c: pa.array(v, pa.int64())
                                 for c, v in cols.items()})
            k = t.column(0).combine_chunks().cast(pa.int64())
            kv = k.to_numpy(zero_copy_only=False)
            return pa.table({
                "k": k,
                "v": t.column(1).combine_chunks().cast(pa.int64()),
                "s": pa.array(np.full(len(kv), side, np.int64)),
                "bk": pa.array((kv * 1000003) % buckets),
            })
        return f

    both = (tbl.map_batches(tag(0), batch_format="pyarrow")
               .union(m.map_batches(tag(1), batch_format="pyarrow")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "v": pd.Series([], dtype="int64")})
        if g.empty or "s" not in g.columns:
            return empty
        left = g[g["s"] == 0]
        if left.empty:
            return empty
        right = (g[g["s"] == 1][["k", "v"]]
                 .drop_duplicates("k").rename(columns={"v": "nxt"}))
        j = left[["k", "v"]].merge(right, on="k", how="left")
        mapped = j["nxt"].fillna(j["k"] if keep_unmapped else -1).astype("int64")
        out = pd.DataFrame({"k": mapped, "v": j["v"].astype("int64")})
        return out if keep_unmapped else out[j["nxt"].notna().to_numpy()]

    return both.groupby("bk").map_groups(merge, batch_format="pandas")


def connected_components(pairs_ds, max_rounds: int = 32,
                         buckets: int = 64):
    """(node, comp) for every node appearing in ``pairs_ds`` —
    ``comp`` is the MINIMUM doc id reachable in the undirected pair
    graph (the component's canonical representative).

    ``pairs_ds``: Dataset / Arrow table / DataFrame with int64 columns
    ``doc_a``, ``doc_b`` (self-loops and duplicate or reversed pairs are
    tolerated).  Returns a Dataset of (node int64, comp int64).

    See the module docstring for the per-round dataflow; each round's
    label/edge tables are materialized (they are the O(|dup nodes|)
    iteration state, not the corpus), and the loop raises if the graph
    has not contracted within ``max_rounds`` — at that point the input
    is not a near-dup pair graph and the large-star/small-star variant
    belongs in its place.
    """
    import ray
    import ray.data

    if isinstance(pairs_ds, pd.DataFrame):
        pairs_ds = ray.data.from_arrow(
            pa.Table.from_pandas(pairs_ds, preserve_index=False))
    elif isinstance(pairs_ds, pa.Table):
        pairs_ds = ray.data.from_arrow(pairs_ds)

    edges = pairs_ds.map_batches(
        _canon_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_EMPTY_CC)

    labels = None  # Dataset (node=orig id, comp=current label)
    for _ in range(max_rounds):
        m = _edge_min_labels(edges).materialize()
        if labels is None:
            labels = m
        else:
            # compose: comp' = m[comp] where defined, else comp.  The
            # label table is (node, comp); map its comp column through m
            # carrying node, then restore column order.
            swapped = labels.map_batches(
                lambda t: t.select(["comp", "node"]) if t.num_rows else
                _EMPTY_CC.rename_columns(["comp", "node"]),
                batch_format="pyarrow")
            labels = _map_col(
                swapped, m, buckets, keep_unmapped=True,
            ).map_batches(_force_cols("comp", "node"), batch_format="pyarrow"
            ).map_batches(lambda t: t.select(["node", "comp"]) if
                          t.num_rows else _EMPTY_CC,
                          batch_format="pyarrow").materialize()

        # rewrite edges through m: (a, b) -> (m[a], m[b]); every endpoint
        # is in m's domain by construction (keep_unmapped is moot)
        ea = _map_col(edges, m, buckets, keep_unmapped=True)   # (m[a], b)
        eb = _map_col(  # map the carried b: k=b, v=m[a]
            ea.map_batches(_force_cols("na", "doc_b"), batch_format="pyarrow")
              .map_batches(lambda t: t.select(["doc_b", "na"]) if t.num_rows
                           else _EMPTY_EDGES.rename_columns(["doc_b", "na"]),
                           batch_format="pyarrow"),
            m, buckets, keep_unmapped=True)                    # (m[b], m[a])

        def canon(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns < 2:
                return _EMPTY_EDGES
            return _canon_edges(pa.table({"doc_a": t.column(1),
                                          "doc_b": t.column(0)}))

        # per-round distinct: duplicate contracted edges re-send identical
        # mins; dropping them keeps the shuffled edge mass monotone.  The
        # native Count aggregate is sort-based with per-block combining —
        # no per-distinct-pair Python groups.
        from ray.data.aggregate import Count

        edges = (eb.map_batches(canon, batch_format="pyarrow")
                   .groupby(["doc_a", "doc_b"])
                   .aggregate(Count(alias_name="n"))
                   .map_batches(_force_cols("doc_a", "doc_b"),
                                batch_format="pyarrow")
                   .materialize())
        if edges.count() == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "input is not a near-dup pair graph (see module docstring)")


def dedup_keep_canonical(ds, pairs_ds, id_col: str = "doc_id",
                         buckets: int = 64):
    """Surviving doc ids after near-dup clustering: every doc KEEPS its
    row unless it belongs to a pair-graph component and is not that
    component's minimum id.

    The victim set (node != comp) is typically a small fraction of the
    corpus; it is broadcast once via ``ray.put`` and applied as a
    vectorized anti-filter inside ``map_batches`` — no corpus shuffle.
    For victim sets too large to broadcast, swap the filter for a
    ``left_anti`` hash join on ``id_col`` (same result, one corpus-wide
    exchange); the broadcast path is the right default because dup
    fractions beyond tens of percent make the *pair* stage the problem,
    not this one.

    Returns a Dataset with the same schema as ``ds``.
    """
    import ray

    cc = connected_components(pairs_ds, buckets=buckets)
    victims: list[int] = []
    for b in cc.map_batches(
            lambda t: t.filter(pc.not_equal(t["node"], t["comp"]))
                       .select(["node"]) if t.num_rows else
            pa.table({"node": pa.array([], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        victims.extend(b["node"].to_pylist())
    if not victims:
        return ds
    vic_ref = ray.put(pa.array(sorted(set(victims)), pa.int64()))

    def keep(t: pa.Table) -> pa.Table:
        vs = ray.get(vic_ref)
        return t.filter(pc.invert(pc.is_in(t[id_col], value_set=vs)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
