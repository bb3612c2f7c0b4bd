"""Incremental upsert: fold a batch of new/updated documents into a live
index WITHOUT rebuilding it.

The reference engine has no incremental path at all — new content means a
full re-index and an index swap (/root/reference/indexing/main.py runs the
whole pipeline from scratch).  At 100 TB that is not a strategy, so this
module composes the engine's existing lifecycle primitives into the
Lucene-style update flow:

1. the update batch becomes a fresh DELTA index (``build_index`` over just
   the new rows — cost O(batch), not O(corpus));
2. every pre-existing version of an updated key (``(repo, path)`` by
   default) is TOMBSTONED in each live sub-index (``delete.tombstone_docs``
   — O(n_superseded), hard-linked artifacts, nothing re-encoded);
3. queries federate over [subs..., delta] (``federate.FederatedReader``),
   so the new versions are live immediately and the superseded ones are
   masked at decode time;
4. a maintenance window runs :func:`consolidate_upsert` (= ``merge_many``
   + ``compact_index``), which physically purges tombstones and recomputes
   exact statistics — after which the index is indistinguishable from a
   fresh build over the logically-updated corpus (the gate in
   tests/test_upsert.py).

Scale shape: the only driver-side state is the update batch's KEY column
(one string per updated doc — the small side of the join by construction;
a 10M-doc update batch is ~a few hundred MB of keys).  Keys are broadcast
once via ``ray.put`` and each ``_SupersededMatcher`` actor builds its hash
index once in ``__init__``; the doc-store scan streams column-pruned
fragments through the actors and only MATCHING doc ids (O(n_superseded))
return to the driver.  Nothing else moves: the base index is hard-linked,
the delta build sees only the update batch.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MANIFEST = "federation.json"
KEY_SEP = "\x00"


def _combined_keys(t: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    """One string key per row: key columns joined on NUL (NUL cannot
    appear inside a column value that came from a parquet string)."""
    cols = [pc.cast(t[c], pa.string()) for c in key_cols]
    if len(cols) == 1:
        return cols[0].combine_chunks()
    return pc.binary_join_element_wise(*cols, KEY_SEP).combine_chunks()


def _update_keys(source, key_cols: tuple[str, ...]) -> pa.Array:
    """The update batch's key column — the ONE driver-side collect this
    module performs (documented small side).  Path sources read only the
    key columns; Dataset sources project before the collect."""
    if isinstance(source, str):
        import pyarrow.dataset as pads

        t = pads.dataset(source, format="parquet").to_table(
            columns=list(key_cols))
    else:
        import ray

        t = pa.concat_tables(
            ray.get(source.select_columns(list(key_cols)).to_arrow_refs()))
    return _combined_keys(t, key_cols)


class _SupersededMatcher:
    """Actor-pool stage: doc-store batch -> the doc ids whose key is in
    the broadcast update-key set.  The hash index over the keys is built
    ONCE per actor (``pd.Index``), not per batch (``pc.is_in`` would
    rebuild its hash table on every call)."""

    def __init__(self, keys_ref, key_cols: tuple[str, ...]):
        import pandas as pd
        import ray

        self.key_cols = key_cols
        keys = (ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef)
                else keys_ref)  # fn_constructor_args may pre-resolve refs
        self.index = pd.Index(keys.to_pandas())

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = _combined_keys(t, self.key_cols)
        hit = self.index.get_indexer(keys.to_pandas()) >= 0
        return t.filter(pa.array(hit)).select(["doc_id"])


def find_superseded(index_dir: str, keys_ref,
                    key_cols: tuple[str, ...] = ("repo", "path"),
                    concurrency: int = 2) -> np.ndarray:
    """Sorted doc ids in ``index_dir`` whose key matches the broadcast
    update-key set (``keys_ref`` = ``ray.put(pa.Array)``)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(index_dir, "doc_store"),
        columns=["doc_id", *key_cols])
    ds = ds.map_batches(_SupersededMatcher, batch_format="pyarrow",
                        zero_copy_batch=True, concurrency=concurrency,
                        fn_constructor_args=(keys_ref, key_cols))
    ids = np.concatenate(
        [b["doc_id"].to_numpy(zero_copy_only=False)
         for b in ds.iter_batches(batch_format="pyarrow")]
        or [np.zeros(0, np.int64)])
    return np.sort(ids.astype(np.int64))


def _read_manifest(index_dir: str) -> list[str] | None:
    p = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        rel = json.load(f)["subs"]
    return [os.path.join(index_dir, r) for r in rel]


def _write_manifest(out_dir: str, sub_names: list[str]) -> None:
    tmp = os.path.join(out_dir, MANIFEST + f".tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump({"subs": sub_names}, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))


def resolve_subs(index_dir: str) -> list[str]:
    """The physical sub-index dirs behind ``index_dir`` — itself, unless
    it is an upsert federation (has a manifest)."""
    return _read_manifest(index_dir) or [index_dir]


def upsert_index(index_dir: str, out_dir: str, source,
                 cfg=None, *,
                 key_cols: tuple[str, ...] = ("repo", "path"),
                 input_token: str | None = None,
                 concurrency: int = 2) -> dict[str, Any]:
    """Upsert ``source`` (parquet path or Dataset with the engine input
    schema) into the index at ``index_dir``; the result at ``out_dir`` is
    a federation dir (sub_000..sub_NNN + federation.json) served by
    :func:`open_upsert`.  ``index_dir`` is untouched; repeated upserts
    chain (an upsert of an upsert tombstones across ALL live subs).

    The update batch must be key-unique: two live versions of one key in
    a single batch is always a caller bug and would serve both."""
    import ray

    from rayindex.build import build_index
    from rayindex.delete import tombstone_docs

    subs = resolve_subs(index_dir)
    keys = _update_keys(source, key_cols)
    if len(keys) == 0:
        raise ValueError("empty update batch")
    n_uniq = pc.count_distinct(keys).as_py()
    if n_uniq != len(keys):
        raise ValueError(
            f"update batch has duplicate {'+'.join(key_cols)} keys "
            f"({len(keys)} rows, {n_uniq} distinct) — two live versions "
            "of one document; dedup to keep-last upstream")

    os.makedirs(out_dir, exist_ok=True)
    # delta build FIRST: if it fails, out_dir holds no half-written
    # federation (the manifest is written last, atomically)
    delta_name = f"sub_{len(subs):03d}"
    build_index(source, os.path.join(out_dir, delta_name), cfg,
                input_token=input_token)

    keys_ref = ray.put(keys)
    sub_names = []
    n_superseded = 0
    for i, sub in enumerate(subs):
        name = f"sub_{i:03d}"
        ids = find_superseded(sub, keys_ref, key_cols,
                              concurrency=concurrency)
        tombstone_docs(sub, os.path.join(out_dir, name), ids)
        n_superseded += int(ids.size)
        sub_names.append(name)
    sub_names.append(delta_name)
    _write_manifest(out_dir, sub_names)
    return {"n_updates": int(len(keys)), "n_superseded": n_superseded,
            "n_subs": len(sub_names),
            "subs": [os.path.join(out_dir, s) for s in sub_names]}


def open_upsert(out_dir: str):
    """A FederatedReader over the federation at ``out_dir`` (also accepts
    a plain single index dir)."""
    from rayindex.federate import FederatedReader

    return FederatedReader(resolve_subs(out_dir))


def consolidate_upsert(upsert_dir: str, final_dir: str, cfg=None,
                       *, keep_intermediate: bool = False
                       ) -> dict[str, Any]:
    """Maintenance fold: physically merge the federation's subs and purge
    tombstones — ``final_dir`` equals a fresh build over the logically
    updated corpus in vocabulary, df/cf, postings and ranking (doc ids
    are assigned in sub order rather than global key order; everything
    key-addressed is identical)."""
    import shutil

    from rayindex.compact import compact_index
    from rayindex.merge import merge_many

    subs = resolve_subs(upsert_dir)
    if len(subs) < 2:
        raise ValueError(f"{upsert_dir} is not a federation")
    tmp = final_dir.rstrip("/") + ".premerge"
    m = merge_many(subs, tmp)
    c = compact_index(tmp, final_dir, cfg)
    if not keep_intermediate:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"merge": m, "compact": c}
