"""Delete documents from a built index WITHOUT a rebuild — the
GDPR/takedown path: doc ids keep their values (deleted ids become holes,
exactly like the build's oversize filter), postings drop the deleted
docs, and every collection/term statistic is recomputed so the result
scores queries as if the docs had never been ingested.

The reference has no delete tool (its indexes are immutable JSON-lines
rebuilt from scratch, /root/reference/indexing/); this closes the index
lifecycle the merge tool (rayindex/merge.py) opened: merge folds an
increment IN, delete takes documents OUT, and both leave an index
byte-compatible with a fresh build's readers.

Scale shape — deletes touch O(deleted) blocks, not the index: the
deleted-id set (sorted int64 array, ray.put once) is probed against each
term's per-block [block_first, block_last] ranges from DICT METADATA
ALONE (vectorized searchsorted); an untouched block's doc/tf/pos bytes
are spliced verbatim, and only blocks that actually contain a deleted
doc are decoded, filtered and re-encoded (each fine block restarts its
delta chains absolutely, searcher.py:39-70, so a single block
round-trips standalone).  One Ray task per shard, one pass per doc-store
part; no shuffle, nothing driver-side but the id set and per-part
decisions.
"""
from __future__ import annotations

import glob
import hashlib
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from rayindex import codec
from rayindex.merge import (_bin_of, _doc_space, _link_or_copy, _shard_paths,
                            _write_shard_records)


def select_doc_ids(index_dir: str, filter_expr: "pads.Expression"
                   ) -> np.ndarray:
    """Resolve a doc-store predicate (a ``pyarrow.dataset`` expression over
    repo/path/commit/lang/doc_id) to the sorted doc-id array it matches —
    column-pruned, row-group-filtered scan of the doc store only."""
    ds = pads.dataset(os.path.join(index_dir, "doc_store"), format="parquet")
    t = ds.to_table(columns=["doc_id"], filter=filter_expr)
    return np.sort(t["doc_id"].to_numpy())


def _hit_mask(first: np.ndarray, last: np.ndarray,
              deleted: np.ndarray) -> np.ndarray:
    """Per-range mask: does [first[i], last[i]] contain any deleted id?
    (``deleted`` sorted ascending.)"""
    return (np.searchsorted(deleted, last, "right")
            > np.searchsorted(deleted, first, "left"))


def _delete_shard(out_dir: str, dict_path: str, deleted: np.ndarray,
                  doc_len_path: str, fp: str) -> int:
    """Rewrite one shard dropping ``deleted`` docs; returns the surviving
    term count.  Untouched blocks byte-copy; touched blocks re-encode.
    A matching ``.maint.json`` manifest skips the shard (resume)."""
    from rayindex.merge import _maint_done, _maint_skip

    sid0 = int(os.path.basename(dict_path)[len("shard_"):len("shard_") + 5])
    done = _maint_skip(out_dir, sid0, fp)
    if done is not None:
        return done
    t = pq.read_table(dict_path)
    with open(_bin_of(dict_path), "rb") as f:
        buf = memoryview(f.read())
    dl_map = np.memmap(doc_len_path, np.int64, mode="r")
    c = t.column
    recs: dict[str, dict[str, Any]] = {}
    for row in range(t.num_rows):
        def v(name):
            return c(name)[row].as_py()

        def arr(name, dtype):
            return np.asarray(c(name)[row].as_py(), dtype)

        first = arr("block_first", np.int64)
        last = arr("block_last", np.int64)
        hit = _hit_mask(first, last, deleted)
        doc_off, doc_len = v("doc_off"), v("doc_len")
        tf_off, tf_len = v("tf_off"), v("tf_len")
        pos_off, pos_len = v("pos_off"), v("pos_len")
        boff_doc = arr("block_doc_boff", np.int64)
        boff_tf = arr("block_tf_boff", np.int64)
        boff_pos = arr("block_pos_boff", np.int64)
        bn = arr("block_n", np.int32)
        bmax = arr("block_max_tf", np.int32)
        bmin = arr("block_min_dl", np.int32)
        nb = first.size
        ends_d = np.append(boff_doc[1:], doc_len)
        ends_t = np.append(boff_tf[1:], tf_len)
        ends_p = np.append(boff_pos[1:], pos_len)
        if not hit.any():
            # whole-term verbatim splice
            recs[v("term")] = {
                "df": v("df"), "cf": v("cf"), "max_tf": v("max_tf"),
                "doc_parts": [buf[doc_off:doc_off + doc_len]],
                "tf_parts": [buf[tf_off:tf_off + tf_len]],
                "pos_parts": [buf[pos_off:pos_off + pos_len]],
                "doc_len": doc_len, "tf_len": tf_len, "pos_len": pos_len,
                "block_first": first, "block_last": last, "block_n": bn,
                "block_max_tf": bmax, "block_min_dl": bmin,
                "boff_doc": boff_doc, "boff_tf": boff_tf, "boff_pos": boff_pos,
            }
            continue
        dp, tp, pp = [], [], []
        nf, nl, nn, nmx, nmn = [], [], [], [], []
        nbd, nbt, nbp = [], [], []
        cur_d = cur_t = cur_p = 0
        dropped_docs = 0
        dropped_cf = 0
        for b in range(nb):
            db = buf[doc_off + int(boff_doc[b]):doc_off + int(ends_d[b])]
            tb = buf[tf_off + int(boff_tf[b]):tf_off + int(ends_t[b])]
            pb = buf[pos_off + int(boff_pos[b]):pos_off + int(ends_p[b])]
            if hit[b]:
                docs = codec.delta_decode(codec.vb_decode(db))
                tfs = codec.vb_decode(tb).astype(np.int64)
                keep = np.searchsorted(deleted, docs, "left") \
                    == np.searchsorted(deleted, docs, "right")
                dropped_docs += int((~keep).sum())
                dropped_cf += int(tfs[~keep].sum())
                if not keep.any():
                    continue  # block disappears
                kd, kt = docs[keep], tfs[keep]
                db = codec.vb_encode(codec.delta_encode(kd))
                tb = codec.vb_encode(kt.astype(np.uint64))
                if len(pb):
                    # per-doc position segments restart absolutely: keep
                    # surviving docs' DELTA runs verbatim, no re-delta
                    deltas = codec.vb_decode(pb)
                    seg = np.repeat(keep, tfs)
                    pb = codec.vb_encode(deltas[seg])
                first_b, last_b = int(kd[0]), int(kd[-1])
                n_b = int(kd.size)
                mx_b = int(kt.max())
                mn_b = int(dl_map[kd].min())
            else:
                first_b, last_b = int(first[b]), int(last[b])
                n_b, mx_b, mn_b = int(bn[b]), int(bmax[b]), int(bmin[b])
            dp.append(db)
            tp.append(tb)
            pp.append(pb)
            nbd.append(cur_d)
            nbt.append(cur_t)
            nbp.append(cur_p)
            cur_d += len(db)
            cur_t += len(tb)
            cur_p += len(pb)
            nf.append(first_b)
            nl.append(last_b)
            nn.append(n_b)
            nmx.append(mx_b)
            nmn.append(mn_b)
        if not nf:
            continue  # term disappears
        # df/cf by exact decrement (unhit blocks never decode); max_tf is
        # the max over surviving per-block maxima
        df = int(v("df")) - dropped_docs
        cf = int(v("cf")) - dropped_cf
        max_tf = int(max(nmx))
        recs[v("term")] = {
            "df": df, "cf": cf, "max_tf": max_tf,
            "doc_parts": dp, "tf_parts": tp, "pos_parts": pp,
            "doc_len": cur_d, "tf_len": cur_t, "pos_len": cur_p,
            "block_first": np.asarray(nf, np.int64),
            "block_last": np.asarray(nl, np.int64),
            "block_n": np.asarray(nn, np.int32),
            "block_max_tf": np.asarray(nmx, np.int32),
            "block_min_dl": np.asarray(nmn, np.int32),
            "boff_doc": np.asarray(nbd, np.int64),
            "boff_tf": np.asarray(nbt, np.int64),
            "boff_pos": np.asarray(nbp, np.int64),
        }
    n = _write_shard_records(out_dir, sid0, recs)
    _maint_done(out_dir, sid0, fp, n)
    return n


def _delete_doc_part(part: str, out_path: str, deleted: np.ndarray,
                     stamp_tokens: bool) -> bool:
    """Filter one doc-side parquet part; hard-links when untouched.
    Returns True if any rows survived."""
    ids = pq.read_table(part, columns=["doc_id"])["doc_id"].to_numpy()
    if ids.size == 0:
        return False
    hit = np.searchsorted(deleted, ids, "left") \
        != np.searchsorted(deleted, ids, "right")
    if not hit.any():
        _link_or_copy(part, out_path)
        return True
    t = pq.read_table(part).filter(pa.array(~hit))
    if t.num_rows == 0:
        return False
    if stamp_tokens:
        tok = pc.sum(t["n_tokens"]).as_py() or 0
        t = t.replace_schema_metadata(
            {b"rayindex_total_tokens": str(tok).encode()})
    tmp = out_path + f".tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, out_path)
    return True


def tombstone_docs(index_dir: str, out_dir: str,
                   doc_ids: np.ndarray | list[int] | None = None,
                   filter_expr: "pads.Expression | None" = None
                   ) -> dict[str, Any]:
    """O(n_deleted) takedown: write ``out_dir`` = ``index_dir`` with the
    given docs TOMBSTONED — every index artifact is hard-linked verbatim
    and only ``stats/tombstones.bin`` (sorted int64 ids, unioned with any
    existing tombstones) is new.  Searchers mask tombstoned docs out of
    every posting at decode time, so they vanish from all results
    (ranked, boolean, phrase, facets) instantly; collection/term
    statistics stay at their pre-delete values (Lucene liveDocs
    semantics) until ``compact_index`` physically purges the docs and
    recomputes everything.

    Contrast with :func:`delete_docs` (eager): that path re-encodes every
    fine block containing a deleted doc and recomputes exact stats — the
    right call for small-or-clustered id sets, but a uniform-random 1%
    delete touches ~72% of 128-doc blocks, making "touched" ≈ "all".
    Tombstoning costs O(ids log ids) + one link pass regardless of
    scatter; run ``compact_index`` in a maintenance window to purge."""
    ids = np.asarray(doc_ids if doc_ids is not None else [], np.int64)
    if ids.size:
        from rayindex.merge import _doc_space

        space = _doc_space(index_dir)
        bad = ids[(ids < 1) | (ids > space)]
        if bad.size:
            # an out-of-space id here is always a caller bug (e.g. ids
            # from a MERGED/FEDERATED doc space applied to one sub-index)
            # and would silently mask the wrong doc after a later merge
            # rebases the tombstones
            raise ValueError(
                f"doc ids outside this index's doc space 1..{space}: "
                f"{bad[:5].tolist()}{'...' if bad.size > 5 else ''}")
    if filter_expr is not None:
        ids = np.concatenate([ids, select_doc_ids(index_dir, filter_expr)])
    prior = _read_tombstones(index_dir)
    deleted = np.unique(np.concatenate([ids, prior]))

    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "doc_store"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "stats", "doc_stats"), exist_ok=True)
    for pat in ("shards/*.dict.parquet", "shards/*.bin",
                "doc_store/*.parquet", "stats/doc_stats/*.parquet",
                "stats/doc_len.bin", "stats/lang_codes.bin",
                "stats/lang_vocab.json", "stats/collection_stats.parquet"):
        for p in sorted(glob.glob(os.path.join(index_dir, pat))):
            rel = os.path.relpath(p, index_dir)
            _link_or_copy(p, os.path.join(out_dir, rel))
    _write_tombstones(out_dir, deleted)
    return {"n_tombstoned": int(deleted.size),
            "n_new": int(deleted.size - prior.size)}


def _read_tombstones(index_dir: str) -> np.ndarray:
    p = os.path.join(index_dir, "stats", "tombstones.bin")
    return np.fromfile(p, np.int64) if os.path.exists(p) \
        else np.zeros(0, np.int64)


def _write_tombstones(index_dir: str, deleted: np.ndarray) -> None:
    p = os.path.join(index_dir, "stats", "tombstones.bin")
    tmp = p + f".tmp-{os.getpid()}"
    deleted.astype(np.int64).tofile(tmp)
    os.replace(tmp, p)


def delete_docs(index_dir: str, out_dir: str,
                doc_ids: np.ndarray | list[int] | None = None,
                filter_expr: "pads.Expression | None" = None
                ) -> dict[str, Any]:
    """Write ``out_dir`` = ``index_dir`` minus the given docs (by explicit
    ``doc_ids`` and/or a doc-store ``filter_expr``); the input is left
    untouched.  Ids keep their values — the doc space is unchanged and
    deleted ids become holes, so a later ``merge_indexes`` increment
    rebases exactly as before the delete.  Returns delete metrics."""
    import ray

    from rayindex.build import (_stage_finalize, _stage_stats,
                                _write_doc_meta_bins)

    ids = np.asarray(doc_ids if doc_ids is not None else [], np.int64)
    if filter_expr is not None:
        ids = np.concatenate([ids, select_doc_ids(index_dir, filter_expr)])
    # an eager delete over a tombstoned index also purges the tombstones
    # (they were already invisible to queries; this makes it physical)
    deleted = np.unique(np.concatenate([ids, _read_tombstones(index_dir)]))
    from rayindex.merge import _inputs_fingerprint

    fp = _inputs_fingerprint(
        "delete", [index_dir],
        hashlib.sha256(deleted.tobytes()).hexdigest())
    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
    out_store = os.path.join(out_dir, "doc_store")
    out_stats_dir = os.path.join(out_dir, "stats")
    out_doc_stats = os.path.join(out_stats_dir, "doc_stats")
    os.makedirs(out_store, exist_ok=True)
    os.makedirs(out_doc_stats, exist_ok=True)

    del_ref = ray.put(deleted)
    dl_path = os.path.join(index_dir, "stats", "doc_len.bin")
    shard_task = ray.remote(num_cpus=1)(_delete_shard)
    futs = [shard_task.remote(out_dir, p, del_ref, dl_path, fp)
            for p in _shard_paths(index_dir)]

    part_task = ray.remote(num_cpus=1)(_delete_doc_part)
    doc_futs = [
        part_task.remote(p, os.path.join(out_store, os.path.basename(p)),
                         del_ref, False)
        for p in sorted(glob.glob(os.path.join(index_dir, "doc_store",
                                               "*.parquet")))]
    stat_futs = [
        part_task.remote(p, os.path.join(out_doc_stats, os.path.basename(p)),
                         del_ref, True)
        for p in sorted(glob.glob(os.path.join(index_dir, "stats",
                                               "doc_stats", "*.parquet")))]
    n_terms = int(sum(ray.get(futs)))
    ray.get(doc_futs)
    ray.get(stat_futs)

    st = _stage_stats(out_stats_dir)
    bins = _write_doc_meta_bins(out_stats_dir)
    _stage_finalize(out_stats_dir, out_dir, st["n_docs"],
                    st["total_tokens"], n_terms, bins_meta=bins,
                    doc_space=_doc_space(index_dir))
    return {"n_docs": st["n_docs"], "n_terms": n_terms,
            "n_deleted": int(deleted.size)}


if __name__ == "__main__":  # pragma: no cover — `ray job submit` entry
    import sys

    from rayindex.cli import main_delete

    sys.exit(main_delete())
