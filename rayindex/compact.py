"""Compact an index: renumber surviving doc ids densely (1..n_docs,
closing the holes left by deletes / oversize filtering) and rewrite the
postings through the build's OWN canonical fine-block + splice machinery
— so ``compact(delete(build(C), ids))`` is BYTE-IDENTICAL to
``build(C minus ids)`` (gated in tests/test_compact.py), and a compact
with a different ``num_shards`` is a free re-shard/re-balance without
re-tokenizing anything.

This closes the index-lifecycle triangle with merge (fold an increment
in, rayindex/merge.py) and delete (take documents out,
rayindex/delete.py).  The reference rebuilds from scratch for all three
(/root/reference/indexing/ — immutable JSON-lines artifacts).

Scale shape: the hole list (id gaps, O(deleted) after deletes) is the
ONLY broadcast state — the old→new remap is order-preserving, so
``new = old − #(holes ≤ old)`` needs just a sorted hole array and one
searchsorted, never an O(n_docs) map.  One Ray task per input shard
decodes, remaps and re-cuts its terms into fine-block POSTING_CHUNKS
spool rows (the tokenize stage's exchange format, build.py:863-895);
the build's `_stage_shards` merge pool then writes output shards exactly
as a fresh build would.  Doc-store parts regroup by the canonical
``new_id // part_docs`` rule with one task per OUTPUT part reading only
the 1–2 input parts that overlap it.  Nothing is driver-side but hole
and part metadata.
"""
from __future__ import annotations

import glob
import hashlib
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rayindex import codec, schema
from rayindex.merge import _bin_of, _shard_paths

_DS_NAME = "ds-{first:012d}-{last:012d}.parquet"


def _new_ids(old: np.ndarray, holes: np.ndarray) -> np.ndarray:
    """Order-preserving dense renumber: new = old − #(holes ≤ old)."""
    return old - np.searchsorted(holes, old, side="right")


def _part_holes(part: str) -> tuple[int, int, np.ndarray]:
    """(first, last, internal hole ids) of one doc-ordered stats part."""
    ids = pq.read_table(part, columns=["doc_id"])["doc_id"].to_numpy()
    internal = np.setdiff1d(np.arange(ids[0], ids[-1] + 1), ids,
                            assume_unique=True)
    return int(ids[0]), int(ids[-1]), internal


def _drop_mask(ids: np.ndarray, drop: np.ndarray) -> np.ndarray | None:
    """Mask of ids NOT in sorted ``drop``; None when nothing drops."""
    if drop.size == 0 or ids.size == 0:
        return None
    idx = np.searchsorted(drop, ids)
    hit = idx < drop.size
    hit[hit] = drop[idx[hit]] == ids[hit]
    return ~hit if hit.any() else None


def _compact_shard_to_spool(dict_path: str, spool_dir: str,
                            holes: np.ndarray, dl_path: str,
                            fine_block_docs: int, doc_range_size: int,
                            num_shards: int,
                            drop: np.ndarray | None = None) -> int:
    """Decode one input shard, remap doc ids, re-cut into fine-block
    POSTING_CHUNKS rows, spool (one IPC file per input shard).  Docs in
    ``drop`` (sorted tombstone ids) are physically removed.  Returns
    the term count processed."""
    from rayindex.build import _spool_chunks, term_shard

    t = pq.read_table(dict_path)
    with open(_bin_of(dict_path), "rb") as f:
        buf = memoryview(f.read())
    dl_map = np.memmap(dl_path, np.int64, mode="r")
    R = fine_block_docs
    c = t.column
    cols: dict[str, list] = {k: [] for k in (
        "term", "range_id", "shard", "block_id", "first_doc", "last_doc",
        "n_docs", "cf", "max_tf", "min_dl", "doc_blob", "tf_blob",
        "pos_blob")}
    for row in range(t.num_rows):
        term = c("term")[row].as_py()
        doc_off, doc_len = c("doc_off")[row].as_py(), c("doc_len")[row].as_py()
        tf_off, tf_len = c("tf_off")[row].as_py(), c("tf_len")[row].as_py()
        pos_off, pos_len = c("pos_off")[row].as_py(), c("pos_len")[row].as_py()
        bn = np.asarray(c("block_n")[row].as_py(), np.int64)
        docs = codec.segmented_delta_decode(
            codec.vb_decode(buf[doc_off:doc_off + doc_len]), bn)
        tfs = codec.vb_decode(buf[tf_off:tf_off + tf_len]).astype(np.int64)
        pos_pref = None
        live = _drop_mask(docs, drop) if drop is not None else None
        if live is not None:
            if pos_len:
                # positions decode needs the UNFILTERED tfs; gather the
                # surviving docs' runs before filtering tfs
                pos_full = codec.decode_positions(
                    buf[pos_off:pos_off + pos_len], tfs)
                starts = np.cumsum(tfs) - tfs
                sel = np.flatnonzero(live)
                lens = tfs[sel]
                base = np.cumsum(lens) - lens
                take = np.arange(int(lens.sum()), dtype=np.int64)
                take += np.repeat(starts[sel] - base, lens)
                pos_pref = pos_full[take]
            docs, tfs = docs[live], tfs[live]
            if docs.size == 0:
                continue
        new = _new_ids(docs, holes)
        blk = new // R
        seg_starts = np.flatnonzero(
            np.concatenate([[True], blk[1:] != blk[:-1]]))
        seg_ends = np.append(seg_starts[1:], new.size)
        nseg = seg_starts.size
        first = new[seg_starts]
        cols["term"].extend([term] * nseg)
        cols["range_id"].extend((first // doc_range_size).tolist())
        cols["shard"].extend([term_shard(term, num_shards)] * nseg)
        cols["block_id"].extend(blk[seg_starts].tolist())
        cols["first_doc"].extend(first.tolist())
        cols["last_doc"].extend(new[seg_ends - 1].tolist())
        cols["n_docs"].extend((seg_ends - seg_starts).tolist())
        cols["cf"].extend(np.add.reduceat(tfs, seg_starts).tolist())
        cols["max_tf"].extend(np.maximum.reduceat(tfs, seg_starts).tolist())
        # doc lengths are keyed by OLD ids in the input index's bin
        cols["min_dl"].extend(
            np.minimum.reduceat(dl_map[docs], seg_starts).tolist())
        cols["doc_blob"].extend(codec.vb_encode_split(
            codec.segmented_delta_encode(new, seg_starts), seg_starts))
        cols["tf_blob"].extend(codec.vb_encode_split(
            tfs.astype(np.uint64), seg_starts))
        if pos_len:
            pos_vals = pos_pref if pos_pref is not None \
                else codec.decode_positions(
                    buf[pos_off:pos_off + pos_len], tfs)
            per_doc = np.cumsum(tfs) - tfs
            deltas = codec.segmented_delta_encode(pos_vals, per_doc)
            cols["pos_blob"].extend(codec.vb_encode_split(
                deltas, per_doc[seg_starts]))
        else:
            cols["pos_blob"].extend([b""] * nseg)
    chunks = pa.table({
        "term": pa.array(cols["term"], pa.string()),
        "range_id": pa.array(cols["range_id"], pa.int64()),
        "shard": pa.array(cols["shard"], pa.int32()),
        "block_id": pa.array(cols["block_id"], pa.int64()),
        "first_doc": pa.array(cols["first_doc"], pa.int64()),
        "last_doc": pa.array(cols["last_doc"], pa.int64()),
        "n_docs": pa.array(cols["n_docs"], pa.int64()),
        "cf": pa.array(cols["cf"], pa.int64()),
        "max_tf": pa.array(cols["max_tf"], pa.int32()),
        "min_dl": pa.array(cols["min_dl"], pa.int32()),
        "doc_blob": pa.array(cols["doc_blob"], pa.large_binary()),
        "tf_blob": pa.array(cols["tf_blob"], pa.large_binary()),
        "pos_blob": pa.array(cols["pos_blob"], pa.large_binary()),
    }, schema=schema.POSTING_CHUNKS)
    if chunks.num_rows:
        sid = os.path.basename(dict_path)[len("shard_"):len("shard_") + 5]
        _spool_chunks(chunks, spool_dir, sid.zfill(12))
    return t.num_rows


def _part_bounds(path: str) -> tuple[int, int]:
    """(min, max) doc_id of one part from parquet footer statistics alone
    (no data read); falls back to reading the column when stats are
    absent."""
    md = pq.read_metadata(path)
    try:
        idx = md.schema.to_arrow_schema().get_field_index("doc_id")
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        return int(lo), int(hi)
    except (AttributeError, TypeError):
        ids = pq.read_table(path, columns=["doc_id"])["doc_id"].to_numpy()
        return int(ids.min()), int(ids.max())


def _compact_doc_part(inputs: list[str], out_path: str, holes: np.ndarray,
                      p_out: int, part_docs: int,
                      drop: np.ndarray | None = None) -> None:
    """Assemble one canonical OUTPUT doc-store part (new_id // part_docs
    == p_out) from the input parts overlapping its range; rows in
    ``drop`` are purged."""
    ts = []
    for f in inputs:
        t = pq.read_table(f)
        ids = t["doc_id"].to_numpy()
        live = _drop_mask(ids, drop) if drop is not None else None
        if live is not None:
            t = t.filter(pa.array(live))
            ids = ids[live]
        if ids.size == 0:
            continue
        new = _new_ids(ids, holes)
        sel = (new // part_docs) == p_out
        if sel.any():
            t = t.set_column(t.column_names.index("doc_id"), "doc_id",
                             pa.array(new, pa.int64())).filter(pa.array(sel))
            ts.append(t)
    if not ts:
        return
    out = pa.concat_tables(ts)  # inputs are doc-ordered → already sorted
    tmp = out_path + f".tmp-{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, out_path)


def _compact_stats_part(part: str, out_dir: str, holes: np.ndarray,
                        drop: np.ndarray | None = None) -> None:
    import pyarrow.compute as pc

    t = pq.read_table(part)
    old = t["doc_id"].to_numpy()
    live = _drop_mask(old, drop) if drop is not None else None
    if live is not None:
        t = t.filter(pa.array(live))
        old = old[live]
    if old.size == 0:
        return
    ids = _new_ids(old, holes)
    t = t.set_column(t.column_names.index("doc_id"), "doc_id",
                     pa.array(ids, pa.int64()))
    tok = pc.sum(t["n_tokens"]).as_py() or 0
    t = t.replace_schema_metadata(
        {b"rayindex_total_tokens": str(tok).encode()})
    dst = os.path.join(out_dir, _DS_NAME.format(first=int(ids[0]),
                                                last=int(ids[-1])))
    tmp = dst + f".tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, dst)


def compact_index(index_dir: str, out_dir: str, cfg=None) -> dict[str, Any]:
    """Write ``out_dir`` = ``index_dir`` with doc ids renumbered densely
    and shards rewritten canonically (the input is untouched).  ``cfg``
    is a BuildConfig; codec-shape fields (fine_block_docs, block_size,
    doc_range_size) must match the original build's for byte-identity
    with a fresh build, and ``num_shards`` may differ — compaction
    doubles as a re-shard."""
    import ray

    from rayindex.build import (_DOC_STORE_PART_DOCS, _resolve_auto_shards,
                                _stage_finalize, _stage_shards, _stage_stats,
                                _write_doc_meta_bins)
    from rayindex.checkpoint import fingerprint_of
    from rayindex.config import BuildConfig

    cfg = cfg or BuildConfig()

    # --- holes: the only broadcast state ---
    stats_parts = sorted(glob.glob(os.path.join(
        index_dir, "stats", "doc_stats", "*.parquet")))
    hole_task = ray.remote(num_cpus=1)(_part_holes)
    spans = ray.get([hole_task.remote(p) for p in stats_parts])
    spans.sort()
    pieces: list[np.ndarray] = []
    expected = 1  # doc ids are 1-based
    n_docs = 0
    for first, last, internal in spans:
        if first > expected:
            pieces.append(np.arange(expected, first, dtype=np.int64))
        pieces.append(internal.astype(np.int64))
        n_docs += (last - first + 1) - internal.size
        expected = last + 1
    holes = np.concatenate(pieces) if pieces else np.zeros(0, np.int64)

    # tombstoned docs (rayindex.delete.tombstone_docs) are still physically
    # present in postings and doc parts — compact is their purge point:
    # they become holes AND their rows/postings are dropped, so
    # compact(tombstone(build(C), ids)) == build(C minus ids)
    from rayindex.delete import _read_tombstones

    drop = _read_tombstones(index_dir)
    if drop.size:
        max_doc = spans[-1][1] if spans else 0
        in_range = drop[(drop >= 1) & (drop <= max_doc)]
        was_hole = (np.searchsorted(holes, in_range, "left")
                    != np.searchsorted(holes, in_range, "right"))
        n_docs -= int((~was_hole).sum())
        holes = np.unique(np.concatenate([holes, drop]))
    if cfg.num_shards == 0:
        cfg = _resolve_auto_shards(cfg, n_docs)

    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
    out_store = os.path.join(out_dir, "doc_store")
    out_stats_dir = os.path.join(out_dir, "stats")
    out_doc_stats = os.path.join(out_stats_dir, "doc_stats")
    spool_dir = os.path.join(out_dir, "chunks")
    for d in (out_store, out_doc_stats, spool_dir):
        os.makedirs(d, exist_ok=True)

    holes_ref = ray.put(holes)
    drop_ref = ray.put(drop)
    dl_path = os.path.join(index_dir, "stats", "doc_len.bin")

    # --- postings: decode+remap per input shard into canonical spools ---
    shard_task = ray.remote(num_cpus=1)(_compact_shard_to_spool)
    spool_futs = [
        shard_task.remote(p, spool_dir, holes_ref, dl_path,
                          cfg.fine_block_docs, cfg.doc_range_size,
                          cfg.num_shards, drop_ref)
        for p in _shard_paths(index_dir)]

    # --- doc store: one task per canonical OUTPUT part ---
    D = _DOC_STORE_PART_DOCS
    in_parts = sorted(glob.glob(os.path.join(index_dir, "doc_store",
                                             "*.parquet")))
    bounds = []
    for f in in_parts:
        lo_old, hi_old = _part_bounds(f)
        span = _new_ids(np.asarray([lo_old, hi_old], np.int64), holes)
        bounds.append((f, int(span[0]), int(span[1])))
    part_task = ray.remote(num_cpus=1)(_compact_doc_part)
    doc_futs = []
    for p_out in range(n_docs // D + 1):
        lo, hi = p_out * D, (p_out + 1) * D - 1
        inputs = [f for f, flo, fhi in bounds if flo <= hi and fhi >= lo]
        if inputs:
            doc_futs.append(part_task.remote(
                inputs, os.path.join(out_store, f"part-{p_out:06d}.parquet"),
                holes_ref, p_out, D, drop_ref))

    stats_task = ray.remote(num_cpus=1)(_compact_stats_part)
    stat_futs = [stats_task.remote(p, out_doc_stats, holes_ref, drop_ref)
                 for p in stats_parts]

    ray.get(spool_futs)
    fp = fingerprint_of("compact", cfg.fingerprint(),
                        hashlib.sha256(holes.tobytes()).hexdigest())
    m = _stage_shards(spool_dir, os.path.join(out_dir, "shards"), cfg, fp)
    ray.get(doc_futs)
    ray.get(stat_futs)

    st = _stage_stats(out_stats_dir)
    bins = _write_doc_meta_bins(out_stats_dir)
    _stage_finalize(out_stats_dir, out_dir, st["n_docs"],
                    st["total_tokens"], m.get("n_terms", 0),
                    bins_meta=bins, doc_space=n_docs)
    return {"n_docs": st["n_docs"], "n_terms": m.get("n_terms", 0),
            "n_holes_closed": int(holes.size),
            "num_shards": cfg.num_shards}


if __name__ == "__main__":  # pragma: no cover — `ray job submit` entry
    import sys

    from rayindex.cli import main_compact

    sys.exit(main_compact())
