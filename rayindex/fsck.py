"""Index integrity checker (fsck): verify every structural invariant of
a built index without trusting any single artifact — the ops tool that
decides whether a 100 TB index is servable after a partial write, a bad
node, or a maintenance op (merge/delete/compact) interrupted mid-run.

The reference has no checker (its hasher,
/root/reference/indexing/index_hasher/index_hasher.py, fingerprints
files for transport only); this validates SEMANTIC invariants:

shallow (metadata only, per shard, parallel Ray tasks):
  - dict stream offsets tile the blob exactly: per-term (doc,tf,pos)
    ranges are contiguous, non-overlapping, and sum to the blob size
  - per-term block metadata coheres: df == Σ block_n, block offsets
    ascend and stay inside their stream, block doc ranges ascend
    disjointly (K7 across blocks), terms sorted (binary-search order)
deep (adds a full decode, still per shard):
  - doc streams decode strictly ascending with exactly df entries
  - cf == Σ tf, max_tf == max(tf), per-block max_tf/first/last match
  - position streams decode with per-doc lengths == tfs
doc side (driver, footer/bin reads only):
  - doc_stats ids ascend uniquely across parts; collection_stats
    n_docs/total_tokens equal the part sums; doc_len.bin covers
    max_doc and agrees with doc_stats n_tokens; lang codes within vocab

Returns {"ok": bool, "errors": [...], "n_terms", "n_docs", ...}; errors
carry shard/term context.  One Ray task per shard — fsck of a 16k-shard
index is an embarrassingly parallel scan, no shuffle.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any

import numpy as np
import pyarrow.parquet as pq

from rayindex import codec
from rayindex.merge import _bin_of, _shard_paths


def _check_shard(dict_path: str, deep: bool) -> dict[str, Any]:
    errors: list[str] = []
    sid = os.path.basename(dict_path)
    t = pq.read_table(dict_path)
    blob_path = _bin_of(dict_path)
    blob_size = os.path.getsize(blob_path) if os.path.exists(blob_path) \
        else None
    if blob_size is None:
        return {"errors": [f"{sid}: blob missing"], "n_terms": 0}
    terms = t["term"].to_pylist()
    if terms != sorted(terms):
        errors.append(f"{sid}: terms not sorted")
    doc_off = t["doc_off"].to_numpy()
    doc_len = t["doc_len"].to_numpy()
    tf_off = t["tf_off"].to_numpy()
    tf_len = t["tf_len"].to_numpy()
    pos_off = t["pos_off"].to_numpy()
    pos_len = t["pos_len"].to_numpy()
    dfs = t["df"].to_numpy()
    # streams must tile the blob: doc|tf|pos per term, terms contiguous
    cur = 0
    for i in range(t.num_rows):
        if (doc_off[i] != cur or tf_off[i] != doc_off[i] + doc_len[i]
                or pos_off[i] != tf_off[i] + tf_len[i]):
            errors.append(f"{sid}: term {terms[i]!r} offsets don't tile")
            break
        cur = pos_off[i] + pos_len[i]
    else:
        if t.num_rows and cur != blob_size:
            errors.append(f"{sid}: streams sum to {cur}, blob is "
                          f"{blob_size} bytes")
        if t.num_rows == 0 and blob_size != 0:
            errors.append(f"{sid}: empty dict but {blob_size}-byte blob")
    buf = None
    if deep:
        with open(blob_path, "rb") as f:
            buf = memoryview(f.read())
    for i in range(t.num_rows):
        bn = np.asarray(t["block_n"][i].as_py(), np.int64)
        first = np.asarray(t["block_first"][i].as_py(), np.int64)
        last = np.asarray(t["block_last"][i].as_py(), np.int64)
        bmax = np.asarray(t["block_max_tf"][i].as_py(), np.int64)
        boff_d = np.asarray(t["block_doc_boff"][i].as_py(), np.int64)
        boff_t = np.asarray(t["block_tf_boff"][i].as_py(), np.int64)
        boff_p = np.asarray(t["block_pos_boff"][i].as_py(), np.int64)
        term = terms[i]
        if int(bn.sum()) != int(dfs[i]):
            errors.append(f"{sid}:{term!r}: df {dfs[i]} != sum(block_n) "
                          f"{int(bn.sum())}")
            continue
        if (first > last).any() or (first[1:] <= last[:-1]).any():
            errors.append(f"{sid}:{term!r}: block doc ranges not "
                          "ascending-disjoint")
        for boff, ln, name in ((boff_d, doc_len[i], "doc"),
                               (boff_t, tf_len[i], "tf"),
                               (boff_p, pos_len[i], "pos")):
            if boff.size and (boff[0] != 0 or (np.diff(boff) < 0).any()
                              or boff[-1] > ln):
                errors.append(f"{sid}:{term!r}: {name} block offsets "
                              "out of range")
        if not deep:
            continue
        try:
            d0, dl_ = int(doc_off[i]), int(doc_len[i])
            docs = codec.segmented_delta_decode(
                codec.vb_decode(buf[d0:d0 + dl_]), bn)
            tfs = codec.vb_decode(
                buf[int(tf_off[i]):int(tf_off[i] + tf_len[i])]
            ).astype(np.int64)
        except Exception as e:  # corrupt varint stream
            errors.append(f"{sid}:{term!r}: decode failed: {e}")
            continue
        if docs.size != dfs[i] or tfs.size != dfs[i]:
            errors.append(f"{sid}:{term!r}: decoded {docs.size} docs / "
                          f"{tfs.size} tfs, df {dfs[i]}")
            continue
        if docs.size > 1 and not (np.diff(docs) > 0).all():
            errors.append(f"{sid}:{term!r}: doc ids not strictly "
                          "ascending")
        if int(tfs.sum()) != int(t["cf"][i].as_py()):
            errors.append(f"{sid}:{term!r}: cf {t['cf'][i].as_py()} != "
                          f"sum(tf) {int(tfs.sum())}")
        if int(tfs.max(initial=0)) != int(t["max_tf"][i].as_py()):
            errors.append(f"{sid}:{term!r}: max_tf mismatch")
        starts = np.cumsum(bn) - bn
        if (docs[starts] != first).any() or \
                (docs[np.cumsum(bn) - 1] != last).any():
            errors.append(f"{sid}:{term!r}: block first/last don't match "
                          "decoded docs")
        if bmax.size and (np.maximum.reduceat(tfs, starts) != bmax).any():
            errors.append(f"{sid}:{term!r}: block max_tf don't match "
                          "decoded tfs")
        if pos_len[i]:
            try:
                pos = codec.decode_positions(
                    buf[int(pos_off[i]):int(pos_off[i] + pos_len[i])], tfs)
            except Exception as e:
                errors.append(f"{sid}:{term!r}: position decode failed: "
                              f"{e}")
                continue
            if pos.size != int(tfs.sum()):
                errors.append(f"{sid}:{term!r}: {pos.size} positions, "
                              f"cf {int(tfs.sum())}")
    return {"errors": errors, "n_terms": t.num_rows,
            "blob_bytes": blob_size}


def _check_doc_side(index_dir: str) -> dict[str, Any]:
    errors: list[str] = []
    stats_dir = os.path.join(index_dir, "stats")
    parts = sorted(glob.glob(os.path.join(stats_dir, "doc_stats",
                                          "*.parquet")))
    n_docs = 0
    total_tokens = 0
    max_doc = -1
    prev_last = 0
    def _open_bin(name: str, dtype) -> np.memmap | None:
        path = os.path.join(stats_dir, name)
        if not os.path.exists(path):
            return None
        if os.path.getsize(path) % np.dtype(dtype).itemsize:
            errors.append(f"{name} size not a multiple of "
                          f"{np.dtype(dtype).itemsize} bytes (truncated?)")
            # widest readable prefix so downstream checks still run
            n = os.path.getsize(path) // np.dtype(dtype).itemsize
            return np.memmap(path, dtype, mode="r", shape=(n,)) \
                if n else None
        return np.memmap(path, dtype, mode="r")

    dl = _open_bin("doc_len.bin", np.int64)
    if dl is None:
        errors.append("doc_len.bin missing")
    lc = _open_bin("lang_codes.bin", np.int32)
    try:
        with open(os.path.join(stats_dir, "lang_vocab.json")) as f:
            vocab_n = len(json.load(f))
    except OSError:
        vocab_n = None
        errors.append("lang_vocab.json missing")
    for p in parts:
        t = pq.read_table(p, columns=["doc_id", "n_tokens"])
        ids = t["doc_id"].to_numpy()
        if ids.size == 0:
            continue
        if (np.diff(ids) <= 0).any():
            errors.append(f"{os.path.basename(p)}: doc ids not strictly "
                          "ascending")
        if ids[0] <= prev_last:
            errors.append(f"{os.path.basename(p)}: overlaps previous part")
        prev_last = int(ids[-1])
        toks = t["n_tokens"].to_numpy()
        n_docs += ids.size
        total_tokens += int(toks.sum())
        max_doc = max(max_doc, int(ids[-1]))
        if dl is not None:
            if max_doc >= dl.size:
                errors.append("doc_len.bin shorter than max doc id")
            elif (dl[ids] != toks).any():
                errors.append(f"{os.path.basename(p)}: doc_len.bin "
                              "disagrees with doc_stats")
        if lc is not None and vocab_n is not None:
            if max_doc >= lc.size:
                errors.append("lang_codes.bin shorter than max doc id")
            else:
                codes = lc[ids]
                if (codes < 1).any() or (codes > vocab_n).any():
                    errors.append(f"{os.path.basename(p)}: lang code out "
                                  "of vocab range")
    cs_path = os.path.join(stats_dir, "collection_stats.parquet")
    try:
        cs = pq.read_table(cs_path).to_pylist()[0]
        if cs["n_docs"] != n_docs:
            errors.append(f"collection_stats n_docs {cs['n_docs']} != "
                          f"doc_stats sum {n_docs}")
        if cs["total_tokens"] != total_tokens:
            errors.append("collection_stats total_tokens != doc_stats sum")
    except (OSError, IndexError):
        cs = {}
        errors.append("collection_stats.parquet missing/empty")
    tomb_path = os.path.join(stats_dir, "tombstones.bin")
    if os.path.exists(tomb_path):
        if os.path.getsize(tomb_path) % 8:
            errors.append("tombstones.bin size not a multiple of 8 bytes")
        else:
            tombs = np.fromfile(tomb_path, np.int64)
            if tombs.size and (np.diff(tombs) <= 0).any():
                errors.append("tombstones.bin not strictly ascending")
            if tombs.size and (tombs[0] < 1 or
                               (max_doc >= 0 and tombs[-1] > max_doc)):
                errors.append("tombstone id outside the doc-id space")
    return {"errors": errors, "n_docs": n_docs,
            "total_tokens": total_tokens,
            "n_terms_expected": cs.get("n_terms")}


def fsck_index(index_dir: str, deep: bool = False) -> dict[str, Any]:
    """Check an index's structural invariants; ``deep`` adds a full
    posting decode.  Returns a report dict with ``ok`` and ``errors``."""
    import ray

    task = ray.remote(num_cpus=1)(_check_shard)
    shard_reports = ray.get([task.remote(p, deep)
                             for p in _shard_paths(index_dir)])
    doc_report = _check_doc_side(index_dir)
    errors = doc_report["errors"] + [e for r in shard_reports
                                     for e in r["errors"]]
    n_terms = sum(r["n_terms"] for r in shard_reports)
    if (doc_report["n_terms_expected"] is not None
            and n_terms != doc_report["n_terms_expected"]):
        errors.append(f"collection_stats n_terms "
                      f"{doc_report['n_terms_expected']} != dict sum "
                      f"{n_terms}")
    return {
        "ok": not errors,
        "errors": errors,
        "deep": deep,
        "n_shards": len(shard_reports),
        "n_terms": n_terms,
        "n_docs": doc_report["n_docs"],
        "total_tokens": doc_report["total_tokens"],
        "blob_bytes": sum(r.get("blob_bytes", 0) for r in shard_reports),
    }


if __name__ == "__main__":  # pragma: no cover — `ray job submit` entry
    import sys

    from rayindex.cli import main_fsck

    sys.exit(main_fsck())
