"""Convert a positional index to a TF-only index WITHOUT rebuilding —
reference parity for its index converter
(/root/reference/indexing/index_converter/index_converter.py:7-41, which
re-reads the JSON-lines positional index, replaces each doc's position
list with its length, and writes the term→byte-offset map).  Here the tf
stream already exists as its own byte range per term, so the conversion
is a pure SPLICE: doc and tf streams hard-copy verbatim, the position
stream is dropped, and the dict (which IS the byte-offset map, S9)
rewrites with zeroed position offsets.  No posting is ever decoded.

The result is byte-identical to a fresh ``keep_positions=False`` build
of the same corpus (gated in tests/test_convert.py): phrase/proximity
queries stop being answerable, every scorer keeps working, and the index
shrinks by the position stream (~40–60% of blob bytes on text corpora).

Scale shape: one Ray task per shard (dict rewrite + two-range blob
splice), doc store / stats / bins hard-linked verbatim.
"""
from __future__ import annotations

import glob
import os
from typing import Any

import numpy as np
import pyarrow.parquet as pq

from rayindex.merge import (_bin_of, _doc_space, _link_or_copy, _shard_paths,
                            _write_shard_records)


def _strip_shard(out_dir: str, dict_path: str) -> int:
    t = pq.read_table(dict_path)
    with open(_bin_of(dict_path), "rb") as f:
        buf = memoryview(f.read())
    c = t.column
    recs: dict[str, dict[str, Any]] = {}
    for row in range(t.num_rows):
        def v(name):
            return c(name)[row].as_py()

        def arr(name, dtype):
            return np.asarray(c(name)[row].as_py(), dtype)

        doc_off, doc_len = v("doc_off"), v("doc_len")
        tf_off, tf_len = v("tf_off"), v("tf_len")
        nb = len(c("block_n")[row])
        recs[v("term")] = {
            "df": v("df"), "cf": v("cf"), "max_tf": v("max_tf"),
            "doc_parts": [buf[doc_off:doc_off + doc_len]],
            "tf_parts": [buf[tf_off:tf_off + tf_len]],
            "pos_parts": [],
            "doc_len": doc_len, "tf_len": tf_len, "pos_len": 0,
            "block_first": arr("block_first", np.int64),
            "block_last": arr("block_last", np.int64),
            "block_n": arr("block_n", np.int32),
            "block_max_tf": arr("block_max_tf", np.int32),
            "block_min_dl": arr("block_min_dl", np.int32),
            "boff_doc": arr("block_doc_boff", np.int64),
            "boff_tf": arr("block_tf_boff", np.int64),
            "boff_pos": np.zeros(nb, np.int64),
        }
    sid = int(os.path.basename(dict_path)[len("shard_"):len("shard_") + 5])
    return _write_shard_records(out_dir, sid, recs)


def strip_positions(index_dir: str, out_dir: str) -> dict[str, Any]:
    """Write ``out_dir`` = ``index_dir`` without position streams (the
    input is untouched).  Returns conversion metrics including the byte
    savings."""
    import ray

    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
    task = ray.remote(num_cpus=1)(_strip_shard)
    n_terms = int(sum(ray.get([task.remote(out_dir, p)
                               for p in _shard_paths(index_dir)])))
    # doc store / stats / bins are position-free: link verbatim
    for sub in ("doc_store", os.path.join("stats", "doc_stats")):
        dst = os.path.join(out_dir, sub)
        os.makedirs(dst, exist_ok=True)
        for p in sorted(glob.glob(os.path.join(index_dir, sub, "*.parquet"))):
            _link_or_copy(p, os.path.join(dst, os.path.basename(p)))
    for rel in ("doc_len.bin", "lang_codes.bin", "lang_vocab.json",
                "collection_stats.parquet"):
        src = os.path.join(index_dir, "stats", rel)
        if os.path.exists(src):
            _link_or_copy(src, os.path.join(out_dir, "stats", rel))

    def _tree_bytes(d: str) -> int:
        return sum(os.path.getsize(p) for p in glob.glob(
            os.path.join(d, "shards", "shard_*.bin")))

    before, after = _tree_bytes(index_dir), _tree_bytes(out_dir)
    return {"n_terms": n_terms, "doc_space": _doc_space(out_dir),
            "blob_bytes_before": before, "blob_bytes_after": after,
            "bytes_saved": before - after}


if __name__ == "__main__":  # pragma: no cover — `ray job submit` entry
    import sys

    from rayindex.cli import main_convert

    sys.exit(main_convert())
