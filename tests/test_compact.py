"""Compaction: compact(delete(build(C), ids)) must be BYTE-IDENTICAL to
build(C minus those docs) — shard blobs and dicts, doc-meta bins,
collection stats — because both run the same canonical fine-block +
splice machinery over the same dense doc-id assignment.  Compaction with
a different num_shards is a re-shard whose postings stay rank-identical."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def compact_setup(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.compact import compact_index
    from rayindex.config import BuildConfig
    from rayindex.delete import delete_docs

    base = tmp_path_factory.mktemp("compact")
    tbl = corpus.make_rows(corpus.file_plan(60, 5))
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=16,
                      fine_block_docs=8, block_size=16)

    def bld(name: str, t: pa.Table) -> str:
        src = base / f"src_{name}"
        src.mkdir()
        pq.write_table(t, str(src / "docs.parquet"))
        out = base / name
        build_index(str(src), str(out), cfg)
        return str(out)

    full = bld("full", tbl)
    store = pq.read_table(os.path.join(full, "doc_store"),
                          columns=["doc_id", "repo", "path"])
    ids = store["doc_id"].to_numpy()
    deleted = np.unique(np.concatenate([ids[::4], [ids.max()]]))
    deleted_dir = str(base / "deleted")
    delete_docs(full, deleted_dir, doc_ids=deleted)
    compacted = str(base / "compacted")
    metrics = compact_index(deleted_dir, compacted, cfg)

    del_set = set(deleted.tolist())
    del_keys = {(r, p) for r, p, d in zip(store["repo"].to_pylist(),
                                          store["path"].to_pylist(), ids)
                if d in del_set}
    keep = pa.array([(r, p) not in del_keys
                     for r, p in zip(tbl["repo"].to_pylist(),
                                     tbl["path"].to_pylist())])
    fresh = bld("fresh", tbl.filter(keep))
    return {"full": full, "deleted_dir": deleted_dir, "cfg": cfg,
            "compacted": compacted, "fresh": fresh, "metrics": metrics}


def test_compact_shards_byte_identical(compact_setup):
    # manifests embed the build fingerprint (different by construction);
    # the artifacts that must match are the blobs and dicts
    for pat in ("shard_*.bin", "shard_*.dict.parquet"):
        got = sorted(glob.glob(os.path.join(compact_setup["compacted"],
                                            "shards", pat)))
        want = sorted(glob.glob(os.path.join(compact_setup["fresh"],
                                             "shards", pat)))
        assert got and [os.path.basename(p) for p in got] == \
            [os.path.basename(p) for p in want]
        for g, w in zip(got, want):
            assert open(g, "rb").read() == open(w, "rb").read(), g


def test_compact_stats_byte_identical(compact_setup):
    for rel in ("stats/doc_len.bin", "stats/lang_codes.bin",
                "stats/lang_vocab.json"):
        bg = open(os.path.join(compact_setup["compacted"], rel), "rb").read()
        bw = open(os.path.join(compact_setup["fresh"], rel), "rb").read()
        assert bg == bw, rel
    cg = pq.read_table(os.path.join(compact_setup["compacted"], "stats",
                                    "collection_stats.parquet"))
    cw = pq.read_table(os.path.join(compact_setup["fresh"], "stats",
                                    "collection_stats.parquet"))
    assert cg.to_pylist() == cw.to_pylist()
    assert cg.schema.metadata[b"rayindex_doc_space"] == \
        cw.schema.metadata[b"rayindex_doc_space"]
    assert compact_setup["metrics"]["n_docs"] == cw["n_docs"][0].as_py()


def test_compact_doc_store_identical(compact_setup):
    # part naming differs (fresh fused builds name by ingest unit), so
    # compare the assembled table
    tg = pq.read_table(os.path.join(compact_setup["compacted"],
                                    "doc_store")).sort_by("doc_id")
    tw = pq.read_table(os.path.join(compact_setup["fresh"],
                                    "doc_store")).sort_by("doc_id")
    assert tg.equals(tw.select(tg.column_names))


def test_compact_reshard_rank_identical(compact_setup, tmp_path):
    """num_shards=7 compact: different sharding, identical search results."""
    from rayindex.compact import compact_index
    from rayindex.config import AnalyzerConfig, BuildConfig, SearchConfig
    from rayindex.searcher import IndexReader

    cfg = compact_setup["cfg"]
    re7 = str(tmp_path / "re7")
    m = compact_index(compact_setup["deleted_dir"], re7,
                      BuildConfig(num_shards=7,
                                  fine_block_docs=cfg.fine_block_docs,
                                  block_size=cfg.block_size))
    assert m["num_shards"] == 7
    assert len(glob.glob(os.path.join(re7, "shards", "*.dict.parquet"))) > 4
    ra = IndexReader(re7)
    rb = IndexReader(compact_setup["fresh"])
    analyzer = AnalyzerConfig()
    for algorithm in ("taat", "bmw"):
        scfg = SearchConfig(scorer="bm25", algorithm=algorithm)
        for q in ("data", "import data", '"def main"', "return AND value"):
            got = ra.search(q, k=10, search_cfg=scfg, analyzer=analyzer)
            want = rb.search(q, k=10, search_cfg=scfg, analyzer=analyzer)
            assert [(d, round(s, 9)) for d, s in got] == \
                   [(d, round(s, 9)) for d, s in want], (algorithm, q)


def test_compact_noop_on_dense_index(compact_setup, tmp_path):
    """Compacting an index with no holes is a pure canonical rewrite:
    byte-identical shards, zero holes closed."""
    from rayindex.compact import compact_index

    out = str(tmp_path / "noop")
    m = compact_index(compact_setup["fresh"], out, compact_setup["cfg"])
    assert m["n_holes_closed"] == 0
    for pat in ("shard_*.bin", "shard_*.dict.parquet"):
        for f1 in sorted(glob.glob(os.path.join(compact_setup["fresh"],
                                                "shards", pat))):
            f2 = os.path.join(out, "shards", os.path.basename(f1))
            assert open(f1, "rb").read() == open(f2, "rb").read(), f1
