"""Two-index merge (incremental ingest): merge(build(A), build(B)) must
be indistinguishable from build(A ++ B) — postings, stats, bins, doc
store and BM25 results.  Reference parity for the standalone merge tool
(/root/reference/indexing/index_merging/index_merging.py)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def merge_setup(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.merge import merge_indexes

    base = tmp_path_factory.mktemp("merge")
    tbl = corpus.make_rows(corpus.file_plan(60, 5))
    # ids are assigned by the key-only sort over (repo, path, sha); pre-sort
    # and slice on that order so A's doc ids all precede B's in the
    # combined build (the merge contract: B is a LATER increment)
    import pyarrow.compute as pc

    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("repo", "ascending"), ("path", "ascending")]))
    ta, tb = tbl.slice(0, 36), tbl.slice(36)

    def bld(name: str, t: pa.Table) -> str:
        src = base / f"src_{name}"
        src.mkdir()
        pq.write_table(t, str(src / "docs.parquet"))
        out = base / name
        cfg = BuildConfig(num_shards=4, tokenize_batch_size=16)
        build_index(str(src), str(out), cfg)
        return str(out)

    a, b, c = bld("a", ta), bld("b", tb), bld("c", tbl)
    m = str(base / "m")
    metrics = merge_indexes(a, b, m)
    return {"a": a, "b": b, "c": c, "m": m, "metrics": metrics}


def _vocab(index_dir: str) -> list[str]:
    terms: list[str] = []
    for p in sorted(glob.glob(os.path.join(index_dir, "shards",
                                           "*.dict.parquet"))):
        terms += pq.read_table(p, columns=["term"])["term"].to_pylist()
    return sorted(terms)


def test_merged_collection_stats(merge_setup):
    m = pq.read_table(os.path.join(merge_setup["m"], "stats",
                                   "collection_stats.parquet")).to_pylist()[0]
    c = pq.read_table(os.path.join(merge_setup["c"], "stats",
                                   "collection_stats.parquet")).to_pylist()[0]
    assert m == c
    assert merge_setup["metrics"]["n_docs"] == c["n_docs"]


def test_merged_vocab_and_term_stats(merge_setup):
    def stats(d):
        out = {}
        for p in sorted(glob.glob(os.path.join(d, "shards",
                                               "*.dict.parquet"))):
            t = pq.read_table(p, columns=["term", "df", "cf", "max_tf"])
            for r in t.to_pylist():
                out[r["term"]] = (r["df"], r["cf"], r["max_tf"])
        return out

    assert stats(merge_setup["m"]) == stats(merge_setup["c"])


def test_merged_postings_decode_identical(merge_setup):
    """EVERY term's (docs, tfs, positions) decodes identically from the
    merged index and the direct combined build."""
    from rayindex.searcher import IndexReader

    rm = IndexReader(merge_setup["m"])
    rc = IndexReader(merge_setup["c"])
    vocab = _vocab(merge_setup["c"])
    assert vocab == _vocab(merge_setup["m"])
    for term in vocab:
        pm = rm.lookup(term, need_positions=True)
        c = rc.lookup(term, need_positions=True)
        assert pm is not None and c is not None, term
        assert pm.docs.tolist() == c.docs.tolist(), term
        assert pm.tfs.tolist() == c.tfs.tolist(), term
        assert pm.positions.tolist() == c.positions.tolist(), term


def test_merged_doc_side_identical(merge_setup):
    for rel in ("stats/doc_len.bin", "stats/lang_codes.bin",
                "stats/lang_vocab.json"):
        bm = open(os.path.join(merge_setup["m"], rel), "rb").read()
        bc = open(os.path.join(merge_setup["c"], rel), "rb").read()
        assert bm == bc, rel
    sm = pq.read_table(os.path.join(merge_setup["m"], "doc_store")) \
        .sort_by("doc_id")
    sc = pq.read_table(os.path.join(merge_setup["c"], "doc_store")) \
        .sort_by("doc_id")
    assert sm.equals(sc.select(sm.column_names))


def test_merged_search_rank_identical(merge_setup):
    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.searcher import IndexReader

    analyzer = AnalyzerConfig()
    rm = IndexReader(merge_setup["m"])
    rc = IndexReader(merge_setup["c"])
    for algorithm in ("taat", "bmw"):
        cfg = SearchConfig(scorer="bm25", algorithm=algorithm)
        for q in ("data", "import data", '"def main"', "return AND value",
                  "zzznope"):
            got = rm.search(q, k=10, search_cfg=cfg, analyzer=analyzer)
            want = rc.search(q, k=10, search_cfg=cfg, analyzer=analyzer)
            assert [(d, round(s, 9)) for d, s in got] == \
                   [(d, round(s, 9)) for d, s in want], (algorithm, q)


def test_merge_with_tail_holes(ray_session, tmp_path):
    """Oversize-filtered rows leave doc-id holes; when A's LAST sorted row
    is filtered, doc_len.bin under-measures A's doc space and only the
    collection-stats footer gives the correct rebase offset."""
    import pyarrow.compute as pc

    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import AnalyzerConfig, BuildConfig, SearchConfig
    from rayindex.merge import merge_indexes
    from rayindex.searcher import IndexReader

    tbl = corpus.make_rows(corpus.file_plan(40, 4))
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("repo", "ascending"), ("path", "ascending")]))
    # blow up the last A row and one mid-B row past the filter threshold
    thr = int(pc.max(pc.binary_length(
        pc.cast(tbl["content"], pa.large_binary()))).as_py()) + 1
    content = tbl["content"].to_pylist()
    for i in (23, 30):
        content[i] = content[i] + "x" * (2 * thr)
    tbl = tbl.set_column(tbl.column_names.index("content"), "content",
                         pa.array(content, tbl["content"].type))
    ta, tb = tbl.slice(0, 24), tbl.slice(24)

    def bld(name, t):
        src = tmp_path / f"src_{name}"
        src.mkdir()
        pq.write_table(t, str(src / "docs.parquet"))
        out = tmp_path / name
        cfg = BuildConfig(num_shards=2, tokenize_batch_size=8,
                          max_content_bytes=thr)
        build_index(str(src), str(out), cfg)
        return str(out)

    a, b, c = bld("a", ta), bld("b", tb), bld("c", tbl)
    # A's doc_len.bin is short: max kept doc is 23, doc space is 24
    assert os.path.getsize(os.path.join(a, "stats", "doc_len.bin")) // 8 == 24
    m = str(tmp_path / "m")
    metrics = merge_indexes(a, b, m)
    assert metrics["doc_offset"] == 24
    cm = pq.read_table(os.path.join(m, "stats", "collection_stats.parquet"))
    cc = pq.read_table(os.path.join(c, "stats", "collection_stats.parquet"))
    assert cm.to_pylist() == cc.to_pylist()
    assert cm.schema.metadata[b"rayindex_doc_space"] == \
        cc.schema.metadata[b"rayindex_doc_space"]
    rm, rc = IndexReader(m), IndexReader(c)
    cfg = SearchConfig(scorer="bm25")
    analyzer = AnalyzerConfig()
    for q in ("data", "return value", '"def main"'):
        got = rm.search(q, k=10, search_cfg=cfg, analyzer=analyzer)
        want = rc.search(q, k=10, search_cfg=cfg, analyzer=analyzer)
        assert [(d, round(s, 9)) for d, s in got] == \
               [(d, round(s, 9)) for d, s in want], q


def test_merge_deterministic(merge_setup, tmp_path):
    """A second merge produces byte-identical shard artifacts."""
    from rayindex.merge import merge_indexes

    m2 = str(tmp_path / "m2")
    merge_indexes(merge_setup["a"], merge_setup["b"], m2)
    for f1 in sorted(glob.glob(os.path.join(merge_setup["m"], "shards", "*"))):
        f2 = os.path.join(m2, "shards", os.path.basename(f1))
        assert open(f1, "rb").read() == open(f2, "rb").read(), f1


def test_merge_reshard_num_shards(merge_setup, tmp_path):
    """num_shards different from A's modulus re-routes EVERY side's terms
    (including side 0's) so crc32(term) % num_shards lookups always land —
    the silent-missing-postings shape the verbatim-copy fast path would
    produce under a foreign modulus."""
    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.merge import merge_indexes
    from rayindex.searcher import IndexReader

    m3 = str(tmp_path / "m3")
    merge_indexes(merge_setup["a"], merge_setup["b"], m3, num_shards=3)
    dicts = glob.glob(os.path.join(m3, "shards", "*.dict.parquet"))
    assert dicts and len(dicts) <= 3
    # every term routed to its crc32 % 3 home shard
    import zlib
    for p in dicts:
        sid = int(os.path.basename(p)[len("shard_"):len("shard_") + 5])
        for t in pq.read_table(p, columns=["term"])["term"].to_pylist():
            assert zlib.crc32(t.encode()) % 3 == sid, t
    assert _vocab(m3) == _vocab(merge_setup["c"])
    rm = IndexReader(m3)
    rc = IndexReader(merge_setup["c"])
    for term in _vocab(merge_setup["c"]):
        pm = rm.lookup(term, need_positions=True)
        c = rc.lookup(term, need_positions=True)
        assert pm is not None, term
        assert pm.docs.tolist() == c.docs.tolist(), term
        assert pm.tfs.tolist() == c.tfs.tolist(), term
        assert pm.positions.tolist() == c.positions.tolist(), term
    analyzer = AnalyzerConfig()
    cfg = SearchConfig(scorer="bm25", algorithm="taat")
    for q in ("data", "import data", "zzznope"):
        got = rm.search(q, k=10, search_cfg=cfg, analyzer=analyzer)
        want = rc.search(q, k=10, search_cfg=cfg, analyzer=analyzer)
        assert [(d, round(s, 9)) for d, s in got] == \
               [(d, round(s, 9)) for d, s in want], q


def test_merge_many_three_way(ray_session, tmp_path):
    """One-pass N-way merge: merge_many([A,B,C]) ≡ build(A ++ B ++ C)."""
    import pyarrow.compute as pc

    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import AnalyzerConfig, BuildConfig, SearchConfig
    from rayindex.merge import merge_many
    from rayindex.searcher import IndexReader

    tbl = corpus.make_rows(corpus.file_plan(48, 4))
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("repo", "ascending"), ("path", "ascending")]))
    slices = [tbl.slice(0, 16), tbl.slice(16, 16), tbl.slice(32)]

    def bld(name, t):
        src = tmp_path / f"src_{name}"
        src.mkdir()
        pq.write_table(t, str(src / "docs.parquet"))
        out = tmp_path / name
        build_index(str(src), str(out),
                    BuildConfig(num_shards=4, tokenize_batch_size=16))
        return str(out)

    parts = [bld(f"p{i}", s) for i, s in enumerate(slices)]
    combined = bld("combined", tbl)
    m = str(tmp_path / "m3")
    metrics = merge_many(parts, m)
    assert metrics["n_inputs"] == 3
    cm = pq.read_table(os.path.join(m, "stats",
                                    "collection_stats.parquet")).to_pylist()
    cc = pq.read_table(os.path.join(combined, "stats",
                                    "collection_stats.parquet")).to_pylist()
    assert cm == cc
    rm, rc = IndexReader(m), IndexReader(combined)
    cfg = SearchConfig(scorer="bm25")
    analyzer = AnalyzerConfig()
    for q in ("data", "import data", '"def main"'):
        got = rm.search(q, k=20, search_cfg=cfg, analyzer=analyzer)
        want = rc.search(q, k=20, search_cfg=cfg, analyzer=analyzer)
        assert [(d, round(s, 9)) for d, s in got] == \
               [(d, round(s, 9)) for d, s in want], q


def test_merge_resume_skips_finished_shards(merge_setup, tmp_path):
    """A re-run after losing ONE shard rebuilds only that shard (maint
    manifests skip the rest; the doc side skips via its marker)."""
    import shutil

    from rayindex.merge import merge_indexes

    out = str(tmp_path / "resumable")
    merge_indexes(merge_setup["a"], merge_setup["b"], out)
    shards = sorted(glob.glob(os.path.join(out, "shards", "shard_*.bin")))
    victim = shards[1]
    want_bytes = open(victim, "rb").read()
    keep = shards[2]
    keep_mtime = os.stat(keep).st_mtime_ns
    store_part = sorted(glob.glob(os.path.join(out, "doc_store",
                                               "*.parquet")))[0]
    store_mtime = os.stat(store_part).st_mtime_ns
    os.unlink(victim)
    os.unlink(victim[:-len(".bin")] + ".maint.json")
    merge_indexes(merge_setup["a"], merge_setup["b"], out)
    assert open(victim, "rb").read() == want_bytes
    assert os.stat(keep).st_mtime_ns == keep_mtime, "shard was not skipped"
    assert os.stat(store_part).st_mtime_ns == store_mtime, \
        "doc side was not skipped"
    shutil.rmtree(out)


def test_delete_resume_skips_finished_shards(ray_session, tmp_path):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.delete import delete_docs

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(corpus.make_rows(corpus.file_plan(30, 3)),
                   str(src / "docs.parquet"))
    ix = str(tmp_path / "ix")
    build_index(str(src), ix, BuildConfig(num_shards=4,
                                          tokenize_batch_size=16))
    out = str(tmp_path / "del")
    delete_docs(ix, out, doc_ids=np.asarray([2, 5, 11], np.int64))
    shards = sorted(glob.glob(os.path.join(out, "shards", "shard_*.bin")))
    victim, keep = shards[0], shards[1]
    want = open(victim, "rb").read()
    keep_mtime = os.stat(keep).st_mtime_ns
    os.unlink(victim)
    os.unlink(victim[:-len(".bin")] + ".maint.json")
    delete_docs(ix, out, doc_ids=np.asarray([2, 5, 11], np.int64))
    assert open(victim, "rb").read() == want
    assert os.stat(keep).st_mtime_ns == keep_mtime, "shard was not skipped"
