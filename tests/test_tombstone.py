"""Tombstone deletes (Lucene liveDocs semantics): tombstone_docs is an
O(n_deleted) takedown — artifacts hard-link, only stats/tombstones.bin
is new — and searchers mask the docs out of every posting at decode
time while keeping PRE-delete statistics.  The semantic gate: results
on a tombstoned index == the FULL index's ranking with the deleted
docs filtered out (identical scores), and compact(tombstone(build(C)))
== build(C minus docs) byte-identically."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tomb_setup(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.delete import tombstone_docs

    base = tmp_path_factory.mktemp("tomb")
    tbl = corpus.make_rows(corpus.file_plan(60, 5))
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=16,
                      fine_block_docs=8)

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
    out = str(base / "tombed")
    metrics = tombstone_docs(full, out, doc_ids=deleted)

    del_keys = {(r, p) for r, p, d in zip(store["repo"].to_pylist(),
                                          store["path"].to_pylist(),
                                          ids) if d in set(deleted.tolist())}
    keep_mask = pa.array([
        (r, p) not in del_keys
        for r, p in zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist())])
    fresh = bld("fresh", tbl.filter(keep_mask))
    return {"full": full, "out": out, "fresh": fresh, "deleted": deleted,
            "metrics": metrics, "cfg": cfg, "tbl": tbl}


def test_tombstone_is_link_only(tomb_setup):
    """Every pre-existing artifact is the SAME inode (no data rewrite);
    only tombstones.bin is new."""
    new_files = []
    for root, _dirs, files in os.walk(tomb_setup["out"]):
        for f in files:
            dst = os.path.join(root, f)
            src = os.path.join(tomb_setup["full"],
                               os.path.relpath(dst, tomb_setup["out"]))
            if os.path.exists(src):
                assert os.path.samefile(src, dst), dst
            else:
                new_files.append(os.path.relpath(dst, tomb_setup["out"]))
    assert new_files == ["stats/tombstones.bin"]
    assert tomb_setup["metrics"]["n_tombstoned"] == \
        tomb_setup["deleted"].size


def test_tombstone_postings_masked_df_stale(tomb_setup):
    """lookup drops exactly the tombstoned docs (tfs/positions aligned)
    but reports the PRE-delete df."""
    from rayindex.searcher import IndexReader

    rf = IndexReader(tomb_setup["full"])
    rt = IndexReader(tomb_setup["out"])
    deleted = set(tomb_setup["deleted"].tolist())
    checked = 0
    for term, _cf in rf.iter_terms():
        pf = rf.lookup(term, need_positions=True)
        pt = rt.lookup(term, need_positions=True)
        keep = [i for i, d in enumerate(pf.docs.tolist())
                if d not in deleted]
        assert pt.docs.tolist() == [int(pf.docs[i]) for i in keep], term
        assert pt.tfs.tolist() == [int(pf.tfs[i]) for i in keep], term
        want_pos = []
        for i in keep:
            want_pos.extend(pf.positions_of(i))
        assert pt.positions.tolist() == want_pos, term
        assert pt.df == pf.df, term  # stale by design
        checked += 1
    assert checked > 20


def test_tombstone_search_equals_filtered_full_ranking(tomb_setup):
    """Ranked results == full index's ranking minus deleted docs, with
    IDENTICAL scores (stats frozen), for TAAT and block-max WAND."""
    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.searcher import IndexReader

    analyzer = AnalyzerConfig()
    rf = IndexReader(tomb_setup["full"])
    rt = IndexReader(tomb_setup["out"])
    deleted = set(tomb_setup["deleted"].tolist())
    vocab = [t for t, cf in rf.iter_terms()
             if cf > 5 and t.isalpha()][:6]
    assert len(vocab) == 6
    queries = [vocab[0], " ".join(vocab[1:3]), " ".join(vocab[3:6]),
               "zzznope"]
    nonempty = 0
    for algorithm in ("taat", "bmw"):
        cfg = SearchConfig(scorer="bm25", algorithm=algorithm)
        for q in queries:
            want = [(d, round(s, 9)) for d, s in
                    rf.search(q, k=200, search_cfg=cfg, analyzer=analyzer)
                    if d not in deleted][:10]
            got = [(d, round(s, 9)) for d, s in
                   rt.search(q, k=10, search_cfg=cfg, analyzer=analyzer)]
            assert got == want, (algorithm, q)
            nonempty += bool(got)
    assert nonempty >= 6, "queries must actually match docs"


def test_tombstone_boolean_phrase_proximity_facets(tomb_setup):
    """Non-ranked paths (boolean algebra, phrase, proximity, facets) all
    inherit the mask through lookup/fetch_positions."""
    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.facet import facet_counts
    from rayindex.searcher import IndexReader

    analyzer = AnalyzerConfig()
    cfg = SearchConfig(scorer="bm25")
    rt = IndexReader(tomb_setup["out"])
    deleted = set(tomb_setup["deleted"].tolist())
    a, b = [t for t, cf in rt.iter_terms()
            if cf > 5 and t.isalpha()][:2]
    nonempty = 0
    for q in (f"{a} AND {b}", f"{a} OR {b}", f"{a} AND NOT {b}",
              f'"{a} {b}"', f"#5 {a} {b}"):
        hits = rt.search(q, k=500, search_cfg=cfg, analyzer=analyzer)
        nonempty += bool(hits)
        for d, _s in hits:
            assert d not in deleted, q
    assert nonempty >= 2
    fc = facet_counts(tomb_setup["out"], f"{a} OR {b}", "lang",
                      analyzer=analyzer)
    fresh_fc = facet_counts(tomb_setup["fresh"], f"{a} OR {b}", "lang",
                            analyzer=analyzer)
    # facet doc COUNTS must match the physically-deleted index's
    assert fc.to_pylist() == fresh_fc.to_pylist() and fc.num_rows


def test_compact_purges_tombstones_equals_fresh_build(tomb_setup, tmp_path):
    """compact(tombstone(build(C), ids)) is BYTE-IDENTICAL to
    build(C minus ids) — shard blobs, dicts, doc-meta bins."""
    from rayindex.compact import compact_index
    from rayindex.searcher import IndexReader

    out = str(tmp_path / "compacted")
    compact_index(tomb_setup["out"], out, tomb_setup["cfg"])
    for rel in sorted(
            os.path.relpath(p, tomb_setup["fresh"]) for p in
            glob.glob(os.path.join(tomb_setup["fresh"], "shards", "*"))
            # manifests embed the run fingerprint (different by
            # construction); the data artifacts must match bytewise
            if not p.endswith((".maint.json", ".manifest.json"))):
        b1 = open(os.path.join(tomb_setup["fresh"], rel), "rb").read()
        b2 = open(os.path.join(out, rel), "rb").read()
        assert b1 == b2, rel
    for rel in ("stats/doc_len.bin", "stats/lang_codes.bin"):
        assert open(os.path.join(tomb_setup["fresh"], rel), "rb").read() \
            == open(os.path.join(out, rel), "rb").read(), rel
    assert not os.path.exists(os.path.join(out, "stats", "tombstones.bin"))
    # and the compacted index's stats are the recomputed (fresh) ones
    cs = pq.read_table(os.path.join(out, "stats",
                                    "collection_stats.parquet")).to_pylist()
    fresh_cs = pq.read_table(os.path.join(
        tomb_setup["fresh"], "stats",
        "collection_stats.parquet")).to_pylist()
    assert cs == fresh_cs
    r = IndexReader(out)
    term = next(t for t, cf in r.iter_terms()
                if cf > 3 and t.isalpha())
    assert r.search(term, k=5)


def test_eager_delete_purges_tombstones(tomb_setup, tmp_path):
    """delete_docs over a tombstoned index folds the tombstones into the
    physical delete set."""
    from rayindex.delete import delete_docs
    from rayindex.searcher import IndexReader

    out = str(tmp_path / "eager")
    m = delete_docs(tomb_setup["out"], out, doc_ids=[])
    assert m["n_deleted"] == tomb_setup["deleted"].size
    assert not os.path.exists(os.path.join(out, "stats", "tombstones.bin"))
    r = IndexReader(out)
    deleted = set(tomb_setup["deleted"].tolist())
    term = next(t for t, cf in r.iter_terms()
                if cf > 3 and t.isalpha())
    hits = r.search(term, k=500)
    assert hits
    for d, _s in hits:
        assert d not in deleted


def test_tombstone_merge_carries_rebased(tomb_setup, tmp_path):
    """merge(tombstoned A, B) keeps A's tombstones; B's docs all
    survive."""
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.merge import _doc_space, merge_indexes
    from rayindex.searcher import IndexReader

    inc_tbl = corpus.make_rows(corpus.file_plan(12, 3, seed=7))
    src = tmp_path / "inc_src"
    src.mkdir()
    pq.write_table(inc_tbl, str(src / "docs.parquet"))
    inc = str(tmp_path / "inc")
    build_index(str(src), inc, tomb_setup["cfg"])
    merged = str(tmp_path / "merged")
    merge_indexes(tomb_setup["out"], inc, merged)
    tombs = np.fromfile(os.path.join(merged, "stats", "tombstones.bin"),
                        np.int64)
    assert tombs.tolist() == tomb_setup["deleted"].tolist()
    r = IndexReader(merged)
    deleted = set(tombs.tolist())
    off = _doc_space(tomb_setup["full"])
    term = next(t for t, cf in IndexReader(inc).iter_terms()
                if cf > 3 and t.isalpha())
    hits = [d for d, _s in r.search(term, k=1000)]
    assert hits
    assert not deleted & set(hits)
    assert any(d > off for d in hits), "increment docs must be searchable"


def test_tombstone_incremental_union(tomb_setup, tmp_path):
    """A second tombstone pass unions with the first."""
    from rayindex.delete import tombstone_docs
    from rayindex.searcher import IndexReader

    r0 = IndexReader(tomb_setup["out"])
    term = next(t for t, cf in r0.iter_terms()
                if cf > 3 and t.isalpha())
    alive = [d for d, _s in r0.search(term, k=50)]
    assert alive
    out2 = str(tmp_path / "tomb2")
    m = tombstone_docs(tomb_setup["out"], out2, doc_ids=[alive[0]])
    assert m["n_tombstoned"] == tomb_setup["deleted"].size + 1
    assert m["n_new"] == 1
    r2 = IndexReader(out2)
    assert alive[0] not in [d for d, _s in r2.search(term, k=50)]


def test_tombstone_fsck_clean(tomb_setup):
    from rayindex.fsck import fsck_index

    r = fsck_index(tomb_setup["out"], deep=True)
    assert r["ok"], r["errors"]
