"""Upsert lifecycle gate: upsert(build(C1), U) must serve exactly the
logically-updated corpus — superseded versions invisible, new versions
live — and consolidate_upsert must equal a fresh build over the updated
corpus in vocabulary, df/cf and ranking (the incremental path may never
change what a user would see after a full re-index, which is all the
reference engine can do — /root/reference/indexing/main.py)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _write_src(base, name: str, t: pa.Table) -> str:
    src = base / f"src_{name}"
    src.mkdir()
    pq.write_table(t, str(src / "docs.parquet"))
    return str(src)


def _term_stats(index_dir: str) -> dict[str, tuple[int, int]]:
    out: dict[str, tuple[int, int]] = {}
    for p in sorted(glob.glob(os.path.join(index_dir, "shards",
                                           "*.dict.parquet"))):
        t = pq.read_table(p, columns=["term", "df", "cf"])
        for term, df, cf in zip(t["term"].to_pylist(), t["df"].to_pylist(),
                                t["cf"].to_pylist()):
            out[term] = (df, cf)
    return out


def _by_key(index_dir, res):
    """(repo, path) per ranked hit — the doc-id-independent identity."""
    from rayindex.searcher import fetch_doc_metadata

    meta = fetch_doc_metadata(index_dir, [d for d, _ in res])
    order = {d: i for i, d in enumerate(meta["doc_id"].to_pylist())}
    keys = list(zip(meta["repo"].to_pylist(), meta["path"].to_pylist()))
    return [(keys[order[d]], round(s, 6)) for d, s in res]


@pytest.fixture(scope="module")
def up(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.upsert import consolidate_upsert, upsert_index

    base = tmp_path_factory.mktemp("upsert")
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=16)
    tbl = corpus.make_rows(corpus.file_plan(50, 4))

    # update batch: every 5th doc gets new content; 6 brand-new docs
    upd = tbl.slice(0, 0)
    rows = tbl.to_pylist()
    updates = []
    for i, r in enumerate(rows):
        if i % 5 == 2:
            r = dict(r)
            r["content"] = r["content"] + "\nzzupserted marker body"
            updates.append(r)
    for j in range(6):
        updates.append({"repo": "org9/newproj", "path": f"new_{j}.txt",
                        "commit": "c" * 40, "lang": "txt",
                        "content": f"zzbrandnew document number {j} "
                                   "stream merge window"})
    upd = pa.Table.from_pylist(updates, schema=tbl.schema)

    # the logically updated corpus (what a full re-index would see)
    old_keys = set(zip(upd["repo"].to_pylist(), upd["path"].to_pylist()))
    keep = [not ((re, pa_) in old_keys)
            for re, pa_ in zip(tbl["repo"].to_pylist(),
                               tbl["path"].to_pylist())]
    updated = pa.concat_tables([tbl.filter(pa.array(keep)), upd])

    v1 = str(base / "v1")
    build_index(_write_src(base, "v1", tbl), v1, cfg)
    fed = str(base / "fed")
    info = upsert_index(v1, fed, _write_src(base, "upd", upd), cfg)

    fresh = str(base / "fresh")
    build_index(_write_src(base, "fresh", updated), fresh, cfg)
    final = str(base / "final")
    consolidate_upsert(fed, final, cfg)
    return {"base": base, "cfg": cfg, "v1": v1, "fed": fed, "info": info,
            "fresh": fresh, "final": final, "tbl": tbl, "upd": upd,
            "updated": updated}


def test_upsert_metrics(up):
    # every update row with a pre-existing key tombstones exactly one doc
    n_mod = sum(1 for i in range(up["tbl"].num_rows) if i % 5 == 2)
    assert up["info"]["n_updates"] == up["upd"].num_rows
    assert up["info"]["n_superseded"] == n_mod
    assert up["info"]["n_subs"] == 2


def test_superseded_invisible_new_live(up):
    from rayindex.upsert import open_upsert

    fed = open_upsert(up["fed"])
    # the marker term appears ONLY in updated docs; every hit must be a
    # new version (its metadata content carries the marker)
    res = fed.search("zzupserted", k=100)
    assert len(res) == up["info"]["n_superseded"]
    meta = fed.fetch_doc_metadata([d for d, _ in res])
    hit_keys = set(zip(meta["repo"].to_pylist(), meta["path"].to_pylist()))
    mod_keys = {(r, p)
                for i, (r, p) in enumerate(zip(up["tbl"]["repo"].to_pylist(),
                                               up["tbl"]["path"].to_pylist()))
                if i % 5 == 2}
    assert hit_keys == mod_keys
    # brand-new docs are findable
    res = fed.search("zzbrandnew", k=100)
    assert len(res) == 6
    # a term from an updated doc's OLD body must not surface that doc's
    # old version: all hits for any term map to distinct (repo, path)
    res = fed.search("merge window stream", k=200)
    meta = fed.fetch_doc_metadata([d for d, _ in res])
    keys = list(zip(meta["repo"].to_pylist(), meta["path"].to_pylist()))
    assert len(keys) == len(set(keys))


def test_consolidate_equals_fresh_build(up):
    from rayindex.config import SearchConfig
    from rayindex.searcher import IndexReader

    assert _term_stats(up["final"]) == _term_stats(up["fresh"])
    rf = IndexReader(up["final"])
    rr = IndexReader(up["fresh"])
    assert rf.stats.n_docs == rr.stats.n_docs
    assert rf.stats.total_tokens == rr.stats.total_tokens
    cfg = SearchConfig(scorer="bm25", algorithm="taat")
    for q in ("zzupserted", "zzbrandnew document",
              '"merge window"', "stream AND merge", "#3(stream,window)"):
        a = _by_key(up["final"], rf.search(q, k=30, search_cfg=cfg))
        b = _by_key(up["fresh"], rr.search(q, k=30, search_cfg=cfg))
        assert a == b, q


def test_repeated_upsert_chains(up):
    from rayindex.upsert import open_upsert, resolve_subs, upsert_index

    # second wave: update one of the FIRST wave's new docs
    upd2 = pa.Table.from_pylist(
        [{"repo": "org9/newproj", "path": "new_0.txt", "commit": "d" * 40,
          "lang": "txt", "content": "zzthirdgen replacement body"}],
        schema=up["tbl"].schema)
    fed2 = str(up["base"] / "fed2")
    info = upsert_index(up["fed"], fed2,
                        _write_src(up["base"], "upd2", upd2), up["cfg"])
    assert info["n_subs"] == 3 and info["n_superseded"] == 1
    assert len(resolve_subs(fed2)) == 3
    fed = open_upsert(fed2)
    res = fed.search("zzthirdgen", k=10)
    assert len(res) == 1
    # the superseded first-wave version is gone everywhere
    res = fed.search("zzbrandnew", k=100)
    meta = fed.fetch_doc_metadata([d for d, _ in res])
    paths = meta["path"].to_pylist()
    assert "new_0.txt" not in paths and len(res) == 5


def test_duplicate_key_batch_rejected(up):
    from rayindex.upsert import upsert_index

    dup = pa.Table.from_pylist(
        [{"repo": "r", "path": "p", "commit": "", "lang": "txt",
          "content": "a"},
         {"repo": "r", "path": "p", "commit": "", "lang": "txt",
          "content": "b"}], schema=up["tbl"].schema)
    with pytest.raises(ValueError, match="duplicate"):
        upsert_index(up["v1"], str(up["base"] / "fed_dup"),
                     _write_src(up["base"], "dup", dup), up["cfg"])
