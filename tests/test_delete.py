"""Document deletion: delete_docs(build(C), ids) must score/stat exactly
like build(C minus those docs) — postings, term stats, collection stats,
doc store — with doc ids kept as holes (so merge increments still rebase
identically).  Untouched fine blocks are byte-spliced; only blocks
containing a deleted doc re-encode."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def delete_setup(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.delete import delete_docs

    base = tmp_path_factory.mktemp("delete")
    tbl = corpus.make_rows(corpus.file_plan(60, 5))
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=16,
                      fine_block_docs=8)  # small blocks: exercise splice+hit

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
    # every 4th doc plus the max doc (tail-hole case) — mid-block and
    # block-boundary deletes both occur at fine_block_docs=8
    deleted = np.unique(np.concatenate([ids[::4], [ids.max()]]))
    out = str(base / "deleted")
    metrics = delete_docs(full, out, doc_ids=deleted)

    # reference: fresh build over the corpus minus those docs
    del_keys = {(r, p) for r, p, d in zip(store["repo"].to_pylist(),
                                          store["path"].to_pylist(),
                                          ids) if d in set(deleted.tolist())}
    keep_mask = pa.array([
        (r, p) not in del_keys
        for r, p in zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist())])
    fresh = bld("fresh", tbl.filter(keep_mask))
    return {"full": full, "out": out, "fresh": fresh, "deleted": deleted,
            "metrics": metrics}


def _key_of(index_dir: str) -> dict[int, tuple]:
    t = pq.read_table(os.path.join(index_dir, "doc_store"),
                      columns=["doc_id", "repo", "path"])
    return {d: (r, p) for d, r, p in zip(t["doc_id"].to_pylist(),
                                         t["repo"].to_pylist(),
                                         t["path"].to_pylist())}


def test_deleted_collection_stats(delete_setup):
    got = pq.read_table(os.path.join(delete_setup["out"], "stats",
                                     "collection_stats.parquet")).to_pylist()[0]
    want = pq.read_table(os.path.join(delete_setup["fresh"], "stats",
                                      "collection_stats.parquet")).to_pylist()[0]
    assert got == want
    assert delete_setup["metrics"]["n_docs"] == want["n_docs"]
    assert delete_setup["metrics"]["n_deleted"] == delete_setup["deleted"].size


def test_deleted_term_stats(delete_setup):
    def stats(d):
        out = {}
        for p in sorted(glob.glob(os.path.join(d, "shards",
                                               "*.dict.parquet"))):
            t = pq.read_table(p, columns=["term", "df", "cf", "max_tf"])
            for r in t.to_pylist():
                out[r["term"]] = (r["df"], r["cf"], r["max_tf"])
        return out

    assert stats(delete_setup["out"]) == stats(delete_setup["fresh"])


def test_deleted_postings_decode(delete_setup):
    """Every surviving term decodes to the same (doc-key, tf, positions)
    multiset as the fresh filtered build; no deleted doc appears."""
    from rayindex.searcher import IndexReader

    ro = IndexReader(delete_setup["out"])
    rf = IndexReader(delete_setup["fresh"])
    ko, kf = _key_of(delete_setup["out"]), _key_of(delete_setup["fresh"])
    deleted = set(delete_setup["deleted"].tolist())
    vocab = set()
    for p in sorted(glob.glob(os.path.join(delete_setup["fresh"], "shards",
                                           "*.dict.parquet"))):
        vocab.update(pq.read_table(p, columns=["term"])["term"].to_pylist())
    for term in sorted(vocab):
        po = ro.lookup(term, need_positions=True)
        pf = rf.lookup(term, need_positions=True)
        assert po is not None and pf is not None, term
        assert not (set(po.docs.tolist()) & deleted), term
        so, sf = po.pos_slices(), pf.pos_slices()

        def rows(p, keymap, s):
            return sorted(
                (keymap[int(p.docs[i])], int(p.tfs[i]),
                 p.positions[int(s[i]):int(s[i]) + int(p.tfs[i])].tolist())
                for i in range(p.df))

        assert rows(po, ko, so) == rows(pf, kf, sf), term


def test_deleted_search_scores(delete_setup):
    """BM25 results match the fresh filtered build after mapping engine
    ids to doc keys (scores exact; order may differ only on exact ties)."""
    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.searcher import IndexReader

    ro = IndexReader(delete_setup["out"])
    rf = IndexReader(delete_setup["fresh"])
    ko, kf = _key_of(delete_setup["out"]), _key_of(delete_setup["fresh"])
    analyzer = AnalyzerConfig()
    for algorithm in ("taat", "bmw"):
        cfg = SearchConfig(scorer="bm25", algorithm=algorithm)
        for q in ("data", "import data", '"def main"', "return AND value"):
            got = [(ko[d], round(s, 9))
                   for d, s in ro.search(q, k=50, search_cfg=cfg,
                                         analyzer=analyzer)]
            want = [(kf[d], round(s, 9))
                    for d, s in rf.search(q, k=50, search_cfg=cfg,
                                          analyzer=analyzer)]
            assert sorted(got) == sorted(want), (algorithm, q)


def test_delete_by_filter_expr(delete_setup, tmp_path):
    """select_doc_ids + filter_expr path: deleting one repo's docs removes
    exactly that repo from the doc store."""
    import pyarrow.dataset as pads

    from rayindex.delete import delete_docs, select_doc_ids

    full = delete_setup["full"]
    repos = pq.read_table(os.path.join(full, "doc_store"),
                          columns=["repo"])["repo"].to_pylist()
    victim = sorted(set(repos))[0]
    expr = pads.field("repo") == victim
    ids = select_doc_ids(full, expr)
    assert ids.size == sum(r == victim for r in repos)
    out = str(tmp_path / "norepo")
    m = delete_docs(full, out, filter_expr=expr)
    assert m["n_deleted"] == ids.size
    left = pq.read_table(os.path.join(out, "doc_store"), columns=["repo"])
    assert victim not in set(left["repo"].to_pylist())
    assert left.num_rows == len(repos) - ids.size


def test_delete_cli_where_typed(delete_setup, tmp_path):
    """CLI --where casts the value to the column's schema type (a numeric
    doc_id works, not just string columns) and rejects unknown columns."""
    import pytest

    from rayindex.cli import main_delete

    full = delete_setup["full"]
    ids = pq.read_table(os.path.join(full, "doc_store"),
                        columns=["doc_id"])["doc_id"].to_pylist()
    victim = ids[len(ids) // 2]
    out = str(tmp_path / "cli_where")
    rc = main_delete(["--index", full, "--out", out,
                      "--where", f"doc_id={victim}"])
    assert rc == 0
    left = pq.read_table(os.path.join(out, "doc_store"),
                         columns=["doc_id"])["doc_id"].to_pylist()
    assert victim not in left and len(left) == len(ids) - 1
    with pytest.raises(SystemExit):
        main_delete(["--index", full, "--out", str(tmp_path / "x"),
                     "--where", "nosuchcol=1"])
    with pytest.raises(SystemExit):
        main_delete(["--index", full, "--out", str(tmp_path / "y"),
                     "--where", "doc_id=notanint"])


def test_delete_deterministic(delete_setup, tmp_path):
    from rayindex.delete import delete_docs

    out2 = str(tmp_path / "again")
    delete_docs(delete_setup["full"], out2,
                doc_ids=delete_setup["deleted"])
    for f1 in sorted(glob.glob(os.path.join(delete_setup["out"],
                                            "shards", "*"))):
        f2 = os.path.join(out2, "shards", os.path.basename(f1))
        assert open(f1, "rb").read() == open(f2, "rb").read(), f1


def test_delete_then_merge_increment(delete_setup, tmp_path):
    """Lifecycle chain: ids stay stable through a delete, so a later
    increment merge rebases exactly as it would have before the delete."""
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.merge import _doc_space, merge_indexes

    inc_tbl = corpus.make_rows(corpus.file_plan(12, 3, seed=7))
    src = tmp_path / "inc_src"
    src.mkdir()
    pq.write_table(inc_tbl, str(src / "docs.parquet"))
    inc = str(tmp_path / "inc")
    build_index(str(src), inc,
                BuildConfig(num_shards=4, tokenize_batch_size=16))
    assert _doc_space(delete_setup["out"]) == _doc_space(delete_setup["full"])
    merged = str(tmp_path / "merged")
    m = merge_indexes(delete_setup["out"], inc, merged)
    assert m["doc_offset"] == _doc_space(delete_setup["full"])
    want_docs = (pq.read_table(
        os.path.join(delete_setup["out"], "doc_store")).num_rows
        + pq.read_table(os.path.join(inc, "doc_store")).num_rows)
    assert m["n_docs"] == want_docs
