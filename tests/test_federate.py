"""Query-time federation gate: FederatedReader([A, B]) must be
indistinguishable from IndexReader(merge(A, B)) — postings, stats, and
ranked results across query types, scorers and algorithms (the
incremental-ingest serving path must never change what a user sees)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def fed_setup(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.merge import merge_indexes

    base = tmp_path_factory.mktemp("fed")
    tbl = corpus.make_rows(corpus.file_plan(60, 5))
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("repo", "ascending"), ("path", "ascending")]))
    ta, tb = tbl.slice(0, 36), tbl.slice(36)

    def bld(name: str, t: pa.Table) -> str:
        src = base / f"src_{name}"
        src.mkdir()
        pq.write_table(t, str(src / "docs.parquet"))
        out = base / name
        build_index(str(src), str(out),
                    BuildConfig(num_shards=4, tokenize_batch_size=16))
        return str(out)

    a, b = bld("a", ta), bld("b", tb)
    m = str(base / "m")
    merge_indexes(a, b, m)
    return {"a": a, "b": b, "m": m}


def _vocab(index_dir: str) -> list[str]:
    terms: list[str] = []
    for p in sorted(glob.glob(os.path.join(index_dir, "shards",
                                           "*.dict.parquet"))):
        terms += pq.read_table(p, columns=["term"])["term"].to_pylist()
    return sorted(terms)


def test_federated_postings_identical(fed_setup):
    from rayindex.federate import FederatedReader
    from rayindex.searcher import IndexReader

    fed = FederatedReader([fed_setup["a"], fed_setup["b"]])
    rm = IndexReader(fed_setup["m"])
    assert fed.stats.n_docs == rm.stats.n_docs
    assert fed.stats.total_tokens == rm.stats.total_tokens
    for term in _vocab(fed_setup["m"]):
        pf = fed.lookup(term, need_positions=True)
        pm = rm.lookup(term, need_positions=True)
        assert pf is not None and pm is not None, term
        assert pf.docs.tolist() == pm.docs.tolist(), term
        assert pf.tfs.tolist() == pm.tfs.tolist(), term
        assert pf.positions.tolist() == pm.positions.tolist(), term
        assert pf.df == pm.df, term
        # doc lengths route correctly through the lazy concat
        assert (fed.stats.doc_len[pf.docs].tolist()
                == np.asarray(rm.stats.doc_len)[pm.docs].tolist()), term


QUERIES = [
    ("function return value", {}),
    ("class", {}),
    ("function AND class", {}),
    ("function OR import", {}),
    ("function AND NOT class", {}),
    ('"def main"', {}),
    ("#3 function class", {}),
    ("function return", {"lang": "python"}),
]


@pytest.mark.parametrize("scorer", ["bm25", "reference", "lm", "vsm"])
def test_federated_search_rank_identical(fed_setup, scorer):
    from rayindex.config import SearchConfig
    from rayindex.federate import FederatedReader
    from rayindex.searcher import IndexReader

    fed = FederatedReader([fed_setup["a"], fed_setup["b"]])
    rm = IndexReader(fed_setup["m"])
    for q, kw in QUERIES:
        rf = fed.search(q, k=10, scorer=scorer, **kw)
        rr = rm.search(q, k=10, scorer=scorer, **kw)
        assert [d for d, _ in rf] == [d for d, _ in rr], (q, scorer)
        assert np.allclose([s for _, s in rf], [s for _, s in rr]), (q, scorer)


@pytest.mark.parametrize("algorithm", ["taat", "bmw", "auto"])
def test_federated_wand_identical(fed_setup, algorithm):
    """The federated lazy-posting view must give block-max WAND the same
    results as TAAT on the merged index (the routing/bounds are rebased
    sub-index block metadata)."""
    from rayindex.config import SearchConfig
    from rayindex.federate import FederatedReader
    from rayindex.searcher import IndexReader

    fed = FederatedReader([fed_setup["a"], fed_setup["b"]])
    rm = IndexReader(fed_setup["m"])
    cfg = SearchConfig(algorithm=algorithm)
    for q in ("function return value", "import class self"):
        rf = fed.search(q, k=10, search_cfg=cfg)
        rr = rm.search(q, k=10, search_cfg=cfg)
        assert [d for d, _ in rf] == [d for d, _ in rr], (q, algorithm)
        assert np.allclose([s for _, s in rf], [s for _, s in rr])


def test_federated_tombstones_carry(fed_setup, tmp_path):
    """Tombstoning docs in A must mask them in federated results exactly
    as the merged index (which carries rebased tombstones) masks them."""
    from rayindex.delete import tombstone_docs
    from rayindex.federate import FederatedReader
    from rayindex.merge import merge_indexes
    from rayindex.searcher import IndexReader

    from rayindex.merge import _doc_space

    space_a = _doc_space(fed_setup["a"])
    rm0 = IndexReader(fed_setup["m"])
    base = rm0.search("function return value", k=20)
    # victims must be A-LOCAL ids (tombstone_docs validates the doc
    # space; A's ids coincide with merged-global ids at offset 0)
    victims = np.array([d for d, _ in base if d <= space_a][:2], np.int64)
    assert victims.size == 2, "need two in-A results to tombstone"

    a_t = str(tmp_path / "a_t")
    tombstone_docs(fed_setup["a"], a_t, doc_ids=victims)
    m_t = str(tmp_path / "m_t")
    merge_indexes(a_t, fed_setup["b"], m_t)

    fed = FederatedReader([a_t, fed_setup["b"]])
    rm = IndexReader(m_t)
    for q in ("function return value", "function AND class"):
        rf = fed.search(q, k=10)
        rr = rm.search(q, k=10)
        assert [d for d, _ in rf] == [d for d, _ in rr], q
        assert np.allclose([s for _, s in rf], [s for _, s in rr])
        assert not set(victims.tolist()) & {d for d, _ in rf}


def test_federated_route(fed_setup):
    from rayindex.federate import FederatedReader
    from rayindex.merge import _doc_space

    fed = FederatedReader([fed_setup["a"], fed_setup["b"]])
    space_a = _doc_space(fed_setup["a"])
    sub, local = fed.route(np.array([1, space_a, space_a + 1], np.int64))
    assert sub.tolist() == [0, 0, 1]
    assert local.tolist() == [1, space_a, 1]
