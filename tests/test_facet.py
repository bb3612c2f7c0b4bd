"""Faceted search: the mmap-bincount lang path and the generic Ray Data
doc-store path must agree with each other and with a brute-force count."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def facet_index(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    base = tmp_path_factory.mktemp("facet")
    tbl = corpus.make_rows(corpus.file_plan(40, 4))
    src = base / "src"
    src.mkdir()
    pq.write_table(tbl, str(src / "docs.parquet"))
    out = str(base / "ix")
    build_index(str(src), out, BuildConfig(num_shards=4,
                                           tokenize_batch_size=16))
    return out


def test_facet_paths_agree(facet_index):
    from rayindex.config import AnalyzerConfig
    from rayindex.facet import _facet_generic, _match_docs, facet_counts

    analyzer = AnalyzerConfig()
    q = "data OR return"
    fast = facet_counts(facet_index, q, "lang", analyzer=analyzer)
    slow = _facet_generic(facet_index, _match_docs(facet_index, q, analyzer),
                          "lang")
    assert fast.to_pylist() == slow.to_pylist()
    # brute force from the doc store
    docs = set(_match_docs(facet_index, q, analyzer).tolist())
    assert docs, "query must match something for this test to bite"
    store = pq.read_table(os.path.join(facet_index, "doc_store"),
                          columns=["doc_id", "lang"])
    want: dict[str, int] = {}
    for d, la in zip(store["doc_id"].to_pylist(), store["lang"].to_pylist()):
        if d in docs:
            want[la] = want.get(la, 0) + 1
    assert {r["lang"]: r["n_docs"] for r in fast.to_pylist()} == want


def test_facet_generic_column(facet_index):
    from rayindex.config import AnalyzerConfig
    from rayindex.facet import _match_docs, facet_counts

    analyzer = AnalyzerConfig()
    got = facet_counts(facet_index, "data", "repo", analyzer=analyzer)
    n_match = _match_docs(facet_index, "data", analyzer).size
    assert sum(r["n_docs"] for r in got.to_pylist()) == n_match
    assert got["repo"].to_pylist() == sorted(got["repo"].to_pylist())


def test_facet_top_n_native(facet_index):
    """top_n runs sort+limit natively and returns the count-desc head of
    the full facet table (value-asc tiebreak), for both paths."""
    from rayindex.config import AnalyzerConfig
    from rayindex.facet import facet_counts

    analyzer = AnalyzerConfig()
    for col in ("repo", "lang"):
        full = facet_counts(facet_index, "data", col, analyzer=analyzer) \
            .to_pylist()
        want = sorted(full, key=lambda r: (-r["n_docs"], r[col]))[:2]
        got = facet_counts(facet_index, "data", col, analyzer=analyzer,
                           top_n=2).to_pylist()
        assert got == want, col


def test_facet_proximity_query(facet_index):
    """A proximity query facets over the candidate union of its window
    terms instead of raising AttributeError."""
    from rayindex.config import AnalyzerConfig
    from rayindex.facet import _match_docs, facet_counts
    from rayindex.searcher import IndexReader

    analyzer = AnalyzerConfig()
    docs = _match_docs(facet_index, "#3 data return", analyzer)
    r = IndexReader(facet_index)
    want = np.unique(np.concatenate(
        [p.docs for p in (r.lookup(t, need_positions=False)
                          for t in ("data", "return")) if p is not None]))
    assert docs.tolist() == want.tolist()
    got = facet_counts(facet_index, "#3 data return", "lang",
                       analyzer=analyzer)
    assert sum(x["n_docs"] for x in got.to_pylist()) == docs.size


def test_facet_empty_match(facet_index):
    from rayindex.config import AnalyzerConfig
    from rayindex.facet import facet_counts

    got = facet_counts(facet_index, "zzznope AND data", "lang",
                       analyzer=AnalyzerConfig())
    assert got.num_rows == 0


def test_suggest_terms(facet_index):
    import glob

    from rayindex.spell import suggest_terms

    got = suggest_terms(facet_index, "re", k=5)
    allt: dict[str, int] = {}
    for p in glob.glob(os.path.join(facet_index, "shards",
                                    "*.dict.parquet")):
        for r in pq.read_table(p, columns=["term", "cf"]).to_pylist():
            allt[r["term"]] = r["cf"]
    want = sorted(((t, c) for t, c in allt.items() if t.startswith("re")),
                  key=lambda x: (-x[1], x[0]))[:5]
    assert [(r["term"], r["cf"]) for r in got.to_pylist()] == want
    assert got["rank"].to_pylist() == list(range(1, got.num_rows + 1))


def test_suggest_terms_no_match(facet_index):
    from rayindex.spell import suggest_terms

    assert suggest_terms(facet_index, "zzzzz", k=5).num_rows == 0
