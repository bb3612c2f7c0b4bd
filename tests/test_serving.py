"""Serving-path tests: fsspec byte-range reading (index on object
storage queryable without download) and sharded searcher actors
(disjoint shard ownership, driver-side scatter/merge) — both must be
result-identical to the local single-reader path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayindex import corpus
from rayindex.config import SearchConfig

_Q = corpus.fixed_queries()
QUERIES = list(zip(_Q["query"].to_pylist(), _Q["kind"].to_pylist(),
                   _Q["k"].to_pylist()))


def _assert_identical(want, got, ctx):
    assert len(want) == len(got), f"{ctx}: lengths {len(want)} vs {len(got)}"
    for (wd, ws), (gd, gs) in zip(want, got):
        assert wd == gd, f"{ctx}: docs {wd} vs {gd}"
        assert abs(ws - gs) < 1e-9, f"{ctx}: scores {ws} vs {gs}"


def test_fsspec_ranged_reader_identical(tiny_build, tiny_reader):
    """IndexReader over a file:// URI must serve byte-range reads only
    (never a full blob fetch) and return identical results."""
    from rayindex.searcher import IndexReader, _RangedBlob

    r2 = IndexReader("file://" + tiny_build["out"])
    blobs = [b for b in r2._files if isinstance(b, _RangedBlob)]
    assert blobs, "remote reader must use ranged blobs"
    for qtext, kind, k in QUERIES[:30]:
        want = tiny_reader.search(qtext, k=k)
        got = r2.search(qtext, k=k)
        _assert_identical(want, got, f"fsspec/{qtext!r}")
    # every read was a proper sub-range, never the whole file
    total_reads = 0
    for b in blobs:
        for s, e in b.reads:
            assert 0 <= s <= e <= b.size
            assert e - s < b.size or b.size <= 64  # no full-blob fetch
            total_reads += 1
    assert total_reads > 0


def test_fsspec_lazy_blocks_read_subranges(tiny_build):
    """The lazy path over fsspec reads only the needed blocks' ranges."""
    from rayindex.searcher import IndexReader, _RangedBlob

    r2 = IndexReader("file://" + tiny_build["out"])
    lp = r2.lookup_lazy("def")
    assert lp is not None
    for b in r2._files:
        if isinstance(b, _RangedBlob):
            b.reads.clear()
    lp.block_docs_tfs(0)
    reads = [rd for b in r2._files if isinstance(b, _RangedBlob) for rd in b.reads]
    assert reads, "block decode must hit the ranged reader"
    assert all(e - s <= lp._doc_len + lp._tf_len for s, e in reads)


def test_sharded_pool_identical(ray_session, tiny_build, tiny_reader):
    """2+ actors owning disjoint shard subsets must produce identical
    results to the single-reader path for every query kind + lang filter."""
    from rayindex.searcher import ShardedSearchPool

    pool = ShardedSearchPool(tiny_build["out"], num_actors=2)
    assert pool.num_shards == tiny_build["cfg"].num_shards
    owned = set()
    for ai in range(len(pool.actors)):
        ids = [s for s, o in pool._owner_i.items() if o == ai]
        assert ids, "every actor must own at least one shard"
        assert not (owned & set(ids)), "shard ownership must be disjoint"
        owned |= set(ids)
    assert owned == set(range(pool.num_shards))
    for qtext, kind, k in QUERIES:
        want = tiny_reader.search(qtext, k=k)
        got = pool.search(qtext, k=k)
        _assert_identical(want, got, f"sharded/{kind}/{qtext!r}")
    # metadata filter path
    langs = sorted(v for v in pool._lang_uniq if v)
    for lang in langs[:2]:
        for qtext, kind, k in QUERIES[:10]:
            want = tiny_reader.search(qtext, k=k, lang=lang)
            got = pool.search(qtext, k=k, lang=lang)
            _assert_identical(want, got, f"sharded-lang/{qtext!r}")


def test_sharded_pool_all_scorers(ray_session, tiny_build, tiny_reader):
    from rayindex.searcher import ShardedSearchPool

    pool = ShardedSearchPool(tiny_build["out"], num_actors=3)
    for scorer in ("reference", "bm25", "lm", "lm-dirichlet", "vsm"):
        for qtext, kind, k in QUERIES[:12]:
            want = tiny_reader.search(qtext, k=k, scorer=scorer)
            got = pool.search(qtext, k=k, scorer=scorer)
            _assert_identical(want, got, f"sharded/{scorer}/{qtext!r}")


def test_shared_state_searcher_identical(ray_session, tiny_build, tiny_reader):
    """Searcher actors attaching a broadcast (ray.put) shared state must
    return results identical to a reader that parses the artifacts itself
    — across every query kind and a lang filter — and the actor pool path
    (search_dataset) must carry the same broadcast."""
    import ray

    from rayindex.searcher import Searcher, build_shared_state, search_dataset

    out = tiny_build["out"]
    ref = build_shared_state(out)
    s = Searcher(out, shared_state=ref)  # driver-side attach from plasma
    for qtext, kind, k in QUERIES[:30]:
        want = tiny_reader.search(qtext, k=k)
        got = s.reader.search(qtext, k=k)
        _assert_identical(want, got, f"shared/{qtext!r}")
    assert s.reader.n_terms == tiny_reader.n_terms
    # lang filter goes through the shared columnar codes
    langs = sorted({v for v in tiny_reader._lang_uniq})
    if langs:
        lang = langs[0]
        want = tiny_reader.search("def main", k=10, lang=lang)
        got = s.reader.search("def main", k=10, lang=lang)
        _assert_identical(want, got, f"shared-lang/{lang}")
    # full actor-pool path with the broadcast ref
    qt = corpus.fixed_queries().slice(0, 12)
    res = search_dataset(qt, out, concurrency=2, shared_state=ref).to_pandas()
    for qid, qtext, k in zip(res["query_id"].unique()[:5],
                             qt["query"].to_pylist(), qt["k"].to_pylist()):
        want = tiny_reader.search(qt["query"][int(qid)].as_py(),
                                  k=int(qt["k"][int(qid)].as_py()))
        sub = res[res["query_id"] == qid].sort_values("rank")
        got = list(zip(sub["doc_id"].tolist(), sub["score"].tolist()))
        _assert_identical(want, got, f"pool/{qid}")


def test_remote_reader_docmeta_ranged(tiny_build, tiny_reader):
    """A file:// reader must never materialize doc_stats: doc lengths come
    from byte-range reads of the doc_len.bin side table (chunk-granular),
    and the lang filter runs off the dense code bin remotely too."""
    from rayindex.searcher import IndexReader, _RangedBinArray

    r2 = IndexReader("file://" + tiny_build["out"])
    assert isinstance(r2.stats.doc_len, _RangedBinArray)
    r2.stats.doc_len.reads.clear()
    for qtext, kind, k in QUERIES[:10]:
        want = tiny_reader.search(qtext, k=k)
        _assert_identical(want, r2.search(qtext, k=k), f"remote-meta/{qtext!r}")
    reads = r2.stats.doc_len.reads
    assert reads, "scoring must touch doc_len through ranged reads"
    assert all(e - s <= _RangedBinArray._CHUNK for s, e in reads)
    lang = sorted(v for v in r2._lang_uniq if v)[0]
    got = r2.search("def", k=5, lang=lang)
    _assert_identical(tiny_reader.search("def", k=5, lang=lang), got,
                      "remote-lang")


def test_sharded_pool_transport_shape(ray_session, tiny_build, tiny_reader):
    """Serving-scale contract: (a) the pool never materializes doc_stats
    (doc_len is the mmap'd bin); (b) a single-term query — however hot —
    ships only k result rows back (full delegation, zero posting rows);
    (c) a multi-owner rank query ships per-term (docs, w) partials, never
    full postings."""
    from rayindex.build import term_shard
    from rayindex.searcher import ShardedSearchPool

    pool = ShardedSearchPool(tiny_build["out"], num_actors=2)
    assert isinstance(pool.stats.doc_len, np.memmap)
    assert not hasattr(pool, "_lang_vals")

    got = pool.search("def", k=10)
    _assert_identical(tiny_reader.search("def", k=10), got, "delegate")
    assert pool.metrics["delegated"] == 1
    assert pool.metrics["posting_rows"] == 0

    words = ["def", "return", "import", "class", "self", "data", "value",
             "result", "index", "count"]
    from rayindex.config import AnalyzerConfig
    from rayindex.query import parse_query
    from rayindex.scoring import query_terms

    by_owner: dict[int, list[str]] = {}
    for w in words:
        terms = query_terms(parse_query(w, AnalyzerConfig()))
        if not terms:
            continue  # analyzed away (stopword)
        by_owner.setdefault(
            pool._owner_i[term_shard(terms[0], pool.num_shards)], []).append(w)
    assert len(by_owner) >= 2, "test words must span two owners"
    q = " ".join(v[0] for v in list(by_owner.values())[:2])
    _assert_identical(tiny_reader.search(q, k=10), pool.search(q, k=10),
                      f"partials/{q!r}")
    assert pool.metrics["partial_terms"] >= 1
    assert pool.metrics["posting_rows"] == 0, \
        "rank queries must ship partial scores, not decoded postings"


def test_sharded_pool_remote_uri(ray_session, tiny_build, tiny_reader):
    """The pool over a file:// URI: owners serve ranged blob reads, the
    driver's doc meta is byte-ranged — results stay identical."""
    from rayindex.searcher import ShardedSearchPool, _RangedBinArray

    pool = ShardedSearchPool("file://" + tiny_build["out"], num_actors=2)
    assert isinstance(pool.stats.doc_len, _RangedBinArray)
    for qtext, kind, k in QUERIES[:12]:
        want = tiny_reader.search(qtext, k=k)
        _assert_identical(want, pool.search(qtext, k=k), f"pool-uri/{qtext!r}")


def test_prefault_identical_and_idempotent(tiny_build, tiny_reader):
    """The startup page warm (Searcher.prefault) must touch every local
    blob byte, be idempotent, and leave query results bit-identical —
    it is a pure page-table populate, never a semantic change."""
    from rayindex.searcher import IndexReader

    r = IndexReader(tiny_build["out"])
    want = [tiny_reader.search(q, k=k) for q, _, k in QUERIES[:12]]
    touched = r.prefault()
    assert touched > 0
    assert r.prefault() == touched  # idempotent, same byte census
    for (q, _, k), w in zip(QUERIES[:12], want):
        _assert_identical(w, r.search(q, k=k), f"prefault/{q!r}")
