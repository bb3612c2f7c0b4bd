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
    for actor, ids in [(a, [s for s, o in pool._owner.items() if o is a])
                       for a in pool.actors]:
        assert ids, "every actor must own at least one shard"
        assert not (owned & set(ids)), "shard ownership must be disjoint"
        owned |= set(ids)
    assert owned == set(range(pool.num_shards))
    for qtext, kind, k in QUERIES:
        want = tiny_reader.search(qtext, k=k)
        got = pool.search(qtext, k=k)
        _assert_identical(want, got, f"sharded/{kind}/{qtext!r}")
    # metadata filter path
    langs = sorted({v for v in pool._lang_vals.tolist() if v})
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
