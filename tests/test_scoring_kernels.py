"""Property tests: the vectorized phrase/proximity kernels must be exactly
equivalent to the oracle's loop kernels (reference semantics)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rayindex.oracle import consecutive_occ
from rayindex.scoring import Posting, _phrase_tf, _pos_keys


def _make_postings(doc_positions: list[dict[int, list[int]]]) -> list[Posting]:
    """doc_positions[t] = {doc: sorted positions of term t}."""
    out = []
    for per_doc in doc_positions:
        docs = np.asarray(sorted(per_doc), np.int64)
        tfs = np.asarray([len(per_doc[d]) for d in docs.tolist()], np.int64)
        pos = np.asarray([p for d in docs.tolist() for p in per_doc[d]], np.int64)
        out.append(Posting(docs=docs, tfs=tfs, positions=pos))
    return out


@given(st.data())
@settings(max_examples=300, deadline=None)
def test_phrase_tf_matches_reference_kernel(data):
    n_terms = data.draw(st.integers(2, 4))
    n_docs = data.draw(st.integers(1, 5))
    rng = np.random.default_rng(data.draw(st.integers(0, 10_000)))
    # disjoint position sets per term within each doc (one token per slot)
    per_term: list[dict[int, list[int]]] = [{} for _ in range(n_terms)]
    expected: dict[int, int] = {}
    docs_all = []
    for doc in range(1, n_docs + 1):
        slots = rng.permutation(np.arange(1, 25))[: rng.integers(n_terms, 20)]
        owner = rng.integers(0, n_terms, size=slots.size)
        lists = [sorted(slots[owner == t].tolist()) for t in range(n_terms)]
        if any(not lst for lst in lists):
            continue  # phrase requires every term present (intersection)
        for t in range(n_terms):
            per_term[t][doc] = lists[t]
        docs_all.append(doc)
        cons = consecutive_occ(lists)
        if cons > 0:
            expected[doc] = cons
    if not docs_all:
        return
    ps = _make_postings(per_term)
    inter = np.asarray(docs_all, np.int64)
    gd, gc = _phrase_tf(ps, inter)
    assert dict(zip(gd.tolist(), gc.tolist())) == expected


def test_phrase_tf_repeated_pair_type_quirk():
    """The reference kernel can emit an occurrence from REPEATED pair types
    (two l0→l1 adjacencies satisfy a 3-term phrase) — the vectorized kernel
    must reproduce that, not 'fix' it."""
    lists = [[1, 3], [2, 4], [9]]
    assert consecutive_occ(lists) == 1
    ps = _make_postings([{1: lists[0]}, {1: lists[1]}, {1: lists[2]}])
    gd, gc = _phrase_tf(ps, np.asarray([1], np.int64))
    assert dict(zip(gd.tolist(), gc.tolist())) == {1: 1}


def test_pos_keys_roundtrip():
    p = _make_postings([{3: [1, 5], 7: [2]}])[0]
    from rayindex.scoring import _POS_SHIFT
    keys = _pos_keys(p)
    assert (keys >> _POS_SHIFT).tolist() == [3, 3, 7]
    assert (keys & ((1 << _POS_SHIFT) - 1)).tolist() == [1, 5, 2]


def test_top_partition_matches_full_sort_with_ties():
    """_top's argpartition fast path must match the full stable sort
    exactly, including kth-boundary score ties broken by ascending doc."""
    import numpy as np

    from rayindex.scoring import _top

    rng = np.random.default_rng(11)
    for n, k in [(1000, 10), (5000, 100), (300, 10)]:
        docs = np.arange(n, dtype=np.int64)
        # heavy ties: scores drawn from a tiny value set
        scores = rng.integers(0, 7, n).astype(np.float64) / 3.0
        got_d, got_s = _top((docs, scores), k)
        order = np.argsort(-scores, kind="stable")[:k]
        assert np.array_equal(got_d, docs[order])
        assert np.array_equal(got_s, scores[order])


def test_sorted_set_ops_match_numpy():
    import numpy as np

    from rayindex.scoring import _intersect_sorted, _union_sorted

    rng = np.random.default_rng(5)
    for _ in range(20):
        a = np.unique(rng.integers(0, 300, rng.integers(0, 120)))
        b = np.unique(rng.integers(0, 300, rng.integers(0, 120)))
        assert np.array_equal(_intersect_sorted(a, b),
                              np.intersect1d(a, b, assume_unique=True))
        assert np.array_equal(_union_sorted([a, b]), np.union1d(a, b))
    empty = np.zeros(0, np.int64)
    assert _intersect_sorted(empty, empty).size == 0
    assert _union_sorted([empty, empty]).size == 0
