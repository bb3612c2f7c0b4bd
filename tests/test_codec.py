"""Unit + property tests for the delta/variable-byte posting codec.

Covers the reference's compression semantics
(/root/reference/indexing/index_compressor/compression.py:48-123): delta
docIDs + VB bytes, lossless round trip, plus our chunk/merge layout.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rayindex import codec


# ---------------------------------------------------------------------------
# variable-byte
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=(1 << 56) - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert np.array_equal(codec.vb_decode(codec.vb_encode(arr)), arr)


def test_vb_empty():
    assert codec.vb_encode(np.zeros(0, np.uint64)) == b""
    assert codec.vb_decode(b"").size == 0


def test_vb_known_vectors():
    # 0 -> 0x80; 127 -> 0xFF; 128 -> 0x01 0x80 (7-bit groups, MSB-first,
    # high bit terminates)
    assert codec.vb_encode(np.array([0], np.uint64)) == b"\x80"
    assert codec.vb_encode(np.array([127], np.uint64)) == b"\xff"
    assert codec.vb_encode(np.array([128], np.uint64)) == b"\x01\x80"
    assert codec.vb_encode(np.array([5, 130], np.uint64)) == b"\x85\x01\x82"


def test_vb_first_value():
    buf = codec.vb_encode(np.array([300, 7], np.uint64))
    assert codec.vb_first_value(buf) == 300
    assert codec.vb_first_value_len(buf) == 2


# ---------------------------------------------------------------------------
# delta
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_sorted(values):
    arr = np.unique(np.asarray(values, np.int64))
    assert np.array_equal(codec.delta_decode(codec.delta_encode(arr)), arr)


def test_segmented_delta_roundtrip():
    flat = np.array([1, 5, 9, 2, 3, 7], np.int64)
    starts = np.array([0, 3, 5])
    lengths = np.array([3, 2, 1])
    enc = codec.segmented_delta_encode(flat, starts)
    assert np.array_equal(codec.segmented_delta_decode(enc, lengths), flat)


@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=10000), min_size=1, max_size=20),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_segmented_delta_property(segments):
    segs = [np.unique(np.asarray(s, np.int64)) for s in segments]
    flat = np.concatenate(segs)
    lengths = np.asarray([len(s) for s in segs], np.int64)
    starts = np.cumsum(lengths) - lengths
    enc = codec.segmented_delta_encode(flat, starts)
    assert np.array_equal(codec.segmented_delta_decode(enc, lengths), flat)


# ---------------------------------------------------------------------------
# chunks
# ---------------------------------------------------------------------------


def _random_postings(rng, n_docs, max_doc):
    docs = np.sort(rng.choice(np.arange(1, max_doc + 1), size=n_docs, replace=False))
    tfs = rng.integers(1, 8, size=n_docs).astype(np.int64)
    dls = rng.integers(1, 500, size=n_docs).astype(np.int64)
    pos = np.concatenate([np.sort(rng.choice(np.arange(1, 1000), size=t, replace=False)) for t in tfs])
    return docs, tfs, dls, pos


def test_chunk_roundtrip():
    rng = np.random.default_rng(7)
    docs, tfs, dls, pos = _random_postings(rng, 50, 10_000)
    c = codec.encode_chunk(docs, tfs, dls, pos, block_size=8)
    d, t = codec.decode_doc_tf(c.doc_blob, c.tf_blob)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(codec.decode_positions(c.pos_blob, t), pos)
    assert c.df_blocks_consistent() if hasattr(c, "df_blocks_consistent") else True
    assert c.n_docs == 50
    assert c.cf == int(tfs.sum())
    assert c.max_tf == int(tfs.max())
    # block metadata
    assert c.block_last[-1] == docs[-1]
    assert c.block_max_tf.max() == tfs.max()


def test_merge_chunks_disjoint_splice():
    rng = np.random.default_rng(3)
    docs, tfs, dls, pos = _random_postings(rng, 64, 1000)
    # split into 3 disjoint ranges and encode separately
    cut1, cut2 = 20, 45
    pieces = []
    pstart = 0
    for lo, hi in [(0, cut1), (cut1, cut2), (cut2, 64)]:
        plen = int(tfs[lo:hi].sum())
        pieces.append(
            codec.encode_chunk(docs[lo:hi], tfs[lo:hi], dls[lo:hi], pos[pstart : pstart + plen], block_size=8)
        )
        pstart += plen
    merged = codec.merge_chunks(pieces)
    d, t = codec.decode_doc_tf(merged.doc_blob, merged.tf_blob)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(codec.decode_positions(merged.pos_blob, t), pos)
    assert merged.cf == int(tfs.sum())
    # merged equals single-shot encodes for docs/tf streams
    single = codec.encode_chunk(docs, tfs, dls, pos, block_size=8)
    assert merged.doc_blob == single.doc_blob
    assert merged.tf_blob == single.tf_blob
    assert merged.pos_blob == single.pos_blob


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_merge_chunks_property(data):
    rng = np.random.default_rng(data.draw(st.integers(0, 10_000)))
    n = data.draw(st.integers(2, 80))
    docs, tfs, dls, pos = _random_postings(rng, n, 100_000)
    ncuts = data.draw(st.integers(1, min(5, n - 1)))
    cuts = sorted(rng.choice(np.arange(1, n), size=ncuts, replace=False).tolist())
    bounds = [0] + cuts + [n]
    pieces = []
    pstart = 0
    for lo, hi in zip(bounds, bounds[1:]):
        plen = int(tfs[lo:hi].sum())
        pieces.append(
            codec.encode_chunk(docs[lo:hi], tfs[lo:hi], dls[lo:hi], pos[pstart : pstart + plen], block_size=8)
        )
        pstart += plen
    # shuffled merge input order must not matter
    order = rng.permutation(len(pieces))
    merged = codec.merge_chunks([pieces[i] for i in order])
    d, t = codec.decode_doc_tf(merged.doc_blob, merged.tf_blob)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(codec.decode_positions(merged.pos_blob, t), pos)


def test_merge_single_chunk_identity():
    c = codec.encode_chunk(np.array([5]), np.array([2]), np.array([9]), np.array([1, 3]))
    assert codec.merge_chunks([c]) is c


def test_empty_chunk_raises():
    with pytest.raises(ValueError):
        codec.encode_chunk(np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64), None)
