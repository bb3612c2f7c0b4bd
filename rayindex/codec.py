"""Posting-list codec: delta + variable-byte encoding over numpy arrays.

The reference compresses posting lists with delta-encoded docIDs interleaved
with term frequencies through the ``vbcode`` library
(/root/reference/indexing/index_compressor/compression.py:48-65, decode
:100-123).  This module re-implements the classic 7-bit variable-byte codec
(high bit terminates a value — standard public algorithm, e.g.
Manning/Raghavan/Schuetze IR book ch. 5) fully vectorized in numpy, and
defines the *chunk* blob layout used throughout the build:

- ``doc_blob``:  VB stream of ``[first_doc, doc_delta_1, ...]`` (first value
  absolute, rest deltas; ascending docIDs required — the reference relies on
  insertion order, /root/reference/indexing/index_builder/index_build.py:26-61;
  we sort explicitly).
- ``tf_blob``:   VB stream of term frequencies, one per doc.
- ``pos_blob``:  VB stream of within-doc delta-encoded 1-based token
  positions, concatenated doc after doc; per-doc lengths == tf, so no extra
  length table is needed.  Kept separate so plain BM25 never decodes
  positions (the reference needed a second TF-only index for this,
  /root/reference/indexing/index_converter/index_converter.py:7-42).
- block maxima (per run of ``block_size`` docs): last_doc / max_tf / min_dl —
  the metadata block-max WAND needs for upper-bound pruning.

Chunks covering disjoint ascending doc ranges merge by *byte splicing*: only
the first VB value of each subsequent chunk is re-encoded as a delta against
the previous chunk's last doc.  This makes the second-phase posting merge an
O(bytes) concatenation — hot terms never require decoding their full posting
list on a single reducer.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# Variable-byte codec (vectorized)
# ---------------------------------------------------------------------------


def _vb_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized VB encode → (byte stream uint8 array, per-value end byte
    indexes).  7 payload bits per byte, MSB group first, high bit terminates."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.shape, np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes) - 1  # index of each value's final byte
    out = np.zeros(int(ends[-1]) + 1, np.uint8)
    shifted = v
    i = 0
    mask = nbytes > i
    while mask.any():
        out[ends[mask] - i] = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        shifted = shifted >> np.uint64(7)
        i += 1
        mask = nbytes > i
    out[ends] |= 0x80
    return out, ends


def vb_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints as a variable-byte stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    out, _ = _vb_encode_arr(v)
    return out.tobytes()


def vb_encode_split(values: np.ndarray, seg_value_starts: np.ndarray) -> list[bytes]:
    """Encode the whole value stream in ONE vectorized pass, then slice it
    into per-segment byte strings (``seg_value_starts`` = value index where
    each segment begins).  This is the batch fast path: thousands of tiny
    per-term vb_encode calls collapse into one."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    starts = np.asarray(seg_value_starts, np.int64)
    if v.size == 0:
        return [b""] * starts.size
    out, ends = _vb_encode_arr(v)
    byte_starts = np.zeros(v.size, np.int64)
    byte_starts[1:] = ends[:-1] + 1
    seg_b_start = byte_starts[starts]
    seg_b_end = np.empty(starts.size, np.int64)
    seg_b_end[:-1] = seg_b_start[1:]
    seg_b_end[-1] = out.size
    buf = out.tobytes()
    return [buf[int(s) : int(e)] for s, e in zip(seg_b_start, seg_b_end)]


def vb_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a variable-byte stream back into a uint64 array.

    Memory-lean by design: the working arrays are one uint8 view of the
    stream plus the uint64 output, and the per-digit loop operates on an
    index set that SHRINKS to just the still-multi-byte values (most VB
    values are 1-2 bytes, so iteration 2+ touches a tiny fraction).  The
    previous formulation materialized ~4 full-width uint64 temporaries
    per digit; on hosts where first-touch page faults are expensive that
    made cold decodes of hot posting lists ~100x slower than the compute."""
    b = np.frombuffer(buf, np.uint8)
    if b.size == 0:
        return np.zeros(0, np.uint64)
    low = b & 0x7F  # stays uint8: 1/8 the footprint of an eager uint64 cast
    ends = np.flatnonzero(b & 0x80)
    vals = low[ends].astype(np.uint64)  # least-significant digit
    if ends.size == b.size:
        return vals  # all single-byte values — the common posting case
    n_extra = np.empty_like(ends)  # digits beyond the end byte
    n_extra[0] = ends[0]
    np.subtract(ends[1:], ends[:-1] + 1, out=n_extra[1:])
    rem = np.flatnonzero(n_extra)
    shift = 1
    while rem.size:
        vals[rem] |= low[ends[rem] - shift].astype(np.uint64) << np.uint64(7 * shift)
        shift += 1
        rem = rem[n_extra[rem] > shift - 1]
    return vals


def vb_encode_one(value: int) -> bytes:
    """Pure-Python single-value VB encode — ~50× cheaper than a 1-element
    numpy round trip; byte-identical to vb_encode."""
    out = [(value & 0x7F) | 0x80]
    value >>= 7
    while value:
        out.append(value & 0x7F)
        value >>= 7
    return bytes(reversed(out))


def vb_first_value_len(buf: bytes) -> int:
    """Byte length of the first VB value in ``buf`` (scan to first end byte).
    Values are ≤10 bytes, so a plain byte scan beats numpy here."""
    for i in range(min(len(buf), 10)):
        if buf[i] & 0x80:
            return i + 1
    raise ValueError("malformed VB stream: no terminating byte")


def vb_first_value(buf: bytes) -> int:
    n = vb_first_value_len(buf)
    return int(vb_decode(buf[:n])[0])


# ---------------------------------------------------------------------------
# Delta helpers
# ---------------------------------------------------------------------------


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """[v0, v1-v0, ...] — reference delta scheme
    (/root/reference/indexing/index_compressor/compression.py:52-54)."""
    v = np.asarray(sorted_vals, np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out.astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, np.uint64)).astype(np.int64)


def segmented_delta_encode(flat: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Delta-encode a concatenation of per-segment ascending runs.

    ``seg_starts`` are the flat indexes where each segment begins; the first
    value of each segment stays absolute.
    """
    v = np.asarray(flat, np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    out[seg_starts] = v[seg_starts]
    return out.astype(np.uint64)


def segmented_delta_decode(deltas: np.ndarray, seg_lengths: np.ndarray) -> np.ndarray:
    """Invert :func:`segmented_delta_encode` given per-segment lengths.

    CONSUMES ``deltas`` when it is a writable uint64/int64 array (every
    hot decode path hands over a fresh ``vb_decode`` result): segment
    rebasing is folded into the delta stream itself — subtract each
    segment's running prefix total (per-segment sums via
    ``np.add.reduceat``) at its first element — and the cumsum then runs
    IN PLACE, so decoding allocates no full-width temporaries.  On hosts
    where first-touch page faults dominate, the old formulation's four
    full-width temporaries made cold decodes ~40x the arithmetic cost."""
    d = np.asarray(deltas)
    if d.size == 0:
        return d.astype(np.int64)
    if d.dtype == np.uint64 and d.flags.writeable:
        d = d.view(np.int64)
    elif not (d.dtype == np.int64 and d.flags.writeable):
        d = d.astype(np.int64)
    lens = np.asarray(seg_lengths, np.int64)
    lens = lens[lens > 0]
    if lens.size > 1:
        starts = np.cumsum(lens) - lens
        # each segment's stored values sum to its last ABSOLUTE value
        # (absolute first + in-segment deltas), so subtracting that sum at
        # the next segment's first element makes one flat in-place cumsum
        # reset correctly at every boundary
        seg_sums = np.add.reduceat(d, starts)
        d[starts[1:]] -= seg_sums[:-1]
    np.cumsum(d, out=d)
    return d


# ---------------------------------------------------------------------------
# Chunk: one encoded run of postings for a single term
# ---------------------------------------------------------------------------


@dataclass
class PostingChunk:
    """Encoded postings of one term over an ascending, contiguous doc range."""

    first_doc: int
    last_doc: int
    n_docs: int
    cf: int
    max_tf: int
    doc_blob: bytes
    tf_blob: bytes
    pos_blob: bytes
    block_last: np.ndarray  # int64, last doc_id per block
    block_max_tf: np.ndarray  # int32
    block_min_dl: np.ndarray  # int32


def encode_chunk(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions_flat: np.ndarray | None,
    block_size: int = 128,
) -> PostingChunk:
    """Encode one term's postings (docIDs ascending) into a chunk.

    ``positions_flat`` is the concatenation of each doc's ascending 1-based
    positions (lengths == tfs); pass None for a TF-only index.
    """
    doc_ids = np.asarray(doc_ids, np.int64)
    tfs = np.asarray(tfs, np.int64)
    dls = np.asarray(dls, np.int64)
    n = doc_ids.size
    if n == 0:
        raise ValueError("empty chunk")
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        # unsorted input would VB-round-trip via uint64 wraparound but bloat
        # the blob and corrupt the block-max metadata — reject loudly
        raise ValueError("doc_ids must be strictly ascending")
    doc_blob = vb_encode(delta_encode(doc_ids))
    tf_blob = vb_encode(tfs.astype(np.uint64))
    if positions_flat is not None and positions_flat.size:
        seg_starts = np.cumsum(tfs) - tfs
        pos_blob = vb_encode(segmented_delta_encode(positions_flat, seg_starts))
    else:
        pos_blob = b""
    # block maxima over runs of block_size docs
    nblocks = (n + block_size - 1) // block_size
    starts = np.arange(nblocks, dtype=np.int64) * block_size
    block_last = doc_ids[np.minimum(starts + block_size, n) - 1]
    block_max_tf = np.maximum.reduceat(tfs, starts).astype(np.int32)
    block_min_dl = np.minimum.reduceat(dls, starts).astype(np.int32)
    return PostingChunk(
        first_doc=int(doc_ids[0]),
        last_doc=int(doc_ids[-1]),
        n_docs=int(n),
        cf=int(tfs.sum()),
        max_tf=int(tfs.max()),
        doc_blob=doc_blob,
        tf_blob=tf_blob,
        pos_blob=pos_blob,
        block_last=block_last.astype(np.int64),
        block_max_tf=block_max_tf,
        block_min_dl=block_min_dl,
    )


def decode_doc_tf(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode (doc_ids, tfs); never touches the position stream."""
    doc_ids = delta_decode(vb_decode(doc_blob))
    tfs = vb_decode(tf_blob).astype(np.int64)
    return doc_ids, tfs


def decode_positions(pos_blob: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode the flat position stream (per-doc lengths = tfs)."""
    return segmented_delta_decode(vb_decode(pos_blob), np.asarray(tfs, np.int64))


def merge_chunks(chunks: list[PostingChunk]) -> PostingChunk:
    """Merge chunks of one term into a single chunk.

    Fast path (the normal case — chunks cover disjoint doc ranges because each
    ingest partition owns a contiguous docID range): byte-splice the doc
    streams, concatenate tf/pos streams and block metadata.  Fallback for
    overlapping ranges: full decode/merge/re-encode (positions, if present,
    must be re-grouped too — only hit when a caller feeds unsorted corpora).
    """
    if len(chunks) == 1:
        return chunks[0]
    chunks = sorted(chunks, key=lambda c: (c.first_doc, c.last_doc))
    disjoint = all(chunks[i].first_doc > chunks[i - 1].last_doc for i in range(1, len(chunks)))
    if not disjoint:
        return _merge_chunks_slow(chunks)
    doc_parts = [chunks[0].doc_blob]
    for prev, cur in zip(chunks, chunks[1:]):
        head = vb_first_value_len(cur.doc_blob)
        doc_parts.append(vb_encode_one(cur.first_doc - prev.last_doc))
        doc_parts.append(cur.doc_blob[head:])
    return PostingChunk(
        first_doc=chunks[0].first_doc,
        last_doc=chunks[-1].last_doc,
        n_docs=sum(c.n_docs for c in chunks),
        cf=sum(c.cf for c in chunks),
        max_tf=max(c.max_tf for c in chunks),
        doc_blob=b"".join(doc_parts),
        tf_blob=b"".join(c.tf_blob for c in chunks),
        pos_blob=b"".join(c.pos_blob for c in chunks),
        block_last=np.concatenate([c.block_last for c in chunks]),
        block_max_tf=np.concatenate([c.block_max_tf for c in chunks]),
        block_min_dl=np.concatenate([c.block_min_dl for c in chunks]),
    )


def _merge_chunks_slow(chunks: list[PostingChunk]) -> PostingChunk:
    """Overlapping-range merge: full decode / interleave / re-encode.

    Per-doc document lengths are NOT recoverable from block metadata, so the
    re-encoded block_min_dl is a conservative 0 placeholder — safe for WAND
    (a lower bound) and replaced by the canonical recompute at shard-write
    time (build.WriteShard._canonical_blocks)."""
    docs, tfs, poss = [], [], []
    block = max(1, len(chunks[0].block_last) and int(np.ceil(chunks[0].n_docs / len(chunks[0].block_last))))
    has_pos = any(c.pos_blob for c in chunks)
    for c in chunks:
        d, t = decode_doc_tf(c.doc_blob, c.tf_blob)
        docs.append(d)
        tfs.append(t)
        if has_pos:
            poss.append(decode_positions(c.pos_blob, t))
    doc_ids = np.concatenate(docs)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    if np.any(np.diff(doc_ids) == 0):
        raise ValueError("duplicate doc_id across chunks of one term")
    tfa = np.concatenate(tfs)[order]
    dla = np.zeros(doc_ids.size, np.int64)  # placeholder, see docstring
    pos_flat = None
    if has_pos:
        flat = np.concatenate(poss)
        tfs_all = np.concatenate(tfs)
        starts = np.cumsum(tfs_all) - tfs_all
        pieces = [flat[starts[i] : starts[i] + tfs_all[i]] for i in order]
        pos_flat = np.concatenate(pieces) if pieces else None
    return encode_chunk(doc_ids, tfa, dla, pos_flat, block_size=block)
