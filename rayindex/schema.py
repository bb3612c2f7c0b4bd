"""Arrow schemas for every table the engine reads or writes.

The reference has no declared schemas anywhere (TSV columns are positional,
/root/reference/indexing/index_builder/index_build.py:143; JSON files are
schemaless dumps) — here every table is an explicit pyarrow schema so blocks
stay zero-copy Arrow end to end.
"""

from __future__ import annotations

import pyarrow as pa

# Input corpus (shape mandated by BASELINE.json input_hint): one row per
# source file of a code repository.
DOCUMENTS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)

# Ingested doc store: documents + dense 1-based doc_id (assigned in global
# (repo, path) order — deterministic under any parallelism) + ingest
# invariant column content_sha256.
DOC_STORE = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        ("content_sha256", pa.string()),
    ]
)

# Tokenize-stage checkpoint: pre-aggregated posting *fine blocks* (one row
# per (term, doc-range fine block, batch)) interleaved with per-doc stat
# rows (term == NULL).  ``block_id = doc_id // fine_block_docs`` keys the
# row to a fixed doc range, which makes EVERY downstream merge a pure
# metadata + byte-splice operation: block membership is a function of the
# doc_id alone, so aggregates (max_tf, min_dl, cf, n) merge canonically
# regardless of how batches fragmented the postings — no reducer ever
# decodes a posting stream to recompute block-max metadata.  Replaces the
# reference's raw ``{term: [df, {doc: [pos]}]}`` in-memory dict + 60k-doc
# segment spill (/root/reference/indexing/index_builder/index_build.py:124,188-197).
POSTING_CHUNKS = pa.schema(
    [
        ("term", pa.string()),
        ("range_id", pa.int64()),     # doc_id // doc_range_size (salt key)
        ("shard", pa.int32()),        # crc32(term) % num_shards
        ("block_id", pa.int64()),     # doc_id // fine_block_docs
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("n_docs", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),       # min doc length over the row's docs
        ("doc_blob", pa.large_binary()),
        ("tf_blob", pa.large_binary()),
        ("pos_blob", pa.large_binary()),
    ]
)

# Per-doc statistics (reference doc_sizes.json,
# /root/reference/indexing/index_builder/index_build.py:181-183, generalized
# with the metadata the reference kept in Postgres).
DOC_STATS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("lang", pa.string()),
        ("repo", pa.string()),
    ]
)

# Single-row collection statistics (reference computes N and l_tot lazily at
# app startup, /root/reference/search/retrieval/retrieval_helpers/helpers.py:229-230).
COLLECTION_STATS = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("total_tokens", pa.int64()),
        ("avg_dl", pa.float64()),
        ("n_terms", pa.int64()),
    ]
)

# Per-shard term dictionary: byte offsets into the shard's blob file — the
# equivalent of the reference's word2byte.json seek+read map
# (/root/reference/indexing/index_hasher/index_hasher.py:44-65), with df/cf
# and per-block metadata inline.  Posting blocks are coalesced fine blocks
# (~block_size postings each); each block records its absolute first doc
# (delta chains restart at block starts) and its byte offset within the
# term's doc/tf/pos streams, so a single block decodes STANDALONE — the
# random access block-max WAND and lazy positional fetch need.
TERM_DICT = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_tf", pa.int32()),
        ("doc_off", pa.int64()),
        ("doc_len", pa.int64()),
        ("tf_off", pa.int64()),
        ("tf_len", pa.int64()),
        ("pos_off", pa.int64()),
        ("pos_len", pa.int64()),
        ("block_first", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_n", pa.list_(pa.int32())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_dl", pa.list_(pa.int32())),
        ("block_doc_boff", pa.list_(pa.int64())),
        ("block_tf_boff", pa.list_(pa.int64())),
        ("block_pos_boff", pa.list_(pa.int64())),
    ]
)

QUERIES = pa.schema(
    [
        ("query_id", pa.int64()),
        ("query", pa.string()),
        ("kind", pa.string()),
        ("k", pa.int32()),
    ]
)

RESULTS = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
    ]
)
