"""The index build pipeline — Ray-Data-first.

Replaces the reference's single-threaded chain (stream TSV → per-doc dict
update → 60k-doc segment spill → manual pairwise merge → byte-offset hash →
TF-conversion → VB compression; /root/reference/indexing/main.py:7-29 and
SURVEY.md §3.1) with four checkpointed Dataset stages:

1. **ingest**   read Parquet → oversize filter → sha256(content) →
                global sort by (repo, path) → dense 1-based doc_id
                assignment (deterministic under any parallelism) → re-verify
                sha256 after the shuffle (the ingest invariant) → doc store.
2. **chunks**   ``map_batches`` tokenize (zero-copy Arrow in) → per-batch
                pre-aggregated *posting chunks*: one delta+VB-encoded row per
                (term, batch doc-run), plus per-doc stat rows.  This is the
                combiner that makes the groupby shuffle move compressed
                blobs, not raw (term, doc, pos) rows.
3. **shards**   salted two-phase posting merge: ``groupby(term, range_id)``
                (phase 1 — a hot term like ``def`` never lands on a single
                reducer) then ``groupby(shard)`` (phase 2) which byte-splices
                each term's range-chunks and writes one memory-mappable blob
                file + Arrow term dictionary per shard, atomically, with a
                per-shard manifest (per-partition resume).
4. **stats**    doc_stats + collection_stats tables.

Every stage is skipped on resume when its ``.done.json`` fingerprint
matches (rayindex/checkpoint.py).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from rayindex import analysis, codec, schema
from rayindex.checkpoint import BuildCheckpoint, atomic_write_bytes, fingerprint_of
from rayindex.config import BuildConfig


def term_shard(term: str, num_shards: int) -> int:
    """Stable shard assignment (zlib.crc32 is platform/run stable, unlike
    Python's salted hash())."""
    return zlib.crc32(term.encode()) % num_shards


# ---------------------------------------------------------------------------
# stage 1: ingest
# ---------------------------------------------------------------------------


def _sha256_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pa.array(
        [hashlib.sha256(t.encode()).hexdigest() if t is not None else None
         for t in texts.to_pylist()],
        pa.string(),
    )


@ray.remote
def _block_len(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _assign_ids_and_verify(t: pa.Table, offset: int, verify: bool) -> pa.Table:
    """Add dense doc_id = offset+1.. and assert the post-shuffle content still
    hashes to the pre-shuffle sha256 (the per-row ingest invariant)."""
    if t.num_rows == 0:
        # Ray's sort can emit empty boundary blocks with an EMPTY schema
        return pa.table({f.name: pa.array([], f.type) for f in schema.DOC_STORE},
                        schema=schema.DOC_STORE)
    ids = pa.array(np.arange(offset + 1, offset + 1 + t.num_rows, dtype=np.int64))
    sha = _sha256_batch(t["content"])
    if verify:
        pre = t["sha_pre"]
        eq = pc.all(pc.equal(sha, pre)).as_py()
        if not eq:
            bad = pc.filter(t["path"], pc.invert(pc.equal(sha, pre))).to_pylist()[:5]
            raise ValueError(f"ingest sha256 mismatch after shuffle for paths {bad}")
    t = t.drop_columns(["sha_pre"])
    t = t.append_column("doc_id", ids).append_column("content_sha256", sha)
    cols = ["doc_id", "repo", "path", "commit", "lang", "content", "content_sha256"]
    return t.select([c for c in cols if c in t.column_names])


def _stage_ingest(ds: ray.data.Dataset, out: str, cfg: BuildConfig) -> dict[str, Any]:
    max_bytes = cfg.max_content_bytes

    def prep(t: pa.Table) -> pa.Table:
        # oversize filter — the reference drops rows with title/url >= 1000
        # chars (/root/reference/indexing/index_builder/index_build.py:147-148);
        # for code the knob is max content bytes.
        keep = pc.less_equal(pc.binary_length(pc.cast(t["content"], pa.large_binary())), max_bytes)
        t = t.filter(pc.fill_null(keep, False))
        return t.append_column("sha_pre", _sha256_batch(t["content"]))

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.sort(["repo", "path"])
    # Deterministic dense doc_id: Dataset has no zip_with_index, so drop to
    # block refs (objects stay in the object store — no driver materialize):
    # per-block row counts → cumulative offsets → per-block assignment task.
    # materialize once so to_arrow_refs / schema probes don't re-run the sort
    refs = ds.materialize().to_arrow_refs()
    counts = ray.get([_block_len.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    new_refs = [
        _assign_ids_and_verify.remote(r, int(off), cfg.verify_sha256)
        for r, off, n in zip(refs, offsets, counts)
        if n > 0  # sort emits empty boundary blocks; drop them here
    ]
    out_ds = ray.data.from_arrow_refs(new_refs)
    out_ds.write_parquet(out)
    return {"n_docs": int(sum(counts)), "n_blocks": len(counts)}


# ---------------------------------------------------------------------------
# stage 2: tokenize → posting chunks (+ doc-stat rows)
# ---------------------------------------------------------------------------

_CHUNK_NULLS = {
    "first_doc": 0, "last_doc": 0, "n_docs": 0, "cf": 0, "max_tf": 0,
}


class TokenizeToChunks:
    """Stateful map_batches callable: analyzer config + stem cache live for
    the actor's lifetime (the reference rebuilt its whole Preprocessing
    object per document, /root/reference/indexing/index_builder/index_build.py:178)."""

    def __init__(self, cfg: BuildConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # batches may stitch blocks out of order — sort so doc runs ascend
        order = pc.sort_indices(batch["doc_id"])
        batch = batch.take(order)
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["content"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(texts)
        repos = batch["repo"].to_pylist() if "repo" in batch.column_names else [None] * len(texts)

        counts, g_doc, g_terms, g_tfs, pos_flat = analysis.tokenize_docs_grouped(
            texts, cfg.analyzer
        )

        rows: dict[str, list] = {k: [] for k in (
            "term", "range_id", "shard", "first_doc", "last_doc", "n_docs", "cf",
            "max_tf", "doc_blob", "tf_blob", "pos_blob", "block_last",
            "block_max_tf", "block_min_dl", "doc_id", "n_tokens", "lang", "repo",
        )}

        if g_terms.size:
            # regroup (doc, term) rows into per-term runs of ascending docs
            term_codes, term_uniques = pd.factorize(g_terms, sort=True)
            g_starts = np.cumsum(g_tfs) - g_tfs  # position-slice start per group
            order2 = np.lexsort((g_doc, term_codes))
            sorted_codes = term_codes[order2]
            term_bounds = np.flatnonzero(
                np.concatenate([[True], sorted_codes[1:] != sorted_codes[:-1]])
            )
            term_ends = np.append(term_bounds[1:], sorted_codes.size)
            keep_pos = cfg.keep_positions
            for s, e in zip(term_bounds, term_ends):
                grp = order2[s:e]
                term = term_uniques[sorted_codes[s]]
                docs = doc_ids[g_doc[grp]]
                tfs = g_tfs[grp]
                dls = counts[g_doc[grp]]
                if keep_pos:
                    pos = np.concatenate(
                        [pos_flat[g_starts[i] : g_starts[i] + g_tfs[i]] for i in grp]
                    )
                else:
                    pos = None
                c = codec.encode_chunk(docs, tfs, dls, pos, block_size=cfg.block_size)
                rows["term"].append(term)
                rows["range_id"].append(int(c.first_doc) // cfg.doc_range_size)
                rows["shard"].append(term_shard(term, cfg.num_shards))
                rows["first_doc"].append(c.first_doc)
                rows["last_doc"].append(c.last_doc)
                rows["n_docs"].append(c.n_docs)
                rows["cf"].append(c.cf)
                rows["max_tf"].append(c.max_tf)
                rows["doc_blob"].append(c.doc_blob)
                rows["tf_blob"].append(c.tf_blob)
                rows["pos_blob"].append(c.pos_blob)
                rows["block_last"].append(c.block_last.tolist())
                rows["block_max_tf"].append(c.block_max_tf.tolist())
                rows["block_min_dl"].append(c.block_min_dl.tolist())
                rows["doc_id"].append(None)
                rows["n_tokens"].append(None)
                rows["lang"].append(None)
                rows["repo"].append(None)

        # per-doc stat rows (term == NULL)
        for i in range(doc_ids.size):
            rows["term"].append(None)
            rows["range_id"].append(0)
            rows["shard"].append(-1)
            for k, v in _CHUNK_NULLS.items():
                rows[k].append(v)
            rows["doc_blob"].append(b"")
            rows["tf_blob"].append(b"")
            rows["pos_blob"].append(b"")
            rows["block_last"].append([])
            rows["block_max_tf"].append([])
            rows["block_min_dl"].append([])
            rows["doc_id"].append(int(doc_ids[i]))
            rows["n_tokens"].append(int(counts[i]))
            rows["lang"].append(langs[i])
            rows["repo"].append(repos[i])

        return pa.table(rows, schema=schema.POSTING_CHUNKS)


def _stage_chunks(doc_store: str, out: str, cfg: BuildConfig) -> dict[str, Any]:
    cols = ["doc_id", "content", "lang", "repo"]
    ds = ray.data.read_parquet(doc_store, columns=cols)
    ds = ds.map_batches(
        TokenizeToChunks(cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.tokenize_batch_size,
    )
    ds.write_parquet(out)
    return {}


# ---------------------------------------------------------------------------
# stage 3: salted two-phase merge → shard files
# ---------------------------------------------------------------------------


def _row_to_chunk(r: dict) -> codec.PostingChunk:
    return codec.PostingChunk(
        first_doc=r["first_doc"], last_doc=r["last_doc"], n_docs=r["n_docs"],
        cf=r["cf"], max_tf=r["max_tf"], doc_blob=r["doc_blob"],
        tf_blob=r["tf_blob"], pos_blob=r["pos_blob"],
        block_last=np.asarray(r["block_last"], np.int64),
        block_max_tf=np.asarray(r["block_max_tf"], np.int32),
        block_min_dl=np.asarray(r["block_min_dl"], np.int32),
    )


def _chunk_to_row(term: str, shard: int, range_id: int, c: codec.PostingChunk) -> dict:
    return {
        "term": term, "range_id": range_id, "shard": shard,
        "first_doc": c.first_doc, "last_doc": c.last_doc, "n_docs": c.n_docs,
        "cf": c.cf, "max_tf": c.max_tf, "doc_blob": c.doc_blob,
        "tf_blob": c.tf_blob, "pos_blob": c.pos_blob,
        "block_last": c.block_last.tolist(),
        "block_max_tf": c.block_max_tf.tolist(),
        "block_min_dl": c.block_min_dl.tolist(),
        "doc_id": None, "n_tokens": None, "lang": None, "repo": None,
    }


def _merge_term_range(group: pa.Table) -> pa.Table:
    """Phase-1 reducer: merge one (term, range) group's chunks into one."""
    if group.num_rows == 0:  # Ray may hand the UDF an empty block
        return pa.table({f.name: pa.array([], f.type) for f in schema.POSTING_CHUNKS},
                        schema=schema.POSTING_CHUNKS)
    rows = group.to_pylist()
    merged = codec.merge_chunks([_row_to_chunk(r) for r in rows])
    out = _chunk_to_row(rows[0]["term"], rows[0]["shard"], rows[0]["range_id"], merged)
    return pa.table({k: [v] for k, v in out.items()}, schema=schema.POSTING_CHUNKS)


class WriteShard:
    """Phase-2 reducer: receives every range-chunk of one shard, merges per
    term (byte-splice), and writes the shard blob + term dictionary
    atomically.  The blob file is the mmap target at query time — the
    engine's replacement for the reference's JSON-lines index +
    word2byte.json seek/read pair
    (/root/reference/indexing/index_hasher/index_hasher.py:44-65).

    Block-max metadata is recomputed canonically here (every
    ``block_size`` postings of the FINAL merged list) so the artifact is
    byte-identical regardless of upstream batch/partition boundaries; doc
    lengths come from a ``ray.put`` broadcast of the doc_stats column —
    one object read per reducer, not re-shipped per batch.  (At 10^12-doc
    scale this array would be sharded by doc range instead; the layout
    already supports that since reducers see ascending doc runs.)"""

    def __init__(self, shard_dir: str, fingerprint: str, block_size: int,
                 doc_len_ref):
        self.shard_dir = shard_dir
        self.fingerprint = fingerprint
        self.block_size = block_size
        self.doc_len_ref = doc_len_ref
        self._doc_len = None

    @property
    def doc_len(self) -> np.ndarray:
        if self._doc_len is None:
            self._doc_len = ray.get(self.doc_len_ref)
        return self._doc_len

    def _canonical_blocks(self, c: codec.PostingChunk) -> codec.PostingChunk:
        doc_ids, tfs = codec.decode_doc_tf(c.doc_blob, c.tf_blob)
        dls = self.doc_len[doc_ids]
        n = doc_ids.size
        bs = self.block_size
        starts = np.arange(0, n, bs, dtype=np.int64)
        c.block_last = doc_ids[np.minimum(starts + bs, n) - 1].astype(np.int64)
        c.block_max_tf = np.maximum.reduceat(tfs, starts).astype(np.int32)
        c.block_min_dl = np.minimum.reduceat(dls, starts).astype(np.int32)
        return c

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:  # Ray may hand the UDF an empty block
            return pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                                 "n_terms": pd.Series([], dtype="int64"),
                                 "bytes": pd.Series([], dtype="int64"),
                                 "skipped": pd.Series([], dtype="bool")})
        shard_id = int(group["shard"].iloc[0])
        if BuildCheckpoint.shard_is_done(self.shard_dir, shard_id, self.fingerprint):
            m = json.load(open(BuildCheckpoint.shard_manifest_path(self.shard_dir, shard_id)))
            return pd.DataFrame([{"shard": shard_id, "n_terms": m["n_terms"],
                                  "bytes": m["bytes"], "skipped": True}])
        bin_parts: list[bytes] = []
        dict_rows: dict[str, list] = {k: [] for k in (
            "term", "df", "cf", "max_tf", "doc_off", "doc_len", "tf_off",
            "tf_len", "pos_off", "pos_len", "block_last", "block_max_tf",
            "block_min_dl",
        )}
        off = 0
        # deterministic term order inside the shard
        for term, g in sorted(group.groupby("term", sort=True), key=lambda kv: kv[0]):
            chunks = [_row_to_chunk(r) for r in g.to_dict("records")]
            c = self._canonical_blocks(codec.merge_chunks(chunks))
            dict_rows["term"].append(term)
            dict_rows["df"].append(c.n_docs)
            dict_rows["cf"].append(c.cf)
            dict_rows["max_tf"].append(c.max_tf)
            for name, blob in (("doc", c.doc_blob), ("tf", c.tf_blob), ("pos", c.pos_blob)):
                dict_rows[f"{name}_off"].append(off)
                dict_rows[f"{name}_len"].append(len(blob))
                bin_parts.append(blob)
                off += len(blob)
            dict_rows["block_last"].append(c.block_last.tolist())
            dict_rows["block_max_tf"].append(c.block_max_tf.tolist())
            dict_rows["block_min_dl"].append(c.block_min_dl.tolist())
        blob = b"".join(bin_parts)
        atomic_write_bytes(os.path.join(self.shard_dir, f"shard_{shard_id:05d}.bin"), blob)
        dict_table = pa.table(
            {k: pa.array(v, schema.TERM_DICT.field(k).type) for k, v in dict_rows.items()},
            schema=schema.TERM_DICT,
        )
        tmp = os.path.join(self.shard_dir, f"shard_{shard_id:05d}.dict.parquet.tmp-{os.getpid()}")
        pq.write_table(dict_table, tmp)
        os.replace(tmp, os.path.join(self.shard_dir, f"shard_{shard_id:05d}.dict.parquet"))
        n_terms = len(dict_rows["term"])
        BuildCheckpoint.write_shard_manifest(
            self.shard_dir, shard_id, self.fingerprint,
            {"n_terms": n_terms, "bytes": len(blob)},
        )
        return pd.DataFrame([{"shard": shard_id, "n_terms": n_terms,
                              "bytes": len(blob), "skipped": False}])


def _stage_shards(chunks_path: str, shard_dir: str, cfg: BuildConfig,
                  fingerprint: str, stats_dir: str) -> dict[str, Any]:
    # broadcast the doc-length table once (block-min-dl recompute)
    ds_t = pq.read_table(os.path.join(stats_dir, "doc_stats"),
                         columns=["doc_id", "n_tokens"])
    ids = ds_t["doc_id"].to_numpy()
    doc_len = np.zeros(int(ids.max()) + 1 if len(ids) else 1, np.int64)
    doc_len[ids] = ds_t["n_tokens"].to_numpy()
    doc_len_ref = ray.put(doc_len)

    ds = ray.data.read_parquet(chunks_path, filter=pc.is_valid(pc.field("term")))
    # phase 1: salted merge — (term, range_id) so hot terms spread across
    # reducers; output is one chunk row per (term, doc range)
    ds = ds.groupby(["term", "range_id"]).map_groups(
        _merge_term_range, batch_format="pyarrow"
    )
    # phase 2: all of a shard's terms on one reducer; byte-splice merge + write
    writer = WriteShard(shard_dir, fingerprint, cfg.block_size, doc_len_ref)

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        return writer(group)

    res = ds.groupby("shard").map_groups(write_shard, batch_format="pandas")
    stats = res.to_pandas()
    # shards with no terms still need (empty) files for the searcher
    present = set(stats["shard"].tolist())
    for sid in range(cfg.num_shards):
        if sid not in present:
            atomic_write_bytes(os.path.join(shard_dir, f"shard_{sid:05d}.bin"), b"")
            empty = pa.table(
                {f.name: pa.array([], f.type) for f in schema.TERM_DICT}, schema=schema.TERM_DICT
            )
            pq.write_table(empty, os.path.join(shard_dir, f"shard_{sid:05d}.dict.parquet"))
            BuildCheckpoint.write_shard_manifest(shard_dir, sid, fingerprint,
                                                 {"n_terms": 0, "bytes": 0})
    return {
        "n_terms": int(stats["n_terms"].sum()),
        "index_bytes": int(stats["bytes"].sum()),
        "shards": int(cfg.num_shards),
    }


# ---------------------------------------------------------------------------
# stage 4: doc_stats + collection_stats
# ---------------------------------------------------------------------------


def _stage_stats(chunks_path: str, out: str) -> dict[str, Any]:
    ds = ray.data.read_parquet(
        chunks_path,
        columns=["term", "doc_id", "n_tokens", "lang", "repo"],
        filter=pc.is_null(pc.field("term")),
    )
    ds = ds.map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "lang", "repo"]),
        batch_format="pyarrow",
    )
    doc_stats_dir = os.path.join(out, "doc_stats")
    os.makedirs(doc_stats_dir, exist_ok=True)
    ds.write_parquet(doc_stats_dir)
    # pre-aggregate per batch, then sum the tiny partials on the driver
    agg = ds.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "tok": pa.array([pc.sum(t["n_tokens"]).as_py() or 0], pa.int64()),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    return {"n_docs": int(agg["n"].sum()), "total_tokens": int(agg["tok"].sum())}


def _stage_finalize(stats_dir: str, out: str, n_docs: int, total_tokens: int,
                    n_terms: int) -> dict[str, Any]:
    cs = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "total_tokens": pa.array([total_tokens], pa.int64()),
            "avg_dl": pa.array([total_tokens / n_docs if n_docs else 0.0], pa.float64()),
            "n_terms": pa.array([n_terms], pa.int64()),
        },
        schema=schema.COLLECTION_STATS,
    )
    pq.write_table(cs, os.path.join(stats_dir, "collection_stats.parquet"))
    return {"n_terms": n_terms}


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@dataclass
class BuildResult:
    out_dir: str
    fingerprint: str
    stages: dict[str, Any] = field(default_factory=dict)

    @property
    def doc_store(self) -> str:
        return os.path.join(self.out_dir, "doc_store")

    @property
    def shard_dir(self) -> str:
        return os.path.join(self.out_dir, "shards")


def _input_token(source) -> str:
    if isinstance(source, str):
        files = sorted(glob.glob(os.path.join(source, "*.parquet"))) or [source]
        sizes = [str(os.path.getsize(f)) for f in files if os.path.exists(f)]
        return "|".join([*files, *sizes])
    return f"dataset:{id(source)}"


def build_index(
    source: str | ray.data.Dataset,
    out_dir: str,
    cfg: BuildConfig | None = None,
    *,
    input_token: str | None = None,
) -> BuildResult:
    """Build a full positional BM25 index under ``out_dir``.

    ``source`` is a Parquet path/dir or a Dataset with the documents schema
    (repo, path, commit, lang, content).  Resumable: stages whose checkpoint
    fingerprint matches are skipped; within the shard stage, completed shards
    are skipped individually.

    Pass ``input_token`` (any stable string identifying the input, e.g.
    "corpus:small:seed7") when ``source`` is a Dataset — without it a resumed
    build cannot prove lineage and will rebuild from scratch.
    """
    cfg = cfg or BuildConfig()
    token = input_token or _input_token(source)
    fp = fingerprint_of(cfg.fingerprint(), token)
    ckpt = BuildCheckpoint(out_dir, fp)
    result = BuildResult(out_dir=out_dir, fingerprint=fp)

    doc_store = os.path.join(out_dir, "doc_store")
    chunks = os.path.join(out_dir, "chunks")
    shard_dir = os.path.join(out_dir, "shards")

    def ingest(d):
        ds = ray.data.read_parquet(source) if isinstance(source, str) else source
        return _stage_ingest(ds, d, cfg)

    stats_dir = os.path.join(out_dir, "stats")

    r1 = ckpt.run_stage("doc_store", ingest)
    r2 = ckpt.run_stage("chunks", lambda d: _stage_chunks(doc_store, d, cfg))
    r3 = ckpt.run_stage("stats", lambda d: _stage_stats(chunks, d))
    # clear=False: completed shards are skipped via their own manifests
    r4 = ckpt.run_stage("shards",
                        lambda d: _stage_shards(chunks, d, cfg, fp, stats_dir),
                        clear=False)
    r5 = ckpt.run_stage(
        "finalize",
        lambda d: _stage_finalize(
            stats_dir, d,
            r3.metrics.get("n_docs", 0), r3.metrics.get("total_tokens", 0),
            r4.metrics.get("n_terms", 0),
        ),
    )

    result.stages = {r.name: {"skipped": r.skipped, **r.metrics}
                     for r in (r1, r2, r3, r4, r5)}
    ckpt.write_build_manifest({
        "config": cfg.fingerprint(),
        "input_token_sha": hashlib.sha256(token.encode()).hexdigest()[:16],
        "stages": result.stages,
    })
    return result
