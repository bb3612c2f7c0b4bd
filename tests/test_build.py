"""End-to-end build pipeline tests: posting parity vs the oracle index,
ingest sha256 invariant, determinism across partitioning, resume."""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_build_stage_metrics(tiny_build):
    stages = tiny_build["result"].stages
    assert stages["doc_store"]["n_docs"] == 24
    assert stages["stats"]["n_docs"] == 24
    assert stages["shards"]["n_terms"] > 0


def test_collection_stats_match_oracle(tiny_build, tiny_oracle, tiny_reader):
    assert tiny_reader.stats.n_docs == tiny_oracle.N
    assert tiny_reader.stats.total_tokens == tiny_oracle.l_tot
    assert tiny_reader.n_terms == len(tiny_oracle.index)


def test_doc_ids_deterministic_sorted(tiny_build):
    t = pq.read_table(os.path.join(tiny_build["out"], "doc_store"))
    rows = sorted(zip(t["doc_id"].to_pylist(), t["repo"].to_pylist(), t["path"].to_pylist()))
    keys = [(r, p) for _, r, p in rows]
    assert keys == sorted(keys)
    assert [d for d, _, _ in rows] == list(range(1, t.num_rows + 1))


def test_ingest_sha256_column(tiny_build):
    t = pq.read_table(os.path.join(tiny_build["out"], "doc_store"))
    for content, sha in zip(t["content"].to_pylist()[:5], t["content_sha256"].to_pylist()[:5]):
        assert hashlib.sha256(content.encode()).hexdigest() == sha


def test_every_posting_matches_oracle(tiny_build, tiny_oracle, tiny_reader):
    """Full index parity: df, doc ids, tfs and positions for EVERY term."""
    for term, entry in tiny_oracle.index.items():
        p = tiny_reader.lookup(term, need_positions=True)
        assert p is not None, term
        docs = sorted(entry[1])
        assert p.docs.tolist() == docs, term
        assert p.df == entry[0], term
        assert p.tfs.tolist() == [len(entry[1][d]) for d in docs], term
        flat = [x for d in docs for x in entry[1][d]]
        assert p.positions.tolist() == flat, term
    assert tiny_reader.n_terms == len(tiny_oracle.index)


def test_oov_lookup_none(tiny_reader):
    assert tiny_reader.lookup("zzzznotaterm", need_positions=False) is None


def test_sha_verify_rejects_corruption(ray_session):
    import ray

    from rayindex.build import _assign_ids_and_verify

    t = pa.table({
        "repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["py"],
        "content": pa.array(["hello"], pa.large_string()),
        "sha_pre": [hashlib.sha256(b"TAMPERED").hexdigest()],
    })
    with pytest.raises(Exception, match="sha256 mismatch"):
        ray.get(_assign_ids_and_verify.remote(t, 0, True))


def test_build_deterministic_across_partitioning(ray_session, tmp_path):
    """Different batch sizes / shard fan-in must yield byte-identical shard
    blobs and dictionaries — the docID-determinism + canonical-merge
    property (SURVEY §7.5 risk 1)."""
    import pyarrow.parquet as pq

    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    src = tmp_path / "src"
    src.mkdir()
    tbl = corpus.make_rows(corpus.file_plan(60, 5))
    # two source layouts: single file vs 3 files split unevenly
    pq.write_table(tbl, str(src / "docs.parquet"))
    src2 = tmp_path / "src2"
    src2.mkdir()
    pq.write_table(tbl.slice(0, 7), str(src2 / "a.parquet"))
    pq.write_table(tbl.slice(7, 29), str(src2 / "b.parquet"))
    pq.write_table(tbl.slice(36), str(src2 / "c.parquet"))

    outs = []
    # o3: doc_range_size smaller than the corpus → exercises the salted
    # two-phase merge path, which must still produce identical artifacts
    for name, s, bs, rng in (("o1", src, 16, 1 << 17), ("o2", src2, 5, 1 << 17),
                             ("o3", src, 7, 16)):
        out = tmp_path / name
        cfg = BuildConfig(num_shards=4, tokenize_batch_size=bs, doc_range_size=rng)
        build_index(str(s), str(out), cfg)
        outs.append(out)

    # o4: Dataset source (the sort-based ingest) must yield artifacts
    # byte-identical to the key-only file ingest
    import ray.data

    out4 = tmp_path / "o4"
    cfg4 = BuildConfig(num_shards=4, tokenize_batch_size=16)
    build_index(ray.data.from_arrow(tbl).repartition(3), str(out4), cfg4,
                input_token="det-test-ds")
    outs.append(out4)

    # o5: byte-capped spool flushes (A9 memory estimator) — forcing a
    # flush per ~4 KiB of pending chunks must not change any artifact
    out5 = tmp_path / "o5"
    cfg5 = BuildConfig(num_shards=4, tokenize_batch_size=16,
                       spool_flush_bytes=4 << 10)
    build_index(str(src), str(out5), cfg5)
    outs.append(out5)

    # o6: spool consolidation (tiny flushes force many spools, group=2
    # forces multi-round consolidation) — repackaging record batches into
    # shard-ordered combined spools must not change any artifact
    out6 = tmp_path / "o6"
    cfg6 = BuildConfig(num_shards=4, tokenize_batch_size=16,
                       spool_flush_bytes=4 << 10,
                       spool_consolidate_group=2)
    build_index(str(src), str(out6), cfg6)
    outs.append(out6)

    for other in outs[1:]:
        for f1 in sorted(glob.glob(str(outs[0] / "shards" / "*.bin"))):
            f2 = str(other / "shards" / os.path.basename(f1))
            b1, b2 = open(f1, "rb").read(), open(f2, "rb").read()
            assert b1 == b2, f"shard blob differs: {other.name}/{os.path.basename(f1)}"
        for f1 in sorted(glob.glob(str(outs[0] / "shards" / "*.dict.parquet"))):
            f2 = str(other / "shards" / os.path.basename(f1))
            assert pq.read_table(f1).equals(pq.read_table(f2)), \
                f"{other.name}/{os.path.basename(f1)}"


def test_resume_skips_completed_stages(ray_session, tiny_build):
    from rayindex.build import build_index

    res = build_index(tiny_build["src"], tiny_build["out"], tiny_build["cfg"])
    assert all(v["skipped"] for v in res.stages.values())


def test_resume_rebuilds_missing_shard(ray_session, tiny_build, tmp_path):
    """Per-partition resume: wipe one shard's manifest + files and the shards
    stage marker → rebuild regenerates exactly that shard, skips the rest."""
    import shutil

    from rayindex.build import build_index
    from rayindex.searcher import IndexReader

    out2 = str(tmp_path / "idx2")
    shutil.copytree(tiny_build["out"], out2)
    victim_bin = os.path.join(out2, "shards", "shard_00002.bin")
    before = open(victim_bin, "rb").read()
    os.remove(victim_bin)
    os.remove(os.path.join(out2, "shards", "shard_00002.manifest.json"))
    os.remove(os.path.join(out2, "shards.done.json"))
    res = build_index(tiny_build["src"], out2, tiny_build["cfg"])
    assert not res.stages["shards"]["skipped"]
    # earlier stages untouched
    assert res.stages["doc_store"]["skipped"] and res.stages["chunks"]["skipped"]
    after = open(victim_bin, "rb").read()
    assert after == before  # deterministic regeneration
    r = IndexReader(out2)
    assert r.n_terms == res.stages["shards"]["n_terms"]


def test_doc_stats_table(tiny_build, tiny_oracle):
    t = pq.read_table(os.path.join(tiny_build["out"], "stats", "doc_stats"))
    got = dict(zip(t["doc_id"].to_pylist(), t["n_tokens"].to_pylist()))
    assert got == tiny_oracle.doc_sizes


def test_auto_num_shards(ray_session, tmp_path):
    """num_shards=0 resolves deterministically from the corpus size and
    the build remains searchable + resumable with the resolved value."""
    import pyarrow.parquet as pq

    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.searcher import IndexReader

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(corpus.tiny_corpus(), str(src / "docs.parquet"))
    out = str(tmp_path / "idx")
    cfg = BuildConfig(num_shards=0, tokenize_batch_size=8)
    res = build_index(str(src), out, cfg)
    assert res.stages["shards"]["shards"] == 8  # floor for a tiny corpus
    r = IndexReader(out)
    assert r.search("def", k=5)
    # resume resolves the same value and skips everything
    res2 = build_index(str(src), out, cfg)
    assert all(st["skipped"] for st in res2.stages.values())


def test_direct_ingest_matches_exchange(ray_session, tmp_path, monkeypatch):
    """The shuffle-free direct write path (taken when the source is already
    (repo, path)-sorted so every unit maps to a contiguous doc range) must
    produce byte-identical shards and identical doc_store/stat rows to the
    general range-partition exchange, and an UNSORTED source must fall back
    to the exchange and still land on the same artifacts (doc ids come from
    the key sort either way)."""
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    tbl = corpus.make_rows(corpus.file_plan(60, 5))  # file_plan is sorted

    src_sorted = tmp_path / "src_sorted"
    src_sorted.mkdir()
    pq.write_table(tbl.slice(0, 23), str(src_sorted / "a.parquet"))
    pq.write_table(tbl.slice(23), str(src_sorted / "b.parquet"))

    rng = np.random.default_rng(7)
    perm = rng.permutation(tbl.num_rows)
    src_shuf = tmp_path / "src_shuf"
    src_shuf.mkdir()
    pq.write_table(tbl.take(perm[:31]), str(src_shuf / "a.parquet"))
    pq.write_table(tbl.take(perm[31:]), str(src_shuf / "b.parquet"))

    cfg = BuildConfig(num_shards=4, tokenize_batch_size=16)
    out_di = str(tmp_path / "di")
    build_index(str(src_sorted), out_di, cfg)
    assert any(f.startswith("part-u")
               for f in os.listdir(os.path.join(out_di, "doc_store"))), \
        "sorted source should take the direct (shuffle-free) path"

    monkeypatch.setenv("RAYINDEX_FORCE_EXCHANGE", "1")
    out_ex = str(tmp_path / "ex")
    build_index(str(src_sorted), out_ex, cfg)
    monkeypatch.delenv("RAYINDEX_FORCE_EXCHANGE")

    out_sh = str(tmp_path / "sh")
    build_index(str(src_shuf), out_sh, cfg)
    assert not any(f.startswith("part-u")
                   for f in os.listdir(os.path.join(out_sh, "doc_store"))), \
        "shuffled source must fall back to the exchange path"

    def doc_store(out):
        return pq.read_table(os.path.join(out, "doc_store")).sort_by("doc_id")

    for other in (out_ex, out_sh):
        for f1 in sorted(glob.glob(os.path.join(out_di, "shards", "*.bin"))):
            f2 = os.path.join(other, "shards", os.path.basename(f1))
            assert open(f1, "rb").read() == open(f2, "rb").read()
        for f1 in sorted(glob.glob(os.path.join(out_di, "shards", "*.dict.parquet"))):
            f2 = os.path.join(other, "shards", os.path.basename(f1))
            assert pq.read_table(f1).equals(pq.read_table(f2))
        assert doc_store(out_di).equals(doc_store(other))


def test_doc_meta_bins_match_parquet(tiny_build, tiny_reader):
    """Finalize writes dense doc-indexed bins (doc_len.bin, lang_codes.bin)
    and the reader mmaps them instead of materializing an O(n_docs) heap
    array per process; values and lang filters must match the doc_stats
    parquet exactly."""
    import json
    import os

    import numpy as np
    import pyarrow.parquet as pq

    stats_dir = os.path.join(tiny_build["out"], "stats")
    for name in ("doc_len.bin", "lang_codes.bin", "lang_vocab.json"):
        assert os.path.exists(os.path.join(stats_dir, name)), name
    assert isinstance(tiny_reader.stats.doc_len, np.memmap)
    t = pq.read_table(os.path.join(stats_dir, "doc_stats"),
                      columns=["doc_id", "n_tokens", "lang"])
    ids = t["doc_id"].to_numpy()
    assert np.array_equal(np.asarray(tiny_reader.stats.doc_len)[ids],
                          t["n_tokens"].to_numpy())
    lang_col = np.asarray(t["lang"].to_pylist(), object)
    for lang in sorted(set(lang_col.tolist()))[:3]:
        want = np.sort(ids[lang_col == lang]).astype(np.int64)
        got = tiny_reader.allowed_for_lang(lang)
        assert np.array_equal(got, want), lang
    assert tiny_reader.allowed_for_lang("zz-no-such-lang").size == 0


def test_oversize_filter_leaves_id_holes(ray_session, tmp_path, monkeypatch):
    """Doc ids are positional over ALL source rows; an oversize row is
    dropped AFTER id assignment, leaving a hole — identically on the
    direct (sorted) and exchange paths, and invisible to queries."""
    import dataclasses

    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.searcher import IndexReader

    tbl = corpus.make_rows(corpus.file_plan(12, 3))  # sorted by (repo, path)
    # blow up the 4th row's content past the cap (cap = just above the
    # largest untouched row, so exactly one row is dropped)
    contents = tbl["content"].to_pylist()
    cap = max(len(c.encode()) for i, c in enumerate(contents) if i != 3) + 64
    contents[3] = "x" * (cap + 1000) + " zebrahole "
    tbl = tbl.set_column(tbl.schema.get_field_index("content"), "content",
                         pa.array(contents, pa.large_string()))
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(tbl, str(src / "docs.parquet"))

    cfg = BuildConfig(num_shards=2, tokenize_batch_size=8,
                      max_content_bytes=cap)
    out_di = str(tmp_path / "di")
    build_index(str(src), out_di, cfg)
    ds = pq.read_table(os.path.join(out_di, "doc_store"))
    ids = sorted(ds["doc_id"].to_pylist())
    assert ids == [i for i in range(1, 13) if i != 4]  # hole at 4
    r = IndexReader(out_di)
    assert r.lookup("zebrahole", need_positions=False) is None
    assert r.stats.n_docs == 11

    monkeypatch.setenv("RAYINDEX_FORCE_EXCHANGE", "1")
    out_ex = str(tmp_path / "ex")
    build_index(str(src), out_ex, cfg)
    monkeypatch.delenv("RAYINDEX_FORCE_EXCHANGE")
    for f1 in sorted(glob.glob(os.path.join(out_di, "shards", "*.bin"))):
        f2 = os.path.join(out_ex, "shards", os.path.basename(f1))
        assert open(f1, "rb").read() == open(f2, "rb").read()


def test_merge_pool_feed_order_invariant(ray_session, tmp_path):
    """Shard bytes must not depend on the ORDER merger actors receive spool
    files (the fused path feeds them in task-completion order, which is
    nondeterministic run to run)."""
    from rayindex import corpus
    from rayindex.build import _MergePool, build_index
    from rayindex.checkpoint import fingerprint_of
    from rayindex.config import BuildConfig

    src = tmp_path / "src"
    src.mkdir()
    tbl = corpus.make_rows(corpus.file_plan(48, 5))
    for i, lo in enumerate(range(0, 48, 12)):  # 4 units → 4 fused tasks
        pq.write_table(tbl.slice(lo, 12), str(src / f"{i}.parquet"))
    out = tmp_path / "idx"
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=8)
    build_index(str(src), str(out), cfg)

    chunks = os.path.join(str(out), "chunks")
    files = sorted(glob.glob(os.path.join(chunks, "*.arrow")))
    assert len(files) >= 2, "need multiple spool files to permute"
    ref_shards = str(out / "shards")

    for tag, order in (("fwd", files), ("rev", list(reversed(files)))):
        sd = str(tmp_path / f"shards_{tag}")
        os.makedirs(sd)
        pool = _MergePool(sd, fingerprint_of("feed-order", tag), cfg)
        for f in order:  # one file per feed → maximally interleaved arrival
            pool.feed([f])
        pool.finish()
        for f1 in sorted(glob.glob(os.path.join(ref_shards, "*.bin"))):
            f2 = os.path.join(sd, os.path.basename(f1))
            assert open(f1, "rb").read() == open(f2, "rb").read(), \
                f"{tag}/{os.path.basename(f1)}"


def test_spool_consolidation_crash_overlap(ray_session, tmp_path):
    """A crash between the consolidator's atomic rename and its source
    unlinks leaves BOTH the combined spool and (some) sources on disk;
    the resume scan must drop the absorbed sources (feeding both would
    double every posting) and still produce byte-identical shards."""
    import shutil

    import ray

    from rayindex import corpus
    from rayindex.build import (_consolidate_spools, _MergePool,
                                _resume_spool_files, build_index)
    from rayindex.checkpoint import fingerprint_of
    from rayindex.config import BuildConfig

    src = tmp_path / "src"
    src.mkdir()
    tbl = corpus.make_rows(corpus.file_plan(48, 5))
    for i, lo in enumerate(range(0, 48, 12)):
        pq.write_table(tbl.slice(lo, 12), str(src / f"{i}.parquet"))
    out = tmp_path / "idx"
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=8)
    build_index(str(src), str(out), cfg)
    chunks = os.path.join(str(out), "chunks")
    files = sorted(glob.glob(os.path.join(chunks, "*.arrow")))
    assert len(files) >= 3
    ref_shards = str(out / "shards")

    # consolidate the first two spools, then resurrect one source —
    # exactly the crash-between-rename-and-unlink state
    saved = tmp_path / "saved.arrow"
    shutil.copy(files[0], str(saved))
    combined = ray.get(_consolidate_spools.remote(files[:2], chunks,
                                                  "crash"))
    assert combined.endswith("-cons.arrow")
    assert not os.path.exists(files[0]) and not os.path.exists(files[1])
    shutil.copy(str(saved), files[0])  # the "un-unlinked" duplicate

    resumed = _resume_spool_files(chunks)
    assert files[0] not in resumed, "absorbed source must be dropped"
    assert combined in resumed

    sd = str(tmp_path / "shards_resume")
    os.makedirs(sd)
    pool = _MergePool(sd, fingerprint_of("cons-crash", "x"), cfg)
    pool.feed(resumed)
    pool.finish()
    for f1 in sorted(glob.glob(os.path.join(ref_shards, "*.bin"))):
        f2 = os.path.join(sd, os.path.basename(f1))
        assert open(f1, "rb").read() == open(f2, "rb").read(), \
            os.path.basename(f1)
