"""fsck: a clean build (and every maintenance output) passes deep
verification; injected corruption of any artifact class is detected."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def fsck_index_dir(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    base = tmp_path_factory.mktemp("fsck")
    src = base / "src"
    src.mkdir()
    pq.write_table(corpus.make_rows(corpus.file_plan(40, 4)),
                   str(src / "docs.parquet"))
    out = str(base / "ix")
    build_index(str(src), out, BuildConfig(num_shards=4,
                                           tokenize_batch_size=16,
                                           fine_block_docs=8))
    return out


def test_fsck_clean_index(fsck_index_dir):
    from rayindex.fsck import fsck_index

    for deep in (False, True):
        r = fsck_index(fsck_index_dir, deep=deep)
        assert r["ok"], r["errors"]
        assert r["n_docs"] == 40
        assert r["n_shards"] == 4
        assert r["n_terms"] > 0


def test_fsck_detects_blob_corruption(fsck_index_dir, tmp_path):
    from rayindex.fsck import fsck_index

    bad = str(tmp_path / "bad")
    shutil.copytree(fsck_index_dir, bad)
    # flip a byte INSIDE a doc stream: any payload-bit flip shifts decoded
    # docs (ascending/first/last checks), any continuation-bit flip changes
    # the count (df check) — always detectable, unlike a position value
    dict_path = sorted(glob.glob(os.path.join(bad, "shards",
                                              "*.dict.parquet")),
                       key=os.path.getsize)[-1]
    dt = pq.read_table(dict_path, columns=["doc_off", "doc_len"])
    lens = dt["doc_len"].to_numpy()
    row = int(np.argmax(lens))
    target = int(dt["doc_off"][row].as_py()) + int(lens[row]) // 2
    blob = dict_path[:-len(".dict.parquet")] + ".bin"
    data = bytearray(open(blob, "rb").read())
    data[target] ^= 0x15
    open(blob, "wb").write(bytes(data))
    assert fsck_index(bad, deep=False)["ok"]  # shallow can't see payload
    r = fsck_index(bad, deep=True)
    assert not r["ok"] and r["errors"]


def test_fsck_detects_truncated_blob(fsck_index_dir, tmp_path):
    from rayindex.fsck import fsck_index

    bad = str(tmp_path / "trunc")
    shutil.copytree(fsck_index_dir, bad)
    blob = sorted(glob.glob(os.path.join(bad, "shards", "*.bin")),
                  key=os.path.getsize)[-1]
    data = open(blob, "rb").read()
    open(blob, "wb").write(data[:-7])
    r = fsck_index(bad, deep=False)
    assert not r["ok"] and any("blob" in e or "tile" in e or "sum to" in e
                               for e in r["errors"])


def test_fsck_detects_docside_tamper(fsck_index_dir, tmp_path):
    from rayindex.fsck import fsck_index

    bad = str(tmp_path / "doclen")
    shutil.copytree(fsck_index_dir, bad)
    p = os.path.join(bad, "stats", "doc_len.bin")
    dl = np.memmap(p, np.int64, mode="r+")
    dl[dl.size // 2] += 1
    dl.flush()
    r = fsck_index(bad, deep=False)
    assert not r["ok"]
    assert any("doc_len.bin" in e or "total_tokens" in e
               for e in r["errors"])


def test_fsck_detects_truncated_lang_codes(fsck_index_dir, tmp_path):
    """A lang_codes.bin shorter than the max doc id is an error, mirroring
    the doc_len.bin handling — not a silently skipped check."""
    from rayindex.fsck import fsck_index

    bad = str(tmp_path / "langtrunc")
    shutil.copytree(fsck_index_dir, bad)
    p = os.path.join(bad, "stats", "lang_codes.bin")
    with open(p, "r+b") as f:
        f.truncate(os.path.getsize(p) // 2)
    r = fsck_index(bad, deep=False)
    assert not r["ok"]
    assert any("lang_codes.bin shorter" in e for e in r["errors"])


def test_fsck_passes_maintenance_outputs(fsck_index_dir, tmp_path):
    """delete → compact chain outputs survive deep fsck — the maintenance
    ops preserve every structural invariant."""
    from rayindex.compact import compact_index
    from rayindex.config import BuildConfig
    from rayindex.delete import delete_docs
    from rayindex.fsck import fsck_index

    deleted = str(tmp_path / "del")
    delete_docs(fsck_index_dir, deleted,
                doc_ids=np.asarray([3, 9, 17, 40], np.int64))
    r = fsck_index(deleted, deep=True)
    assert r["ok"], r["errors"]
    assert r["n_docs"] == 36
    compacted = str(tmp_path / "cmp")
    compact_index(deleted, compacted,
                  BuildConfig(num_shards=4, fine_block_docs=8))
    r = fsck_index(compacted, deep=True)
    assert r["ok"], r["errors"]
    assert r["n_docs"] == 36
