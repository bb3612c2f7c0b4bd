"""Positional → TF-only conversion: strip_positions(build(C)) must be
byte-identical to build(C, keep_positions=False) — the splice never
decodes a posting — and scorers must stay rank-identical while
phrase/proximity degrade as a fresh TF-only build's do."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def convert_setup(ray_session, tmp_path_factory):
    import dataclasses

    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.convert import strip_positions

    base = tmp_path_factory.mktemp("convert")
    tbl = corpus.make_rows(corpus.file_plan(50, 5))
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=16)

    def bld(name: str, c: BuildConfig) -> str:
        src = base / f"src_{name}"
        if not src.exists():
            src.mkdir()
            pq.write_table(tbl, str(src / "docs.parquet"))
        out = base / name
        build_index(str(src), str(out), c)
        return str(out)

    pos = bld("pos", cfg)
    tfonly = bld("tfonly", dataclasses.replace(cfg, keep_positions=False))
    out = str(base / "stripped")
    metrics = strip_positions(pos, out)
    return {"pos": pos, "tfonly": tfonly, "out": out, "metrics": metrics}


def test_stripped_byte_identical_to_tfonly_build(convert_setup):
    for pat in ("shard_*.bin", "shard_*.dict.parquet"):
        got = sorted(glob.glob(os.path.join(convert_setup["out"],
                                            "shards", pat)))
        want = sorted(glob.glob(os.path.join(convert_setup["tfonly"],
                                             "shards", pat)))
        assert got and [os.path.basename(p) for p in got] == \
            [os.path.basename(p) for p in want]
        for g, w in zip(got, want):
            assert open(g, "rb").read() == open(w, "rb").read(), g


def test_stripped_saves_bytes(convert_setup):
    m = convert_setup["metrics"]
    assert m["bytes_saved"] > 0
    assert m["blob_bytes_after"] < m["blob_bytes_before"]


def test_stripped_scorers_rank_identical(convert_setup):
    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.searcher import IndexReader

    rs = IndexReader(convert_setup["out"])
    rp = IndexReader(convert_setup["pos"])
    analyzer = AnalyzerConfig()
    for scorer in ("bm25", "reference", "vsm"):
        cfg = SearchConfig(scorer="bm25" if scorer == "vsm" else scorer)
        for q in ("data", "import data", "return value"):
            got = rs.search(q, k=10, search_cfg=cfg, analyzer=analyzer,
                            scorer=scorer)
            want = rp.search(q, k=10, search_cfg=cfg, analyzer=analyzer,
                             scorer=scorer)
            assert [(d, round(s, 9)) for d, s in got] == \
                   [(d, round(s, 9)) for d, s in want], (scorer, q)


def test_stripped_phrase_matches_tfonly_build(convert_setup):
    """Phrase/proximity behavior on the stripped index must equal a fresh
    TF-only build's (whatever that is — empty or degraded), not crash."""
    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.searcher import IndexReader

    rs = IndexReader(convert_setup["out"])
    rt = IndexReader(convert_setup["tfonly"])
    analyzer = AnalyzerConfig()
    cfg = SearchConfig(scorer="bm25")

    def run(r, q):
        try:
            return ("ok", r.search(q, k=10, search_cfg=cfg,
                                   analyzer=analyzer))
        except Exception as e:
            return ("err", type(e).__name__)

    for q in ('"def main"', "#2(import,data)"):
        assert run(rs, q) == run(rt, q), q
