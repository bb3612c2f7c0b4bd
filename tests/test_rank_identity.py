"""THE parity gate: the Ray engine must be rank-identical (docIDs and
scores to 1e-9, ties broken (score desc, doc_id asc)) to the oracle — the
executable spec of the reference engine — on the full fixed query set, for
every scorer, plus block-max WAND vs exhaustive TAAT identity."""

from __future__ import annotations

import pytest

from rayindex import corpus
from rayindex.config import SearchConfig

SCORERS = ["reference", "bm25", "lm", "lm-dirichlet", "vsm"]
_Q = corpus.fixed_queries()
QUERIES = list(zip(_Q["query"].to_pylist(), _Q["kind"].to_pylist(), _Q["k"].to_pylist()))


def _assert_identical(want, got, ctx):
    assert len(want) == len(got), f"{ctx}: lengths {len(want)} vs {len(got)}"
    for (wd, ws), (gd, gs) in zip(want, got):
        assert wd == gd, f"{ctx}: docs {wd} vs {gd}"
        assert abs(ws - gs) < 1e-9, f"{ctx}: scores {ws} vs {gs}"


@pytest.mark.parametrize("scorer", SCORERS)
def test_rank_identity_all_queries(scorer, tiny_oracle, tiny_reader):
    for qtext, kind, k in QUERIES:
        want = tiny_oracle.search(qtext, k=k, scorer=scorer)
        got = tiny_reader.search(qtext, k=k, scorer=scorer)
        _assert_identical(want, got, f"{scorer}/{kind}/{qtext!r}")


def test_lang_filter_identity(tiny_oracle, tiny_reader):
    """The metadata filter (reference date-range analog) must apply at the
    same candidate-generation points in engine and oracle."""
    langs = sorted(set(tiny_oracle.doc_lang.values()))
    assert langs
    for lang in langs[:3]:
        for qtext, kind, k in QUERIES[:25]:
            want = tiny_oracle.search(qtext, k=k, lang=lang)
            got = tiny_reader.search(qtext, k=k, lang=lang)
            _assert_identical(want, got, f"lang={lang}/{qtext!r}")
    # unknown lang → empty
    assert tiny_oracle.search("def", lang="nosuchlang") == []
    assert tiny_reader.search("def", lang="nosuchlang") == []


def test_wand_identical_to_taat(tiny_reader):
    wcfg = SearchConfig(scorer="bm25", algorithm="bmw")
    tcfg = SearchConfig(scorer="bm25", algorithm="taat")
    for qtext, kind, k in QUERIES:
        if kind != "term":
            continue
        a = tiny_reader.search(qtext, k=k, search_cfg=wcfg)
        b = tiny_reader.search(qtext, k=k, search_cfg=tcfg)
        _assert_identical(b, a, f"wand/{qtext!r}")


def test_wand_multiblock_identity(ray_session, tmp_path):
    """WAND with MANY blocks per posting list (block_size=8 over 300 docs)
    — catches block-skip bugs the single-block tiny corpus cannot (a real
    one found here: skipping past docs where a later cursor activates)."""
    import pyarrow.parquet as pq

    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.searcher import IndexReader

    src = tmp_path / "src"
    src.mkdir()
    tbl = corpus.make_rows(corpus.file_plan(300, 6))
    pq.write_table(tbl, str(src / "docs.parquet"))
    out = str(tmp_path / "idx")
    build_index(str(src), out, BuildConfig(num_shards=4, block_size=8,
                                           tokenize_batch_size=64))
    r = IndexReader(out)
    wcfg = SearchConfig(scorer="bm25", algorithm="bmw")
    tcfg = SearchConfig(scorer="bm25", algorithm="taat")
    probes = ["def", "def return", "import class return", "alalal0 def",
              "bealal1 junalal9 def return", "coralal2"]
    for qtext in probes:
        for k in (3, 10, 100):
            a = r.search(qtext, k=k, search_cfg=wcfg)
            b = r.search(qtext, k=k, search_cfg=tcfg)
            _assert_identical(b, a, f"bmw-multiblock/{qtext!r}/k={k}")


def test_wand_small_k(tiny_reader):
    wcfg = SearchConfig(scorer="bm25", algorithm="bmw")
    tcfg = SearchConfig(scorer="bm25", algorithm="taat")
    for k in (1, 2, 3, 5):
        a = tiny_reader.search("def return import", k=k, search_cfg=wcfg)
        b = tiny_reader.search("def return import", k=k, search_cfg=tcfg)
        _assert_identical(b, a, f"wand k={k}")


def test_vsm_union_semantics_large_intersection(ray_session, tmp_path):
    """VSM must score the plain UNION of posting lists (oracle._rank_vsm)
    even when the query terms' intersection exceeds candidate_relax (100)
    — the intersection-relax path must NOT apply to the vsm scorer.
    Regression: engine scored only the 150-doc intersection and dropped
    union-only docs on any realistically sized corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.oracle import OracleEngine
    from rayindex.searcher import IndexReader

    n = 300

    def content(i: int) -> str:
        if i < 150:
            return "aaa bbb"      # the >=relax intersection-half branch
        if i < 161:
            return "zzz"          # rare union-only docs with the HIGHEST
                                  # vsm cosine (biggest idf) — exactly the
                                  # docs the relax path dropped
        return "filler"

    rows = {
        "repo": ["r"] * n,
        "path": [f"f{i:04d}.py" for i in range(n)],
        "commit": ["c"] * n,
        "lang": ["py"] * n,
        "content": [content(i) for i in range(n)],
    }
    src = tmp_path / "src"
    src.mkdir()
    tbl = pa.table(rows)
    pq.write_table(tbl, str(src / "docs.parquet"))
    out = str(tmp_path / "idx")
    build_index(str(src), out, BuildConfig(num_shards=2, tokenize_batch_size=64))
    r = IndexReader(out)
    o = OracleEngine(tbl)
    q = "aaa bbb zzz"
    want = o.search(q, k=20, scorer="vsm")
    got = r.search(q, k=20, scorer="vsm")
    assert any(150 <= d <= 161 for d, _ in want), \
        "oracle top-k must contain union-only (zzz) docs for this corpus"
    _assert_identical(want, got, f"vsm-union/{q!r}")


def test_bmw_skips_blocks_on_clustered_corpus(ray_session, tmp_path):
    """Block-max pruning engages when posting lists are CLUSTERED in doc
    space (real corpora: repo/time-ordered ingest puts related docs in
    adjacent doc-id ranges).  Rare terms living in a narrow doc range must
    make bmw decode only the hot terms' blocks overlapping that range —
    and stay rank-identical to exhaustive TAAT.  (On a uniformly-scattered
    corpus nothing is prunable under any block scheme: a rare term's
    blocks then span the whole doc axis; see BENCH/BASELINE.md.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.searcher import IndexReader, LazyPosting

    n = 8000
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in range(n):
        body = f"alpha beta gamma delta epsilon fill{i % 13} pad{i % 7}"
        if i < 160:  # rare term clustered in the first 2% of doc space
            body += " nugget"
        rows["repo"].append("r")
        rows["path"].append(f"f{i:05d}.py")
        rows["commit"].append("c")
        rows["lang"].append("py")
        rows["content"].append(body)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table(rows), str(src / "docs.parquet"))
    out = str(tmp_path / "idx")
    build_index(str(src), out, BuildConfig(num_shards=4, tokenize_batch_size=256))
    r = IndexReader(out)

    decoded = {"n": 0}
    orig = LazyPosting.decode_blocks

    def counted(self, bsel):
        decoded["n"] += len(bsel)
        return orig(self, bsel)

    LazyPosting.decode_blocks = counted
    try:
        wcfg = SearchConfig(scorer="bm25", algorithm="bmw")
        tcfg = SearchConfig(scorer="bm25", algorithm="taat")
        q = "nugget alpha beta gamma"
        a = r.search(q, k=10, search_cfg=wcfg)
        b = r.search(q, k=10, search_cfg=tcfg)
        _assert_identical(b, a, "bmw-clustered")
        total_blocks = sum(r.lookup_lazy(t).n_blocks for t in q.split())
        assert decoded["n"] < 0.35 * total_blocks, (
            f"bmw decoded {decoded['n']}/{total_blocks} blocks — "
            "block skipping did not engage on a clustered corpus")

        # algorithm="auto" must route THIS query to bmw (clustered rare
        # term → prunable) and stay identical...
        from rayindex import scoring

        acfg = SearchConfig(scorer="bm25", algorithm="auto")
        decoded["n"] = 0
        c = r.search(q, k=10, search_cfg=acfg)
        _assert_identical(b, c, "auto-clustered")
        assert 0 < decoded["n"] < 0.35 * total_blocks, \
            "auto did not route the clustered query to bmw"
        assert scoring.auto_prefers_bmw(r, q.split(), r.stats, acfg)
        # ...and route an UNPRUNABLE query (every term covers the whole doc
        # axis with flat bounds) to taat: no block decodes at all
        q2 = "alpha beta gamma delta"
        assert not scoring.auto_prefers_bmw(r, q2.split(), r.stats, acfg)
        decoded["n"] = 0
        d = r.search(q2, k=10, search_cfg=acfg)
        _assert_identical(r.search(q2, k=10, search_cfg=tcfg), d, "auto-uniform")
        assert decoded["n"] == 0, "auto routed an unprunable query to bmw"
    finally:
        LazyPosting.decode_blocks = orig


def test_hello_corpus_hand_checked(ray_session, tmp_path):
    """Micro-fixture parity incl. hand-verified postings (mirrors the
    reference 5-article smoke TSV)."""
    import pyarrow.parquet as pq

    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.oracle import OracleEngine
    from rayindex.searcher import IndexReader

    src = tmp_path / "src"
    src.mkdir()
    tbl = corpus.hello_corpus()
    pq.write_table(tbl, str(src / "docs.parquet"))
    out = str(tmp_path / "idx")
    build_index(str(src), out, BuildConfig(num_shards=2, tokenize_batch_size=2))
    r = IndexReader(out)
    o = OracleEngine(tbl)
    # hand-checked postings: docs sorted by path a..e.  'hello' is a
    # Glasgow stopword (the list the reference actually loads), so it is
    # dropped everywhere — doc 5 ("hello Hello HELLO") has ZERO tokens.
    assert r.lookup("hello", need_positions=False) is None
    # 'world' survives: doc1 pos 1 ("[hello] world"), doc3 pos 2
    # ("[hello] france [the] world [says hello]"), doc4 pos 3
    # ("goodbye cruel world")
    p = r.lookup("world", need_positions=True)
    assert p.docs.tolist() == [1, 3, 4]
    assert p.tfs.tolist() == [1, 1, 1]
    assert p.positions.tolist() == [1, 2, 3]
    for q in ["hello", "hello world", '"hello world"', "hello AND world",
              "NOT hello", "#2(hello,world)", "germany OR france"]:
        _assert_identical(o.search(q, k=10), r.search(q, k=10), q)
