"""Online serving (rayindex/serve.py): the reference's per-request flow
— spellcheck plain queries by default, retrieve, metadata join, snippets
(views.py:27-97) — behind framework-free handlers plus a stdlib HTTP
wrapper.  Handler results must be rank-identical to IndexReader.search."""

from __future__ import annotations

import json
import os
import threading
import urllib.request

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def serve_index(ray_session, tmp_path_factory):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    base = tmp_path_factory.mktemp("serve")
    tbl = corpus.make_rows(corpus.file_plan(40, 4))
    src = base / "src"
    src.mkdir()
    pq.write_table(tbl, str(src / "docs.parquet"))
    out = str(base / "ix")
    build_index(str(src), out, BuildConfig(num_shards=4,
                                           tokenize_batch_size=16))
    return out


@pytest.fixture(scope="module")
def app(serve_index):
    from rayindex.serve import SearchApp

    return SearchApp(serve_index)


def _vocab_term(app, min_cf=5):
    return next(t for t, cf in app._reader.iter_terms()
                if cf >= min_cf and t.isalpha() and len(t) >= 4)


def test_search_rank_identical_with_metadata(app):
    term = _vocab_term(app)
    res = app.search(term, k=5)
    want = app._reader.search(term, k=5, search_cfg=app.search_cfg,
                              analyzer=app.analyzer)
    assert [(r["doc_id"], round(r["score"], 9)) for r in res["results"]] \
        == [(d, round(s, 9)) for d, s in want]
    assert res["n_results"] == len(want) > 0
    assert res["took_ms"] > 0
    for r in res["results"]:
        assert r["repo"] and r["path"] and r["lang"]
        assert isinstance(r["snippet"], str) and r["snippet"]


def test_search_spellcheck_default_on(app):
    """A typo'd plain query is corrected by default (reference default-on)
    and returns the corrected term's results; spellcheck=False leaves it."""
    term = _vocab_term(app)
    typo = term[:-1] + ("x" if term[-1] != "x" else "q")
    res = app.search(typo, k=5)
    assert res["corrected"] is True
    assert res["ran_query"] == term
    assert res["n_results"] > 0
    raw = app.search(typo, k=5, spellcheck=False)
    assert raw["corrected"] is False and raw["ran_query"] == typo


def test_search_boolean_not_spellchecked(app):
    term = _vocab_term(app)
    typo = term[:-1] + ("x" if term[-1] != "x" else "q")
    res = app.search(f"{typo} AND {term}", k=5)
    # boolean queries pass through the spellchecker untouched
    assert res["corrected"] is False
    assert res["ran_query"] == f"{typo} AND {term}"


def test_suggest_and_facets_and_healthz(app):
    term = _vocab_term(app)
    sug = app.suggest(term[:2], k=5)
    assert sug["suggestions"]
    assert all(s["term"].startswith(term[:2]) for s in sug["suggestions"])
    fc = app.facets(term, col="lang")
    assert sum(c["n_docs"] for c in fc["counts"]) > 0
    hz = app.healthz()
    assert hz["ok"] and hz["n_docs"] > 0 and hz["n_terms"] > 0
    assert hz["spellcheck"] is True


def test_http_round_trip(serve_index, app):
    """Full transport test: ephemeral-port ThreadingHTTPServer, real GETs."""
    from rayindex.serve import make_server

    srv = make_server(app, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=10) as r:
                return r.status, json.loads(r.read())

        term = _vocab_term(app)
        code, body = get(f"/search?q={term}&k=3")
        assert code == 200 and body["n_results"] > 0
        assert body["results"][0]["rank"] == 1
        code, body = get(f"/suggest?prefix={term[:2]}")
        assert code == 200 and body["suggestions"]
        code, body = get(f"/facets?q={term}&col=lang")
        assert code == 200 and body["counts"]
        code, body = get("/healthz")
        assert code == 200 and body["ok"]
        # error paths: missing param and unknown route
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/search",
                                   timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope",
                                   timeout=10)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()


def test_results_html_rendering(serve_index, app):
    """The reference's results.html surface (views.py:72-97): /results
    renders HTML with the retrieved-count line, per-result cards whose
    Publisher line is urlparse(url).netloc, a source link, the
    spell-correction banner, the empty-result message — and escapes
    markup in queries."""
    from rayindex.serve import make_server, render_results_html

    term = _vocab_term(app)
    payload = app.search(term, k=3)
    html_page = render_results_html(payload)
    assert f"Retrieved {payload['n_results']} documents" in html_page
    assert "Publisher: github.com" in html_page  # urlparse netloc
    assert "Go to source" in html_page
    r0 = payload["results"][0]
    assert f"{r0['repo']}/{r0['path']}" in html_page

    # empty results -> the no-results message
    empty = render_results_html(app.search("zzzzqqqxx", spellcheck=False))
    assert "did not return any results" in empty

    # correction banner: a misspelled vocab term corrects by default
    bad = term[:-1] + ("x" if term[-1] != "x" else "q")
    corr = app.search(bad, k=3)
    if corr["corrected"]:
        page = render_results_html(corr)
        assert "Showing results for:" in page
        assert "Search instead for:" in page
        assert "spellcheck=0" in page

    # markup in the query never lands unescaped
    xss = render_results_html(app.search("<script>alert(1)</script>",
                                         spellcheck=False))
    assert "<script>alert" not in xss

    # transport: /results?query=... serves text/html; /search?format=html
    srv = make_server(app, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/results?query={term}&k=3",
                timeout=10) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/html")
            body = r.read().decode()
            assert "Publisher: github.com" in body
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q={term}&format=html",
                timeout=10) as r:
            assert r.headers["Content-Type"].startswith("text/html")
    finally:
        srv.shutdown()
        srv.server_close()


def test_pool_backed_app(serve_index):
    """--actors N shape: the ShardedSearchPool provider returns results
    identical to the in-process reader."""
    from rayindex.searcher import IndexReader
    from rayindex.serve import SearchApp

    pool_app = SearchApp(serve_index, num_actors=2)
    term = _vocab_term(pool_app)
    res = pool_app.search(f"{term} main", k=5)
    r = IndexReader(serve_index)
    want = r.search(f"{term} main", k=5, search_cfg=pool_app.search_cfg,
                    analyzer=pool_app.analyzer)
    assert [(x["doc_id"], round(x["score"], 9)) for x in res["results"]] \
        == [(d, round(s, 9)) for d, s in want]
    assert pool_app.healthz()["pool_actors"] == 2


def test_cli_spellcheck_default(serve_index, capsys):
    """CLI plain-query path spellchecks by default and reports the
    corrected query on stderr; --no-spellcheck disables."""
    from rayindex.cli import main_search
    from rayindex.searcher import IndexReader

    r = IndexReader(serve_index)
    term = next(t for t, cf in r.iter_terms()
                if cf >= 5 and t.isalpha() and len(t) >= 4)
    typo = term[:-1] + ("x" if term[-1] != "x" else "q")
    rc = main_search(["--index", serve_index, "--query", typo, "-k", "3"])
    assert rc == 0
    out = capsys.readouterr()
    assert json.loads(out.err.strip()) == {"corrected_query": term}
    assert json.loads(out.out)
    rc = main_search(["--index", serve_index, "--query", typo, "-k", "3",
                      "--no-spellcheck"])
    out = capsys.readouterr()
    assert rc == 0 and out.err.strip() == ""
    assert json.loads(out.out) == []


def test_http_reload_route(serve_index, tmp_path):
    """/reload over HTTP: no-op on an unchanged store, swap after a
    second publish, version visible in /healthz."""
    import json as _json

    from rayindex import snapshot as sn
    from rayindex.serve import SearchApp, make_server

    store = str(tmp_path / "store")
    sn.publish(store, serve_index)
    app2 = SearchApp(store=store)
    srv = make_server(app2, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}") as r:
                return _json.loads(r.read())

        assert get("/healthz")["version"] == 1
        assert get("/reload") == {"reloaded": False, "version": 1}
        sn.publish(store, serve_index)
        rep = get("/reload")
        assert rep == {"reloaded": True, "from_version": 1, "version": 2}
        assert get("/healthz")["version"] == 2
    finally:
        srv.shutdown()
        srv.server_close()
